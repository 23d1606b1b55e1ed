package graft.operators.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Classifier calibration (reliability) table — the model-eval companion
  * of [[BinaryAuc]]: rows bucketed by predicted score, per bucket the
  * observed positive rate vs the mean predicted score. A curation
  * pipeline that filters on a classifier threshold needs exactly this
  * table to pick the threshold (AUC ranks; calibration tells you what
  * `score ≥ 0.7` MEANS in precision terms).
  *
  * Exactness discipline: the bucket id and per-row floor-scaled score
  * are deterministic scalar functions of the (deterministic) score
  * expression; every cross-row reduction is an exact BIGINT sum, so the
  * table is partition-invariant and oracle-checkable.
  *
  * Scale shape: one partial-aggregated groupBy on the bucket id (three
  * longs per bucket per partition on the wire) — the same single-pass
  * shape at any corpus size.
  */
object Calibration {

  /** `(bucket, n, n_pos, pos_rate, mean_score)` per occupied score
    * bucket (`bucket = floor(score·buckets)`, so a [0,1] score fills
    * 0..buckets-1 with the right edge landing in `buckets`).
    */
  def table(df: DataFrame, score: Column, label: Column,
      buckets: Int = 10, scale: Double = 1e6): DataFrame =
    df.select(floor(score * lit(buckets)).cast("long").as("bucket"),
        label.cast("long").as("_lab"),
        floor(score * lit(scale)).cast("long").as("_ss"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"), sum(col("_lab")).as("n_pos"),
        sum(col("_ss")).as("_sss"))
      .select(col("bucket"), col("n"), col("n_pos"),
        round(col("n_pos").cast("double") / col("n").cast("double"), 6).as("pos_rate"),
        round(col("_sss").cast("double") / (col("n").cast("double") * lit(scale)), 6)
          .as("mean_score"))
      .orderBy(col("bucket"))

  /** DuckDB twin over score/label EXPRESSIONS evaluated against `from`. */
  def sql(scoreExpr: String, labelExpr: String, from: String,
      buckets: Int = 10, scale: Double = 1e6): String =
    s"""WITH _cal AS (SELECT CAST(floor(($scoreExpr) * $buckets) AS BIGINT) AS bucket,
       |    CAST($labelExpr AS BIGINT) AS lab,
       |    CAST(floor(($scoreExpr) * $scale) AS BIGINT) AS ss
       |  FROM $from),
       |_cg AS (SELECT bucket, count(*) AS n, CAST(sum(lab) AS BIGINT) AS n_pos,
       |    CAST(sum(ss) AS BIGINT) AS sss
       |  FROM _cal GROUP BY bucket)
       |SELECT bucket, n, n_pos,
       |  round(CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE), 6) AS pos_rate,
       |  round(CAST(sss AS DOUBLE) / (CAST(n AS DOUBLE) * $scale), 6) AS mean_score
       |FROM _cg ORDER BY bucket""".stripMargin
}
