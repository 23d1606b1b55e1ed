package graft.operators.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Decision-threshold operating-point table for any score column: one
  * row per DISTINCT score level, with exact-integer confusion counts
  * (tp/fp/fn/tn for the rule `predict positive iff score >= level`),
  * the derived precision/recall/F1, and a `chosen` flag on the max-F1
  * row (ties → the smallest threshold, i.e. highest recall). The
  * curve IS the PR/ROC table; the chosen row MOVES with the corpus —
  * the tuner discipline every other operating-point report follows.
  *
  * Scale shape: the input collapses to one row per distinct score
  * first (a normal shuffle); suffix sums over score levels use the
  * range-partition + broadcast-offsets two-level prefix-sum
  * decomposition (the [[BinaryAuc]] idiom — never a partition-less
  * window over data-sized input). Scores arrive 1e-6-quantized
  * (every producer rounds), so the level table is bounded by the
  * rounding grid (≤ ~1e6 + 1 rows) regardless of corpus size, and
  * every count is an exact integer — the only floating point is the
  * final fixed-shape ratio both engines evaluate identically.
  */
object ScoreThresholds {

  /** `(threshold, tp, fp, fn, tn, precision, recall, f1, chosen)` —
    * threshold ascending. Rows with null score or label are excluded.
    */
  def table(df: DataFrame, scoreCol: Column, labelCol: Column): DataFrame = {
    val base = df.select(scoreCol.cast("double").as("_s"), labelCol.as("_y"))
      .filter(col("_s").isNotNull && col("_y").isNotNull)
    val grouped = base.groupBy(col("_s")).agg(
      count(lit(1)).as("_c"),
      sum(when(col("_y"), 1L).otherwise(0L)).as("_p"))
    val parts = grouped
      .repartitionByRange(col("_s"))
      .sortWithinPartitions(col("_s"))
      .withColumn("_pid", spark_partition_id())
    val offsets = parts.groupBy(col("_pid"))
      .agg(sum(col("_c")).as("_psum"), sum(col("_p")).as("_ppsum"))
      .withColumn("_off", coalesce(sum(col("_psum"))
        .over(Window.orderBy(col("_pid"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("_poff", coalesce(sum(col("_ppsum"))
        .over(Window.orderBy(col("_pid"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("_pid").as("_opid"), col("_off"), col("_poff"))
    // the offsets window is partition-less but over one row per range
    // partition — bounded by the shuffle partition count, not the data
    val sliceW = Window.partitionBy(col("_pid")).orderBy(col("_s"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val below = parts
      .join(broadcast(offsets), parts("_pid") === offsets("_opid"))
      .withColumn("_cb", col("_off") + sum(col("_c")).over(sliceW) - col("_c"))
      .withColumn("_pb", col("_poff") + sum(col("_p")).over(sliceW) - col("_p"))
    // corpus totals ride as a broadcast one-row spine (no driver
    // action, no literal injection — the whole table is ONE lazy plan)
    val totals = grouped.agg(
      sum(col("_c")).as("_n"), sum(col("_p")).as("_np"))
    val counted = below.crossJoin(broadcast(totals)).select(
      col("_s").as("threshold"),
      col("_n"), col("_np"),
      // predict positive iff score >= threshold: everything NOT
      // strictly below the level
      (col("_np") - col("_pb")).as("tp"),
      ((col("_n") - col("_cb")) - (col("_np") - col("_pb"))).as("fp"),
      col("_pb").as("fn"),
      ((col("_n") - col("_np")) -
        ((col("_n") - col("_cb")) - (col("_np") - col("_pb")))).as("tn"))
    val metrics = counted
      .withColumn("precision", when(col("tp") + col("fp") > 0L,
        round(col("tp").cast("double") / (col("tp") + col("fp")).cast("double"), 6)))
      .withColumn("recall", when(col("_np") > 0L,
        round(col("tp").cast("double") / col("_np").cast("double"), 6)))
      .withColumn("f1", when(lit(2L) * col("tp") + col("fp") + col("fn") > 0L,
        round(lit(2.0) * col("tp").cast("double") /
          (lit(2L) * col("tp") + col("fp") + col("fn")).cast("double"), 6)))
      .drop("_n", "_np")
    // chosen = max F1, ties to the smallest threshold — one tiny
    // aggregate broadcast back (never a full-table window)
    val best = metrics.agg(max(struct(
        coalesce(col("f1"), lit(-1.0)).as("f1"),
        (-col("threshold")).as("negt"))).as("_b"))
      .select(col("_b.f1").as("_bf1"), col("_b.negt").as("_bnegt"))
    metrics.crossJoin(broadcast(best))
      .withColumn("chosen",
        coalesce(col("f1"), lit(-1.0)) === col("_bf1") &&
          (-col("threshold")) === col("_bnegt"))
      .drop("_bf1", "_bnegt")
      .orderBy(col("threshold"))
  }

  /** DuckDB twin over `(scoreExpr, labelExpr)` rows of `fromSql`. */
  def sql(scoreExpr: String, labelExpr: String, fromSql: String): String =
    s"""WITH _th_b AS (SELECT CAST($scoreExpr AS DOUBLE) AS s, $labelExpr AS y
       |  FROM $fromSql
       |  WHERE $scoreExpr IS NOT NULL AND $labelExpr IS NOT NULL),
       |_th_g AS (SELECT s, count(*) AS c,
       |    sum(CASE WHEN y THEN 1 ELSE 0 END) AS p
       |  FROM _th_b GROUP BY s),
       |_th_t AS (SELECT CAST(sum(c) AS BIGINT) AS n, CAST(sum(p) AS BIGINT) AS np FROM _th_g),
       |_th_s AS (SELECT s,
       |    CAST(coalesce(sum(c) OVER (ORDER BY s
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cb,
       |    CAST(coalesce(sum(p) OVER (ORDER BY s
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS pb
       |  FROM _th_g),
       |_th_c AS (SELECT s AS threshold,
       |    np - pb AS tp,
       |    (n - cb) - (np - pb) AS fp,
       |    pb AS fn,
       |    (n - np) - ((n - cb) - (np - pb)) AS tn,
       |    np, n
       |  FROM _th_s, _th_t),
       |_th_m AS (SELECT threshold, tp, fp, fn, tn,
       |    CASE WHEN tp + fp > 0
       |      THEN round(CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE), 6) END AS precision,
       |    CASE WHEN np > 0
       |      THEN round(CAST(tp AS DOUBLE) / CAST(np AS DOUBLE), 6) END AS recall,
       |    CASE WHEN 2 * tp + fp + fn > 0
       |      THEN round(2.0 * CAST(tp AS DOUBLE) /
       |        CAST(2 * tp + fp + fn AS DOUBLE), 6) END AS f1
       |  FROM _th_c),
       |_th_best AS (SELECT coalesce(f1, -1.0) AS bf1, threshold AS bt FROM _th_m
       |  ORDER BY coalesce(f1, -1.0) DESC, threshold ASC LIMIT 1)
       |SELECT threshold, tp, fp, fn, tn, precision, recall, f1,
       |  (coalesce(f1, -1.0) = bf1 AND threshold = bt) AS chosen
       |FROM _th_m, _th_best
       |ORDER BY threshold""".stripMargin
}
