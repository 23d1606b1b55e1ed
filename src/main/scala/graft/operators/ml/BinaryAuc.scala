package graft.operators.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed ROC-AUC via the rank-sum identity (Mann–Whitney U):
  * `AUC = (Σ ranks(positives) − n₊(n₊+1)/2) / (n₊·n₋)` with average
  * ranks over score ties — the evaluation loop for every model-based
  * curation signal (quality classifier, aesthetic scorer, language
  * scores) against a labeled sample. The naive definition is an
  * O(n₊·n₋) pairwise comparison; the rank form is one global sort and
  * one aggregate, which is how AUC is actually computed at 10⁹ rows
  * (spark.ml's BinaryClassificationMetrics approximates with
  * thresholds; this is the exact form).
  *
  * Tie handling: average rank per tied score group, computed as
  * `avg(rank) = firstRank + (tieCount−1)/2` from a dense window over
  * the score — identical algebra in the DuckDB twin, and every
  * quantity is a small-integer-valued double, so the division at the
  * end is the only inexact step (same operand order both engines).
  *
  * Scale note: ranking shuffles `(score, label)` pairs once — 16 bytes
  * per row on the wire; the range-partitioned sort is Spark's standard
  * global-rank shape. No pair materialization ever.
  */
object BinaryAuc {

  /** One row: `(auc, n_pos, n_neg)` over `scoreCol` against boolean
    * `labelCol` (true = positive). Rows with null score or label are
    * excluded (both engines).
    *
    * Distributed rank shape: a partition-less `rank().over(orderBy(s))`
    * would pull every row into ONE window task — the single-partition
    * trap. Instead: (1) collapse to one row per DISTINCT score with its
    * row/positive counts (a normal shuffle), (2) range-partition those
    * by score, (3) per-partition running sums plus broadcast partition
    * offsets give each score group its global count-below — the
    * [[graft.operators.text.TokenBudgetSample]] two-level prefix-sum
    * decomposition, exact regardless of where the range boundaries
    * land. The tie-averaged rank algebra
    * `avgRank(s) = cntBelow(s) + (cnt(s)+1)/2` then folds into the
    * final single-row aggregate.
    */
  def auc(df: DataFrame, scoreCol: Column, labelCol: Column): DataFrame = {
    val base = df.select(scoreCol.cast("double").as("_s"), labelCol.as("_y"))
      .filter(col("_s").isNotNull && col("_y").isNotNull)
    val grouped = base.groupBy(col("_s")).agg(
      count(lit(1)).as("_c"),
      sum(when(col("_y"), 1L).otherwise(0L)).as("_p"))
    val parts = grouped
      .repartitionByRange(col("_s"))
      .sortWithinPartitions(col("_s"))
      .withColumn("_pid", spark_partition_id())
    val offsets = parts.groupBy(col("_pid")).agg(sum(col("_c")).as("_psum"))
      .withColumn("_off", coalesce(sum(col("_psum"))
        .over(Window.orderBy(col("_pid"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("_pid").as("_opid"), col("_off"))
    // the offsets window IS partition-less, but over one row per range
    // partition — bounded by the shuffle partition count, not the data
    val sliceW = Window.partitionBy(col("_pid")).orderBy(col("_s"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ranked = parts
      .join(broadcast(offsets), parts("_pid") === offsets("_opid"))
      .withColumn("_below", col("_off") + sum(col("_c")).over(sliceW) - col("_c"))
      .withColumn("_ar",
        col("_below").cast("double") + (col("_c") + 1).cast("double") / 2.0)
    ranked.agg(
      sum(col("_p").cast("double") * col("_ar")).as("_rp"),
      sum(col("_p")).as("n_pos"),
      sum(col("_c") - col("_p")).as("n_neg"))
      .select(
        round(((col("_rp") - col("n_pos").cast("double") *
          (col("n_pos") + 1).cast("double") / 2.0) /
          (col("n_pos").cast("double") * col("n_neg").cast("double"))), 9).as("auc"),
        col("n_pos"), col("n_neg"))
  }

  /** DuckDB twin over `(scoreExpr, labelExpr)` rows of `fromSql`;
    * returns the same `(auc, n_pos, n_neg)` row.
    */
  def sql(scoreExpr: String, labelExpr: String, fromSql: String): String =
    s"""WITH _auc_b AS (SELECT CAST($scoreExpr AS DOUBLE) AS s, $labelExpr AS y
       |  FROM $fromSql
       |  WHERE $scoreExpr IS NOT NULL AND $labelExpr IS NOT NULL),
       |_auc_r AS (SELECT s, y,
       |    rank() OVER (ORDER BY s) AS r,
       |    count(*) OVER (PARTITION BY s) AS t FROM _auc_b),
       |_auc_a AS (SELECT y, CAST(r AS DOUBLE) + CAST(t - 1 AS DOUBLE) / 2.0 AS ar
       |  FROM _auc_r)
       |SELECT round((sum(CASE WHEN y THEN ar END) -
       |    CAST(sum(CASE WHEN y THEN 1 ELSE 0 END) AS DOUBLE) *
       |    CAST(sum(CASE WHEN y THEN 1 ELSE 0 END) + 1 AS DOUBLE) / 2.0) /
       |    (CAST(sum(CASE WHEN y THEN 1 ELSE 0 END) AS DOUBLE) *
       |     CAST(sum(CASE WHEN NOT y THEN 1 ELSE 0 END) AS DOUBLE)), 9) AS auc,
       |  CAST(sum(CASE WHEN y THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
       |  CAST(sum(CASE WHEN NOT y THEN 1 ELSE 0 END) AS BIGINT) AS n_neg
       |FROM _auc_a""".stripMargin
}
