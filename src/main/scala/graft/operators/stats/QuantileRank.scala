package graft.operators.stats

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-relative quantile-rank transform: attach each row's
  * tie-averaged percentile of `metricCol` (in (0,1]) — the rank-based
  * normalization curriculum schedules and cross-corpus score
  * comparisons need (a raw LM score means nothing across corpora; its
  * quantile does).
  *
  * Percentile definition: `pct(v) = (below(v) + (c(v)+1)/2) / n` —
  * the average rank of the tied group over n, identical for every row
  * of equal value, so the output is deterministic under any
  * partitioning.
  *
  * Scale shape: a partition-less `rank().over(orderBy)` would be the
  * single-partition trap; instead the DISTINCT-value table (values ≪
  * rows) goes through the [[graft.operators.ml.BinaryAuc]] /
  * [[graft.operators.text.TokenBudgetSample]] two-level prefix-sum
  * decomposition — range-partitioned per-slice running sums plus
  * broadcast partition offsets — and the per-value percentile joins
  * back to the rows on the value key. Rows shuffle once (the
  * value-keyed join); ranks never ride a global window.
  */
final class QuantileRank(
    metricCol: String,
    outCol: String = "quantile_rank") {

  val name = "quantile_rank"

  /** `(value, pct)` for every DISTINCT metric value. */
  def valueTable(df: DataFrame): DataFrame = {
    val grouped = df.select(col(metricCol).cast("double").as("_v"))
      .filter(col("_v").isNotNull && !isnan(col("_v")))
      .groupBy(col("_v")).agg(count(lit(1)).as("_c"))
    // the distinct-value table (values ≪ rows) is checkpointed ONCE so
    // all downstream consumers — the offsets derivation, the total, and
    // the final join — read materialized rows instead of re-deriving the
    // corpus aggregate + range shuffle per consumer (the psiPerGroup
    // column-pruning-defeats-exchange-reuse lesson)
    val parts = graft.core.Staging.stage(grouped
      .repartitionByRange(col("_v"))
      .sortWithinPartitions(col("_v"))
      .withColumn("_pid", spark_partition_id()))
    val offsets = parts.groupBy(col("_pid")).agg(sum(col("_c")).as("_psum"))
      .withColumn("_off", coalesce(sum(col("_psum"))
        .over(Window.orderBy(col("_pid"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    // the offsets window is partition-less but rides ONE row per range
    // partition — bounded by the shuffle partition count; the TOTAL is a
    // scalar off the checkpointed offsets, never an unpartitioned window
    // over the (potentially row-count-sized) distinct-value table
    val total = offsets.agg(sum(col("_psum")).as("_n"))
    val sliceW = Window.partitionBy(col("_pid")).orderBy(col("_v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    parts
      .join(broadcast(offsets.select(col("_pid").as("_opid"), col("_off"))),
        parts("_pid") === col("_opid"))
      .crossJoin(broadcast(total))
      .withColumn("_below", col("_off") + sum(col("_c")).over(sliceW) - col("_c"))
      .select(col("_v"),
        ((col("_below").cast("double") + (col("_c") + 1).cast("double") / 2.0)
          / col("_n").cast("double")).as("_pct"))
  }

  /** The input plus `outCol` (round 6); NULL for NULL/NaN metrics. */
  def apply(df: DataFrame): DataFrame = {
    val vt = valueTable(df)
    df.join(vt, df(metricCol).cast("double") === vt("_v"), "left")
      .withColumn(outCol, round(col("_pct"), 6))
      .drop("_v", "_pct")
  }

  // ---- DuckDB twin: the single-window form of the same algebra ----

  /** Percentile expression usable per row of `table`; the oracle pays
    * one global window (fine for a verification engine).
    */
  def sqlProjection(table: String, cols: String, metricExpr: String): String =
    s"""SELECT $cols,
       |  round((CAST(rank() OVER (ORDER BY CAST($metricExpr AS DOUBLE)) - 1 AS DOUBLE)
       |    + (CAST(count(*) OVER (PARTITION BY CAST($metricExpr AS DOUBLE)) AS DOUBLE) + 1) / 2.0)
       |    / CAST(count(*) OVER () AS DOUBLE), 6) AS $outCol
       |FROM $table WHERE $metricExpr IS NOT NULL AND NOT isnan(CAST($metricExpr AS DOUBLE))""".stripMargin
}
