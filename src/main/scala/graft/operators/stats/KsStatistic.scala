package graft.operators.stats

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Two-sample Kolmogorov–Smirnov statistic between two corpus slices —
  * the bucketless companion to [[DistributionDrift]]: `D = max_v
  * |F_base(v) − F_cur(v)|` over the empirical CDFs of a metric. PSI
  * answers "how much did the shape move" through a fixed binning; KS
  * answers "what is the single largest CDF gap" with no binning
  * choice at all, so the pair catches drifts the other's
  * parameterization hides.
  *
  * Exactness: per-value counts are exact BIGINTs off one conditional
  * aggregate; cumulative counts are windows ORDERED BY the metric
  * value (deterministic — distinct values are unique keys); each CDF
  * gap is a fixed-shape double over exact integers, and the final
  * reduction is MAX — associative, commutative, and precision-free,
  * so no floor-scaling is even needed. The DuckDB twin replays it
  * bit-for-bit.
  *
  * Scale shape: one value-keyed partial aggregate (the histogram
  * shuffle), then — because an unquantized double-valued metric makes
  * the distinct-value table row-count-sized — the cumulative counts
  * ride the [[QuantileRank]] two-level prefix-sum decomposition
  * (range-partitioned per-slice running sums + broadcast partition
  * offsets), never a partition-less ordered window. The only global
  * window is one row per range partition (bounded by the shuffle
  * partition count).
  */
final class KsStatistic(
    metricCol: String,
    groupCol: String,
    baseVal: String,
    curVal: String) {

  val name = "ks_statistic"

  /** One row: `(n_base, n_cur, ks)`; null KS when either slice is
    * empty (no CDF to compare). The metric must be NUMERIC; NULL/NaN
    * values are excluded from both CDFs (the engines disagree on where
    * nulls sort, so including them would put their mass at opposite
    * ends of the distribution).
    */
  def apply(df: DataFrame): DataFrame = {
    val perVal = df.filter(col(groupCol).isin(baseVal, curVal) &&
        col(metricCol).isNotNull && !isnan(col(metricCol).cast("double")))
      .select(col(metricCol).as("v"), (col(groupCol) === baseVal).as("_b"))
      .groupBy(col("v"))
      .agg(count(when(col("_b"), lit(1))).as("ca"),
        count(when(!col("_b"), lit(1))).as("cb"))
    import org.apache.spark.sql.expressions.Window
    // distinct-value table persisted ONCE so the offsets derivation, the
    // totals, and the cumulative join all read materialized rows (the
    // psiPerGroup column-pruning-defeats-exchange-reuse lesson)
    val parts = graft.core.Staging.stage(perVal
      .repartitionByRange(col("v"))
      .sortWithinPartitions(col("v"))
      .withColumn("_pid", spark_partition_id()))
    val pidW = Window.orderBy(col("_pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    // ONE row per range partition — the only partition-less window,
    // bounded by spark.sql.shuffle.partitions
    val offsets = parts.groupBy(col("_pid"))
      .agg(sum(col("ca")).as("_pa"), sum(col("cb")).as("_pb"))
      .withColumn("_offa", coalesce(sum(col("_pa")).over(pidW), lit(0L)))
      .withColumn("_offb", coalesce(sum(col("_pb")).over(pidW), lit(0L)))
    val total = offsets.agg(sum(col("_pa")).as("na"), sum(col("_pb")).as("nb"))
    val sliceW = Window.partitionBy(col("_pid")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withCum = parts
      .join(broadcast(offsets.select(col("_pid").as("_opid"),
        col("_offa"), col("_offb"))), col("_pid") === col("_opid"))
      .crossJoin(broadcast(total))
      .select(
        (col("_offa") + sum(col("ca")).over(sliceW)).as("cum_a"),
        (col("_offb") + sum(col("cb")).over(sliceW)).as("cum_b"),
        col("na"), col("nb"))
    val gap = abs(col("cum_a").cast("double") / col("na").cast("double") -
      col("cum_b").cast("double") / col("nb").cast("double"))
    withCum
      .agg(coalesce(first(col("na")), lit(0L)).as("n_base"),
        coalesce(first(col("nb")), lit(0L)).as("n_cur"),
        max(when(col("na") > 0L && col("nb") > 0L, gap)).as("_d"))
      .select(col("n_base"), col("n_cur"),
        when(col("_d").isNotNull, round(col("_d"), 6)).as("ks"))
  }

  // ---- DuckDB twin (same window shapes) ----

  def sql(table: String): String =
    s"""WITH _kv AS (SELECT $metricCol AS v,
       |    ($groupCol = '${graft.functions.TextFunctions.sqlLit(baseVal)}') AS b
       |  FROM $table WHERE $groupCol IN ('${graft.functions.TextFunctions.sqlLit(baseVal)}',
       |    '${graft.functions.TextFunctions.sqlLit(curVal)}')
       |    AND $metricCol IS NOT NULL AND NOT isnan(CAST($metricCol AS DOUBLE))),
       |_kc AS (SELECT v, count(CASE WHEN b THEN 1 END) AS ca,
       |    count(CASE WHEN NOT b THEN 1 END) AS cb
       |  FROM _kv GROUP BY v),
       |_kw AS (SELECT
       |    sum(ca) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cum_a,
       |    sum(cb) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cum_b,
       |    sum(ca) OVER () AS na, sum(cb) OVER () AS nb
       |  FROM _kc)
       |SELECT CAST(coalesce(first(na), 0) AS BIGINT) AS n_base,
       |  CAST(coalesce(first(nb), 0) AS BIGINT) AS n_cur,
       |  CASE WHEN max(CASE WHEN na > 0 AND nb > 0 THEN
       |      abs(CAST(cum_a AS DOUBLE) / CAST(na AS DOUBLE)
       |        - CAST(cum_b AS DOUBLE) / CAST(nb AS DOUBLE)) END) IS NOT NULL
       |    THEN round(max(CASE WHEN na > 0 AND nb > 0 THEN
       |      abs(CAST(cum_a AS DOUBLE) / CAST(na AS DOUBLE)
       |        - CAST(cum_b AS DOUBLE) / CAST(nb AS DOUBLE)) END), 6)
       |  END AS ks
       |FROM _kw""".stripMargin
}
