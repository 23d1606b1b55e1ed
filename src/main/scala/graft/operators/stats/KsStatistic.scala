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
  * shuffle), then an ordered window over the DISTINCT-VALUE table —
  * values ≪ rows for any metric worth monitoring (lengths, scores,
  * counts); a continuous metric should be quantized first.
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
    val ord = org.apache.spark.sql.expressions.Window.orderBy(col("v"))
      .rowsBetween(Long.MinValue, 0)
    val all = org.apache.spark.sql.expressions.Window
      .rowsBetween(Long.MinValue, Long.MaxValue)
    val withCum = perVal.select(
      sum(col("ca")).over(ord).as("cum_a"),
      sum(col("cb")).over(ord).as("cum_b"),
      sum(col("ca")).over(all).as("na"),
      sum(col("cb")).over(all).as("nb"))
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
    s"""WITH _kv AS (SELECT $metricCol AS v, ($groupCol = '$baseVal') AS b
       |  FROM $table WHERE $groupCol IN ('$baseVal', '$curVal')
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
