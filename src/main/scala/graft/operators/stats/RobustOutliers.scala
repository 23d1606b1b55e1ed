package graft.operators.stats

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Median/MAD robust outlier detection on a numeric metric column — the
  * z-score's heavy-tail-safe sibling: a single 10⁹-char megadoc moves a
  * mean/stddev rule's threshold arbitrarily but moves the median/MAD
  * rule not at all (breakdown point 50%). Flags rows with
  * `|x − median| > k · MAD` (k≈5 corresponds to ~3.4σ under normality
  * via the 1.4826 consistency factor — callers pick k directly, no
  * factor is applied).
  *
  * Exactness: both medians use Spark's exact `percentile`, bit-identical
  * to DuckDB's `quantile_cont` (the [[graft.operators.text.LengthPercentileClipFilter]]
  * precedent); the verdict compares fixed-shape doubles both engines
  * derive identically. MAD = 0 (over half the values identical) means
  * ANY deviation flags — documented, deterministic.
  *
  * Scale shape: two scalar aggregates over the (column-pruned) metric —
  * median, then median of |x − m| with m broadcast — and one flagging
  * pass with both scalars broadcast; rows never shuffle. For corpora
  * past ~10⁸ rows swap `exact = false` for `percentile_approx` on the
  * same shapes (then the oracle contract weakens to rows-only, like the
  * profiler's HLL tier — the gate keeps exact).
  */
final class RobustOutliers(
    idCol: String,
    metricCol: String,
    k: Double = 5.0,
    exact: Boolean = true) {

  val name = "robust_outliers"
  require(k > 0, "k must be positive")

  private val fn = if (exact) "percentile" else "percentile_approx"

  /** Flagged rows: `(id, value, deviation)` ordered by id; `deviation` =
    * round(|x − median|, 4).
    */
  def apply(df: DataFrame): DataFrame = {
    // NULL/NaN excluded from the medians AND the verdict scan: Spark's
    // `>`/percentile and DuckDB's quantile_cont place NaN differently,
    // so a single NaN metric would silently diverge the engines
    val clean = df.filter(col(metricCol).isNotNull &&
      !isnan(col(metricCol).cast("double")))
    val med = clean.agg(expr(s"$fn($metricCol, 0.5D)").as("_med"))
    val mad = clean.crossJoin(broadcast(med))
      .agg(expr(s"$fn(abs($metricCol - _med), 0.5D)").as("_mad"),
        first(col("_med")).as("_med"))
    val dev: Column = abs(col(metricCol).cast("double") - col("_med"))
    clean.crossJoin(broadcast(mad))
      .filter(dev > lit(k) * col("_mad"))
      .select(col(idCol).as("id"),
        col(metricCol).cast("double").as("value"),
        round(dev, 4).as("deviation"))
      .orderBy(col("id"))
  }

  // ---- DuckDB twin (quantile_cont == exact percentile) ----

  def sql(table: String): String =
    s"""WITH _roc AS (SELECT * FROM $table
       |  WHERE $metricCol IS NOT NULL AND NOT isnan(CAST($metricCol AS DOUBLE))),
       |_rom AS (SELECT quantile_cont($metricCol, 0.5) AS med FROM _roc),
       |_rod AS (SELECT quantile_cont(abs($metricCol - med), 0.5) AS mad,
       |    first(med) AS med FROM _roc CROSS JOIN _rom)
       |SELECT $idCol AS id, CAST($metricCol AS DOUBLE) AS value,
       |  round(abs(CAST($metricCol AS DOUBLE) - med), 4) AS deviation
       |FROM _roc CROSS JOIN _rod
       |WHERE abs(CAST($metricCol AS DOUBLE) - med) > $k * mad
       |ORDER BY id""".stripMargin
}
