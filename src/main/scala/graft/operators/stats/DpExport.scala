package graft.operators.stats

import graft.functions.HashFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Differentially-private aggregate export (Laplace mechanism) with
  * small-group suppression — the "publish corpus statistics without
  * leaking membership" step: per-group counts get Laplace(1/ε) noise
  * (sensitivity 1 for a count), and groups below `minGroupSize` are
  * suppressed entirely (the k-anonymity guard for the long tail where
  * even noisy counts identify).
  *
  * Determinism discipline (resume-safety and the oracle forbid real
  * randomness — the [[graft.operators.vector.ProductQuantizer]] rule):
  * the noise uniform comes from the PORTABLE 64-bit hash of
  * (seed, group key) masked to 53 bits — bit-reproducible in both
  * engines — and Laplace noise is the inverse-CDF transform
  * `-b·sign(u−½)·ln(1−2|u−½|)` in fixed-shape double arithmetic.
  * Production would swap the hash stream for a vetted DP library's
  * sampler; the mechanism, sensitivity accounting, and export shape
  * are exactly this.
  *
  * Scale shape: one partial-aggregated groupBy(key); noise is a scalar
  * expression on the (groups-sized) aggregate — no second scan.
  */
final class DpExport(
    groupCol: String,
    epsilon: Double = 1.0,
    minGroupSize: Long = 10L,
    seed: Long = 42L) {

  require(epsilon > 0.0, s"epsilon must be positive, got $epsilon")
  val name = "dp_noisy_counts"

  private val Mask53 = (1L << 53) - 1

  /** `(groupCol, noisy_count)` for groups of size ≥ `minGroupSize`;
    * noisy counts round to 3 decimals and floor at 0.
    */
  def apply(df: DataFrame): DataFrame = {
    val u = (HashFunctions.portableHash64(
        concat(lit(seed.toString), lit("|"), col(groupCol).cast("string")))
      .bitwiseAND(lit(Mask53)).cast("double") / lit(Mask53.toDouble + 1.0))
    val centered = u - lit(0.5)
    val b = lit(1.0 / epsilon)
    val noise = -b * signum(centered) * log(lit(1.0) - lit(2.0) * abs(centered))
    df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("_n"))
      .filter(col("_n") >= minGroupSize)
      .select(col(groupCol),
        round(greatest(lit(0.0), col("_n").cast("double") + noise), 3)
          .as("noisy_count"))
      .orderBy(col(groupCol))
  }

  /** DP noisy SUM of an integer metric with per-record CLIPPING — the
    * other half of the mechanism: a sum's sensitivity is unbounded
    * until each record's contribution is clamped into [0, clip] (BOTH
    * bounds — an unclipped negative record would shift the total
    * arbitrarily while the noise stays calibrated to `clip`), after
    * which Laplace(clip/ε) covers the worst-case single-record
    * influence. Clipped totals stay exact BIGINTs; the noise stream is
    * the same portable hash (salted differently so count and sum noise
    * are independent draws).
    */
  def noisySums(df: DataFrame, metric: Column, clip: Long): DataFrame = {
    require(clip > 0, s"clip must be positive, got $clip")
    val u = (HashFunctions.portableHash64(
        concat(lit(seed.toString), lit("|sum|"), col(groupCol).cast("string")))
      .bitwiseAND(lit(Mask53)).cast("double") / lit(Mask53.toDouble + 1.0))
    val centered = u - lit(0.5)
    val b = lit(clip.toDouble / epsilon)
    val noise = -b * signum(centered) * log(lit(1.0) - lit(2.0) * abs(centered))
    df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("_n"),
        sum(greatest(least(metric.cast("long"), lit(clip)), lit(0L))).as("_s"))
      .filter(col("_n") >= minGroupSize)
      .select(col(groupCol),
        round(greatest(lit(0.0), col("_s").cast("double") + noise), 3)
          .as("noisy_sum"))
      .orderBy(col(groupCol))
  }

  // ---- DuckDB twin (same hash, same fixed-shape transform) ----

  def noisySumsSql(table: String, metricExpr: String, clip: Long): String = {
    val h = HashFunctions.portableHash64Sql(
      s"('${seed}' || '|sum|' || CAST($groupCol AS VARCHAR))")
    val u = s"(CAST(($h) & $Mask53 AS DOUBLE) / ${Mask53.toDouble + 1.0})"
    val centered = s"($u - 0.5)"
    val noise =
      s"(-(${clip.toDouble} / $epsilon) * sign($centered) * ln(1.0 - 2.0 * abs($centered)))"
    s"""WITH _dsg AS (SELECT $groupCol, count(*) AS n,
       |    CAST(sum(greatest(least(CAST($metricExpr AS BIGINT), $clip), 0)) AS BIGINT) AS s
       |  FROM $table GROUP BY $groupCol HAVING count(*) >= $minGroupSize)
       |SELECT $groupCol,
       |  round(greatest(CAST(0.0 AS DOUBLE), CAST(s AS DOUBLE) + $noise), 3) AS noisy_sum
       |FROM _dsg ORDER BY $groupCol""".stripMargin
  }

  def sql(table: String): String = {
    val h = HashFunctions.portableHash64Sql(
      s"('${seed}' || '|' || CAST($groupCol AS VARCHAR))")
    val u = s"(CAST(($h) & $Mask53 AS DOUBLE) / ${Mask53.toDouble + 1.0})"
    val centered = s"($u - 0.5)"
    val noise = s"(-(1.0 / $epsilon) * sign($centered) * ln(1.0 - 2.0 * abs($centered)))"
    s"""WITH _dg AS (SELECT $groupCol, count(*) AS n FROM $table
       |  GROUP BY $groupCol HAVING count(*) >= $minGroupSize)
       |SELECT $groupCol,
       |  round(greatest(CAST(0.0 AS DOUBLE), CAST(n AS DOUBLE) + $noise), 3) AS noisy_count
       |FROM _dg ORDER BY $groupCol""".stripMargin
  }
}
