package graft.operators.stats

import graft.functions.HashFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

object DpExport {
  /** Where the Laplace uniform comes from. The MECHANISM (inverse-CDF
    * transform, sensitivity accounting, clipping, suppression) is shared
    * between sources; only the uniform stream differs.
    */
  sealed trait Noise

  /** Deterministic pseudo-noise: uniform = portable 64-bit hash of
    * (seed, salt, group key) masked to 53 bits. TEST/ORACLE-ONLY — the
    * noise is a pure function of the seed and the group key, so anyone
    * who knows (or guesses) the seed subtracts it exactly and recovers
    * the true count: this provides NO differential-privacy guarantee.
    * It exists because resume-safety and the DuckDB twin forbid real
    * randomness; the seed has no default so a caller must consciously
    * pick the deterministic path.
    */
  final case class HashNoise(seed: Long) extends Noise

  /** Production path: uniforms drawn from `java.security.SecureRandom`
    * via a nondeterministic UDF evaluated on the groups-sized aggregate
    * (one draw per published group — never on the row scan). Not
    * oracle-matchable by construction; spec-tested for mechanism
    * properties (suppression, perturbation, draw independence).
    */
  case object RandomNoise extends Noise

  // One SecureRandom per executor thread; getInstanceStrong would block
  // on entropy — the default constructor's NativePRNG/SHA1PRNG is the
  // vetted non-blocking choice.
  private val rng: ThreadLocal[java.security.SecureRandom] =
    ThreadLocal.withInitial(() => new java.security.SecureRandom())

  private[stats] val secureUniform =
    udf(() => rng.get().nextDouble()).asNondeterministic()
}

/** Differentially-private aggregate export (Laplace mechanism) with
  * small-group suppression — the "publish corpus statistics without
  * leaking membership" step: per-group counts get Laplace(1/ε) noise
  * (sensitivity 1 for a count), and groups below `minGroupSize` are
  * suppressed entirely (the k-anonymity guard for the long tail where
  * even noisy counts identify).
  *
  * Noise source is explicit ([[DpExport.Noise]]): [[DpExport.RandomNoise]]
  * (SecureRandom, the production path) or [[DpExport.HashNoise]] (a
  * deterministic pseudo-DP stream for oracle parity and resume-safe
  * tests — see its scaladoc for why it is NOT private). Both run the
  * identical inverse-CDF transform `-b·sign(u−½)·ln(1−2|u−½|)` in
  * fixed-shape double arithmetic over the same clipped exact-BIGINT
  * aggregates.
  *
  * Scale shape: one partial-aggregated groupBy(key); noise is a scalar
  * expression on the (groups-sized) aggregate — no second scan.
  */
final class DpExport(
    groupCol: String,
    epsilon: Double = 1.0,
    minGroupSize: Long = 10L,
    noise: DpExport.Noise) {

  require(epsilon > 0.0, s"epsilon must be positive, got $epsilon")
  val name = "dp_noisy_counts"

  private val Mask53 = (1L << 53) - 1

  /** Uniform in [0,1) for this group row; `salt` separates the count
    * and sum streams so their draws are independent.
    */
  private def uniform(salt: String): Column = noise match {
    case DpExport.HashNoise(seed) =>
      HashFunctions.portableHash64(
          concat(lit(seed.toString), lit(salt), col(groupCol).cast("string")))
        .bitwiseAND(lit(Mask53)).cast("double") / lit(Mask53.toDouble + 1.0)
    case DpExport.RandomNoise => DpExport.secureUniform()
  }

  /** Laplace(b) via inverse CDF — the shared mechanism core. */
  private def laplace(u: Column, b: Double): Column = {
    val centered = u - lit(0.5)
    -lit(b) * signum(centered) * log(lit(1.0) - lit(2.0) * abs(centered))
  }

  /** `(groupCol, noisy_count)` for groups of size ≥ `minGroupSize`;
    * noisy counts round to 3 decimals and floor at 0.
    */
  def apply(df: DataFrame): DataFrame = {
    val noiseCol = laplace(uniform("|"), 1.0 / epsilon)
    df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("_n"))
      .filter(col("_n") >= minGroupSize)
      .select(col(groupCol),
        round(greatest(lit(0.0), col("_n").cast("double") + noiseCol), 3)
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
    * salted differently so count and sum noise are independent draws.
    */
  def noisySums(df: DataFrame, metric: Column, clip: Long): DataFrame = {
    require(clip > 0, s"clip must be positive, got $clip")
    val noiseCol = laplace(uniform("|sum|"), clip.toDouble / epsilon)
    df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("_n"),
        sum(greatest(least(metric.cast("long"), lit(clip)), lit(0L))).as("_s"))
      .filter(col("_n") >= minGroupSize)
      .select(col(groupCol),
        round(greatest(lit(0.0), col("_s").cast("double") + noiseCol), 3)
          .as("noisy_sum"))
      .orderBy(col(groupCol))
  }

  // ---- DuckDB twin (HashNoise only: same hash, same transform) ----

  private def hashSeed: Long = noise match {
    case DpExport.HashNoise(seed) => seed
    case DpExport.RandomNoise => throw new IllegalStateException(
      "RandomNoise has no SQL twin — the production path is nondeterministic by design")
  }

  def noisySumsSql(table: String, metricExpr: String, clip: Long): String = {
    val h = HashFunctions.portableHash64Sql(
      s"('${hashSeed}' || '|sum|' || CAST($groupCol AS VARCHAR))")
    val u = s"(CAST(($h) & $Mask53 AS DOUBLE) / ${Mask53.toDouble + 1.0})"
    val centered = s"($u - 0.5)"
    val noiseSql =
      s"(-(${clip.toDouble} / $epsilon) * sign($centered) * ln(1.0 - 2.0 * abs($centered)))"
    s"""WITH _dsg AS (SELECT $groupCol, count(*) AS n,
       |    CAST(sum(greatest(least(CAST($metricExpr AS BIGINT), $clip), 0)) AS BIGINT) AS s
       |  FROM $table GROUP BY $groupCol HAVING count(*) >= $minGroupSize)
       |SELECT $groupCol,
       |  round(greatest(CAST(0.0 AS DOUBLE), CAST(s AS DOUBLE) + $noiseSql), 3) AS noisy_sum
       |FROM _dsg ORDER BY $groupCol""".stripMargin
  }

  def sql(table: String): String = {
    val h = HashFunctions.portableHash64Sql(
      s"('${hashSeed}' || '|' || CAST($groupCol AS VARCHAR))")
    val u = s"(CAST(($h) & $Mask53 AS DOUBLE) / ${Mask53.toDouble + 1.0})"
    val centered = s"($u - 0.5)"
    val noiseSql = s"(-(1.0 / $epsilon) * sign($centered) * ln(1.0 - 2.0 * abs($centered)))"
    s"""WITH _dg AS (SELECT $groupCol, count(*) AS n FROM $table
       |  GROUP BY $groupCol HAVING count(*) >= $minGroupSize)
       |SELECT $groupCol,
       |  round(greatest(CAST(0.0 AS DOUBLE), CAST(n AS DOUBLE) + $noiseSql), 3) AS noisy_count
       |FROM _dg ORDER BY $groupCol""".stripMargin
  }
}
