package graft.operators.text

import graft.core.RowFilter
import graft.functions.HashFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic hash-based sampling — reproducible corpus
  * downsampling, the standard way training pipelines cut data or carve
  * splits (beyond the reference's operator set, like the rest of the
  * training-data family). A row is kept iff
  * `hash(id ++ salt) mod 1e6 < fraction * 1e6`, so the SAME rows
  * survive on every run, on every cluster, regardless of partitioning —
  * unlike `df.sample`, whose output depends on partition layout and
  * seed plumbing. Different `salt` values give independent samples
  * (e.g. train/holdout carving). Pure expression: no shuffle, no state.
  */
final class DeterministicSampleFilter(
    fraction: Double,
    idCol: String = "id",
    hashName: String = "xxhash64",
    salt: String = "") extends RowFilter {

  require(fraction >= 0.0 && fraction <= 1.0, s"fraction $fraction outside [0, 1]")
  val name = "deterministic_sample"

  private val Buckets = 1000000L
  private val threshold = math.round(fraction * Buckets)

  def keep(df: DataFrame): Column =
    pmod(HashFunctions.hashByName(hashName)(
      concat(col(idCol).cast("string"), lit(salt))), lit(Buckets)) < threshold

  /** DuckDB twin (portable hash family). */
  def keepSql(idExpr: String): String = {
    require(hashName == "portable", "oracle covers the portable hash family")
    s"(${HashFunctions.portableHash64Sql(s"(CAST($idExpr AS VARCHAR) || '$salt')")} " +
      s"% $Buckets) < $threshold"
  }
}
