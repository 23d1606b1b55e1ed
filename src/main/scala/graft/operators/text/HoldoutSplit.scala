package graft.operators.text

import graft.core.Operator
import graft.functions.HashFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic train/validation split tagging — the holdout carve
  * every training pipeline needs BEFORE any corpus-global statistics
  * are computed (so the validation set never leaks into dedup
  * representatives, LM counts, or percentile thresholds). A row lands
  * in `val` iff `hash(id ++ salt) mod 1e6 < valFraction·1e6`; the same
  * document gets the same split on every run, cluster, and partition
  * layout, and different salts give independent carves.
  *
  * A refiner, not a filter: both halves stay in the frame (tagged in
  * `outputCol`) so one scan feeds both sides; filter on the tag to
  * materialize a half. Pure per-row expression — no shuffle, no state.
  */
final class HoldoutSplitRefiner(
    valFraction: Double = 0.01,
    idCol: String = "id",
    hashName: String = "xxhash64",
    salt: String = "",
    outputCol: String = "split") extends Operator {

  require(valFraction >= 0.0 && valFraction <= 1.0,
    s"valFraction $valFraction outside [0, 1]")
  val name = "holdout_split"

  private val Buckets = 1000000L
  private val threshold = math.round(valFraction * Buckets)

  private def bucketOf: Column =
    pmod(HashFunctions.hashByName(hashName)(
      concat(col(idCol).cast("string"), lit(salt))), lit(Buckets))

  def apply(df: DataFrame): DataFrame =
    df.withColumn(outputCol, when(bucketOf < threshold, lit("val")).otherwise(lit("train")))

  /** DuckDB twin of the split expression (portable hash family). */
  def splitSql(idExpr: String): String = {
    require(hashName == "portable", "oracle covers the portable hash family")
    s"(CASE WHEN (${HashFunctions.portableHash64Sql(s"(CAST($idExpr AS VARCHAR) || '$salt')")} " +
      s"% $Buckets) < $threshold THEN 'val' ELSE 'train' END)"
  }
}
