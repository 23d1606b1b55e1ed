package graft.operators.text

import graft.core.RowFilter
import graft.functions.HashFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-source weighted sampling — the "data mixing" step of a training
  * pipeline (DoReMi / The Pile style): each source keeps a configured
  * fraction of its rows so the output corpus hits target domain
  * proportions. Deterministic like [[DeterministicSampleFilter]] — keep
  * iff `hash(id ++ salt) mod 1e6 < fraction(source) * 1e6` — so the mix
  * is reproducible across runs and partition layouts. Sources absent
  * from the map keep `defaultFraction`. Pure expression (the weight
  * lookup folds to a literal CASE chain): no shuffle, no state, fully
  * codegen'd.
  */
final class SourceWeightedSampleFilter(
    weights: Map[String, Double],
    defaultFraction: Double = 1.0,
    sourceCol: String = "source",
    idCol: String = "id",
    hashName: String = "xxhash64",
    salt: String = "") extends RowFilter {

  (weights.values.toSeq :+ defaultFraction).foreach(f =>
    require(f >= 0.0 && f <= 1.0, s"fraction $f outside [0, 1]"))
  val name = "source_weighted_sample"

  private val Buckets = 1000000L
  private def thresholdOf(f: Double): Long = math.round(f * Buckets)

  /** Per-row keep threshold: CASE over the weight map, sorted for a
    * deterministic expression tree.
    */
  private def threshold: Column =
    weights.toSeq.sortBy(_._1).foldLeft(lit(thresholdOf(defaultFraction))) {
      case (acc, (src, f)) =>
        when(col(sourceCol) === src, lit(thresholdOf(f))).otherwise(acc)
    }

  def keep(df: DataFrame): Column =
    pmod(HashFunctions.hashByName(hashName)(
      concat(col(idCol).cast("string"), lit(salt))), lit(Buckets)) < threshold

  /** DuckDB twin (portable hash family). */
  def keepSql(idExpr: String, sourceExpr: String): String = {
    require(hashName == "portable", "oracle covers the portable hash family")
    val cases = weights.toSeq.sortBy(_._1).reverse
      .map { case (src, f) => s"WHEN $sourceExpr = '$src' THEN ${thresholdOf(f)}" }
      .mkString(" ")
    val thr = s"(CASE $cases ELSE ${thresholdOf(defaultFraction)} END)"
    s"(${HashFunctions.portableHash64Sql(s"(CAST($idExpr AS VARCHAR) || '$salt')")} " +
      s"% $Buckets) < $thr"
  }
}
