package graft.operators.dedup

import graft.core.Deduplicator
import graft.functions.{HashFunctions, TextFunctions}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SimHash document fingerprint + first-wins dedup on the fingerprint.
  *
  * SimHash (Charikar 2002, as used by Manku et al. WWW'07 for web dedup):
  * for each bit position b, sum +1/-1 over the distinct tokens' hash bit b;
  * fingerprint bit b is 1 iff the sum is positive. Documents with equal
  * fingerprints are near-duplicates; first occurrence (by `orderCol`) wins.
  *
  * This implementation dedups on EXACT fingerprint equality; the
  * hamming-distance ≤ k variant is [[SimHashNearDedup]] (block-permutation
  * join — exact-equality is its k=0 case).
  *
  * The whole fingerprint is one Catalyst expression (unrolled over bit
  * positions at plan-build time — `shiftright` needs literal shifts), so it
  * rides whole-stage codegen; the only shuffle is the dedup key exchange.
  *
  * @param bits fingerprint width (32 default keeps the oracle SQL tractable;
  *             64 for production)
  */
final class SimHashDedup(
    textCol: String = "text",
    idCol: String = "id",
    orderCol: String = "id",
    bits: Int = 32,
    portableHashes: Boolean = true) extends Deduplicator {

  require(bits >= 1 && bits <= 63)

  override val name = "simhash_dedup"

  /** SimHash fingerprint of a text column as a long (one JVM loop per row
    * via kernels.SimHash — token hashing inlined — instead of `bits`
    * interpreted array-aggregates).
    */
  def simhash(text: Column): Column =
    graft.plans.kernels.simhash_bits(array_distinct(TextFunctions.tokensOf(text)), bits)

  def key(df: DataFrame): Column = simhash(col(textCol))
  def order(df: DataFrame): Column = col(orderCol)
  def representative(df: DataFrame): Column = col(idCol)

  // ---- DuckDB twin ----

  /** DuckDB expression computing [[simhash]] of `textExpr` (portable hash). */
  def simhashSql(textExpr: String): String = {
    require(portableHashes)
    val h = HashFunctions.portableHash64Sql("x")
    s"""CAST(list_sum(list_transform(range(0, $bits), b ->
       |  CASE WHEN list_sum(list_transform(
       |      list_transform(list_distinct(${TextFunctions.tokensOfSql(textExpr)}), x -> $h),
       |      h -> CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END)) > 0
       |    THEN CAST(1 AS BIGINT) << b ELSE 0 END)) AS BIGINT)""".stripMargin.replace("\n", " ")
  }
}
