package graft.operators.vector

import graft.core.Deduplicator
import graft.functions.VectorFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Random-hyperplane LSH over embeddings (Charikar 2002 — the vector
  * twin of text SimHash): signature bit i is the sign of `v · r_i`
  * against `bits` fixed random hyperplanes, so
  * `P[bit match] = 1 − angle/π` and equal signatures mean
  * near-parallel vectors. First-wins dedup on the exact signature —
  * the cheap angular near-dup collapse that needs NO pairwise
  * distance computation at all, one tier below the verified-cosine
  * operators ([[EmbeddingCosineDedup]]).
  *
  * The hyperplanes are NOT runtime randomness (no Math.random —
  * resume-safety and oracle parity both forbid it): components come
  * from a splitmix64 stream seeded by (seed, bit, dim), materialized
  * at plan-build time as literals into BOTH engines — the Spark plan
  * gets them as a typed literal array, the DuckDB twin as inline list
  * literals (shortest-round-trip doubles, so both parse to identical
  * IEEE values and every dot product folds identically).
  *
  * Scale shape: the signature is a stateless per-row map (bits × dims
  * multiply-adds); the only shuffle is the 8-byte signature dedup
  * exchange — full vectors never ride it.
  */
final class EmbeddingSimHash(
    vecCol: String = "embedding",
    idCol: String = "id",
    orderCol: String = "id",
    bits: Int = 16,
    dims: Int = 64,
    seed: Long = 7L) extends Deduplicator {

  require(bits >= 1 && bits <= 63, s"bits $bits outside [1, 63]")
  require(dims >= 1, s"dims must be >= 1, got $dims")

  override val name = "embedding_simhash"

  private def splitmix(x0: Long): Long = {
    var z = x0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** `planes(i)(j)` in [-1, 1), deterministic in (seed, i, j). */
  val planes: Array[Array[Double]] = Array.tabulate(bits, dims) { (i, j) =>
    ((splitmix(seed + i.toLong * 65537L + j) >>> 11).toDouble /
      (1L << 53).toDouble) * 2.0 - 1.0
  }

  /** The `bits`-wide signature of a vector column as a long; NULL for a
    * NULL vector. Without the guard a NULL vector's NULL dots fell
    * through every `otherwise(0)` into signature 0 — silently merging
    * all no-embedding rows (e.g. empty docs from
    * [[HashedDocEmbedding]]) with any REAL vector whose dots are all
    * negative. NULL-signature rows still group together (no-content
    * rows are duplicates of each other) but never with a real vector.
    */
  def signature(v: Column): Column =
    when(v.isNull, lit(null).cast("long")).otherwise(
      planes.zipWithIndex.map { case (p, i) =>
        when(VectorFunctions.dot(v, typedlit(p.toSeq)) >= 0.0, lit(1L << i)).otherwise(lit(0L))
      }.reduce(_ + _))

  def key(df: DataFrame): Column = signature(col(vecCol))
  def order(df: DataFrame): Column = col(orderCol)
  def representative(df: DataFrame): Column = col(idCol)

  // ---- DuckDB twin ----

  private def planeLit(p: Array[Double]): String =
    p.map(_.toString).mkString("([", ", ", "])")

  /** DuckDB expression computing [[signature]] of `vecExpr`. */
  def signatureSql(vecExpr: String): String = {
    val sig = planes.zipWithIndex.map { case (p, i) =>
      s"(CASE WHEN ${VectorFunctions.dotSql(vecExpr, planeLit(p))} >= 0 " +
        s"THEN CAST(${1L << i} AS BIGINT) ELSE 0 END)"
    }.mkString("(", " + ", ")")
    s"(CASE WHEN $vecExpr IS NULL THEN NULL ELSE $sig END)"
  }
}
