package graft.operators.dedup

import graft.core.Deduplicator
import graft.functions.{HashFunctions, TextFunctions}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Generic first-wins exact deduplication on an arbitrary key expression.
  * The shuffle on the (hashed, fixed-width) key is the distributed state;
  * see [[graft.core.Deduplicator]] for the scale analysis.
  */
final class ExactDedup(
    override val name: String,
    keyExpr: DataFrame => Column,
    orderCol: String,
    repCol: String) extends Deduplicator {
  def key(df: DataFrame): Column = keyExpr(df)
  def order(df: DataFrame): Column = col(orderCol)
  def representative(df: DataFrame): Column = col(repCol)
}

/** Text exact-dedup key semantics of the reference's TextExactDeduplicator
  * (reference: operators/dedup/text_exact_dedup.py:22-114):
  * normalize (collapse whitespace, lowercase — both optional), optionally
  * prefix with `url|` (FineWeb-style URL+content dedup), hash
  * (xxhash64 default / md5 / sha256 / portable), and for missing or empty
  * text fall back to the record id as the key (text_exact_dedup.py:96-99).
  * Keys are strings because the id fallback is (reference behavior).
  */
object TextExactDedup {
  def apply(
      textCol: String = "text",
      idCol: String = "id",
      orderCol: String = "id",
      hashAlgorithm: String = "xxhash64",
      normalizeWhitespace: Boolean = true,
      lowercase: Boolean = true,
      includeUrl: Boolean = false,
      urlCol: String = "url"): ExactDedup = {
    def keyOf(df: DataFrame): Column = {
      val t = col(textCol)
      var normalized: Column = t
      if (normalizeWhitespace) normalized = trim(regexp_replace(normalized, "\\s+", " "))
      if (lowercase) normalized = lower(normalized)
      val content =
        if (includeUrl) concat_ws("|", coalesce(col(urlCol), lit("")), normalized)
        else normalized
      val hashed = HashFunctions.hashByName(hashAlgorithm)(content).cast("string")
      when(t.isNull || t === "", col(idCol).cast("string")).otherwise(hashed)
    }
    new ExactDedup("text_exact_dedup", keyOf, orderCol, idCol)
  }

  /** DuckDB twin of the key expression with the "portable" hash. */
  def keySql(textCol: String = "text", idCol: String = "id",
      normalizeWhitespace: Boolean = true, lowercase: Boolean = true): String = {
    var norm = textCol
    if (normalizeWhitespace) norm = s"trim(regexp_replace($norm, '\\s+', ' ', 'g'))"
    if (lowercase) norm = s"lower($norm)"
    s"(CASE WHEN $textCol IS NULL OR $textCol = '' THEN CAST($idCol AS VARCHAR) " +
      s"ELSE CAST(${HashFunctions.portableHash64Sql(norm)} AS VARCHAR) END)"
  }
}
