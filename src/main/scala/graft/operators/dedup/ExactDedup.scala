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

/** Soft dedup (SoftDeDup): instead of DROPPING exact duplicates, keep
  * every row and attach `weightCol` = 1 / (duplicate-group size) and
  * `countCol` = group size, so the trainer downweights repeated content
  * in the loss rather than discarding it — repeated text often signals
  * quality, and hard dropping throws that signal away. Key semantics
  * are [[TextExactDedup]]'s exactly (normalize → hash → id fallback),
  * so weight 1.0 ⇔ the row would have survived a hard first-wins dedup
  * with no casualties in its group.
  *
  * Scale shape: ONE shuffle — a window count over the fixed-width key —
  * against hard dedup's identical shuffle; no row is dropped, so the
  * operator composes anywhere a refiner does.
  */
final class SoftExactDedup(
    textCol: String = "text",
    idCol: String = "id",
    hashAlgorithm: String = "xxhash64",
    normalizeWhitespace: Boolean = true,
    lowercase: Boolean = true,
    weightCol: String = "dedup_weight",
    countCol: String = "dup_count") extends graft.core.Operator {

  val name = "soft_exact_dedup"

  private def keyOf(df: DataFrame): Column =
    TextExactDedup(textCol = textCol, idCol = idCol, orderCol = idCol,
      hashAlgorithm = hashAlgorithm, normalizeWhitespace = normalizeWhitespace,
      lowercase = lowercase).key(df)

  def apply(df: DataFrame): DataFrame = build(df, None)

  /** Disposition mode: group sizes count ALIVE rows only (a dead row is
    * not a training duplicate); dead rows keep null outputs. */
  override def applyGated(df: DataFrame, alive: Column): DataFrame =
    build(df, Some(alive))

  private def build(df: DataFrame, alive: Option[Column]): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("_sdk"))
    val n = alive match {
      case None    => count(lit(1)).over(w)
      case Some(a) => sum(when(a, 1L).otherwise(0L)).over(w)
    }
    def gated(c: Column): Column = alive.fold(c)(a => when(a, c))
    df.withColumn("_sdk", keyOf(df))
      .withColumn(countCol, gated(n))
      .withColumn(weightCol, gated(lit(1.0) / col(countCol)))
      .drop("_sdk")
  }
}
