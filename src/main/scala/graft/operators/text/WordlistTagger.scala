package graft.operators.text

import graft.core.{Refiner, RowFilter}
import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Lexicon tagger — the Dolma/C4-style wordlist pass (toxicity, NSFW,
  * spam, boilerplate marker lists): per document, how many normalized
  * tokens hit the list and what fraction of the document that is. The
  * reference's URL filter covers the DOMAIN blocklist axis; this is
  * the CONTENT-lexicon axis every production curation stack runs next
  * to it. Tagging and filtering are split (tag → inspect → threshold)
  * because list-based signals are audited before they gate anything —
  * the tag columns are what the audit reads.
  *
  * Matching is exact-token over the shared `tokensOf` normalization
  * (lowercase, whitespace-collapsed) — deterministic and cheap, the
  * published wordlist-tagger semantics (substring matching inflates
  * false positives: "class" vs "ass"). Obfuscation-resistant matching
  * belongs to a normalization pass upstream ([[UnicodeNormalize]] /
  * [[StripAccents]]), not to the matcher.
  *
  * Scale shape: a stateless per-row map over the staged token array —
  * the wordlist is a plan-time literal array (codegen'd
  * `array_contains` per token; lists are tens-to-hundreds of terms).
  * No shuffle, no broadcast, scan speed.
  */
final class WordlistTagger(
    words: Seq[String],
    prefix: String = "wordlist",
    textCol: String = "text") extends Refiner {

  require(words.nonEmpty, "empty wordlist")
  require(words == words.map(_.toLowerCase(java.util.Locale.ROOT)).distinct,
    "wordlist must be lowercase and distinct (matching is over normalized tokens)")

  val name = s"${prefix}_tagger"

  /** The single source of truth for matching — the filter reuses these
    * so tag columns and keep predicate can never drift apart.
    */
  private[text] def toksExpr: Column = TextFunctions.tokensOf(col(textCol))
  // fused hash-set probe (r19): bit-identical to
  // `size(filter(toks, t => array_contains(lst, t)))` (KernelSpec pin)
  // — the interpreted ArrayFilter was CodegenFallback, so every column
  // referencing it re-evaluated the inlined tokenize chain per row
  private[text] def hitsExpr(toks: Column): Column =
    graft.plans.kernels.wordlist_hits(toks, words)

  def added(df: DataFrame): Seq[(String, Column)] = {
    val toks = toksExpr
    val hits = hitsExpr(toks)
    val n = size(toks).cast("long")
    Seq(
      s"${prefix}_hits" -> hits,
      s"${prefix}_hit_frac" ->
        when(n > 0L, round(hits.cast("double") / n.cast("double"), 6)))
  }

  /** DuckDB twins of the two added columns over `textCol`. */
  def hitsSql: String = {
    val toks = TextFunctions.tokensOfSql(textCol)
    val in = words.map(w => s"'$w'").mkString(", ")
    s"CAST(len(list_filter($toks, t -> t IN ($in))) AS BIGINT)"
  }
  def hitFracSql: String = {
    val toks = TextFunctions.tokensOfSql(textCol)
    s"""CASE WHEN CAST(len($toks) AS BIGINT) > 0
       |  THEN round(CAST($hitsSql AS DOUBLE) / CAST(len($toks) AS DOUBLE), 6)
       |END""".stripMargin
  }
}

/** Threshold filter over a wordlist: keep documents whose hit fraction
  * stays at-or-under `maxHitFrac` AND whose absolute hit count stays
  * at-or-under `maxHits` (either bound alone misbehaves at the ends of
  * the length distribution: a fraction bound ignores a long document
  * with many hits diluted by length only if paired with the count
  * bound, and a count bound alone over-punishes long clean documents).
  * Documents with no tokens keep (nothing to match).
  */
final class WordlistFilter(
    words: Seq[String],
    maxHitFrac: Double = 0.1,
    maxHits: Long = Long.MaxValue,
    prefix: String = "wordlist",
    textCol: String = "text") extends RowFilter {

  require(maxHitFrac >= 0.0 && maxHits >= 0L)
  val name = s"${prefix}_filter"
  private val tagger = new WordlistTagger(words, prefix, textCol)

  /** The verdict as a df-free Column (it only reads `textCol`) — for
    * composition, e.g. the [[QualityVote]] ensemble.
    */
  def keepCol: Column =
    // one fused verdict kernel (r19): the declarative
    // `(n === 0) || (hits <= maxHits && hits <= maxHitFrac·n)` predicate
    // inlined the tokenize chain 4× into FilterExec's generated method
    // (FilterExec has no subexpression elimination — ProjectExec does,
    // which is why the TAG columns never paid this). KernelSpec pins the
    // kernel bit-identical to that predicate over the tagger's hitsExpr,
    // so keep and audit-tag semantics still cannot drift apart.
    graft.plans.kernels.wordlist_keep(col(textCol), words, maxHitFrac, maxHits)

  def keep(df: DataFrame): Column = keepCol

  /** DuckDB twin of [[keep]]. */
  def keepSql: String = {
    val toks = TextFunctions.tokensOfSql(textCol)
    val hits = tagger.hitsSql
    s"""(CAST(len($toks) AS BIGINT) = 0 OR ($hits <= $maxHits
       |  AND CAST($hits AS DOUBLE) <= $maxHitFrac * CAST(len($toks) AS DOUBLE)))""".stripMargin
  }
}
