package graft.operators.text

import graft.core.{Operator, Refiner}
import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis refiners for training-data curation beyond the
  * reference's own operator set (the builder-mandated large-scale
  * pipeline family): language identification, document quality scoring,
  * tokenizer-style token counting, and a rolling-hash fingerprint.
  * Everything is pure Catalyst (codegen'd) with a DuckDB twin per
  * function, so each operator is oracle-gated.
  */
object TextAnalysis {

  // ---- language identification (stopword-profile heuristic) ----

  /** Tiny function-word profiles; a real deployment swaps in fastText or
    * CLD3 behind the same column contract. Profiles are the classic
    * closed-class words — the standard cheap n-gram/stopword heuristic.
    */
  val languageProfiles: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "it", "for", "with"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "mit", "ein", "von", "zu"),
    "fr" -> Seq("le", "la", "les", "et", "est", "pas", "pour", "que", "dans", "une"),
    "es" -> Seq("el", "la", "los", "y", "es", "no", "por", "que", "con", "una"))

  /** Fraction of tokens found in `lang`'s profile (0 for empty docs).
    * Single-language declarative form; for all profiles at once use
    * [[allLanguageScores]] (one kernel pass instead of per-token
    * interpreted filters per language).
    */
  def languageScore(toks: Column, lang: String): Column = {
    val profile = languageProfiles(lang)
    val hits = size(filter(toks, t => profile.map(w => t === w).reduce(_ || _)))
    when(size(toks) === 0, lit(0.0))
      .otherwise(hits.cast("double") / size(toks).cast("double"))
  }

  private lazy val sortedLangs = languageProfiles.keys.toSeq.sorted

  /** All profile scores in one kernel pass: array<double> in sorted-
    * language order (bit-identical to [[languageScore]] per language —
    * asserted in KernelSpec).
    */
  def allLanguageScores(toks: Column): Column =
    graft.plans.kernels.stopword_scores(toks, sortedLangs.map(languageProfiles))

  def languageScoreSql(toksExpr: String, lang: String): String = {
    val inList = languageProfiles(lang).map(w => s"'$w'").mkString(", ")
    s"(CASE WHEN len($toksExpr) = 0 THEN CAST(0.0 AS DOUBLE) ELSE " +
      s"CAST(len(list_filter($toksExpr, t -> t IN ($inList))) AS DOUBLE) " +
      s"/ CAST(len($toksExpr) AS DOUBLE) END)"
  }

  /** Argmax over PRE-MATERIALIZED per-language score columns (stage the
    * scores with [[languageScore]] first — inlining the tokenization into
    * a fold duplicates the expression tree combinatorially, the exact
    * trap measured in round 1). Ties keep the alphabetically-first
    * language (strict `>`); nothing at `minScore` → "und".
    */
  def languageIdFromScores(scores: Seq[(String, Column)], minScore: Double = 0.05): Column = {
    val ordered = scores.sortBy(_._1)
    val best = ordered.foldLeft((lit("und"), lit(0.0))) { case ((bl, bs), (l, s)) =>
      (when(s > bs && s >= minScore, lit(l)).otherwise(bl),
        when(s > bs, s).otherwise(bs))
    }
    best._1
  }

  /** SQL twin of [[languageIdFromScores]] over score COLUMN NAMES (stage
    * them in a CTE). */
  def languageIdFromScoresSql(scoreCols: Seq[(String, String)], minScore: Double = 0.05): String = {
    var bl = "'und'"
    var bs = "CAST(0.0 AS DOUBLE)"
    scoreCols.sortBy(_._1).foreach { case (l, c) =>
      bl = s"(CASE WHEN $c > $bs AND $c >= $minScore THEN '$l' ELSE $bl END)"
      bs = s"(CASE WHEN $c > $bs THEN $c ELSE $bs END)"
    }
    bl
  }

  // ---- quality scoring (length / punctuation / stopword ratios) ----

  /** Alpha-character ratio over non-space characters. */
  def alphaRatio(text: Column): Column = {
    val stripped = regexp_replace(text, "\\s+", "")
    when(length(stripped) === 0, lit(0.0)).otherwise(
      length(regexp_replace(stripped, "[^A-Za-z]", "")).cast("double") /
        length(stripped).cast("double"))
  }

  def alphaRatioSql(t: String): String = {
    val stripped = s"regexp_replace($t, '\\s+', '', 'g')"
    s"(CASE WHEN length($stripped) = 0 THEN CAST(0.0 AS DOUBLE) ELSE " +
      s"CAST(length(regexp_replace($stripped, '[^A-Za-z]', '', 'g')) AS DOUBLE) " +
      s"/ CAST(length($stripped) AS DOUBLE) END)"
  }

  /** Mean token length (0 for empty docs). */
  def meanTokenLength(toks: Column): Column =
    when(size(toks) === 0, lit(0.0)).otherwise(
      aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double") /
        size(toks).cast("double"))

  def meanTokenLengthSql(toksExpr: String): String =
    s"(CASE WHEN len($toksExpr) = 0 THEN CAST(0.0 AS DOUBLE) ELSE " +
      s"CAST(list_reduce(list_prepend(CAST(0 AS BIGINT), " +
      s"list_transform($toksExpr, t -> CAST(length(t) AS BIGINT))), (a, x) -> a + x) AS DOUBLE) " +
      s"/ CAST(len($toksExpr) AS DOUBLE) END)"

  /** Composite quality in [0,1]: C4/Gopher-style cheap signals —
    * 0.4·alpha_ratio + 0.3·stopword presence (any profile) + 0.3·mean
    * token length in the [3,12] band. `toks` must be a MATERIALIZED
    * token column (stage it once; see [[languageIdFromScores]] note).
    */
  def qualityScore(text: Column, toks: Column): Column =
    round(graft.plans.kernels.quality_score_raw(
      text, sortedLangs.map(languageProfiles)), 9)

  /** The pre-r11 declarative tree, kept as the parity pin for the fused
    * kernel (KernelSpec): the `greatest(element_at(scores, i))` form
    * duplicated the StopwordScores kernel per language and the tokenize
    * tree ~6× per row inside Filter/Aggregate operators (no
    * subexpression elimination there) — the r10 driver bench's
    * domain_stats_filter cost.
    */
  private[graft] def qualityScoreDeclarative(text: Column, toks: Column): Column = {
    val scores = allLanguageScores(toks)
    val stop = greatest(sortedLangs.indices.map(i => element_at(scores, i + 1)): _*)
    val mtl = meanTokenLength(toks)
    val mtlBand = when(mtl >= 3.0 && mtl <= 12.0, lit(1.0)).otherwise(lit(0.0))
    round(alphaRatio(text) * 0.4 + least(stop * lit(5.0), lit(1.0)) * 0.3 + mtlBand * 0.3, 9)
  }

  /** SQL twin; `toksCol` is a staged list column name. */
  def qualityScoreSql(t: String, toksCol: String): String = {
    val stop = "greatest(" + languageProfiles.keys.toSeq.sorted
      .map(l => languageScoreSql(toksCol, l)).mkString(", ") + ")"
    val mtl = meanTokenLengthSql(toksCol)
    val band = s"(CASE WHEN $mtl >= 3.0 AND $mtl <= 12.0 THEN CAST(1.0 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END)"
    s"round(${alphaRatioSql(t)} * 0.4 + least($stop * 5.0, 1.0) * 0.3 + $band * 0.3, 9)"
  }

  // ---- tokenizer-style token counting ----

  /** BPE-ish subword proxy count: alphanumeric runs count
    * ceil(len/maxPiece) pieces, each other non-space character is one
    * token — a deterministic approximation of a trained tokenizer's
    * piece count (the real thing is a vocab lookup; this is the standard
    * cheap estimator for budget accounting).
    */
  def bpeTokenCount(text: Column, maxPiece: Int = 6): Column = {
    val runs = regexp_extract_all(coalesce(text, lit("")),
      lit("[A-Za-z0-9]+|[^A-Za-z0-9\\s]"), lit(0))
    aggregate(runs, lit(0L), (acc, r) =>
      acc + ceil(length(r).cast("double") / maxPiece).cast("long"))
  }

  def bpeTokenCountSql(t: String, maxPiece: Int = 6): String =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), " +
      s"list_transform(regexp_extract_all(coalesce($t, ''), '[A-Za-z0-9]+|[^A-Za-z0-9\\s]'), " +
      s"r -> CAST(ceil(CAST(length(r) AS DOUBLE) / $maxPiece) AS BIGINT))), (a, x) -> a + x)"

  // ---- document fingerprint (polynomial rolling hash) ----

  /** Polynomial rolling hash over the normalized text's characters:
    * `h = (h*31 + code) mod (2^31-1)` left-to-right. Stays under 2^36
    * before each mod, so the arithmetic is exact in both engines.
    * Karp–Rabin-style content fingerprint for cheap change detection.
    */
  def rollingFingerprint(text: Column): Column = {
    val norm = TextFunctions.normalizeText(coalesce(text, lit("")))
    val chars = split(norm, "")
    aggregate(filter(chars, c => c =!= ""), lit(0L),
      (acc, c) => pmod(acc * 31L + ascii(c), lit(2147483647L)))
  }

  /** SQL twin; `normCol` is a staged normalized-text column name (chars
    * are extracted by index — DuckDB has no split-to-chars). */
  def rollingFingerprintSql(normCol: String): String =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), " +
      s"list_transform(range(1, length($normCol) + 1), i -> CAST(ascii($normCol[i]) AS BIGINT))), " +
      s"(a, c) -> (a * 31 + c) % 2147483647)"
}

/** Refiner packaging: adds `lang_id`, `quality_score`, `bpe_token_count`,
  * `doc_fingerprint`. Tokens and per-language scores are staged as real
  * columns so the tokenization tree is evaluated once per row.
  */
final class TextAnalysisRefiner(textCol: String = "text") extends Operator {
  val name = "text_analysis"
  def apply(df: DataFrame): DataFrame = {
    val langs = TextAnalysis.languageProfiles.keys.toSeq.sorted
    val staged = langs.zipWithIndex.foldLeft(
      df.withColumn("_toks", TextFunctions.tokensOf(col(textCol)))
        .withColumn("_lang_scores", TextAnalysis.allLanguageScores(col("_toks")))) {
      case (d, (l, i)) =>
        d.withColumn(s"_score_$l", element_at(col("_lang_scores"), i + 1))
    }
    staged
      .withColumn("lang_id", TextAnalysis.languageIdFromScores(
        langs.map(l => l -> col(s"_score_$l"))))
      .withColumn("quality_score", TextAnalysis.qualityScore(col(textCol), col("_toks")))
      .withColumn("bpe_token_count", TextAnalysis.bpeTokenCount(col(textCol)))
      .withColumn("doc_fingerprint", TextAnalysis.rollingFingerprint(col(textCol)))
      .drop(("_toks" +: "_lang_scores" +: langs.map(l => s"_score_$l")): _*)
  }
}
