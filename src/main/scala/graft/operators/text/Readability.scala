package graft.operators.text

import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-source readability report: Flesch Reading Ease and Flesch–Kincaid
  * grade level from exact per-document counts of words, sentences and
  * heuristic syllables. Readability is a standard quality/curriculum
  * signal for training corpora (grade-banded mixes, kid-safe slices); the
  * reference's quality operators score length/punctuation only — this is
  * the closed-form linguistic companion (same slot as the wordlist
  * tagger: a cheap, model-free per-doc signal).
  *
  * Heuristic contract (documented, not "true" syllables — true
  * syllabification needs a dictionary): a word's syllable count is its
  * number of maximal `[aeiouy]+` runs, minus one when the word ends in a
  * silent-`e` pattern (`...e` but not `...le`) and has ≥2 runs, floored
  * at 1. Sentences = maximal `[.!?]+` runs in the RAW text, floored at 1
  * per non-empty doc. Words = whitespace tokens of the normalized text.
  * Both engines evaluate the identical RE2-compatible regexes, so every
  * count is an exact BIGINT.
  *
  * Exactness/scale: per-doc counts are codegen'd expressions (the token
  * array is STAGED once per doc — the lambda-subexpression lesson); the
  * per-source reduction is three exact BIGINT sums + a doc count through
  * one partial aggregate (map-side combine, one exchange of |sources|
  * rows). The Flesch formulas are fixed-shape doubles over those exact
  * sums — bit-identical in both engines.
  */
final class Readability(textCol: String, groupCol: String) {

  val name = "readability"

  // one sentinel char that survives regexp_replace in both engines and
  // cannot appear in the fixture text
  private val Sep = "\u0001"

  /** Syllable count of one (already lowercase) word. */
  private def syllablesOf(w: Column): Column = {
    val marked = regexp_replace(w, "[aeiouy]+", Sep)
    val runs = (length(marked) - length(regexp_replace(marked, Sep, ""))).cast("long")
    val silentE = w.rlike("[^aeiou]e$") && !w.rlike("le$")
    greatest(lit(1L), runs - when(silentE && runs >= 2L, 1L).otherwise(0L))
  }

  private def syllablesOfSql(w: String): String = {
    val marked = s"regexp_replace($w, '[aeiouy]+', chr(1), 'g')"
    val runs = s"CAST(length($marked) - length(regexp_replace($marked, chr(1), '', 'g')) AS BIGINT)"
    val silentE = s"(regexp_matches($w, '[^aeiou]e$$') AND NOT regexp_matches($w, 'le$$'))"
    s"greatest(CAST(1 AS BIGINT), $runs - (CASE WHEN $silentE AND $runs >= 2 THEN 1 ELSE 0 END))"
  }

  /** Per-doc exact counts: (words, sentences, syllables). */
  def docCounts(df: DataFrame): DataFrame = {
    val toks = TextFunctions.tokensOf(col(textCol))
    // stage the token array BEFORE the lambda consumes it — Catalyst does
    // not dedupe subexpressions inside lambda functions
    val staged = df.withColumn("_toks", toks)
    staged.select(
      col(groupCol),
      size(col("_toks")).cast("long").as("words"),
      // empty/whitespace docs contribute ZERO sentences — flooring them
      // to 1 would dilute words_per_sentence for any source with blanks
      when(trim(coalesce(col(textCol), lit(""))) === "", lit(0L))
        .otherwise(greatest(lit(1L),
          size(regexp_extract_all(coalesce(col(textCol), lit("")),
            lit("[.!?]+"), lit(0))).cast("long")))
        .as("sentences"),
      aggregate(transform(col("_toks"), w => syllablesOf(w)),
        lit(0L), (acc, x) => acc + x).as("syllables"))
  }

  /** Per-source report: `(source, n_docs, words_per_sentence,
    * syllables_per_word, flesch, fk_grade)` — empty-word groups yield
    * NULL metrics (a source of empty docs has no readability).
    */
  def apply(df: DataFrame): DataFrame = {
    val agg = docCounts(df).groupBy(col(groupCol).as("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("words")).as("_w"),
        sum(col("sentences")).as("_s"),
        sum(col("syllables")).as("_y"))
    val w = col("_w").cast("double")
    val s = col("_s").cast("double")
    val y = col("_y").cast("double")
    agg.select(
      col("source"), col("n_docs"),
      when(col("_w") > 0L, round(w / s, 4)).as("words_per_sentence"),
      when(col("_w") > 0L, round(y / w, 4)).as("syllables_per_word"),
      when(col("_w") > 0L,
        round(lit(206.835) - lit(1.015) * (w / s) - lit(84.6) * (y / w), 4))
        .as("flesch"),
      when(col("_w") > 0L,
        round(lit(0.39) * (w / s) + lit(11.8) * (y / w) - lit(15.59), 4))
        .as("fk_grade"))
      .orderBy(col("source"))
  }

  // ---- DuckDB twin (identical regexes and formula shapes) ----

  def sql(table: String): String = {
    val toks = TextFunctions.tokensOfSql(textCol)
    s"""WITH _rt AS (SELECT $groupCol, $toks AS toks, coalesce($textCol, '') AS raw FROM $table),
       |_rd AS (SELECT $groupCol,
       |    CAST(len(toks) AS BIGINT) AS words,
       |    CASE WHEN trim(raw) = '' THEN CAST(0 AS BIGINT)
       |      ELSE greatest(CAST(1 AS BIGINT),
       |        CAST(len(regexp_extract_all(raw, '[.!?]+')) AS BIGINT)) END AS sentences,
       |    CAST(coalesce(list_aggregate(list_transform(toks,
       |      w -> ${syllablesOfSql("w")}), 'sum'), 0) AS BIGINT) AS syllables
       |  FROM _rt),
       |_ra AS (SELECT $groupCol AS source, count(*) AS n_docs,
       |    sum(words) AS _w, sum(sentences) AS _s, sum(syllables) AS _y
       |  FROM _rd GROUP BY 1)
       |SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
       |  CASE WHEN _w > 0 THEN round(CAST(_w AS DOUBLE) / CAST(_s AS DOUBLE), 4) END AS words_per_sentence,
       |  CASE WHEN _w > 0 THEN round(CAST(_y AS DOUBLE) / CAST(_w AS DOUBLE), 4) END AS syllables_per_word,
       |  CASE WHEN _w > 0 THEN round(206.835 - 1.015 * (CAST(_w AS DOUBLE) / CAST(_s AS DOUBLE))
       |    - 84.6 * (CAST(_y AS DOUBLE) / CAST(_w AS DOUBLE)), 4) END AS flesch,
       |  CASE WHEN _w > 0 THEN round(0.39 * (CAST(_w AS DOUBLE) / CAST(_s AS DOUBLE))
       |    + 11.8 * (CAST(_y AS DOUBLE) / CAST(_w AS DOUBLE)) - 15.59, 4) END AS fk_grade
       |FROM _ra ORDER BY source""".stripMargin
  }
}
