package graft.operators.text

import graft.core.Operator
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Unicode normalization refiner — the cleanup pass every pipeline runs
  * BEFORE any hashing, tokenizing, or dedup so that canonically-equal
  * strings ("é" composed vs "e"+U+0301 decomposed) hash identically
  * (beyond the reference's operator set, like the rest of the
  * training-data family). Adds `outputCol` = the normalized text and
  * `changedCol` = whether normalization altered the string (a cheap
  * mojibake-rate signal to aggregate per source).
  *
  * Forms: NFC (default — canonical composition, the web-text standard),
  * NFKC (also folds compatibility chars: ligatures, full-width forms —
  * more aggressive, useful pre-tokenization), NFD/NFKD (decompositions).
  * `stripControls` removes Cc/Cf control and format characters except
  * tab/newline/CR — zero-width joiners, BOMs, and direction marks that
  * survive HTML extraction.
  *
  * Scale shape: stateless per-row kernel map — no shuffle, no state,
  * runs at scan speed; one JVM pass per row
  * ([[graft.plans.kernels.UnicodeNormalize]]).
  */
final class UnicodeNormalizeRefiner(
    textCol: String = "text",
    form: String = "NFC",
    stripControls: Boolean = false,
    outputCol: String = "text_normalized",
    changedCol: String = "unicode_changed") extends Operator {

  require(Set("NFC", "NFKC", "NFD", "NFKD")(form), s"unknown form $form")
  val name = "unicode_normalize"

  private def normalized: Column =
    graft.plans.kernels.unicode_normalize(col(textCol), form, stripControls)

  def apply(df: DataFrame): DataFrame =
    df.withColumn(outputCol, normalized)
      .withColumn(changedCol, col(outputCol) =!= col(textCol))
}

/** Accent-folding refiner — NFD → strip combining marks → NFC, the
  * diacritic normalization step multilingual pipelines run before
  * language-agnostic dedup or matching ("café" and "cafe" should hash
  * together; CCNet's fastText preprocessing does exactly this fold).
  * Letters without a canonical decomposition (ø, ł, ß) are untouched —
  * this is accent REMOVAL, not transliteration.
  *
  * Scale shape: stateless per-row kernel map
  * ([[graft.plans.kernels.StripAccents]]) — no shuffle, runs at scan
  * speed. The DuckDB oracle twin is `strip_accents(...)`; both sides
  * implement the same Unicode decomposition tables (verified over
  * Latin/Greek/Vietnamese/Hangul/multi-mark probes).
  */
final class StripAccentsRefiner(
    textCol: String = "text",
    outputCol: String = "text_folded") extends Operator {

  val name = "strip_accents"

  def apply(df: DataFrame): DataFrame =
    df.withColumn(outputCol, graft.plans.kernels.strip_accents(col(textCol)))
}
