package graft.operators.text

import graft.core.{Operator, Refiner}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII detection + redaction — a standard pass in any public-web
  * training-data pipeline (beyond the reference's own operator set,
  * like the rest of the training-data family): count and mask emails,
  * IPv4 addresses, and NANP-style phone numbers. Pure Catalyst
  * regexp expressions (codegen'd, zero shuffle); the patterns are
  * deliberately conservative and portable (identical semantics in
  * Java regex and RE2, so the DuckDB twin re-evaluates them
  * independently).
  *
  * A production deployment extends [[PiiRedaction.patterns]] with
  * jurisdiction-specific detectors (IBANs, national ids); the
  * column contract and redaction order stay fixed.
  */
object PiiRedaction {

  /** (kind, regex, replacement) in redaction order. Order matters:
    * emails redact before phones so a digit-bearing local-part is
    * consumed as an email, not double-counted.
    */
  val patterns: Seq[(String, String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "[EMAIL]"),
    ("ipv4", "\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b", "[IP]"),
    ("phone", "\\b\\d{3}[-. ]\\d{3}[-. ]\\d{4}\\b", "[PHONE]"))

  /** Count of `kind` matches in the ORIGINAL text (0 for null). */
  def countOf(text: Column, kind: String): Column = {
    val p = patterns.find(_._1 == kind).getOrElse(
      throw new IllegalArgumentException(s"unknown pii kind: $kind"))._2
    coalesce(regexp_count(text, lit(p)), lit(0)).cast("long")
  }

  /** All kinds masked, in [[patterns]] order; null text stays null. */
  def redact(text: Column): Column =
    patterns.foldLeft(text) { case (t, (_, p, r)) => regexp_replace(t, p, r) }

  def countOfSql(textExpr: String, kind: String): String = {
    val p = patterns.find(_._1 == kind).get._2
    s"CAST(len(regexp_extract_all($textExpr, '$p')) AS BIGINT)"
  }

  def redactSql(textExpr: String): String =
    patterns.foldLeft(textExpr) { case (t, (_, p, r)) =>
      s"regexp_replace($t, '$p', '$r', 'g')"
    }
}

/** Adds `pii_email_count`, `pii_ipv4_count`, `pii_phone_count` (over the
  * original text) and `text_redacted` (all kinds masked in order).
  */
final class PiiRedactionRefiner(
    textCol: String = "text",
    redactedCol: String = "text_redacted") extends Refiner {
  val name = "pii_redaction"
  def added(df: DataFrame): Seq[(String, Column)] =
    PiiRedaction.patterns.map { case (kind, _, _) =>
      s"pii_${kind}_count" -> PiiRedaction.countOf(col(textCol), kind)
    } :+ (redactedCol -> PiiRedaction.redact(col(textCol)))
}
