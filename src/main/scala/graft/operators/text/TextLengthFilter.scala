package graft.operators.text

import graft.core.RowFilter
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Keep rows whose text length is within [minLength, maxLength].
  *
  * Semantics of the reference's TextLengthFilter
  * (reference: operators/filters/text_length_filter.py:15-70): use the
  * pre-computed length column when present and numeric, else `length(text)`,
  * missing text counts as 0. Pure Catalyst conjunction — pushed into the
  * parquet scan when the length column is stored (SURVEY.md §2.3 F2).
  *
  * @param lengthCol optional pre-computed length column (e.g. `text_length`
  *                  in the CommonCrawl record, `n_chars` in the fixtures)
  */
final class TextLengthFilter(
    minLength: Long,
    maxLength: Option[Long] = None,
    textCol: String = "text",
    lengthCol: Option[String] = None) extends RowFilter {

  val name = "text_length_filter"

  def effectiveLength(df: DataFrame): Column = {
    val fromText = when(col(textCol).isNotNull, length(col(textCol)).cast("long"))
    val base = lengthCol.filter(df.columns.contains) match {
      case Some(lc) => coalesce(col(lc).cast("long"), fromText, lit(0L))
      case None     => coalesce(fromText, lit(0L))
    }
    base
  }

  def keep(df: DataFrame): Column = {
    val len = effectiveLength(df)
    maxLength.foldLeft(len >= minLength)((p, mx) => p && len <= mx)
  }

  /** DuckDB twin of [[keep]] for oracle-checked queries. */
  def keepSql: String = {
    val lenSql = lengthCol match {
      case Some(lc) => s"coalesce(CAST($lc AS BIGINT), CASE WHEN $textCol IS NOT NULL THEN CAST(length($textCol) AS BIGINT) END, 0)"
      case None     => s"coalesce(CASE WHEN $textCol IS NOT NULL THEN CAST(length($textCol) AS BIGINT) END, 0)"
    }
    val maxSql = maxLength.map(mx => s" AND $lenSql <= $mx").getOrElse("")
    s"($lenSql >= $minLength$maxSql)"
  }
}
