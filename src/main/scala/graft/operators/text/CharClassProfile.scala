package graft.operators.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-source character-class composition: fractions of letters,
  * digits, whitespace, non-ASCII, and remaining punctuation/symbols —
  * the cheapest corpus-quality fingerprint there is (OCR noise reads
  * as symbol-heavy, scraped tables as digit/whitespace-heavy, wrong-
  * charset ingests as non-ASCII-heavy) and the first thing to compare
  * across snapshots when a loader changes.
  *
  * Counting trick: `count(class) = length(s) − length(regexp_replace
  * (s, class, ''))` — both engines count CODEPOINTS in `length` and
  * evaluate the identical RE2-compatible classes, so every count is an
  * exact BIGINT; fractions are fixed-shape doubles. One partial-
  * aggregated scan, |sources| rows on the wire.
  */
final class CharClassProfile(textCol: String, groupCol: String) {

  val name = "charclass_profile"

  private val classes = Seq(
    "alpha" -> "[A-Za-z]+",
    "digit" -> "[0-9]+",
    "ws" -> "[ \\t\\n\\r]+",
    "non_ascii" -> "[^\\x00-\\x7f]+")

  private def cnt(re: String): Column = {
    val t = coalesce(col(textCol), lit(""))
    (length(t) - length(regexp_replace(t, re, ""))).cast("long")
  }

  /** `(source, total_chars, alpha_frac, digit_frac, ws_frac,
    * non_ascii_frac, other_frac)` ordered by source; NULL fractions for
    * a zero-char source.
    */
  def apply(df: DataFrame): DataFrame = {
    val aggs = sum(length(coalesce(col(textCol), lit(""))).cast("long")).as("total_chars") +:
      classes.map { case (n, re) => sum(cnt(re)).as(s"_$n") }
    val agg = df.groupBy(col(groupCol).as("source")).agg(aggs.head, aggs.tail: _*)
    def frac(c: Column) =
      when(col("total_chars") > 0L,
        round(c.cast("double") / col("total_chars").cast("double"), 6))
    agg.select(col("source"), col("total_chars"),
        frac(col("_alpha")).as("alpha_frac"),
        frac(col("_digit")).as("digit_frac"),
        frac(col("_ws")).as("ws_frac"),
        frac(col("_non_ascii")).as("non_ascii_frac"),
        frac(col("total_chars") - col("_alpha") - col("_digit") -
          col("_ws") - col("_non_ascii")).as("other_frac"))
      .orderBy(col("source"))
  }

  def sql(table: String): String = {
    val t = s"coalesce($textCol, '')"
    def cntSql(re: String) =
      s"(length($t) - length(regexp_replace($t, '$re', '', 'g')))"
    val aggs = classes.map { case (n, re) =>
      s"sum(CAST(${cntSql(re)} AS BIGINT)) AS _$n" }.mkString(", ")
    def fracSql(e: String) =
      s"CASE WHEN total_chars > 0 THEN round(CAST($e AS DOUBLE) / CAST(total_chars AS DOUBLE), 6) END"
    s"""WITH _ccp AS (SELECT $groupCol AS source,
       |    sum(CAST(length($t) AS BIGINT)) AS total_chars, $aggs
       |  FROM $table GROUP BY 1)
       |SELECT source, CAST(total_chars AS BIGINT) AS total_chars,
       |  ${fracSql("_alpha")} AS alpha_frac,
       |  ${fracSql("_digit")} AS digit_frac,
       |  ${fracSql("_ws")} AS ws_frac,
       |  ${fracSql("_non_ascii")} AS non_ascii_frac,
       |  ${fracSql("total_chars - _alpha - _digit - _ws - _non_ascii")} AS other_frac
       |FROM _ccp ORDER BY source""".stripMargin
  }
}
