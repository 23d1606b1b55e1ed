package graft.operators.text

import graft.core.Operator
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Intra-document repeated-line removal — the FineWeb-style per-doc
  * pass that strips lines repeated WITHIN the same document (template
  * sidebars, repeated headers, paginated footers that survived HTML
  * extraction), keeping each line's FIRST occurrence in order. The
  * corpus-global companion is [[LineDedup]] (drops lines repeated
  * ACROSS documents); this one needs no global state at all.
  *
  * Adds `outputCol` = the deduped text and `removedCol` = how many line
  * occurrences were dropped (the per-doc templating-rate signal).
  *
  * Scale shape: stateless per-row builtin map — `split` →
  * `array_distinct` (order-preserving, first occurrence wins) →
  * `concat_ws`, all whole-stage-codegen'd. No shuffle, no state, runs
  * at scan speed at any corpus size.
  */
final class IntraDocLineDedup(
    textCol: String = "text",
    outputCol: String = "text_intra_deduped",
    removedCol: String = "intra_lines_removed") extends Operator {

  val name = "intra_doc_line_dedup"

  private def lines: Column = split(col(textCol), "\n", -1)

  def apply(df: DataFrame): DataFrame = {
    val deduped = array_distinct(lines)
    df.withColumn(outputCol, concat_ws("\n", deduped))
      .withColumn(removedCol, (size(lines) - size(deduped)).cast("long"))
  }

  /** DuckDB twin over `(… , $textCol)` rows: order-preserving list
    * dedup via the indexed `list_filter` (DuckDB's `list_distinct`
    * does NOT preserve order).
    */
  def sqlExprs: (String, String) = {
    val l = s"string_split($textCol, chr(10))"
    val dedup = s"list_filter($l, (x, i) -> list_position($l, x) = i)"
    (s"array_to_string($dedup, chr(10))",
      s"CAST(len($l) - len($dedup) AS BIGINT)")
  }
}
