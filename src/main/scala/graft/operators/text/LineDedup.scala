package graft.operators.text

import graft.core.Operator
import graft.functions.HashFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-global line-level deduplication — the CCNet/Gopher preprocessing
  * pass (beyond the reference's operator set, like the rest of the
  * training-data family): boilerplate lines repeated across the corpus
  * (cookie banners, navigation stubs, license footers) survive only in
  * the document where they FIRST appear (order by `orderCol`, then line
  * position); every later occurrence is cut from its document's text.
  * Documents are rewritten with the surviving lines re-joined in
  * original order; `lines_removed` records the per-document cut count.
  *
  * Scale shape: lines explode to (docId, idx, line) and the first-wins
  * window shuffles on the 64-bit LINE HASH — fixed width, never raw
  * text as the key (the line string rides as a value column only until
  * reassembly). Reassembly is one groupBy(docId); the rewrite joins
  * back on docId. Lines shorter than `minLineLength` are exempt
  * (always kept) — blank lines and stray punctuation are not
  * boilerplate evidence, per CCNet.
  *
  * `separator` selects the dedup unit: "\n" (default) is CCNet line
  * dedup; "\n\n" is Dolma-style PARAGRAPH dedup — same first-wins
  * corpus-global machinery over coarser units. The separator is a
  * literal (regex-quoted for the split), and units re-join with the
  * same literal.
  */
final class LineDedupRefiner(
    textCol: String = "text",
    idCol: String = "id",
    orderCol: String = "id",
    minLineLength: Int = 1,
    hashName: String = "xxhash64",
    outputCol: String = "text_line_deduped",
    removedCol: String = "lines_removed",
    separator: String = "\n") extends Operator {

  require(separator.nonEmpty, "separator must be non-empty")
  val name = if (separator == "\n") "line_dedup" else "paragraph_dedup"

  private val sepRegex = java.util.regex.Pattern.quote(separator)
  /** The separator as a DuckDB expression (chr-composed, quote-safe). */
  private def sepSql: String = separator.map(ch => s"chr(${ch.toInt})").mkString(" || ")

  def apply(df: DataFrame): DataFrame = build(df, df, None)

  /** Disposition mode: line frequency and first-wins ranking run over
    * ALIVE rows only — a document rejected upstream never contributed its
    * lines in the sequential chain, so it must neither claim a keeper
    * slot nor push a line into boilerplate territory. Dead rows keep
    * null outputs.
    */
  override def applyGated(df: DataFrame, alive: Column): DataFrame =
    build(df, df.filter(alive), Some(alive))

  private def build(
      df: DataFrame, corpus: DataFrame, alive: Option[Column]): DataFrame = {
    val lines = corpus.select(
      col(idCol).as("_ld_id"), col(orderCol).as("_ld_ord"),
      posexplode(split(coalesce(col(textCol), lit("")), sepRegex))
        .as(Seq("_ld_idx", "_ld_line")))
    val eligible = length(col("_ld_line")) >= minLineLength
    val ranked = lines
      .withColumn("_ld_k",
        when(eligible, HashFunctions.hashByName(hashName)(col("_ld_line"))))
      .withColumn("_ld_rn", row_number().over(
        Window.partitionBy(col("_ld_k")).orderBy(col("_ld_ord"), col("_ld_idx"))))
    val rebuilt = ranked
      .filter(col("_ld_k").isNull || col("_ld_rn") === 1)
      .groupBy(col("_ld_id"))
      .agg(
        sort_array(collect_list(struct(col("_ld_idx"), col("_ld_line")))).as("_ls"),
        count(lit(1)).as("_ld_kept"))
      .select(col("_ld_id"),
        concat_ws(separator, transform(col("_ls"), x => x("_ld_line"))).as(outputCol),
        col("_ld_kept"))
    def gated(c: Column): Column = alive.fold(c)(a => when(a, c))
    df.join(rebuilt, col(idCol) === col("_ld_id"), "left")
      .withColumn(outputCol, gated(coalesce(col(outputCol), lit(""))))
      .withColumn(removedCol, gated(
        (size(split(coalesce(col(textCol), lit("")), sepRegex)) - coalesce(col("_ld_kept"), lit(0L)))
          .cast("long")))
      .drop("_ld_id", "_ld_kept")
  }

  /** DuckDB twin (portable hash family): CTE exposing
    * `_ld(id, text_clean, lines_removed)` over `table`'s `textExpr`.
    * Compose with `WITH`.
    */
  def rebuildCteSql(table: String, textExpr: String): String = {
    require(hashName == "portable", "oracle covers the portable hash family")
    s"""_src AS (SELECT $idCol AS id, $orderCol AS ord,
       |    string_split(coalesce($textExpr, ''), $sepSql) AS ls FROM $table),
       |_lines AS (SELECT id, ord,
       |    unnest(list_transform(range(1, len(ls) + 1), i -> i)) AS idx,
       |    unnest(ls) AS line FROM _src),
       |_ranked AS (SELECT id, idx, line,
       |    CASE WHEN length(line) >= $minLineLength
       |         THEN ${HashFunctions.portableHash64Sql("line")} END AS k,
       |    row_number() OVER (
       |      PARTITION BY (CASE WHEN length(line) >= $minLineLength
       |                    THEN ${HashFunctions.portableHash64Sql("line")} END)
       |      ORDER BY ord, idx) AS rn
       |  FROM _lines),
       |_ld AS (SELECT s.id,
       |    coalesce(r.text_clean, '') AS text_clean,
       |    len(s.ls) - coalesce(r.kept, 0) AS lines_removed
       |  FROM _src s LEFT JOIN (
       |    SELECT id, string_agg(line, $sepSql ORDER BY idx) AS text_clean,
       |           count(*) AS kept
       |    FROM _ranked WHERE k IS NULL OR rn = 1 GROUP BY id) r
       |  ON s.id = r.id)""".stripMargin
  }
}
