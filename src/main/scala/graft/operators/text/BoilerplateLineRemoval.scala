package graft.operators.text

import graft.core.Operator
import graft.functions.HashFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-frequency boilerplate line removal — the RefinedWeb §G.2
  * line-wise correction: a line appearing in at least `maxDocFreq`
  * DISTINCT documents (cookie banners, nav stubs, license footers) is
  * template content and is cut from EVERY document, including the
  * first. This differs from [[LineDedupRefiner]] (first occurrence
  * survives): dedup preserves one copy of organic repetition,
  * boilerplate removal erases structural repetition entirely — real
  * pipelines run both, this threshold-gated form first.
  *
  * Scale shape: lines explode to fixed-width 64-bit hashes; the
  * frequency pass is `distinct(doc, hash) → groupBy(hash).count` with
  * map-side combine, and ONLY the (small) over-threshold hot set comes
  * back — broadcast anti-join, the hot-shingle idiom. Reassembly is one
  * groupBy(docId). No window anywhere; nothing buffers a hot line's
  * whole occurrence list.
  */
final class BoilerplateLineRemoval(
    textCol: String = "text",
    idCol: String = "id",
    maxDocFreq: Int = 5,
    minLineLength: Int = 1,
    hashName: String = "portable",
    outputCol: String = "text_boilerplate_removed",
    removedCol: String = "boilerplate_lines_removed") extends Operator {

  require(maxDocFreq >= 2, s"maxDocFreq $maxDocFreq must be >= 2")
  val name = "boilerplate_line_removal"

  def apply(df: DataFrame): DataFrame = build(df, df, None)

  /** Disposition mode: line doc-frequency counts come from ALIVE rows
    * only (a rejected page's banner must not push a line over the
    * threshold); dead rows keep null outputs.
    */
  override def applyGated(df: DataFrame, alive: Column): DataFrame =
    build(df, df.filter(alive), Some(alive))

  private def lineFrame(src: DataFrame): DataFrame =
    src.select(col(idCol).as("_bl_id"),
      posexplode(split(coalesce(col(textCol), lit("")), "\n"))
        .as(Seq("_bl_idx", "_bl_line")))
      .withColumn("_bl_k",
        when(length(col("_bl_line")) >= minLineLength,
          HashFunctions.hashByName(hashName)(col("_bl_line"))))

  private def build(
      df: DataFrame, corpus: DataFrame, alive: Option[Column]): DataFrame = {
    val hot = lineFrame(corpus)
      .filter(col("_bl_k").isNotNull)
      .select(col("_bl_id"), col("_bl_k")).distinct()
      .groupBy(col("_bl_k")).agg(count(lit(1)).as("_bl_df"))
      .filter(col("_bl_df") >= maxDocFreq)
      .select(col("_bl_k"))
    val rebuilt = lineFrame(df)
      .join(broadcast(hot), Seq("_bl_k"), "left_anti")
      .groupBy(col("_bl_id"))
      .agg(
        sort_array(collect_list(struct(col("_bl_idx"), col("_bl_line")))).as("_ls"),
        count(lit(1)).as("_bl_kept"))
      .select(col("_bl_id"),
        concat_ws("\n", transform(col("_ls"), x => x("_bl_line"))).as(outputCol),
        col("_bl_kept"))
    def gated(c: Column): Column = alive.fold(c)(a => when(a, c))
    df.join(rebuilt, col(idCol) === col("_bl_id"), "left")
      .withColumn(outputCol, gated(coalesce(col(outputCol), lit(""))))
      .withColumn(removedCol, gated(
        (size(split(coalesce(col(textCol), lit("")), "\n")) - coalesce(col("_bl_kept"), lit(0L)))
          .cast("long")))
      .drop("_bl_id", "_bl_kept")
  }

  /** DuckDB twin (portable hash family): CTE exposing
    * `_bl(id, text_clean, lines_removed)` over `table`'s `textExpr`.
    */
  def rebuildCteSql(table: String, textExpr: String): String = {
    require(hashName == "portable", "oracle covers the portable hash family")
    val k = s"CASE WHEN length(line) >= $minLineLength " +
      s"THEN ${HashFunctions.portableHash64Sql("line")} END"
    s"""_bl_src AS (SELECT $idCol AS id,
       |    string_split(coalesce($textExpr, ''), chr(10)) AS ls FROM $table),
       |_bl_lines AS (SELECT id,
       |    unnest(list_transform(range(1, len(ls) + 1), i -> i)) AS idx,
       |    unnest(ls) AS line FROM _bl_src),
       |_bl_hot AS (SELECT k FROM (
       |    SELECT DISTINCT id, $k AS k FROM _bl_lines WHERE ($k) IS NOT NULL)
       |  GROUP BY k HAVING count(*) >= $maxDocFreq),
       |_bl AS (SELECT s.id,
       |    coalesce(r.text_clean, '') AS text_clean,
       |    len(s.ls) - coalesce(r.kept, 0) AS lines_removed
       |  FROM _bl_src s LEFT JOIN (
       |    SELECT id, string_agg(line, chr(10) ORDER BY idx) AS text_clean,
       |           count(*) AS kept
       |    FROM _bl_lines WHERE ($k) IS NULL OR ($k) NOT IN (SELECT k FROM _bl_hot)
       |    GROUP BY id) r
       |  ON s.id = r.id)""".stripMargin
  }
}
