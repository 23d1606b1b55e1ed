package graft.operators.text

import graft.core.Operator
import graft.functions.{HashFunctions, TextFunctions}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-global duplicated n-gram span detection and removal — the
  * practical tier of exact-substring training-data dedup (Lee et al.
  * 2022 "Deduplicating Training Data Makes Language Models Better" use
  * a suffix array at 50-token granularity; fixed-width n-gram matching
  * is the bounded-memory distributed equivalent, the same trade the
  * decontamination filter makes). A w-token gram is *duplicated* when
  * it occurs at least `minCount` times across the whole corpus; a token
  * is *covered* when any duplicated gram instance overlaps it. Outputs
  * per document: the duplicated-gram instance count and fraction, the
  * text rebuilt from uncovered (normalized) tokens, and the number of
  * tokens removed.
  *
  * Scale shape: gram instances shuffle as `(id, pos, hash64)` — fixed
  * width, never text; the corpus occurrence count rides a window over
  * the hash key (no self-join); covered positions come back as one
  * sorted int array per document (bounded by document length), and the
  * span mask is evaluated as codegen'd array algebra on the document
  * row. One source scan, two compact shuffles, one id-keyed join.
  */
final class DupNgramRefiner(
    textCol: String = "text",
    idCol: String = "id",
    ngramWidth: Int = 8,
    minCount: Int = 2,
    hashName: String = "portable") extends Operator {

  require(ngramWidth >= 1, s"ngramWidth $ngramWidth must be >= 1")
  require(minCount >= 2, s"minCount $minCount must be >= 2")
  val name = "dup_ngram"

  private val w = ngramWidth

  def apply(df: DataFrame): DataFrame = {
    val toks = TextFunctions.tokensOf(col(textCol))
    val grams = TextFunctions.shingles(toks, w)

    val inst = df
      .select(col(idCol).as("_dn_id"), posexplode(grams).as(Seq("_dn_pos", "_dn_tok")))
      .select(col("_dn_id"), col("_dn_pos"),
        HashFunctions.hashByName(hashName)(col("_dn_tok")).as("_dn_h"))
    val tc = count(lit(1)).over(Window.partitionBy(col("_dn_h")))
    val dups = inst
      .withColumn("_dn_tc", tc)
      .filter(col("_dn_tc") >= minCount)
      .groupBy("_dn_id")
      .agg(sort_array(collect_list(col("_dn_pos"))).as("_dn_dups"),
        count(lit(1)).as("_dn_cnt"))

    val joined = df.join(dups, col(idCol) === col("_dn_id"), "left")
    val n = size(toks)
    val total = when(n >= w, (n - w + 1).cast("long")).otherwise(lit(0L))
    val dupsArr = coalesce(col("_dn_dups"), array().cast("array<int>"))
    // token j is covered iff some duplicated gram start i has i <= j < i+w
    val kept = filter(toks, (t, j) =>
      !exists(dupsArr, i => i <= j && j < i + w))
    joined
      .withColumn("_dn_total", total)
      .withColumn("dup_ngram_count", coalesce(col("_dn_cnt"), lit(0L)))
      .withColumn("dup_ngram_fraction",
        when(col("_dn_total") === 0L, lit(0.0))
          .otherwise(col("dup_ngram_count").cast("double") / col("_dn_total").cast("double")))
      .withColumn("_dn_kept", kept)
      .withColumn("text_dedup_spans", array_join(col("_dn_kept"), " "))
      .withColumn("dup_tokens_removed", (n - size(col("_dn_kept"))).cast("long"))
      .drop("_dn_id", "_dn_dups", "_dn_cnt", "_dn_total", "_dn_kept")
  }

  /** DuckDB twin as CTEs; `_dn` ends with one row per duplicated-gram
    * document: `(id, dups, dup_cnt)`. The caller left-joins and applies
    * [[maskSql]] / [[statsSql]] over the token list.
    */
  def dupCteSql(docsSql: String, idExpr: String): String = {
    require(hashName == "portable", "oracle covers the portable hash family")
    val toksSql = TextFunctions.tokensOfSql(textCol)
    val gramsSql = TextFunctions.shinglesSql("_toks", w)
    s"""_dn_docs AS (
       |  SELECT $idExpr AS id, $gramsSql AS _grams FROM (
       |    SELECT *, $toksSql AS _toks FROM $docsSql)),
       |_dn_inst AS (
       |  SELECT id, unnest(range(0, len(_grams))) AS pos, _grams FROM _dn_docs),
       |_dn_h AS (
       |  SELECT id, pos, ${HashFunctions.portableHash64Sql("_grams[pos + 1]")} AS h
       |  FROM _dn_inst),
       |_dn_tc AS (
       |  SELECT id, pos, count(*) OVER (PARTITION BY h) AS tc FROM _dn_h),
       |_dn AS (
       |  SELECT id, list_sort(list(pos)) AS dups, count(*) AS dup_cnt
       |  FROM _dn_tc WHERE tc >= $minCount GROUP BY id)""".stripMargin
  }

  /** Uncovered-token list over `toksCol` given the (possibly NULL)
    * sorted dup-start list `dupsCol`. DuckDB list lambdas index 1-based
    * where Spark's are 0-based — `i - 1` realigns.
    */
  def maskSql(toksCol: String, dupsCol: String): String =
    s"list_filter($toksCol, (t, i) -> len(list_filter(" +
      s"coalesce($dupsCol, []), d -> d <= i - 1 AND i - 1 < d + $w)) = 0)"
}
