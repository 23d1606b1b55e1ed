package graft.operators.text

import graft.core.Operator
import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BM25 ranked retrieval over the document corpus (Robertson/Spärck
  * Jones probabilistic relevance; the Lucene `k1`/`b` parameterization
  * with the non-negative `ln(1 + (N - df + 0.5)/(df + 0.5))` idf) — the
  * "find training docs about X" primitive every corpus-curation loop
  * needs, and the classic quality probe for a retrieval-augmented
  * pipeline.
  *
  * Scale shape (the reason this is NOT the textbook inverted-index
  * join): the query is a handful of terms, so term frequencies come
  * from a per-row scan of the document's own token array — zero explode,
  * zero posting-list shuffle, no document text on any exchange. Corpus
  * statistics (N, Σdl, df per term) are ONE partial-aggregated pass
  * producing a single row that broadcasts back; the top-k is
  * `ORDER BY score LIMIT k`, which Spark plans as TakeOrderedAndProject
  * — each partition ships exactly k candidates, never the corpus. At
  * 100 TB the only full-corpus work is the two scans (stats + score),
  * both embarrassingly parallel.
  *
  * Cross-engine determinism: scores are sums of per-term doubles in
  * query-term order (identical association both engines); ordering ties
  * break on the id; emitted scores round to 6.
  */
final class Bm25Retrieval(
    queryTerms: Seq[String],
    textCol: String = "text",
    idCol: String = "doc_id",
    k1: Double = 1.2,
    b: Double = 0.75,
    topK: Int = 20) extends Operator {

  require(queryTerms.nonEmpty, "need at least one query term")
  require(queryTerms.forall(t => t.nonEmpty && t == t.toLowerCase),
    "query terms must be non-empty and lowercase (the tokenizer lowercases)")
  val name = "bm25_retrieval"

  private def dfCol(t: String): String = s"_df_${t}"

  /** The refiner form: every input row with a `bm25_score` column
    * appended (0 when no term matches) — the YAML-registrable shape; the
    * ranked top-k is [[apply]]. `corpus` supplies the rows the N/avgdl/df
    * statistics come from (disposition mode passes the alive subset).
    */
  def scored(df: DataFrame, corpus: DataFrame): DataFrame =
    withScore(df.withColumn("_toks", TextFunctions.tokensOf(col(textCol))),
        corpus.withColumn("_toks", TextFunctions.tokensOf(col(textCol))))
      .withColumn("bm25_score", round(col("_score"), 6))
      .drop("_toks", "_score")

  /** `(id, bm25_score)` for docs matching ≥1 term, best-first (score
    * desc, id asc), at most `topK` rows.
    */
  def apply(df: DataFrame): DataFrame = {
    val toks = df.select(col(idCol), TextFunctions.tokensOf(col(textCol)).as("_toks"))
    withScore(toks, toks)
      .where(col("_score") > 0.0)
      .orderBy(col("_score").desc, col(idCol))
      .limit(topK)
      .select(col(idCol), round(col("_score"), 6).as("bm25_score"))
  }

  private def withScore(toks: DataFrame, corpus: DataFrame): DataFrame = {
    val aggCols = Seq(
      count(lit(1)).as("_n"),
      sum(size(col("_toks")).cast("long")).as("_sumdl")) ++
      queryTerms.map(t =>
        sum(when(array_contains(col("_toks"), t), 1L).otherwise(0L)).as(dfCol(t)))
    val stats = corpus.agg(aggCols.head, aggCols.tail: _*)
    val n = col("_n").cast("double")
    val avgdl = col("_sumdl").cast("double") / col("_n").cast("double")
    val dl = size(col("_toks")).cast("double")
    val termScore: String => Column = { t =>
      val tf = size(filter(col("_toks"), x => x === lit(t))).cast("double")
      val dfT = col(dfCol(t)).cast("double")
      val idf = log(lit(1.0) + (n - dfT + lit(0.5)) / (dfT + lit(0.5)))
      idf * tf * lit(k1 + 1.0) /
        (tf + lit(k1) * (lit(1.0 - b) + lit(b) * dl / avgdl))
    }
    val score = queryTerms.map(termScore).reduce(_ + _)
    toks.crossJoin(broadcast(stats))
      .withColumn("_score", score)
      .drop("_n", "_sumdl")
      .drop(queryTerms.map(dfCol): _*)
  }

  /** Disposition-mode scoring: corpus statistics from ALIVE rows only —
    * a page rejected upstream contributed no document frequency in the
    * sequential chain, so it must not dilute idf here either.
    */
  private[text] def scoredGated(df: DataFrame, alive: Column): DataFrame =
    scored(df, df.filter(alive))

  /** DuckDB twin: identical stats CTE, per-term tf over the token list,
    * same association order, same tie-break and limit.
    */
  def sql(table: String): String = {
    val dfSel = queryTerms.map(t =>
      s"sum(CASE WHEN list_contains(toks, '$t') THEN 1 ELSE 0 END) AS ${dfCol(t)}")
      .mkString(", ")
    val n = "CAST(_n AS DOUBLE)"
    val avgdl = "(CAST(_sumdl AS DOUBLE) / CAST(_n AS DOUBLE))"
    val dl = "CAST(len(toks) AS DOUBLE)"
    val scoreSql = queryTerms.map { t =>
      val tf = s"CAST(len(list_filter(toks, x -> x = '$t')) AS DOUBLE)"
      val dfT = s"CAST(${dfCol(t)} AS DOUBLE)"
      val idf = s"ln(1.0 + ($n - $dfT + 0.5) / ($dfT + 0.5))"
      s"($idf * $tf * ${k1 + 1.0} / ($tf + $k1 * (${1.0 - b} + $b * $dl / $avgdl)))"
    }.mkString(" + ")
    s"""WITH _bm_tk AS (SELECT $idCol, ${TextFunctions.tokensOfSql(textCol)} AS toks FROM $table),
       |_bm_st AS (SELECT count(*) AS _n, sum(len(toks)) AS _sumdl, $dfSel FROM _bm_tk),
       |_bm_sc AS (SELECT $idCol, ($scoreSql) AS _score FROM _bm_tk, _bm_st)
       |SELECT $idCol, round(_score, 6) AS bm25_score FROM _bm_sc
       |WHERE _score > 0.0 ORDER BY _score DESC, $idCol LIMIT $topK""".stripMargin
  }
}

/** YAML-registrable refiner: appends `bm25_score` to every row (corpus
  * statistics from the whole — or, under disposition, the alive — input).
  */
final class Bm25ScoreRefiner(
    queryTerms: Seq[String],
    textCol: String = "text",
    idCol: String = "doc_id",
    k1: Double = 1.2,
    b: Double = 0.75) extends Operator {

  val name = "bm25_scorer"
  private val inner = new Bm25Retrieval(queryTerms, textCol, idCol, k1, b)

  def apply(df: DataFrame): DataFrame = inner.scored(df, df)
  override def applyGated(df: DataFrame, alive: Column): DataFrame =
    inner.scoredGated(df, alive)
}
