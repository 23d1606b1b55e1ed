package graft.operators.text

import graft.core.Operator
import graft.functions.{HashFunctions, TextFunctions}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus n-gram language-model scoring, CCNet-style (Wenzek et al.
  * 2020 score with a KenLM 5-gram model; the corpus-trained n-gram LM
  * here is the self-supervised equivalent): train add-alpha-smoothed
  * n-gram counts over the WHOLE corpus, then score every document by
  * its mean token log10-probability. Low scores flag outlier/degenerate
  * documents (gibberish, boilerplate soup); high scores flag natural,
  * corpus-typical text — the standard perplexity-bucket signal used to
  * partition web data by quality.
  *
  * Scale shape: n-grams are hashed to 64-bit keys immediately, so every
  * shuffle carries fixed-width longs, never strings. Doc-term counts
  * aggregate first keyed `(doc, hash)` (map-side combine collapses
  * repeated tokens); the global per-term count is a second
  * `groupBy(hash)` over that compact table joined back by hash — NOT a
  * window over the hash key, so a hot token is one post-combine row on
  * the build side instead of a whole buffered window partition, and AQE
  * skew-splits the probe if a key still runs hot. Corpus totals (two
  * scalars) ride a broadcast single-row cross join, exactly like the
  * DuckDB twin's `CROSS JOIN _lm_stats`. The whole operator is LAZY —
  * no driver action, no persist — and the three consumers of the
  * doc-term aggregate share one identical exchange subtree, which
  * Spark's ReuseExchange collapses to a single scan + shuffle at
  * runtime (no cache pinned in executor memory for the session's life,
  * which the r8 `persist()` form leaked).
  */
final class NgramLmScoreRefiner(
    textCol: String = "text",
    idCol: String = "id",
    ngramWidth: Int = 1,
    alpha: Double = 1.0,
    hashName: String = "portable") extends Operator {

  require(ngramWidth >= 1, s"ngramWidth $ngramWidth must be >= 1")
  require(alpha > 0.0, s"alpha $alpha must be > 0 (smoothing)")
  val name = "ngram_lm_score"

  def apply(df: DataFrame): DataFrame = build(df, df, None)

  /** Disposition mode: the LM trains on ALIVE rows only — a document
    * rejected upstream never contributed counts in the sequential chain,
    * so it must not shift the corpus distribution here either. Dead rows
    * keep null scores.
    */
  override def applyGated(df: DataFrame, alive: Column): DataFrame =
    build(df, df.filter(alive), Some(alive))

  private def build(
      df: DataFrame, corpus: DataFrame, alive: Option[Column]): DataFrame = {
    // STAGE the token array behind a projection boundary for widths > 1:
    // the shingle lambda references its token expression (w+1) times and
    // Catalyst does not dedupe subexpressions inside lambdas — unstaged
    // it re-runs normalize+split per reference (the NgramDiversity 23.5s
    // → 0.7s lesson; widths > 1 are registry-reachable via ngram_width)
    val grams = if (ngramWidth == 1) TextFunctions.tokensOf(col(textCol))
      else TextFunctions.shingles(col("_lm_toks"), ngramWidth)
    val gramSrc = if (ngramWidth == 1) corpus
      else corpus.select(col(idCol),
        TextFunctions.tokensOf(col(textCol)).as("_lm_toks"))

    // doc-term counts on hashed keys — the compact (long, long, long)
    // table every downstream branch reads through one reused exchange.
    val pairs = gramSrc
      .select(col(idCol).as("_lm_id"), explode(grams).as("_lm_tok"))
      .select(col("_lm_id"),
        HashFunctions.hashByName(hashName)(col("_lm_tok")).as("_lm_h"))
      .groupBy("_lm_id", "_lm_h").agg(count(lit(1)).as("_lm_c"))

    // corpus totals as a single broadcast row (sum coalesced so an empty
    // corpus yields 0, matching the old driver-side fold).
    val stats = pairs.agg(
      coalesce(sum(col("_lm_c")), lit(0L)).as("_lm_total"),
      count_distinct(col("_lm_h")).as("_lm_vocab"))

    // global term count: groupBy + equi-join on the hash, not a window.
    val termTotals = pairs.groupBy("_lm_h").agg(sum(col("_lm_c")).as("_lm_tc"))

    val denom = col("_lm_total").cast("double") + lit(alpha) * col("_lm_vocab").cast("double")
    val logp = log10((col("_lm_tc") + lit(alpha)) / denom)
    val scores = pairs
      .join(termTotals, "_lm_h")
      .crossJoin(broadcast(stats))
      .groupBy("_lm_id")
      .agg((sum(col("_lm_c") * logp) / sum(col("_lm_c"))).as("_lm_avg"))

    def gated(c: Column): Column = alive.fold(c)(a => when(a, c))
    df.join(scores, col(idCol) === col("_lm_id"), "left")
      .withColumn("lm_logprob_avg", gated(coalesce(col("_lm_avg"), lit(0.0))))
      .withColumn("lm_perplexity", gated(pow(lit(10.0), -col("lm_logprob_avg"))))
      .drop("_lm_id", "_lm_avg")
  }

  /** DuckDB twin: the same algebra as CTEs. `_lm` ends with
    * `(id, lm_logprob_avg, lm_perplexity)` per document.
    */
  def scoreCteSql(docsSql: String, idExpr: String): String = {
    require(hashName == "portable", "oracle covers the portable hash family")
    val toksSql = TextFunctions.tokensOfSql(textCol)
    val gramsCol =
      if (ngramWidth == 1) "_toks"
      else TextFunctions.shinglesSql("_toks", ngramWidth)
    s"""_lm_toks AS (
       |  SELECT $idExpr AS id, unnest($gramsCol) AS tok FROM (
       |    SELECT *, $toksSql AS _toks FROM $docsSql)),
       |_lm_pairs AS (
       |  SELECT id, ${HashFunctions.portableHash64Sql("tok")} AS h, count(*) AS c
       |  FROM _lm_toks GROUP BY 1, 2),
       |_lm_stats AS (
       |  SELECT coalesce(sum(c), 0) AS total, count(DISTINCT h) AS vocab
       |  FROM _lm_pairs),
       |_lm_tc AS (
       |  SELECT h, sum(c) AS tc FROM _lm_pairs GROUP BY h),
       |_lm AS (
       |  SELECT id,
       |    sum(c * log10((tc + $alpha) / (total + $alpha * vocab))) / sum(c)
       |      AS lm_logprob_avg,
       |    pow(10.0, -(sum(c * log10((tc + $alpha) / (total + $alpha * vocab))) / sum(c)))
       |      AS lm_perplexity
       |  FROM _lm_pairs JOIN _lm_tc USING (h) CROSS JOIN _lm_stats GROUP BY id)""".stripMargin
  }
}
