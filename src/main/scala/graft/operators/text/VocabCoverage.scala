package graft.operators.text

import graft.functions.TextFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-source vocabulary coverage: what fraction of each source's token
  * mass lands inside the corpus-wide top-K vocabulary — the OOV-rate
  * report read next to [[TokenFertility]] when sizing a tokenizer or
  * diagnosing a source (code, another language, OCR noise) whose mass
  * lives in the long tail. A source with low coverage under the
  * corpus's own head vocabulary will tokenize badly under any vocab of
  * that size.
  *
  * Determinism: the vocabulary is the top-K words by (count DESC, word
  * ASC) — a TOTAL order, so the K-boundary is unambiguous in both
  * engines; counts are exact BIGINTs; rates are fixed-shape doubles.
  *
  * Scale shape: word counts are a two-level aggregate (shuffle bounded
  * by distinct words); the top-K rides distributed
  * `TakeOrderedAndProject`; membership is a broadcast hash join of the
  * K-row vocab against the exploded token stream (tokens never shuffle
  * — the per-source rollup partial-aggregates map-side).
  */
final class VocabCoverage(
    textCol: String,
    groupCol: String,
    topK: Int = 1000) {

  val name = "vocab_coverage"
  require(topK >= 1, "topK must be positive")

  /** `(source, total_tokens, in_vocab_tokens, coverage, oov_rate)`
    * ordered by source; NULL rates for a source with zero tokens.
    */
  def apply(df: DataFrame): DataFrame = {
    // ONE corpus tokenize: the (source, word, count) aggregate is
    // vocab×sources-sized (≪ corpus) and checkpointed, so the vocab
    // head, the membership counts and the per-source totals all read
    // materialized rows (per-consumer pruning defeats exchange reuse —
    // the psiPerGroup lesson)
    val wc = graft.core.Staging.stage(
      df.select(col(groupCol).as("source"),
          explode(TextFunctions.tokensOf(col(textCol))).as("_w"))
        .groupBy(col("source"), col("_w")).agg(count(lit(1)).as("_n")))
    val vocab = wc.groupBy(col("_w")).agg(sum(col("_n")).as("_c"))
      .orderBy(col("_c").desc, col("_w")).limit(topK)
      .select(col("_w").as("_vw"))
    val inVocab = wc.join(broadcast(vocab), col("_w") === col("_vw"), "left_semi")
      .groupBy(col("source").as("_ivs")).agg(sum(col("_n")).as("_iv"))
    val perSource = wc.groupBy(col("source").as("_tts"))
      .agg(sum(col("_n")).as("_tt"))
    // a source whose docs are ALL empty has no word rows — recover its
    // 0-token row from a (column-pruned) distinct over the input
    val allSources = df.select(col(groupCol).as("source")).distinct()
    val agg = allSources
      .join(perSource, col("source") <=> col("_tts"), "left")
      .join(inVocab, col("source") <=> col("_ivs"), "left")
      .select(col("source"),
        coalesce(col("_tt"), lit(0L)).as("total_tokens"),
        coalesce(col("_iv"), lit(0L)).as("in_vocab_tokens"))
    agg.select(col("source"), col("total_tokens"), col("in_vocab_tokens"),
        when(col("total_tokens") > 0L,
          round(col("in_vocab_tokens").cast("double") /
            col("total_tokens").cast("double"), 6)).as("coverage"),
        when(col("total_tokens") > 0L,
          round((col("total_tokens") - col("in_vocab_tokens")).cast("double") /
            col("total_tokens").cast("double"), 6)).as("oov_rate"))
      .orderBy(col("source"))
  }

  // ---- DuckDB twin (same total order at the K boundary) ----

  def sql(table: String): String = {
    val toks = TextFunctions.tokensOfSql(textCol)
    s"""WITH _vct AS (SELECT $groupCol AS source, unnest($toks) AS w FROM $table),
       |_vcv AS (SELECT w AS vw FROM (SELECT w, count(*) AS c FROM _vct GROUP BY w)
       |  ORDER BY c DESC, w LIMIT $topK),
       |_vci AS (SELECT t.source AS ivs, count(v.vw) AS iv
       |  FROM _vct t LEFT JOIN _vcv v ON t.w = v.vw GROUP BY t.source),
       |_vtt AS (SELECT $groupCol AS source,
       |    sum(CAST(len($toks) AS BIGINT)) AS total_tokens
       |  FROM $table GROUP BY 1),
       |_vca AS (SELECT t.source, t.total_tokens,
       |    coalesce(i.iv, 0) AS in_vocab_tokens
       |  FROM _vtt t LEFT JOIN _vci i ON t.source IS NOT DISTINCT FROM i.ivs)
       |SELECT source, CAST(total_tokens AS BIGINT) AS total_tokens,
       |  CAST(in_vocab_tokens AS BIGINT) AS in_vocab_tokens,
       |  CASE WHEN total_tokens > 0 THEN round(CAST(in_vocab_tokens AS DOUBLE)
       |    / CAST(total_tokens AS DOUBLE), 6) END AS coverage,
       |  CASE WHEN total_tokens > 0 THEN round(CAST(total_tokens - in_vocab_tokens AS DOUBLE)
       |    / CAST(total_tokens AS DOUBLE), 6) END AS oov_rate
       |FROM _vca ORDER BY source""".stripMargin
  }
}
