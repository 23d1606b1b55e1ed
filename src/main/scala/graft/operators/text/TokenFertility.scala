package graft.operators.text

import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-source tokenizer fertility report — how many subword tokens the
  * tokenizer spends per whitespace word (`fertility`, the standard
  * multilingual-tokenizer efficiency metric) and how many characters
  * each subword token carries. A source whose fertility is far above
  * the corpus norm (non-Latin scripts under an English-centric vocab,
  * boilerplate with exotic punctuation) burns training budget:
  * token-budget sampling and mix planning should read THIS table, not
  * raw document counts, when the budget is denominated in tokens.
  *
  * Uses the library's deterministic greedy-longest-piece BPE stand-in
  * ([[TextAnalysis.bpeTokenCount]]) so both engines count identically;
  * swap the kernel for a real vocab's encode and the report shape
  * holds.
  *
  * Exactness: chars / words / subword tokens aggregate as exact
  * BIGINTs in ONE partial-aggregated scan; the two rates are
  * fixed-shape divisions (null for a source with no words/tokens).
  *
  * Scale shape: one scan, one groupBy(source) of 3 longs per source
  * per partition.
  */
final class TokenFertility(textCol: String = "text", sourceCol: String = "source") {

  val name = "token_fertility"

  /** `(source, docs, chars, words, bpe_tokens, tokens_per_word,
    * chars_per_token)` per source.
    */
  def apply(df: DataFrame): DataFrame = {
    val g = df.groupBy(col(sourceCol))
      .agg(count(lit(1)).as("docs"),
        sum(length(coalesce(col(textCol), lit(""))).cast("long")).as("chars"),
        sum(TextFunctions.tokenCount(col(textCol))).as("words"),
        sum(TextAnalysis.bpeTokenCount(col(textCol)).cast("long")).as("bpe_tokens"))
    g.select(col(sourceCol), col("docs"), col("chars"), col("words"),
        col("bpe_tokens"),
        when(col("words") > 0L,
          round(col("bpe_tokens").cast("double") / col("words").cast("double"), 6))
          .as("tokens_per_word"),
        when(col("bpe_tokens") > 0L,
          round(col("chars").cast("double") / col("bpe_tokens").cast("double"), 6))
          .as("chars_per_token"))
      .orderBy(col(sourceCol))
  }

  /** Fertility under a REAL induced tokenizer: same report shape, but
    * `bpe_tokens` counts with a learned merge list (from
    * [[BpeVocabInduction.train]]) instead of the greedy stand-in — so
    * the table reflects the tokenizer the mix planner actually budgets
    * with. Merges are a plan-time literal (the vocab IS a constant at
    * encode time): the count stays a stateless codegen'd per-row map,
    * one partial-aggregated scan, no broadcast, no extra shuffle.
    */
  def withMerges(df: DataFrame, merges: Seq[(String, String)]): DataFrame = {
    val g = df.groupBy(col(sourceCol))
      .agg(count(lit(1)).as("docs"),
        sum(length(coalesce(col(textCol), lit(""))).cast("long")).as("chars"),
        sum(TextFunctions.tokenCount(col(textCol))).as("words"),
        sum(BpeEncode.tokenCount(col(textCol), merges)).as("bpe_tokens"))
    g.select(col(sourceCol), col("docs"), col("chars"), col("words"),
        col("bpe_tokens"),
        when(col("words") > 0L,
          round(col("bpe_tokens").cast("double") / col("words").cast("double"), 6))
          .as("tokens_per_word"),
        when(col("bpe_tokens") > 0L,
          round(col("chars").cast("double") / col("bpe_tokens").cast("double"), 6))
          .as("chars_per_token"))
      .orderBy(col(sourceCol))
  }

  /** DuckDB twin of [[withMerges]] where the merge list is RE-DERIVED
    * from the corpus by [[BpeVocabInduction.trainSqlCtes]] — the
    * oracle replays the whole train-then-encode pipeline at any scale,
    * no data-derived literals. The Spark side must train with the SAME
    * induction parameters on the SAME table at runtime.
    */
  def sqlInduced(table: String, induction: BpeVocabInduction): String =
    s"""WITH ${induction.trainSqlCtes(table)},
       |_tf AS (SELECT $sourceCol AS src,
       |    CAST(length(coalesce($textCol, '')) AS BIGINT) AS ch,
       |    ${TextFunctions.tokenCountSql(textCol)} AS wd,
       |    ${induction.tokenCountSqlDerived(textCol)} AS bt
       |  FROM $table CROSS JOIN _bpem),
       |_tg AS (SELECT src, count(*) AS docs, CAST(sum(ch) AS BIGINT) AS chars,
       |    CAST(sum(wd) AS BIGINT) AS words, CAST(sum(bt) AS BIGINT) AS bpe_tokens
       |  FROM _tf GROUP BY src)
       |SELECT src AS $sourceCol, docs, chars, words, bpe_tokens,
       |  CASE WHEN words > 0
       |    THEN round(CAST(bpe_tokens AS DOUBLE) / CAST(words AS DOUBLE), 6)
       |  END AS tokens_per_word,
       |  CASE WHEN bpe_tokens > 0
       |    THEN round(CAST(chars AS DOUBLE) / CAST(bpe_tokens AS DOUBLE), 6)
       |  END AS chars_per_token
       |FROM _tg ORDER BY $sourceCol""".stripMargin

  // ---- DuckDB twin ----

  def sql(table: String): String =
    s"""WITH _tf AS (SELECT $sourceCol AS src,
       |    CAST(length(coalesce($textCol, '')) AS BIGINT) AS ch,
       |    ${TextFunctions.tokenCountSql(textCol)} AS wd,
       |    ${TextAnalysis.bpeTokenCountSql(textCol)} AS bt
       |  FROM $table),
       |_tg AS (SELECT src, count(*) AS docs, CAST(sum(ch) AS BIGINT) AS chars,
       |    CAST(sum(wd) AS BIGINT) AS words, CAST(sum(bt) AS BIGINT) AS bpe_tokens
       |  FROM _tf GROUP BY src)
       |SELECT src AS $sourceCol, docs, chars, words, bpe_tokens,
       |  CASE WHEN words > 0
       |    THEN round(CAST(bpe_tokens AS DOUBLE) / CAST(words AS DOUBLE), 6)
       |  END AS tokens_per_word,
       |  CASE WHEN bpe_tokens > 0
       |    THEN round(CAST(chars AS DOUBLE) / CAST(bpe_tokens AS DOUBLE), 6)
       |  END AS chars_per_token
       |FROM _tg ORDER BY $sourceCol""".stripMargin
}
