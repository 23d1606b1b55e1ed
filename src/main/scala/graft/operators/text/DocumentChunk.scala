package graft.operators.text

import graft.functions.TextFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-window document chunking with stride overlap — the
  * context-length splitter every pretraining pipeline runs before
  * tokenized examples are packed: a document's tokens become windows of
  * `chunkSize` tokens starting every `stride` tokens (stride <
  * chunkSize ⇒ overlapping windows, the RAG/embedding-index shape;
  * stride = chunkSize ⇒ disjoint split). Trailing windows shorter than
  * `minTokens` are dropped (they're padding-dominated noise).
  *
  * Output: one row per chunk — `(id, chunk_idx, chunk_tokens,
  * chunk_text)`, chunk_idx dense from 0 per document.
  *
  * Scale shape: a pure generate — tokenize once, explode the window
  * starts, slice per start. No shuffle, no state, no window function;
  * output partitioning inherits the scan. Peak per-row memory is one
  * document's token array (the same bound the tokenizer already set).
  */
final class DocumentChunker(
    textCol: String = "text",
    idCol: String = "doc_id",
    chunkSize: Int = 64,
    stride: Int = 48,
    minTokens: Int = 8) extends graft.core.Operator {

  require(chunkSize >= 1, s"chunkSize must be >= 1, got $chunkSize")
  require(stride >= 1, s"stride must be >= 1, got $stride")
  require(minTokens >= 1 && minTokens <= chunkSize,
    s"need 1 <= minTokens ($minTokens) <= chunkSize ($chunkSize)")

  val name = "chunk_documents"

  def apply(df: DataFrame): DataFrame = chunks(df)

  def chunks(df: DataFrame): DataFrame =
    df.select(col(idCol), TextFunctions.tokensOf(col(textCol)).as("_toks"))
      .withColumn("_n", size(col("_toks")))
      .filter(col("_n") > 0)
      .withColumn("_start", explode(sequence(lit(0), col("_n") - 1, lit(stride))))
      .withColumn("_chunk", slice(col("_toks"), col("_start") + 1, lit(chunkSize)))
      .withColumn("chunk_tokens", size(col("_chunk")).cast("long"))
      .filter(col("chunk_tokens") >= minTokens)
      .select(
        col(idCol),
        (col("_start") / stride).cast("long").as("chunk_idx"),
        col("chunk_tokens"),
        concat_ws(" ", col("_chunk")).as("chunk_text"))

  /** DuckDB twin over `table`: range() is end-exclusive like the
    * Spark guard, list_slice is 1-indexed-inclusive and clamps exactly
    * like Spark's slice(start, length).
    */
  def sql(table: String): String =
    s"""WITH tk AS (SELECT $idCol, ${TextFunctions.tokensOfSql(textCol)} AS toks FROM $table),
       |st AS (SELECT $idCol, toks, len(toks) AS n FROM tk WHERE len(toks) > 0),
       |ex AS (SELECT $idCol, toks, unnest(range(0, n, $stride)) AS s FROM st),
       |ch AS (SELECT $idCol, s, list_slice(toks, s + 1, s + $chunkSize) AS chunk FROM ex)
       |SELECT $idCol, CAST(s // $stride AS BIGINT) AS chunk_idx,
       |       CAST(len(chunk) AS BIGINT) AS chunk_tokens,
       |       array_to_string(chunk, ' ') AS chunk_text
       |FROM ch WHERE len(chunk) >= $minTokens""".stripMargin
}
