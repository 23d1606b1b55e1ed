package graft.operators.text

import graft.functions.{TextFunctions, TopKAgg}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Inverted-index export — `(term, doc_freq, capped posting list)` for
  * the highest-document-frequency terms: the "ship a search index
  * alongside the corpus" step (and the doc-frequency table the
  * stop-shingle caps, BM25 idf, and vocabulary reports all read from).
  *
  * Scale shape: one explode of per-doc DISTINCT terms, then one
  * partial-aggregated groupBy(term) where the posting list is the
  * mergeable [[TopKAgg]] bounded aggregate — each map-side partial
  * keeps at most `postingsCap` ids, so a stop-word's posting list costs
  * `cap × partitions` longs on the wire instead of its full document
  * frequency (the unbounded `collect_list` would shuffle every id of
  * every hot term — the classic inverted-index skew bug). Final top-N
  * terms is a TakeOrderedAndProject.
  *
  * Determinism: the capped postings are the k SMALLEST ids (a sorted
  * multiset, partitioning-invariant), emitted as a CSV string; ids
  * round-trip exactly through the aggregate's double heap below 2⁵³.
  */
final class InvertedIndex(
    textCol: String = "text",
    idCol: String = "doc_id",
    minDocFreq: Long = 2L,
    topTerms: Int = 50,
    postingsCap: Int = 10) {

  val name = "inverted_index"

  def apply(df: DataFrame): DataFrame =
    df.select(
        explode(array_distinct(TextFunctions.tokensOf(col(textCol)))).as("term"),
        col(idCol).as("_id"))
      .groupBy(col("term"))
      .agg(count(lit(1)).as("doc_freq"),
        TopKAgg.topKValues(col("_id").cast("double"), postingsCap, largest = false).as("_p"))
      .filter(col("doc_freq") >= minDocFreq)
      .select(col("term"), col("doc_freq"),
        concat_ws(",", transform(col("_p"), x => x.cast("long").cast("string")))
          .as("postings"))
      .orderBy(col("doc_freq").desc, col("term"))
      .limit(topTerms)

  // ---- DuckDB twin (full postings sorted then sliced — the semantics
  // the bounded aggregate must reproduce) ----

  def sql(table: String): String =
    s"""WITH _iex AS (SELECT DISTINCT term, id FROM (
       |    SELECT unnest(list_distinct(${TextFunctions.tokensOfSql(textCol)})) AS term,
       |      $idCol AS id FROM $table)),
       |_ig AS (SELECT term, count(*) AS doc_freq, list_sort(list(id)) AS ids
       |  FROM _iex GROUP BY term)
       |SELECT term, doc_freq,
       |  array_to_string(list_transform(ids[1:$postingsCap], x -> CAST(x AS VARCHAR)), ',') AS postings
       |FROM _ig WHERE doc_freq >= $minDocFreq
       |ORDER BY doc_freq DESC, term LIMIT $topTerms""".stripMargin
}
