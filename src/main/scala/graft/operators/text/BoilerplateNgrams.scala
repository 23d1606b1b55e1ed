package graft.operators.text

import graft.functions.TextFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-level boilerplate n-gram report — the top-K word n-grams
  * shared across the most DOCUMENTS (nav bars, cookie banners, license
  * headers, template scaffolding). The per-doc operators
  * ([[DupNgramRefiner]], [[LineDedupRefiner]]) remove repetition inside
  * or between documents; this is the corpus-health readout that tells a
  * curator WHAT boilerplate dominates before they pick thresholds —
  * Lee et al. 2022 (dedup makes LMs better) motivates exactly this
  * audit.
  *
  * Output: `(ngram, n_docs, n_occurrences)` for the K n-grams with the
  * highest document frequency (ties broken by the gram text), only
  * grams seen in ≥ `minDocs` documents (singleton grams are content,
  * not boilerplate).
  *
  * Scale shape: tokens shingle per doc, combine map-side on
  * `(doc, gram)` (a repeated banner inside one page collapses before
  * the shuffle), then one gram-keyed aggregate; the head selection is a
  * distributed `TakeOrderedAndProject` (per-partition local top-K, only
  * K rows travel — the ZipfFit discipline), never a global sort. Gram
  * strings ride the shuffle post-combine, one row per distinct gram per
  * partition — the [[VocabularyBuilder]] posture.
  */
final class BoilerplateNgrams(
    textCol: String = "text",
    idCol: String = "doc_id",
    ngramWidth: Int = 8,
    topK: Int = 20,
    minDocs: Long = 2L) {

  require(ngramWidth >= 2, s"ngramWidth must be >= 2, got $ngramWidth")
  require(topK >= 1 && minDocs >= 1, "topK and minDocs must be >= 1")

  val name = "boilerplate_ngrams"

  def apply(df: DataFrame): DataFrame = {
    // token array staged in its own projection — inline, the shingle
    // lambda re-runs normalize+split per element (the TextRepetition
    // lesson; measured 54 s → <2 s at sf0.1 for width 8)
    val grams = df
      .select(col(idCol), TextFunctions.tokensOf(col(textCol)).as("_toks"))
      .select(col(idCol),
        explode(TextFunctions.shingles(col("_toks"), ngramWidth)).as("ngram"))
      .groupBy(col(idCol), col("ngram")).agg(count(lit(1)).as("_occ"))
    grams.groupBy(col("ngram"))
      .agg(count(lit(1)).as("n_docs"), sum(col("_occ")).as("n_occurrences"))
      .filter(col("n_docs") >= minDocs)
      .orderBy(col("n_docs").desc, col("ngram"))
      .limit(topK)
  }

  // ---- DuckDB twin ----

  def sql(table: String): String = {
    val toks = TextFunctions.tokensOfSql(textCol)
    val grams = TextFunctions.shinglesSql("_toks", ngramWidth)
    s"""WITH _bg AS (SELECT $idCol, ngram, count(*) AS _occ
       |  FROM (SELECT $idCol, unnest($grams) AS ngram
       |        FROM (SELECT $idCol, $toks AS _toks FROM $table))
       |  GROUP BY $idCol, ngram)
       |SELECT ngram, CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(_occ) AS BIGINT) AS n_occurrences
       |FROM _bg GROUP BY ngram
       |HAVING count(*) >= $minDocs
       |ORDER BY n_docs DESC, ngram
       |LIMIT $topK""".stripMargin
  }
}
