package graft.operators.text

import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** RAKE keyword extraction (Rose et al. 2010, "Automatic Keyword
  * Extraction from Individual Documents"): candidate phrases are the
  * maximal token runs between stopwords/punctuation; each word scores
  * `degree/frequency` over the document's candidate phrases (degree =
  * Σ phrase length over the word's occurrences — words that live in
  * long multi-word phrases outrank isolated frequent words); a phrase
  * scores the sum of its words' scores. The standard zero-model
  * keyword/topic tagger for corpus exploration — the per-DOC companion
  * of the corpus-level [[graft.operators.ml.ClusterTopTerms]].
  *
  * Exactness: word scores are floor-scaled integer rationals
  * (`(10⁶·deg) div freq` — pure BIGINT arithmetic, so the phrase score
  * is an exact integer SUM, order-invariant, no doubles anywhere);
  * ranking ties break by phrase text.
  *
  * Scale shape: phrase splitting is a per-row codegen'd regexp; the
  * word-stats aggregate and the phrase-score join are keyed by
  * (doc, word) / (doc, phrase) — doc-scoped keys, so every shuffle
  * and window partitions by document, never globally.
  */
final class RakeKeywords(
    textCol: String,
    idCol: String = "doc_id",
    topN: Int = 3) {

  val name = "rake_keywords"
  require(topN >= 1, "topN must be positive")
  private val S = 1000000L

  /** The phrase-boundary lexicon: standard English function words (a
    * fixed, documented subset — RAKE quality tracks the stoplist, and
    * the operator takes the list as given) plus sentence punctuation.
    */
  val stopWords: Seq[String] = Seq(
    "the", "be", "to", "of", "and", "that", "have", "with", "a", "an",
    "in", "on", "for", "is", "was", "are", "it", "as", "at", "by",
    "this", "we", "you", "our", "will", "not", "or", "from", "but", "they")

  private def delimRe: String =
    s"([.,!?;:()\\[\\]]+|\\b(?:${stopWords.mkString("|")})\\b)"

  private val Sep = "\u0001"

  /** `(id, phrase)` — distinct candidate phrases per doc. */
  def phrases(df: DataFrame): DataFrame = {
    val n = TextFunctions.normalizeText(col(textCol))
    val marked = regexp_replace(coalesce(n, lit("")), delimRe, Sep)
    df.select(col(idCol).as("id"), explode(split(marked, Sep)).as("_p0"))
      .select(col("id"), trim(col("_p0")).as("phrase"))
      .filter(col("phrase") =!= "")
      .distinct()
  }

  /** Top-N phrases per doc: `(id, rank, phrase, score_scaled)` ordered
    * by (id, rank).
    */
  def apply(df: DataFrame): DataFrame = {
    val ph = phrases(df)
    // per-occurrence word rows with the containing phrase's length
    val occ = ph.select(col("id"), col("phrase"),
        split(col("phrase"), " ").as("_ws"))
      .select(col("id"), col("phrase"), size(col("_ws")).cast("long").as("_len"),
        explode(col("_ws")).as("word"))
    // word stats as a WINDOW over (id, word) instead of the former
    // aggregate + self-join (r19): each occurrence row reads its word's
    // freq/degree from its own partition frame, so the occurrence
    // lineage (scan → regex → explode → distinct) is computed ONCE and
    // one exchange replaces the join's two — the per-row _wscore is the
    // identical integer rational, summed over the identical occurrence
    // multiset
    val ww = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id"), col("word"))
    val pscore = occ
      .withColumn("_freq", count(lit(1)).over(ww))
      .withColumn("_deg", sum(col("_len")).over(ww))
      .withColumn("_wscore", expr(s"(${S}L * _deg) div _freq"))
      .groupBy(col("id"), col("phrase"))
      .agg(sum(col("_wscore")).as("score_scaled"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id"))
      .orderBy(col("score_scaled").desc, col("phrase"))
    pscore.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topN)
      .select(col("id"), col("rank"), col("phrase"), col("score_scaled"))
      .orderBy(col("id"), col("rank"))
  }

  // ---- DuckDB twin (identical regex, sentinel, and integer math) ----

  def sql(table: String, idExpr: String): String = {
    val n = TextFunctions.normalizeTextSql(textCol)
    // single-quote escape for the SQL literal; the pattern itself has none
    val re = delimRe
    s"""WITH _rkp AS (
       |  SELECT $idExpr AS id, trim(p) AS phrase
       |  FROM (SELECT $idExpr, unnest(string_split(
       |      regexp_replace(coalesce($n, ''), '$re', chr(1), 'g'), chr(1))) AS p
       |    FROM $table)
       |  WHERE trim(p) <> ''
       |  GROUP BY 1, 2),
       |_rko AS (SELECT id, phrase,
       |    CAST(len(string_split(phrase, ' ')) AS BIGINT) AS plen,
       |    unnest(string_split(phrase, ' ')) AS word
       |  FROM _rkp),
       |_rkw AS (SELECT id, word,
       |    ($S * sum(plen)) // count(*) AS wscore
       |  FROM _rko GROUP BY id, word),
       |_rks AS (SELECT o.id, o.phrase, sum(w.wscore) AS score_scaled
       |  FROM _rko o JOIN _rkw w ON o.id = w.id AND o.word = w.word
       |  GROUP BY o.id, o.phrase),
       |_rkr AS (SELECT id, phrase, score_scaled,
       |    row_number() OVER (PARTITION BY id
       |      ORDER BY score_scaled DESC, phrase) AS rank
       |  FROM _rks)
       |SELECT id, CAST(rank AS INTEGER) AS rank, phrase,
       |  CAST(score_scaled AS BIGINT) AS score_scaled
       |FROM _rkr WHERE rank <= $topN ORDER BY id, rank""".stripMargin
  }
}
