package graft.queries

import graft.core.Tables
import graft.functions.{HashFunctions, TextFunctions}
import graft.operators.dedup.{ExactDedup, IncrementalExactDedup, TextExactDedup}
import graft.operators.text.{TextLengthFilter, UrlFilter}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Curation-operator queries over the `documents` fixture table. Each query
  * instantiates the real library operator; the oracle SQL is generated from
  * the same operator config, so the gate checks the operator's actual
  * decision logic.
  */
object Curation {

  // --- deterministic synthetic URL (documents has no url column; both
  // engines derive the same one from doc fields) ---
  private[queries] def urlCol: Column = {
    val host = when(pmod(col("doc_id"), lit(10)) === 3, concat(col("source"), lit(".badsite.example")))
      .when(pmod(col("doc_id"), lit(10)) === 7, lit("en.wikipedia.org"))
      .otherwise(concat(col("source"), lit(".example.com")))
    val slug = when(pmod(col("doc_id"), lit(9)) === 0, lit("casino-poker"))
      .when(pmod(col("doc_id"), lit(9)) === 4, lit("buy-now"))
      .otherwise(lit("article"))
    concat(lit("https://"), host, lit("/"), col("lang"), lit("/"), slug,
      lit("/"), col("doc_id").cast("string"))
  }

  private[queries] val urlSql: String =
    "('https://' || (CASE WHEN doc_id % 10 = 3 THEN source || '.badsite.example' " +
      "WHEN doc_id % 10 = 7 THEN 'en.wikipedia.org' " +
      "ELSE source || '.example.com' END) || '/' || lang || '/' || " +
      "(CASE WHEN doc_id % 9 = 0 THEN 'casino-poker' " +
      "WHEN doc_id % 9 = 4 THEN 'buy-now' ELSE 'article' END) " +
      "|| '/' || CAST(doc_id AS VARCHAR))"

  private[queries] val urlFilterOp = new UrlFilter(
    blockedDomains = Seq("badsite.example"),
    excludeQualitySources = true)

  private[queries] val lengthOp = new TextLengthFilter(
    minLength = 100, maxLength = Some(400), textCol = "text", lengthCol = Some("n_chars"))

  private[queries] val exactDedupOp = TextExactDedup(
    textCol = "text", idCol = "doc_id", orderCol = "doc_id", hashAlgorithm = "portable")

  // FineWeb-style URL+content key (reference include_url,
  // text_exact_dedup.py:100-106): same text under different URLs is NOT
  // a duplicate.
  private val urlDedupOp = TextExactDedup(
    textCol = "text", idCol = "doc_id", orderCol = "doc_id",
    hashAlgorithm = "portable", includeUrl = true, urlCol = "url")

  /** First-wins dedup on a normalized 30-char text prefix — produces real
    * duplicate groups on the fixtures, exercising reject provenance.
    */
  private val prefixDedupOp = new ExactDedup("prefix_dedup",
    df => TextFunctions.normalizeText(substring(col("text"), 1, 30)),
    orderCol = "doc_id", repCol = "doc_id")

  private val prefixKeySql =
    TextFunctions.normalizeTextSql("substring(text, 1, 30)")

  private def docs(s: SparkSession, dir: String): DataFrame = Tables(s, dir, "documents")

  // fixture-lexicon blocklist: common enough that hits exist at every
  // scale, rare enough that the 12%-of-tokens threshold splits the corpus
  private val flagWords = Seq("slow", "dup", "skew")
  private val wordlistTagOp =
    new graft.operators.text.WordlistTagger(flagWords, prefix = "flag")
  private val wordlistFilterOp = new graft.operators.text.WordlistFilter(
    flagWords, maxHitFrac = 0.12, maxHits = 40L, prefix = "flag")

  val queries: Seq[OracleQuery] = Seq(

    OracleQuery("text_length_filter",
      (s, dir) => lengthOp(docs(s, dir))
        .select(col("doc_id"), col("n_chars")).orderBy(col("doc_id")),
      Some(s"""SELECT doc_id, n_chars FROM documents
              |WHERE ${lengthOp.keepSql} ORDER BY doc_id""".stripMargin)),

    OracleQuery("text_length_rejected",
      (s, dir) => lengthOp.rejected(docs(s, dir))
        .select(col("doc_id"),
          col("_rejection_details.reason").as("reason"),
          col("_rejection_details.operator").as("operator"))
        .orderBy(col("doc_id")),
      Some(s"""SELECT doc_id, 'filtered' AS reason, 'text_length_filter' AS operator
              |FROM documents WHERE NOT ${lengthOp.keepSql} ORDER BY doc_id""".stripMargin)),

    OracleQuery("wordlist_tag",
      // lexicon tagger (the Dolma-style toxicity/NSFW wordlist slot):
      // per-doc hit count + fraction over a fixture-lexicon blocklist
      (s, dir) => wordlistTagOp(docs(s, dir))
        .select(col("doc_id"), col("flag_hits"), col("flag_hit_frac"))
        .orderBy(col("doc_id")),
      Some(s"""SELECT doc_id, ${wordlistTagOp.hitsSql} AS flag_hits,
              |  ${wordlistTagOp.hitFracSql} AS flag_hit_frac
              |FROM documents ORDER BY doc_id""".stripMargin)),

    OracleQuery("wordlist_filter",
      // threshold form: fraction AND count bound, no-token docs keep
      (s, dir) => wordlistFilterOp(docs(s, dir))
        .select(col("doc_id")).orderBy(col("doc_id")),
      Some(s"""SELECT doc_id FROM documents
              |WHERE ${wordlistFilterOp.keepSql} ORDER BY doc_id""".stripMargin)),

    OracleQuery("url_filter",
      (s, dir) => {
        val withUrl = docs(s, dir).withColumn("url", urlCol)
        urlFilterOp(withUrl).select(col("doc_id"), col("url")).orderBy(col("doc_id"))
      },
      Some(s"""WITH u AS (SELECT doc_id, $urlSql AS url FROM documents)
              |SELECT doc_id, url FROM u WHERE ${urlFilterOp.keepSql("url")}
              |ORDER BY doc_id""".stripMargin)),

    OracleQuery("url_score",
      (s, dir) => docs(s, dir).withColumn("url", urlCol)
        .select(col("doc_id"), round(urlFilterOp.score(col("url")), 6).as("url_score"))
        .orderBy(col("doc_id")),
      Some(s"""WITH u AS (SELECT doc_id, $urlSql AS url FROM documents)
              |SELECT doc_id, round(${urlFilterOp.scoreSql("url")}, 6) AS url_score
              |FROM u ORDER BY doc_id""".stripMargin)),

    OracleQuery("text_exact_dedup",
      (s, dir) => exactDedupOp(docs(s, dir)).select(col("doc_id")).orderBy(col("doc_id")),
      Some(s"""SELECT doc_id FROM (
              |  SELECT doc_id, row_number() OVER (
              |    PARTITION BY ${TextExactDedup.keySql("text", "doc_id")} ORDER BY doc_id) AS rn
              |  FROM documents) t
              |WHERE rn = 1 ORDER BY doc_id""".stripMargin)),

    OracleQuery("soft_exact_dedup",
      // drop-free dedup: every row kept, weighted 1/group-size for loss
      // reweighting (weight 1.0 <=> a hard dedup would keep it with no
      // casualties in its group)
      (s, dir) => new graft.operators.dedup.SoftExactDedup(
          textCol = "text", idCol = "doc_id", hashAlgorithm = "portable")(docs(s, dir))
        .select(col("doc_id"), col("dup_count"),
          round(col("dedup_weight"), 6).as("dedup_weight"))
        .orderBy(col("doc_id")),
      Some(s"""SELECT doc_id,
              |  count(*) OVER (PARTITION BY ${TextExactDedup.keySql("text", "doc_id")}) AS dup_count,
              |  round(1.0 / count(*) OVER (PARTITION BY ${TextExactDedup.keySql("text", "doc_id")}), 6) AS dedup_weight
              |FROM documents ORDER BY doc_id""".stripMargin)),

    OracleQuery("incremental_exact_dedup",
      // the prior snapshot is every 5th doc: the increment (the full
      // table) drops those rows plus any doc whose normalized content
      // collides with a prior doc's — exactly what a full re-dedup
      // would have dropped against that corpus
      (s, dir) => {
        val d = docs(s, dir)
        new IncrementalExactDedup(
          prior = Some(d.filter(col("doc_id") % 5 === 0)),
          textCol = "text", idCol = "doc_id", hashAlgorithm = "portable")(d)
          .select(col("doc_id")).orderBy(col("doc_id"))
      },
      Some(s"""SELECT doc_id FROM documents
              |WHERE ${TextExactDedup.keySql("text", "doc_id")} NOT IN (
              |  SELECT DISTINCT ${TextExactDedup.keySql("text", "doc_id")}
              |  FROM documents WHERE doc_id % 5 = 0)
              |ORDER BY doc_id""".stripMargin)),

    OracleQuery("domain_blocklist_filter",
      (s, dir) => {
        import graft.operators.text.DomainBlocklistFilter
        val blocklist = s.createDataFrame(Seq(
          Tuple1("badsite.example"), Tuple1("en.wikipedia.org"))).toDF("domain")
        val op = new DomainBlocklistFilter(blocklist, idCol = "doc_id")
        op(docs(s, dir).withColumn("url", urlCol))
          .select(col("doc_id")).orderBy(col("doc_id"))
      },
      Some {
        val op = new graft.operators.text.DomainBlocklistFilter(null, idCol = "doc_id")
        s"""WITH u AS (SELECT doc_id, $urlSql AS url FROM documents)
           |SELECT doc_id FROM u
           |WHERE ${op.keepSql("u", "url", Seq("badsite.example", "en.wikipedia.org"))}
           |ORDER BY doc_id""".stripMargin
      }),

    OracleQuery("text_url_dedup",
      (s, dir) => urlDedupOp(docs(s, dir).withColumn("url", urlCol))
        .select(col("doc_id")).orderBy(col("doc_id")),
      Some {
        val norm = "lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))"
        val keySql = "(CASE WHEN text IS NULL OR text = '' THEN CAST(doc_id AS VARCHAR) " +
          s"ELSE CAST(${HashFunctions.portableHash64Sql(s"(coalesce(url, '') || '|' || $norm)")} AS VARCHAR) END)"
        s"""WITH u AS (SELECT doc_id, text, $urlSql AS url FROM documents)
           |SELECT doc_id FROM (
           |  SELECT doc_id, row_number() OVER (PARTITION BY $keySql ORDER BY doc_id) AS rn
           |  FROM u) t
           |WHERE rn = 1 ORDER BY doc_id""".stripMargin
      }),

    OracleQuery("dedup_prefix_keep",
      (s, dir) => prefixDedupOp(docs(s, dir)).select(col("doc_id")).orderBy(col("doc_id")),
      Some(s"""SELECT doc_id FROM (
              |  SELECT doc_id, row_number() OVER (PARTITION BY $prefixKeySql ORDER BY doc_id) AS rn
              |  FROM documents) t
              |WHERE rn = 1 ORDER BY doc_id""".stripMargin)),

    OracleQuery("dedup_prefix_rejected",
      (s, dir) => prefixDedupOp.rejected(docs(s, dir))
        .select(col("doc_id"),
          col("_rejection_details.dedup_key").as("dedup_key"),
          col("_rejection_details.representative_id").as("representative_id"))
        .orderBy(col("doc_id")),
      Some(s"""WITH k AS (SELECT doc_id, $prefixKeySql AS kk FROM documents),
              |w AS (SELECT doc_id, kk,
              |        row_number() OVER (PARTITION BY kk ORDER BY doc_id) AS rn,
              |        min(doc_id) OVER (PARTITION BY kk) AS rep
              |      FROM k)
              |SELECT doc_id, kk AS dedup_key, CAST(rep AS VARCHAR) AS representative_id
              |FROM w WHERE rn > 1 ORDER BY doc_id""".stripMargin)))
}
