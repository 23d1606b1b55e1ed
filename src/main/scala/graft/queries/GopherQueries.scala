package graft.queries

import graft.core.Tables
import graft.functions.TextFunctions
import graft.operators.text.{GopherQuality, GopherQualityFilter, GopherQualityRefiner}
import org.apache.spark.sql.functions._

/** Gates for the Gopher document-quality rule set (Rae et al. 2021
  * appendix A1.1). The fixture augments the `documents` table so EVERY
  * rule fires somewhere: doc_id%19 pages are too short (rule 1), %17
  * pages drown in numeric tokens (rule 6), %13 pages end lines in
  * ellipses (rule 5), %11 pages are bullet lists (rule 4), %5 pages
  * carry a hash-symbol run (rule 3); everything else gets a
  * stopword-carrying suffix so the base population passes, including
  * the distinct-stopword minimum (rule 7). The oracle RECOMPUTES every
  * signal in DuckDB from the same raw table via the operator's own SQL
  * twins — list-lambda token algebra, RE2 line regexes — so nothing is
  * pinned from the implementation.
  */
object GopherQueries {

  private val gqStop =
    " and that the data rows flow with plenty of good signal here"
  private val gqBullets =
    Array.fill(10)("• bullet item line").mkString("", "\n", "\n")
  private val gqNums = " 11 22 33 44 55 66 77 88 99 00" * 4
  private val gqHashes = " " + "#" * 30
  private val gqEllipsis = "\nto be continued...\nmore to come soon..."

  private def gqAug(df: org.apache.spark.sql.DataFrame) =
    df.withColumn("text2",
      when(col("doc_id") % 19 === 0, lit("tiny doc"))
        .when(col("doc_id") % 17 === 0, concat(col("text"), lit(gqStop), lit(gqNums)))
        .when(col("doc_id") % 13 === 0, concat(col("text"), lit(gqStop), lit(gqEllipsis)))
        .when(col("doc_id") % 11 === 0, concat(lit(gqBullets), col("text"), lit(gqStop)))
        .when(col("doc_id") % 5 === 0, concat(col("text"), lit(gqStop), lit(gqHashes)))
        .otherwise(concat(col("text"), lit(gqStop))))

  private val gqAugSql =
    s"""(SELECT doc_id, CASE
       |  WHEN doc_id % 19 = 0 THEN 'tiny doc'
       |  WHEN doc_id % 17 = 0 THEN text || '$gqStop' || repeat(' 11 22 33 44 55 66 77 88 99 00', 4)
       |  WHEN doc_id % 13 = 0 THEN text || '$gqStop' || chr(10) || 'to be continued...' || chr(10) || 'more to come soon...'
       |  WHEN doc_id % 11 = 0 THEN repeat('• bullet item line' || chr(10), 10) || text || '$gqStop'
       |  WHEN doc_id % 5 = 0 THEN text || '$gqStop' || ' ' || repeat('#', 30)
       |  ELSE text || '$gqStop' END AS text2 FROM documents)""".stripMargin

  private val minWords = 10L
  private val maxWords = 100000L
  private val minStop = 2

  private val refiner =
    new GopherQualityRefiner("text2", minWords, maxWords, minStop)
  private val filter =
    new GopherQualityFilter("text2", minWords, maxWords, minStop)

  // ---- gopher_repetition fixture: %3 docs get a repeated line pair,
  // %4 docs a repeated paragraph, %7 docs a "spam spam spam spam" tail
  // so every battery signal is non-zero somewhere.
  private def repAug(df: org.apache.spark.sql.DataFrame) =
    df.withColumn("text2", concat(col("text"),
      when(col("doc_id") % 3 === 0,
        lit("\nrepeated boiler line\nrepeated boiler line")).otherwise(lit("")),
      when(col("doc_id") % 4 === 0,
        lit("\n\nrepeated footer para\n\nrepeated footer para")).otherwise(lit("")),
      when(col("doc_id") % 7 === 0,
        lit(" spam spam spam spam")).otherwise(lit(""))))

  private val repAugSql =
    """(SELECT doc_id, (text ||
      |  (CASE WHEN doc_id % 3 = 0 THEN (chr(10) || 'repeated boiler line' || chr(10) || 'repeated boiler line') ELSE '' END) ||
      |  (CASE WHEN doc_id % 4 = 0 THEN (chr(10) || chr(10) || 'repeated footer para' || chr(10) || chr(10) || 'repeated footer para') ELSE '' END) ||
      |  (CASE WHEN doc_id % 7 = 0 THEN ' spam spam spam spam' ELSE '' END)) AS text2
      |FROM documents)""".stripMargin

  /** dup-unit fraction CTEs over a literal separator. */
  private def dupUnitCtes(pfx: String, sepSql: String): String =
    s"""${pfx}x AS (SELECT doc_id, unnest(string_split(coalesce(text2, ''), $sepSql)) AS u FROM aug),
       |${pfx}c AS (SELECT doc_id, u, count(*) AS c FROM ${pfx}x GROUP BY doc_id, u),
       |${pfx}a AS (SELECT doc_id,
       |    CAST(sum(c - 1) AS DOUBLE) / CAST(sum(c) AS DOUBLE) AS uf,
       |    CASE WHEN sum(len(u) * c) = 0 THEN CAST(0.0 AS DOUBLE)
       |         ELSE CAST(sum(len(u) * (c - 1)) AS DOUBLE) / CAST(sum(len(u) * c) AS DOUBLE) END AS cf
       |  FROM ${pfx}c GROUP BY doc_id)""".stripMargin

  /** top word-n-gram char-mass CTEs (ties: highest count, smallest gram). */
  private def topGramCtes(n: Int): String =
    s"""g${n}x AS (SELECT doc_id, unnest(${TextFunctions.shinglesSql("t", n)}) AS g FROM tk),
       |g${n}c AS (SELECT doc_id, g, count(*) AS c FROM g${n}x GROUP BY doc_id, g),
       |g${n}t AS (SELECT doc_id, CAST(len(g) AS DOUBLE) * c AS mass FROM (
       |    SELECT doc_id, g, c, row_number() OVER (
       |      PARTITION BY doc_id ORDER BY c DESC, g ASC) AS rn FROM g${n}c)
       |  WHERE rn = 1)""".stripMargin

  /** Shared WITH chain + joined row set for the repetition twins. */
  private val repJoinedSql =
    s"""WITH aug AS $repAugSql,
       |${dupUnitCtes("l", "chr(10)")},
       |${dupUnitCtes("p", "chr(10) || chr(10)")},
       |tk AS (SELECT doc_id, ${TextFunctions.tokensOfSql("text2")} AS t FROM aug),
       |dn AS (SELECT doc_id, CAST(length(${TextFunctions.normalizeTextSql("text2")}) AS DOUBLE) AS d FROM aug),
       |${topGramCtes(2)},
       |${topGramCtes(3)},
       |${topGramCtes(4)},
       |joined AS (SELECT aug.doc_id,
       |    la.uf AS dlf, la.cf AS dlcf, pa.uf AS dpf, pa.cf AS dpcf,
       |    (CASE WHEN dn.d = 0 THEN 0.0 ELSE coalesce(g2t.mass, 0.0) / dn.d END) AS t2,
       |    (CASE WHEN dn.d = 0 THEN 0.0 ELSE coalesce(g3t.mass, 0.0) / dn.d END) AS t3,
       |    (CASE WHEN dn.d = 0 THEN 0.0 ELSE coalesce(g4t.mass, 0.0) / dn.d END) AS t4
       |  FROM aug
       |  JOIN la ON aug.doc_id = la.doc_id
       |  JOIN pa ON aug.doc_id = pa.doc_id
       |  JOIN dn ON aug.doc_id = dn.doc_id
       |  LEFT JOIN g2t ON aug.doc_id = g2t.doc_id
       |  LEFT JOIN g3t ON aug.doc_id = g3t.doc_id
       |  LEFT JOIN g4t ON aug.doc_id = g4t.doc_id)""".stripMargin

  val queries: Seq[OracleQuery] = Seq(

    OracleQuery("gopher_repetition",
      (s, dir) => new graft.operators.text.GopherRepetitionRefiner("text2")(
          repAug(Tables(s, dir, "documents")))
        .select(col("doc_id") +: Seq("dup_line_frac", "dup_line_char_frac",
          "dup_para_frac", "dup_para_char_frac", "top_2gram_char_frac",
          "top_3gram_char_frac", "top_4gram_char_frac")
          .map(c => round(col(c), 6).as(c)): _*)
        .orderBy(col("doc_id")),
      Some(s"""$repJoinedSql
              |SELECT doc_id,
              |  round(dlf, 6) AS dup_line_frac,
              |  round(dlcf, 6) AS dup_line_char_frac,
              |  round(dpf, 6) AS dup_para_frac,
              |  round(dpcf, 6) AS dup_para_char_frac,
              |  round(t2, 6) AS top_2gram_char_frac,
              |  round(t3, 6) AS top_3gram_char_frac,
              |  round(t4, 6) AS top_4gram_char_frac
              |FROM joined ORDER BY doc_id""".stripMargin)),

    OracleQuery("gopher_repetition_filter",
      // the actionable form with Gopher's published A1.1 cutoffs: the
      // planted repeated lines/paragraphs push their docs over 0.30
      (s, dir) => {
        val aug = repAug(Tables(s, dir, "documents"))
        val f = new graft.operators.text.GopherRepetitionFilter("text2")
        aug.where(f.keep(aug)).select(col("doc_id")).orderBy(col("doc_id"))
      },
      Some(s"""$repJoinedSql
              |SELECT doc_id FROM joined
              |WHERE dlf <= 0.30 AND dpf <= 0.30 AND dlcf <= 0.20 AND dpcf <= 0.20
              |  AND t2 <= 0.20 AND t3 <= 0.18 AND t4 <= 0.16
              |ORDER BY doc_id""".stripMargin)),

    OracleQuery("gopher_quality",
      (s, dir) => refiner(gqAug(Tables(s, dir, "documents")))
        .select(col("doc_id"), col("gopher_word_count"),
          round(col("gopher_mean_word_len"), 6).as("gopher_mean_word_len"),
          round(col("gopher_symbol_ratio"), 6).as("gopher_symbol_ratio"),
          round(col("gopher_bullet_line_frac"), 6).as("gopher_bullet_line_frac"),
          round(col("gopher_ellipsis_line_frac"), 6).as("gopher_ellipsis_line_frac"),
          round(col("gopher_alpha_word_frac"), 6).as("gopher_alpha_word_frac"),
          col("gopher_stopword_hits"), col("gopher_keep"))
        .orderBy(col("doc_id")),
      Some(s"""WITH aug AS $gqAugSql,
              |tk AS (SELECT doc_id, text2,
              |  ${TextFunctions.tokensOfSql("text2")} AS toks FROM aug)
              |SELECT doc_id,
              |  ${GopherQuality.wordCountSql("toks")} AS gopher_word_count,
              |  round(${graft.operators.text.TextAnalysis.meanTokenLengthSql("toks")}, 6) AS gopher_mean_word_len,
              |  round(${GopherQuality.symbolRatioSql("text2", "toks")}, 6) AS gopher_symbol_ratio,
              |  round(${GopherQuality.bulletLineFracSql("text2")}, 6) AS gopher_bullet_line_frac,
              |  round(${GopherQuality.ellipsisLineFracSql("text2")}, 6) AS gopher_ellipsis_line_frac,
              |  round(${GopherQuality.alphaWordFracSql("toks")}, 6) AS gopher_alpha_word_frac,
              |  ${GopherQuality.stopwordHitsSql("toks")} AS gopher_stopword_hits,
              |  ${GopherQuality.keepSql("text2", "toks", minWords, maxWords, minStop)} AS gopher_keep
              |FROM tk ORDER BY doc_id""".stripMargin)),

    OracleQuery("gopher_quality_filter",
      (s, dir) => {
        val aug = gqAug(Tables(s, dir, "documents"))
        aug.where(filter.keep(aug)).select(col("doc_id")).orderBy(col("doc_id"))
      },
      Some(s"""WITH aug AS $gqAugSql,
              |tk AS (SELECT doc_id, text2,
              |  ${TextFunctions.tokensOfSql("text2")} AS toks FROM aug)
              |SELECT doc_id FROM tk
              |WHERE ${GopherQuality.keepSql("text2", "toks", minWords, maxWords, minStop)}
              |ORDER BY doc_id""".stripMargin)))
}
