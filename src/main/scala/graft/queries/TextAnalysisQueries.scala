package graft.queries

import graft.core.Tables
import graft.functions.TextFunctions
import graft.operators.text.{TextAnalysis, TextAnalysisRefiner}
import org.apache.spark.sql.functions._

/** Text-analysis gates: language-ID, quality scoring, tokenizer-style
  * counting, rolling-hash fingerprints — each recomputed from scratch by
  * the DuckDB twin over the same staged token/normalized columns.
  */
object TextAnalysisQueries {

  private val langs = TextAnalysis.languageProfiles.keys.toSeq.sorted
  private val refiner = new TextAnalysisRefiner("text")

  private val toksCte =
    s"tk AS (SELECT doc_id, text, ${TextFunctions.tokensOfSql("text")} AS toks FROM documents)"

  private val scoresCte =
    s"""$toksCte,
       |sc AS (SELECT doc_id, text, toks, ${langs.map(l =>
          s"${TextAnalysis.languageScoreSql("toks", l)} AS score_$l").mkString(", ")}
       |  FROM tk)""".stripMargin

  val queries: Seq[OracleQuery] = Seq(

    OracleQuery("text_language_scores",
      (s, dir) => {
        val docs = Tables(s, dir, "documents")
          .withColumn("_toks", TextFunctions.tokensOf(col("text")))
          .withColumn("_ls", TextAnalysis.allLanguageScores(col("_toks")))
        docs.select(col("doc_id") +: langs.zipWithIndex.map { case (l, i) =>
            round(element_at(col("_ls"), i + 1), 6).as(s"score_$l") }: _*)
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH $scoresCte
              |SELECT doc_id, ${langs.map(l => s"round(score_$l, 6) AS score_$l").mkString(", ")}
              |FROM sc ORDER BY doc_id""".stripMargin)),

    OracleQuery("text_language_id",
      (s, dir) => refiner(Tables(s, dir, "documents"))
        .select(col("doc_id"), col("lang_id")).orderBy(col("doc_id")),
      Some(s"""WITH $scoresCte
              |SELECT doc_id, ${TextAnalysis.languageIdFromScoresSql(
                langs.map(l => l -> s"score_$l"))} AS lang_id
              |FROM sc ORDER BY doc_id""".stripMargin)),

    OracleQuery("text_quality_score",
      (s, dir) => refiner(Tables(s, dir, "documents"))
        .select(col("doc_id"), col("quality_score")).orderBy(col("doc_id")),
      Some(s"""WITH $toksCte
              |SELECT doc_id, ${TextAnalysis.qualityScoreSql("text", "toks")} AS quality_score
              |FROM tk ORDER BY doc_id""".stripMargin)),

    OracleQuery("text_bpe_token_count",
      (s, dir) => refiner(Tables(s, dir, "documents"))
        .select(col("doc_id"), col("bpe_token_count")).orderBy(col("doc_id")),
      Some(s"""SELECT doc_id, ${TextAnalysis.bpeTokenCountSql("text")} AS bpe_token_count
              |FROM documents ORDER BY doc_id""".stripMargin)),

    OracleQuery("text_fingerprint",
      (s, dir) => refiner(Tables(s, dir, "documents"))
        .select(col("doc_id"), col("doc_fingerprint")).orderBy(col("doc_id")),
      Some(s"""WITH nm AS (SELECT doc_id,
              |    ${TextFunctions.normalizeTextSql("coalesce(text, '')")} AS norm FROM documents)
              |SELECT doc_id, ${TextAnalysis.rollingFingerprintSql("norm")} AS doc_fingerprint
              |FROM nm ORDER BY doc_id""".stripMargin)),

    // per-source character-class composition fingerprint (codepoint
    // count parity via the length-difference trick)
    OracleQuery("charclass_profile",
      (s, dir) => charClassOp(Tables(s, dir, "documents")),
      Some(charClassOp.sql("documents"))),

    // RAKE per-doc keyword phrases: degree/frequency word scores as
    // floor-scaled integer rationals, doc-partitioned windows only
    OracleQuery("rake_keywords",
      (s, dir) => rakeOp(Tables(s, dir, "documents")),
      Some(rakeOp.sql("documents", "doc_id"))),

    // Flesch / Flesch-Kincaid readability per source: exact BIGINT
    // word/sentence/heuristic-syllable sums through one partial
    // aggregate, fixed-shape double formulas at the end
    OracleQuery("readability",
      (s, dir) => readabilityOp(Tables(s, dir, "documents")),
      Some(readabilityOp.sql("documents"))))

  private lazy val charClassOp =
    new graft.operators.text.CharClassProfile("text", "source")

  private lazy val rakeOp =
    new graft.operators.text.RakeKeywords("text", "doc_id", topN = 3)

  private lazy val readabilityOp =
    new graft.operators.text.Readability("text", "source")
}
