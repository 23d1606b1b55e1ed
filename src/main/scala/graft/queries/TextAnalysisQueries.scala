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

    // language-ID evaluation: confusion matrix of the n-gram heuristic
    // vs the fixture's lang labels - the "is the detector usable as a
    // filter" readout (exact counts + per-true-label recall)
    OracleQuery("language_confusion",
      (s, dir) => {
        val tagged = refiner(Tables(s, dir, "documents"))
          .select(col("lang").as("true_lang"), col("lang_id").as("predicted"))
        val cells = graft.core.Staging.stage(
          tagged.groupBy(col("true_lang"), col("predicted"))
            .agg(count(lit(1)).as("cnt")))
        val totals = cells.groupBy(col("true_lang").as("_tl"))
          .agg(sum(col("cnt")).as("_tot"))
        cells.join(totals, col("true_lang") === col("_tl"))
          .select(col("true_lang"), col("predicted"), col("cnt"),
            round(col("cnt").cast("double") / col("_tot").cast("double"), 4)
              .as("frac_of_true"))
          .orderBy(col("true_lang"), col("predicted"))
      },
      Some(s"""WITH $toksCte,
           |scl AS (SELECT doc_id, lang, toks, ${langs.map(l =>
             s"${TextAnalysis.languageScoreSql("toks", l)} AS score_$l").mkString(", ")}
           |  FROM (SELECT d.doc_id, d.lang, t.toks FROM documents d
           |        JOIN tk t ON d.doc_id = t.doc_id)),
           |pred AS (SELECT lang AS true_lang, ${TextAnalysis.languageIdFromScoresSql(
             langs.map(l => l -> s"score_$l"))} AS predicted FROM scl),
           |cells AS (SELECT true_lang, predicted, count(*) AS cnt
           |  FROM pred GROUP BY 1, 2),
           |tots AS (SELECT true_lang AS tl, sum(cnt) AS tot FROM cells GROUP BY 1)
           |SELECT c.true_lang, c.predicted, CAST(c.cnt AS BIGINT) AS cnt,
           |  round(CAST(c.cnt AS DOUBLE) / CAST(t.tot AS DOUBLE), 4) AS frac_of_true
           |FROM cells c JOIN tots t ON c.true_lang = t.tl
           |ORDER BY true_lang, predicted""".stripMargin)),

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
