package graft.queries

import graft.core.Tables
import graft.functions.{HashFunctions, TextFunctions}
import graft.ml.ClassifierWeights
import graft.operators.ml.{DsirScoreRefiner, QualityClassifierFilter, QualityClassifierRefiner}
import org.apache.spark.sql.functions._

/** Learned-quality-classifier gates: the Spark side scores through the
  * broadcast-table kernel; the DuckDB twin retokenizes, rebuilds the
  * unigram+bigram feature bag, and recomputes every slot weight in closed
  * form ([[graft.ml.ClassifierWeights.deterministic]]) — so a hash,
  * bucketing, feature-construction, or mean/sigmoid divergence anywhere
  * in the kernel surfaces as a hash mismatch.
  */
object ClassifierQueries {

  private val D = 4096
  private val weights = ClassifierWeights.deterministic(D)

  private val bucket = {
    val h = HashFunctions.portableHash64Sql("feat")
    s"((($h) % $D) + $D) % $D"
  }

  private val scoreCte =
    s"""tk AS (SELECT doc_id, ${TextFunctions.tokensOfSql("text")} AS toks FROM documents),
       |fe AS (SELECT doc_id, unnest(list_concat(toks,
       |    list_transform(toks[1:len(toks)-1], (x, i) -> x || ' ' || toks[i+1]))) AS feat
       |  FROM tk),
       |ag AS (SELECT doc_id, sum(${ClassifierWeights.weightSql(bucket)}) AS s, count(*) AS c
       |  FROM fe GROUP BY doc_id),
       |sc AS (SELECT tk.doc_id,
       |    1.0 / (1.0 + exp(-coalesce(ag.s / ag.c, 0.0))) AS clf_score
       |  FROM tk LEFT JOIN ag ON tk.doc_id = ag.doc_id)""".stripMargin

  private def dsirOp(s: org.apache.spark.sql.SparkSession, dir: String) =
    new DsirScoreRefiner(
      sess => Tables(sess, dir, "documents").where(col("source") === "src0"),
      textCol = "text", buckets = D)

  private val dsirCte = new DsirScoreRefiner(_ => null, buckets = D)
    .scoreCteSql("documents", "doc_id", "SELECT text FROM documents WHERE source = 'src0'")

  val queries: Seq[OracleQuery] = Seq(

    OracleQuery("classifier_auc",
      // exact rank-sum ROC-AUC of the composite quality score against
      // the lang=='en' label — the scale-shaped eval loop for every
      // model-based curation signal (one global rank, no pairwise join)
      (s, dir) => {
        val docs = Tables(s, dir, "documents")
        graft.operators.ml.BinaryAuc.auc(docs,
          graft.operators.text.TextAnalysis.qualityScore(
            col("text"), TextFunctions.tokensOf(col("text"))),
          col("lang") === "en")
      },
      Some {
        val tkFrom = s"(SELECT lang, ${TextFunctions.tokensOfSql("text")} AS toks, text FROM documents)"
        graft.operators.ml.BinaryAuc.sql(
          graft.operators.text.TextAnalysis.qualityScoreSql("text", "toks"),
          "lang = 'en'", tkFrom)
      }),

    OracleQuery("quality_classifier_score",
      (s, dir) => new QualityClassifierRefiner(
          "text", "clf_score", D, 0.0, true, weights)(Tables(s, dir, "documents"))
        .select(col("doc_id"), round(col("clf_score"), 6).as("clf_score"))
        .orderBy(col("doc_id")),
      Some(s"""WITH $scoreCte
              |SELECT doc_id, round(clf_score, 6) AS clf_score
              |FROM sc ORDER BY doc_id""".stripMargin)),

    OracleQuery("dsir_score",
      // DSIR (Xie et al. 2023): target = the src0 slice of the corpus
      // itself (a "give me more like this domain" fit). The twin refits
      // BOTH bag-of-hashed-ngram models and the smoothed log-ratio
      // table from scratch in SQL.
      (s, dir) => dsirOp(s, dir)(Tables(s, dir, "documents"))
        .select(col("doc_id"), round(col("dsir_logw"), 6).as("dsir_logw"))
        .orderBy(col("doc_id")),
      Some(s"""WITH $dsirCte
              |SELECT id AS doc_id, round(logw, 6) AS dsir_logw
              |FROM _dsir ORDER BY doc_id""".stripMargin)),

    OracleQuery("dsir_top_k",
      // argmax-k selection on the 6-decimal-rounded score (rounding
      // makes the cross-engine order stable; ties break by doc_id)
      (s, dir) => dsirOp(s, dir)(Tables(s, dir, "documents"))
        .withColumn("dsir_logw", round(col("dsir_logw"), 6))
        .orderBy(col("dsir_logw").desc, col("doc_id"))
        .limit(50)
        .select(col("doc_id"), col("dsir_logw")),
      Some(s"""WITH $dsirCte
              |SELECT id AS doc_id, round(logw, 6) AS dsir_logw
              |FROM _dsir ORDER BY round(logw, 6) DESC, id LIMIT 50""".stripMargin)),

    OracleQuery("quality_classifier_filter",
      // 0.52, not 0.5: sigmoid(0) is the exact no-feature score, so a 0.5
      // cut would sit on an integer-exact boundary the two engines can
      // reach by different float paths; 0.52 keeps ~10% of the fixture
      (s, dir) => new QualityClassifierFilter(
          "text", 0.52, D, 0.0, true, weights)(Tables(s, dir, "documents"))
        .select(col("doc_id")).orderBy(col("doc_id")),
      Some(s"""WITH $scoreCte
              |SELECT doc_id FROM sc WHERE clf_score >= 0.52
              |ORDER BY doc_id""".stripMargin)))
}
