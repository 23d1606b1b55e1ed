package graft.queries

import graft.core.Tables
import graft.functions.{HashFunctions, TextFunctions}
import graft.ml.ClassifierWeights
import graft.operators.ml.{DsirScoreRefiner, LogisticRegression, LogregFeature, QualityClassifierFilter, QualityClassifierRefiner}
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

  // ---- the TRAINED classifier loop (train → score → eval → label) ----
  // Features are fixed-shape rational arithmetic over integer counts
  // (bit-identical per row in any IEEE engine); the label is the weak
  // lang=='en' signal the fixed-weight gates already evaluate against.

  private val lrFeatures = Seq(
    LogregFeature("tok",
      size(col("toks")).cast("double") / lit(64.0),
      "CAST(len(toks) AS DOUBLE) / 64.0"),
    LogregFeature("uniq",
      size(array_distinct(col("toks"))).cast("double") /
        (size(col("toks")) + 1).cast("double"),
      "CAST(len(list_distinct(toks)) AS DOUBLE) / CAST(len(toks) + 1 AS DOUBLE)"),
    LogregFeature("len",
      col("n_chars").cast("double") /
        (lit(8.0) * (size(col("toks")) + 1).cast("double")),
      "CAST(n_chars AS DOUBLE) / (8.0 * CAST(len(toks) + 1 AS DOUBLE))"),
    // stopword-profile ratio (the language-ID kernel's en score). The
    // fixture's lang column is independent of its text by construction
    // (same vocab for every lang), so the GATE pins trainer exactness,
    // not model quality — LogisticRegressionSpec pins learning (signs,
    // accuracy, loss descent) on constructed separable data.
    LogregFeature("ensw",
      graft.operators.text.TextAnalysis.languageScore(col("toks"), "en"),
      graft.operators.text.TextAnalysis.languageScoreSql("toks", "en")))

  private def lrInput(s: org.apache.spark.sql.SparkSession, dir: String) =
    Tables(s, dir, "documents").select(
      col("doc_id"), col("lang"), col("n_chars"),
      TextFunctions.tokensOf(col("text")).as("toks"))

  private val lrFromSql =
    s"(SELECT doc_id, lang, n_chars, ${TextFunctions.tokensOfSql("text")} AS toks FROM documents)"

  private val lrOp = new LogisticRegression(
    lrFeatures, col("lang") === "en", "lang = 'en'", lr = 1.0, iters = 8)

  private val lrSampledOp = new LogisticRegression(
    lrFeatures, col("lang") === "en", "lang = 'en'", lr = 1.0, iters = 8,
    fitSampleMod = Some(4))

  // the generative counterpart: multinomial NB over hashed token
  // buckets — training is pure exact-integer counting, so the MODEL
  // TABLE itself is a hash-exact gate
  private val nbOp = new graft.operators.ml.NaiveBayes(
    "text", "doc_id", col("lang") === "en", "lang = 'en'",
    buckets = 4096, alpha = 1.0)

  // prototype-based multiclass: nearest-centroid over embeddings (the
  // third classifier family — exact scaled-integer fit, exact confusion)
  private val nccOp = new graft.operators.ml.NearestCentroidClassifier(
    "embedding", "vec_id", "label", dims = 64, holdoutMod = 4)

  val queries: Seq[OracleQuery] = Seq(

    OracleQuery("centroid_classifier_confusion",
      // fit per-class mean prototypes on hash%4 != 0, classify the
      // held-out quarter, exact-integer confusion matrix; the twin
      // refits the prototypes from scratch
      (s, dir) => nccOp.confusion(Tables(s, dir, "embeddings")),
      Some(nccOp.confusionSql("embeddings"))),

    OracleQuery("centroid_classifier_accuracy",
      (s, dir) => nccOp.accuracy(Tables(s, dir, "embeddings")),
      Some(nccOp.accuracySql("embeddings"))),

    OracleQuery("nb_model_counts",
      // the fitted model: per-bucket occurrence counts per class,
      // exact integers end to end (one explode + one bounded-key agg)
      (s, dir) => nbOp.modelCounts(Tables(s, dir, "documents")),
      Some(nbOp.modelSql("documents"))),

    OracleQuery("nb_score",
      // add-α smoothed log-odds per doc, scored by a broadcast join
      // against the ≤4096-row model
      (s, dir) => nbOp.score(Tables(s, dir, "documents")),
      Some(nbOp.scoreSql("documents"))),

    OracleQuery("nb_auc",
      (s, dir) => nbOp.auc(Tables(s, dir, "documents")),
      Some(nbOp.aucSql("documents"))),

    OracleQuery("logreg_train",
      // full-batch GD trajectory, model quantized to the 1e-6 grid per
      // iteration (partition/engine-invariant); the twin REFITS the
      // whole trajectory as an unrolled CTE chain — an independent
      // second implementation, not injected literals
      (s, dir) => lrOp.train(lrInput(s, dir)),
      Some(lrOp.trainSql(lrFromSql))),

    OracleQuery("logreg_score",
      (s, dir) => lrOp.score(lrInput(s, dir)).orderBy(col("doc_id")),
      Some(lrOp.scoreSql(lrFromSql))),

    OracleQuery("logreg_weighted_train",
      // the imbalanced-weak-label shape: positives count pos_weight=3
      // in gradient AND normalizer, feature weights ride L2=0.05 decay
      // (bias unregularized); same unrolled-CTE refit twin
      (s, dir) => new LogisticRegression(
        lrFeatures, col("lang") === "en", "lang = 'en'", lr = 1.0,
        iters = 8, posWeight = 3.0, l2 = 0.05).train(lrInput(s, dir)),
      Some(new LogisticRegression(
        lrFeatures, col("lang") === "en", "lang = 'en'", lr = 1.0,
        iters = 8, posWeight = 3.0, l2 = 0.05).trainSql(lrFromSql))),

    OracleQuery("logreg_sampled_fit",
      // the 100 TB shape: fit on the deterministic hash-mod-4 sample
      // (the k-means train_sample_mod discipline), score the FULL corpus
      (s, dir) => lrSampledOp.score(lrInput(s, dir)).orderBy(col("doc_id")),
      Some(lrSampledOp.scoreSql(lrFromSql))),

    OracleQuery("logreg_auc",
      // eval loop closed: exact rank-sum ROC-AUC of the TRAINED scores
      // against the training label (one global rank, no pairwise join)
      (s, dir) => {
        val sc = lrOp.scored(lrInput(s, dir))
        graft.operators.ml.BinaryAuc.auc(sc, col("score"), col("y") === 1.0)
      },
      Some(lrOp.aucSql(lrFromSql))),

    OracleQuery("logreg_threshold_operating_point",
      // the decision-threshold tuner: exact-integer confusion counts at
      // every distinct score level, chosen = max F1 (ties → smallest
      // threshold); the chosen row MOVES with the corpus like every
      // other operating-point report
      (s, dir) => graft.operators.ml.ScoreThresholds.table(
        lrOp.scored(lrInput(s, dir)), col("score"), col("y") === 1.0),
      Some(graft.operators.ml.ScoreThresholds.sql(
        "score", "y = 1.0", s"(\n${lrOp.scoredSql(lrFromSql)}\n)"))),

    OracleQuery("logreg_holdout_auc",
      // the honest eval: fit on hash%4 != 0, rank-sum AUC on the
      // held-out quarter (in-sample AUC rewards memorization at small n)
      (s, dir) => lrOp.holdoutAuc(lrInput(s, dir), 4),
      Some(lrOp.holdoutAucSql(lrFromSql, 4))),

    OracleQuery("logreg_margin_sample",
      // active-learning batch: the 50 docs nearest the decision
      // boundary (argmin-k on the quantized margin; ties by doc_id)
      (s, dir) => lrOp.marginSample(lrInput(s, dir), 50),
      Some(lrOp.marginSampleSql(lrFromSql, 50))),


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
