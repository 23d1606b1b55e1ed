package graft.queries

import graft.core.Tables
import graft.functions.TextFunctions
import graft.operators.ml.KMeansBuckets
import graft.operators.stats.LinearFit
import graft.operators.text.{MixPlan, NgramNovelty}
import graft.operators.vector.EmbeddingOutliers
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-11 statistics/model gates: corpus-ordered n-gram novelty,
  * exact-integer-moments OLS + Pearson correlation, one distributed
  * Lloyd's update step, the training-mix planning table, and
  * cluster-distance embedding outliers. The shared discipline: every
  * cross-row reduction is an EXACT integer aggregate (counts, BIGINT
  * moment sums, floor-scaled distances), with floating point confined
  * to fixed-shape scalar expressions both engines evaluate identically.
  */
object ModelStatsQueries {

  private val noveltyOp = new NgramNovelty("text", "doc_id", shingleWidth = 3)

  private val fitOp = new LinearFit(
    targetCol = "n_chars", f1Col = "n_tok", f2Col = "n_utok")

  // features: token count + DISTINCT-token count (vocabulary breadth —
  // the fixture text is single-line, so a line count would be constant
  // and the normal equations singular)
  private def featurized(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents").select(
      col("n_chars").cast("long").as("n_chars"),
      TextFunctions.tokenCount(col("text")).as("n_tok"),
      size(array_distinct(TextFunctions.tokensOf(col("text")))).cast("long").as("n_utok"))

  private val utokCountSql =
    s"CAST(len(list_distinct(${TextFunctions.tokensOfSql("text")})) AS BIGINT)"

  private def featurizedSrc(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents").select(
      col("source"),
      col("n_chars").cast("long").as("n_chars"),
      TextFunctions.tokenCount(col("text")).as("n_tok"),
      size(array_distinct(TextFunctions.tokensOf(col("text")))).cast("long").as("n_utok"))

  private val kOp = new KMeansBuckets("embedding", "cluster_id", k = 8)

  private val mixOp = new MixPlan(
    sourceCol = "source", budget = 2000000L,
    rawWeights = Map("src0" -> 4L, "src1" -> 3L, "src2" -> 2L))

  /** embeddings + assigned cluster ids mapped to the centroid rows'
    * vec_ids (the [[KMeansBuckets.assignCteSql]] `_cid` convention).
    */
  private def withClusters(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables(s, dir, "embeddings")
    val cents = emb.orderBy(col("vec_id")).limit(8)
      .select(col("vec_id").cast("long"), col("embedding").cast("array<double>"))
      .collect()
    val ids = cents.map(_.getLong(0)).toSeq
    val vecs = cents.map(_.getSeq[Double](1).toSeq).toSeq
    emb.withColumn("cluster_id",
      element_at(typedLit(ids), kOp.assignFixed(col("embedding"), vecs) + 1))
  }

  val queries: Seq[OracleQuery] = Seq(

    OracleQuery("ngram_novelty",
      (s, dir) => noveltyOp(Tables(s, dir, "documents")).orderBy(col("doc_id")),
      Some(noveltyOp.sql("documents"))),

    OracleQuery("linear_fit",
      // distributed OLS: n_chars ≈ β0 + β1·tokens + β2·distinct-tokens,
      // solved from one pass of exact BIGINT moment sums (normal equations)
      (s, dir) => fitOp.fit(featurized(s, dir)),
      Some(fitOp.fitSql("documents",
        TextFunctions.tokenCountSql("text"), utokCountSql, "n_chars"))),

    OracleQuery("linear_fit_by_source",
      // grouped normal equations: one model per source from ONE keyed
      // exchange of 10 longs per group per partition
      (s, dir) => fitOp.fitBy(featurizedSrc(s, dir), "source"),
      Some(fitOp.fitSql("documents",
        TextFunctions.tokenCountSql("text"), utokCountSql, "n_chars",
        group = Some("source")))),

    OracleQuery("classifier_calibration",
      // reliability table of the composite quality score against the
      // lang=='en' label — score-decile buckets, exact integer stats
      (s, dir) => graft.operators.ml.Calibration.table(
        Tables(s, dir, "documents"),
        graft.operators.text.TextAnalysis.qualityScore(
          col("text"), TextFunctions.tokensOf(col("text"))),
        col("lang") === "en"),
      Some(graft.operators.ml.Calibration.sql(
        graft.operators.text.TextAnalysis.qualityScoreSql("text", "toks"),
        "lang = 'en'",
        s"(SELECT lang, ${TextFunctions.tokensOfSql("text")} AS toks, text FROM documents)"))),

    OracleQuery("feature_correlation",
      (s, dir) => fitOp.corr(featurized(s, dir)),
      Some(fitOp.corrSql("documents",
        TextFunctions.tokenCountSql("text"), utokCountSql, "n_chars"))),

    OracleQuery("kmeans_update",
      // ONE Lloyd's map/reduce step: per-cluster count + exact
      // floor-scaled component sums → new centroid means (first 4 dims)
      (s, dir) => kOp.updateCentroids(withClusters(s, dir), "cluster_id", outDims = 4)
        .orderBy(col("cluster_id")),
      Some(s"""WITH ${kOp.assignCteSql("embeddings", "vec_id")}
              |${kOp.updateSql("embeddings", "vec_id", outDims = 4)}""".stripMargin)),

    OracleQuery("welch_ttest",
      // the A/B readout: does 'purchase' move value vs 'click' — one
      // single-pass aggregate of exact scaled moments, Welch t + df
      (s, dir) => new graft.operators.stats.WelchTTest(
        "value", "event_type", "click", "purchase")(Tables(s, dir, "events")),
      Some(new graft.operators.stats.WelchTTest(
        "value", "event_type", "click", "purchase").sql("events"))),

    OracleQuery("mix_plan",
      (s, dir) => mixOp(Tables(s, dir, "documents"),
        TextFunctions.tokenCount(col("text"))),
      Some(mixOp.sql("documents", "text"))),

    OracleQuery("dp_noisy_counts",
      // privacy export: per-source counts + deterministic-stream
      // Laplace(1/eps) noise, tiny groups suppressed (k-anonymity guard)
      (s, dir) => new graft.operators.stats.DpExport(
        "source", epsilon = 1.0, minGroupSize = 10L,
        noise = graft.operators.stats.DpExport.HashNoise(42L))(Tables(s, dir, "documents")),
      Some(new graft.operators.stats.DpExport(
        "source", epsilon = 1.0, minGroupSize = 10L,
        noise = graft.operators.stats.DpExport.HashNoise(42L)).sql("documents"))),

    OracleQuery("dp_noisy_token_sums",
      // the sum half of the DP export: per-source token totals with
      // per-doc clipping at 500 (sensitivity bound) + Laplace(clip/eps)
      (s, dir) => new graft.operators.stats.DpExport(
        "source", epsilon = 1.0, minGroupSize = 10L,
        noise = graft.operators.stats.DpExport.HashNoise(42L))
        .noisySums(Tables(s, dir, "documents"),
          TextFunctions.tokenCount(col("text")), clip = 500L),
      Some(new graft.operators.stats.DpExport(
        "source", epsilon = 1.0, minGroupSize = 10L,
        noise = graft.operators.stats.DpExport.HashNoise(42L))
        .noisySumsSql("documents", TextFunctions.tokenCountSql("text"), clip = 500L))),

    OracleQuery("embedding_outliers",
      (s, dir) => {
        val emb = Tables(s, dir, "embeddings")
        new EmbeddingOutliers("embedding", "vec_id",
            centroids = kOp.firstKCentroids(emb, "vec_id"))(emb)
          .orderBy(col("vec_id"))
      },
      Some(new EmbeddingOutliers("embedding", "vec_id",
        centroids = Seq.fill(8)(Seq.empty)).sql("embeddings"))))
}
