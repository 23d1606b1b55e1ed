package graft.operators.vector

import graft.core.{Operator, Rejection}
import graft.functions.VectorFunctions
import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** Embedding-cosine near-duplicate dedup: a row is DROPPED when an earlier
  * row (smaller `idCol`) has cosine similarity ≥ `threshold`.
  *
  * This is the semantic-dedup operator the reference designed but never
  * shipped (framework/backend.py:89-93 "cluster-id as bucket id",
  * models/kmeans trainer tree) — here complete, with two candidate strategies:
  *
  *  - brute force (default): all-pairs block-nested join. Exact; O(n²) —
  *    right for ≤10⁵ vectors or within pre-bucketed groups.
  *  - bucketed: pass `bucketCol` (e.g. a KMeans cluster id from
  *    [[graft.operators.ml.KMeansBuckets]], or an LSH bucket from
  *    [[AnnSearch.signBucket]]) and only pairs within a bucket are
  *    compared — the 100 TB path; the shuffle is on the bucket id, exactly
  *    the reference's cluster-bucketed dedup design.
  */
final class EmbeddingCosineDedup(
    vecCol: String = "embedding",
    idCol: String = "id",
    threshold: Double = 0.95,
    bucketCol: Option[String] = None) extends graft.core.RejectingOperator {

  val name = "embedding_cosine_dedup"

  /** Duplicate pairs (d1 < d2, cosine ≥ threshold). */
  def verifiedPairs(df: DataFrame): DataFrame = {
    val baseCols = Seq(col(idCol), col(vecCol)) ++ bucketCol.map(col)
    val v = df.select(baseCols: _*)
    val left = v.toDF((Seq("d1", "v1") ++ bucketCol.map(_ => "bk")): _*)
    val right = v.toDF((Seq("d2", "v2") ++ bucketCol.map(_ => "bk")): _*)
    val joined = bucketCol match {
      case Some(_) => left.join(right, Seq("bk")).filter(col("d1") < col("d2"))
      case None    => left.crossJoin(right).filter(col("d1") < col("d2"))
    }
    joined.withColumn("_cos", VectorFunctions.cosine(col("v1"), col("v2")))
      .filter(col("_cos") >= threshold)
      .select(col("d1"), col("d2"), col("_cos").as("cosine"))
  }

  def apply(df: DataFrame): DataFrame =
    df.join(verifiedPairs(df).select(col("d2").as(idCol)).distinct(), Seq(idCol), "left_anti")

  def mark(df: DataFrame, alive: org.apache.spark.sql.Column, tag: String): graft.core.Marked =
    graft.core.PairwiseMark(df, alive, tag, idCol, name, verifiedPairs)

  def rejected(df: DataFrame): DataFrame = {
    val reps = verifiedPairs(df).groupBy(col("d2")).agg(min(col("d1")).as("_rep"))
      .withColumnRenamed("d2", idCol)
    df.join(reps, Seq(idCol))
      .withColumn(Rejection.ColName,
        Rejection.duplicate(name, lit(null).cast("string"), col("_rep")))
      .drop("_rep")
  }

  /** Oracle SQL returning kept ids (brute-force variant only). */
  def keepSql(table: String): String = {
    require(bucketCol.isEmpty, "oracle covers the brute-force variant")
    s"""WITH v AS (SELECT $idCol AS id, $vecCol AS e FROM $table),
       |ver AS (SELECT a.id AS d1, b.id AS d2
       |  FROM v a JOIN v b ON a.id < b.id
       |  WHERE ${VectorFunctions.cosineSql("a.e", "b.e")} >= $threshold)
       |SELECT $idCol FROM $table WHERE $idCol NOT IN (SELECT d2 FROM ver)
       |ORDER BY $idCol""".stripMargin
  }
}

object EmbeddingCosineDedup {
  /** Recall readout for BUCKET-RESTRICTED cosine dedup (r15) — the
    * semantic-dedup member of the recall-gate family (MinHash banding →
    * `lsh_recall_report`, sign-LSH → `multiprobe_recall`, mutual-kNN →
    * `mutual_knn_recall`): on a deterministic 1-in-`sampleMod` id
    * sample, duplicate pairs found WITHIN the given bucket column vs
    * exact all-pairs truth at the same threshold. Bucket-caught pairs
    * are a SUBSET of truth by construction (same cosine test, the
    * bucket only restricts candidates), so recall = bucket_pairs /
    * true_pairs with no hit join. `sampleMod` REQUIRED — the truth tier
    * is quadratic in the sample (broadcast BNLJ, bounded). One row:
    * `(true_pairs, bucket_pairs, recall)`; recall NULL on empty truth.
    */
  def bucketedRecall(df: DataFrame, vecCol: String, idCol: String,
      bucketCol: String, threshold: Double, sampleMod: Int): DataFrame = {
    require(sampleMod >= 1, "sampleMod is required: the truth tier is quadratic in the sample")
    val sample = df.filter(col(vecCol).isNotNull && col(idCol) % sampleMod === 0)
      .select(col(idCol), col(vecCol), col(bucketCol))
    val l = sample.select(col(idCol).as("d1"), col(vecCol).as("v1"))
    val r = sample.select(col(idCol).as("d2"), col(vecCol).as("v2"))
    val truth = l.crossJoin(broadcast(r))
      .filter(col("d1") < col("d2") &&
        VectorFunctions.cosine(col("v1"), col("v2")) >= threshold)
    val bl = sample.select(col(idCol).as("d1"), col(vecCol).as("v1"),
      col(bucketCol).as("_bk"))
    val br = sample.select(col(idCol).as("d2"), col(vecCol).as("v2"),
      col(bucketCol).as("_bk"))
    val caught = bl.join(br, Seq("_bk"))
      .filter(col("d1") < col("d2") &&
        VectorFunctions.cosine(col("v1"), col("v2")) >= threshold)
    truth.agg(count(lit(1)).as("true_pairs"))
      .crossJoin(caught.agg(count(lit(1)).as("bucket_pairs")))
      .select(col("true_pairs"), col("bucket_pairs"),
        when(col("true_pairs") > 0,
          round(col("bucket_pairs").cast("double") / col("true_pairs").cast("double"), 6))
          .as("recall"))
  }

  /** DuckDB twin of [[bucketedRecall]] over `src` (table or CTE with
    * `$idCol`, `$vecCol`, `$bucketCol`).
    */
  def bucketedRecallSql(src: String, vecCol: String, idCol: String,
      bucketCol: String, threshold: Double, sampleMod: Int): String =
    s"""rs AS (SELECT $idCol AS id, $vecCol AS v, $bucketCol AS bk FROM $src
       |  WHERE $vecCol IS NOT NULL AND $idCol % $sampleMod = 0),
       |rtp AS (SELECT a.id AS d1, b.id AS d2 FROM rs a, rs b
       |  WHERE a.id < b.id
       |    AND ${VectorFunctions.cosineSql("a.v", "b.v")} >= $threshold),
       |rbp AS (SELECT a.id AS d1, b.id AS d2 FROM rs a JOIN rs b
       |  ON a.bk = b.bk AND a.id < b.id
       |  WHERE ${VectorFunctions.cosineSql("a.v", "b.v")} >= $threshold)
       |SELECT (SELECT count(*) FROM rtp) AS true_pairs,
       |  (SELECT count(*) FROM rbp) AS bucket_pairs,
       |  CASE WHEN (SELECT count(*) FROM rtp) > 0 THEN
       |    round(CAST((SELECT count(*) FROM rbp) AS DOUBLE)
       |      / CAST((SELECT count(*) FROM rtp) AS DOUBLE), 6) END AS recall""".stripMargin
}

/** YAML-safe semantic dedup: trains a seeded k-means bucketing over the
  * embedding column, then runs the BUCKETED cosine dedup within each
  * cluster — never the O(n²) crossJoin. This is the registry's fallback
  * when no `bucket_field` is configured, so a config file cannot reach
  * the brute-force tier (that tier stays API-only, for ≤10⁵-row use);
  * the reference's own design is exactly "cluster-id as bucket id"
  * (framework/backend.py:89-93).
  *
  * Scale shape: one Spark ML k-means fit (distributed Lloyd's), a pure
  * per-row assignment, then the pairwise join shuffles on the cluster
  * id. Cross-bucket near-dup pairs are missed by construction — the
  * standard recall trade of cluster-bucketed semantic dedup; raise
  * `numBuckets` quality by training on more iterations, or pre-compute
  * a bucket column and pass `bucket_field` to control it explicitly.
  */
final class AutoBucketedCosineDedup(
    vecCol: String = "embedding",
    idCol: String = "id",
    threshold: Double = 0.95,
    numBuckets: Int = 16,
    seed: Long = 42L) extends graft.core.RejectingOperator {

  val name = "embedding_cosine_dedup"
  private val bucketCol = "_auto_bucket"
  private val inner = new EmbeddingCosineDedup(vecCol, idCol, threshold, Some(bucketCol))

  private def withBuckets(df: DataFrame): DataFrame =
    new graft.operators.ml.KMeansBuckets(vecCol, bucketCol, numBuckets, seed)
      .fitTransform(df)

  def apply(df: DataFrame): DataFrame = inner(withBuckets(df)).drop(bucketCol)

  def rejected(df: DataFrame): DataFrame =
    inner.rejected(withBuckets(df)).drop(bucketCol)

  def mark(df: DataFrame, alive: org.apache.spark.sql.Column, tag: String): graft.core.Marked = {
    val m = graft.core.PairwiseMark(
      withBuckets(df), alive, tag, idCol, name, inner.verifiedPairs)
    m.copy(internalCols = m.internalCols :+ bucketCol)
  }
}
