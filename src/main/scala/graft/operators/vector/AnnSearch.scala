package graft.operators.vector

import graft.functions.VectorFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Two tiers:
  *  - [[bruteForceTopK]]: exact cosine top-k — broadcast the query vector,
  *    one scan, `TakeOrderedAndProject` (no global sort). The baseline and
  *    the within-bucket refinement step.
  *  - [[signBucket]] + [[lshTopK]]: LSH-bucketed search. The bucket id is
  *    the sign pattern of `numBits` fixed hyperplanes; candidates = the
  *    query's bucket only, then exact cosine within. At 100 TB the table
  *    is written bucketed/partitioned by this id, so a query touches one
  *    partition instead of the full corpus (same layout as an IVF coarse
  *    quantizer; see graft.operators.ml.KMeansBuckets for the learned
  *    variant).
  *
  * Hyperplanes here are axis-aligned (bit k = sign of coordinate
  * `coords(k)`) — deterministic, engine-portable, and what the DuckDB twin
  * checks. Random-hyperplane planes are a drop-in: replace the element
  * lookup with `dot(v, plane_k)`.
  */
object AnnSearch {

  /** Exact top-k by cosine against a single query vector (id tiebreak). */
  def bruteForceTopK(df: DataFrame, queryDf: DataFrame, vecCol: String,
      idCol: String, k: Int): DataFrame = {
    val q = broadcast(queryDf.select(col(vecCol).as("_qv")))
    df.crossJoin(q)
      .withColumn("cosine", VectorFunctions.cosine(col(vecCol), col("_qv")))
      .select(col(idCol), col("cosine"))
      .orderBy(col("cosine").desc, col(idCol))
      .limit(k)
  }

  /** Sign-pattern LSH bucket id over the given coordinates. */
  def signBucket(vec: Column, coords: Seq[Int]): Column =
    coords.zipWithIndex.map { case (c, k) =>
      when(element_at(vec, c + 1) >= 0f, lit(1L << k)).otherwise(lit(0L))
    }.reduce(_ + _)

  def signBucketSql(vecExpr: String, coords: Seq[Int]): String =
    coords.zipWithIndex.map { case (c, k) =>
      s"(CASE WHEN $vecExpr[${c + 1}] >= 0 THEN CAST(${1L << k} AS BIGINT) ELSE 0 END)"
    }.mkString("(", " + ", ")")

  /** IVF top-k: coarse-quantize the corpus to `centroids` (k-means cells,
    * the learned counterpart of [[signBucket]]), probe the `nprobe` cells
    * nearest the query, exact cosine within — the standard
    * inverted-file ANN layout. At 100 TB the table is written partitioned
    * by the cell id ([[graft.io.BucketedTableWriter]]), so a query reads
    * `nprobe` partitions instead of the corpus; recall is tuned by
    * `nprobe` alone. Cell assignment reuses the NearestCentroid kernel;
    * probe selection is a driver-side argsort over k centroid distances
    * (tiny), tie-broken by cell index like the kernel.
    */
  def ivfTopK(df: DataFrame, queryDf: DataFrame, vecCol: String, idCol: String,
      k: Int, centroids: Seq[Seq[Double]], nprobe: Int): DataFrame = {
    val q = queryDf.select(col(vecCol).cast("array<double>")).head().getSeq[Double](0)
    val probes = centroids.zipWithIndex
      .map { case (c, i) => (VectorFunctions.l2sq(q, c), i) }
      .sorted.take(nprobe).map(_._2)
    val cell = graft.plans.kernels.nearest_centroid(col(vecCol), centroids)
    val qv = broadcast(queryDf.select(col(vecCol).as("_qv")))
    df.withColumn("_cell", cell)
      .filter(col("_cell").isin(probes: _*))
      .crossJoin(qv)
      .withColumn("cosine", VectorFunctions.cosine(col(vecCol), col("_qv")))
      .select(col(idCol), col("cosine"))
      .orderBy(col("cosine").desc, col(idCol))
      .limit(k)
  }

  /** Top-k within the query's LSH bucket (exact cosine as refinement). */
  def lshTopK(df: DataFrame, queryDf: DataFrame, vecCol: String,
      idCol: String, k: Int, coords: Seq[Int]): DataFrame = {
    val q = broadcast(queryDf.select(col(vecCol).as("_qv"))
      .withColumn("_qb", signBucket(col("_qv"), coords)))
    df.withColumn("_b", signBucket(col(vecCol), coords))
      .join(q, col("_b") === col("_qb"))
      .withColumn("cosine", VectorFunctions.cosine(col(vecCol), col("_qv")))
      .select(col(idCol), col("cosine"))
      .orderBy(col("cosine").desc, col(idCol))
      .limit(k)
  }
}
