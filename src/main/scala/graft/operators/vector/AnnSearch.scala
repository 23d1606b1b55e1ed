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

  /** k-NN JOIN: exact cosine top-k corpus neighbors for EVERY query row —
    * the batch form of [[bruteForceTopK]] (retrieval evaluation, nearest-
    * neighbor labeling, and dedup candidate mining all need per-query
    * neighbor sets, not one lookup).
    *
    * Scale shape: the query side broadcasts (queries are small by
    * construction, ≲10⁵ rows); cosine scoring runs inside whole-stage
    * codegen on the fact scan; a bounded-heap mapPartitions pass then
    * reduces each input partition to at most `k` candidates PER QUERY,
    * so the only shuffle carries `partitions × queries × k` rows — never
    * the `corpus × queries` candidate stream. (The heap pass is the one
    * deliberate mapPartitions here: Catalyst has no bounded partial
    * top-k aggregate, and an unbounded `collect_list` would ship every
    * candidate through the exchange.) Final per-query rank is a window
    * over the pruned rows. Ids must be long-typed (the repo's id
    * convention); ties break by ascending id like every top-k gate.
    */
  def knnJoin(df: DataFrame, queries: DataFrame, vecCol: String, idCol: String,
      qIdCol: String, k: Int): DataFrame = {
    val q = broadcast(queries.select(col(qIdCol).as("_qid"), col(vecCol).as("_qv")))
    perQueryTopK(df.crossJoin(q), vecCol, idCol, k)
  }

  /** LSH-bucketed k-NN join — the large-query-set scale path: candidates
    * are restricted to the query's sign-pattern bucket (a broadcast HASH
    * join on the bucket id instead of the full cross product), then the
    * same bounded-heap prune + window. Approximate like [[lshTopK]]:
    * recall is governed by the bucket resolution (`coords`).
    */
  def knnJoinLsh(df: DataFrame, queries: DataFrame, vecCol: String, idCol: String,
      qIdCol: String, k: Int, coords: Seq[Int]): DataFrame = {
    val q = broadcast(queries.select(col(qIdCol).as("_qid"), col(vecCol).as("_qv"))
      .withColumn("_qb", signBucket(col("_qv"), coords)))
    val cand = df.withColumn("_qb", signBucket(col(vecCol), coords))
      .join(q, Seq("_qb"))
    perQueryTopK(cand, vecCol, idCol, k)
  }

  /** Hard-negative mining for contrastive/embedding training: for each
    * query row, the k corpus vectors MOST similar to it that carry a
    * DIFFERENT label (and are not the query row itself) — semantically
    * close yet differently-labeled examples, the negatives that actually
    * move a contrastive loss (easy random negatives saturate; see e.g.
    * the in-batch-negatives literature). Same scale shape as [[knnJoin]]:
    * queries broadcast, label filter runs BEFORE the bounded heap so
    * rejected candidates never occupy heap slots, top-k per query from
    * map-side heaps + one rank window.
    */
  def hardNegatives(df: DataFrame, queries: DataFrame, vecCol: String,
      idCol: String, qIdCol: String, labelCol: String, k: Int): DataFrame = {
    val q = broadcast(queries.select(col(qIdCol).as("_qid"), col(vecCol).as("_qv"),
      col(labelCol).as("_qlab")))
    val cand = df.crossJoin(q)
      .filter(col(labelCol) =!= col("_qlab") && col(idCol) =!= col("_qid"))
    perQueryTopK(cand, vecCol, idCol, k)
  }

  /** Shared tail of the k-NN joins: codegen cosine scoring, worst-first
    * bounded heap per (partition, query), final rank window over the
    * pruned rows.
    */
  private def perQueryTopK(cand0: DataFrame, vecCol: String, idCol: String,
      k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cand = cand0
      .select(col("_qid").cast("long"), col(idCol).cast("long"),
        VectorFunctions.cosine(col(vecCol), col("_qv")).cast("double"))
      .toDF("_1", "_2", "_3")
      .as[(Long, Long, Double)](org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.Encoders.scalaDouble))
    val kk = k
    val pruned = cand.mapPartitions { iter =>
      // worst-first heap per query id: keep the k best (cosine desc, id asc)
      val worstFirst = Ordering.by[(Long, Double), (Double, Long)] {
        case (id, c) => (c, -id)
      }
      val heaps = scala.collection.mutable.Map.empty[Long, scala.collection.mutable.PriorityQueue[(Long, Double)]]
      iter.foreach { case (qid, id, c) =>
        val h = heaps.getOrElseUpdate(qid,
          scala.collection.mutable.PriorityQueue.empty[(Long, Double)](worstFirst.reverse))
        if (h.size < kk) h.enqueue((id, c))
        else {
          val (wid, wc) = h.head
          if (c > wc || (c == wc && id < wid)) { h.dequeue(); h.enqueue((id, c)) }
        }
      }
      heaps.iterator.flatMap { case (qid, h) => h.iterator.map { case (id, c) => (qid, id, c) } }
    }(org.apache.spark.sql.Encoders.tuple(
      org.apache.spark.sql.Encoders.scalaLong,
      org.apache.spark.sql.Encoders.scalaLong,
      org.apache.spark.sql.Encoders.scalaDouble))
      .toDF("_qid", "_id", "cosine")
    val w = Window.partitionBy(col("_qid")).orderBy(col("cosine").desc, col("_id"))
    pruned.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= kk)
      .select(col("_qid").as("query_id"), col("_id").as(idCol), col("cosine"))
  }

  /** Mutual (reciprocal) k-NN pairs within ONE vector set: `(a, b)` with
    * a < b where b is in a's bucket-restricted top-k AND a is in b's —
    * the standard alignment/anchor-mining primitive (mutual neighbors
    * are far more likely true semantic matches than one-directional
    * ones, cf. reciprocal-rank re-ranking in retrieval). Candidates come
    * from the SAME sign-bucket equi-join as [[knnJoinLsh]] but WITHOUT
    * broadcasting (both sides are the full set — the join shuffles on
    * the bucket id), then the bounded-heap top-k, then a self-join of
    * the (n·k)-row top-k edge list on the reversed pair key. Nothing
    * larger than n·k rows ever shuffles after the bucket join.
    */
  def mutualKnnLsh(df: DataFrame, vecCol: String, idCol: String,
      k: Int, coords: Seq[Int]): DataFrame = {
    val a = df.select(col(idCol).as("_qid"), col(vecCol).as("_qv"))
      .withColumn("_qb", signBucket(col("_qv"), coords))
    val b = df.select(col(idCol), col(vecCol))
      .withColumn("_qb", signBucket(col(vecCol), coords))
    val cand = b.join(a, Seq("_qb")).filter(col(idCol) =!= col("_qid"))
    val top = perQueryTopK(cand, vecCol, idCol, k)
    val fwd = top.select(col("query_id").as("a"), col(idCol).as("b"), col("cosine"))
    val rev = top.select(col(idCol).as("_ra"), col("query_id").as("_rb"))
    fwd.join(rev, col("a") === col("_ra") && col("b") === col("_rb"), "left_semi")
      .filter(col("a") < col("b"))
      .select(col("a"), col("b"), col("cosine"))
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
