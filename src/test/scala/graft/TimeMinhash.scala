package graft

import org.apache.spark.sql.functions._

/** Dev one-off: decompose the 10x-replication minhash probe leg into
  * kernel / signature / join / cap stages to see where the time goes.
  */
object TimeMinhash {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"), col("n_chars"))
    val big = (0 until 10).map(i =>
      docs.withColumn("doc_id", col("doc_id") + lit(i * 10000000L)))
      .reduce(_ unionByName _)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = big.count()
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val r = f
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"TIMEMH $name%-28s $dt%7.2f s  (result $r)")
    }
    def op(cap: Option[Int], collapse: Boolean = false) = new graft.operators.dedup.MinHashLSHDedup(
      textCol = "text", idCol = "doc_id", shingleWidth = 3,
      numHashes = 16, numBands = 4, threshold = 0.8, maxBucketSize = cap,
      preCollapseExact = collapse)

    time("kernel_only") {
      big.select(graft.plans.kernels.shingle_hashes(col("text"), 3).as("_h"))
        .select(sum(size(col("_h")))).head().getLong(0)
    }
    time("kernel_plus_signature") {
      big.select(graft.plans.kernels.minhash_from_hashes(
          graft.plans.kernels.shingle_hashes(col("text"), 3), 16, false).as("_m"))
        .select(sum(size(col("_m")))).head().getLong(0)
    }
    time("pairs_uncapped") { op(None).verifiedPairs(big).count() }
    time("pairs_capped") { op(Some(50)).verifiedPairs(big).count() }
    time("apply_capped") { op(Some(50))(big).count() }
    time("apply_precollapse") { op(None, collapse = true)(big).count() }
    time("apply_uncapped") { op(None)(big).count() }
    time("exact_then_capped") {
      val survivors = graft.operators.dedup.TextExactDedup(
        textCol = "text", idCol = "doc_id", orderCol = "doc_id")(big)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val k = op(Some(50))(survivors).count()
      survivors.unpersist(); k
    }
    spark.stop()
  }
}
