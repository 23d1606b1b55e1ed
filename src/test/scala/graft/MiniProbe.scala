package graft

import org.apache.spark.sql.functions._

/** Dev one-off: the Bench doc-probe legs in a FRESH JVM, to separate
  * operator regressions from bench-harness JVM contamination.
  */
object MiniProbe {
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
      val t0 = System.nanoTime(); f
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"MINIPROBE $name%-24s $dt%7.2f s  ${n / dt}%9.0f docs/s")
    }
    time("minhash_lsh_capped") {
      new graft.operators.dedup.MinHashLSHDedup(
        textCol = "text", idCol = "doc_id",
        shingleWidth = 3, numHashes = 16, numBands = 4, threshold = 0.8,
        maxBucketSize = Some(50))(big).count()
    }
    time("minhash_lsh_capped_2") {
      new graft.operators.dedup.MinHashLSHDedup(
        textCol = "text", idCol = "doc_id",
        shingleWidth = 3, numHashes = 16, numBands = 4, threshold = 0.8,
        maxBucketSize = Some(50))(big).count()
    }
    time("dup_ngram_noop") {
      new graft.operators.text.DupNgramRefiner(
        textCol = "text", idCol = "doc_id", ngramWidth = 8, minCount = 2)(big)
        .write.format("noop").mode("overwrite").save(); n
    }
    time("gopher_filter_kernel") {
      new graft.operators.text.GopherQualityFilter(
        "text", minWords = 10, minStopwords = 1)(big).count()
    }
    time("gopher_filter_kernel_2") {
      new graft.operators.text.GopherQualityFilter(
        "text", minWords = 10, minStopwords = 1)(big).count()
    }
    time("c4_filter_kernel") {
      new graft.operators.text.C4QualityFilter("text")(big).count()
    }
    spark.stop()
  }
}
