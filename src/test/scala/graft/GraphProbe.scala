package graft

import org.apache.spark.sql.functions._

/** Dev-only probe: the pagerank5 / lpa4 / triangle probe legs at 10x
  * replication, 3 reps each — mirrors the Bench scale-probe staging so
  * iterative-graph changes can be measured in isolation.
  */
object GraphProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.GraftSession
      .builder(s"local[$cpus]", cpus.toInt, codegenCacheEntries = 10000)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"))
    val big = (0 until 10).map(i =>
      docs.withColumn("doc_id", col("doc_id") + lit(i * 10000000L)))
      .reduce(_ unionByName _)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = big.count()
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime; f; (System.nanoTime - t0) / 1e9
    }
    def leg(name: String)(f: => Unit): Unit = {
      f // warmup
      val ts = (1 to 3).map(_ => time(f))
      println(f"GRAPHPROBE $name reps: ${ts.map(t => f"$t%.2f").mkString(", ")} min ${ts.min}%.2f")
    }
    val nodes = big.select(col("doc_id").as("id"))
    leg("pagerank5") {
      val edges = nodes.select(col("id").as("src"), ((col("id") * 2 + 1) % n).as("dst"))
        .unionByName(nodes.select(col("id").as("src"), ((col("id") * 3 + 7) % n).as("dst")))
      new graft.operators.graph.FixedPointPageRank(iterations = 5)
        .ranks(nodes, edges).count()
    }
    leg("lpa4") {
      val edges = nodes.select(col("id").as("src"),
          ((col("id") * 2 + 1) % n).as("dst"), lit(2L).as("n"))
        .unionByName(nodes.select(col("id").as("src"),
          ((col("id") * 3 + 7) % n).as("dst"), lit(1L).as("n")))
      new graft.operators.graph.LabelPropagation(iterations = 4)
        .communities(edges).count()
    }
    leg("triangle") {
      graft.core.Staging.scoped {
        val ids = spark.range(n).toDF("id")
        val tedges = ids.select(col("id").as("src"), ((col("id") + 1) % n).as("dst"))
          .unionByName(ids.select(col("id").as("src"), ((col("id") + 2) % n).as("dst")))
        new graft.operators.graph.TriangleCount().counts(tedges).count()
      }
    }
    leg("kcore") {
      val ids = spark.range(n).toDF("id")
      val tedges = ids.select(col("id").as("src"), ((col("id") + 1) % n).as("dst"))
        .unionByName(ids.select(col("id").as("src"), ((col("id") + 2) % n).as("dst")))
      new graft.operators.graph.KCore(k = 3, rounds = 3)(tedges).count()
    }
    spark.stop()
  }
}
