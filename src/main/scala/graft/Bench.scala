package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = graft.core.GraftSession.builder(s"local[$cpus]", cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def runOne(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Unit =
      // noop sink materializes every output column (count() would let
      // Catalyst prune the computed columns and fake the numbers)
      try { fn(spark, sfDir).write.format("noop").mode("overwrite").save() }
      catch { case e: Throwable => System.err.println(s"[bench] $name: $e") }
    // Deterministic order + full warmup pass: without these, the first
    // Map-ordered query eats JVM/codegen warmup (~9s in round 1) and
    // round-over-round per-query deltas are meaningless.
    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)
    ordered.foreach { case (n, fn) => runOne(n, fn) }
    val results = ordered.map { case (name, fn) =>
      val t0 = System.nanoTime()
      runOne(name, fn)
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
