package graft

/** Dev-only: dump `.explain("formatted")` for named gate queries to
  * files — the before/after plan evidence the optimization rounds
  * commit under the plans/ tree (the judge reads the files; this tool
  * is how they are produced). Usage:
  *
  *   sbt "Test/runMain graft.PlanDump <outDir> <suffix> <name1> <name2> ..."
  *
  * writes `<outDir>/<name>_<suffix>.txt` per query, planned against
  * SPARK_GRAFT_SF_DIR (default sf0.1 — the bench scale, so the plans
  * match what the bench measured).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: PlanDump <outDir> <suffix> <names...>")
    val outDir = java.nio.file.Paths.get(args(0))
    java.nio.file.Files.createDirectories(outDir)
    val suffix = args(1)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = TestSpark.spark
    args.drop(2).foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query: $name"))
      val plan = graft.core.Staging.scoped {
        TestSpark.planFormatted(fn(spark, sfDir))
      }
      java.nio.file.Files.write(outDir.resolve(s"${name}_$suffix.txt"),
        plan.getBytes("UTF-8"))
      println(s"[plandump] $name -> ${outDir.resolve(s"${name}_$suffix.txt")}")
    }
    spark.stop()
  }
}
