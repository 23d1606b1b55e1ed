package graft

/** Dev aid: print the physical plan of named gate queries. */
object PrintPlans {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.builder("local[4]", 4).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val byName = SparkEntry.queries
    args.foreach { n =>
      println(s"==== $n ====")
      println(byName(n)(spark, "/root/testdata/sf0.001").queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
