package graft

/** Local smoke: runs SparkEntry.entry exactly like the driver's t1 check. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.builder("local[8]", 8).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.entry(spark)
    println("ENTRY_ROWS=" + df.count())
    df.show(3, 80)
    spark.stop()
  }
}
