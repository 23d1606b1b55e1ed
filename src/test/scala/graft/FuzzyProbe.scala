package graft

/** Dev-only probe: the fuzzy_join gate leg at sf0.1, 3 reps. */
object FuzzyProbe {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    val q = SparkEntry.queries("fuzzy_join")
    def time[A](f: => A): Double = {
      val t0 = System.nanoTime; f; (System.nanoTime - t0) / 1e9
    }
    val ts = (1 to 3).map(_ => time(q(spark, "/root/testdata/sf0.1").collect()))
    println(f"FUZZY reps: ${ts.map(t => f"$t%.2f").mkString(", ")} median ${ts.sorted.apply(1)}%.2f")
  }
}
