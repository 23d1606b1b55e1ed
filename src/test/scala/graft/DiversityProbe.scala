package graft

/** Dev-only probe: per-order cost of NgramDiversity at the bench scale. */
object DiversityProbe {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    docs.persist(); docs.count()
    def time[A](f: => A): Double = {
      val t0 = System.nanoTime; f; (System.nanoTime - t0) / 1e9
    }
    val toks = graft.functions.TextFunctions.tokensOf(col("text"))
    for (n <- 1 to 3) {
      val grams = if (n == 1) toks else graft.functions.TextFunctions.shingles(toks, n)
      val t = time {
        docs.select(explode(grams).as("_g"))
          .agg(count(lit(1)), countDistinct(col("_g"))).collect()
      }
      println(f"ORDER $n: $t%.2f s")
    }
    // variant: STAGED token column (projection boundary)
    for (n <- 2 to 3) {
      val staged = docs.select(graft.functions.TextFunctions.tokensOf(col("text")).as("_toks"))
      val grams = graft.functions.TextFunctions.shingles(col("_toks"), n)
      val t = time {
        staged.select(explode(grams).as("_g"))
          .agg(count(lit(1)), countDistinct(col("_g"))).collect()
      }
      println(f"ORDER $n staged: $t%.2f s")
    }
    // variant: count distinct over the 64-bit hash instead of the string
    for (n <- 2 to 3) {
      val grams = graft.functions.TextFunctions.shingles(toks, n)
      val t = time {
        docs.select(explode(grams).as("_g"))
          .select(xxhash64(col("_g")).as("_h"))
          .agg(count(lit(1)), countDistinct(col("_h"))).collect()
      }
      println(f"ORDER $n hashed: $t%.2f s")
    }
  }
}
