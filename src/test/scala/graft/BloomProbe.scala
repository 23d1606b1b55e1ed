package graft

import org.apache.spark.sql.functions._

/** Dev one-off: the Bench bloom-vs-plain semi-join leg in isolation. */
object BloomProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_orderkey"), col("l_quantity"),
        col("l_extendedprice"), col("l_returnflag"))
    val bigLi = (0 until 10).map(i =>
      li.withColumn("l_orderkey", col("l_orderkey") + lit(i * 100000000L)))
      .reduce(_ unionByName _)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nl = bigLi.count()
    def time(name: String)(f: => Long): Unit = (1 to 3).foreach { i =>
      val t0 = System.nanoTime(); val c = f
      println(f"BLOOMPROBE $name%-16s rep $i: ${(System.nanoTime() - t0) / 1e9}%6.2f s (rows=$c, n=$nl)")
    }
    val bloomBuild = bigLi.select(col("l_orderkey").as("bk"))
      .where(col("bk") % 500 === 0).distinct()
    time("bloom_semi") {
      val bits = 1 << 20; val kh = 4
      val sk = bloomBuild.agg(graft.functions.BloomSketch.bloomSketch(
        xxhash64(col("bk")).bitwiseAND(lit((1L << 60) - 1)), bits, kh).as("bf"))
      bigLi.crossJoin(broadcast(sk))
        .where(graft.functions.BloomSketch.mightContain(col("bf"),
          xxhash64(col("l_orderkey")).bitwiseAND(lit((1L << 60) - 1)), bits, kh))
        .drop("bf")
        .join(bloomBuild.hint("merge"), col("l_orderkey") === col("bk"), "left_semi")
        .count()
    }
    time("plain_semi") {
      bigLi.join(bloomBuild.hint("merge"), col("l_orderkey") === col("bk"), "left_semi")
        .count()
    }
    spark.stop()
  }
}
