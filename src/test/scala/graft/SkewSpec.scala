package graft

import graft.core.Skew
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Salted-join semantics: identical result to the plain join, with the
  * hot key spread across salt values.
  */
class SkewSpec extends AnyFunSuite {
  import TestSpark._

  test("salted join equals plain join on a skewed dataset") {
    // 10k rows of one hot key + a tail
    val skewed = spark.range(11000).toDF("i")
      .withColumn("k", when(col("i") < 10000, lit(1L)).otherwise(col("i") % 50))
    val dim = spark.range(50).toDF("k").withColumn("v", col("k") * 10)
    val plain = skewed.join(dim, Seq("k")).groupBy(col("k"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("s"))
    val salted = Skew.saltedJoin(skewed, dim, "k", salts = 8).groupBy(col("k"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("s"))
    assert(plain.exceptAll(salted).isEmpty && salted.exceptAll(plain).isEmpty)
  }

  test("the hot key actually spreads across salts") {
    val skewed = spark.range(8000).toDF("i").withColumn("k", lit(1L))
    val salted = skewed.withColumn("_s",
      pmod(xxhash64(col("k"), monotonically_increasing_id()), lit(8L)))
    val buckets = salted.groupBy(col("_s")).count().collect().map(_.getLong(1))
    assert(buckets.length == 8, s"only ${buckets.length} salt buckets used")
    assert(buckets.max < 8000, "hot key not spread")
  }
}
