package graft

import graft.functions.ZOrder
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ZOrderSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def m(x: Long, y: Long): Long =
    Seq((x, y)).toDF("x", "y")
      .select(ZOrder.morton(col("x"), col("y"))).as[Long].head()

  test("morton interleaves bits: x even, y odd") {
    assert(m(0, 0) == 0L)
    assert(m(1, 0) == 1L)
    assert(m(0, 1) == 2L)
    assert(m(3, 5) == 39L) // spread(3)=0b101=5, spread(5)=0b10001=17 -> 5|34
    assert(m(0xFFFFFFFFL, 0) == 0x5555555555555555L)
    assert(m(0, 0xFFFFFFFFL) == 0xAAAAAAAAAAAAAAAAL)
  }

  test("morton is monotone per dimension with the other fixed") {
    val xs = (0L until 64L).map(m(_, 7L))
    assert(xs == xs.sorted)
    val ys = (0L until 64L).map(m(7L, _))
    assert(ys == ys.sorted)
  }

  test("layout: one range exchange, files cover disjoint z ranges") {
    val df = (0L until 4096L).map(i => (i % 64, i / 64)).toDF("x", "y")
    val laid = ZOrder.layout(df, col("x"), col("y"), numFiles = 8)
    val p = laid.queryExecution.executedPlan.toString
    assert("Exchange rangepartitioning".r.findAllIn(p).size == 1, p)
    assert(!p.contains("Exchange hashpartitioning"), p)
    // recompute z per partition: min/max ranges must not overlap
    val ranges = laid.select(ZOrder.morton(col("x"), col("y")).as("z"))
      .withColumn("pid", spark_partition_id())
      .groupBy("pid").agg(min("z").as("lo"), max("z").as("hi"))
      .orderBy("lo").as[(Int, Long, Long)].collect()
    assert(ranges.length > 1)
    ranges.sliding(2).foreach {
      case Array((_, _, hi1), (_, lo2, _)) => assert(hi1 <= lo2, s"overlap: $hi1 vs $lo2")
      case _ => ()
    }
  }
}
