package graft

import graft.operators.image.ImagePhashDedup
import graft.sources.SyntheticImages
import org.apache.spark.sql.functions._

/** Regeneration utility for the image_phash_dedup oracle VALUES
  * (queries/ImageQueries.scala): prints the kept ids of the canonical
  * phash dedup over the synthetic fixture. Run with
  * `sbt "Test/runMain graft.PrintPhashKeep"` after changing the phash
  * algorithm or the fixture spec.
  */
object PrintPhashKeep {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    val op = new ImagePhashDedup("image", idCol = "id", orderCol = "id")
    val kept = op(SyntheticImages.df(spark).filter(col("id") <= 57))
      .select(col("id")).orderBy(col("id")).collect().map(_.getLong(0))
    println("PHASH_KEEP_START")
    println(kept.map(i => s"  (CAST($i AS BIGINT))").mkString(",\n"))
    println("PHASH_KEEP_END")
    val nearQ = graft.queries.ImageQueries.queries.find(_.name == "phash_near_dedup").get
    val nearKept = nearQ.run(spark, "").collect().map(_.getLong(0))
    println("PHASH_NEAR_KEEP_START")
    println(nearKept.map(i => s"  (CAST($i AS BIGINT))").mkString(",\n"))
    println("PHASH_NEAR_KEEP_END")
    spark.stop()
  }
}
