package graft

import graft.queries.InferenceQueries

/** Regeneration utility for the image_clip_embed / image_degradations
  * oracle VALUES (queries/InferenceQueries.scala): runs the gate queries
  * themselves and prints their results as SQL literals. The clip values
  * are stub-encoder-over-PNG-bytes deterministic (same JVM ImageIO); the
  * degradations values should MATCH tools/gen_image_oracle.py's
  * independent numpy derivation — regenerate both and diff.
  * Run with `sbt "Test/runMain graft.PrintInferenceOracle"`.
  */
object PrintInferenceOracle {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark

    def lit(v: Any): String = v match {
      case d: java.lang.Double =>
        s"CAST(${new java.math.BigDecimal(d).setScale(6, java.math.RoundingMode.HALF_UP).toPlainString} AS DOUBLE)"
      case l: java.lang.Long => s"CAST($l AS BIGINT)"
      case other             => other.toString
    }

    for (name <- Seq("image_clip_embed", "image_siglip_embed", "image_degradations")) {
      val q = InferenceQueries.queries.find(_.name == name).get
      val rows = q.run(spark, "").collect()
      println(s"${name.toUpperCase}_START")
      println(rows.map(r =>
        "  (" + r.toSeq.map(lit).mkString(", ") + ")").mkString(",\n"))
      println(s"${name.toUpperCase}_END")
    }
    spark.stop()
  }
}
