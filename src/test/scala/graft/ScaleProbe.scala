package graft

import graft.operators.dedup.{MinHashLSHDedup, TextExactDedup}
import graft.operators.text.TextLengthFilter
import org.apache.spark.sql.functions._

/** Dev utility: run representative operators against a larger replicated
  * documents table (see tools/ or session notes for generation) and print
  * throughput — the would-it-survive-10× probe behind STATUS.md's scale
  * notes. Run: `sbt "Test/runMain graft.ScaleProbe /tmp/sf1x"`.
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf1x")
    val spark = TestSpark.spark
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val n = docs.count()

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val rows = f
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"PROBE $name%-28s $dt%7.1f s  $rows%8d rows  ${n / dt}%9.0f docs/s")
    }

    // warmup
    docs.write.format("noop").mode("overwrite").save()

    time("filter_chain") {
      new TextLengthFilter(minLength = 100, maxLength = Some(400),
        textCol = "text", lengthCol = Some("n_chars"))(docs).count()
    }
    time("exact_dedup") {
      TextExactDedup(textCol = "text", idCol = "doc_id", orderCol = "doc_id")(docs).count()
    }
    time("minhash_lsh_dedup") {
      new MinHashLSHDedup(textCol = "text", idCol = "doc_id",
        shingleWidth = 3, numHashes = 16, numBands = 4, threshold = 0.8,
        maxBucketSize = Some(50))(docs).count()
    }
    time("minhash_signatures_only") {
      new MinHashLSHDedup(textCol = "text", idCol = "doc_id")
        .signatures(docs).count()
    }
    time("minhash_precollapse") {
      new MinHashLSHDedup(textCol = "text", idCol = "doc_id",
        shingleWidth = 3, numHashes = 16, numBands = 4, threshold = 0.8,
        preCollapseExact = true)(docs).count()
    }
    spark.stop()
  }
}
