package graft.io

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** JSONL export sink — the interchange format the training stack
  * downstream of a curation pipeline actually ingests (HF `load_dataset
  * ("json", ...)`, Megatron/GPT-NeoX preprocessing, most eval
  * harnesses): one JSON object per line, gzip-compressed shards, plus a
  * `manifest.json` with shard names, per-shard line counts, and the
  * total — the file a resumable downstream loader needs to plan reads
  * without listing-and-counting 10⁵ shards itself.
  *
  * Scale shape: the rows are written by Spark's native json sink
  * (codegen'd serialization, one file per task — no driver
  * involvement); `targetFileMb` reuses the [[ParquetDataWriter]]
  * coalesce-from-plan-stats discipline so a 100 TB export lands as
  * bounded-size shards instead of one file per shuffle partition. The
  * manifest's per-shard counts come from ONE pass over the written
  * shard FILES' metadata-free line counts — computed distributedly by
  * re-reading the shards as text (a cheap, sequential, column-pruned
  * scan), never by collecting data to the driver.
  */
final class JsonlDataWriter(
    outputPath: String,
    tableName: String,
    compression: String = "gzip",
    targetFileMb: Option[Int] = None) {

  private def tablePath = s"$outputPath/$tableName"

  private def compacted(df: DataFrame): DataFrame = targetFileMb match {
    case None => df
    case Some(mb) =>
      require(mb >= 1, s"target_file_mb must be >= 1, got $mb")
      val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
      val n = ((bytes + (mb.toLong << 20) - 1) / (mb.toLong << 20)).max(1)
      df.coalesce(n.min(BigInt(10000)).toInt)
  }

  def write(df: DataFrame): Unit = {
    compacted(df).write.mode("append")
      .option("compression", compression)
      .json(tablePath)
    writeManifest(df.sparkSession)
  }

  /** (Re)build `manifest.json` from the shards on storage: shard file
    * name → line count, plus the total. Distributed count per file via
    * the text source's `input_file_name`.
    */
  private def writeManifest(spark: org.apache.spark.sql.SparkSession): Unit = {
    val perFile = spark.read.textFile(s"$tablePath/*.json*").toDF("line")
      .select(input_file_name().as("f"))
      .groupBy(col("f")).agg(count(lit(1)).as("n"))
      .collect()
      .map(r => (r.getString(0).split('/').last, r.getLong(1)))
      .sortBy(_._1)
    val total = perFile.map(_._2).sum
    val shards = perFile.map { case (f, n) => s"""{"file":"$f","rows":$n}""" }
      .mkString("[", ",", "]")
    val manifest =
      s"""{"table":"$tableName","format":"jsonl","compression":"$compression","total_rows":$total,"shards":$shards}"""
    val p = new org.apache.hadoop.fs.Path(s"$tablePath/manifest.json")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(manifest.getBytes("UTF-8")) finally out.close()
  }
}
