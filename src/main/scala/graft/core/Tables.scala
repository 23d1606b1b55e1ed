package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the fixture tables (TESTDATA.md). One parquet file per table;
  * on a cluster these would be directories — the API is identical.
  */
object Tables {
  val all: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** `events.ts` is INT64 TIMESTAMP(NANOS) — unsupported by Spark's parquet
    * reader. With `spark.sql.legacy.parquet.nanosAsLong=true` it scans as
    * LongType; convert to microsecond TimestampType here so downstream ops
    * see a real timestamp column.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val raw = apply(spark, dir, "events")
    // integer DIV, not `/`: epoch nanos (~1.7e18) exceed double's 53-bit
    // mantissa, so float division is off by ±1 µs; DuckDB truncates the
    // same way when it reads TIMESTAMP_NANOS as TIMESTAMP
    if (raw.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      raw.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
    else raw
  }
}
