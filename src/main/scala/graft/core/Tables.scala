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

  /** `events.ts` normalized to microsecond TimestampType (LTZ) whatever
    * the fixture's physical type is — the driver has shipped it as both
    * INT64 TIMESTAMP(NANOS) (scans as LongType under
    * `spark.sql.legacy.parquet.nanosAsLong=true`; rounds 10 and earlier)
    * and TIMESTAMP(MICROS, isAdjustedToUTC=false) (scans as
    * TIMESTAMP_NTZ; round 11 testdata). DuckDB reads both as a naive
    * TIMESTAMP, so with the session pinned to UTC both branches land on
    * identical epoch micros.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val raw = apply(spark, dir, "events")
    raw.schema("ts").dataType match {
      // integer DIV, not `/`: epoch nanos (~1.7e18) exceed double's 53-bit
      // mantissa, so float division is off by ±1 µs; DuckDB truncates the
      // same way when it reads TIMESTAMP_NANOS as TIMESTAMP
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      // NTZ → LTZ cast reinterprets wall time in the session zone (UTC,
      // GraftSession) — exact epoch parity with DuckDB's epoch_us
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => raw
    }
  }
}
