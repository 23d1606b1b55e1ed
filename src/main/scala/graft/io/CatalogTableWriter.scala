package graft.io

import org.apache.spark.sql.DataFrame

/** W2: catalog-table sink via the DataSourceV2 `writeTo` API.
  *
  * The reference's IcebergDataWriter deliberately degrades to buffered
  * raw parquet without table metadata ("simplified approach",
  * writers/iceberg_writer.py:118-143). This writer is the non-degraded
  * form: `df.writeTo(catalog.db.table)` creates the table on first write
  * and appends atomically afterwards. Against the default session
  * catalog it manages parquet tables in the warehouse; with an Iceberg
  * catalog configured (`spark.sql.catalog.<name> =
  * org.apache.iceberg.spark.SparkCatalog` + the iceberg-spark-runtime
  * jar), the SAME calls produce real Iceberg tables with snapshot
  * isolation and schema evolution — no code change, which is the point
  * of targeting the V2 API.
  */
final class CatalogTableWriter(
    table: String,
    partitionBy: Seq[String] = Nil,
    format: String = "parquet") {

  def write(df: DataFrame): Unit = {
    val spark = df.sparkSession
    if (spark.catalog.tableExists(table)) {
      // V2 append (atomic snapshot on Iceberg-class catalogs); the
      // default session catalog resolves to a v1 table, where the
      // equivalent is insertInto.
      try df.writeTo(table).append()
      catch {
        case e: org.apache.spark.sql.AnalysisException
            if e.getMessage.contains("v1 table") =>
          df.write.mode("append").insertInto(table)
      }
    } else {
      import org.apache.spark.sql.functions.col
      val w = df.writeTo(table).using(format)
      val partitioned =
        if (partitionBy.isEmpty) w
        else w.partitionedBy(col(partitionBy.head), partitionBy.tail.map(col): _*)
      partitioned.create()
    }
  }

  def read(spark: org.apache.spark.sql.SparkSession): DataFrame = spark.table(table)
}

/** Bucketed-table sink: pre-shuffles data into `numBuckets` hash buckets
  * on the join/dedup key at WRITE time, so every later equi-join or
  * aggregation on that key is co-located and plans with NO exchange on
  * the bucketed side(s) — asserted in PlanSpec. This is the engine's
  * 100 TB posture for repeatedly-joined tables (pay the shuffle once at
  * ingest, never again); the same role `repartition` plays within a
  * single job, made durable.
  */
final class BucketedTableWriter(
    table: String,
    bucketCol: String,
    numBuckets: Int) {

  def write(df: DataFrame): Unit =
    df.write
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
      .mode("overwrite")
      .format("parquet")
      .saveAsTable(table)

  def read(spark: org.apache.spark.sql.SparkSession): DataFrame = spark.table(table)
}
