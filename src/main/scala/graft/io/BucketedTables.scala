package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table layout for exchange-free equi-joins — the brief's
  * "bucketing for co-located joins" tier. Writing both sides of a
  * recurring join `bucketBy(n, key).sortBy(key)` pins rows to buckets by
  * `hash(key) % n` at WRITE time, so every later join or aggregation on
  * that key runs with NO shuffle exchange and NO sort: Spark's bucketing
  * rules recognize matching bucket specs (same count, same key) and plan
  * a SortMergeJoin straight over the bucket files. At 100 TB this turns
  * the nightly fact⋈dim repartition — usually the single largest
  * exchange in the pipeline — into a metadata no-op paid once at
  * ingest.
  *
  * Only `saveAsTable` persists bucket metadata (path-based
  * `.parquet(...)` writes silently drop the spec — the classic trap),
  * so this goes through the session catalog like [[CatalogTableWriter]].
  */
object BucketedTables {

  /** Write `df` as a bucketed+sorted managed table (overwriting), keyed
    * for exchange-free joins on `key`.
    */
  def write(df: DataFrame, table: String, key: String, buckets: Int,
      format: String = "parquet"): Unit = {
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    df.write.format(format)
      .bucketBy(buckets, key)
      .sortBy(key)
      .mode("overwrite")
      .saveAsTable(table)
  }

  /** The co-located join of two same-spec bucketed tables. The plan
    * contract (asserted in WriterSpec): zero ShuffleExchange nodes —
    * bucket pruning stands in for both repartitions.
    */
  def join(spark: SparkSession, left: String, right: String, key: String,
      joinType: String = "inner"): DataFrame =
    spark.table(left).join(spark.table(right), Seq(key), joinType)
}
