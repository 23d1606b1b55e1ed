package graft.operators.text

import graft.functions.{HashFunctions, TextFunctions}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cross-source contamination report: for every source, how many of
  * its documents also appear (same normalized text) in at least one
  * OTHER source, and what fraction that is — the due-diligence pass
  * before mixing corpora (a high overlap means double-counted mass
  * and a biased mixture after dedup; run it BEFORE choosing mixture
  * weights).
  *
  * Scale shape: normalized-text hashes (fixed-width) are the only
  * payload past the first projection. One aggregate per distinct
  * (source, hash) pair, one per hash (distinct-source count), one
  * hash-keyed join back, one final per-source rollup — every exchange
  * is narrow and map-side combined; document text never shuffles.
  */
final class CorpusOverlapReport(
    textCol: String = "text",
    sourceCol: String = "source",
    hashName: String = "xxhash64") {

  private def textHash = HashFunctions.hashByName(hashName)(
    TextFunctions.normalizeText(coalesce(col(textCol), lit(""))))

  /** `(source, n_docs, n_overlap, overlap_frac)` per source. */
  def report(df: DataFrame): DataFrame = {
    val docs = df.select(col(sourceCol).as("_src"), textHash.as("_h"))
    val nSources = docs.distinct()
      .groupBy("_h").agg(count(lit(1)).as("_nsrc"))
    docs.join(nSources, "_h")
      .groupBy(col("_src").as("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("_nsrc") >= 2, 1L).otherwise(0L)).as("n_overlap"))
      .withColumn("overlap_frac",
        round(col("n_overlap") / col("n_docs").cast("double"), 6))
  }

  /** DuckDB twin over `table` (portable hash family only). */
  def sql(table: String): String = {
    require(hashName == "portable", "oracle covers the portable hash family")
    val h = HashFunctions.portableHash64Sql(
      TextFunctions.normalizeTextSql(s"coalesce($textCol, '')"))
    s"""WITH dh AS (SELECT $sourceCol AS src, $h AS h FROM $table),
       |ns AS (SELECT h, count(*) AS nsrc FROM (SELECT DISTINCT src, h FROM dh) GROUP BY 1)
       |SELECT src AS source, count(*) AS n_docs,
       |  CAST(sum(CASE WHEN nsrc >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_overlap,
       |  round(sum(CASE WHEN nsrc >= 2 THEN 1 ELSE 0 END) / CAST(count(*) AS DOUBLE), 6) AS overlap_frac
       |FROM dh JOIN ns USING (h) GROUP BY 1""".stripMargin
  }
}
