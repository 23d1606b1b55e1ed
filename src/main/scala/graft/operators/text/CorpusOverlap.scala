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

/** Pairwise cross-source contamination MATRIX — the drill-down behind
  * [[CorpusOverlapReport]]: for every unordered source pair `(a, b)`
  * with `a < b`, how many DISTINCT normalized texts the two sources
  * share. The per-source report says "source X is contaminated"; this
  * says by WHOM — the table a mixture planner actually reads when
  * deciding which corpus to drop or down-weight (two mirrors of the
  * same crawl show up as one bright off-diagonal cell).
  *
  * Scale shape: document text never shuffles — only fixed-width
  * (source, hash) rows reach the distinct exchange, keyed by HASH so
  * the per-hash source lists are co-located. The pair explosion is
  * per-hash over that list (≤ S sources per hash, so ≤ S²/2 pairs per
  * DISTINCT text — bounded by the source count, not by how many
  * duplicate DOCS share the text), and the rollup is an S²-row
  * aggregate. No self-join: the hash-grouped source list turns the
  * quadratic into a per-group in-memory expansion the same way
  * [[graft.operators.dedup.MinHashLSHDedup]] banding does.
  */
final class CorpusOverlapMatrix(
    textCol: String = "text",
    sourceCol: String = "source",
    hashName: String = "xxhash64") {

  private def textHash = HashFunctions.hashByName(hashName)(
    TextFunctions.normalizeText(coalesce(col(textCol), lit(""))))

  /** `(source_a, source_b, n_shared_texts)` per contaminated pair,
    * `source_a < source_b`, ordered; pairs sharing nothing are absent.
    */
  def matrix(df: DataFrame): DataFrame = {
    val perHash = df.select(col(sourceCol).as("_src"), textHash.as("_h"))
      .distinct()
      .groupBy(col("_h"))
      .agg(sort_array(collect_set(col("_src"))).as("_srcs"))
      .where(size(col("_srcs")) >= 2)
    // per-hash pair expansion: i < j over the sorted source list
    val pairs = perHash.select(explode(expr(
      "flatten(transform(_srcs, (a, i) -> " +
        "transform(slice(_srcs, i + 2, size(_srcs)), b -> struct(a as sa, b as sb))))"))
      .as("_p"))
    pairs.select(col("_p.sa").as("source_a"), col("_p.sb").as("source_b"))
      .groupBy(col("source_a"), col("source_b"))
      .agg(count(lit(1)).as("n_shared_texts"))
      .orderBy(col("source_a"), col("source_b"))
  }

  /** DuckDB twin (portable hash family only). */
  def sql(table: String): String = {
    require(hashName == "portable", "oracle covers the portable hash family")
    val h = HashFunctions.portableHash64Sql(
      TextFunctions.normalizeTextSql(s"coalesce($textCol, '')"))
    s"""WITH _omh AS (SELECT DISTINCT $sourceCol AS src, $h AS h FROM $table),
       |_oms AS (SELECT h, list_sort(list(src)) AS srcs FROM _omh
       |  GROUP BY h HAVING count(*) >= 2),
       |_omp AS (SELECT unnest(flatten(list_transform(srcs,
       |    (a, i) -> list_transform(srcs[i + 1:], b -> {'sa': a, 'sb': b})))) AS p
       |  FROM _oms)
       |SELECT p['sa'] AS source_a, p['sb'] AS source_b,
       |  count(*) AS n_shared_texts
       |FROM _omp WHERE p['sa'] < p['sb']
       |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
  }
}
