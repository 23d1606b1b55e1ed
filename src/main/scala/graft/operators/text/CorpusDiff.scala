package graft.operators.text

import graft.functions.HashFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot diff between two corpus versions (crawl N vs crawl N+1):
  * per-id status `added` / `removed` / `changed` / `unchanged`, from
  * ONE full-outer join on the id over (id, content-hash) projections —
  * the incremental-pipeline planning primitive ("how much actually
  * changed since the last run?") that decides whether downstream
  * curation re-runs full or incremental.
  *
  * Scale shape: both sides project to (id, 8-byte hash) BEFORE the
  * exchange — document text never shuffles, so the join cost is two
  * slim scans + one co-partitioned exchange regardless of document
  * size. Same posture as [[graft.operators.dedup.IncrementalDedup]],
  * which answers the membership half of this question; this operator
  * adds the removed/changed axes.
  */
final class CorpusDiff(
    idCol: String = "doc_id",
    textCol: String = "text",
    hashName: String = "xxhash64") {

  private val hash = HashFunctions.hashByName(hashName) _

  /** One row per id in either snapshot: `(idCol, status)`. */
  def diff(old: DataFrame, neu: DataFrame): DataFrame = {
    val oh = old.select(col(idCol), hash(col(textCol)).as("_oh"))
    val nh = neu.select(col(idCol), hash(col(textCol)).as("_nh"))
    oh.join(nh, Seq(idCol), "full_outer")
      .select(col(idCol),
        when(col("_oh").isNull, lit("added"))
          .when(col("_nh").isNull, lit("removed"))
          .when(col("_oh") =!= col("_nh"), lit("changed"))
          .otherwise(lit("unchanged")).as("status"))
  }

  /** The 4-row rollup `(status, n)`. */
  def report(old: DataFrame, neu: DataFrame): DataFrame =
    diff(old, neu).groupBy(col("status")).agg(count(lit(1)).as("n"))

  /** DuckDB twin of [[diff]] over table exprs (hashName must be
    * `portable` for oracle use).
    */
  def sql(oldSql: String, newSql: String): String = {
    require(hashName == "portable", "oracle twin needs hash_algorithm=portable")
    val oh = HashFunctions.portableHash64Sql("o.text")
    val nh = HashFunctions.portableHash64Sql("n.text")
    s"""SELECT coalesce(o.$idCol, n.$idCol) AS $idCol,
       |  CASE WHEN o.$idCol IS NULL THEN 'added'
       |       WHEN n.$idCol IS NULL THEN 'removed'
       |       WHEN $oh <> $nh THEN 'changed'
       |       ELSE 'unchanged' END AS status
       |FROM ($oldSql) o FULL OUTER JOIN ($newSql) n ON o.$idCol = n.$idCol""".stripMargin
  }
}
