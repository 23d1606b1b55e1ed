package graft.queries

import graft.core.Tables
import graft.operators.events.Sessionize
import graft.operators.text.{BpePairCounts, CorpusOverlapReport}
import org.apache.spark.sql.functions._

/** Analytics gates: gap sessionization over the events stream, BPE
  * pair statistics, cross-source overlap reporting — each recomputed
  * from scratch by the DuckDB twin.
  */
object AnalyticsQueries {

  private val sessionOp = new Sessionize(gapMinutes = 30)
  private val bpeOp = new BpePairCounts(topK = 40)
  private val overlapOp = new CorpusOverlapReport(hashName = "portable")

  /** Overlap fixture: the documents fixture has no cross-source dups,
    * so plant three shared-text classes spanning sources (identical
    * CASE chain both engines, first match wins).
    */
  private def overlapAugSpark(t: org.apache.spark.sql.Column) =
    when(col("doc_id") % 11 === 0,
      concat(lit("shared overlap body number "), (col("doc_id") % 3).cast("string")))
      .otherwise(t)

  private val overlapAugSql =
    """(CASE WHEN doc_id % 11 = 0
      |  THEN 'shared overlap body number ' || CAST(doc_id % 3 AS VARCHAR)
      |  ELSE text END)""".stripMargin

  val queries: Seq[OracleQuery] = Seq(

    OracleQuery("sessionize",
      (s, dir) => sessionOp.sessions(Tables.events(s, dir))
        .orderBy(col("user_id"), col("session_idx")),
      Some(sessionOp.sql("events") + "\nORDER BY user_id, session_idx")),

    OracleQuery("bpe_pair_counts",
      (s, dir) => bpeOp.pairCounts(Tables(s, dir, "documents")),
      Some(bpeOp.sql("documents"))),

    // KMV sketch estimate vs the oracle recomputing the SAME sketch from
    // the k-th smallest distinct hash — checks the sketch, not just the
    // neighborhood of the true count.
    OracleQuery("kmv_distinct",
      (s, dir) => Tables(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n_rows"),
          round(graft.functions.KmvSketch.kmvDistinct(
            graft.functions.HashFunctions.portableHash64(col("l_partkey")), 128), 6)
            .as("est_partkeys"))
        .orderBy(col("l_returnflag")),
      Some(s"""WITH ${graft.functions.KmvSketch.sqlCte("l_returnflag",
                 graft.functions.HashFunctions.portableHash64Sql("CAST(l_partkey AS VARCHAR)"),
                 "lineitem", 128)},
              |cnt AS (SELECT l_returnflag, count(*) AS n_rows FROM lineitem GROUP BY 1)
              |SELECT cnt.l_returnflag, cnt.n_rows, round(_kmv.est, 6) AS est_partkeys
              |FROM cnt JOIN _kmv USING (l_returnflag) ORDER BY l_returnflag""".stripMargin)),

    OracleQuery("corpus_overlap_report",
      (s, dir) => overlapOp.report(
        Tables(s, dir, "documents").withColumn("text", overlapAugSpark(col("text"))))
        .orderBy(col("source")),
      Some(s"""WITH aug AS (SELECT doc_id, $overlapAugSql AS text, source FROM documents)
              |SELECT * FROM (${overlapOp.sql("aug")}) ORDER BY source""".stripMargin))
  )
}
