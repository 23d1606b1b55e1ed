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

    OracleQuery("corpus_overlap_report",
      (s, dir) => overlapOp.report(
        Tables(s, dir, "documents").withColumn("text", overlapAugSpark(col("text"))))
        .orderBy(col("source")),
      Some(s"""WITH aug AS (SELECT doc_id, $overlapAugSql AS text, source FROM documents)
              |SELECT * FROM (${overlapOp.sql("aug")}) ORDER BY source""".stripMargin))
  )
}
