package graft.queries

import graft.core.Tables
import graft.functions.TextFunctions
import graft.metrics.{MeteredPipeline, MetricsRollup}
import graft.operators.dedup.TextExactDedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Metrics-system gates (SURVEY.md §2.5 A1–A4): the metered flagship text
  * chain (url filter → length filter → exact dedup) is counted via
  * `observe` in ONE pass, and the oracle recomputes every level's numbers
  * from scratch in SQL using the operators' own decision twins — so the
  * gate checks both the counting machinery and the rollup algebra
  * (first-op input / last-op output / guarded pass rates).
  */
object MetricsQueries {

  private def pipeline = new MeteredPipeline("text_stage",
    Seq(Curation.urlFilterOp, Curation.lengthOp, Curation.exactDedupOp))

  private def metered(s: SparkSession, dir: String) = {
    val docs = Tables(s, dir, "documents").withColumn("url", Curation.urlCol)
    pipeline.run(docs)
  }

  /** Shared oracle CTEs: the chain's intermediate row sets. */
  private val chainCtes: String = {
    val dedupKey = TextExactDedup.keySql("text", "doc_id")
    s"""u AS (SELECT *, ${Curation.urlSql} AS url FROM documents),
       |s1 AS (SELECT * FROM u WHERE ${Curation.urlFilterOp.keepSql("url")}),
       |s2 AS (SELECT * FROM s1 WHERE ${Curation.lengthOp.keepSql}),
       |s3 AS (SELECT * FROM (
       |    SELECT *, row_number() OVER (PARTITION BY $dedupKey ORDER BY doc_id) AS _rn
       |    FROM s2) t WHERE _rn = 1),
       |n AS (SELECT (SELECT count(*) FROM u) AS n0, (SELECT count(*) FROM s1) AS n1,
       |             (SELECT count(*) FROM s2) AS n2, (SELECT count(*) FROM s3) AS n3)""".stripMargin
  }

  private def rate(out: String, in: String): String =
    s"(CASE WHEN $in > 0 THEN round(CAST(100.0 AS DOUBLE) * $out / $in, 6) ELSE CAST(0.0 AS DOUBLE) END)"

  val queries: Seq[OracleQuery] = Seq(

    OracleQuery("metrics_operator_counts",
      (s, dir) => {
        val (counts, _) = metered(s, dir)
        val rows = counts.map(c => (c.opIndex.toLong, c.name, c.input, c.output,
          BigDecimal(c.passRate).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
        s.createDataFrame(rows).toDF(
          "op_index", "operator_name", "input_records", "output_records", "pass_rate")
          .orderBy(col("op_index"))
      },
      Some(s"""WITH $chainCtes
              |SELECT * FROM (
              |  SELECT CAST(0 AS BIGINT) AS op_index, 'url_filter' AS operator_name,
              |    n0 AS input_records, n1 AS output_records, ${rate("n1", "n0")} AS pass_rate FROM n
              |  UNION ALL SELECT CAST(1 AS BIGINT), 'text_length_filter', n1, n2, ${rate("n2", "n1")} FROM n
              |  UNION ALL SELECT CAST(2 AS BIGINT), 'text_exact_dedup', n2, n3, ${rate("n3", "n2")} FROM n
              |) ORDER BY op_index""".stripMargin)),

    OracleQuery("metrics_stage_rollup",
      (s, dir) => {
        val (_, stage) = metered(s, dir)
        s.createDataFrame(Seq((stage.stageName, stage.numOperators.toLong,
            stage.input, stage.output,
            BigDecimal(stage.passRate).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)))
          .toDF("stage_name", "num_operators", "input_records", "output_records", "pass_rate")
      },
      Some(s"""WITH $chainCtes
              |SELECT 'text_stage' AS stage_name, CAST(3 AS BIGINT) AS num_operators,
              |  n0 AS input_records, n3 AS output_records, ${rate("n3", "n0")} AS pass_rate
              |FROM n""".stripMargin)),

    OracleQuery("metrics_run_rollup",
      (s, dir) => {
        val (_, stage) = metered(s, dir)
        val run = MetricsRollup.run("oracle_run", Seq(stage), durationSec = 0.0)
        s.createDataFrame(Seq((run.stages.size.toLong, run.input, run.output,
            BigDecimal(run.passRate).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)))
          .toDF("num_stages", "total_input_records", "total_output_records", "overall_pass_rate")
      },
      Some(s"""WITH $chainCtes
              |SELECT CAST(1 AS BIGINT) AS num_stages, n0 AS total_input_records,
              |  n3 AS total_output_records, ${rate("n3", "n0")} AS overall_pass_rate
              |FROM n""".stripMargin)))
}
