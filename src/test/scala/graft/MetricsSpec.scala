package graft

import graft.metrics.{MeteredPipeline, MetricsRollup, MetricsWriter, OperatorCounts}
import graft.operators.dedup.TextExactDedup
import graft.operators.text.TextLengthFilter
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Metrics machinery: observe-based counts against independent count()
  * ground truth, fused-vs-timed mode agreement, rollup algebra edge
  * cases, and W3 writer schema fidelity.
  */
class MetricsSpec extends AnyFunSuite {
  import TestSpark._

  private def mkPipeline = new MeteredPipeline("test_stage", Seq(
    new TextLengthFilter(minLength = 100, maxLength = Some(400),
      textCol = "text", lengthCol = Some("n_chars")),
    TextExactDedup(textCol = "text", idCol = "doc_id", orderCol = "doc_id")))

  test("observe counts equal independently computed counts (single pass)") {
    val docs = table("documents")
    val (counts, stage) = mkPipeline.run(docs)
    val f = new TextLengthFilter(minLength = 100, maxLength = Some(400),
      textCol = "text", lengthCol = Some("n_chars"))
    val afterFilter = f(docs)
    val afterDedup = TextExactDedup(textCol = "text", idCol = "doc_id", orderCol = "doc_id")(afterFilter)
    assert(counts.map(c => (c.input, c.output)) == Seq(
      (docs.count(), afterFilter.count()),
      (afterFilter.count(), afterDedup.count())))
    assert(stage.input == docs.count() && stage.output == afterDedup.count())
  }

  test("timedRun counts agree with fused run; times are attributed") {
    val docs = table("documents")
    val (fused, _) = mkPipeline.run(docs)
    val (timed, _) = mkPipeline.timedRun(docs)
    assert(fused.map(c => (c.name, c.input, c.output)) ==
      timed.map(c => (c.name, c.input, c.output)))
    assert(timed.forall(_.timeSec > 0.0))
  }

  test("rollup algebra: first-in/last-out, guarded pass rates, max time") {
    val cs = Seq(
      OperatorCounts(0, "a", 100, 80, 2.0),
      OperatorCounts(1, "b", 80, 80, 5.0),
      OperatorCounts(2, "c", 80, 40, 1.0))
    val s = MetricsRollup.stage("s", cs)
    assert(s.input == 100 && s.output == 40 && s.timeSec == 5.0)
    assert(s.passRate == 40.0)
    val empty = MetricsRollup.stage("e", Nil)
    assert(empty.input == 0 && empty.passRate == 0.0)
    val run = MetricsRollup.run("r", Seq(s, MetricsRollup.stage("s2",
      Seq(OperatorCounts(0, "d", 40, 10, 1.0)))), durationSec = 2.0)
    assert(run.input == 100 && run.output == 10 && run.passRate == 10.0)
    assert(run.avgThroughput == 50.0)
  }

  test("W3 writer emits runs/stages/operators with the reference schemas") {
    val dir = java.nio.file.Files.createTempDirectory("graft_metrics").toString
    val (_, stage) = mkPipeline.run(table("documents"))
    val run = MetricsRollup.run(MetricsWriter.newRunId(), Seq(stage), 1.5)
    MetricsWriter.write(spark, run, dir, configJson = """{"pipeline":"test"}""")
    val ops = spark.read.parquet(s"$dir/operators")
    val stages = spark.read.parquet(s"$dir/stages")
    val runs = spark.read.parquet(s"$dir/runs")
    assert(ops.schema == MetricsWriter.operatorSchema)
    assert(stages.schema == MetricsWriter.stageSchema)
    assert(runs.schema == MetricsWriter.runSchema)
    assert(ops.count() == 2 && stages.count() == 1 && runs.count() == 1)
    val r = runs.select(col("total_input_records"), col("total_output_records"),
      col("num_stages")).head()
    assert(r.getLong(0) == stage.input && r.getLong(1) == stage.output && r.getLong(2) == 1L)
  }
}
