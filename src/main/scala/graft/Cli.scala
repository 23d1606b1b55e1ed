package graft

import graft.core.GraftSession
import graft.runner.{OperatorRegistry, PipelineConf, PipelineRunner}

/** CLI entry point, the reference's `mdf run -c config.yaml` surface
  * (cli.py:41-209):
  *
  *   runMain graft.Cli run -c configs/example_pipeline.yaml
  *   runMain graft.Cli list-operators
  *
  * Prints a one-line JSON run summary (run id, per-stage in/out counts).
  */
object Cli {
  def main(args: Array[String]): Unit = args.toList match {
    case "run" :: "-c" :: configPath :: rest =>
      val conf0 = PipelineConf.fromYamlFile(configPath)
      // CLI override like the reference's --max-samples (cli.py:48-54)
      val conf = rest match {
        case "--max-samples" :: n :: _ =>
          conf0.copy(executor = conf0.executor.copy(maxSamples = Some(n.toLong)))
        case _ => conf0
      }
      val spark = GraftSession.local()
      spark.sparkContext.setLogLevel("WARN")
      try {
        val res = PipelineRunner.run(spark, conf)
        val stages = res.run.stages.map(s =>
          s"""{"stage":"${s.stageName}","input":${s.input},"output":${s.output}}""")
          .mkString("[", ",", "]")
        println(s"""{"run_id":"${res.run.runId}","output":"${res.outputPath}/${res.tableName}",""" +
          s""""input":${res.run.input},"output_records":${res.run.output},""" +
          s""""pass_rate":${res.run.passRate},"stages":$stages}""")
      } finally spark.stop()

    case "list-operators" :: Nil =>
      OperatorRegistry.listOperators.foreach(println)

    case _ =>
      System.err.println(
        """usage:
          |  graft.Cli run -c <config.yaml> [--max-samples N]
          |  graft.Cli list-operators""".stripMargin)
      sys.exit(2)
  }
}
