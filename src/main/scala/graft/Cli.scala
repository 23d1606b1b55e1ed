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

    case "analyze" :: inPath :: outDir :: rest =>
      // strict flag parse: unknown flags, missing values, and a flag in
      // a value slot all FAIL (a silently-defaulted field would profile
      // the wrong columns with no diagnostic)
      val known = Set("--text-field", "--id-field", "--source-field")
      def parseFlags(args: List[String], acc: Map[String, String]): Map[String, String] =
        args match {
          case Nil => acc
          case flag :: value :: tail if known(flag) && !value.startsWith("--") =>
            parseFlags(tail, acc + (flag -> value))
          case bad :: _ =>
            System.err.println(s"analyze: bad or incomplete flag near '$bad' " +
              s"(known: ${known.toSeq.sorted.mkString(", ")}, each needs a value)")
            sys.exit(2)
        }
      val flags = parseFlags(rest, Map.empty)
      val spark = GraftSession.local()
      spark.sparkContext.setLogLevel("WARN")
      try {
        val s = graft.runner.CorpusAnalyze.run(spark,
          spark.read.parquet(inPath), outDir,
          textCol = flags.getOrElse("--text-field", "text"),
          idCol = flags.getOrElse("--id-field", "doc_id"),
          sourceCol = flags.getOrElse("--source-field", "source"))
        println(s"""{"rows":${s.rows},"sources":${s.sources},""" +
          s""""tokens_total":${s.tokensTotal},"novelty_modal_decile":${s.noveltyModalDecile},""" +
          s""""card":"$outDir/DATASET_CARD.md",""" +
          s""""reports":"$outDir/{source_inventory,column_profile,length_percentiles,novelty_deciles,source_drift}"}""")
      } finally spark.stop()

    case "report" :: name :: inPath :: outDir :: Nil =>
      val spark = GraftSession.local()
      spark.sparkContext.setLogLevel("WARN")
      try {
        val rows = graft.runner.CorpusReports.run(spark, name,
          spark.read.parquet(inPath), outDir)
        println(s"""{"report":"$name","rows":$rows,"path":"$outDir/$name"}""")
      } finally spark.stop()

    case "list-reports" :: Nil =>
      graft.runner.CorpusReports.names.foreach(println)
      // embedding-convention reports (corpus needs vec_id + embedding)
      graft.runner.CorpusReports.embeddingNames.foreach(n => println(s"$n (embeddings)"))

    case _ =>
      System.err.println(
        """usage:
          |  graft.Cli run -c <config.yaml> [--max-samples N]
          |  graft.Cli analyze <corpus.parquet> <outDir> [--text-field F] [--id-field F] [--source-field F]
          |  graft.Cli report <name> <corpus.parquet> <outDir>   (names: graft.Cli list-reports)
          |  graft.Cli list-operators""".stripMargin)
      sys.exit(2)
  }
}
