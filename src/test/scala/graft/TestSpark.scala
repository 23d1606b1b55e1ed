package graft

import graft.core.GraftSession
import org.apache.spark.sql.{DataFrame, SparkSession}

/** One shared local session for the whole forked test JVM — session
  * startup is ~5 s, per-suite sessions would dominate test time.
  */
object TestSpark {
  lazy val spark: SparkSession = {
    // 530-test JVM runs the whole operator surface: full codegen-cache
    // bound, like Bench/Verify (the production default is smaller)
    val s = GraftSession.builder("local[4]", 4, codegenCacheEntries = 10000)
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  /** Smallest fixture scale — correctness-only material. */
  val sfDir = "/root/testdata/sf0.001"

  def table(name: String): DataFrame = graft.core.Tables(spark, sfDir, name)

  /** The full formatted physical plan of a DataFrame. */
  def planOf(df: DataFrame): String = df.queryExecution.executedPlan.toString

  /** Formatted explain output — scan metadata (PushedFilters/ReadSchema)
    * untruncated, unlike the plan toString. */
  def planFormatted(df: DataFrame): String = df.queryExecution.explainString(
    org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
}
