package graft.core

import org.apache.spark.sql.SparkSession

/** Standard session factory for the engine.
  *
  * Local testing runs `local[N]`; on a real cluster the same conf block
  * applies minus the master. Shuffle partitions default to the local core
  * count (not Spark's 200) and AQE is on so skewed dedup keys / joins are
  * re-planned at runtime — see SURVEY.md §4.
  */
object GraftSession {
  def local(cores: Int = Runtime.getRuntime.availableProcessors()): SparkSession =
    builder(s"local[$cores]", cores).getOrCreate()

  def builder(master: String, shufflePartitions: Int): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .appName("graft")
      // kernel SQL functions + the opt-in vector-cartesian guard rule
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // events.parquet carries INT64(TIMESTAMP_NANOS) which Spark's reader
      // rejects; read nanos as long and convert explicitly (Tables.events).
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // the generated-class cache defaults to 100 entries — a session
      // running the 200+ query gate suite (or a many-operator production
      // pipeline) evicts constantly and re-COMPILES its codegen per
      // invocation (~100-300 ms per query, measured: interleaved bench
      // reps read ~2x on every small leg). JVM-global, read once at
      // CodeGenerator init, so it must sit on the session builder.
      .config("spark.sql.codegen.cache.maxEntries", "10000")
}
