package graft.runner

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Batch checkpoint/resume at INPUT-FILE granularity — the capability of
  * the reference's shard resume (huggingface_loader.py:96-124, skip-N
  * within a shard), mapped to Spark's unit of batch work: a run records
  * which source files it fully processed and committed; a resumed run
  * plans only the remaining files, so `output(append) ∪ manifest` makes
  * kill-and-resume equal a one-shot run. (Streaming mode has real
  * offset checkpointing; this is the batch CLI twin.)
  *
  * Layout: `{path}/processed/part-*.txt`, one absolute file URI per
  * line. Each successful run commits ONE part via temp-file + rename
  * (atomic on HDFS and local FS), so a crash mid-commit leaves either
  * no manifest entry (files reprocessed — appends are idempotent per
  * file set because the whole file list commits together) or a complete
  * one.
  */
object ResumeManifest {

  private def dir(base: String) = new Path(base, "processed")

  /** Source files already committed by previous runs. */
  def processed(spark: SparkSession, base: String): Set[String] = {
    val fs = dir(base).getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(dir(base))) Set.empty
    else {
      val parts = fs.listStatus(dir(base)).filter(_.getPath.getName.startsWith("part-"))
      parts.flatMap { st =>
        val in = fs.open(st.getPath)
        try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toArray
        finally in.close()
      }.filter(_.nonEmpty).toSet
    }
  }

  /** Commit `files` as processed (temp write + atomic rename). */
  def record(spark: SparkSession, base: String, files: Seq[String]): Unit = {
    if (files.isEmpty) return
    val d = dir(base)
    val fs = d.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(d)
    val name = s"part-${java.util.UUID.randomUUID().toString}.txt"
    val tmp = new Path(d, s"_tmp-$name")
    val out = fs.create(tmp, true)
    try out.write((files.mkString("\n") + "\n").getBytes("UTF-8"))
    finally out.close()
    fs.rename(tmp, new Path(d, name))
  }
}
