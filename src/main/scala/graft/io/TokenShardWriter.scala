package graft.io

import graft.functions.TextFunctions
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Pre-tokenized binary shard export — the Megatron/GPT-NeoX-style
  * `.bin` + index layout a trainer memory-maps, so the training job
  * never re-tokenizes text (reference parity note: the reference stops
  * at parquet/JSONL; this is the missing last mile to a token-level
  * trainer feed).
  *
  * Layout under `outputPath/`:
  *   - `shard-NNNN.bin` — little-endian int32 token ids, documents
  *     concatenated in ascending id order (no separators; boundaries
  *     live in the index);
  *   - `index/` — parquet `(shard, doc_id, token_offset, n_tokens)`:
  *     each doc's start offset (in tokens) inside its shard;
  *   - `manifest.json` — per-shard doc/token/byte counts + totals.
  *
  * Tokenization contract: whitespace tokens of the normalized text,
  * looked up in the caller's rank-ordered vocabulary; id = rank + 2
  * (0 = pad, 1 = unk), OOV → 1. Plug an induced BPE/unigram vocab by
  * passing its pieces — the writer is agnostic.
  *
  * Determinism/scale: docs route to shards by `pmod(xxhash64(id),
  * numShards)` (the [[graft.operators.text.SequencePack]] discipline) and
  * serialize in ascending doc id within the shard, so shard bytes are
  * identical whatever the input partitioning. One exchange
  * (repartition on shard), each task streams its shards' bytes straight
  * to the filesystem — nothing collects to the driver; offsets come
  * from a shard-partitioned running-sum window over the (bounded)
  * per-doc count table.
  *
  * Commit protocol (speculation-safe): each task attempt streams into
  * `_temporary/attempt-<id>/shard-NNNN.bin` and renames to the final
  * name only after its iterator is fully drained. Shard bytes are
  * deterministic (same sort whatever the attempt), so when two attempts
  * of one task race, whichever rename lands first wins and the loser
  * deletes its temp — the final file is identical either way. The
  * driver removes `_temporary/` (failed-attempt leftovers) after the
  * job, and removes ALL `shard-*.bin` + `index/` + `manifest.json`
  * from the output dir BEFORE it, so a re-run with fewer shards can
  * never leave stale shard files next to a fresh manifest.
  */
final class TokenShardWriter(
    outputPath: String,
    numShards: Int,
    vocab: Seq[String],
    idCol: String = "doc_id",
    textCol: String = "text") {

  require(numShards >= 1, "numShards must be positive")
  require(vocab.nonEmpty, "vocabulary must be non-empty")
  require(vocab.distinct.size == vocab.size,
    "vocabulary has duplicate pieces — ids would silently collapse and " +
      "the manifest's vocab_size would overstate the reachable id space")
  val UnkId = 1

  /** `(shard, doc_id, ids)` — the encoded rows, shard-routed. */
  def encoded(df: DataFrame): DataFrame = {
    val ranks = vocab.zipWithIndex.map { case (w, i) => (w, i + 2) }.toMap
    val mapCol = typedLit(ranks)
    df.select(col(idCol).cast("long").as("doc_id"),
        TextFunctions.tokensOf(col(textCol)).as("_toks"))
      .select(col("doc_id"),
        pmod(xxhash64(col("doc_id")), lit(numShards.toLong)).cast("int").as("shard"),
        transform(col("_toks"), t => coalesce(element_at(mapCol, t), lit(UnkId)))
          .as("ids"))
  }

  /** Write shards + index + manifest; returns (docs, tokens) totals. */
  def write(df: DataFrame): (Long, Long) = {
    val spark = df.sparkSession
    // tokenize + vocab-map ONCE: both the bin pass and the index derive
    // from this persisted frame (disk-backed — the ids are ~the output
    // size, and a second full tokenize pass at 100 TB costs more than
    // the spill)
    val enc = encoded(df)
      .repartition(numShards, col("shard"))
      .sortWithinPartitions(col("shard"), col("doc_id"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // validate BEFORE any bytes land (this one aggregate also
    // materializes the persisted encode): a non-numeric id casts to
    // NULL and would NPE mid-write leaving truncated shards; a
    // DUPLICATE id would emit ambiguous index rows whose offsets
    // depend on an unstable sort tie — both are contract violations
    // surfaced here, not as corrupt output
    val idStats = enc.agg(count(lit(1)).as("n"),
      count(col("doc_id")).as("nn"),
      countDistinct(col("doc_id")).as("nd")).head()
    require(idStats.getLong(0) == idStats.getLong(1),
      s"${idStats.getLong(0) - idStats.getLong(1)} rows have " +
        s"null/non-numeric $idCol — cannot route to shards")
    require(idStats.getLong(2) == idStats.getLong(1),
      s"${idStats.getLong(1) - idStats.getLong(2)} duplicate $idCol " +
        "values — index offsets would be ambiguous")
    val conf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val out = outputPath
    // stale-artifact cleanup BEFORE any bytes land: a previous run with
    // a different numShards (or a failed run) must not leave shard files
    // a manifest-ignoring glob consumer would train on (ADVICE r13).
    // Only the writer's own artifacts are touched — the dir may hold
    // unrelated user files.
    TokenShardWriter.cleanArtifacts(out, spark.sparkContext.hadoopConfiguration)
    // stream each shard's int32s to a task-attempt temp file; one task
    // owns a shard; rename-commit after the iterator drains
    enc.select(col("shard"), col("doc_id"), col("ids"))
      .foreachPartition { (rows: Iterator[org.apache.spark.sql.Row]) =>
        val attempt = Option(org.apache.spark.TaskContext.get())
          .map(_.taskAttemptId()).getOrElse(0L)
        var cur: Option[(Int, java.io.DataOutputStream)] = None
        val written = scala.collection.mutable.ArrayBuffer.empty[Int]
        def tempPath(shard: Int) = new org.apache.hadoop.fs.Path(
          f"$out/_temporary/attempt-$attempt/shard-$shard%04d.bin")
        def open(shard: Int): java.io.DataOutputStream = {
          val p = tempPath(shard)
          val fs = p.getFileSystem(conf.value)
          new java.io.DataOutputStream(
            new java.io.BufferedOutputStream(fs.create(p, true), 1 << 16))
        }
        try {
          rows.foreach { r =>
            val shard = r.getInt(0)
            if (!cur.exists(_._1 == shard)) {
              cur.foreach(_._2.close())
              cur = Some((shard, open(shard)))
              written += shard
            }
            val os = cur.get._2
            val ids = r.getSeq[Int](2)
            var i = 0
            while (i < ids.length) {
              // little-endian int32 (DataOutputStream is big-endian)
              val v = ids(i)
              os.write(v & 0xFF); os.write((v >> 8) & 0xFF)
              os.write((v >> 16) & 0xFF); os.write((v >> 24) & 0xFF)
              i += 1
            }
          }
        } finally cur.foreach(_._2.close())
        // commit only after a fully-drained iterator: a failed attempt
        // never reaches here, so its partial bytes stay in _temporary
        written.foreach { shard =>
          TokenShardWriter.commitShard(tempPath(shard),
            new org.apache.hadoop.fs.Path(f"$out/shard-$shard%04d.bin"),
            conf.value)
        }
      }
    // failed/lost-race attempt leftovers
    val tmp = new org.apache.hadoop.fs.Path(s"$out/_temporary")
    tmp.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(tmp, true)
    // index: per-doc token offsets inside the shard (running sum over
    // the per-doc COUNT table — shard-partitioned window, never global)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(col("doc_id"))
      .rowsBetween(Long.MinValue, -1)
    val index = enc
      .select(col("shard"), col("doc_id"), size(col("ids")).cast("long").as("n_tokens"))
      .select(col("shard"), col("doc_id"),
        coalesce(sum(col("n_tokens")).over(w), lit(0L)).as("token_offset"),
        col("n_tokens"))
    index.write.mode("overwrite").parquet(s"$out/index")
    enc.unpersist(false)
    val shardStats = spark.read.parquet(s"$out/index")
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("docs"), sum(col("n_tokens")).as("tokens"))
      .orderBy(col("shard")).collect()
    val totalDocs = shardStats.map(_.getLong(1)).sum
    val totalTokens = shardStats.map(_.getLong(2)).sum
    val shardsJson = shardStats.map { r =>
      s"""{"shard":${r.getInt(0)},"docs":${r.getLong(1)},"tokens":${r.getLong(2)},"bytes":${r.getLong(2) * 4}}"""
    }.mkString("[", ",", "]")
    val manifest =
      s"""{"format":"int32-le","vocab_size":${vocab.size + 2},"unk_id":$UnkId,""" +
        s""""total_docs":$totalDocs,"total_tokens":$totalTokens,"shards":$shardsJson}"""
    val p = new org.apache.hadoop.fs.Path(s"$out/manifest.json")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val os = fs.create(p, true)
    try os.write(manifest.getBytes("UTF-8")) finally os.close()
    (totalDocs, totalTokens)
  }
}

object TokenShardWriter {

  /** Rename a drained temp shard onto its final name. When two attempts
    * of one task race (speculation), the bytes are deterministic, so
    * first-rename-wins is correct: the loser finds the destination
    * already present and deletes its own temp. Any other rename failure
    * (missing temp, dead filesystem) is surfaced, not swallowed.
    */
  private[graft] def commitShard(
      temp: org.apache.hadoop.fs.Path,
      dest: org.apache.hadoop.fs.Path,
      conf: org.apache.hadoop.conf.Configuration): Unit = {
    val fs = temp.getFileSystem(conf)
    if (!fs.rename(temp, dest)) {
      if (fs.exists(dest)) fs.delete(temp, false) // lost the race; bytes identical
      else throw new java.io.IOException(
        s"shard commit failed: rename $temp -> $dest (destination absent)")
    }
  }

  /** Remove the writer's own artifacts — `shard-*.bin`, `index/`,
    * `manifest.json`, `_temporary/` — so stale shards from a prior run
    * with a different shard count never sit next to a fresh manifest.
    */
  private[graft] def cleanArtifacts(
      out: String,
      conf: org.apache.hadoop.conf.Configuration): Unit = {
    val dir = new org.apache.hadoop.fs.Path(out)
    val fs = dir.getFileSystem(conf)
    if (fs.exists(dir)) {
      fs.globStatus(new org.apache.hadoop.fs.Path(out, "shard-*.bin"))
        .foreach(st => fs.delete(st.getPath, false))
      fs.delete(new org.apache.hadoop.fs.Path(out, "index"), true)
      fs.delete(new org.apache.hadoop.fs.Path(out, "manifest.json"), false)
      fs.delete(new org.apache.hadoop.fs.Path(out, "_temporary"), true)
    }
  }
}
