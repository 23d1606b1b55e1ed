package graft.queries

import graft.core.Tables
import graft.operators.text.{HoldoutSplitRefiner, LengthPercentileClipFilter, TemperatureSampleFilter}
import org.apache.spark.sql.functions._

/** Corpus-rebalancing gates: temperature resampling, holdout split
  * tagging, percentile length clipping — each recomputed from scratch
  * by the DuckDB twin (portable hash family / exact percentiles).
  */
object ResampleQueries {

  private val tempOp = new TemperatureSampleFilter(
    alpha = 0.5, sourceCol = "source", idCol = "doc_id",
    hashName = "portable", salt = "t10")

  private val splitOp = new HoldoutSplitRefiner(
    valFraction = 0.1, idCol = "doc_id", hashName = "portable", salt = "h10")

  private val clipOp = new LengthPercentileClipFilter(pLow = 0.05, pHigh = 0.95)

  private val upsampleOp = new graft.operators.text.EpochUpsample(
    epochs = Map("src0" -> 2.5, "src1" -> 0.4, "src2" -> 0.0))

  val queries: Seq[OracleQuery] = Seq(

    // Fractional-epoch mixing: src0 ~2.5 epochs, src1 downsampled to
    // 0.4, src2 dropped, rest 1 epoch — copy ordinals oracle-checked.
    OracleQuery("epoch_upsample",
      (s, dir) => upsampleOp(Tables(s, dir, "documents"))
        .select(col("doc_id"), col("source"), col("epoch_copy"))
        .orderBy(col("doc_id"), col("epoch_copy")),
      Some(s"""SELECT doc_id, source, epoch_copy
              |FROM (${upsampleOp.sql("(SELECT doc_id, source FROM documents)")})
              |ORDER BY doc_id, epoch_copy""".stripMargin)),

    OracleQuery("temperature_sample",
      (s, dir) => tempOp(Tables(s, dir, "documents"))
        .select(col("doc_id"), col("source")).orderBy(col("doc_id")),
      Some(s"""WITH ${tempOp.thresholdCteSql("documents")}
              |SELECT doc_id, source FROM documents
              |JOIN _ts ON documents.source = _ts.src
              |WHERE ${tempOp.keepSql("doc_id")}
              |ORDER BY doc_id""".stripMargin)),

    OracleQuery("holdout_split",
      (s, dir) => splitOp(Tables(s, dir, "documents"))
        .select(col("doc_id"), col("split")).orderBy(col("doc_id")),
      Some(s"""SELECT doc_id, ${splitOp.splitSql("doc_id")} AS split
              |FROM documents ORDER BY doc_id""".stripMargin)),

    OracleQuery("length_percentile_clip",
      (s, dir) => clipOp(Tables(s, dir, "documents"))
        .select(col("doc_id"), col("n_chars")).orderBy(col("doc_id")),
      Some(s"""WITH ${clipOp.thresholdCteSql("documents")}
              |SELECT doc_id, n_chars FROM documents CROSS JOIN _lc
              |WHERE ${clipOp.keepSql}
              |ORDER BY doc_id""".stripMargin)),

    // weighted sampling WITHOUT replacement (priority sampling) as a
    // distributed top-k: long docs kept ~proportionally to char mass,
    // ranking by an exact integer priority (no ln/exp/double anywhere)
    OracleQuery("priority_sample",
      (s, dir) => priorityOp(Tables(s, dir, "documents")),
      Some(priorityOp.sql("documents", "doc_id", "n_chars")))
  )

  private lazy val priorityOp = new graft.operators.text.PrioritySample(
    idCol = "doc_id", weightCol = "n_chars", k = 100,
    hashName = "portable", salt = "ps13")
}
