package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Rejection provenance envelope.
  *
  * Mirrors the reference's `_rejection_details` record annotation
  * (reference: mega_data_factory/framework/operator.py:259-262,345-353):
  * `{reason: "filtered"|"duplicate", operator, dedup_key?, representative_id?}`.
  */
object Rejection {
  val ColName = "_rejection_details"

  def filtered(op: String): Column = struct(
    lit("filtered").as("reason"),
    lit(op).as("operator"),
    lit(null).cast("string").as("dedup_key"),
    lit(null).cast("string").as("representative_id"))

  def duplicate(op: String, dedupKey: Column, representativeId: Column): Column = struct(
    lit("duplicate").as("reason"),
    lit(op).as("operator"),
    dedupKey.cast("string").as("dedup_key"),
    representativeId.cast("string").as("representative_id"))
}

/** A dataflow operator: `DataFrame => DataFrame`, fully declarative so
  * Catalyst can fuse chains into whole-stage codegen (the reference fuses
  * manually via CombinedOperator, framework/operator.py:385-430 — Spark
  * does this for free).
  */
trait Operator {
  def name: String
  def apply(df: DataFrame): DataFrame
}

/** Adds columns, never drops rows (reference Refiner,
  * framework/operator.py:206-223). `added` returns (columnName, expression)
  * pairs; expressions must be total (decode/parse failures yield defaults,
  * never throw — reference behavior, e.g. image_metadata.py:49-53).
  */
trait Refiner extends Operator {
  def added(df: DataFrame): Seq[(String, Column)]
  final def apply(df: DataFrame): DataFrame =
    added(df).foldLeft(df) { case (d, (n, c)) => d.withColumn(n, c) }
}

/** Any operator that drops rows and can produce the annotated complement
  * (§2.8 of SURVEY.md) — filters, window dedups, and the pairwise
  * near-dup family all route their rejects through this.
  */
trait RejectingOperator extends Operator {
  def rejected(df: DataFrame): DataFrame
}

/** Keeps rows matching a predicate (reference Filter,
  * framework/operator.py:226-238); `rejected` is the annotated complement
  * (§2.8 of SURVEY.md).
  */
trait RowFilter extends RejectingOperator {
  def keep(df: DataFrame): Column
  final def apply(df: DataFrame): DataFrame = df.filter(keep(df))
  final def rejected(df: DataFrame): DataFrame =
    df.filter(!keep(df)).withColumn(Rejection.ColName, Rejection.filtered(name))
}

/** Global first-wins deduplication (reference Deduplicator +
  * bucketed-set-actor backend, framework/operator.py:271-382,
  * framework/backend.py:77-226).
  *
  * Spark mapping: the hash-partitioned shuffle on the dedup key IS the
  * reference's bucketed distributed state (16→10,000 buckets for 1B→100B
  * keys, backend.py:83-88 — here `spark.sql.shuffle.partitions` plays that
  * role and AQE resizes it at runtime). `row_number` over
  * (key, explicit arrival order) gives deterministic first-wins; the
  * reference's arrival order is racy under parallel loaders, ours is
  * reproducible (SURVEY.md §7.4, intentional upgrade).
  *
  * Scale note (100 TB): the key should be a fixed-width hash (64-bit long),
  * never raw text, so shuffle volume stays bounded; pass a hashed key
  * expression. Skewed keys (e.g. empty text) are handled by AQE skew-join /
  * partition splitting.
  */
trait Deduplicator extends RejectingOperator {
  /** Dedup key per row — first row (by `order`) with a given key wins. */
  def key(df: DataFrame): Column
  /** Arrival-order column (deterministic total order, e.g. a source id). */
  def order(df: DataFrame): Column
  /** Id of the row, recorded on rejects as `representative_id` of the kept row. */
  def representative(df: DataFrame): Column

  private def annotated(df: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("_dedup_key")).orderBy(col("_dedup_order"))
    df.withColumn("_dedup_key", key(df))
      .withColumn("_dedup_order", order(df))
      .withColumn("_dedup_rn", row_number().over(w))
      .withColumn("_dedup_rep", first(col("_dedup_rep_src")).over(w))
      .drop("_dedup_rep_src")
  }

  private def withRepSrc(df: DataFrame): DataFrame =
    df.withColumn("_dedup_rep_src", representative(df))

  private val internal = Seq("_dedup_key", "_dedup_order", "_dedup_rn", "_dedup_rep")

  final def apply(df: DataFrame): DataFrame =
    annotated(withRepSrc(df)).filter(col("_dedup_rn") === 1).drop(internal: _*)

  /** Rows dropped as duplicates, annotated with key + first-seen representative. */
  final override def rejected(df: DataFrame): DataFrame =
    annotated(withRepSrc(df)).filter(col("_dedup_rn") > 1)
      .withColumn(Rejection.ColName,
        Rejection.duplicate(name, col("_dedup_key"), col("_dedup_rep")))
      .drop(internal: _*)
}

/** Result of running a pipeline: the passed rows plus each row-dropping
  * operator's annotated reject branch (written separately, partitioned by
  * operator — reference framework/executor.py:100-124).
  */
final case class PipelineResult(passed: DataFrame, rejected: Seq[(String, DataFrame)])

/** An ordered operator chain. Order is execution order, exactly like the
  * reference's config order (framework/executor.py:145-158) — narrow
  * transforms fuse into one Spark stage; only dedups introduce a shuffle.
  */
final case class Pipeline(name: String, ops: Seq[Operator]) {
  def run(input: DataFrame): PipelineResult = {
    var df = input
    val rejects = Seq.newBuilder[(String, DataFrame)]
    ops.foreach {
      case r: RejectingOperator => rejects += r.name -> r.rejected(df); df = r(df)
      case o                    => df = o(df)
    }
    PipelineResult(df, rejects.result())
  }
}
