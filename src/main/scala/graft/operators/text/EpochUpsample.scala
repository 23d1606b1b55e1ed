package graft.operators.text

import graft.functions.HashFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fractional-epoch upsampling — the UP direction of training-data
  * mixing (Llama/GPT-style "high-quality sources see 2.7 epochs"):
  * every row of source s emits `floor(e_s)` copies plus one more for
  * the deterministic `frac(e_s)` fraction of ids, each copy tagged
  * with an ordinal so downstream shuffling/packing can keep copies
  * apart. `e_s < 1` degrades to deterministic downsampling (the
  * [[TemperatureSample]] family); `e_s = 0` drops the source.
  *
  * Determinism: the fractional coin is `portableHash64(id) < ⌊frac ·
  * 2^60⌋` — the threshold is computed ONCE driver-side and inlined as
  * a literal into both engines, so no float arithmetic happens per
  * row and reruns/resumes pick identical extra-copy sets (no
  * Math.random anywhere — same contract as [[DeterministicSample]]).
  *
  * Scale shape: a generate (explode of a 0..n-1 sequence) — narrow,
  * no exchange, no join; output size is exactly Σ n_i by
  * construction. Rows with n = 0 are filtered BEFORE the explode
  * (Spark's `sequence(0, -1)` raises rather than emitting empty).
  */
final class EpochUpsample(
    epochs: Map[String, Double],
    defaultEpochs: Double = 1.0,
    sourceCol: String = "source",
    idCol: String = "doc_id",
    copyCol: String = "epoch_copy") extends graft.core.Operator {

  val name = "epoch_upsample"

  require((epochs.values ++ Seq(defaultEpochs)).forall(e => e >= 0.0 && e <= 100.0),
    "epochs must be in [0, 100]")

  /** (floor copies, 60-bit fractional threshold) for one epoch count. */
  private def split(e: Double): (Long, Long) = {
    val fl = math.floor(e).toLong
    (fl, math.floor((e - fl) * KmvHashSpace).toLong)
  }
  private val KmvHashSpace = 1152921504606846976.0 // 2^60
  private val sorted = epochs.toSeq.sortBy(_._1)

  def apply(df: DataFrame): DataFrame = {
    val h = HashFunctions.portableHash64(col(idCol))
    val (df0, dt0) = split(defaultEpochs)
    val base: Column = sorted.foldLeft[Column](lit(df0)) { case (acc, (s, e)) =>
      when(col(sourceCol) === s, lit(split(e)._1)).otherwise(acc)
    }
    val thr: Column = sorted.foldLeft[Column](lit(dt0)) { case (acc, (s, e)) =>
      when(col(sourceCol) === s, lit(split(e)._2)).otherwise(acc)
    }
    val n = (base + when(h < thr, 1L).otherwise(0L)).as("_n")
    df.withColumn("_n", n)
      .where(col("_n") > 0)
      .withColumn(copyCol, explode(sequence(lit(0L), col("_n") - 1)))
      .drop("_n")
  }

  /** DuckDB twin emitting `(all columns of table, epoch_copy)`. */
  def sql(table: String): String = {
    val h = HashFunctions.portableHash64Sql(s"CAST($idCol AS VARCHAR)")
    val (df0, dt0) = split(defaultEpochs)
    def chain(pick: ((Long, Long)) => Long, dflt: Long): String =
      if (sorted.isEmpty) dflt.toString
      else sorted.map { case (s, e) => s"WHEN '$s' THEN ${pick(split(e))}" }
        .mkString(s"CASE $sourceCol ", " ", s" ELSE $dflt END")
    s"""SELECT * EXCLUDE (_n), unnest(range(_n)) AS $copyCol
       |FROM (SELECT *, ${chain(_._1, df0)}
       |        + (CASE WHEN $h < ${chain(_._2, dt0)} THEN 1 ELSE 0 END) AS _n
       |      FROM $table)""".stripMargin
  }
}
