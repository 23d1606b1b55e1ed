package graft.operators.text

import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Training-mix planner — turns per-source token inventories plus
  * integer mix weights into the sampling plan a trainer consumes: for
  * each source, available tokens, its normalized target share of the
  * token `budget`, the sampling rate (capped at 1 — undersampled
  * sources), and the epoch multiplier (>1 — upsampled sources). This is
  * the planning step that sits in front of the sampling operators
  * already in the library ([[SourceWeightedSampleFilter]] executes a
  * rate; [[EpochUpsample]] executes an epoch count; this computes both
  * from the corpus itself — the "mixture table" of LLM pretraining
  * recipes à la The Pile / Gopher §A.2).
  *
  * Exactness discipline: token counts and weights aggregate as BIGINTs
  * (order-invariant), the share/rate/epoch arithmetic is fixed-shape
  * double math over those exact integers — the DuckDB twin replays it
  * expression-for-expression.
  *
  * Scale shape: one partial-aggregated groupBy(source) (a long per
  * source per partition) + one broadcast of the single-row weight total.
  * The plan output is sources-sized — tiny at any corpus scale.
  */
final class MixPlan(
    sourceCol: String = "source",
    budget: Long,
    rawWeights: Map[String, Long],
    defaultWeight: Long = 1L) {

  // _tw = sum(weight) must be > 0 for the share division; with a
  // positive default every source weighs ≥ 1, so the total is too.
  require(defaultWeight >= 1L, "defaultWeight must be >= 1")
  require(rawWeights.valuesIterator.forall(_ >= 1L), "weights must be >= 1")

  val name = "mix_plan"

  /** Chained weight CASE — iteration order fixed by sorting keys so the
    * Spark and SQL forms are the same expression.
    */
  private val orderedWeights = rawWeights.toSeq.sortBy(_._1)

  private def weightCol: Column =
    orderedWeights.foldRight(lit(defaultWeight)) { case ((k, v), acc) =>
      when(col(sourceCol) === k, lit(v)).otherwise(acc)
    }

  /** `(source, avail_tokens, weight, target_tokens, sample_rate, epochs)`
    * per source. `tokens` is the per-row token-count column (integer).
    */
  def apply(df: DataFrame, tokens: Column): DataFrame = {
    val avail = df.groupBy(col(sourceCol))
      .agg(sum(tokens.cast("long")).as("avail_tokens"))
      .withColumn("weight", weightCol)
    val tot = avail.agg(sum(col("weight")).as("_tw"))
    val target = lit(budget.toDouble) * col("weight").cast("double") / col("_tw").cast("double")
    // avail_tokens = 0 is a legal aggregate (a source whose docs all
    // tokenize empty): rate/epochs are undefined → null. Lazy CASE keeps
    // ANSI division from seeing the 0.
    val availD = col("avail_tokens").cast("double")
    avail.crossJoin(broadcast(tot))
      .select(col(sourceCol), col("avail_tokens"), col("weight"),
        round(target, 2).as("target_tokens"),
        when(availD > 0d, round(least(lit(1.0), target / availD), 6))
          .as("sample_rate"),
        when(availD > 0d, round(target / availD, 6)).as("epochs"))
      .orderBy(col(sourceCol))
  }

  // ---- DuckDB twin ----

  def sql(table: String, textCol: String): String = {
    val caseSql = orderedWeights.map { case (k, v) =>
      s"WHEN $sourceCol = '$k' THEN CAST($v AS BIGINT)"
    }.mkString(" ")
    val w = if (orderedWeights.isEmpty) s"CAST($defaultWeight AS BIGINT)"
      else s"CASE $caseSql ELSE CAST($defaultWeight AS BIGINT) END"
    val target = s"CAST($budget AS DOUBLE) * CAST(weight AS DOUBLE) / CAST(_tw AS DOUBLE)"
    s"""WITH av AS (SELECT $sourceCol,
       |    CAST(sum(${TextFunctions.tokenCountSql(textCol)}) AS BIGINT) AS avail_tokens
       |  FROM $table GROUP BY $sourceCol),
       |aw AS (SELECT $sourceCol, avail_tokens, $w AS weight FROM av),
       |tot AS (SELECT CAST(sum(weight) AS BIGINT) AS _tw FROM aw)
       |SELECT $sourceCol, avail_tokens, weight,
       |  round($target, 2) AS target_tokens,
       |  CASE WHEN avail_tokens > 0
       |    THEN round(least(CAST(1.0 AS DOUBLE), $target / CAST(avail_tokens AS DOUBLE)), 6)
       |  END AS sample_rate,
       |  CASE WHEN avail_tokens > 0
       |    THEN round($target / CAST(avail_tokens AS DOUBLE), 6)
       |  END AS epochs
       |FROM aw CROSS JOIN tot ORDER BY $sourceCol""".stripMargin
  }
}
