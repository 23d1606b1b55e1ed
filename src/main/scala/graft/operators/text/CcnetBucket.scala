package graft.operators.text

import graft.core.Operator
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** CCNet-style perplexity bucketing (Wenzek et al. 2020 §4.3): split
  * the corpus into head / middle / tail by LM score percentiles — the
  * standard quality partition applied after [[NgramLmScoreRefiner]]
  * scoring, where "head" (lowest perplexity third) feeds training
  * directly and "tail" is dropped or re-filtered. Thresholds are corpus
  * percentiles of `scoreCol` (defaults: 1/3 and 2/3); a row buckets
  * `head` when score ≤ t1, `middle` when ≤ t2, else `tail` (NULL scores
  * land in `tail`, matching the SQL CASE).
  *
  * Scale shape: the two threshold scalars ride a broadcast single-row
  * cross join (the [[NgramLmScoreRefiner]] stats pattern); assignment
  * is a pure per-row comparison, no second shuffle. `exact = true`
  * (default) uses Spark's exact `percentile` — deterministic and
  * bit-identical to DuckDB's `quantile_cont`, which is what the oracle
  * gate checks — but it buffers per-partition value maps, so for
  * corpora beyond ~10⁸ rows set `exact = false` to use
  * `percentile_approx` (bounded-memory sketch; thresholds then carry
  * sketch error and the head/middle/tail split is approximate, which
  * CCNet itself tolerates — its reference implementation computes
  * thresholds on a sample).
  */
final class CcnetBucketRefiner(
    scoreCol: String = "lm_perplexity",
    bucketCol: String = "ccnet_bucket",
    headFraction: Double = 1.0 / 3.0,
    middleFraction: Double = 2.0 / 3.0,
    exact: Boolean = true) extends Operator {

  require(headFraction > 0.0 && headFraction < middleFraction && middleFraction < 1.0,
    s"need 0 < headFraction ($headFraction) < middleFraction ($middleFraction) < 1")
  val name = "ccnet_bucket"

  private def thresholds(corpus: DataFrame): DataFrame = {
    val fn = if (exact) "percentile" else "percentile_approx"
    corpus.agg(
      expr(s"$fn($scoreCol, ${headFraction}D)").as("_cb_t1"),
      expr(s"$fn($scoreCol, ${middleFraction}D)").as("_cb_t2"))
  }

  private def bucket(score: Column): Column =
    when(score <= col("_cb_t1"), lit("head"))
      .when(score <= col("_cb_t2"), lit("middle"))
      .otherwise(lit("tail"))

  def apply(df: DataFrame): DataFrame =
    df.crossJoin(broadcast(thresholds(df)))
      .withColumn(bucketCol, bucket(col(scoreCol)))
      .drop("_cb_t1", "_cb_t2")

  /** Disposition mode: percentile thresholds come from ALIVE rows only —
    * a document rejected upstream must not shift the corpus quantiles.
    * Dead rows keep a null bucket.
    */
  override def applyGated(df: DataFrame, alive: Column): DataFrame =
    df.crossJoin(broadcast(thresholds(df.filter(alive))))
      .withColumn(bucketCol, when(alive, bucket(col(scoreCol))))
      .drop("_cb_t1", "_cb_t2")

  /** DuckDB twin: CTE exposing `_cb(t1, t2)` over `scoreExpr` of
    * `table`; bucket with [[bucketSql]]. Exact family only.
    */
  def thresholdCteSql(table: String, scoreExpr: String): String = {
    require(exact, "oracle covers the exact percentile family")
    s"""_cb AS (SELECT quantile_cont($scoreExpr, CAST($headFraction AS DOUBLE)) AS t1,
       |  quantile_cont($scoreExpr, CAST($middleFraction AS DOUBLE)) AS t2 FROM $table)""".stripMargin
  }

  def bucketSql(scoreExpr: String): String =
    s"(CASE WHEN $scoreExpr <= _cb.t1 THEN 'head' " +
      s"WHEN $scoreExpr <= _cb.t2 THEN 'middle' ELSE 'tail' END)"
}
