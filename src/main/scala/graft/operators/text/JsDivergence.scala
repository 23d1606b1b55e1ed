package graft.operators.text

import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Jensen–Shannon divergence between two corpus slices' unigram
  * distributions — "how different is source A's language from source
  * B's", in bits. The mixing-and-monitoring companion to [[MixPlan]]:
  * near-duplicate sources (JSD ≈ 0) add no diversity to a training mix
  * no matter their weight, while a crawl snapshot whose JSD against
  * last month's jumps has changed register, language, or spam profile.
  * JSD is the symmetric, bounded ([0,1] bit) fix for KL's asymmetry
  * and infinities (Lin 1991).
  *
  * Mechanism: ONE conditional-aggregate pass computes per-token exact
  * BIGINT counts for both slices (tokens shuffle once, keyed by
  * token), the union-vocab totals ride a broadcast single row, and
  * each token's contribution `½·(p·log₂(p/m) + q·log₂(q/m))` with
  * `m = (p+q)/2` is a fixed-shape double expression over exact
  * integers. Add-half smoothing `(c + ½)/(N + ½·V)` keeps every log
  * finite on vocabulary seen by only one side.
  *
  * Exactness discipline: the cross-token reduction is a floor-scaled
  * BIGINT sum (order-invariant, |contrib|·10¹² per token stays far
  * under 2⁶³ for any vocabulary that fits an engine), replayed
  * bit-for-bit by the DuckDB twin.
  *
  * Scale shape: one token-keyed partial aggregate (the same shuffle
  * a word count pays), one broadcast row, one scalar reduce.
  */
final class JsDivergence(
    textCol: String,
    groupCol: String,
    aVal: String,
    bVal: String) {

  val name = "js_divergence"

  /** One row: `(vocab, tokens_a, tokens_b, jsd_bits)`. Null JSD only
    * when both slices tokenize to nothing (no distribution to compare).
    *
    * The union-vocab totals ride a BROADCAST single row computed by a
    * scalar aggregate over the same `perTok` subtree; Spark's exchange
    * reuse (`ReusedExchange`, on under AQE) dedupes the shared
    * token-aggregate exchange, so the corpus is still scanned and
    * shuffled exactly once (PlanSpec pins one FileScan + a
    * ReusedExchange) while the vocabulary never transits one partition
    * — the r12 verdict's fix for the unbounded no-partition window
    * this used to funnel the whole vocab through.
    */
  def apply(df: DataFrame): DataFrame = {
    val perTok = df.filter(col(groupCol).isin(aVal, bVal))
      .select(explode(TextFunctions.tokensOf(col(textCol))).as("tok"),
        (col(groupCol) === aVal).as("_a"))
      .groupBy(col("tok"))
      .agg(count(when(col("_a"), lit(1))).as("ca"),
        count(when(!col("_a"), lit(1))).as("cb"))
    val totals = perTok.agg(
      count(lit(1)).as("vocab"),
      sum(col("ca")).as("tokens_a"),
      sum(col("cb")).as("tokens_b"))
    val withTot = perTok.crossJoin(broadcast(totals))
      .select(col("ca"), col("cb"),
        col("vocab"), col("tokens_a"), col("tokens_b"))
    val halfV = col("vocab").cast("double") * lit(0.5)
    val p = (col("ca").cast("double") + lit(0.5)) / (col("tokens_a").cast("double") + halfV)
    val q = (col("cb").cast("double") + lit(0.5)) / (col("tokens_b").cast("double") + halfV)
    val m = (p + q) * lit(0.5)
    val contrib = (p * log(p / m) + q * log(q / m)) * lit(0.5 / math.log(2.0))
    withTot.agg(
        coalesce(first(col("vocab")), lit(0L)).as("vocab"),
        coalesce(first(col("tokens_a")), lit(0L)).as("tokens_a"),
        coalesce(first(col("tokens_b")), lit(0L)).as("tokens_b"),
        sum(floor(contrib * lit(1e12)).cast("long")).as("_s"))
      .select(col("vocab"), col("tokens_a"), col("tokens_b"),
        when(col("_s").isNotNull,
          round(col("_s").cast("double") / lit(1e12), 6)).as("jsd_bits"))
  }

  // ---- DuckDB twin (same smoothing and floor-scale shapes) ----

  def sql(table: String): String = {
    val p = "((CAST(ca AS DOUBLE) + 0.5) / (CAST(tokens_a AS DOUBLE) + CAST(vocab AS DOUBLE) * 0.5))"
    val q = "((CAST(cb AS DOUBLE) + 0.5) / (CAST(tokens_b AS DOUBLE) + CAST(vocab AS DOUBLE) * 0.5))"
    val m = s"(($p + $q) * 0.5)"
    val contrib = s"(($p * ln($p / $m) + $q * ln($q / $m)) * ${0.5 / math.log(2.0)})"
    s"""WITH _jt AS (SELECT unnest(${TextFunctions.tokensOfSql(textCol)}) AS tok,
       |    ($groupCol = '$aVal') AS a
       |  FROM $table WHERE $groupCol IN ('$aVal', '$bVal')),
       |_jc AS (SELECT tok, count(CASE WHEN a THEN 1 END) AS ca,
       |    count(CASE WHEN NOT a THEN 1 END) AS cb
       |  FROM _jt GROUP BY tok),
       |_jv AS (SELECT count(*) AS vocab,
       |    CAST(coalesce(sum(ca), 0) AS BIGINT) AS tokens_a,
       |    CAST(coalesce(sum(cb), 0) AS BIGINT) AS tokens_b FROM _jc),
       |_js AS (SELECT CAST(sum(CAST(floor($contrib * 1e12) AS BIGINT)) AS BIGINT) AS s
       |  FROM _jc CROSS JOIN _jv)
       |SELECT vocab, tokens_a, tokens_b,
       |  CASE WHEN s IS NOT NULL
       |    THEN round(CAST(s AS DOUBLE) / 1e12, 6)
       |  END AS jsd_bits
       |FROM _js CROSS JOIN _jv""".stripMargin
  }
}
