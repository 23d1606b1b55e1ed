package graft.operators.text

import graft.functions.TextFunctions
import graft.operators.stats.HistogramQuantile
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Quality-curriculum tiers — split the corpus at quality-score
  * quantiles and report each tier's inventory, the planning table for
  * curriculum training schedules ("warm up on the clean quartile,
  * anneal over the rest" — the data-ordering recipes of curriculum-
  * learning literature applied at corpus scale). Tier k holds the
  * documents between the k-th and (k+1)-th requested quantiles.
  *
  * Thresholds come from the [[HistogramQuantile]] sketch (mergeable,
  * deterministic, error bounded by the bin width) — NOT an exact
  * global sort — so the two passes this op makes are both
  * bounded-memory at any corpus size: pass 1 builds the sketch and
  * collects `qs.size` threshold bins (a bounded driver collect, the
  * firstKCentroids idiom); pass 2 assigns tiers with a literal CASE
  * chain and aggregates per tier. Quantile-threshold assignment is
  * inherently two-pass — you cannot tier a row before the thresholds
  * exist.
  *
  * Exactness: thresholds are BIN IDS (integers); tier assignment
  * compares integer bins; per-tier means are floor-scaled BIGINT sums
  * over exact integers — the DuckDB twin derives the same thresholds
  * with scalar subqueries over the same sketch CTE.
  */
final class CurriculumBuckets(
    textCol: String = "text",
    width: Double = 0.05,
    qs: Seq[Double] = Seq(0.25, 0.5, 0.75)) {

  require(qs.nonEmpty && qs == qs.sorted && qs.forall(q => q > 0 && q < 1),
    s"qs must be sorted fractions in (0,1): $qs")
  val name = "curriculum_buckets"

  private def score: Column =
    TextAnalysis.qualityScore(col(textCol), TextFunctions.tokensOf(col(textCol)))

  /** `(tier, docs, mean_quality, mean_tokens)` — tier 0 = below the
    * first quantile, tier `qs.size` = above the last.
    */
  def apply(df: DataFrame): DataFrame = {
    val scored = df.select(score.as("_score"),
      TextFunctions.tokenCount(col(textCol)).as("_tok"))
    // pass 1: threshold bins off the sketch (bounded collect, qs.size rows)
    val thrBins: Seq[Long] = HistogramQuantile
      .quantiles(scored, "_score", width, qs)
      .select(col("q_lo")).collect()
      .map(r => math.round(r.getDouble(0) / width)).toSeq
    // pass 2: integer-bin CASE assignment + per-tier exact aggregates
    val bin = floor(col("_score") / lit(width)).cast("long")
    val tier = thrBins.foldLeft(lit(0L)) { (acc, t) =>
      acc + when(bin >= t, lit(1L)).otherwise(lit(0L))
    }
    scored.select(tier.as("tier"), col("_score"), col("_tok"))
      .groupBy(col("tier"))
      .agg(count(lit(1)).as("docs"),
        round(sum(floor(col("_score") * lit(1e6)).cast("long")).cast("double") /
          (count(lit(1)).cast("double") * lit(1e6)), 6).as("mean_quality"),
        round(sum(col("_tok")).cast("double") / count(lit(1)).cast("double"), 6)
          .as("mean_tokens"))
      .orderBy(col("tier"))
  }

  // ---- DuckDB twin (thresholds as scalar subqueries over the sketch) ----

  def sql(table: String): String = {
    val scoreSql = TextAnalysis.qualityScoreSql(textCol, "toks")
    val thrSubq = qs.map(q =>
      s"(SELECT min(bin) FROM _cbcum, _cbtot WHERE cum >= ceil($q * n))")
    val tierSql = thrSubq.map(t => s"(CASE WHEN bin >= $t THEN 1 ELSE 0 END)")
      .mkString("(", " + ", ")")
    s"""WITH _cbsc AS (SELECT $scoreSql AS s, CAST(len(toks) AS BIGINT) AS tok
       |  FROM (SELECT $textCol, ${TextFunctions.tokensOfSql(textCol)} AS toks FROM $table)),
       |_cbbins AS (SELECT CAST(floor(s / $width) AS BIGINT) AS bin, count(*) AS cnt
       |  FROM _cbsc GROUP BY 1),
       |_cbcum AS (SELECT bin, sum(cnt) OVER (ORDER BY bin) AS cum FROM _cbbins),
       |_cbtot AS (SELECT sum(cnt) AS n FROM _cbbins),
       |_cbt AS (SELECT CAST(floor(s / $width) AS BIGINT) AS bin, s, tok FROM _cbsc)
       |SELECT CAST($tierSql AS BIGINT) AS tier, count(*) AS docs,
       |  round(CAST(CAST(sum(CAST(floor(s * 1e6) AS BIGINT)) AS BIGINT) AS DOUBLE)
       |    / (CAST(count(*) AS DOUBLE) * 1e6), 6) AS mean_quality,
       |  round(CAST(CAST(sum(tok) AS BIGINT) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6) AS mean_tokens
       |FROM _cbt GROUP BY 1 ORDER BY tier""".stripMargin
  }
}
