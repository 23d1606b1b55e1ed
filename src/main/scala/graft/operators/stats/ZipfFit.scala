package graft.operators.stats

import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Zipf rank–frequency fit over a corpus's unigram distribution — OLS
  * of `ln(freq)` on `ln(rank)` for the top-K vocabulary. Natural text
  * follows Zipf's law with slope ≈ −1; machine-generated, templated,
  * or heavily-deduplicated text bends the curve (slope far from −1,
  * low r²), making the fit a one-row "does this corpus look like
  * language" check per source or snapshot.
  *
  * Exactness discipline: token counts are exact; ranks come from a
  * deterministic `(count DESC, token ASC)` row_number; the OLS moment
  * sums over the per-token `ln` terms are floor-scaled BIGINTs
  * (order-invariant — the [[LinearFit]] discipline extended to real-
  * valued features), and slope/intercept/r² are fixed-shape double
  * expressions over those exact sums, replayed verbatim by DuckDB.
  * The 10⁻⁹ floor quantization is far below the fit's statistical
  * noise and is identical in both engines.
  *
  * Scale shape: one token-keyed partial aggregate (the word-count
  * shuffle), then a distributed top-K (`TakeOrderedAndProject`: each
  * partition keeps its local top-K head, only K rows travel) — the
  * full vocabulary NEVER transits one partition. Ranks are a
  * row_number over the K-row result, bit-identical to ranking first
  * because the order `(count DESC, token ASC)` is total (the
  * [[graft.operators.ml.BinaryAuc]] no-global-rank discipline).
  */
final class ZipfFit(textCol: String, topK: Int = 1000) {

  require(topK >= 2, s"topK must be >= 2, got $topK")
  val name = "zipf_fit"

  /** One row: `(vocab, slope, intercept, r2)` over the top-K ranks
    * (vocab = ranks actually fitted, ≤ topK). Null fit when fewer than
    * 2 distinct tokens exist.
    */
  def apply(df: DataFrame): DataFrame = {
    val freqs = df
      .select(explode(TextFunctions.tokensOf(col(textCol))).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("c"))
    // Distributed top-K, then rank the K-row head. An unpartitioned
    // row_number over the full vocab would funnel every distinct token
    // through ONE window task just to discard all but topK rows; the
    // total order makes orderBy().limit() + row_number identical.
    val top = freqs.orderBy(col("c").desc, col("tok").asc).limit(topK)
    val ranked = top.select(col("c"),
      row_number().over(org.apache.spark.sql.expressions.Window
        .orderBy(col("c").desc, col("tok").asc)).as("rank"))
    val x = log(col("rank").cast("double"))
    val y = log(col("c").cast("double"))
    val s = ranked.agg(
      count(lit(1)).as("n"),
      sum(floor(x * lit(1e9)).cast("long")).as("sa"),
      sum(floor(y * lit(1e9)).cast("long")).as("sb"),
      sum(floor(x * y * lit(1e9)).cast("long")).as("sab"),
      sum(floor(x * x * lit(1e9)).cast("long")).as("saa"),
      sum(floor(y * y * lit(1e9)).cast("long")).as("sbb"))
    val n = col("n").cast("double")
    def d(c: String): Column = col(c).cast("double") / lit(1e9)
    val (sa, sb, sab, saa, sbb) = (d("sa"), d("sb"), d("sab"), d("saa"), d("sbb"))
    val sxxN = n * saa - sa * sa
    val syyN = n * sbb - sb * sb
    val sxyN = n * sab - sa * sb
    s.select(col("n").as("vocab"),
      when(sxxN > 0d, round(sxyN / sxxN, 6)).as("slope"),
      when(sxxN > 0d, round((sb - (sxyN / sxxN) * sa) / n, 6)).as("intercept"),
      when(sxxN > 0d && syyN > 0d,
        round((sxyN * sxyN) / (sxxN * syyN), 6)).as("r2"))
  }

  // ---- DuckDB twin (same rank order, same floor-scaled sums) ----

  def sql(table: String): String = {
    val toks = TextFunctions.tokensOfSql(textCol)
    def d(c: String): String = s"(CAST($c AS DOUBLE) / 1e9)"
    val n = "CAST(n AS DOUBLE)"
    val (sa, sb, sab, saa, sbb) = (d("sa"), d("sb"), d("sab"), d("saa"), d("sbb"))
    val sxxN = s"($n * $saa - $sa * $sa)"
    val syyN = s"($n * $sbb - $sb * $sb)"
    val sxyN = s"($n * $sab - $sa * $sb)"
    s"""WITH _zf AS (SELECT tok, count(*) AS c FROM
       |    (SELECT unnest($toks) AS tok FROM $table) GROUP BY tok),
       |_zr AS (SELECT c, row_number() OVER (ORDER BY c DESC, tok ASC) AS rank
       |  FROM _zf QUALIFY rank <= $topK),
       |_zx AS (SELECT ln(CAST(rank AS DOUBLE)) AS x, ln(CAST(c AS DOUBLE)) AS y FROM _zr),
       |_zs AS (SELECT count(*) AS n,
       |    CAST(sum(CAST(floor(x * 1e9) AS BIGINT)) AS BIGINT) AS sa,
       |    CAST(sum(CAST(floor(y * 1e9) AS BIGINT)) AS BIGINT) AS sb,
       |    CAST(sum(CAST(floor(x * y * 1e9) AS BIGINT)) AS BIGINT) AS sab,
       |    CAST(sum(CAST(floor(x * x * 1e9) AS BIGINT)) AS BIGINT) AS saa,
       |    CAST(sum(CAST(floor(y * y * 1e9) AS BIGINT)) AS BIGINT) AS sbb
       |  FROM _zx)
       |SELECT n AS vocab,
       |  CASE WHEN $sxxN > 0 THEN round($sxyN / $sxxN, 6) END AS slope,
       |  CASE WHEN $sxxN > 0 THEN round(($sb - ($sxyN / $sxxN) * $sa) / $n, 6) END AS intercept,
       |  CASE WHEN $sxxN > 0 AND $syyN > 0
       |    THEN round(($sxyN * $sxyN) / ($sxxN * $syyN), 6)
       |  END AS r2
       |FROM _zs""".stripMargin
  }
}
