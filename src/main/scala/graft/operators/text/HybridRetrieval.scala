package graft.operators.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Reciprocal-rank fusion (Cormack/Clarke/Büttcher 2009) — the standard
  * hybrid-search combiner: given two already-ranked candidate lists
  * (here: lexical BM25 and dense ANN over the same id space), each
  * document's fused score is `Σ 1/(kRrf + rank_i)` over the lists it
  * appears in. Rank-based, so the incomparable raw scores (BM25 vs
  * cosine) never mix — the whole reason RRF beats score interpolation
  * without tuning.
  *
  * Scale shape: the inputs are top-k lists BY CONTRACT (the upstream
  * operators already did the corpus-scale work with bounded exchanges),
  * but the API accepts arbitrary frames — so each list is first cut to
  * its top `maxListSize` rows by the SAME total order the ranks use
  * (distributed `TakeOrderedAndProject`: per-partition local top-K,
  * only K rows travel), and the rank windows + full-outer join touch
  * O(maxListSize) rows no matter what a caller feeds in. For a
  * conforming top-k input the cut is a no-op (k ≤ maxListSize) and for
  * an oversized one it keeps exactly the rows whose RRF contribution
  * survives any sane fusion depth — rank r contributes 1/(kRrf + r).
  *
  * Determinism: ranks come from `(rounded score DESC, id)` — computed
  * identically by the oracle over the same rounded lists — and the
  * fused score is a two-term double sum in fixed shape.
  */
object HybridRetrieval {

  /** Fuse two ranked lists `(idCol, scoreCol)` into
    * `(id, rrf_score)`, best-first, at most `topK` rows.
    */
  def rrf(a: DataFrame, aId: String, aScore: String,
      b: DataFrame, bId: String, bScore: String,
      kRrf: Int = 60, topK: Int = 10,
      maxListSize: Int = 100000): DataFrame = {
    require(maxListSize >= topK,
      s"maxListSize ($maxListSize) must cover topK ($topK)")
    def ranked(df: DataFrame, id: String, score: String, rank: String): DataFrame =
      df.select(col(id).as("id"), col(score).as("_sc"))
        .orderBy(col("_sc").desc, col("id")).limit(maxListSize)
        .select(col("id"),
          row_number().over(Window.orderBy(col("_sc").desc, col("id"))).as(rank))
    val ra = ranked(a, aId, aScore, "_ra")
    val rb = ranked(b, bId, bScore, "_rb")
    val contrib = (r: String) =>
      coalesce(lit(1.0) / (lit(kRrf) + col(r)).cast("double"), lit(0.0))
    ra.join(rb, Seq("id"), "full_outer")
      .select(col("id"), (contrib("_ra") + contrib("_rb")).as("_s"))
      .orderBy(col("_s").desc, col("id"))
      .limit(topK)
      .select(col("id"), round(col("_s"), 6).as("rrf_score"))
  }

  /** DuckDB twin: `aSql`/`bSql` are complete SELECTs producing the same
    * rounded `(id, score)` lists the Spark side fuses. `maxListSize`
    * mirrors the Spark side's top-`maxListSize` cut (same
    * `(score DESC, id)` order), so the twin stays exact even when a
    * caller feeds an oversized list and the guard actually bites.
    */
  def rrfSql(aSql: String, aId: String, aScore: String,
      bSql: String, bId: String, bScore: String,
      kRrf: Int = 60, topK: Int = 10, maxListSize: Int = 100000): String = {
    require(maxListSize >= topK,
      s"maxListSize ($maxListSize) must cover topK ($topK)")
    def contrib(r: String) =
      s"coalesce(CAST(1.0 AS DOUBLE) / CAST($kRrf + $r AS DOUBLE), CAST(0.0 AS DOUBLE))"
    s"""WITH _ha AS (SELECT * FROM ($aSql) ORDER BY $aScore DESC, $aId LIMIT $maxListSize),
       |_hb AS (SELECT * FROM ($bSql) ORDER BY $bScore DESC, $bId LIMIT $maxListSize),
       |_ra AS (SELECT $aId AS id, row_number() OVER (ORDER BY $aScore DESC, $aId) AS ra FROM _ha),
       |_rb AS (SELECT $bId AS id, row_number() OVER (ORDER BY $bScore DESC, $bId) AS rb FROM _hb),
       |_f AS (SELECT coalesce(_ra.id, _rb.id) AS id,
       |    ${contrib("ra")} + ${contrib("rb")} AS s
       |  FROM _ra FULL OUTER JOIN _rb ON _ra.id = _rb.id)
       |SELECT id, round(s, 6) AS rrf_score FROM _f
       |ORDER BY s DESC, id LIMIT $topK""".stripMargin
  }
}
