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
       |    ($groupCol = '${TextFunctions.sqlLit(aVal)}') AS a
       |  FROM $table WHERE $groupCol IN ('${TextFunctions.sqlLit(aVal)}',
       |    '${TextFunctions.sqlLit(bVal)}')),
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

/** ALL-PAIRS Jensen–Shannon divergence matrix over a fixed source
  * list — the mixture-planning view [[JsDivergence]] drills into one
  * cell of: every pair's divergence from ONE corpus scan, so "which
  * sources are redundant" reads as a table instead of S²/2 separate
  * jobs (each re-scanning the corpus).
  *
  * Mechanism: the per-token conditional-count aggregate carries one
  * exact BIGINT column per source (the SAME single token-keyed
  * shuffle a word count pays, S longs wide); per-source token totals
  * and per-pair union-vocabulary sizes ride ONE broadcast row whose
  * aggregate reuses the token-aggregate exchange (AQE stage reuse —
  * the [[JsDivergence]] replan idiom); and all pairs' floor-scaled
  * contribution sums land in one scalar aggregate, unpivoted to
  * `(source_a, source_b, …)` rows at the end. Each output row is
  * BIT-IDENTICAL to running the two-slice [[JsDivergence]] on that
  * pair (same smoothing, same union-vocab membership, same 10⁻¹²
  * floor scale) — spec-pinned.
  *
  * Scale shape: one corpus scan, one token-keyed exchange whose rows
  * are S+1 fixed-width columns, one broadcast row, one scalar reduce.
  * The pair count is `sources.size²/2` plan-time columns — callers
  * pick the slice set (a mixture's handful of sources), not unbounded
  * group cardinality.
  */
final class JsDivergenceMatrix(
    textCol: String,
    sourceCol: String,
    sources: Seq[String]) {

  require(sources.size >= 2, s"need >= 2 sources, got ${sources.size}")
  require(sources == sources.distinct, "sources must be distinct")
  private val srcs = sources.sorted
  private val pairIdx = for {
    i <- srcs.indices; j <- (i + 1) until srcs.size
  } yield (i, j)

  val name = "js_divergence_matrix"

  /** `(source_a, source_b, vocab, tokens_a, tokens_b, jsd_bits)` per
    * unordered pair, `source_a < source_b`, ordered.
    */
  def apply(df: DataFrame): DataFrame = {
    val perTok = df.filter(col(sourceCol).isin(srcs: _*))
      .select(explode(TextFunctions.tokensOf(col(textCol))).as("tok"),
        col(sourceCol).as("_s"))
      .groupBy(col("tok"))
      .agg(
        count(when(col("_s") === srcs.head, lit(1))).as("c0"),
        srcs.zipWithIndex.tail.map { case (s, i) =>
          count(when(col("_s") === s, lit(1))).as(s"c$i")
        }: _*)
    val totAggs =
      srcs.indices.map(i => sum(col(s"c$i")).as(s"t$i")) ++
        pairIdx.map { case (i, j) =>
          count(when(col(s"c$i") > 0L || col(s"c$j") > 0L, lit(1)))
            .as(s"v${i}_$j")
        }
    val totals = perTok.agg(totAggs.head, totAggs.tail: _*)
    val withTot = perTok.crossJoin(broadcast(totals))
    def contrib(i: Int, j: Int): Column = {
      val halfV = col(s"v${i}_$j").cast("double") * lit(0.5)
      val p = (col(s"c$i").cast("double") + lit(0.5)) /
        (col(s"t$i").cast("double") + halfV)
      val q = (col(s"c$j").cast("double") + lit(0.5)) /
        (col(s"t$j").cast("double") + halfV)
      val m = (p + q) * lit(0.5)
      (p * log(p / m) + q * log(q / m)) * lit(0.5 / math.log(2.0))
    }
    // tokens outside a pair's union vocabulary are NOT part of that
    // pair's distributions — their smoothed pseudo-counts must not
    // contribute (membership gate, exactly the rows the two-slice
    // operator's perTok would hold for that pair)
    val rowAggs =
      pairIdx.map { case (i, j) =>
        sum(when(col(s"c$i") > 0L || col(s"c$j") > 0L,
          floor(contrib(i, j) * lit(1e12)).cast("long"))).as(s"s${i}_$j")
      } ++
        srcs.indices.map(i => first(col(s"t$i")).as(s"t$i")) ++
        pairIdx.map { case (i, j) => first(col(s"v${i}_$j")).as(s"v${i}_$j") }
    val row = withTot.agg(rowAggs.head, rowAggs.tail: _*)
    row.select(explode(array(pairIdx.map { case (i, j) =>
        struct(
          lit(srcs(i)).as("source_a"),
          lit(srcs(j)).as("source_b"),
          coalesce(col(s"v${i}_$j"), lit(0L)).as("vocab"),
          coalesce(col(s"t$i"), lit(0L)).as("tokens_a"),
          coalesce(col(s"t$j"), lit(0L)).as("tokens_b"),
          when(col(s"s${i}_$j").isNotNull,
            round(col(s"s${i}_$j").cast("double") / lit(1e12), 6)).as("jsd_bits"))
      }: _*)).as("_r"))
      .select(col("_r.*"))
      .orderBy(col("source_a"), col("source_b"))
  }

  // ---- DuckDB twin (same conditional counts, same shapes) ----

  def sql(table: String): String = {
    val toks = TextFunctions.tokensOfSql(textCol)
    val inList = srcs.map(s => s"'${TextFunctions.sqlLit(s)}'").mkString(", ")
    val cCols = srcs.zipWithIndex.map { case (s, i) =>
      s"count(CASE WHEN s = '${TextFunctions.sqlLit(s)}' THEN 1 END) AS c$i"
    }.mkString(",\n    ")
    val tCols = srcs.indices.map(i =>
      s"CAST(sum(c$i) AS BIGINT) AS t$i").mkString(",\n    ")
    val vCols = pairIdx.map { case (i, j) =>
      s"count(CASE WHEN c$i > 0 OR c$j > 0 THEN 1 END) AS v${i}_$j"
    }.mkString(",\n    ")
    def contrib(i: Int, j: Int): String = {
      val p = s"((CAST(c$i AS DOUBLE) + 0.5) / (CAST(t$i AS DOUBLE) + CAST(v${i}_$j AS DOUBLE) * 0.5))"
      val q = s"((CAST(c$j AS DOUBLE) + 0.5) / (CAST(t$j AS DOUBLE) + CAST(v${i}_$j AS DOUBLE) * 0.5))"
      val m = s"(($p + $q) * 0.5)"
      s"(($p * ln($p / $m) + $q * ln($q / $m)) * ${0.5 / math.log(2.0)})"
    }
    val sCols = pairIdx.map { case (i, j) =>
      s"CAST(sum(CASE WHEN c$i > 0 OR c$j > 0 " +
        s"THEN CAST(floor(${contrib(i, j)} * 1e12) AS BIGINT) END) AS BIGINT) AS s${i}_$j"
    }.mkString(",\n    ")
    val rows = pairIdx.map { case (i, j) =>
      s"""SELECT '${TextFunctions.sqlLit(srcs(i))}' AS source_a, '${TextFunctions.sqlLit(srcs(j))}' AS source_b,
         |    coalesce(v${i}_$j, 0) AS vocab,
         |    coalesce(t$i, 0) AS tokens_a, coalesce(t$j, 0) AS tokens_b,
         |    CASE WHEN s${i}_$j IS NOT NULL
         |      THEN round(CAST(s${i}_$j AS DOUBLE) / 1e12, 6)
         |    END AS jsd_bits
         |  FROM _jms CROSS JOIN _jmt""".stripMargin
    }.mkString("\n  UNION ALL\n  ")
    s"""WITH _jmm AS MATERIALIZED (SELECT tok,
       |    $cCols
       |  FROM (SELECT unnest($toks) AS tok, $sourceCol AS s
       |      FROM $table WHERE $sourceCol IN ($inList))
       |  GROUP BY tok),
       |_jmt AS MATERIALIZED (SELECT
       |    $tCols,
       |    $vCols
       |  FROM _jmm),
       |_jms AS (SELECT
       |    $sCols
       |  FROM _jmm CROSS JOIN _jmt)
       |SELECT * FROM (
       |  $rows
       |) ORDER BY source_a, source_b""".stripMargin
  }
}
