package graft.operators.stats

import graft.functions.{HashFunctions, TextFunctions}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Heaps'-law vocabulary-growth fit — the companion diagnostic to
  * [[ZipfFit]]: natural corpora grow vocabulary as `V(n) ≈ K·n^β`
  * with β ≈ 0.4–0.6; heavily-duplicated or templated corpora bend LOW
  * (vocabulary saturates — new documents add tokens but no types),
  * while synthetic/id-ridden corpora bend HIGH (β → 1, every document
  * mints new "words"). Together the two fits answer "does this corpus
  * GROW like language", which a one-snapshot Zipf slope can't see.
  *
  * Growth points WITHOUT any document ordering: nested deterministic
  * subsamples by hash trailing-divisibility — subset `k` is the docs
  * whose 64-bit id-hash is divisible by 2^k (so subset K ⊂ … ⊂
  * subset 1 ⊂ subset 0 = everything, each ≈ half the last). Each
  * token occurrence carries its document's LEVEL (largest such k);
  * one token-keyed aggregate then holds, per type, its occurrence
  * count within every subset and the deepest level it appears at —
  * so every `(n_k, V_k)` point falls out of ONE global reduce:
  * `n_k = Σ_type c_{type,k}` (tokens in subset k) and
  * `V_k = #{type : maxLevel ≥ k}` (types in subset k).
  *
  * The log-log OLS runs over ≤ K+1 points that are COLUMNS of one
  * row — a fixed-shape expression (identical term order both
  * engines), with empty subsets excluded by CASE inclusion flags, so
  * the DuckDB twin reproduces it bit-for-bit with no floor-scaling
  * needed beyond the final round.
  *
  * Scale shape: one token-keyed exchange (rows K+2 longs wide), one
  * scalar reduce, zero windows, zero joins, corpus scanned once.
  */
final class HeapsFit(
    textCol: String = "text",
    idCol: String = "doc_id",
    levels: Int = 12,
    hashName: String = "portable") {

  require(levels >= 2 && levels <= 20, s"levels must be in [2,20], got $levels")
  require(hashName == "xxhash64" || hashName == "portable")
  val name = "heaps_fit"
  private val ks = 0 to levels

  /** Largest k ≤ levels with hash % 2^k == 0 (k = 0 always holds). */
  private def levelOf(h: Column): Column =
    ks.reverse.init.foldRight(lit(0)) { (k, rest) =>
      when(h % lit(1L << k) === 0L, lit(k)).otherwise(rest)
    }

  /** One row: `(points_used, beta, k_coef, r2)` — β the Heaps
    * exponent, K the coefficient, over the non-empty subsets. Null fit
    * when fewer than 2 subsets are non-empty.
    */
  def apply(df: DataFrame): DataFrame = {
    val lvl = levelOf(HashFunctions.hashByName(hashName)(col(idCol).cast("string")))
    // level STAGED behind its own projection BEFORE the explode:
    // ExtractGenerator moves non-generator select expressions into a
    // Project ABOVE the Generate, so computing the level alongside the
    // explode pays md5+CASE once per TOKEN (measured 3.2 s vs 0.5 s
    // for the same scan shape at sf0.1); a separate select pins it
    // below the Generate (Project–Generate–Project doesn't collapse),
    // once per document
    val toks = df.select(lvl.as("_lvl"), col(textCol))
      .select(col("_lvl"),
        explode(TextFunctions.tokensOf(col(textCol))).as("_tok"))
    val perType = toks.groupBy(col("_tok")).agg(
      max(col("_lvl")).as("_ml"),
      ks.map(k => count(when(col("_lvl") >= k, lit(1))).as(s"_c$k")): _*)
    val row = perType.agg(
      count(when(col("_ml") >= 0, lit(1))).as("_v0"),
      (ks.tail.map(k => count(when(col("_ml") >= k, lit(1))).as(s"_v$k")) ++
        ks.map(k => sum(col(s"_c$k")).as(s"_n$k"))): _*)
    // fixed-shape OLS of ln V on ln n over the included points — the
    // per-point inclusion flag and log coordinates are STAGED as
    // columns (projection boundaries) so each is computed once and the
    // sum expressions stay small on both engines
    def nk(k: Int) = coalesce(col(s"_n$k"), lit(0L))
    def vk(k: Int) = coalesce(col(s"_v$k"), lit(0L))
    val staged = row.select(ks.flatMap { k =>
      val i = (nk(k) > 0L && vk(k) > 0L).cast("double")
      Seq(i.as(s"_i$k"),
        nk(k).as(s"_in$k"), vk(k).as(s"_iv$k"),
        when(i > 0d, log(nk(k).cast("double"))).otherwise(lit(0d)).as(s"_x$k"),
        when(i > 0d, log(vk(k).cast("double"))).otherwise(lit(0d)).as(s"_y$k"))
    }: _*)
    def sumTerms(f: Int => Column): Column = ks.map(f).reduceLeft(_ + _)
    // degeneracy guards are EXACT-INTEGER: a float sxxN>0 test passes
    // on >=3 identical points through summation noise (m·sxx and sx²
    // no longer cancel exactly) and would emit noise-ratio garbage.
    // "x varies" = two included subsets have different exact token
    // counts; likewise for y over type counts. Sentinels instead of
    // nulls: Spark greatest() skips nulls but DuckDB propagates them.
    def vary(col0: Int => Column, sentMax: Long, sentMin: Long): (Column, Column) = (
      greatest(ks.map(k => when(col(s"_i$k") > 0d, col0(k)).otherwise(lit(sentMax))): _*),
      least(ks.map(k => when(col(s"_i$k") > 0d, col0(k)).otherwise(lit(sentMin))): _*))
    val sums = staged.select(
      sumTerms(k => col(s"_i$k")).as("_m"),
      sumTerms(k => col(s"_x$k")).as("_sx"),
      sumTerms(k => col(s"_y$k")).as("_sy"),
      sumTerms(k => col(s"_x$k") * col(s"_y$k")).as("_sxy"),
      sumTerms(k => col(s"_x$k") * col(s"_x$k")).as("_sxx"),
      sumTerms(k => col(s"_y$k") * col(s"_y$k")).as("_syy"),
      vary(k => col(s"_in$k"), -1L, Long.MaxValue)._1.as("_nmax"),
      vary(k => col(s"_in$k"), -1L, Long.MaxValue)._2.as("_nmin"),
      vary(k => col(s"_iv$k"), -1L, Long.MaxValue)._1.as("_vmax"),
      vary(k => col(s"_iv$k"), -1L, Long.MaxValue)._2.as("_vmin"))
    val m = col("_m")
    val sxxN = m * col("_sxx") - col("_sx") * col("_sx")
    val syyN = m * col("_syy") - col("_sy") * col("_sy")
    val sxyN = m * col("_sxy") - col("_sx") * col("_sy")
    val beta = sxyN / sxxN
    val variesX = m >= 2d && col("_nmax") > col("_nmin") && sxxN > 0d
    val variesY = col("_vmax") > col("_vmin") && syyN > 0d
    sums.select(
      m.cast("long").as("points_used"),
      when(variesX, round(beta, 6)).as("beta"),
      when(variesX,
        round(exp((col("_sy") - beta * col("_sx")) / m), 6)).as("k_coef"),
      when(variesX && variesY,
        round((sxyN * sxyN) / (sxxN * syyN), 6)).as("r2"))
  }

  // ---- DuckDB twin (identical term order, same inclusion flags) ----

  def sql(table: String): String = {
    require(hashName == "portable", "oracle covers the portable hash family")
    val h = HashFunctions.portableHash64Sql(s"CAST($idCol AS VARCHAR)")
    val lvlCase = "CASE " + ks.reverse.init.map(k =>
      s"WHEN lvl_h % ${1L << k} = 0 THEN $k").mkString(" ") + " ELSE 0 END"
    val cCols = ks.map(k =>
      s"CAST(count(CASE WHEN lvl >= $k THEN 1 END) AS BIGINT) AS c$k").mkString(",\n    ")
    val vCols = ks.map(k =>
      s"CAST(count(CASE WHEN ml >= $k THEN 1 END) AS BIGINT) AS v$k").mkString(",\n    ")
    val nCols = ks.map(k =>
      s"CAST(coalesce(sum(c$k), 0) AS BIGINT) AS n$k").mkString(",\n    ")
    // staged per-point columns, mirroring the Spark projection
    // boundaries (each coordinate computed once, short sum expressions)
    val stagedCols = ks.flatMap { k =>
      val i = s"(CASE WHEN n$k > 0 AND v$k > 0 THEN CAST(1 AS DOUBLE) ELSE CAST(0 AS DOUBLE) END)"
      Seq(s"$i AS i$k",
        s"n$k AS in$k", s"v$k AS iv$k",
        s"(CASE WHEN $i > 0 THEN ln(CAST(n$k AS DOUBLE)) ELSE CAST(0 AS DOUBLE) END) AS x$k",
        s"(CASE WHEN $i > 0 THEN ln(CAST(v$k AS DOUBLE)) ELSE CAST(0 AS DOUBLE) END) AS y$k")
    }.mkString(",\n    ")
    def sumTerms(f: Int => String): String = ks.map(f).mkString("(", " + ", ")")
    // exact-integer degeneracy guards via sentinel greatest/least
    // (mirrors the Spark side; DuckDB greatest propagates NULLs, so
    // excluded points carry sentinels, never nulls)
    def varyMax(c: String) = ks.map(k =>
      s"(CASE WHEN i$k > 0 THEN $c$k ELSE CAST(-1 AS BIGINT) END)")
      .mkString("greatest(", ", ", ")")
    def varyMin(c: String) = ks.map(k =>
      s"(CASE WHEN i$k > 0 THEN $c$k ELSE CAST(${Long.MaxValue} AS BIGINT) END)")
      .mkString("least(", ", ", ")")
    val sumCols = Seq(
      sumTerms(k => s"i$k") + " AS m",
      sumTerms(k => s"x$k") + " AS sx",
      sumTerms(k => s"y$k") + " AS sy",
      sumTerms(k => s"(x$k * y$k)") + " AS sxy",
      sumTerms(k => s"(x$k * x$k)") + " AS sxx",
      sumTerms(k => s"(y$k * y$k)") + " AS syy",
      varyMax("in") + " AS nmax", varyMin("in") + " AS nmin",
      varyMax("iv") + " AS vmax", varyMin("iv") + " AS vmin").mkString(",\n    ")
    val sxxN = "(m * sxx - sx * sx)"
    val syyN = "(m * syy - sy * sy)"
    val sxyN = "(m * sxy - sx * sy)"
    val beta = s"($sxyN / $sxxN)"
    val variesX = s"(m >= 2 AND nmax > nmin AND $sxxN > 0)"
    val variesY = s"(vmax > vmin AND $syyN > 0)"
    s"""WITH _hl AS (SELECT tok, $lvlCase AS lvl FROM (
       |    SELECT unnest(${TextFunctions.tokensOfSql(textCol)}) AS tok,
       |      $h AS lvl_h FROM $table)),
       |_ht AS (SELECT tok, max(lvl) AS ml,
       |    $cCols
       |  FROM _hl GROUP BY tok),
       |_hr AS (SELECT
       |    $vCols,
       |    $nCols
       |  FROM _ht),
       |_hx AS (SELECT
       |    $stagedCols
       |  FROM _hr),
       |_hs AS (SELECT
       |    $sumCols
       |  FROM _hx)
       |SELECT CAST(m AS BIGINT) AS points_used,
       |  CASE WHEN $variesX THEN round($beta, 6) END AS beta,
       |  CASE WHEN $variesX
       |    THEN round(exp((sy - $beta * sx) / m), 6) END AS k_coef,
       |  CASE WHEN $variesX AND $variesY
       |    THEN round(($sxyN * $sxyN) / ($sxxN * $syyN), 6) END AS r2
       |FROM _hs""".stripMargin
  }
}
