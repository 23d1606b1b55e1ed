package graft.operators.stats

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Population Stability Index between two corpus slices — the standard
  * distribution-drift monitor (credit-scoring lineage, now the stock
  * "did this snapshot drift from the baseline" check on any pipeline
  * metric: document lengths, quality scores, token counts). A new crawl
  * whose length distribution shifts against last month's baseline shows
  * up as PSI > 0.1 (industry "watch") / > 0.25 ("act") long before
  * downstream training feels it.
  *
  * Mechanism: the metric is bucketed into `buckets` fixed-width bins
  * (top bin open-ended, data-independent edges — no quantile pass, so
  * the same edges apply at any scale and the baseline/current shares
  * are comparable), counts are exact BIGINTs off ONE conditional
  * aggregate scan, and shares get add-half smoothing
  * `(c + ½) / (N + ½·B)` so the log never sees zero (the classic PSI
  * empty-bin fix). `PSI = Σ_b (p_b − q_b)·ln(p_b / q_b)`.
  *
  * Exactness discipline: per-bucket contributions are fixed-shape
  * double expressions over exact integers; the cross-bucket total is a
  * floor-scaled BIGINT sum (order-invariant), so the DuckDB twin
  * reproduces it bit-for-bit.
  *
  * Scale shape: one partial-aggregated scan keyed by bucket (B longs
  * per partition on the wire); totals ride an unbounded window over
  * the B-row spine so the scan happens exactly once, and the spine
  * guarantees empty bins appear at any scale.
  */
object DistributionDrift {

  /** PSI of EACH group's metric distribution against the whole input —
    * the corpus-health form ("which source's shape diverges from the
    * corpus"): one conditional aggregate keyed by (group, bucket), a
    * broadcast of the B-row corpus histogram, and a groups×B spine so
    * empty bins count. Returns `(group, n, psi)` per group, ordered.
    * Same smoothing and floor-scale discipline as the two-slice form.
    */
  def psiPerGroup(df: DataFrame, metric: Column, groupCol: String,
      buckets: Int = 10, width: Long = 60L): DataFrame = {
    require(buckets >= 2 && width >= 1L, "need buckets >= 2 and width >= 1")
    val bucket = least(lit(buckets - 1L),
      greatest(lit(0L), floor(metric.cast("double") / lit(width.toDouble)).cast("long")))
    // NULL/NaN metrics are excluded from the population. Before this
    // filter the engines DIVERGED: Spark's greatest() skips nulls, so a
    // NULL metric landed in bucket 0 and inflated its counts, while the
    // DuckDB twin's NULL bucket fell off the spine join entirely; NaN
    // threw in the ANSI floor cast.
    //
    // The counts table is EAGERLY localCheckpoint-ed: it has THREE
    // consumers (group spine, grand total, the filled join), and left
    // lazy each one re-scans and re-buckets the whole corpus — AQE
    // exchange reuse does NOT rescue this (per-consumer column pruning
    // gives each consumer a differently-pruned aggregate, so the
    // canonical exchanges never match; measured: 3 FileScans in the
    // final adaptive plan). Checkpointing the (groups×B)-bounded state
    // table — tiny relative to the corpus — makes the corpus scan
    // happen exactly once, here (the DupNgram staging idiom; PlanSpec
    // pins the returned frame reads no FileScan at all).
    val counts = df.where(metric.isNotNull && !isnan(metric.cast("double")))
      .select(col(groupCol).as("_g"), bucket.as("_bk"))
      .groupBy(col("_g"), col("_bk")).agg(count(lit(1)).as("_n"))
      .localCheckpoint(true)
    val spine = counts.select(col("_g")).distinct()
      .crossJoin(df.sparkSession.range(buckets).toDF("_bk"))
    val filled = spine.join(counts, Seq("_g", "_bk"), "left")
      .select(col("_g"), col("_bk"), coalesce(col("_n"), lit(0L)).as("_n"))
    // per-bucket and per-group totals are PARTITIONED windows over the
    // (groups×B)-sized frame — bounded frames per window task even with
    // millions of groups (per-domain PSI); the single GRAND total rides
    // a broadcast scalar aggregate over the checkpointed counts, never
    // an unpartitioned window over the groups×B frame.
    import org.apache.spark.sql.expressions.Window
    val totals = counts.agg(sum(col("_n")).as("_ct"))
    val withTot = filled
      .withColumn("_cn", sum(col("_n")).over(
        Window.partitionBy(col("_bk")).rowsBetween(Long.MinValue, Long.MaxValue)))
      .withColumn("_gt", sum(col("_n")).over(
        Window.partitionBy(col("_g")).rowsBetween(Long.MinValue, Long.MaxValue)))
      .crossJoin(broadcast(totals))
    val half = lit(0.5 * buckets)
    val p = (col("_n").cast("double") + lit(0.5)) / (col("_gt").cast("double") + half)
    val q = (col("_cn").cast("double") + lit(0.5)) / (col("_ct").cast("double") + half)
    val term = (p - q) * log(p / q)
    withTot
      .groupBy(col("_g"))
      .agg(sum(col("_n")).as("n"),
        round(sum(floor(term * lit(1e9)).cast("long")).cast("double") / lit(1e9), 6)
          .as("psi"))
      .select(col("_g").as(groupCol), col("n"), col("psi"))
      .orderBy(col(groupCol))
  }

  /** DuckDB twin of [[psiPerGroup]] — `metricSql` is the metric
    * expression over `table`'s columns (same bucketing, smoothing,
    * spine completion, and floor-scale as the Spark side; the grand
    * total rides a scalar CTE exactly like the broadcast row).
    */
  def psiPerGroupSql(table: String, metricSql: String, groupCol: String,
      buckets: Int = 10, width: Long = 60L): String = {
    val m = s"CAST($metricSql AS DOUBLE)"
    val p = s"((CAST(n AS DOUBLE) + 0.5) / (CAST(gt AS DOUBLE) + ${0.5 * buckets}))"
    val q = s"((CAST(cn AS DOUBLE) + 0.5) / (CAST(ct AS DOUBLE) + ${0.5 * buckets}))"
    val term = s"(($p - $q) * ln($p / $q))"
    s"""WITH _pg AS (SELECT $groupCol AS g,
       |    least(${buckets - 1}, greatest(0,
       |      CAST(floor($m / ${width.toDouble}) AS BIGINT))) AS bk
       |  FROM $table
       |  WHERE $metricSql IS NOT NULL AND NOT isnan($m)),
       |_pc AS (SELECT g, bk, count(*) AS n FROM _pg GROUP BY 1, 2),
       |_ps AS (SELECT g, bk FROM (SELECT DISTINCT g FROM _pc)
       |  CROSS JOIN (SELECT unnest(range(0, $buckets)) AS bk)),
       |_pf AS (SELECT g, bk, coalesce(n, 0) AS n
       |  FROM _ps LEFT JOIN _pc USING (g, bk)),
       |_pt AS (SELECT CAST(sum(n) AS BIGINT) AS ct FROM _pc),
       |_pw AS (SELECT g, n,
       |    sum(n) OVER (PARTITION BY bk) AS cn,
       |    sum(n) OVER (PARTITION BY g) AS gt,
       |    ct
       |  FROM _pf CROSS JOIN _pt)
       |SELECT g AS $groupCol, CAST(sum(n) AS BIGINT) AS n,
       |  round(CAST(sum(CAST(floor($term * 1e9) AS BIGINT)) AS DOUBLE) / 1e9, 6) AS psi
       |FROM _pw GROUP BY g ORDER BY g""".stripMargin
  }
}

final class DistributionDrift(
    metricCol: String,
    groupCol: String,
    baseVal: String,
    curVal: String,
    buckets: Int = 10,
    width: Long = 60L) {

  require(buckets >= 2, s"need at least 2 buckets, got $buckets")
  require(width >= 1L, s"width must be positive, got $width")
  val name = "drift_psi"

  private def bucketOf(m: Column): Column =
    least(lit(buckets - 1L),
      greatest(lit(0L), floor(m.cast("double") / lit(width.toDouble)).cast("long")))

  /** The STREAMABLE half: per-bucket conditional counts — one groupBy,
    * legal as a complete-mode streaming aggregation. Batch callers
    * compose it with [[psiFromCounts]]/[[terms]]; a streaming monitor
    * runs THIS over the stream and finishes each microbatch's
    * (B-row) counts table batch-side (the Calibration-monitor idiom —
    * StreamingSpec pins stream == batch).
    */
  def bucketCounts(df: DataFrame): DataFrame =
    df.filter(col(groupCol).isin(baseVal, curVal) &&
        col(metricCol).isNotNull && !isnan(col(metricCol).cast("double")))
      .select(bucketOf(col(metricCol)).as("bucket"),
        (col(groupCol) === baseVal).as("_b"))
      .groupBy(col("bucket"))
      .agg(count(when(col("_b"), lit(1))).as("base_n"),
        count(when(!col("_b"), lit(1))).as("cur_n"))

  /** Joint shape: spine-completed per-bucket counts plus windowed
    * totals, with smoothed shares and the per-bucket PSI term as
    * UNROUNDED columns (`_p`, `_q`, `_term`). Input must be a
    * [[bucketCounts]]-shaped frame.
    */
  private def finish(counts: DataFrame): DataFrame = {
    val spine = counts.sparkSession.range(buckets).toDF("bucket")
    val filled = spine.join(counts, Seq("bucket"), "left")
      .select(col("bucket"),
        coalesce(col("base_n"), lit(0L)).as("base_n"),
        coalesce(col("cur_n"), lit(0L)).as("cur_n"))
    // totals via an unbounded window over the B-row spine — the corpus
    // is scanned/aggregated ONCE (a broadcast-totals formulation would
    // recompute the count aggregate per consumer)
    val w = org.apache.spark.sql.expressions.Window
      .rowsBetween(Long.MinValue, Long.MaxValue)
    val withTot = filled
      .withColumn("_tb", sum(col("base_n")).over(w))
      .withColumn("_tc", sum(col("cur_n")).over(w))
    val half = lit(0.5 * buckets)
    val p = (col("base_n").cast("double") + lit(0.5)) / (col("_tb").cast("double") + half)
    val q = (col("cur_n").cast("double") + lit(0.5)) / (col("_tc").cast("double") + half)
    withTot
      .withColumn("_p", p).withColumn("_q", q)
      .withColumn("_term", (col("_p") - col("_q")) * log(col("_p") / col("_q")))
  }

  private def terms(df: DataFrame): DataFrame = finish(bucketCounts(df))

  /** [[psi]] over an already-aggregated [[bucketCounts]] frame — the
    * finish step a streaming monitor applies per microbatch.
    */
  def psiFromCounts(counts: DataFrame): DataFrame =
    finish(counts).agg(
      sum(col("base_n")).as("n_base"),
      sum(col("cur_n")).as("n_cur"),
      round(sum(floor(col("_term") * lit(1e9)).cast("long")).cast("double") / lit(1e9), 6)
        .as("psi"))

  /** Per-bucket report: `(bucket, base_n, cur_n, base_share, cur_share,
    * psi_term)` for every bucket including empty ones.
    */
  def bucketTable(df: DataFrame): DataFrame =
    terms(df).select(col("bucket"), col("base_n"), col("cur_n"),
        round(col("_p"), 6).as("base_share"),
        round(col("_q"), 6).as("cur_share"),
        round(col("_term"), 6).as("psi_term"))
      .orderBy(col("bucket"))

  /** One row: `(n_base, n_cur, psi)` — the headline drift number. */
  def psi(df: DataFrame): DataFrame = psiFromCounts(bucketCounts(df))

  // ---- DuckDB twins (same spine/smoothing/floor-scale shapes) ----

  private def termsCte(table: String): String = {
    val b = buckets; val half = 0.5 * b
    s"""_db AS (SELECT least(${b - 1}, greatest(0,
       |    CAST(floor(CAST($metricCol AS DOUBLE) / ${width.toDouble}) AS BIGINT))) AS bucket,
       |    ($groupCol = '${graft.functions.TextFunctions.sqlLit(baseVal)}') AS isb
       |  FROM $table WHERE $groupCol IN ('${graft.functions.TextFunctions.sqlLit(baseVal)}',
       |    '${graft.functions.TextFunctions.sqlLit(curVal)}')
       |    AND $metricCol IS NOT NULL AND NOT isnan(CAST($metricCol AS DOUBLE))),
       |_dc AS (SELECT bucket, count(CASE WHEN isb THEN 1 END) AS base_n,
       |    count(CASE WHEN NOT isb THEN 1 END) AS cur_n
       |  FROM _db GROUP BY bucket),
       |_sp AS (SELECT CAST(range AS BIGINT) AS bucket FROM range(0, $b)),
       |_dj AS (SELECT s.bucket,
       |    CAST(coalesce(c.base_n, 0) AS BIGINT) AS base_n,
       |    CAST(coalesce(c.cur_n, 0) AS BIGINT) AS cur_n
       |  FROM _sp s LEFT JOIN _dc c ON c.bucket = s.bucket),
       |_dt AS (SELECT CAST(sum(base_n) AS BIGINT) AS tb,
       |    CAST(sum(cur_n) AS BIGINT) AS tc FROM _dj),
       |_dterm AS (SELECT bucket, base_n, cur_n,
       |    (CAST(base_n AS DOUBLE) + 0.5) / (CAST(tb AS DOUBLE) + $half) AS p,
       |    (CAST(cur_n AS DOUBLE) + 0.5) / (CAST(tc AS DOUBLE) + $half) AS q
       |  FROM _dj CROSS JOIN _dt)""".stripMargin
  }

  def bucketTableSql(table: String): String =
    s"""WITH ${termsCte(table)}
       |SELECT bucket, base_n, cur_n, round(p, 6) AS base_share,
       |  round(q, 6) AS cur_share, round((p - q) * ln(p / q), 6) AS psi_term
       |FROM _dterm ORDER BY bucket""".stripMargin

  /** `prelude`: extra CTEs (no `WITH`) prepended so the drift can run
    * over a derived frame (e.g. cluster assignments) — the
    * RaterAgreement prelude convention.
    */
  def psiSql(table: String, prelude: String = ""): String = {
    val pre = if (prelude.isEmpty) "" else prelude + ",\n"
    s"""WITH $pre${termsCte(table)}
       |SELECT CAST(sum(base_n) AS BIGINT) AS n_base,
       |  CAST(sum(cur_n) AS BIGINT) AS n_cur,
       |  round(CAST(CAST(sum(CAST(floor((p - q) * ln(p / q) * 1e9) AS BIGINT)) AS BIGINT) AS DOUBLE) / 1e9, 6) AS psi
       |FROM _dterm""".stripMargin
  }
}
