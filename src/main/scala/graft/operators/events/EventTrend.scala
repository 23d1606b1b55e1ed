package graft.operators.events

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Mann–Kendall monotone-trend detection per event type — the
  * non-parametric companion to the OLS slope
  * ([[graft.operators.stats.LinearFit]] asks "what line fits"; MK asks
  * "is the series consistently heading somewhere", robust to outliers
  * and any monotone transform — the standard drift alarm for hourly
  * volumes where one spike would wreck a least-squares slope).
  *
  * Statistic over the OBSERVED hourly counts (documented: silent gaps
  * carry no evidence; densify upstream via [[EventAnomaly]]'s spine if
  * zeros should count): `S = Σ_{i<j} sign(x_j − x_i)` over hour-ordered
  * pairs, and Kendall's tau-b `τ = S / √((n₀ − T_x)·n₀)` with
  * `n₀ = n(n−1)/2` and `T_x` = tied pairs in x (hours are distinct by
  * construction, so only x ties). NULL tau when no comparable pairs
  * (n < 2 or all counts equal). A NULL ts row truncates to a NULL hour:
  * it counts in `n_hours` and joins no pair — the twin's `a.h < b.h`
  * predicate and this pass agree by construction.
  *
  * Exactness: S, n₀ and the tie count are exact BIGINTs off integer
  * comparisons; tau is one fixed-shape sqrt/division over those exact
  * integers, rounded — the DuckDB twin replays the same integers from
  * its (equivalent, O(n²)) pair-join formulation.
  *
  * Scale shape: one event-scale aggregate to the (type, hour) table,
  * then ONE type-keyed pass that computes S by the rank/inversion
  * formulation — a Fenwick (binary-indexed) tree over the
  * coordinate-compressed counts walked in hour order gives, per
  * element, how many prior counts are smaller / tied / greater, i.e.
  * `S = Σ_j (#{i<j: x_i<x_j} − #{i<j: x_i>x_j})` in O(n log n) per type
  * instead of the hour² self-join (VERDICT r14 #2: a 10-year hourly
  * spine is 87.6k points → 3.8B pairs under the join, vs 87.6k·17
  * Fenwick steps ≈ 1.5M here, ~1.4 MB of per-type state). The pass is
  * the repo's one-deliberate-mapGroups idiom (Catalyst has no inversion
  * aggregate); its memory is TIME-RANGE-bounded, not data-bounded — a
  * 100× event scale-up collapses into the same (type, hour) rows
  * upstream of the shuffle. No windows, no driver state, no join.
  *
  * The per-type pass keys on the type AS STRING (the events-table
  * convention; a non-string type column is cast — its NULL slice is
  * preserved either way).
  */
final class EventTrend(
    tsCol: String = "ts",
    typeCol: String = "event_type") {

  val name = "events_trend"

  /** `(event_type, n_hours, s_stat, tau_b)` ordered by type (nulls
    * first — a NULL type is a real slice, the EventAnomaly contract, so
    * the key pass is null-safe and the twin orders NULLS FIRST).
    */
  def apply(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.Encoders
    val counts = df.select(col(typeCol).cast("string").as("event_type"),
        date_trunc("hour", col(tsCol)).as("h"))
      .groupBy(col("event_type"), col("h")).agg(count(lit(1)).as("c"))
    // epoch-second hour key: cast preserves order and distinctness.
    // BOXED hour encoder — a NULL ts (date_trunc -> NULL hour) is a real
    // slice: it counts in n_hours but contributes no pairs, exactly the
    // twin's semantics (its `a.h < b.h` join never pairs a NULL hour). A
    // primitive encoder would throw on the NULL at runtime.
    val typed = counts
      .select(col("event_type"), col("h").cast("long"), col("c"))
      .as[(String, java.lang.Long, Long)](Encoders.tuple(
        Encoders.STRING, Encoders.LONG, Encoders.scalaLong))
    val stats = typed.groupByKey(_._1)(Encoders.STRING)
      .mapGroups { (tpe, it) =>
        // hour-ordered counts for this type: spine-bounded (see scaladoc)
        val all = it.toArray
        val n = all.length // n_hours includes the NULL-hour group
        val arr = all.collect { case (_, h, c) if h != null => (h.longValue, c) }
        scala.util.Sorting.quickSort(arr)(Ordering.by(_._1))
        val m = arr.length // pair domain: non-NULL hours only
        // coordinate-compress the counts for the Fenwick domain
        val dom = arr.map(_._2).distinct
        scala.util.Sorting.quickSort(dom)
        val rank = new scala.collection.mutable.HashMap[Long, Int]
        var d = 0
        while (d < dom.length) { rank(dom(d)) = d + 1; d += 1 }
        val bit = new Array[Long](dom.length + 1)
        def prefix(idx0: Int): Long = {
          var i = idx0; var s = 0L
          while (i > 0) { s += bit(i); i -= i & (-i) }
          s
        }
        var s = 0L; var ties = 0L; var seen = 0L; var j = 0
        while (j < m) {
          val r = rank(arr(j)._2)
          val less = prefix(r - 1)          // prior hours with smaller count
          val leq = prefix(r)
          s += less - (seen - leq)          // +concordant −discordant
          ties += leq - less
          var u = r
          while (u <= dom.length) { bit(u) += 1; u += u & (-u) }
          seen += 1
          j += 1
        }
        val n0 = m.toLong * (m - 1) / 2
        (tpe, n.toLong, s, n0, ties)
      }(Encoders.tuple(Encoders.STRING, Encoders.scalaLong,
        Encoders.scalaLong, Encoders.scalaLong, Encoders.scalaLong))
      .toDF("event_type", "n_hours", "_s", "_n0", "_t")
    stats
      .select(col("event_type"),
        col("n_hours"),
        col("_s").as("s_stat"),
        when(col("_n0") > col("_t"),
          round(col("_s").cast("double") /
            sqrt((col("_n0") - col("_t")).cast("double") * col("_n0").cast("double")), 6))
          .as("tau_b"))
      .orderBy(col("event_type"))
  }

  // ---- DuckDB twin (the O(n²) pair formulation — same exact integers) ----

  def sql(table: String): String =
    s"""WITH _tc AS (SELECT CAST($typeCol AS VARCHAR) AS event_type,
       |    date_trunc('hour', $tsCol) AS h, count(*) AS c
       |  FROM $table GROUP BY 1, 2),
       |_tp AS (SELECT a.event_type,
       |    CAST(sum(sign(b.c - a.c)) AS BIGINT) AS _s,
       |    CAST(count(*) AS BIGINT) AS _n0,
       |    CAST(count(CASE WHEN b.c = a.c THEN 1 END) AS BIGINT) AS _t
       |  FROM _tc a JOIN _tc b
       |    ON a.event_type IS NOT DISTINCT FROM b.event_type AND a.h < b.h
       |  GROUP BY 1),
       |_tn AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_hours
       |  FROM _tc GROUP BY 1)
       |SELECT _tn.event_type, n_hours,
       |  coalesce(_s, 0) AS s_stat,
       |  CASE WHEN _n0 IS NOT NULL AND _n0 > _t THEN
       |    round(CAST(_s AS DOUBLE)
       |      / sqrt(CAST(_n0 - _t AS DOUBLE) * CAST(_n0 AS DOUBLE)), 6)
       |  END AS tau_b
       |FROM _tn LEFT JOIN _tp
       |  ON _tn.event_type IS NOT DISTINCT FROM _tp.event_type
       |ORDER BY _tn.event_type NULLS FIRST""".stripMargin
}
