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
  * (n < 2 or all counts equal).
  *
  * Exactness: S and the tie counts are exact BIGINT sums off integer
  * sign comparisons; tau is one fixed-shape sqrt/division over those
  * exact integers, rounded — the DuckDB twin replays it.
  *
  * Scale shape: one event-scale aggregate to the (type, hour) table,
  * then a type-keyed self-join over hour pairs — bounded by (hours in
  * window)² per type, the same spine bound [[EventAnomaly]] rides; for
  * multi-year ranges pre-aggregate to days first. No windows, no
  * driver state.
  */
final class EventTrend(
    tsCol: String = "ts",
    typeCol: String = "event_type") {

  val name = "events_trend"

  /** `(event_type, n_hours, s_stat, tau_b)` ordered by type (nulls
    * first — a NULL type is a real slice, the EventAnomaly contract, so
    * every join here is null-safe and the twin orders NULLS FIRST).
    */
  def apply(df: DataFrame): DataFrame = {
    // the (type, hour) aggregate fans out to THREE consumers (both pair
    // sides + the hour counts) — stage it or each re-derives the
    // event-scale aggregate (the psiPerGroup lesson, as EventAnomaly)
    val counts = graft.core.Staging.stage(
      df.select(col(typeCol).as("event_type"),
          date_trunc("hour", col(tsCol)).as("h"))
        .groupBy(col("event_type"), col("h")).agg(count(lit(1)).as("c")))
    val a = counts.select(col("event_type"), col("h").as("_ha"), col("c").as("_ca"))
    val b = counts.select(col("event_type").as("_tb"), col("h").as("_hb"),
      col("c").as("_cb"))
    val pairs = a.join(b, col("event_type") <=> col("_tb") && col("_ha") < col("_hb"))
    val stats = pairs.groupBy(col("event_type"))
      .agg(
        sum(signum(col("_cb") - col("_ca")).cast("long")).as("_s"),
        count(lit(1)).as("_n0"),
        count(when(col("_cb") === col("_ca"), lit(1))).as("_t"))
    val nHours = counts.groupBy(col("event_type").as("_nt"))
      .agg(count(lit(1)).as("n_hours"))
    nHours
      .join(stats, col("_nt") <=> stats("event_type"), "left")
      .select(col("_nt").as("event_type"),
        col("n_hours"),
        coalesce(col("_s"), lit(0L)).as("s_stat"),
        when(col("_n0").isNotNull && col("_n0") > col("_t"),
          round(col("_s").cast("double") /
            sqrt((col("_n0") - col("_t")).cast("double") * col("_n0").cast("double")), 6))
          .as("tau_b"))
      .orderBy(col("event_type"))
  }

  // ---- DuckDB twin ----

  def sql(table: String): String =
    s"""WITH _tc AS (SELECT $typeCol AS event_type,
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
