package graft.operators.events

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Day-of-week × hour-of-day seasonality heatmap over an event stream:
  * the 168-cell traffic profile operations reads before trusting any
  * anomaly verdict ([[EventAnomaly]]'s trailing window adapts to level
  * shifts but not to "Mondays always spike") and before scheduling
  * batch windows. Exact counts + fixed-shape shares.
  *
  * Convention: `dow` 0 = Sunday … 6 = Saturday (DuckDB's dayofweek;
  * Spark's `dayofweek` is 1-based so the operator subtracts 1 — pinned
  * by the cross-engine gate).
  *
  * Scale shape: one (dow, hod)-keyed partial aggregate (168 groups —
  * full map-side combine) plus a broadcast scalar total. Nothing else.
  */
final class Seasonality(tsCol: String = "ts") {

  val name = "events_seasonality"

  /** `(dow, hod, cnt, share)` ordered by (dow, hod). */
  def apply(df: DataFrame): DataFrame = {
    val cells = df.select((dayofweek(col(tsCol)) - 1).as("dow"),
        hour(col(tsCol)).as("hod"))
      .groupBy(col("dow"), col("hod")).agg(count(lit(1)).as("cnt"))
    val total = cells.agg(sum(col("cnt")).as("_t"))
    cells.crossJoin(broadcast(total))
      .select(col("dow"), col("hod"), col("cnt"),
        round(col("cnt").cast("double") / col("_t").cast("double"), 6).as("share"))
      .orderBy(col("dow"), col("hod"))
  }

  def sql(table: String): String =
    s"""WITH _ssc AS (SELECT dayofweek($tsCol) AS dow, hour($tsCol) AS hod,
       |    count(*) AS cnt FROM $table GROUP BY 1, 2),
       |_sst AS (SELECT sum(cnt) AS t FROM _ssc)
       |SELECT CAST(dow AS INTEGER) AS dow, CAST(hod AS INTEGER) AS hod,
       |  CAST(cnt AS BIGINT) AS cnt,
       |  round(CAST(cnt AS DOUBLE) / CAST(t AS DOUBLE), 6) AS share
       |FROM _ssc CROSS JOIN _sst ORDER BY dow, hod""".stripMargin
}
