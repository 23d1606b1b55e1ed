package graft.operators.events

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Cohort retention: users grouped by their first-activity week
  * (cohort), counted again in each later week they return — the
  * retention-matrix backbone of product analytics.
  *
  * Spark shape: epoch week via integer DIV (both engines truncate
  * identically on non-negative epochs; float division drifts past
  * double's mantissa — the [[Sessionize]] lesson), first week as a
  * per-user window min (one user-keyed exchange), then one
  * `(cohort, offset)` aggregate with a distinct-user count. Rows are
  * projected to (user, week) BEFORE the first exchange.
  */
final class CohortRetention(
    userCol: String = "user_id",
    tsCol: String = "ts") {

  /** `(cohort_week, week_offset, n_users)` — epoch-week keyed. */
  def apply(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col(userCol))
    events
      .select(col(userCol),
        expr(s"(unix_micros($tsCol) DIV 86400000000) DIV 7").as("_wk"))
      .withColumn("_cw", min(col("_wk")).over(w))
      .groupBy(col("_cw").as("cohort_week"),
        (col("_wk") - col("_cw")).as("week_offset"))
      .agg(countDistinct(col(userCol)).as("n_users"))
  }

  /** DuckDB twin (`//` floor-division matches DIV on these epochs). */
  def sql(table: String): String =
    s"""WITH _crwk AS (SELECT $userCol,
       |    (epoch_us($tsCol) // 86400000000) // 7 AS _wk FROM $table),
       |_crcw AS (SELECT *, min(_wk) OVER (PARTITION BY $userCol) AS _cw FROM _crwk)
       |SELECT _cw AS cohort_week, _wk - _cw AS week_offset,
       |       count(DISTINCT $userCol) AS n_users
       |FROM _crcw GROUP BY 1, 2""".stripMargin
}
