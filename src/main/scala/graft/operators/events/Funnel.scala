package graft.operators.events

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ordered funnel analysis: how many users complete step 1 → step 2 →
  * … in order (each step at-or-after the previous user's step time) —
  * the event-analytics staple next to [[Sessionize]].
  *
  * Spark shape: per-step earliest-qualifying times as CHAINED window
  * minimums over the SAME user partition — `t1 = min(ts | step1)`,
  * `t2 = min(ts | step2 ∧ ts ≥ t1)`, … Each step's window references
  * the previous step's window column, which Catalyst plans as stacked
  * Window operators over one `Exchange hashpartitioning(user)` — the
  * chain costs ONE shuffle total regardless of funnel depth
  * (plan-asserted in EventJoinSpec). The alternative self-join per
  * step would shuffle the events table `steps` times.
  *
  * Output: one row per funnel step — `(step_idx, step, n_users)` with
  * `n_users` = users whose chain reaches that step in order.
  */
final class Funnel(
    steps: Seq[String],
    userCol: String = "user_id",
    tsCol: String = "ts",
    typeCol: String = "event_type") {

  require(steps.nonEmpty, "funnel needs at least one step")

  def apply(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col(userCol))
    var df = events.select(col(userCol), col(tsCol), col(typeCol))
    var prev: Option[String] = None
    steps.zipWithIndex.foreach { case (step, i) =>
      val reach: Column = prev match {
        case None => when(col(typeCol) === step, col(tsCol))
        case Some(p) => when(col(typeCol) === step && col(tsCol) >= col(p), col(tsCol))
      }
      df = df.withColumn(s"_t$i", min(reach).over(w))
      prev = Some(s"_t$i")
    }
    val perUserAggs = steps.indices.map(i => max(col(s"_t$i")).as(s"_t$i"))
    val perUser = df.groupBy(col(userCol)).agg(perUserAggs.head, perUserAggs.tail: _*)
    val cntAggs = steps.indices.map(i => count(col(s"_t$i")).as(s"_n$i"))
    val counts = perUser.agg(cntAggs.head, cntAggs.tail: _*)
    // tiny (1 row × steps) — unpivot driver-side shapes the report
    counts.select(explode(array(steps.zipWithIndex.map { case (s, i) =>
      struct(lit(i + 1).cast("long").as("step_idx"), lit(s).as("step"),
        col(s"_n$i").as("n_users"))
    }: _*)).as("r")).select(col("r.step_idx"), col("r.step"), col("r.n_users"))
  }

  /** DuckDB twin (identical chained windows). */
  def sql(table: String): String = {
    val stepCols = steps.zipWithIndex.map { case (step, i) =>
      if (i == 0)
        s"min(CASE WHEN $typeCol = '$step' THEN $tsCol END) OVER (PARTITION BY $userCol) AS _t0"
      else
        s"min(CASE WHEN $typeCol = '$step' AND $tsCol >= _t${i - 1} THEN $tsCol END) " +
          s"OVER (PARTITION BY $userCol) AS _t$i"
    }
    // nest one SELECT per step (each references the previous alias)
    val base = s"SELECT $userCol, $tsCol, $typeCol FROM $table"
    val chained = stepCols.zipWithIndex.foldLeft(base) { case (inner, (c, i)) =>
      s"SELECT *, $c FROM ($inner)"
    }
    val cnt = steps.indices.map(i => s"count(_t$i) AS _n$i").mkString(", ")
    val perUser = steps.indices.map(i => s"max(_t$i) AS _t$i").mkString(", ")
    val arms = steps.zipWithIndex.map { case (s, i) =>
      s"SELECT CAST(${i + 1} AS BIGINT) AS step_idx, '$s' AS step, _n$i AS n_users FROM _fcnt"
    }.mkString(" UNION ALL ")
    s"""WITH _fu AS (SELECT $userCol, $perUser FROM ($chained) GROUP BY $userCol),
       |_fcnt AS (SELECT $cnt FROM _fu)
       |$arms""".stripMargin
  }
}
