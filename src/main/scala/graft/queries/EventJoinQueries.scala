package graft.queries

import graft.core.Tables
import graft.operators.events.{AsofJoin, CohortRetention, Funnel, IntervalJoinBucketed}
import org.apache.spark.sql.functions._

/** Event-join gates: the as-of (point-in-time attribution) join and
  * the bucketed no-equi-key interval join — both checked against
  * DuckDB's NATIVE forms (its `ASOF JOIN` operator and a plain
  * inequality join), so the oracle proves the Spark plans implement
  * the standard semantics, not a private variant.
  */
object EventJoinQueries {

  private val HourUs = 3600000000L

  private val asofOp = new AsofJoin(
    keyCol = "user_id", leftTsCol = "ts", rightTsCol = "cts",
    rightOrderCol = Some("click_id"), inclusive = true)

  private val ivOp = new IntervalJoinBucketed(bucketWidthUs = HourUs)

  val queries: Seq[OracleQuery] = Seq(

    // Each purchase attributed to the user's most recent at-or-before
    // click; purchases with no prior click keep nulls (left as-of).
    OracleQuery("asof_join",
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val purchases = ev.where(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("ts"))
        val clicks = ev.where(col("event_type") === "click")
          .select(col("user_id"), col("ts").as("cts"),
            col("event_id").as("click_id"), unix_micros(col("ts")).as("click_us"))
        asofOp(purchases, clicks)
          .select(col("event_id"), col("user_id"), col("click_id"),
            (unix_micros(col("ts")) - col("click_us")).as("us_since"))
          .orderBy(col("event_id"))
      },
      Some("""WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
             |     c AS (SELECT user_id, ts AS cts, event_id AS click_id FROM events
             |           WHERE event_type = 'click')
             |SELECT p.event_id, p.user_id, c.click_id,
             |       epoch_us(p.ts) - epoch_us(c.cts) AS us_since
             |FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND c.cts <= p.ts
             |ORDER BY p.event_id""".stripMargin)),

    // Clicks from ANY user inside each purchase's 1-hour attribution
    // window [ts-1h, ts) — the no-equi-key range join, oracled by the
    // naive inequality join DuckDB can afford at this scale.
    OracleQuery("interval_join",
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val intervals = ev.where(col("event_type") === "purchase")
          .select(col("event_id").as("p_id"),
            (unix_micros(col("ts")) - HourUs).as("start_us"),
            unix_micros(col("ts")).as("end_us"))
        val points = ev.where(col("event_type") === "click")
          .select(col("user_id").as("c_user"), col("value").as("c_value"),
            unix_micros(col("ts")).as("pt_us"))
        val agg = ivOp.pairs(intervals, points)
          .groupBy(col("p_id"))
          .agg(count(lit(1)).as("n_clicks"),
            countDistinct(col("c_user")).as("n_users"),
            round(sum(col("c_value")), 2).as("click_value"))
        intervals.select(col("p_id")).join(agg, Seq("p_id"), "left")
          .select(col("p_id"),
            coalesce(col("n_clicks"), lit(0L)).as("n_clicks"),
            coalesce(col("n_users"), lit(0L)).as("n_users"),
            coalesce(col("click_value"), lit(0.0)).as("click_value"))
          .orderBy(col("p_id"))
      },
      Some(s"""WITH p AS (SELECT event_id AS p_id, epoch_us(ts) - $HourUs AS start_us,
             |            epoch_us(ts) AS end_us FROM events WHERE event_type = 'purchase'),
             |     c AS (SELECT user_id AS c_user, value AS c_value, epoch_us(ts) AS pt_us
             |           FROM events WHERE event_type = 'click')
             |SELECT p.p_id, count(c.pt_us) AS n_clicks,
             |       count(DISTINCT c.c_user) AS n_users,
             |       coalesce(round(sum(c.c_value), 2), CAST(0 AS DOUBLE)) AS click_value
             |FROM p LEFT JOIN c ON p.start_us <= c.pt_us AND c.pt_us < p.end_us
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Ordered signup → view → click → purchase funnel; the chained
    // per-step window minimums cost one user-keyed exchange total.
    OracleQuery("funnel", {
      val op = new Funnel(Seq("signup", "view", "click", "purchase"))
      (s, dir) => op(Tables.events(s, dir)).orderBy(col("step_idx"))
    },
      Some(new Funnel(Seq("signup", "view", "click", "purchase")).sql("events") +
        "\nORDER BY step_idx")),

    OracleQuery("cohort_retention",
      (s, dir) => new CohortRetention()(Tables.events(s, dir))
        .orderBy(col("cohort_week"), col("week_offset")),
      Some(new CohortRetention().sql("events") +
        "\nORDER BY cohort_week, week_offset")),

    // Interval x interval overlap join (both sides span buckets): view
    // windows [ts, ts+5m) vs purchase windows [ts, ts+7m), each
    // overlapping pair exactly once via the closed-form first-shared-
    // bucket rule - no distinct pass; oracle is the naive theta join
    OracleQuery("interval_overlap_join",
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val views = ev.where(col("event_type") === "view")
          .select(col("event_id").as("v_id"),
            unix_micros(col("ts")).as("a_start_us"),
            (unix_micros(col("ts")) + 300000000L).as("a_end_us"))
        val purch = ev.where(col("event_type") === "purchase")
          .select(col("event_id").as("p_id"),
            unix_micros(col("ts")).as("b_start_us"),
            (unix_micros(col("ts")) + 420000000L).as("b_end_us"))
        overlapOp.pairs(views, purch)
          .select(col("v_id"), col("p_id"),
            (least(col("a_end_us"), col("b_end_us")) -
              greatest(col("a_start_us"), col("b_start_us"))).as("overlap_us"))
          .orderBy(col("v_id"), col("p_id"))
      },
      Some(overlapOp.pairsSql(
        "SELECT event_id AS v_id, epoch_us(ts) AS a_start_us, epoch_us(ts) + 300000000 AS a_end_us FROM events WHERE event_type = 'view'",
        "SELECT event_id AS p_id, epoch_us(ts) AS b_start_us, epoch_us(ts) + 420000000 AS b_end_us FROM events WHERE event_type = 'purchase'",
        "v_id, p_id, least(a_end_us, b_end_us) - greatest(a_start_us, b_start_us) AS overlap_us",
        "v_id, p_id")))
  )

  private lazy val overlapOp = new graft.operators.events.IntervalOverlapJoin(
    bucketWidthUs = 600000000L) // 10-minute buckets vs 5/7-minute windows
}
