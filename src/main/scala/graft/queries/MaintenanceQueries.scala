package graft.queries

import graft.core.Tables
import graft.operators.table.{CdcMerge, ColumnProfiler, DataQualityChecks}
import org.apache.spark.sql.functions._

/** Table-maintenance gates: CDC MERGE (upsert/delete fold of a change
  * feed into a base snapshot), SCD2 history derivation, and the
  * single-pass column profiler — the operations that keep a 100 TB
  * curated corpus incrementally fresh instead of re-materialized.
  * The `events` table plays the change feed (key `user_id`, ordered by
  * `(ts, event_id)`, `error` = delete, anything else upserts `value`);
  * `customer` plays the base snapshot.
  */
object MaintenanceQueries {

  private val cdc = new CdcMerge(
    keyCol = "c_custkey", tsCol = "ts", seqCol = "event_id",
    opCol = "event_type", deleteOp = "error", payloadCol = "value")

  val queries: Seq[OracleQuery] = Seq(

    // MERGE INTO semantics: base keys < 20 are absent so their net
    // changes insert; error-last keys delete; untouched keys pass
    // through unchanged. Oracle is the textbook row_number + FULL JOIN
    // form — the Spark plan must reproduce it with max_by netting (no
    // window, no sort) and one outer join.
    OracleQuery("cdc_upsert",
      (s, dir) => {
        val base = Tables(s, dir, "customer")
          .where(col("c_custkey") >= 20)
          .select(col("c_custkey"), col("c_acctbal"))
        val changes = Tables.events(s, dir)
          .select(col("user_id").as("c_custkey"), col("ts"),
            col("event_id"), col("event_type"), col("value"))
        cdc.merge(base, changes, baseValueCol = "c_acctbal")
          .orderBy(col("c_custkey"))
      },
      Some("""WITH latest AS (
             |  SELECT user_id, event_type AS op, value AS payload FROM (
             |    SELECT user_id, event_type, value,
             |           row_number() OVER (PARTITION BY user_id
             |                              ORDER BY ts DESC, event_id DESC) AS rn
             |    FROM events) t WHERE rn = 1),
             |base AS (SELECT c_custkey, c_acctbal FROM customer WHERE c_custkey >= 20)
             |SELECT coalesce(b.c_custkey, l.user_id) AS c_custkey,
             |       coalesce(l.payload, b.c_acctbal) AS value,
             |       CASE WHEN b.c_custkey IS NULL THEN 'insert'
             |            WHEN l.user_id IS NULL THEN 'unchanged'
             |            ELSE 'update' END AS change_status
             |FROM base b FULL JOIN latest l ON b.c_custkey = l.user_id
             |WHERE l.op IS NULL OR l.op <> 'error'
             |ORDER BY c_custkey""".stripMargin)),

    // SCD2: per-key version history of `value` with consecutive equal
    // values compressed; each version valid [from, to) and the open
    // version flagged current.
    OracleQuery("scd2_history",
      (s, dir) => {
        val changes = Tables.events(s, dir)
          .select(col("user_id").as("c_custkey"), col("ts"),
            col("event_id"), col("event_type"), col("value"))
        cdc.scd2(changes)
          .select(col("c_custkey").as("user_id"), col("value"),
            col("valid_from_us"), col("valid_to_us"),
            col("is_current").cast("long").as("is_current"))
          .orderBy(col("user_id"), col("valid_from_us"))
      },
      Some("""WITH ch AS (
             |  SELECT user_id, value, ts, event_id,
             |         lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
             |  FROM events),
             |v AS (SELECT user_id, value, epoch_us(ts) AS valid_from_us,
             |             lead(epoch_us(ts)) OVER (PARTITION BY user_id
             |                                      ORDER BY ts, event_id) AS valid_to_us
             |      FROM ch WHERE prev IS NULL OR prev <> value)
             |SELECT user_id, value, valid_from_us, valid_to_us,
             |       CAST(valid_to_us IS NULL AS BIGINT) AS is_current
             |FROM v ORDER BY user_id, valid_from_us""".stripMargin)),

    // One-scan column profiler over lineitem; the oracle pays one scan
    // per column (UNION ALL) — same numbers, different plan economics.
    OracleQuery("profile_stats",
      (s, dir) => {
        val cols = Seq("l_orderkey", "l_quantity", "l_extendedprice",
          "l_discount", "l_returnflag", "l_linestatus")
        ColumnProfiler.profile(Tables(s, dir, "lineitem"), cols)
          .orderBy(col("column_name"))
      },
      Some(ColumnProfiler.sql("lineitem", Seq(
        "l_orderkey" -> true, "l_quantity" -> true, "l_extendedprice" -> true,
        "l_discount" -> true, "l_returnflag" -> false, "l_linestatus" -> false)))),

    // Data-quality firewall: all scan checks ride ONE conditional
    // aggregate over orders; referential integrity is the one two-table
    // check (anti-join count against customer). The in_set subset check
    // on o_orderpriority is deliberately failing (observed ~0.4 vs 0.9)
    // so the gate exercises both statuses, and the boundary decision is
    // integer cross-multiplication — never rounded-double compare.
    OracleQuery("dq_checks",
      (s, dir) => {
        val orders = Tables(s, dir, "orders")
        DataQualityChecks(orders, dqChecks)
          .unionAll(DataQualityChecks.refIntegrity(
            orders, "o_custkey", Tables(s, dir, "customer"), "c_custkey"))
          .orderBy(col("check"), col("target"))
      },
      Some(s"""WITH ${DataQualityChecks.scanCteSql("orders", dqChecks)}
           |${DataQualityChecks.rowSelectsSql(dqChecks)}
           |UNION ALL
           |${DataQualityChecks.refIntegritySql("orders", "o_custkey", "customer", "c_custkey")}
           |ORDER BY "check", target""".stripMargin)))

  private lazy val dqChecks: Seq[DataQualityChecks.Check] = {
    import DataQualityChecks._
    Seq(
      Completeness("o_custkey"),
      Completeness("o_orderdate"),
      Uniqueness("o_orderkey"),
      InRange("o_totalprice", 0.0, 1.0e7),
      InSet("o_orderstatus", Seq("O", "F", "P")),
      InSet("o_orderpriority", Seq("1-URGENT", "2-HIGH"), minFrac = 0.9),
      MatchesRegex("o_orderpriority", "^[1-5]-[A-Z ]+$"))
  }
}
