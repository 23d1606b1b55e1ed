package graft.operators.events

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for every left row, attach the latest right row of the
  * same key whose timestamp is at-or-before (`inclusive`) / strictly
  * before the left timestamp — the canonical event-attribution /
  * point-in-time-lookup join (kdb+ `aj`, DuckDB `ASOF JOIN`, pandas
  * `merge_asof`), which vanilla Spark SQL lacks: writing it as
  * `JOIN ON key = key AND r.ts <= l.ts` + argmax plans a broadcast
  * nested loop (or an exploding theta-join) and recomputes the match
  * set per left row.
  *
  * Spark-first shape instead: tag both sides, union, and take
  * `last(right_payload, ignoreNulls)` over a window partitioned by key
  * and ordered by (ts, side-tag, right tiebreak) — each right row is
  * "in scope" for exactly the left rows after it in that order, so one
  * pass computes every match. At equal timestamps the tag decides
  * visibility: right-before-left for the inclusive (`<=`) form,
  * left-before-right for the strict (`<`) form. Ties among right rows
  * at the same (key, ts) resolve to the greatest `rightOrderCol` —
  * deterministic, engine-portable.
  *
  * Scale shape: ONE exchange, keyed by `keyCol`, carrying (key, ts,
  * tag, payload) — the right side never fans out per left row and no
  * pairwise candidate set is materialized, so cost is O(n log n) per
  * key vs O(|L|·|R|) for the naive join. A hot key is one fat sorted
  * partition (same posture as [[Sessionize]]; AQE handles moderate
  * skew, and payloads are projected to the requested columns before
  * the exchange).
  */
final class AsofJoin(
    keyCol: String = "user_id",
    leftTsCol: String = "ts",
    rightTsCol: String = "ts",
    rightOrderCol: Option[String] = None,
    inclusive: Boolean = true) {

  /** Left columns + the matched right row's payload columns (null when
    * no right row precedes). `right` must contain `keyCol` and
    * `rightTsCol`; its OTHER columns are the payload and must not
    * clash with left's names (rename before calling — keeps the
    * output schema explicit instead of silently suffixed).
    */
  def apply(left: DataFrame, right: DataFrame): DataFrame = {
    val payload = right.columns.filter(c => c != keyCol && c != rightTsCol).toSeq
    require(payload.nonEmpty, "right side has no payload columns")
    val clash = payload.intersect(left.columns.toSeq)
    require(clash.isEmpty, s"right payload clashes with left columns: ${clash.mkString(",")}")

    val (leftTag, rightTag) = if (inclusive) (1, 0) else (0, 1)
    val tie = rightOrderCol.map(col).getOrElse(lit(0L))
    val lTagged = left.select(
      col(keyCol), col(leftTsCol).as("_ts"), lit(leftTag).as("_tag"), lit(0L).as("_tie"),
      struct(left.columns.map(col).toIndexedSeq: _*).as("_l"))
    val rTagged = right.select(
      col(keyCol), col(rightTsCol).as("_ts"), lit(rightTag).as("_tag"), tie.cast("long").as("_tie"),
      struct(payload.map(col).toIndexedSeq: _*).as("_r"))

    val l2 = lTagged.withColumn("_r", lit(null).cast(rTagged.schema("_r").dataType))
    val r2 = rTagged.withColumn("_l", lit(null).cast(lTagged.schema("_l").dataType))
      .select(l2.columns.map(col).toIndexedSeq: _*)

    val w = Window.partitionBy(col(keyCol)).orderBy(col("_ts"), col("_tag"), col("_tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = l2.union(r2)
      .withColumn("_m", last(col("_r"), ignoreNulls = true).over(w))
      .where(col("_tag") === leftTag)
    matched.select(
      left.columns.map(c => col("_l").getField(c).as(c)).toIndexedSeq ++
        payload.map(c => col("_m").getField(c).as(c)): _*)
  }
}
