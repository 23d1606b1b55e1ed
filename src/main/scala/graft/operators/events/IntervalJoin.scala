package graft.operators.events

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval join WITHOUT an equi key — "count the clicks
  * inside each purchase's attribution window", IP-range lookup,
  * sensor-reading-to-maintenance-window matching. Spark plans the
  * naive `ON start <= ts AND ts < end` as a broadcast nested loop (or
  * a cartesian when neither side fits), which is O(|P|·|I|) — the
  * classic range-join hole (Databricks ships a proprietary range-join
  * hint for exactly this; this operator is the open equivalent).
  *
  * Bucketed shape: pick a bucket width W (≥ the typical interval
  * length), explode each interval onto the fixed time buckets it
  * overlaps (`sequence(start DIV W, (end-1) DIV W)` — half-open
  * intervals, so an interval never lands on the bucket that starts at
  * its exclusive end), bucket each point onto its single bucket
  * (`ts DIV W`), equi-join on the bucket id, and keep exact
  * containment. A point lives in exactly ONE bucket, so every
  * qualifying (interval, point) pair is emitted exactly once — no
  * dedup pass. Cost: shuffle keyed by bucket, then per-bucket
  * |points|×|intervals| only among rows that can actually match —
  * O(matches + bucket-collisions) instead of O(|P|·|I|).
  *
  * Scale posture: the exchange carries (bucket, projected payload);
  * interval fan-out is `len/W + 1` copies (≈2 when W matches the
  * interval scale). A hot bucket (event spike hour) is data-inherent
  * skew — AQE skew-join splits it; for pathological spikes, shrink W
  * or salt the bucket with a point-side hash. Choosing W ≫ or ≪ the
  * interval length degrades toward per-bucket cartesian or high
  * fan-out respectively — it's a required, explicit knob.
  */
final class IntervalJoinBucketed(
    bucketWidthUs: Long,
    startCol: String = "start_us",
    endCol: String = "end_us",
    pointCol: String = "pt_us") {

  require(bucketWidthUs >= 1, s"bucketWidthUs must be >= 1, got $bucketWidthUs")

  /** Every (interval, point) pair with `start <= pt < end` (half-open;
    * epoch-microsecond longs). Columns = intervals' ++ points'; names
    * must not clash. Empty/negative-length intervals match nothing.
    */
  def pairs(intervals: DataFrame, points: DataFrame): DataFrame = {
    val clash = intervals.columns.toSeq.intersect(points.columns.toSeq)
    require(clash.isEmpty, s"interval/point column clash: ${clash.mkString(",")}")
    // integer DIV (not `/` + cast): float division is ±1 off past
    // double's 53-bit mantissa, and both engines truncate DIV the same
    // way on the non-negative epochs this operates on
    val ib = intervals.where(col(startCol) < col(endCol))
      .withColumn("_b", explode(sequence(
        expr(s"$startCol DIV $bucketWidthUs"),
        expr(s"($endCol - 1) DIV $bucketWidthUs"))))
    val pb = points.withColumn("_b", expr(s"$pointCol DIV $bucketWidthUs"))
    ib.join(pb, ib("_b") === pb("_b") &&
        col(startCol) <= col(pointCol) && col(pointCol) < col(endCol))
      .drop("_b")
  }
}
