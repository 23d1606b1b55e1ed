package graft.operators.events

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval×interval OVERLAP join without an equi key — "which
  * maintenance windows intersect which incident windows", session-vs-
  * campaign attribution, A/B exposure overlap. The naive
  * `ON aStart < bEnd AND bStart < aEnd` is a nested-loop/cartesian in
  * Spark — the same range-join hole as [[IntervalJoinBucketed]], one
  * degree harder because BOTH sides span multiple buckets.
  *
  * Bucketed shape: both sides explode onto fixed-width time buckets;
  * the equi-join on the bucket id finds every overlapping pair in
  * every SHARED bucket, and the duplicate-elimination is closed-form —
  * a qualifying pair is KEPT only in the first bucket both occupy,
  * `bucket == max(aStart, bStart) DIV W` — so each pair emits exactly
  * once with no distinct pass (an overlapping pair always shares that
  * bucket: the later start lies in both intervals' bucket ranges).
  *
  * Scale posture: identical to the point-in-interval operator —
  * bucket-keyed exchange, fan-out `len/W + 1` per interval, AQE
  * skew-join for hot buckets, W an explicit knob matched to interval
  * scale. Half-open `[start, end)` semantics; touching intervals
  * (aEnd == bStart) do NOT overlap.
  *
  * Fan-out guard: a W mismatched to the data (a year-long interval at
  * a minute-wide bucket) would silently explode one row into ~525k —
  * any interval spanning more than `maxBucketsPerInterval` buckets
  * raises a task error naming the interval and the knobs, riding the
  * sequence bound itself so column pruning can't drop the check.
  */
final class IntervalOverlapJoin(
    bucketWidthUs: Long,
    aStart: String = "a_start_us", aEnd: String = "a_end_us",
    bStart: String = "b_start_us", bEnd: String = "b_end_us",
    maxBucketsPerInterval: Long = 10000L) {

  require(bucketWidthUs >= 1, s"bucketWidthUs must be >= 1, got $bucketWidthUs")
  require(maxBucketsPerInterval >= 1,
    s"maxBucketsPerInterval must be >= 1, got $maxBucketsPerInterval")

  /** `hi` if the span stays under the cap, else a loud task error —
    * never a silent half-million-row fan-out.
    */
  private def guardedHi(startCol: String, endCol: String) = {
    val lo = expr(s"$startCol DIV $bucketWidthUs")
    val hi = expr(s"($endCol - 1) DIV $bucketWidthUs")
    when(hi - lo < lit(maxBucketsPerInterval), hi)
      .otherwise(raise_error(format_string(
        s"interval_overlap_join: interval [%d, %d) spans %d buckets at " +
          s"bucketWidthUs=$bucketWidthUs — over maxBucketsPerInterval=" +
          s"$maxBucketsPerInterval; widen bucketWidthUs or raise the cap",
        col(startCol), col(endCol), hi - lo + 1)).cast("long"))
  }

  /** Every (a, b) pair with `aStart < bEnd AND bStart < aEnd`
    * (half-open overlap; epoch-microsecond longs). Columns = a's ++
    * b's; names must not clash. Empty intervals match nothing.
    */
  def pairs(a: DataFrame, b: DataFrame): DataFrame = {
    val clash = a.columns.toSeq.intersect(b.columns.toSeq)
    require(clash.isEmpty, s"interval column clash: ${clash.mkString(",")}")
    val ab = a.where(col(aStart) < col(aEnd))
      .withColumn("_ba", explode(sequence(
        expr(s"$aStart DIV $bucketWidthUs"), guardedHi(aStart, aEnd))))
    val bb = b.where(col(bStart) < col(bEnd))
      .withColumn("_bb", explode(sequence(
        expr(s"$bStart DIV $bucketWidthUs"), guardedHi(bStart, bEnd))))
    ab.join(bb, col("_ba") === col("_bb") &&
        col(aStart) < col(bEnd) && col(bStart) < col(aEnd) &&
        col("_ba") === expr(s"greatest($aStart, $bStart) DIV $bucketWidthUs"))
      .drop("_ba", "_bb")
  }

  /** DuckDB twin: the naive theta join (fine for a verification
    * engine); `aSql`/`bSql` expose the four bound columns.
    */
  def pairsSql(aSql: String, bSql: String, selectCols: String,
      orderBy: String): String =
    s"""SELECT $selectCols
       |FROM ($aSql) a JOIN ($bSql) b
       |  ON a.$aStart < b.$bEnd AND b.$bStart < a.$aEnd
       |ORDER BY $orderBy""".stripMargin
}
