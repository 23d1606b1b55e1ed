package graft.operators.stats

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Fixed-width-histogram quantile sketch — the mergeable, bounded-memory
  * quantile path for 10¹¹-row columns where the exact forms
  * (`q12_percentile`, `length_percentile_clip`) would sort or
  * per-group-collect. A histogram over `width`-sized bins is the
  * simplest mergeable sketch there is: partial bin counts add
  * elementwise (map-side combine is just the groupBy partial), the
  * sketch size is `range/width` regardless of row count, and — unlike
  * t-digest/KLL — the result is DETERMINISTIC, which is what makes it
  * oracle-checkable. Estimate error is bounded by `width` by
  * construction (the true quantile lies inside the reported bin).
  *
  * Scale shape: one groupBy on the bin id (map-side partial over at
  * most `range/width` cells per task), then the cumulative walk over
  * the BINS table — bounded by the sketch size, not the data — and a
  * broadcast of the (1-row) total. The corpus is scanned once and only
  * `(bin, count)` longs ride the exchange.
  */
final class HistogramQuantile(valueCol: String, width: Double) {
  require(width > 0, s"width must be > 0, got $width")

  /** `(bin, cnt)` — the sketch itself (bin = floor(value/width)). */
  def bins(df: DataFrame): DataFrame =
    df.where(col(valueCol).isNotNull)
      .groupBy(floor(col(valueCol) / width).cast("long").as("bin"))
      .agg(count(lit(1)).as("cnt"))

}

object HistogramQuantile {

  /** One row per requested quantile: `(q, q_lo, q_hi, n)` — the true
    * q-quantile (rank `ceil(q·n)`, the inverted-CDF definition) lies in
    * `[q_lo, q_hi)`.
    */
  def quantiles(df: DataFrame, valueCol: String, width: Double, qs: Seq[Double]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val op = new HistogramQuantile(valueCol, width)
    val b = op.bins(df)
    // the window runs over the BINS table (sketch-sized, bounded by
    // range/width) — not the corpus; single ordered partition is the
    // sketch's documented memory bound, same as collecting a t-digest
    val cum = b.withColumn("cum",
      sum(col("cnt")).over(Window.orderBy(col("bin"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val tot = b.agg(sum(col("cnt")).as("n"))
    val qdf = qs.toDF("q")
    cum.crossJoin(broadcast(tot)).crossJoin(broadcast(qdf))
      .where(col("cum") >= ceil(col("q") * col("n")))
      .groupBy(col("q"))
      .agg(
        (min(col("bin")) * width).as("q_lo"),
        ((min(col("bin")) + 1) * width).as("q_hi"),
        first(col("n")).as("n"))
      .orderBy(col("q"))
  }

  /** DuckDB twin (identical bin/cumulative/rank arithmetic). */
  def sql(table: String, valueCol: String, width: Double, qs: Seq[Double]): String = {
    val values = qs.map(q => s"(CAST($q AS DOUBLE))").mkString(", ")
    s"""WITH bins AS (
       |  SELECT CAST(floor($valueCol / $width) AS BIGINT) AS bin, count(*) AS cnt
       |  FROM $table WHERE $valueCol IS NOT NULL GROUP BY 1),
       |cum AS (SELECT bin, sum(cnt) OVER (ORDER BY bin) AS cum FROM bins),
       |tot AS (SELECT sum(cnt) AS n FROM bins),
       |qs AS (SELECT q FROM (VALUES $values) AS t(q))
       |SELECT q, CAST(min(bin) * $width AS DOUBLE) AS q_lo,
       |       CAST((min(bin) + 1) * $width AS DOUBLE) AS q_hi,
       |       CAST(any_value(n) AS BIGINT) AS n
       |FROM cum, tot, qs WHERE cum >= ceil(q * n)
       |GROUP BY q ORDER BY q""".stripMargin
  }
}
