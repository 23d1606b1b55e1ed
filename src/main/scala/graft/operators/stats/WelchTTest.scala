package graft.operators.stats

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Welch's two-sample t-test — the experiment-readout aggregate (A/B
  * test: does variant B move the metric?). One single-pass aggregate
  * computes both groups' count / sum / sum-of-squares over
  * `floor(value·scale)` BIGINTs (exact, order-invariant — the classic
  * one-pass-variance float-cancellation hazard is gone because the
  * moments are integers); means, Welch variance, the t statistic and
  * the Welch–Satterthwaite degrees of freedom are fixed-shape double
  * expressions over those exact sums, replayed verbatim by the DuckDB
  * oracle.
  *
  * Precision/overflow: `scale` trades metric resolution against the
  * Σv² < 2⁶³ headroom — the default 10³ (milli-unit resolution) holds
  * to ~10⁸ rows per group at metric values ≤ 10³; production at 10¹¹
  * rows shards the aggregation or drops a digit.
  *
  * Scale shape: one partial-aggregated scan (6 longs per partition on
  * the wire), no shuffle of rows, no window.
  */
final class WelchTTest(
    valueCol: String,
    groupCol: String,
    groupA: String,
    groupB: String,
    scale: Double = 1e3) {

  val name = "welch_ttest"

  def apply(df: DataFrame): DataFrame = {
    val isA = col(groupCol) === groupA
    val vs = floor(col(valueCol) * lit(scale)).cast("long")
    val s = df.filter(col(groupCol).isin(groupA, groupB))
      .select(isA.as("_a"), vs.as("_v"))
      .agg(
        count(when(col("_a"), lit(1))).as("na"),
        count(when(!col("_a"), lit(1))).as("nb"),
        sum(when(col("_a"), col("_v")).otherwise(0L)).as("sa"),
        sum(when(!col("_a"), col("_v")).otherwise(0L)).as("sb"),
        sum(when(col("_a"), col("_v") * col("_v")).otherwise(0L)).as("ssa"),
        sum(when(!col("_a"), col("_v") * col("_v")).otherwise(0L)).as("ssb"))
    def d(c: String): Column = col(c).cast("double")
    val sc = lit(scale)
    val ma = d("sa") / (d("na") * sc)
    val mb = d("sb") / (d("nb") * sc)
    // sample variance in real units from the scaled integer moments
    val va = (d("ssa") - d("sa") * d("sa") / d("na")) / (d("na") - lit(1.0)) / (sc * sc)
    val vb = (d("ssb") - d("sb") * d("sb") / d("nb")) / (d("nb") - lit(1.0)) / (sc * sc)
    val sea = va / d("na")
    val seb = vb / d("nb")
    val t = (ma - mb) / sqrt(sea + seb)
    val dfw = (sea + seb) * (sea + seb) /
      (sea * sea / (d("na") - lit(1.0)) + seb * seb / (d("nb") - lit(1.0)))
    // guards (lazily evaluated — CaseWhen skips the division entirely,
    // which matters under ANSI mode AND for the streaming readout,
    // where an early trigger legitimately has 0- or 1-row groups):
    // means need n>0, the test needs both n>1 AND nonzero pooled SE
    val bothVar = col("na") > 1 && col("nb") > 1
    s.select(col("na"), col("nb"),
      when(col("na") > 0, round(ma, 6)).as("mean_a"),
      when(col("nb") > 0, round(mb, 6)).as("mean_b"),
      when(bothVar, when(sea + seb > lit(0.0), round(t, 6))).as("t_stat"),
      when(bothVar, when(sea + seb > lit(0.0), round(dfw, 6))).as("df_welch"))
  }

  // ---- DuckDB twin (same expression shapes) ----

  def sql(table: String): String = {
    def d(c: String): String = s"CAST($c AS DOUBLE)"
    val sc = scale.toString
    val ma = s"(${d("sa")} / (${d("na")} * $sc))"
    val mb = s"(${d("sb")} / (${d("nb")} * $sc))"
    val va = s"((${d("ssa")} - ${d("sa")} * ${d("sa")} / ${d("na")}) / (${d("na")} - 1.0) / ($sc * $sc))"
    val vb = s"((${d("ssb")} - ${d("sb")} * ${d("sb")} / ${d("nb")}) / (${d("nb")} - 1.0) / ($sc * $sc))"
    val sea = s"($va / ${d("na")})"
    val seb = s"($vb / ${d("nb")})"
    val t = s"(($ma - $mb) / sqrt($sea + $seb))"
    val dfw = s"(($sea + $seb) * ($sea + $seb) / " +
      s"($sea * $sea / (${d("na")} - 1.0) + $seb * $seb / (${d("nb")} - 1.0)))"
    val bothVar = "na > 1 AND nb > 1"
    s"""WITH _tt AS (SELECT $groupCol = '$groupA' AS a,
       |    CAST(floor($valueCol * $sc) AS BIGINT) AS v
       |  FROM $table WHERE $groupCol IN ('$groupA', '$groupB')),
       |_ts AS (SELECT
       |    count(CASE WHEN a THEN 1 END) AS na,
       |    count(CASE WHEN NOT a THEN 1 END) AS nb,
       |    CAST(sum(CASE WHEN a THEN v ELSE 0 END) AS BIGINT) AS sa,
       |    CAST(sum(CASE WHEN NOT a THEN v ELSE 0 END) AS BIGINT) AS sb,
       |    CAST(sum(CASE WHEN a THEN v * v ELSE 0 END) AS BIGINT) AS ssa,
       |    CAST(sum(CASE WHEN NOT a THEN v * v ELSE 0 END) AS BIGINT) AS ssb
       |  FROM _tt)
       |SELECT na, nb,
       |  CASE WHEN na > 0 THEN round($ma, 6) END AS mean_a,
       |  CASE WHEN nb > 0 THEN round($mb, 6) END AS mean_b,
       |  CASE WHEN $bothVar THEN (CASE WHEN $sea + $seb > 0.0 THEN round($t, 6) END) END AS t_stat,
       |  CASE WHEN $bothVar THEN (CASE WHEN $sea + $seb > 0.0 THEN round($dfw, 6) END) END AS df_welch
       |FROM _ts""".stripMargin
  }
}
