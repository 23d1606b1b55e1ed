package graft.operators.stats

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Cohen's kappa between two boolean "raters" over the same corpus —
  * chance-corrected agreement. The pipeline use: two quality filters
  * (curation heuristics, labeling runs, annotator pools) each emit a
  * keep/drop verdict per document; raw percent-agreement overstates
  * consensus when both raters keep (or drop) almost everything, and
  * kappa is the standard correction (Cohen 1960). A kappa near 0 says
  * the second filter adds independent signal; near 1 says it is
  * redundant with the first.
  *
  * Exactness discipline: the 2×2 contingency table is exact BIGINT
  * counts from ONE partial-aggregated scan, and kappa itself reduces to
  * a ratio of two exact integers —
  * `κ = (n·(n11+n00) − S) / (n² − S)` with
  * `S = (n11+n10)(n11+n01) + (n00+n10)(n00+n01)` — so the
  * singular-case guard (`n² = S`, e.g. a constant rater) is an INTEGER
  * comparison, not a float-epsilon test, and the DuckDB twin replays
  * the same expression bit-for-bit.
  *
  * Scale shape: one partial-aggregated scan (4 longs per partition on
  * the wire), no shuffle of rows, no window.
  */
final class RaterAgreement(raterA: Column, raterB: Column) {

  val name = "rater_agreement"

  /** One row: the 2×2 table, observed/expected agreement, kappa.
    * Null kappa when the chance-agreement denominator is 0 (one rater
    * constant over the whole input, or an empty input).
    */
  def apply(df: DataFrame): DataFrame = {
    val s = df.select(raterA.as("_a"), raterB.as("_b"))
      .agg(
        count(lit(1)).as("n"),
        count(when(col("_a") && col("_b"), lit(1))).as("n_both_keep"),
        count(when(col("_a") && !col("_b"), lit(1))).as("n_only_a"),
        count(when(!col("_a") && col("_b"), lit(1))).as("n_only_b"),
        count(when(!col("_a") && !col("_b"), lit(1))).as("n_both_drop"))
    // the quadratic terms (n², the S products) ride decimal(38,0) —
    // exact up to 10³⁸, so n up to ~10¹⁹ rows cannot overflow (Long
    // arithmetic would throw past n ≈ 3·10⁹ under ANSI); the DuckDB
    // twin uses HUGEINT for the same headroom
    def d38(c: Column): Column = c.cast("decimal(38,0)")
    val n = d38(col("n")); val n11 = d38(col("n_both_keep"))
    val n10 = d38(col("n_only_a")); val n01 = d38(col("n_only_b"))
    val n00 = d38(col("n_both_drop"))
    val sChance = (n11 + n10) * (n11 + n01) + (n00 + n10) * (n00 + n01)
    val kNum = n * (n11 + n00) - sChance
    val kDen = n * n - sChance
    s.select(col("n"), col("n_both_keep"), col("n_only_a"), col("n_only_b"),
      col("n_both_drop"),
      when(col("n") > 0, round((n11 + n00).cast("double") / n.cast("double"), 6))
        .as("observed_agreement"),
      when(col("n") > 0, round(sChance.cast("double") / (n * n).cast("double"), 6))
        .as("expected_agreement"),
      when(kDen =!= lit(0).cast("decimal(38,0)"),
        round(kNum.cast("double") / kDen.cast("double"), 6))
        .as("kappa"))
  }

  // ---- DuckDB twin (same integer-ratio shape) ----

  /** `prelude` lets callers stage helper CTEs (e.g. a tokens column)
    * ahead of the agreement CTEs — pass `"tk AS (...),"` and read from
    * `table = "tk"`.
    */
  def sql(table: String, aExpr: String, bExpr: String, prelude: String = ""): String = {
    val sChance = "((n11 + n10) * (n11 + n01) + (n00 + n10) * (n00 + n01))"
    s"""WITH $prelude
       |_rr AS (SELECT ($aExpr) AS a, ($bExpr) AS b FROM $table),
       |_rt AS (SELECT CAST(count(*) AS HUGEINT) AS n,
       |    CAST(count(CASE WHEN a AND b THEN 1 END) AS HUGEINT) AS n11,
       |    CAST(count(CASE WHEN a AND NOT b THEN 1 END) AS HUGEINT) AS n10,
       |    CAST(count(CASE WHEN NOT a AND b THEN 1 END) AS HUGEINT) AS n01,
       |    CAST(count(CASE WHEN NOT a AND NOT b THEN 1 END) AS HUGEINT) AS n00
       |  FROM _rr)
       |SELECT CAST(n AS BIGINT) AS n, CAST(n11 AS BIGINT) AS n_both_keep,
       |  CAST(n10 AS BIGINT) AS n_only_a, CAST(n01 AS BIGINT) AS n_only_b,
       |  CAST(n00 AS BIGINT) AS n_both_drop,
       |  CASE WHEN n > 0
       |    THEN round(CAST(n11 + n00 AS DOUBLE) / CAST(n AS DOUBLE), 6)
       |  END AS observed_agreement,
       |  CASE WHEN n > 0
       |    THEN round(CAST($sChance AS DOUBLE) / CAST(n * n AS DOUBLE), 6)
       |  END AS expected_agreement,
       |  CASE WHEN n * n - $sChance <> 0
       |    THEN round(CAST(n * (n11 + n00) - $sChance AS DOUBLE)
       |      / CAST(n * n - $sChance AS DOUBLE), 6)
       |  END AS kappa
       |FROM _rt""".stripMargin
  }
}
