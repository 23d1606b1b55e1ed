package graft.operators.stats

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-composition balance report: the whole-corpus concentration
  * numbers a mixture planner watches — max source share, Gini
  * coefficient, Herfindahl-style effective source count (1/Σp²), and
  * Shannon entropy (bits) with its 2^H effective count. One source at
  * 90% mass reads as effective ≈ 1.2 however many sources nominally
  * exist — the "your mix collapsed" alarm in front of
  * [[graft.operators.text.MixPlan]].
  *
  * Exactness: masses are exact BIGINTs; Gini uses the sorted-rank
  * closed form `Σ(2i − n − 1)·m_i / (n·Σm)` whose numerator is an exact
  * integer sum (decimal(38,0)/HUGEINT headroom); Σp² and entropy ride
  * floor-scaled integer contributions (the [[MutualInformation]]
  * discipline), so every cross-row reduction is an exact integer sum
  * and the final bit values are fixed-shape doubles.
  *
  * Scale shape: one source-keyed partial aggregate; the rank window
  * rides the |sources|-row table (sources are 10s–100s, never
  * corpus-sized — the B-row-spine contract).
  */
final class SourceBalance(groupCol: String, weightCol: Option[String] = None) {

  val name = "source_balance"
  private val S = 1000000000L

  /** One row: `(n_sources, total_mass, max_share, gini,
    * effective_herfindahl, entropy_bits)`; NULLs on an empty input.
    */
  def apply(df: DataFrame): DataFrame = {
    // coalesce the mass to 0: an all-NULL-weight group would otherwise
    // sort NULLS FIRST in Spark but NULLS LAST in DuckDB, shifting every
    // rank in the Gini numerator
    val mass = weightCol.map(w => sum(col(w).cast("long"))).getOrElse(count(lit(1)))
    val per = df.groupBy(col(groupCol).as("_g"))
      .agg(coalesce(mass, lit(0L)).as("_m"))
    val all = Window.rowsBetween(Long.MinValue, Long.MaxValue)
    val ranked = per.select(col("_m"),
      row_number().over(Window.orderBy(col("_m"), col("_g"))).cast("long").as("_i"),
      count(lit(1)).over(all).as("_n"),
      sum(col("_m")).over(all).as("_t"))
    def d(c: org.apache.spark.sql.Column) = c.cast("double")
    def d38(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
    val p = d(col("_m")) / d(col("_t"))
    val agg = ranked.agg(
      first(col("_n")).as("n_sources"),
      first(col("_t")).as("_t"),
      max(col("_m")).as("_maxm"),
      sum(d38(lit(2L) * col("_i") - col("_n") - lit(1L)) * d38(col("_m"))).as("_gnum"),
      sum(floor(p * p * lit(S)).cast("long")).as("_sh2"),
      sum(floor(when(col("_m") > 0L && col("_t") > 0L, -p * log2(p))
        .otherwise(lit(0.0)) * lit(S)).cast("long")).as("_sent"))
    agg.select(
      col("n_sources"),
      col("_t").as("total_mass"),
      when(col("_t") > 0L, round(d(col("_maxm")) / d(col("_t")), 6)).as("max_share"),
      when(col("_t") > 0L && col("n_sources") > 0L,
        round(d(col("_gnum")) / (d(col("n_sources")) * d(col("_t"))), 6)).as("gini"),
      when(col("_sh2") > 0L,
        round(lit(S.toDouble) / d(col("_sh2")), 4)).as("effective_herfindahl"),
      when(col("_t") > 0L,
        round(d(col("_sent")) / lit(S.toDouble), 6)).as("entropy_bits"))
  }

  // ---- DuckDB twin (same rank form, same floor-scaled terms) ----

  def sql(table: String, massSql: String = "count(*)"): String = {
    val p = "(CAST(m AS DOUBLE) / CAST(t AS DOUBLE))"
    s"""WITH _sbp AS (SELECT $groupCol AS g, coalesce($massSql, 0) AS m FROM $table GROUP BY 1),
       |_sbr AS (SELECT m,
       |    CAST(row_number() OVER (ORDER BY m, g) AS BIGINT) AS i,
       |    count(*) OVER () AS n, sum(m) OVER () AS t
       |  FROM _sbp),
       |_sba AS (SELECT first(n) AS n_sources, first(t) AS t, max(m) AS maxm,
       |    sum(CAST(2 * i - n - 1 AS HUGEINT) * CAST(m AS HUGEINT)) AS gnum,
       |    sum(CAST(floor($p * $p * $S) AS BIGINT)) AS sh2,
       |    sum(CAST(floor((CASE WHEN m > 0 AND t > 0 THEN -$p * log2($p) ELSE 0.0 END) * $S) AS BIGINT)) AS sent
       |  FROM _sbr)
       |SELECT CAST(n_sources AS BIGINT) AS n_sources, CAST(t AS BIGINT) AS total_mass,
       |  CASE WHEN t > 0 THEN round(CAST(maxm AS DOUBLE) / CAST(t AS DOUBLE), 6) END AS max_share,
       |  CASE WHEN t > 0 AND n_sources > 0 THEN
       |    round(CAST(gnum AS DOUBLE) / (CAST(n_sources AS DOUBLE) * CAST(t AS DOUBLE)), 6) END AS gini,
       |  CASE WHEN sh2 > 0 THEN round(${S.toDouble} / CAST(sh2 AS DOUBLE), 4) END AS effective_herfindahl,
       |  CASE WHEN t > 0 THEN round(CAST(sent AS DOUBLE) / ${S.toDouble}, 6) END AS entropy_bits
       |FROM _sba""".stripMargin
  }
}
