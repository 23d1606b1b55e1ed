package graft.operators.stats

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Mutual information (and normalized MI) between two categorical
  * columns — "does source predict language", the dependence monitor
  * behind mixture planning: near-zero MI says the slices are
  * interchangeable along that axis, high NMI says one column is a proxy
  * for the other (e.g. a source that is 99% one language — its language
  * filter is redundant with the source filter).
  *
  * Exactness: every cell/marginal count is an exact BIGINT; each cell's
  * MI contribution `n_xy · log2(n_xy·N / (n_x·n_y))` is floor-scaled to
  * a BIGINT (×10⁶) BEFORE summing, so the cross-cell reduction is an
  * exact integer sum — order- and partition-invariant (a raw double sum
  * over cells would be order-dependent and engine-divergent). The same
  * scaling covers both marginal entropies; the final bit values are
  * fixed-shape doubles over those exact scaled sums. Floor bias is
  * ≤ cells/10⁶ scaled units — deterministic and identical in both
  * engines.
  *
  * Scale shape: one (x, y) partial aggregate (cells ≪ rows), marginals
  * as two cell-table aggregates joined back on the category keys, one
  * scalar reduce. Rows shuffle once, on the (x, y) key.
  */
final class MutualInformation(xCol: String, yCol: String) {

  val name = "mutual_information"
  private val S = 1000000L

  /** One row: `(n, cells, mi_bits, h_x, h_y, nmi)`; NULL nmi when either
    * marginal entropy is zero (a constant column carries no information
    * to normalize by). NULL category values count as a real category
    * (both engines' groupBy keeps NULL keys).
    */
  def apply(df: DataFrame): DataFrame = {
    // the cell table is |X|×|Y|-sized (≪ rows) and fans out to FOUR
    // consumers (both marginals, totals, the contribution join) —
    // checkpoint it once or each consumer re-scans the corpus
    val cells = graft.core.Staging.stage(
      df.groupBy(col(xCol).as("_x"), col(yCol).as("_y"))
        .agg(count(lit(1)).as("_nxy")))
    val mx = cells.groupBy(col("_x").as("_mxk")).agg(sum(col("_nxy")).as("_nx"))
    val my = cells.groupBy(col("_y").as("_myk")).agg(sum(col("_nxy")).as("_ny"))
    val tot = cells.agg(sum(col("_nxy")).as("_n"), count(lit(1)).as("cells"))
    // null-safe joins: a NULL category is a real category (the DuckDB
    // twin joins IS NOT DISTINCT FROM)
    val j = cells
      .join(mx, col("_x") <=> col("_mxk"))
      .join(my, col("_y") <=> col("_myk"))
      .crossJoin(broadcast(tot))
    def d(c: org.apache.spark.sql.Column) = c.cast("double")
    val miCell = floor(d(col("_nxy")) *
      log2(d(col("_nxy")) * d(col("_n")) / (d(col("_nx")) * d(col("_ny")))) *
      lit(S)).cast("long")
    val hxCell = floor(d(col("_nxy")) * log2(d(col("_n")) / d(col("_nx"))) * lit(S)).cast("long")
    val hyCell = floor(d(col("_nxy")) * log2(d(col("_n")) / d(col("_ny"))) * lit(S)).cast("long")
    val agg = j.agg(
      first(col("_n")).as("n"), first(col("cells")).as("cells"),
      sum(miCell).as("_smi"), sum(hxCell).as("_shx"), sum(hyCell).as("_shy"))
    val den = d(col("n")) * lit(S.toDouble)
    agg.select(
      col("n"), col("cells"),
      round(d(col("_smi")) / den, 6).as("mi_bits"),
      round(d(col("_shx")) / den, 6).as("h_x"),
      round(d(col("_shy")) / den, 6).as("h_y"),
      when(col("_shx") > 0L && col("_shy") > 0L,
        round(d(col("_smi")) / sqrt(d(col("_shx")) * d(col("_shy"))), 6))
        .as("nmi"))
  }

  // ---- DuckDB twin (identical floor-scaled contributions) ----

  def sql(table: String): String =
    s"""WITH _mic AS (SELECT $xCol AS x, $yCol AS y, count(*) AS nxy
       |  FROM $table GROUP BY 1, 2),
       |_mix AS (SELECT x, sum(nxy) AS nx FROM _mic GROUP BY x),
       |_miy AS (SELECT y, sum(nxy) AS ny FROM _mic GROUP BY y),
       |_mit AS (SELECT sum(nxy) AS n, count(*) AS cells FROM _mic),
       |_mij AS (SELECT c.nxy, x.nx, y.ny, t.n, t.cells
       |  FROM _mic c JOIN _mix x ON (c.x IS NOT DISTINCT FROM x.x)
       |  JOIN _miy y ON (c.y IS NOT DISTINCT FROM y.y) CROSS JOIN _mit t),
       |_mia AS (SELECT first(n) AS n, first(cells) AS cells,
       |    sum(CAST(floor(CAST(nxy AS DOUBLE) * log2(CAST(nxy AS DOUBLE) * CAST(n AS DOUBLE)
       |      / (CAST(nx AS DOUBLE) * CAST(ny AS DOUBLE))) * $S) AS BIGINT)) AS smi,
       |    sum(CAST(floor(CAST(nxy AS DOUBLE) * log2(CAST(n AS DOUBLE) / CAST(nx AS DOUBLE)) * $S) AS BIGINT)) AS shx,
       |    sum(CAST(floor(CAST(nxy AS DOUBLE) * log2(CAST(n AS DOUBLE) / CAST(ny AS DOUBLE)) * $S) AS BIGINT)) AS shy
       |  FROM _mij)
       |SELECT CAST(n AS BIGINT) AS n, CAST(cells AS BIGINT) AS cells,
       |  round(CAST(smi AS DOUBLE) / (CAST(n AS DOUBLE) * $S.0), 6) AS mi_bits,
       |  round(CAST(shx AS DOUBLE) / (CAST(n AS DOUBLE) * $S.0), 6) AS h_x,
       |  round(CAST(shy AS DOUBLE) / (CAST(n AS DOUBLE) * $S.0), 6) AS h_y,
       |  CASE WHEN shx > 0 AND shy > 0 THEN
       |    round(CAST(smi AS DOUBLE) / sqrt(CAST(shx AS DOUBLE) * CAST(shy AS DOUBLE)), 6)
       |  END AS nmi
       |FROM _mia""".stripMargin
}
