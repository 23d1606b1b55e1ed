package graft.operators.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Whole-graph degree statistics + degree assortativity for a directed
  * edge list — the one-row health report read BEFORE running PageRank/
  * LPA/triangles on a crawl graph: hub concentration (max degrees),
  * density (avg degree), and whether high-degree hosts link to each
  * other (assortativity r > 0) or to the periphery (r < 0, the usual
  * web shape). Assortativity is the Pearson correlation of
  * (total-degree(src), total-degree(dst)) over edges (Newman 2002,
  * directed edges as observation pairs).
  *
  * Exactness: degree counts are exact BIGINTs from ONE tagged-union
  * groupBy (out/in/total in the same pass); the moment sums ride
  * decimal(38,0) (Long Σd² overflows past ~10⁹ edges of degree ~10⁶;
  * the DuckDB twin uses HUGEINT); r is a fixed-shape double over those
  * exact sums.
  *
  * Scale shape: one node-keyed exchange for degrees, two edge joins to
  * attach endpoint degrees (shuffle-hash on the edge key — same shape
  * as any edge-attribute join), one partial-aggregated moment pass.
  * No windows, no driver collections.
  */
final class DegreeStats(srcCol: String = "src", dstCol: String = "dst") {

  val name = "graph_degree_stats"

  /** One row: `(n_nodes, n_edges, max_out_degree, max_in_degree,
    * avg_degree, assortativity)`. `avg_degree` is total degree per node
    * (2·e/n for the symmetrized view of a directed graph). Assortativity
    * is NULL when either endpoint's degree is constant over edges (zero
    * variance — e.g. a regular graph).
    */
  def apply(edges: DataFrame): DataFrame = {
    val e = edges.select(col(srcCol).as("_s"), col(dstCol).as("_d"))
    val tagged = e.select(col("_s").as("node"), lit(1L).as("_o"))
      .unionAll(e.select(col("_d").as("node"), lit(0L).as("_o")))
    val deg = tagged.groupBy(col("node")).agg(
      sum(col("_o")).as("outd"),
      sum(lit(1L) - col("_o")).as("ind"),
      count(lit(1)).as("totd"))
    val nodeStats = deg.agg(
      count(lit(1)).as("n_nodes"),
      max(col("outd")).as("max_out_degree"),
      max(col("ind")).as("max_in_degree"),
      sum(col("totd")).as("_degsum"))
    val dx = deg.select(col("node").as("_nx"), col("totd").as("_dx"))
    val dy = deg.select(col("node").as("_ny"), col("totd").as("_dy"))
    def d38(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
    val moments = e
      .join(dx, col("_s") === col("_nx"))
      .join(dy, col("_d") === col("_ny"))
      .agg(
        count(lit(1)).as("n_edges"),
        sum(d38(col("_dx"))).as("_sx"),
        sum(d38(col("_dy"))).as("_sy"),
        sum(d38(col("_dx")) * d38(col("_dx"))).as("_sxx"),
        sum(d38(col("_dy")) * d38(col("_dy"))).as("_syy"),
        sum(d38(col("_dx")) * d38(col("_dy"))).as("_sxy"))
    val ne = d38(col("n_edges"))
    val varX = ne * col("_sxx") - col("_sx") * col("_sx")
    val varY = ne * col("_syy") - col("_sy") * col("_sy")
    val cov = ne * col("_sxy") - col("_sx") * col("_sy")
    nodeStats.crossJoin(moments).select(
      col("n_nodes"), col("n_edges"),
      col("max_out_degree"), col("max_in_degree"),
      when(col("n_nodes") > 0L,
        round(col("_degsum").cast("double") / col("n_nodes").cast("double"), 4))
        .as("avg_degree"),
      when(varX > 0 && varY > 0,
        round(cov.cast("double") /
          sqrt(varX.cast("double") * varY.cast("double")), 6))
        .as("assortativity"))
  }

  // ---- DuckDB twin (HUGEINT moment sums, same shapes) ----

  /** `edgesSql` must expose `(src, dst)`. */
  def sql(edgesSql: String): String =
    s"""WITH _gde AS (SELECT $srcCol AS s, $dstCol AS d FROM ($edgesSql)),
       |_gdt AS (SELECT s AS node, 1 AS o FROM _gde
       |  UNION ALL SELECT d AS node, 0 AS o FROM _gde),
       |_gdd AS (SELECT node, CAST(sum(o) AS BIGINT) AS outd,
       |    CAST(sum(1 - o) AS BIGINT) AS ind, count(*) AS totd
       |  FROM _gdt GROUP BY node),
       |_gdn AS (SELECT count(*) AS n_nodes, max(outd) AS max_out_degree,
       |    max(ind) AS max_in_degree, sum(totd) AS degsum FROM _gdd),
       |_gdm AS (SELECT count(*) AS n_edges,
       |    sum(CAST(x.totd AS HUGEINT)) AS sx,
       |    sum(CAST(y.totd AS HUGEINT)) AS sy,
       |    sum(CAST(x.totd AS HUGEINT) * CAST(x.totd AS HUGEINT)) AS sxx,
       |    sum(CAST(y.totd AS HUGEINT) * CAST(y.totd AS HUGEINT)) AS syy,
       |    sum(CAST(x.totd AS HUGEINT) * CAST(y.totd AS HUGEINT)) AS sxy
       |  FROM _gde e JOIN _gdd x ON e.s = x.node JOIN _gdd y ON e.d = y.node)
       |SELECT CAST(n_nodes AS BIGINT) AS n_nodes,
       |  CAST(n_edges AS BIGINT) AS n_edges,
       |  max_out_degree, max_in_degree,
       |  CASE WHEN n_nodes > 0
       |    THEN round(CAST(degsum AS DOUBLE) / CAST(n_nodes AS DOUBLE), 4) END AS avg_degree,
       |  CASE WHEN (CAST(n_edges AS HUGEINT) * sxx - sx * sx) > 0
       |      AND (CAST(n_edges AS HUGEINT) * syy - sy * sy) > 0
       |    THEN round(CAST(CAST(n_edges AS HUGEINT) * sxy - sx * sy AS DOUBLE)
       |      / sqrt(CAST(CAST(n_edges AS HUGEINT) * sxx - sx * sx AS DOUBLE)
       |        * CAST(CAST(n_edges AS HUGEINT) * syy - sy * sy AS DOUBLE)), 6) END
       |    AS assortativity
       |FROM _gdn CROSS JOIN _gdm""".stripMargin
}
