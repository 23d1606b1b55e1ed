package graft.operators.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Synchronous weighted label propagation (Raghavan et al. 2007) —
  * community detection over the host link graph: every node starts as
  * its own label; each round a node adopts the label with the highest
  * incident edge weight among its neighbors (ties to the SMALLEST
  * label, which is what makes the sync update deterministic and
  * cross-engine reproducible — the async/random variant of the paper
  * trades determinism for convergence speed and cannot be
  * oracle-checked). Communities emerge where [[ConnectedComponents]]
  * would merge everything reachable: LPA respects edge density, CC only
  * reachability — template-farm hosts collapse into one dense community
  * while a single stray link doesn't fuse two organic clusters.
  *
  * Scale shape: per round, one join of edges⋈labels on src (labels are
  * `(id, lbl)` pairs — nothing wider rides the exchange) and one
  * two-level argmax on dst (`groupBy(dst, lbl).sum` partial-aggregates
  * map-side, then `max_by` per dst). Same localCheckpoint-per-round +
  * explicit block release discipline as [[FixedPointPageRank]].
  */
final class LabelPropagation(
    srcCol: String = "src",
    dstCol: String = "dst",
    weightCol: String = "n",
    iterations: Int = 4) {

  require(iterations >= 1, s"iterations must be >= 1, got $iterations")

  /** `(id, community)` for every node of the UNDIRECTED graph (edges
    * are symmetrized; parallel edges' weights add).
    */
  def communities(edges: DataFrame): DataFrame = {
    val fwd = edges.select(col(srcCol).as("_s"), col(dstCol).as("_d"), col(weightCol).as("_w"))
    // hash-partitioned by the loop's join key before the checkpoint —
    // localCheckpoint captures outputPartitioning, so each round's
    // edges⋈labels join reuses this distribution instead of
    // re-shuffling the symmetrized edge table (the graph's dominant
    // bytes) every round; the FixedPointPageRank discipline
    val sym = fwd.unionAll(fwd.select(col("_d").as("_s"), col("_s").as("_d"), col("_w")))
      .groupBy(col("_s"), col("_d")).agg(sum(col("_w")).as("_w"))
      .repartition(col("_s"))
      .localCheckpoint(true)
    var labels = sym.select(col("_s").as("id")).distinct()
      .select(col("id"), col("id").as("lbl"))
      .localCheckpoint(true)
    var i = 0
    while (i < iterations) {
      val byLabel = sym.join(labels, sym("_s") === labels("id"))
        .groupBy(col("_d"), col("lbl")).agg(sum(col("_w")).as("_c"))
      val winner = byLabel.groupBy(col("_d"))
        // max weight, tie → smallest label: struct max on (_c, negated
        // label rank). Labels are strings here, so invert via a
        // descending-orderable key: max_by twice is wrong — use min_by
        // over (negated count, label) instead
        .agg(min_by(col("lbl"), struct((-col("_c")).as("_nc"), col("lbl"))).as("_new"))
      val next = labels.join(winner, labels("id") === winner("_d"), "left")
        .select(col("id"), coalesce(col("_new"), col("lbl")).as("lbl"))
        .localCheckpoint(true)
      IterativeGraph.releaseCheckpoint(labels)
      labels = next
      i += 1
    }
    val out = labels.select(col("id"), col("lbl").as("community"))
    IterativeGraph.releaseCheckpoint(sym)
    out
  }

  /** DuckDB twin: unrolled iterations over `edgesCte` exposing
    * `(src, dst, n)`; final member `_lp$iterations` holds
    * `(id, community)` as `(id, lbl)`.
    */
  def sqlCte(edgesCte: String): String = {
    val head =
      s"""_lp_fwd AS (SELECT $srcCol AS s, $dstCol AS d, $weightCol AS w FROM ($edgesCte)),
         |_lp_edges AS (SELECT s, d, sum(w) AS w FROM (
         |  SELECT s, d, w FROM _lp_fwd
         |  UNION ALL SELECT d AS s, s AS d, w FROM _lp_fwd) GROUP BY s, d),
         |_lp0 AS (SELECT DISTINCT s AS id, s AS lbl FROM _lp_edges)""".stripMargin
    val iters = (1 to iterations).map { i =>
      s"""_lp${i}_c AS (SELECT e.d, l.lbl, sum(e.w) AS c
         |  FROM _lp_edges e JOIN _lp${i - 1} l ON e.s = l.id GROUP BY e.d, l.lbl),
         |_lp${i}_w AS (SELECT d, lbl FROM (
         |  SELECT d, lbl, row_number() OVER (PARTITION BY d ORDER BY c DESC, lbl ASC) AS rn
         |  FROM _lp${i}_c) WHERE rn = 1),
         |_lp$i AS (SELECT p.id, coalesce(w.lbl, p.lbl) AS lbl
         |  FROM _lp${i - 1} p LEFT JOIN _lp${i}_w w ON w.d = p.id)""".stripMargin
    }
    (head +: iters).mkString(",\n")
  }
}

/** Shared lineage discipline for iterative graph loops. */
object IterativeGraph {

  /** Release the block a `localCheckpoint` pinned — `DataFrame.unpersist`
    * is a no-op for these (the persist lives on the LogicalRDD's backing
    * RDD, not in the CacheManager).
    */
  def releaseCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed.collectFirst {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
    }.foreach(_.unpersist(false))
}
