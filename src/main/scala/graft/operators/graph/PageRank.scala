package graft.operators.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-point PageRank over an edge table — the link-authority score a
  * CommonCrawl-scale pipeline hangs URL/domain quality on (the
  * RefinedWeb/Gopher URL filters rank domains; PageRank is the classic
  * graph-side counterpart). Iterative joins, the standard Spark shape
  * (GraphX's Pregel computes the same recurrence).
  *
  * INTEGER arithmetic throughout — the whole point of the "fixed-point"
  * in the name: ranks are scaled longs (`scale` = one unit of mass),
  * per-edge contributions are `rank DIV outdeg`, damping is
  * `base + (dampNum · Σcontrib) DIV dampDen`. Long sums are exact and
  * order-invariant where double sums are not (a parallel `sum(DOUBLE)`
  * depends on partition merge order), so two engines — or two cluster
  * topologies — produce bit-identical ranks, which is what lets the
  * DuckDB oracle unroll the same iterations and hash-match. The
  * truncation mass lost to integer division (< 1 unit per edge per
  * iteration, ~1e-6 of a rank at the default scale) is the price;
  * dangling-node mass is dropped the same way (documented classic
  * variant).
  *
  * Scale shape: `edges ⋈ ranks` shuffles on `src` each iteration and
  * the contribution aggregate shuffles on `dst` — 2 exchanges per
  * iteration, nothing wider than `(long, long)` on the wire. The
  * out-degree join is precomputed ONCE outside the loop. Each
  * iteration's ranks are eagerly localCheckpointed and the previous
  * iteration released (the ConnectedComponents lineage discipline).
  */
final class FixedPointPageRank(
    srcCol: String = "src",
    dstCol: String = "dst",
    iterations: Int = 5,
    scale: Long = 1000000L,
    dampNum: Long = 85L,
    dampDen: Long = 100L) {

  require(iterations >= 1 && scale >= 1 && dampNum >= 0 && dampDen > dampNum)

  private val base = (scale * (dampDen - dampNum)) / dampDen

  /** `(id, rank_scaled)` after `iterations` rounds from a uniform
    * `scale` start, for every node in `nodes` (single `id` column).
    */
  def ranks(nodes: DataFrame, edges: DataFrame): DataFrame = {
    val outdeg = edges.groupBy(col(srcCol)).agg(count(lit(1)).as("_od"))
    // (src, dst, od) once — the loop never recomputes degrees.
    // HASH-PARTITIONED BY THE LOOP'S JOIN KEY before the checkpoint:
    // localCheckpoint captures the physical plan's outputPartitioning
    // into the LogicalRDD, so every iteration's edges⋈ranks join sees
    // the edge table already distributed by src and exchanges ONLY the
    // (id, rank) side — without this the FULL edge table (the graph's
    // dominant bytes) re-shuffled every round (guide §2.4: establish a
    // partitioning once, reuse it across the loop).
    val edgesOut = edges.select(col(srcCol), col(dstCol))
      .join(outdeg, srcCol).repartition(col(srcCol)).localCheckpoint(true)
    // nodes likewise: partitioned by id once, reused by every round's
    // left join (and the rank frames inherit hash(id) through the join
    // output, so the ranks side of BOTH joins stays exchange-free too)
    val nodesP = nodes.select(col("id")).repartition(col("id"))
      .localCheckpoint(true)
    var ranks = nodesP.select(col("id"), lit(scale).as("rank_scaled"))
      .localCheckpoint(true)
    var i = 0
    while (i < iterations) {
      val contrib = edgesOut
        .join(ranks, edgesOut(srcCol) === ranks("id"))
        // integer DIV, not `/`: Spark's `/` on longs is DOUBLE division,
        // whose round-then-truncate can disagree with exact integer
        // quotients — the determinism this operator exists for
        .select(col(dstCol).as("_to"), expr("rank_scaled DIV _od").as("_c"))
        .groupBy(col("_to")).agg(sum(col("_c")).as("_cs"))
      val next = nodesP
        .join(contrib, nodesP("id") === contrib("_to"), "left")
        .select(col("id"),
          (lit(base) + expr(s"($dampNum * coalesce(_cs, CAST(0 AS BIGINT))) DIV $dampDen"))
            .as("rank_scaled"))
        .localCheckpoint(true)
      // DataFrame.unpersist is a no-op for a localCheckpoint (the
      // persist lives on the LogicalRDD's internal RDD, not in the
      // CacheManager) — release the block explicitly or every
      // iteration's ranks pin executor memory until a GC lets the
      // ContextCleaner find them
      IterativeGraph.releaseCheckpoint(ranks)
      ranks = next
      i += 1
    }
    // the returned ranks are eagerly materialized — the loop inputs'
    // blocks can release now instead of pinning memory until GC
    IterativeGraph.releaseCheckpoint(edgesOut)
    IterativeGraph.releaseCheckpoint(nodesP)
    ranks
  }

  /** DuckDB twin: CTE chain unrolling the same integer recurrence;
    * the final member `_pr$iterations` holds `(id, rank_scaled)`.
    * `nodesSql`/`edgesSql` must project `id` / `(src, dst)`.
    */
  def sqlCte(nodesSql: String, edgesSql: String): String = {
    val head =
      s"""_pr_nodes AS (SELECT id FROM ($nodesSql)),
         |_pr_edges AS (SELECT $srcCol AS src, $dstCol AS dst FROM ($edgesSql)),
         |_pr_od AS (SELECT src, count(*) AS od FROM _pr_edges GROUP BY 1),
         |_pr0 AS (SELECT id, CAST($scale AS BIGINT) AS rk FROM _pr_nodes)""".stripMargin
    val iters = (1 to iterations).map { i =>
      s"""_pr$i AS (SELECT n.id,
         |    CAST($base + ($dampNum * coalesce(s.cs, 0)) // $dampDen AS BIGINT) AS rk
         |  FROM _pr_nodes n LEFT JOIN (
         |    SELECT e.dst AS id, sum(r.rk // o.od) AS cs
         |    FROM _pr_edges e
         |    JOIN _pr${i - 1} r ON e.src = r.id
         |    JOIN _pr_od o ON e.src = o.src
         |    GROUP BY 1) s ON n.id = s.id)""".stripMargin
    }
    (head +: iters).mkString(",\n")
  }
}
