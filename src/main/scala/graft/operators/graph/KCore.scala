package graft.operators.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bounded-round k-core peeling over an undirected simple graph: each
  * round deletes every node whose CURRENT degree is below k, cascading
  * until `rounds` rounds have run (the k-core fixpoint needs at most
  * "longest peel chain" rounds; a bounded unroll is the same contract
  * as [[LabelPropagation]] — deterministic given `rounds`, and the
  * caller picks rounds like an LPA iteration count). The k-core is the
  * standard "dense nucleus" extractor for link graphs: spam farms and
  * template rings survive high-k cores while organic periphery peels
  * off.
  *
  * Scale shape: the edge list symmetrizes + dedups once (one exchange),
  * then each round is one degree groupBy + two semi-joins against the
  * surviving-node set — all keyed on node ids (longs on the wire), with
  * `localCheckpoint` per round to cut lineage (the [[IterativeGraph]]
  * discipline, released on exit). No windows, no driver collection.
  */
final class KCore(k: Int, rounds: Int,
    srcCol: String = "src", dstCol: String = "dst") {

  require(k >= 1 && rounds >= 1, "k and rounds must be positive")
  val name = "kcore"

  /** `(id, degree)` for nodes surviving `rounds` peels, with their
    * degree INSIDE the surviving subgraph, ordered by id.
    */
  def apply(edges: DataFrame): DataFrame = {
    val fwd = edges.select(col(srcCol).as("_s"), col(dstCol).as("_d"))
      .where(col("_s") =!= col("_d")) // self-loops never help a core
    var cur = fwd.unionAll(fwd.select(col("_d").as("_s"), col("_s").as("_d")))
      .distinct()
      .localCheckpoint(true)
    var i = 0
    while (i < rounds) {
      val keep = cur.groupBy(col("_s")).agg(count(lit(1)).as("_c"))
        .where(col("_c") >= k).select(col("_s").as("_keep"))
        .localCheckpoint(true)
      val next = cur
        .join(keep, cur("_s") === keep("_keep"), "left_semi")
        .join(keep, cur("_d") === keep("_keep"), "left_semi")
        .localCheckpoint(true)
      IterativeGraph.releaseCheckpoint(cur)
      IterativeGraph.releaseCheckpoint(keep)
      cur = next
      i += 1
    }
    val out = cur.groupBy(col("_s").as("id")).agg(count(lit(1)).as("degree"))
      .orderBy(col("id"))
    out
  }

  /** DuckDB twin: unrolled rounds over `edgesSql` exposing `(src, dst)`;
    * standalone SELECT.
    */
  def sql(edgesSql: String): String = {
    val head =
      s"""_kc_fwd AS (SELECT $srcCol AS s, $dstCol AS d FROM ($edgesSql) WHERE $srcCol <> $dstCol),
         |_kc0 AS (SELECT DISTINCT s, d FROM (
         |  SELECT s, d FROM _kc_fwd UNION ALL SELECT d AS s, s AS d FROM _kc_fwd))""".stripMargin
    val iters = (1 to rounds).map { i =>
      s"""_kc${i}_keep AS (SELECT s FROM _kc${i - 1} GROUP BY s HAVING count(*) >= $k),
         |_kc$i AS (SELECT e.s, e.d FROM _kc${i - 1} e
         |  JOIN _kc${i}_keep a ON e.s = a.s JOIN _kc${i}_keep b ON e.d = b.s)""".stripMargin
    }
    s"""WITH ${(head +: iters).mkString(",\n")}
       |SELECT s AS id, count(*) AS degree FROM _kc$rounds GROUP BY s ORDER BY id""".stripMargin
  }
}
