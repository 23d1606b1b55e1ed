package graft.operators.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over a duplicate-pair graph — the transitive-
  * closure upgrade to the pairwise near-dup operators (their scaladocs
  * document the pairwise tradeoff; this is the full-clustering option:
  * keep exactly the minimum id of every duplicate component).
  *
  * Algorithm: min-label propagation — each node repeatedly takes the
  * minimum label among itself and its neighbors until fixpoint (≤
  * component-diameter iterations, capped). Each iteration is one
  * shuffle-join Spark job; intermediate labels are cached and lineage is
  * kept flat, the standard iterative-graph pattern (GraphX CC is the
  * same computation). Duplicate components in dedup workloads are small
  * and shallow, so convergence is fast; the `maxIter` cap bounds runaway
  * graphs.
  */
object ConnectedComponents {

  /** (id, comp) for every node appearing in `pairs` (d1, d2 columns);
    * comp = minimum id reachable through the pair graph.
    */
  def assign(pairs: DataFrame, maxIter: Int = 20): DataFrame = {
    val edges = pairs.select(col("d1").as("a"), col("d2").as("b"))
      .union(pairs.select(col("d2").as("a"), col("d1").as("b")))
      .persist()
    var labels = edges.select(col("a").as("id")).distinct()
      .select(col("id"), col("id").as("comp"))
      .persist()
    var iter = 0
    var converged = false
    while (iter < maxIter && !converged) {
      val neighborMin = edges.join(labels, edges("b") === labels("id"))
        .groupBy(col("a")).agg(min(col("comp")).as("ncomp"))
      // convergence probe rides the same pass as the label update (an
      // observe on the change flag) — no extra join+count job per round
      val obs = org.apache.spark.sql.Observation()
      val next = labels.join(neighborMin, labels("id") === neighborMin("a"), "left")
        .select(labels("id"),
          least(labels("comp"), coalesce(col("ncomp"), labels("comp"))).as("comp"),
          (coalesce(col("ncomp"), labels("comp")) < labels("comp")).as("_chg"))
        .observe(obs, sum(when(col("_chg"), 1L).otherwise(0L)).as("chg"))
        .drop("_chg")
        .persist()
      next.count() // one job: materializes the cache and fills the observation
      val changed = obs.get("chg") match { case null => 0L; case n => n.asInstanceOf[Long] }
      labels.unpersist()
      labels = next
      converged = changed == 0
      iter += 1
    }
    // Sever the iterative lineage and RELEASE every loop cache before
    // returning: the raw `labels` plan is `iter` joins deep and pinned
    // its cache for the session's life (nobody downstream can know when
    // to unpersist a lazily-consumed operator output — the r8 ngram_lm
    // leak, same shape). The checkpoint is one flat, small table (only
    // nodes that appear in duplicate pairs) whose blocks live and die
    // with the consumer's plan under ContextCleaner. With a configured
    // checkpoint dir the copy is reliable (survives executor loss, the
    // GraphFrames-CC requirement); otherwise a local checkpoint — an
    // executor loss then fails-and-retries the operator, the standard
    // iterative-graph tradeoff.
    val flat =
      if (labels.sparkSession.sparkContext.getCheckpointDir.isDefined) labels.checkpoint(true)
      else labels.localCheckpoint(true)
    labels.unpersist()
    edges.unpersist()
    flat
  }

  /** DuckDB twin: recursive reachability, min over reached nodes. The
    * caller's WITH must be declared RECURSIVE; `pairsCte` must expose
    * (d1, d2).
    */
  def assignSql(pairsCte: String): String =
    s"""_edges AS (SELECT d1 AS a, d2 AS b FROM $pairsCte
       |  UNION SELECT d2, d1 FROM $pairsCte),
       |_reach(src, node) AS (
       |  SELECT a, a FROM _edges
       |  UNION
       |  SELECT r.src, e.b FROM _reach r JOIN _edges e ON r.node = e.a),
       |_comp AS (SELECT src AS id, min(node) AS comp FROM _reach GROUP BY src)""".stripMargin
}
