package graft.operators.ml

import graft.functions.TextFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Class-based TF-IDF (the BERTopic labeling step): given documents
  * already carrying a cluster assignment (k-means buckets, LPA
  * communities, curriculum tiers…), surface the terms that CHARACTERIZE
  * each cluster — treat each cluster as one pseudo-document, score
  * `tf_{t,c} · ln(1 + A / f_t)` (tf = term count in the cluster, f_t =
  * corpus-wide term count, A = average cluster token mass), and keep the
  * top-N terms per cluster. This is the "name the semantic-dedup
  * buckets" report a curation run publishes next to
  * [[ClusterSilhouette]]'s tightness numbers.
  *
  * Exactness: tf and f_t are exact BIGINTs; A is one fixed-shape double;
  * the score is floor-scaled to a BIGINT (`floor(score·10⁶)`) BEFORE
  * ranking so rank order never hinges on a sub-ulp `ln` disagreement
  * between engines (the floor-scaled-OLS discipline), with ties broken
  * by term.
  *
  * Scale shape: one (cluster, term) partial aggregate off the exploded
  * tokens (the only corpus-sized shuffle), one vocab-sized term
  * aggregate for f_t, scalar totals broadcast back, and the top-N window
  * partitions BY CLUSTER (per-cluster vocab partitions — never a global
  * single-partition window).
  */
final class ClusterTopTerms(
    textCol: String,
    clusterCol: String,
    topN: Int = 5,
    scale: Double = 1e6) {

  val name = "cluster_top_terms"
  require(topN >= 1, "topN must be positive")

  /** `(cluster_id, rank, term, tf, score_scaled)` — topN terms per
    * cluster ordered by (cluster, rank).
    */
  def apply(df: DataFrame): DataFrame = {
    val toks = df.select(col(clusterCol).as("_c"),
        explode(TextFunctions.tokensOf(col(textCol))).as("_t"))
    // the (cluster, term) aggregate is vocab-sized (≪ corpus) and fans
    // out to THREE consumers (f_t, totals, scoring join) — checkpoint it
    // once or each consumer re-tokenizes the corpus (per-consumer column
    // pruning defeats exchange reuse; the psiPerGroup lesson)
    val tfc = graft.core.Staging.stage(
      toks.groupBy(col("_c"), col("_t")).agg(count(lit(1)).as("tf")))
    val ft = tfc.groupBy(col("_t")).agg(sum(col("tf")).as("_ft"))
    val totals = tfc.agg(
      sum(col("tf")).as("_total"),
      countDistinct(col("_c")).as("_k"))
    val scored = tfc.join(ft, "_t").crossJoin(totals)
      .withColumn("_a", col("_total").cast("double") / col("_k").cast("double"))
      .withColumn("score_scaled",
        floor(col("tf").cast("double") *
          log(lit(1.0) + col("_a") / col("_ft").cast("double")) * lit(scale))
          .cast("long"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("_c"))
      .orderBy(col("score_scaled").desc, col("_t"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topN)
      .select(col("_c").as("cluster_id"), col("rank"),
        col("_t").as("term"), col("tf"), col("score_scaled"))
      .orderBy(col("cluster_id"), col("rank"))
  }

  // ---- DuckDB twin (same floor-scaled score, same window) ----

  /** `table` must expose `$textCol` and `$clusterCol`. */
  def sql(table: String): String = {
    val toks = TextFunctions.tokensOfSql(textCol)
    s"""WITH _ctt AS (SELECT $clusterCol AS c, unnest($toks) AS t FROM $table),
       |_ctf AS (SELECT c, t, count(*) AS tf FROM _ctt GROUP BY c, t),
       |_cft AS (SELECT t, sum(tf) AS ft FROM _ctf GROUP BY t),
       |_cto AS (SELECT sum(tf) AS total, count(DISTINCT c) AS k FROM _ctf),
       |_cs AS (SELECT f.c, f.t, f.tf,
       |    CAST(floor(CAST(f.tf AS DOUBLE)
       |      * ln(1.0 + (CAST(o.total AS DOUBLE) / CAST(o.k AS DOUBLE))
       |        / CAST(g.ft AS DOUBLE)) * $scale) AS BIGINT) AS score_scaled
       |  FROM _ctf f JOIN _cft g ON f.t = g.t CROSS JOIN _cto o),
       |_cr AS (SELECT c, t, tf, score_scaled,
       |    row_number() OVER (PARTITION BY c
       |      ORDER BY score_scaled DESC, t) AS rank
       |  FROM _cs)
       |SELECT c AS cluster_id, CAST(rank AS INTEGER) AS rank, t AS term,
       |  CAST(tf AS BIGINT) AS tf, score_scaled
       |FROM _cr WHERE rank <= $topN ORDER BY cluster_id, rank""".stripMargin
  }
}
