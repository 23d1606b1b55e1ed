package graft.operators.vector

import graft.functions.VectorFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cross-snapshot SEMANTIC dedup — the vector twin of the exact and
  * minhash incremental deduplicators: an increment row drops when the
  * frozen prior corpus holds a vector with cosine ≥ `threshold`, found
  * through a shared random-hyperplane bucket. This is the "don't
  * re-ingest what last month's crawl already contributed, even
  * reworded" primitive once documents live in embedding space.
  *
  * Candidate generation is the [[EmbeddingSimHash]] signature (Charikar
  * hyperplane LSH, plan-time-literal planes): both sides compute an
  * 8-byte signature per row — stateless, no fit step, and (unlike the
  * k-means bucketing) fully recomputable by the DuckDB oracle, so the
  * GATE covers the bucketing itself, not just the verify. Equal
  * signatures join, one exact cosine verifies. Recall is the standard
  * LSH trade: near-pairs split across buckets are missed; lower `bits`
  * for recall, raise it for a tighter candidate set.
  *
  * Scale shape: the prior corpus never rescans — signatures are
  * computed per-row on both sides and the only exchange is the
  * signature equi-join (AQE skew-splits a hot bucket). Vectors ride
  * that exchange for the verify — bound their width with
  * [[MatryoshkaTruncate]]/[[RandomProjection]] upstream if dims are
  * large.
  */
final class IncrementalEmbeddingDedup(
    prior: Option[DataFrame],
    vecCol: String = "embedding",
    idCol: String = "id",
    threshold: Double = 0.95,
    bits: Int = 8,
    dims: Int = 64,
    seed: Long = 7L,
    priorMaxBucketSize: Option[Int] = None) {

  require(priorMaxBucketSize.forall(_ >= 1),
    s"priorMaxBucketSize must be >= 1 when set, got $priorMaxBucketSize")

  private val esh = new EmbeddingSimHash(vecCol, idCol, idCol, bits, dims, seed)

  val name = "incremental_embedding_dedup"

  private def signed(df: DataFrame, sideIdCol: String): DataFrame =
    df.select(col(idCol).as(sideIdCol), col(vecCol).as(s"_v_$sideIdCol"),
      esh.signature(col(vecCol)).as("_sig"))

  /** Increment rows with NO verified near-dup in the prior corpus.
    *
    * `priorMaxBucketSize` (r17) is the prior-side hot-bucket guard: a
    * prior duplicate FAMILY shares one signature, so the accumulated
    * snapshot's duplicate mass is exactly where a signature bucket
    * goes hot and every colliding increment row pays the family-sized
    * verification scan. Over-cap prior buckets drop via a count-only
    * broadcast anti-join (the [[graft.operators.dedup.MinHashLSHDedup]]
    * discipline — counts on the wire, never a vector-carrying exchange
    * keyed on the hot signature).
    */
  def apply(inc: DataFrame): DataFrame = prior match {
    case None => inc
    case Some(pr) =>
      val psigned0 = signed(pr, "_pid")
      val psigned = priorMaxBucketSize match {
        case None => psigned0
        case Some(cap) =>
          val hot = psigned0.select(col("_sig"))
            .groupBy(col("_sig")).agg(count(lit(1)).as("_bn"))
            .filter(col("_bn") > cap).select(col("_sig"))
          psigned0.join(broadcast(hot), Seq("_sig"), "left_anti")
      }
      val hits = signed(inc, "_iid").join(psigned, Seq("_sig"))
        .filter(VectorFunctions.cosine(col("_v__iid"), col("_v__pid")) >= threshold)
        .select(col("_iid").as(idCol)).distinct()
      inc.join(hits, Seq(idCol), "left_anti")
  }

  /** DuckDB twin returning kept increment ids. */
  def keepSql(incTable: String, priorSql: String): String = {
    val sig = esh.signatureSql(vecCol)
    val cap = priorMaxBucketSize.map(c =>
      s"\n  QUALIFY count(*) OVER (PARTITION BY sig) <= $c").getOrElse("")
    s"""WITH _ied_pr AS (SELECT $idCol AS pid, $vecCol AS pv, $sig AS sig
       |  FROM ($priorSql)$cap),
       |_ied_inc AS (SELECT $idCol AS iid, $vecCol AS iv, $sig AS sig
       |  FROM $incTable),
       |_ied_hit AS (SELECT DISTINCT iid FROM _ied_inc i JOIN _ied_pr p USING (sig)
       |  WHERE ${VectorFunctions.cosineSql("i.iv", "p.pv")} >= $threshold)
       |SELECT $idCol FROM $incTable
       |WHERE $idCol NOT IN (SELECT iid FROM _ied_hit)
       |ORDER BY $idCol""".stripMargin
  }
}
