package graft.core

import graft.functions.{BloomSketch, HashFunctions}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Semi join with an ADAPTIVE runtime bloom prune — the production
  * wrapper around [[graft.functions.BloomSketch]] that decides whether
  * the sketch earns its keep before applying it.
  *
  * The prune's win condition is a NETWORK one: build a sketch over the
  * dim keys, broadcast it, and drop non-matching fact rows BEFORE the
  * fact side's exchange, cutting shuffled bytes by ~|matches|/|fact|.
  * Its cost is a per-row probe (numHashes mixed-hash bit reads) over
  * the full fact scan. On a cluster the cut bytes dominate; in a
  * single JVM (or for a small fact side) there is no network and the
  * probe scan is pure overhead — measured on the round-12 probe leg at
  * 6M rows/local[32]: bloom 0.52 s vs plain 0.42 s even with the dim
  * staged. Hence the guard: below `minFactBytes` of estimated fact
  * plan size, this degrades to the plain semi join.
  *
  * Output is IDENTICAL either way (bloom membership never
  * false-negatives and the follow-up exact join removes false
  * positives), so the guard is a pure performance decision — pinned by
  * BloomSemiJoinSpec on both sides of the threshold.
  */
object BloomSemiJoin {

  /** Default threshold: ~1 GiB of fact-side plan estimate. Below this a
    * modern network moves the unpruned exchange in single-digit
    * seconds — the probe scan can't pay for itself.
    */
  val DefaultMinFactBytes: Long = 1L << 30

  /** Catalyst's size estimate for the frame's optimized plan. */
  def estimatedBytes(df: DataFrame): BigInt =
    df.queryExecution.optimizedPlan.stats.sizeInBytes

  /** The guard, exposed for tests and for callers that want to log the
    * decision: prune only when the fact side is estimated big enough.
    */
  def wouldPrune(fact: DataFrame, minFactBytes: Long): Boolean =
    estimatedBytes(fact) >= BigInt(minFactBytes)

  /** `fact LEFT SEMI JOIN dim ON factKey = dimKey`, bloom-pruned when
    * the fact side's estimated size clears `minFactBytes`. `numBits`
    * sizes the sketch (bits ≈ 10×|dim keys| gives ~1% false positives
    * at numHashes=4; the sketch rides a single broadcast row of
    * numBits/64 longs).
    */
  def apply(
      fact: DataFrame, dim: DataFrame,
      factKey: Column, dimKey: Column,
      numBits: Int = 1 << 20, numHashes: Int = 4,
      minFactBytes: Long = DefaultMinFactBytes): DataFrame = {
    val plain = fact.join(dim, factKey === dimKey, "left_semi")
    if (!wouldPrune(fact, minFactBytes)) plain
    else {
      // the sketch collects to the driver HERE (one row of numBits/64
      // longs — bounded by the knob, never the data; the same eager
      // bounded-collect discipline as centroid literals, and exactly
      // what Spark's own InjectRuntimeFilter does with its bloom
      // subquery). Embedding the bits beats cross-joining the one-row
      // sketch 25×: the joined form stamps the full bit array into
      // every probe row's UnsafeRow.
      val bits = dim.agg(BloomSketch.bloomSketch(
          HashFunctions.portableHash64(dimKey), numBits, numHashes).as("_bf"))
        .head().getSeq[Long](0).toArray
      val pruned = fact.where(BloomSketch.mightContainLit(bits,
        HashFunctions.portableHash64(factKey), numHashes))
      // exact join over survivors removes the sketch's false positives
      pruned.join(dim, factKey === dimKey, "left_semi")
    }
  }
}
