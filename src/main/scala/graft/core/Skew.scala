package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Explicit key salting for skewed equi-joins. AQE's skew-join handles
  * most hot keys at runtime (enabled in GraftSession) by splitting
  * oversized partitions, but it cannot split a single mega-key whose
  * matching build-side rows must co-locate; salting can: the skewed side
  * gets a salt in [0, salts), the other side is replicated `salts` times,
  * and the join key becomes (key, salt) — same result set, hot key spread
  * over `salts` tasks. Cost: the non-skewed side is duplicated `salts`×,
  * so keep it the smaller input.
  */
object Skew {

  def saltedJoin(skewed: DataFrame, other: DataFrame, key: String,
      salts: Int, joinType: String = "inner"): DataFrame = {
    require(salts >= 1)
    // deterministic spread: salt from a hash of the whole row's key plus
    // a per-row ordinal, cheap and uniform
    val salted = skewed.withColumn("_skew_salt",
      pmod(xxhash64(col(key), monotonically_increasing_id()), lit(salts.toLong)).cast("int"))
    val replicated = other.withColumn("_skew_salt",
      explode(array((0 until salts).map(lit): _*)))
    salted.join(replicated, Seq(key, "_skew_salt"), joinType).drop("_skew_salt")
  }
}
