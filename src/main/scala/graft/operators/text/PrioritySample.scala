package graft.operators.text

import graft.functions.HashFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Weighted sampling WITHOUT replacement as a distributed top-k: priority
  * sampling (Duffield–Lund–Thorup, JACM 2007). Each row gets priority
  * `q_i = w_i / u_i` with `u_i` a per-row uniform in (0, 1]; the sample is
  * the k rows of largest priority. Rows with weight w are included with
  * probability ≈ min(1, w/τ) (τ the (k+1)-th priority), so long documents
  * (token-weighted mixes) are kept proportionally to their token mass —
  * the per-ROW counterpart of [[TokenBudgetSample]]'s per-source budgets.
  *
  * Determinism/portability: `u_i` derives from the portable/xxhash64 hash
  * of `(id, salt)`, and the priority is the EXACT integer
  * `w * 2^40 div (h40 + 1)` (h40 = top 40 bits of the row hash) — pure
  * 64-bit integer arithmetic, no ln/exp/double anywhere, so both engines
  * rank identically with zero ulp risk. Ties (prob ~2^-40) break by id.
  * Overflow contract: requires `w <= 2^22` (4.2M — far above any
  * token/char count per document; enforced by clamping, documented) so
  * `w * 2^40 < 2^62`.
  *
  * Scale shape: the top-k rides Spark's distributed
  * `TakeOrderedAndProject` (per-partition heaps, k rows per partition to
  * the driver-side merge — never a global sort). k must be
  * driver-materializable, which a sample-size always is.
  */
final class PrioritySample(
    idCol: String,
    weightCol: String,
    k: Int,
    hashName: String = "xxhash64",
    salt: String = "") {

  val name = "priority_sample"
  require(k > 0, "sample size must be positive")

  private val WMax = 1L << 22
  private val Shift = 1L << 40

  /** Top-k by exact integer priority. Output: `(id, weight, priority)`
    * ordered by (priority desc, id). Zero/negative/null weights sort last
    * (priority 0) — they are sampled only when fewer than k positive rows
    * exist.
    */
  def apply(df: DataFrame): DataFrame = {
    val h = HashFunctions.hashByName(hashName)(
      concat(col(idCol).cast("string"), lit(salt)))
    // 40 uniform bits of the 60/64-bit hash (bits 13..52), in [0, 2^40)
    val h40 = pmod(shiftright(h, 13), lit(Shift))
    val w = least(greatest(coalesce(col(weightCol).cast("long"), lit(0L)), lit(0L)), lit(WMax))
    df.select(
        col(idCol).as("id"),
        col(weightCol).cast("long").as("weight"),
        h40.as("_h40"), w.as("_w"))
      // `div` (IntegralDivide) — `/` would go through DOUBLE and lose
      // exactness past 2^53
      .selectExpr("id", "weight", s"(_w * ${Shift}L) div (_h40 + 1L) AS priority")
      .orderBy(col("priority").desc, col("id"))
      .limit(k)
  }

  /** DuckDB twin — same integer priority, same order, same k. */
  def sql(table: String, idExpr: String, weightExpr: String): String = {
    require(hashName == "portable", "oracle covers the portable hash family")
    val h = HashFunctions.portableHash64Sql(s"CAST($idExpr AS VARCHAR) || '$salt'")
    // pmod twin: the portable hash is non-negative already, >>13 keeps it so
    val h40 = s"(($h >> 13) % $Shift)"
    val w = s"least(greatest(coalesce(CAST($weightExpr AS BIGINT), 0), 0), $WMax)"
    s"""SELECT $idExpr AS id, CAST($weightExpr AS BIGINT) AS weight,
       |  CAST(($w * $Shift) // ($h40 + 1) AS BIGINT) AS priority
       |FROM $table
       |ORDER BY priority DESC, id LIMIT $k""".stripMargin
  }
}
