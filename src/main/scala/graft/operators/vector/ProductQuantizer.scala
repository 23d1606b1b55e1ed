package graft.operators.vector

import graft.core.Operator
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product quantization (Jégou, Douze & Schmid, "Product Quantization
  * for Nearest Neighbor Search", TPAMI 2011) — the memory-bound tier of
  * the ANN family: a d-dim vector becomes `numSubspaces` small codes
  * (argmin centroid per subspace), shrinking 64 floats to one packed
  * long here (256 B → 8 B), which is what lets a 10¹⁰-vector index fit
  * in RAM; queries then rank by asymmetric distance (ADC): the exact
  * query-to-centroid distance table is computed once per query and each
  * candidate costs `numSubspaces` table lookups, no float math.
  *
  * The codebook is NOT trained at runtime (resume-safety and oracle
  * parity forbid data-dependent constants — the [[RandomProjection]]
  * discipline): centroids come from a splitmix64 stream seeded by
  * (seed, subspace, centroid, dim), materialized as typed literals into
  * both engines; production would swap in k-means centroids per
  * subspace ([[graft.operators.ml.KMeansBuckets]] trains them) with
  * everything else unchanged. Argmin ties break to the smallest
  * centroid id via lexicographic struct-min in BOTH engines.
  *
  * Scale shape: encode is a stateless per-row map (no shuffle); ADC
  * top-k is one scan + `TakeOrderedAndProject` — the codes column is
  * the only thing read.
  */
final class ProductQuantizer(
    vecCol: String = "embedding",
    dims: Int = 64,
    numSubspaces: Int = 8,
    numCentroids: Int = 16,
    seed: Long = 23L,
    codeCol: String = "pq_code") extends Operator {

  require(dims % numSubspaces == 0, s"dims $dims not divisible by $numSubspaces")
  require(numCentroids >= 2 && numCentroids <= 256, s"numCentroids in [2,256]")
  require(math.pow(numCentroids, numSubspaces) <= math.pow(2, 62),
    "packed code must fit a signed long")

  val name = "pq_encode"
  private val dsub = dims / numSubspaces

  private def splitmix(x0: Long): Long = {
    var z = x0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  private def unit(x: Long): Double =
    ((x >>> 11).toDouble / (1L << 53).toDouble) * 2.0 - 1.0

  /** `codebook(m)(k)(i)` in [-1, 1), deterministic in (seed, m, k, i). */
  val codebook: Array[Array[Array[Double]]] =
    Array.tabulate(numSubspaces, numCentroids, dsub) { (m, k, i) =>
      unit(splitmix(seed + ((m * 131L + k) * 65537L + i)))
    }

  /** Squared L2 of subvector m against centroid (m, k): the
    * left-to-right double fold both engines share.
    */
  private def distExpr(vec: Column, m: Int, k: Int): Column =
    (0 until dsub).map { i =>
      val x = element_at(vec, m * dsub + i + 1).cast("double")
      val c = lit(codebook(m)(k)(i))
      (x - c) * (x - c)
    }.reduce(_ + _)

  /** Code of subspace m: argmin_k dist, ties to smallest k. */
  private def codeExpr(vec: Column, m: Int): Column =
    array_min(array((0 until numCentroids).map(k =>
      struct(distExpr(vec, m, k).as("d"), lit(k.toLong).as("k"))): _*))
      .getField("k")

  /** All `numSubspaces` codes packed into one long (radix
    * `numCentroids`, subspace 0 least significant) — the one-pass JVM
    * kernel; [[packedCodeDeclarative]] is the Catalyst-tree semantics
    * reference it is spec-pinned against (KernelSpec).
    */
  def packedCode(vec: Column): Column =
    graft.plans.kernels.pq_encode_packed(vec,
      codebook.map(_.map(_.toSeq).toSeq).toSeq)

  /** The declarative argmin/pack tree (~1k nodes/row at the default
    * config — kept as the semantics reference, not the production path).
    */
  def packedCodeDeclarative(vec: Column): Column =
    (0 until numSubspaces).map(m =>
      codeExpr(vec, m) * lit(math.pow(numCentroids, m).toLong))
      .reduce(_ + _)

  def apply(df: DataFrame): DataFrame =
    df.withColumn(codeCol, packedCode(col(vecCol)))

  /** ADC distance of a packed-code column to a PLAN-TIME query vector:
    * the per-subspace lookup table is computed here (exact double
    * arithmetic, same fold) and goes into the plan as literals — each
    * row costs `numSubspaces` array lookups.
    */
  def adcDistance(packed: Column, query: Array[Double]): Column = {
    require(query.length == dims, s"query dim ${query.length} != $dims")
    val lut: Array[Array[Double]] = Array.tabulate(numSubspaces, numCentroids) { (m, k) =>
      (0 until dsub).map { i =>
        val d = query(m * dsub + i) - codebook(m)(k)(i); d * d
      }.foldLeft(0.0)(_ + _)
    }
    (0 until numSubspaces).map { m =>
      val code = pmod((packed / lit(math.pow(numCentroids, m).toLong)).cast("long"),
        lit(numCentroids.toLong))
      element_at(typedlit(lut(m).toSeq), (code + 1).cast("int"))
    }.reduce(_ + _)
  }

  /** Deterministic synthetic query vector (splitmix on `qseed`). */
  def syntheticQuery(qseed: Long): Array[Double] =
    Array.tabulate(dims)(i => unit(splitmix(qseed + 7919L * i)))

  // ---- DuckDB twins ----

  private def dlit(d: Double): String = s"CAST('${d.toString}' AS DOUBLE)"

  private def distSql(m: Int, k: Int): String =
    (0 until dsub).map { i =>
      val x = s"CAST($vecCol[${m * dsub + i + 1}] AS DOUBLE)"
      val c = dlit(codebook(m)(k)(i))
      s"(($x - $c) * ($x - $c))"
    }.mkString(" + ")

  private def codeSql(m: Int): String = {
    val structs = (0 until numCentroids).map(k =>
      s"{'d': ${distSql(m, k)}, 'k': CAST($k AS BIGINT)}").mkString(", ")
    s"list_sort([$structs])[1].k"
  }

  /** `_pq(id, code)` CTE over `table` (packed long, radix order as in
    * [[packedCode]]).
    */
  def cteSql(table: String, idExpr: String): String = {
    val packed = (0 until numSubspaces).map(m =>
      s"(${codeSql(m)}) * ${math.pow(numCentroids, m).toLong}").mkString(" + ")
    s"_pq AS (SELECT $idExpr AS id, $packed AS code FROM $table)"
  }

  /** ADC distance SQL over a `code` column for the same query. */
  def adcSql(codeExpr: String, query: Array[Double]): String = {
    val lut: Array[Array[Double]] = Array.tabulate(numSubspaces, numCentroids) { (m, k) =>
      (0 until dsub).map { i =>
        val d = query(m * dsub + i) - codebook(m)(k)(i); d * d
      }.foldLeft(0.0)(_ + _)
    }
    (0 until numSubspaces).map { m =>
      val row = lut(m).map(dlit).mkString("[", ", ", "]")
      s"$row[CAST(($codeExpr // ${math.pow(numCentroids, m).toLong}) % $numCentroids AS INT) + 1]"
    }.mkString(" + ")
  }
}
