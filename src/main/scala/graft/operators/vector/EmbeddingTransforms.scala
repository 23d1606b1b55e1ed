package graft.operators.vector

import graft.core.Operator
import graft.functions.VectorFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-vector symmetric int8 scalar quantization — the storage format
  * ANN indexes and embedding caches use at scale (4× smaller than
  * float32, 16-70× smaller than the double intermediate): each vector
  * gets one `scale = max|x|/127` and codes `round(x/scale)` clipped to
  * [-127, 127]. Dequantization is `code * scale` with bounded error
  * `scale/2` per element.
  *
  * Scale shape: stateless per-row map over the embedding column — no
  * shuffle, no state; output rows carry int codes (4 B now, 1 B in
  * parquet after byte-packing) instead of floats, which is the point:
  * at 100 TB the downstream exchange/storage cost drops 4×.
  *
  * All arithmetic is in DOUBLE with a DuckDB twin computing the exact
  * same expressions — both engines share IEEE-754, so codes match
  * bit-for-bit (round() is half-away-from-zero in both).
  */
final class EmbeddingQuantizer(
    vecCol: String = "embedding",
    codesCol: String = "codes",
    scaleCol: String = "scale") extends Operator {

  val name = "embedding_quantize"

  def apply(df: DataFrame): DataFrame = {
    val emb = col(vecCol).cast("array<double>")
    val scale = array_max(transform(emb, x => abs(x))) / 127.0
    df.withColumn("_q_scale", scale)
      .withColumn(codesCol,
        when(col("_q_scale") === 0.0, transform(emb, _ => lit(0)))
          .otherwise(transform(emb, x =>
            greatest(lit(-127), least(lit(127), round(x / col("_q_scale")))).cast("int"))))
      .withColumn(scaleCol, round(col("_q_scale"), 9))
      .drop("_q_scale")
  }

  /** DuckDB twin: CTE `_qz(id, scale, codes)` over `table`'s `vecCol`. */
  def cteSql(table: String, idExpr: String): String =
    s"""_qz AS (
       |  WITH _sc AS (SELECT $idExpr AS id, $vecCol AS emb,
       |      list_max(list_transform($vecCol, x -> abs(CAST(x AS DOUBLE)))) / 127.0 AS scale
       |    FROM $table)
       |  SELECT id, round(scale, 9) AS scale,
       |    CASE WHEN scale = 0 THEN list_transform(emb, x -> 0)
       |         ELSE list_transform(emb, x -> CAST(greatest(-127, least(127,
       |                round(CAST(x AS DOUBLE) / scale))) AS INT)) END AS codes
       |  FROM _sc)""".stripMargin
}

/** Matryoshka truncation: keep the first `dims` dimensions of an
  * MRL-trained embedding and L2-renormalize — the standard
  * accuracy-for-cost dial (half the dims ≈ 4× cheaper ANN search with
  * minor recall loss; Kusupati et al. 2022). Truncation must renorm
  * because downstream cosine math assumes unit vectors.
  *
  * Scale shape: stateless per-row map, no shuffle; output vectors are
  * `dims`-wide, shrinking every downstream exchange proportionally.
  * The norm accumulates in DOUBLE left-to-right with a DuckDB twin
  * folding in the same order ([[VectorFunctions]] discipline), so the
  * renormalized values agree bit-for-bit before the final round.
  */
final class MatryoshkaTruncate(
    vecCol: String = "embedding",
    dims: Int = 8,
    outputCol: String = "embedding_truncated") extends Operator {

  require(dims >= 1, s"dims must be >= 1, got $dims")
  val name = "matryoshka_truncate"

  def apply(df: DataFrame): DataFrame = {
    val sliced = slice(col(vecCol).cast("array<double>"), 1, dims)
    val n = VectorFunctions.norm2(sliced)
    df.withColumn(outputCol,
      when(n.isNull || n === 0.0, lit(null).cast("array<double>"))
        .otherwise(transform(sliced, x => round(x / n, 6))))
  }

  /** DuckDB twin: CTE `_mt(id, truncated)` over `table`'s `vecCol`. */
  def cteSql(table: String, idExpr: String): String = {
    val norm = VectorFunctions.norm2Sql("sl")
    s"""_mt AS (
       |  WITH _tr AS (SELECT $idExpr AS id,
       |      list_slice(list_transform($vecCol, x -> CAST(x AS DOUBLE)), 1, $dims) AS sl
       |    FROM $table),
       |  _nm AS (SELECT id, sl, $norm AS n FROM _tr)
       |  SELECT id, CASE WHEN n IS NULL OR n = 0 THEN NULL
       |    ELSE list_transform(sl, x -> round(x / n, 6)) END AS truncated
       |  FROM _nm)""".stripMargin
  }
}

/** Random-projection dimensionality reduction (Johnson–Lindenstrauss;
  * Achlioptas 2003 shows dense iid projections preserve pairwise
  * distances at k = O(log n / ε²)) — the cheap embedding shrink a
  * 100 TB vector corpus runs before ANN indexing when matryoshka
  * truncation isn't available (models not trained with nested dims).
  *
  * The projection matrix is NOT runtime randomness (resume-safety and
  * oracle parity forbid it — the [[graft.operators.vector.EmbeddingSimHash]]
  * discipline): components come from a splitmix64 stream seeded by
  * (seed, out-dim, in-dim), materialized at plan-build time as typed
  * literals into BOTH engines, and each output component is the
  * left-to-right double dot fold both engines share.
  *
  * Scale shape: stateless per-row map, no shuffle; output vectors are
  * `outDims`-wide, shrinking every downstream exchange.
  */
final class RandomProjection(
    vecCol: String = "embedding",
    inDims: Int = 16,
    outDims: Int = 8,
    seed: Long = 11L,
    outputCol: String = "embedding_projected") extends Operator {

  require(outDims >= 1 && inDims >= 1, s"dims must be >= 1")
  val name = "random_projection"

  private def splitmix(x0: Long): Long = {
    var z = x0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** `planes(j)(i)` in [-1, 1) scaled by 1/√outDims (the JL norm
    * factor), deterministic in (seed, j, i).
    */
  val planes: Array[Array[Double]] = {
    val s = 1.0 / math.sqrt(outDims.toDouble)
    Array.tabulate(outDims, inDims) { (j, i) =>
      (((splitmix(seed + j.toLong * 65537L + i) >>> 11).toDouble /
        (1L << 53).toDouble) * 2.0 - 1.0) * s
    }
  }

  def apply(df: DataFrame): DataFrame =
    df.withColumn(outputCol, array(planes.map(p =>
      VectorFunctions.dot(col(vecCol), typedlit(p.toSeq))): _*))

  /** DuckDB twin: CTE `_rp(id, projected)` over `table`'s `vecCol`.
    * Plane components go in as `CAST('…' AS DOUBLE)` — a bare decimal
    * literal parses as DECIMAL and the decimal→double conversion can be
    * 1 ulp off the shortest-round-trip text parse the Spark literal is.
    */
  def cteSql(table: String, idExpr: String): String = {
    val comps = planes.map { p =>
      val lit = p.map(d => s"CAST('${d.toString}' AS DOUBLE)")
        .mkString("([", ", ", "])")
      VectorFunctions.dotSql(vecCol, lit)
    }.mkString("[", ", ", "]")
    s"""_rp AS (SELECT $idExpr AS id, $comps AS projected FROM $table)""".stripMargin
  }
}
