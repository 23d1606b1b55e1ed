package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** KMV (k-minimum-values) distinct-count sketch as a native Catalyst
  * aggregate — the mergeable sketch behind `COUNT(DISTINCT)` at 100 TB:
  * each partition keeps only its k smallest DISTINCT hash values (k·8
  * bytes), partials merge by set-union-and-recap, and the estimator is
  * `(k-1) / U(h_k)` where `h_k` is the k-th smallest hash scaled to
  * (0,1] (Bar-Yossef et al. 2002; Beyer et al. 2007 unbiased form).
  * Versus exact `countDistinct`, the shuffle carries k longs per
  * partition instead of every distinct key; versus Spark's built-in
  * HLL++ (`approx_count_distinct`), KMV's estimate is an exact
  * deterministic function of the k smallest hashes — reproducible by
  * the DuckDB oracle via `row_number() ... WHERE rn = k`, which is the
  * point: the gate hash-checks a SKETCH.
  *
  * The child must already be the 60-bit [[HashFunctions.portableHash64]]
  * (uniform on [0, 2^60)); hashing stays outside the aggregate so the
  * codegen'd projection computes it and the sketch is hash-family
  * agnostic. Fewer than k distinct values → the sketch IS the distinct
  * set and the exact count is returned.
  */
final case class KmvSketch(
    child: Expression,
    k: Int,
    emitSketch: Boolean = false,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
  with UnaryLike[Expression] {

  require(k >= 2, s"k must be >= 2, got $k")

  override def prettyName: String = if (emitSketch) "kmv_sketch" else "kmv_distinct"
  override def dataType: DataType =
    if (emitSketch) ArrayType(LongType, containsNull = false) else DoubleType
  override def nullable: Boolean = false

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"kmv_distinct expects a pre-hashed LONG child, got ${child.dataType.catalogString}")

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def add(buf: java.util.TreeSet[java.lang.Long], h: Long): Unit =
    if (buf.size < k) { buf.add(h); () }
    else if (h < buf.last()) { if (buf.add(h)) { buf.pollLast(); () } }

  override def update(buf: java.util.TreeSet[java.lang.Long], input: InternalRow)
      : java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) add(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: java.util.TreeSet[java.lang.Long],
      other: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = other.iterator()
    while (it.hasNext) add(buf, it.next())
    buf
  }

  private val HashSpace = KmvSketch.HashSpace

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any =
    if (emitSketch) {
      val arr = new Array[Long](buf.size)
      val it = buf.iterator()
      var i = 0
      while (it.hasNext) { arr(i) = it.next(); i += 1 } // ascending
      new org.apache.spark.sql.catalyst.util.GenericArrayData(arr)
    } else if (buf.size < k) buf.size.toDouble
    else ((k - 1).toDouble * HashSpace) / buf.last().toDouble

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.size)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.add(bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvSketch =
    copy(child = newChild)
}

object KmvSketch {

  /** 2^60 — the portable hash's exclusive upper bound, exact as a double. */
  val HashSpace = 1152921504606846976.0

  /** `kmvDistinct(portableHash64(col), k)` as an aggregate Column. */
  def kmvDistinct(hashed: Column, k: Int): Column =
    Shim.column(KmvSketch(Shim.expression(hashed), k).toAggregateExpression())

  /** The raw sketch (ascending long array, ≤ k entries) — persistable,
    * mergeable with another sketch via [[overlap]]/array union. This is
    * the 100 TB artifact shape: a corpus's distinct-count state in k·8
    * bytes, combinable across sources/snapshots without re-scanning.
    */
  def kmvSketchArr(hashed: Column, k: Int): Column =
    Shim.column(KmvSketch(Shim.expression(hashed), k, emitSketch = true).toAggregateExpression())

  /** Overlap estimators from two SKETCH columns (no corpus join):
    * `(est_jaccard, est_union, est_overlap)`. Uses the classic KMV set
    * algebra (Beyer et al. 2007): the k smallest of `K(A) ∪ K(B)` IS
    * `K(A ∪ B)`, and an element of it belongs to A iff it is in
    * `K(A)` — so Jaccard is estimated by membership counting inside
    * the union sketch and the intersection size by `jaccard × union`.
    */
  def overlap(skA: Column, skB: Column, k: Int): (Column, Column, Column) = {
    import org.apache.spark.sql.functions._
    val unionAll = array_sort(array_union(skA, skB))
    val dFull = size(unionAll).cast("long")
    val kk = least(dFull, lit(k.toLong))
    val unionK = slice(unionAll, 1, k)
    val inter = size(array_intersect(array_intersect(unionK, skA), skB)).cast("long")
    val estJ = inter.cast("double") / kk.cast("double")
    val estU = when(dFull < k, dFull.cast("double"))
      .otherwise((lit((k - 1).toDouble) * lit(HashSpace)) /
        element_at(unionAll, k).cast("double"))
    (estJ, estU, estJ * estU)
  }

  /** DuckDB twin: estimate over `hvExpr` (the portable-hash SQL of the
    * key) for rows of `fromSql`, one row per `groupCol`. Emits a CTE
    * chain; select `est` joined on `groupCol`.
    */
  def sqlCte(groupCol: String, hvExpr: String, fromSql: String, k: Int): String =
    s"""_kmv_h AS (SELECT DISTINCT $groupCol, $hvExpr AS hv FROM $fromSql),
       |_kmv_r AS (SELECT $groupCol, hv,
       |    row_number() OVER (PARTITION BY $groupCol ORDER BY hv) AS rn,
       |    count(*) OVER (PARTITION BY $groupCol) AS nd
       |  FROM _kmv_h),
       |_kmv AS (SELECT $groupCol,
       |    CASE WHEN max(nd) < $k THEN CAST(max(nd) AS DOUBLE)
       |         ELSE (CAST(${k - 1} AS DOUBLE) * CAST(1152921504606846976 AS DOUBLE))
       |              / CAST(max(CASE WHEN rn = $k THEN hv END) AS DOUBLE) END AS est
       |  FROM _kmv_r GROUP BY 1)""".stripMargin
}
