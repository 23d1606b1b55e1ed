package graft.plans

import org.apache.spark.sql.catalyst.util.ArrayData

/** Static JVM helpers invoked from generated code (whole-stage codegen
  * emits a plain static call — Scala's object static forwarders make
  * `graft.plans.KernelOps.arrayCosine(...)` valid generated Java).
  * Element types are resolved to an int tag at CODEGEN time, so the
  * per-row loop is branch-predictable.
  */
object KernelOps {

  final val TFloat = 0
  final val TDouble = 1
  final val TLong = 2
  final val TInt = 3

  @inline private def get(a: ArrayData, t: Int, i: Int): Double = t match {
    case TFloat => a.getFloat(i).toDouble
    case TDouble => a.getDouble(i)
    case TLong => a.getLong(i).toDouble
    case _ => a.getInt(i).toDouble
  }

  /** Cosine similarity; null when either norm is 0 (the DuckDB x/0
    * NULL convention) — the exact fold of kernels.ArrayCosine.
    */
  def arrayCosine(a: ArrayData, b: ArrayData, ta: Int, tb: Int): java.lang.Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = get(a, ta, i); val y = get(b, tb, i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) null else java.lang.Double.valueOf(dot / denom)
  }
}
