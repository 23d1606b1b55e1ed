package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector math over `array<float>` embedding columns, all as Catalyst
  * expressions (`zip_with`/`aggregate` — codegen-capable, no UDF).
  *
  * Accumulation is in DOUBLE, left-to-right, and each function has a DuckDB
  * twin written to fold in exactly the same order — the doubles come out
  * bit-identical, so similarity *decisions* (thresholds, top-k ranks) match
  * across engines.
  */
object VectorFunctions {

  private def asDouble(v: Column): Column = v.cast("array<double>")

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(asDouble(a), asDouble(b), (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm2(a: Column): Column =
    sqrt(aggregate(transform(asDouble(a), x => x * x), lit(0.0), (acc, x) => acc + x))

  /** Cosine similarity — evaluated by the [[graft.plans.kernels.ArrayCosine]]
    * kernel (one JVM loop per row; the declarative `dot/norm2` forms above
    * document the math and stay available for composition). Zero-norm
    * input yields null, matching DuckDB's x/0.
    */
  def cosine(a: Column, b: Column): Column = graft.plans.kernels.array_cosine(a, b)

  // ---- DuckDB twins (list_reduce folds left-to-right like aggregate) ----

  def dotSql(a: String, b: String): String =
    s"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), " +
      s"list_transform(range(1, len($a) + 1), i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE))), " +
      s"(acc, x) -> acc + x)"

  def norm2Sql(a: String): String =
    s"sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE), " +
      s"list_transform(range(1, len($a) + 1), i -> CAST($a[i] AS DOUBLE) * CAST($a[i] AS DOUBLE))), " +
      s"(acc, x) -> acc + x))"

  def cosineSql(a: String, b: String): String =
    s"(${dotSql(a, b)} / (${norm2Sql(a)} * ${norm2Sql(b)}))"

  /** Squared L2 with the kernel's left-to-right double fold (matches
    * kernels.NearestCentroid and the JVM [[l2sq]] bit-for-bit). */
  def l2sqSql(a: String, b: String): String =
    s"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), " +
      s"list_transform(range(1, len($a) + 1), " +
      s"i -> (CAST($a[i] AS DOUBLE) - CAST($b[i] AS DOUBLE)) * (CAST($a[i] AS DOUBLE) - CAST($b[i] AS DOUBLE)))), " +
      s"(acc, x) -> acc + x)"

  /** [[l2sqSql]] with the fold bounded by BOTH list lengths — matching
    * the kernel's `min(len(a), len(b))` loop exactly even when the two
    * sides disagree on width (the plain form ranges over `len(a)` and
    * folds a NULL past the shorter list, poisoning the whole distance).
    */
  def l2sqBoundedSql(a: String, b: String): String =
    s"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), " +
      s"list_transform(range(1, least(len($a), len($b)) + 1), " +
      s"i -> (CAST($a[i] AS DOUBLE) - CAST($b[i] AS DOUBLE)) * (CAST($a[i] AS DOUBLE) - CAST($b[i] AS DOUBLE)))), " +
      s"(acc, x) -> acc + x)"

  /** Driver-side twin of [[l2sqSql]] (ascending accumulation). */
  def l2sq(a: Seq[Double], b: Seq[Double]): Double = {
    var acc = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { val d = a(i) - b(i); acc += d * d; i += 1 }
    acc
  }
}
