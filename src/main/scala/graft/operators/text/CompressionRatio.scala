package graft.operators.text

import graft.core.{Operator, RowFilter}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Compression-ratio quality signal (zlib Deflate, pinned level):
  * repetitive/templated pages compress far below prose, so the ratio is
  * the classic cheap boilerplate detector — the Dolma/RedPajama filter
  * sets carry exactly this signal alongside the Gopher battery. A
  * per-row stateless kernel pass; no shuffle.
  *
  * No DuckDB zlib exists, so unlike the rest of the text family this
  * signal is SPEC-pinned (monotonicity on crafted text, bounds,
  * determinism across partitionings) and its gate records the weaker
  * rows-only check — documented, not hidden.
  */
final class CompressionRatioRefiner(
    textCol: String = "text",
    outputCol: String = "compression_ratio") extends Operator {

  val name = "compression_ratio"

  def apply(df: DataFrame): DataFrame =
    df.withColumn(outputCol,
      round(graft.plans.kernels.deflate_ratio(col(textCol)), 6))
}

/** Keeps rows whose ratio is INSIDE [minRatio, maxRatio] — too low is
  * boilerplate/repetition, too high is high-entropy junk (base64 blobs,
  * minified code, binary-ish noise). Gopher's repetition rules catch
  * structured repeats; this catches the unstructured kind.
  */
final class CompressionRatioFilter(
    textCol: String = "text",
    minRatio: Double = 0.25,
    maxRatio: Double = 0.95) extends RowFilter {

  require(minRatio >= 0.0 && maxRatio > minRatio)
  val name = "compression_ratio_filter"

  // ONE deflate pass per row (two comparisons of the ratio kernel in a
  // Filter predicate would compress every row twice)
  def keep(df: DataFrame): Column =
    graft.plans.kernels.deflate_keep(col(textCol), minRatio, maxRatio)
}
