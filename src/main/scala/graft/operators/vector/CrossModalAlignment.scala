package graft.operators.vector

import graft.core.Refiner
import graft.functions.VectorFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Cross-modal alignment scoring — the CLIP-score signal of image-text
  * curation (LAION-style pipelines drop pairs whose image embedding and
  * caption embedding disagree): cosine similarity between two embedding
  * columns of the same row, e.g. an image tower output and a text tower
  * output. Degenerate inputs (null, empty, length-mismatched, or
  * zero-norm vectors) score 0.0 rather than NaN, matching the
  * zero-vector default the reference's embedding refiners emit on
  * failure (reference: refiners/image_clip_embedding.py:141-145).
  * Pure codegen'd array algebra: no shuffle, no UDF.
  */
final class CrossModalAlignmentRefiner(
    embACol: String,
    embBCol: String,
    outCol: String = "cross_modal_cosine") extends Refiner {

  val name = "cross_modal_alignment"

  private def score(a: Column, b: Column): Column =
    when(a.isNull || b.isNull || size(a) === 0 || size(a) =!= size(b) ||
      VectorFunctions.norm2(a) === 0.0 || VectorFunctions.norm2(b) === 0.0, lit(0.0))
      .otherwise(VectorFunctions.cosine(a, b))

  def added(df: DataFrame): Seq[(String, Column)] =
    Seq(outCol -> score(col(embACol), col(embBCol)))

  /** DuckDB twin over two list-typed expressions. */
  def scoreSql(a: String, b: String): String =
    s"(CASE WHEN $a IS NULL OR $b IS NULL OR len($a) = 0 OR len($a) != len($b) " +
      s"OR ${VectorFunctions.norm2Sql(a)} = 0.0 OR ${VectorFunctions.norm2Sql(b)} = 0.0 " +
      s"THEN CAST(0.0 AS DOUBLE) ELSE ${VectorFunctions.cosineSql(a, b)} END)"
}
