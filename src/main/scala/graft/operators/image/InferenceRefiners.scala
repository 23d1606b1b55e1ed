package graft.operators.image

import graft.core.Operator
import graft.ml.Mlp
import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** R6: aesthetic score from a PRE-COMPUTED embedding column — the
  * reference's improved-aesthetic-predictor head over CLIP ViT-L/14
  * embeddings (image_aesthetic_quality.py:45-68, an activation-free
  * linear stack). Wrong-dimension or missing embeddings keep the 0.0
  * default (":229-233"). The head is any [[Mlp]]; real exported weights
  * plug into the same structure.
  */
final class AestheticScoreRefiner(
    embCol: String,
    mlp: Mlp,
    outputCol: String = "image_aesthetic_score") extends Operator {
  val name = "image_aesthetic_quality"

  def apply(df: DataFrame): DataFrame = build(df, lit(true))

  override def applyGated(df: DataFrame, alive: org.apache.spark.sql.Column): DataFrame =
    build(df, alive)

  private def build(df: DataFrame, alive: org.apache.spark.sql.Column): DataFrame = {
    val m = mlp // localize: the closure must not capture the refiner
    val dim = m.inputDim
    val scoreUdf = udf((emb: Seq[Double]) =>
      if (emb == null || emb.size != dim) 0.0 else m.score(emb.toArray))
    df.withColumn(outputCol, when(alive, scoreUdf(col(embCol).cast("array<double>"))))
  }
}

/** R7: AIGC detection head over a pre-computed embedding column —
  * sigmoid score + boolean decision at `threshold`
  * (image_aigc_detector.py:200-233; default threshold 0.5). Missing or
  * wrong-dimension embeddings → (0.0, false).
  */
final class AigcDetectorRefiner(
    embCol: String,
    mlp: Mlp,
    threshold: Double = 0.5,
    scoreCol: String = "image_aigc_score",
    flagCol: String = "image_is_aigc") extends Operator {
  val name = "image_aigc_detector"

  def apply(df: DataFrame): DataFrame = build(df, lit(true))

  override def applyGated(df: DataFrame, alive: org.apache.spark.sql.Column): DataFrame =
    build(df, alive)

  private def build(df: DataFrame, alive: org.apache.spark.sql.Column): DataFrame = {
    val m = mlp // localize: the closure must not capture the refiner
    val dim = m.inputDim
    val scoreUdf = udf((emb: Seq[Double]) =>
      if (emb == null || emb.size != dim) 0.0 else m.score(emb.toArray))
    df.withColumn(scoreCol, when(alive, scoreUdf(col(embCol).cast("array<double>"))))
      .withColumn(flagCol, col(scoreCol) > threshold)
  }
}

/** Batched image-encoder SPI — the residency/batching contract of the
  * reference's CLIP/SigLIP refiners (one model per actor, mini-batches
  * of `batchSize`, zero-vector on failure,
  * image_clip_embedding.py:85-169). Implementations hold their model
  * per-partition (mapPartitions = per-task residency; GPU scheduling via
  * stage-level resource profiles).
  */
trait ImageEncoder extends Serializable {
  def modelName: String
  def dim: Int
  /** One mini-batch in, one vector per input out (zero vector = failure). */
  def encodeBatch(images: Seq[Array[Byte]]): Seq[Array[Float]]
}

/** STUB encoder — a deterministic fake standing in for the ONNX
  * CLIP/SigLIP vision towers (no model weights ship in this
  * environment): seed = 64-bit FNV over the bytes → LCG unit vector.
  * The Spark-side plumbing (schema, batching, null handling, L2
  * normalization) is real and tested; a real OnnxImageEncoder drops in
  * behind the same trait.
  */
final class HashProjectionEncoder(val modelName: String, val dim: Int) extends ImageEncoder {
  def encodeBatch(images: Seq[Array[Byte]]): Seq[Array[Float]] = images.map { bytes =>
    if (bytes == null || bytes.isEmpty) new Array[Float](dim)
    else {
      var h = 0xcbf29ce484222325L
      bytes.foreach(b => { h ^= (b & 0xFFL); h *= 0x100000001b3L })
      val out = new Array[Float](dim)
      var s = h
      var i = 0
      while (i < dim) {
        s = s * 6364136223846793005L + 1442695040888963407L
        out(i) = ((s >>> 33).toDouble / (1L << 31).toDouble - 0.5).toFloat
        i += 1
      }
      out
    }
  }
}

/** R4/R5: adds `image_<family>_emb_<model>` (array<float>) via
  * mapPartitions mini-batches; optional L2 normalization
  * (image_clip_embedding.py:161-163); failures keep the zero vector.
  * Image bytes stay OUT of the output row set the caller projects later
  * — column pruning is the 100 TB concern here.
  */
final class ImageEmbeddingRefiner(
    encoder: ImageEncoder,
    imageCol: String = "image",
    family: String = "clip",
    batchSize: Int = 32,
    l2Normalize: Boolean = true) extends Operator {

  val name = s"image_${family}_embedding"
  val outputCol = s"image_${family}_emb_${encoder.modelName}"

  def apply(df: DataFrame): DataFrame = build(df, None)

  /** Disposition mode: dead rows get a null embedding and, crucially,
    * never reach the encoder — skipped rows also don't occupy mini-batch
    * slots, so batches stay full of real work.
    */
  override def applyGated(df: DataFrame, alive: org.apache.spark.sql.Column): DataFrame = {
    val tagged = df.withColumn("_emb_alive", alive)
    build(tagged, Some("_emb_alive")).drop("_emb_alive")
  }

  private def build(df: DataFrame, aliveCol: Option[String]): DataFrame = {
    val outSchema = StructType(df.schema.fields :+
      StructField(outputCol, ArrayType(FloatType, containsNull = false)))
    val bytesIdx = df.schema.fieldIndex(imageCol)
    val aliveIdx = aliveCol.map(df.schema.fieldIndex)
    val imgField = df.schema(imageCol).dataType
    val enc = encoder
    val bs = batchSize
    val norm = l2Normalize
    df.mapPartitions { rows =>
      rows.grouped(bs).flatMap { batch =>
        val live = batch.map(r => aliveIdx.forall(i => !r.isNullAt(i) && r.getBoolean(i)))
        val bytes = batch.zip(live).collect { case (r, true) =>
          if (r.isNullAt(bytesIdx)) null
          else imgField match {
            case _: StructType => Option(r.getStruct(bytesIdx).getAs[Array[Byte]]("bytes")).orNull
            case _             => r.getAs[Array[Byte]](bytesIdx)
          }
        }
        val vecs = enc.encodeBatch(bytes).iterator
        batch.zip(live).map { case (r, isLive) =>
          if (!isLive) Row.fromSeq(r.toSeq :+ null)
          else {
            val v0 = vecs.next()
            val v = if (!norm) v0 else {
              val n = math.sqrt(v0.foldLeft(0.0)((a, x) => a + x.toDouble * x)).toFloat
              if (n == 0f) v0 else v0.map(_ / n)
            }
            Row.fromSeq(r.toSeq :+ v.toSeq)
          }
        }
      }
    }(Encoders.row(outSchema))
  }
}

/** R3: visual-degradation scores (5 float columns). The reference's
  * multi-head CNN loads lazily and yields NULLS when the checkpoint is
  * missing (image_visual_degradations.py:104-121) — `model = None`
  * reproduces exactly that; a model supplies 4 head scores and overall =
  * 0.2·color_cast + 0.3·blurriness + 0.25·watermark + 0.25·noise
  * (":24-37").
  */
trait DegradationModel extends Serializable {
  /** (color_cast, blurriness, watermark, noise) for one image. */
  def heads(bytes: Array[Byte]): Array[Double]
}

final class VisualDegradationsRefiner(
    imageCol: String = "image",
    model: Option[DegradationModel] = None) extends Operator {
  val name = "image_visual_degradations"

  private val cols = Seq("img_vd_color_cast", "img_vd_blurriness",
    "img_vd_watermark", "img_vd_noise", "img_vd_overall_quality")

  def apply(df: DataFrame): DataFrame = build(df, lit(true))

  override def applyGated(df: DataFrame, alive: org.apache.spark.sql.Column): DataFrame =
    build(df, alive)

  private def build(df: DataFrame, alive: org.apache.spark.sql.Column): DataFrame = model match {
    case None =>
      cols.foldLeft(df)((d, c) => d.withColumn(c, lit(null).cast("double")))
    case Some(m) =>
      val headsUdf = udf((bytes: Array[Byte]) => {
        val h = m.heads(bytes)
        val overall = 0.2 * h(0) + 0.3 * h(1) + 0.25 * h(2) + 0.25 * h(3)
        h :+ overall
      })
      df.withColumn("_vd", when(alive, headsUdf(col(s"$imageCol.bytes"))))
        .withColumns(cols.zipWithIndex.map { case (c, i) =>
          c -> element_at(col("_vd"), i + 1)
        }.toMap)
        .drop("_vd")
  }
}
