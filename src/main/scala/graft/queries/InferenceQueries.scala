package graft.queries

import graft.core.Tables
import graft.ml.Mlp
import graft.operators.image._
import graft.sources.SyntheticImages
import org.apache.spark.sql.functions._

/** Embedding-scoring refiner gates (SURVEY.md §2 R4–R7). The MLP heads
  * run over the embeddings fixture with seeded deterministic weights; the
  * DuckDB twin evaluates the SAME network via Mlp.forwardSql (identical
  * term order), so the scores hash-match. The encoder-backed refiners
  * (whose stub output depends on encoded bytes) are gated rows-only.
  */
object InferenceQueries {

  // [64 → 8 → 1] heads over the 64-dim fixture embeddings: aesthetic =
  // activation-free linear stack (the reference architecture's shape),
  // aigc = relu hidden + sigmoid output.
  private val aestheticMlp = Mlp.seeded(Seq(64, 8, 1), seed = 11L,
    hiddenActivation = "identity", lastActivation = "identity")
  private val aigcMlp = Mlp.seeded(Seq(64, 8, 1), seed = 23L,
    hiddenActivation = "relu", lastActivation = "sigmoid")

  private val aestheticOp = new AestheticScoreRefiner("embedding", aestheticMlp)
  private val aigcOp = new AigcDetectorRefiner("embedding", aigcMlp, threshold = 0.5)

  val queries: Seq[OracleQuery] = Seq(

    OracleQuery("mlp_aesthetic_score",
      (s, dir) => aestheticOp(Tables(s, dir, "embeddings"))
        .select(col("vec_id"), round(col("image_aesthetic_score"), 6).as("score"))
        .orderBy(col("vec_id")),
      Some(s"""SELECT vec_id, round(${Mlp.forwardSql(aestheticMlp, "embedding")}, 6) AS score
              |FROM embeddings ORDER BY vec_id""".stripMargin)),

    OracleQuery("mlp_aigc_detect",
      (s, dir) => aigcOp(Tables(s, dir, "embeddings"))
        .select(col("vec_id"), round(col("image_aigc_score"), 6).as("score"),
          col("image_is_aigc"))
        .orderBy(col("vec_id")),
      Some(s"""SELECT vec_id, round(${Mlp.forwardSql(aigcMlp, "embedding")}, 6) AS score,
              |  (${Mlp.forwardSql(aigcMlp, "embedding")}) > 0.5 AS image_is_aigc
              |FROM embeddings ORDER BY vec_id""".stripMargin)),

    // rows-only gates (stub-encoder outputs are byte-dependent; the Spark
    // plumbing — batching, null handling, L2 norm — is ScalaTest-covered)
    OracleQuery("image_clip_embed",
      (s, _) => {
        val op = new ImageEmbeddingRefiner(
          new HashProjectionEncoder("vit_l14_stub", 16), family = "clip")
        op(SyntheticImages.df(s))
          .select(col("id"), col(op.outputCol)).orderBy(col("id"))
      },
      None),

    OracleQuery("image_degradations",
      (s, _) => {
        val model = new DegradationModel {
          def heads(bytes: Array[Byte]): Array[Double] = {
            val d = ImageOps.decode(bytes)
            d.map { dec =>
              Array(ImageOps.entropy(dec) / 8.0, ImageOps.blockiness(dec),
                0.0, 1.0 - ImageOps.entropy(dec) / 8.0)
            }.getOrElse(Array(0.0, 0.0, 0.0, 0.0))
          }
        }
        new VisualDegradationsRefiner("image", Some(model))(
          SyntheticImages.df(s).filter(col("id") <= 53))
          .select(col("id"), round(col("img_vd_overall_quality"), 6).as("overall"))
          .orderBy(col("id"))
      },
      None))
}
