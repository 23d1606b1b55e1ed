package graft.queries

import graft.core.Tables
import graft.operators.vector.{EmbeddingQuantizer, EmbeddingSimHash, MatryoshkaTruncate, RandomProjection}
import org.apache.spark.sql.functions._

/** Embedding-transform gates: int8 scalar quantization and Matryoshka
  * truncation+renorm — both recomputed elementwise by the DuckDB twin
  * (shared IEEE-754 double arithmetic, same fold order).
  */
object VectorTransformQueries {

  private val quantOp = new EmbeddingQuantizer()
  private val mtOp = new MatryoshkaTruncate(dims = 8)
  private val eshOp = new EmbeddingSimHash(
    vecCol = "embedding", idCol = "vec_id", orderCol = "vec_id",
    bits = 12, dims = 64, seed = 7L)
  private val rpOp = new RandomProjection(
    vecCol = "embedding", inDims = 64, outDims = 8, seed = 11L)

  val queries: Seq[OracleQuery] = Seq(

    // int codes serialize exactly ("-7" is "-7" in both engines), so the
    // whole 64-wide code vector is hash-checked as one string column
    OracleQuery("embedding_quantize",
      (s, dir) => quantOp(Tables(s, dir, "embeddings"))
        .select(col("vec_id"), col("scale"), concat_ws(",", col("codes")).as("codes_csv"))
        .orderBy(col("vec_id")),
      Some(s"""WITH ${quantOp.cteSql("embeddings", "vec_id")}
              |SELECT id AS vec_id, scale, array_to_string(codes, ',') AS codes_csv
              |FROM _qz ORDER BY vec_id""".stripMargin)),

    // doubles don't format identically across engines, so the truncated
    // vector is projected to scalar columns (the minhash_signature idiom)
    OracleQuery("matryoshka_truncate",
      (s, dir) => mtOp(Tables(s, dir, "embeddings"))
        .select(col("vec_id") +:
          (1 to 8).map(i => element_at(col("embedding_truncated"), i).as(s"e$i")): _*)
        .orderBy(col("vec_id")),
      Some(s"""WITH ${mtOp.cteSql("embeddings", "vec_id")}
              |SELECT id AS vec_id, ${(1 to 8).map(i => s"truncated[$i] AS e$i").mkString(", ")}
              |FROM _mt ORDER BY vec_id""".stripMargin)),

    // same scalar-column projection as matryoshka: doubles agree
    // bit-for-bit (shared literal planes + same fold order) but don't
    // FORMAT identically, so no array-to-string
    OracleQuery("random_projection",
      (s, dir) => rpOp(Tables(s, dir, "embeddings"))
        .select(col("vec_id") +:
          (1 to 8).map(i => element_at(col("embedding_projected"), i).as(s"p$i")): _*)
        .orderBy(col("vec_id")),
      Some(s"""WITH ${rpOp.cteSql("embeddings", "vec_id")}
              |SELECT id AS vec_id, ${(1 to 8).map(i => s"projected[$i] AS p$i").mkString(", ")}
              |FROM _rp ORDER BY vec_id""".stripMargin)),

    OracleQuery("embedding_simhash_signature",
      (s, dir) => Tables(s, dir, "embeddings")
        .select(col("vec_id"), eshOp.signature(col("embedding")).as("sig"))
        .orderBy(col("vec_id")),
      Some(s"""SELECT vec_id, ${eshOp.signatureSql("embedding")} AS sig
              |FROM embeddings ORDER BY vec_id""".stripMargin)),

    OracleQuery("embedding_simhash_dedup",
      (s, dir) => eshOp(Tables(s, dir, "embeddings"))
        .select(col("vec_id")).orderBy(col("vec_id")),
      Some(s"""WITH sg AS (SELECT vec_id, ${eshOp.signatureSql("embedding")} AS sig
              |  FROM embeddings)
              |SELECT vec_id FROM (SELECT vec_id, row_number() OVER
              |    (PARTITION BY sig ORDER BY vec_id) AS rn FROM sg) t
              |WHERE rn = 1 ORDER BY vec_id""".stripMargin))
  )
}
