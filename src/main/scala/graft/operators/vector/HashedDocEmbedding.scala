package graft.operators.vector

import graft.functions.{HashFunctions, TextFunctions}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Feature-hashing document embeddings (the hashing trick, Weinberger
  * et al. 2009): each token hashes to one of `dims` signed slots, a
  * document's raw vector is the per-slot signed count, L2-normalized —
  * the zero-model text→vector bridge. Every vector-family operator
  * (cosine dedup, ANN tiers, k-means buckets, silhouette, drift)
  * assumes an embedding column exists; this produces one from text
  * alone, so the whole vector pipeline runs on corpora with no model
  * embeddings yet. Quality is bag-of-words (no semantics beyond
  * lexical overlap) — the honest baseline tier under the ONNX encoder
  * refiners.
  *
  * Exactness: slot index and sign derive from the portable/xxhash64
  * token hash; per-slot signed counts are exact BIGINTs from ONE
  * partial-aggregated pass over the exploded tokens (the shuffle
  * carries `dims` longs per doc); the L2 norm and division are the
  * only doubles (fixed shape, round 6).
  */
final class HashedDocEmbedding(
    textCol: String,
    idCol: String,
    dims: Int = 16,
    hashName: String = "xxhash64") {

  val name = "hashed_doc_embedding"
  require(dims >= 2 && dims <= 1024, "dims in [2, 1024]")

  /** `(id, emb)` — `emb` a dims-wide array<double>; NULL when the
    * doc's slots perfectly cancel (a zero vector has no direction).
    * Docs with NO tokens are ABSENT here (the explode drops them);
    * [[attach]] restores them as NULL rows.
    */
  def apply(df: DataFrame): DataFrame = {
    val h = HashFunctions.hashByName(hashName)(col("_t"))
    val slots = df.select(col(idCol).as("id"),
        explode(TextFunctions.tokensOf(col(textCol))).as("_t"))
      .select(col("id"),
        pmod(h, lit(dims.toLong)).cast("int").as("_i"),
        (shiftright(h, 10).bitwiseAND(lit(1L)) * 2L - 1L).as("_s"))
    val sums = (0 until dims).map(i =>
      sum(when(col("_i") === i, col("_s")).otherwise(0L)).as(s"_e$i"))
    val agg = slots.groupBy(col("id")).agg(sums.head, sums.tail: _*)
    val normSq = (0 until dims).map(i => col(s"_e$i") * col(s"_e$i"))
      .reduce(_ + _)
    val norm = sqrt(normSq.cast("double"))
    agg.select(col("id"),
      when(normSq > 0L,
        array((0 until dims).map(i =>
          round(col(s"_e$i").cast("double") / norm, 6)): _*))
        .as("emb"))
  }

  /** Refiner form: the input plus `outputCol` (NULL for no-token docs)
    * — one groupBy + one id-keyed join back, so YAML pipelines can run
    * the whole vector family on raw text.
    */
  def attach(df: DataFrame, outputCol: String): DataFrame = {
    val emb = apply(df).select(col("id").as("_hde_id"), col("emb").as(outputCol))
    // replace (not duplicate) an existing output column — the
    // withColumn contract every other refiner follows
    df.drop(outputCol).join(emb, df(idCol) === col("_hde_id"), "left")
      .drop("_hde_id")
  }

  // ---- DuckDB twin (same hash, slots, and fixed-shape normalize) ----

  /** CTE `_hde(id, …_e{i}…, and `emb{i}` normalized components)`;
    * standalone SELECT of `(id, emb1..embN)` for the first `out` dims.
    */
  def sql(table: String, idExpr: String, out: Int,
      outIdAlias: String = "id"): String = {
    require(hashName == "portable", "oracle covers the portable hash family")
    val h = HashFunctions.portableHash64Sql("t")
    val toks = TextFunctions.tokensOfSql(textCol)
    val sums = (0 until dims).map(i =>
      s"sum(CASE WHEN i = $i THEN s ELSE 0 END) AS _e$i").mkString(", ")
    val normSq = (0 until dims).map(i => s"_e$i * _e$i").mkString(" + ")
    val outs = (1 to out).map(i =>
      s"CASE WHEN nsq > 0 THEN round(CAST(_e${i - 1} AS DOUBLE) / sqrt(CAST(nsq AS DOUBLE)), 6) END AS emb$i")
      .mkString(", ")
    s"""WITH _hdt AS (SELECT $idExpr AS id, unnest($toks) AS t FROM $table),
       |_hds AS (SELECT id, CAST($h % $dims AS INTEGER) AS i,
       |    (($h >> 10) & 1) * 2 - 1 AS s FROM _hdt),
       |_hda AS (SELECT id, $sums FROM _hds GROUP BY id),
       |_hdn AS (SELECT *, $normSq AS nsq FROM _hda)
       |SELECT id AS $outIdAlias, $outs FROM _hdn ORDER BY id""".stripMargin
  }
}

/** Registry surface: adds `outputCol` to every row (the operator
  * contract pipelines expect).
  */
final class HashedDocEmbeddingRefiner(
    textCol: String = "text",
    idCol: String = "id",
    dims: Int = 16,
    outputCol: String = "embedding",
    hashName: String = "xxhash64") extends graft.core.Operator {
  val name = "hashed_doc_embedding"
  private val op = new HashedDocEmbedding(textCol, idCol, dims, hashName)
  def apply(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    op.attach(df, outputCol)
}
