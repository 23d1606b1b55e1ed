package graft.operators.text

import graft.core.Operator
import graft.functions.{HashFunctions, TextFunctions}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sequence packing — assign every document a training
  * shard and a token-budget bin inside it, the export step that turns a
  * curated corpus into fixed-size training shards (beyond the
  * reference's operator surface, like the rest of the training-data
  * family). Documents hash to `numShards` shards (same salt-keyed
  * portable/xxhash64 families as [[DeterministicSampleFilter]], so
  * shard membership is reproducible across runs and clusters), and
  * within a shard the contiguous fill by id order packs documents into
  * bins of `maxTokens`: a document starts bin `k` when its cumulative
  * predecessor token count reaches `k * maxTokens`. A document longer
  * than the budget keeps the bin where it starts (training-side
  * chunking splits it downstream). Outputs: `pack_tokens` (the
  * document's whitespace token count), `pack_shard`, `pack_bin`,
  * `pack_pos` (1-based position within the bin).
  *
  * Scale shape: no global sort — the only shuffle is the hash partition
  * on `pack_shard`, and both windows ride that one exchange (same
  * partition key). Size `numShards` so a shard's rows fit an executor
  * (at 100 TB: 10⁵–10⁶ shards); the cumulative sums stay well under
  * 2^53, so the double division in the bin computation is exact.
  */
final class SequencePackRefiner(
    textCol: String = "text",
    idCol: String = "id",
    maxTokens: Long = 2048,
    numShards: Int = 16,
    hashName: String = "xxhash64",
    salt: String = "") extends Operator {

  require(maxTokens >= 1, s"maxTokens $maxTokens must be >= 1")
  require(numShards >= 1, s"numShards $numShards must be >= 1")
  val name = "sequence_pack"

  private def packed(df: DataFrame): DataFrame = {
    val shard = pmod(HashFunctions.hashByName(hashName)(
      concat(col(idCol).cast("string"), lit(salt))), lit(numShards.toLong))
    val d = df
      .withColumn("pack_tokens", TextFunctions.tokenCount(col(textCol)))
      .withColumn("pack_shard", shard)
    val w = Window.partitionBy(col("pack_shard")).orderBy(col(idCol))
    val cumBefore = sum(col("pack_tokens")).over(w) - col("pack_tokens")
    d.withColumn("pack_bin",
        floor(cumBefore.cast("double") / lit(maxTokens.toDouble)).cast("long"))
      .withColumn("pack_pos", row_number().over(
        Window.partitionBy(col("pack_shard"), col("pack_bin")).orderBy(col(idCol))))
  }

  def apply(df: DataFrame): DataFrame = packed(df)

  /** Disposition mode: pack positions are assigned over ALIVE rows only
    * — a rejected document must not occupy bin budget or shift its
    * shard's packing, exactly the sequential semantics. Dead rows keep
    * null pack columns.
    */
  override def applyGated(df: DataFrame, alive: Column): DataFrame = {
    val p = packed(df.filter(alive)).select(col(idCol).as("_sp_id"),
      col("pack_tokens"), col("pack_shard"), col("pack_bin"), col("pack_pos"))
    df.join(p, col(idCol) === col("_sp_id"), "left").drop("_sp_id")
  }

  /** DuckDB twin (portable hash family): CTE exposing
    * `_pack(id, pack_tokens, pack_shard, pack_bin, pack_pos)`.
    */
  def packCteSql(table: String): String = {
    require(hashName == "portable", "oracle covers the portable hash family")
    val h = HashFunctions.portableHash64Sql(s"(CAST($idCol AS VARCHAR) || '$salt')")
    s"""_pt AS (SELECT $idCol AS id,
       |    ${TextFunctions.tokenCountSql(textCol)} AS pack_tokens,
       |    ($h % $numShards) AS pack_shard FROM $table),
       |_pw AS (SELECT id, pack_tokens, pack_shard,
       |    CAST(sum(pack_tokens) OVER (PARTITION BY pack_shard ORDER BY id)
       |      AS BIGINT) - pack_tokens AS _cumb FROM _pt),
       |_pack AS (SELECT id, pack_tokens, pack_shard,
       |    CAST(floor(CAST(_cumb AS DOUBLE) / ${maxTokens.toDouble}) AS BIGINT) AS pack_bin,
       |    CAST(row_number() OVER (
       |      PARTITION BY pack_shard,
       |        CAST(floor(CAST(_cumb AS DOUBLE) / ${maxTokens.toDouble}) AS BIGINT)
       |      ORDER BY id) AS INT) AS pack_pos
       |  FROM _pw)""".stripMargin
  }
}
