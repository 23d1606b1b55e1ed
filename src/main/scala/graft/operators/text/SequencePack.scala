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
  // string-digest families (md5/sha256) would reach pmod as hex text,
  // cast to bigint as NULL, and silently collapse every row into one
  // NULL shard — only the long-valued families are legal here
  require(hashName == "xxhash64" || hashName == "portable",
    s"sequence packing shards on a LONG hash; got '$hashName' " +
      "(md5/sha256 digests are strings and would pmod to null)")
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

  /** Materialized training rows: one row per (shard, bin) with the
    * member documents concatenated in pack order — the terminal export
    * form (what actually ships to a trainer as a shard file). Output:
    * `pack_shard`, `pack_bin`, `pack_doc_count`, `pack_token_count`,
    * `pack_doc_ids` (in pack order), `pack_text` (documents joined by a
    * blank line). One groupBy shuffle on the (shard, bin) key; bin
    * contents are bounded by `maxTokens`, so no group outgrows memory.
    *
    * An aggregation boundary ends per-document reject tracking — run it
    * as the last stage (the disposition chain restarts clean after it:
    * all output bins alive).
    */
  def materialize(df: DataFrame): DataFrame = {
    val p = packed(df)
    p.groupBy(col("pack_shard"), col("pack_bin"))
      .agg(
        count(lit(1)).as("pack_doc_count"),
        sum(col("pack_tokens")).as("pack_token_count"),
        sort_array(collect_list(struct(col("pack_pos"), col(idCol).as("_id"),
          col(textCol).as("_t")))).as("_m"))
      .withColumn("pack_doc_ids", transform(col("_m"), m => m.getField("_id")))
      .withColumn("pack_text",
        concat_ws("\n\n", transform(col("_m"), m => coalesce(m.getField("_t"), lit("")))))
      .drop("_m")
  }

  /** Packing-efficiency report, per shard: how full the bins actually
    * are — the number a trainer cares about, since every unfilled token
    * slot is padding (wasted step compute) and every overflowing bin
    * forces a downstream split. `utilization` counts each bin's tokens
    * capped at the budget against `bins × maxTokens` capacity (the last
    * bin per shard is expectedly underfull; a doc longer than the
    * budget overflows the bin it starts). Exact BIGINT sums, one
    * fixed-shape division; the two aggregations ride the shard
    * exchange the packing already paid.
    */
  def packStats(df: DataFrame): DataFrame = {
    val perBin = packed(df)
      .groupBy(col("pack_shard"), col("pack_bin"))
      .agg(count(lit(1)).as("_docs"), sum(col("pack_tokens")).as("_btok"))
    perBin.groupBy(col("pack_shard"))
      .agg(count(lit(1)).as("bins"),
        sum(col("_docs")).as("docs"),
        sum(col("_btok")).as("tokens"),
        sum(least(col("_btok"), lit(maxTokens))).as("_used"),
        count(when(col("_btok") > maxTokens, lit(1))).as("overflow_bins"))
      .select(col("pack_shard"), col("bins"), col("docs"), col("tokens"),
        round(col("_used").cast("double") /
          (col("bins").cast("double") * lit(maxTokens.toDouble)), 6)
          .as("utilization"),
        col("overflow_bins"))
      .orderBy(col("pack_shard"))
  }

  /** DuckDB twin of [[packStats]]; compose after [[packCteSql]]. */
  def packStatsSql(table: String): String =
    s"""WITH ${packCteSql(table)},
       |_pb AS (SELECT pack_shard, pack_bin, count(*) AS docs,
       |    CAST(sum(pack_tokens) AS BIGINT) AS btok
       |  FROM _pack GROUP BY pack_shard, pack_bin)
       |SELECT pack_shard, count(*) AS bins,
       |  CAST(sum(docs) AS BIGINT) AS docs,
       |  CAST(sum(btok) AS BIGINT) AS tokens,
       |  round(CAST(CAST(sum(least(btok, $maxTokens)) AS BIGINT) AS DOUBLE)
       |    / (CAST(count(*) AS DOUBLE) * ${maxTokens.toDouble}), 6) AS utilization,
       |  count(CASE WHEN btok > $maxTokens THEN 1 END) AS overflow_bins
       |FROM _pb GROUP BY pack_shard ORDER BY pack_shard""".stripMargin

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

/** Registry form of [[SequencePackRefiner.materialize]]: one output row
  * per (shard, bin) — the terminal export stage. In disposition mode the
  * bins build from ALIVE documents only and the chain restarts clean
  * (every bin alive): an aggregation boundary inherently ends
  * per-document reject tracking, so place it last and route rejects in
  * the stages before it.
  */
final class SequencePackMaterializer(
    textCol: String = "text",
    idCol: String = "id",
    maxTokens: Long = 2048,
    numShards: Int = 16,
    hashName: String = "xxhash64",
    salt: String = "") extends Operator {

  val name = "sequence_pack_materialize"

  private val pack = new SequencePackRefiner(
    textCol, idCol, maxTokens, numShards, hashName, salt)

  def apply(df: DataFrame): DataFrame = pack.materialize(df)

  override def applyGated(df: DataFrame, alive: Column): DataFrame =
    graft.core.Disposition.init(pack.materialize(df.filter(alive)))
}
