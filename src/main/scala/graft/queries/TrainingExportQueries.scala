package graft.queries

import graft.core.Tables
import graft.operators.text.{CcnetBucketRefiner, NgramLmScoreRefiner, SequencePackRefiner}
import org.apache.spark.sql.functions._

/** Gates for the training-export additions: deterministic sequence
  * packing (shard + token-budget bin assignment) and CCNet perplexity
  * bucketing composed on the corpus LM scorer. The oracles recompute
  * both in DuckDB from the raw table — the same salt-keyed hash/window
  * algebra for packing, `quantile_cont` (bit-identical to Spark's exact
  * `percentile`) over the re-derived LM scores for the buckets.
  */
object TrainingExportQueries {

  private val packOp = new SequencePackRefiner(
    "text", "doc_id", maxTokens = 512, numShards = 8,
    hashName = "portable", salt = "r9")

  private val lmOp = new NgramLmScoreRefiner("text", "doc_id")
  private val bucketOp = new CcnetBucketRefiner("lm_perplexity")

  val queries: Seq[OracleQuery] = Seq(

    OracleQuery("sequence_pack",
      (s, dir) => packOp(Tables(s, dir, "documents"))
        .select(col("doc_id"), col("pack_tokens"), col("pack_shard"),
          col("pack_bin"), col("pack_pos"))
        .orderBy(col("doc_id")),
      Some(s"""WITH ${packOp.packCteSql("documents")}
              |SELECT id AS doc_id, pack_tokens, pack_shard, pack_bin, pack_pos
              |FROM _pack ORDER BY doc_id""".stripMargin)),

    OracleQuery("sequence_pack_stats",
      // packing efficiency per shard: bin utilization (padding waste)
      // and overflowing bins — what the trainer's step compute costs
      (s, dir) => packOp.packStats(Tables(s, dir, "documents")),
      Some(packOp.packStatsSql("documents"))),

    OracleQuery("sequence_pack_materialize",
      (s, dir) => new graft.operators.text.SequencePackMaterializer(
        "text", "doc_id", maxTokens = 512, numShards = 8,
        hashName = "portable", salt = "r9")(Tables(s, dir, "documents"))
        .select(col("pack_shard"), col("pack_bin"), col("pack_doc_count"),
          col("pack_token_count"),
          concat_ws(",", col("pack_doc_ids")).as("pack_doc_ids"), col("pack_text"))
        .orderBy(col("pack_shard"), col("pack_bin")),
      Some(s"""WITH ${packOp.packCteSql("documents")}
              |SELECT pack_shard, pack_bin,
              |  CAST(count(*) AS BIGINT) AS pack_doc_count,
              |  CAST(sum(pack_tokens) AS BIGINT) AS pack_token_count,
              |  string_agg(CAST(p.id AS VARCHAR), ',' ORDER BY pack_pos) AS pack_doc_ids,
              |  string_agg(coalesce(d.text, ''), chr(10) || chr(10) ORDER BY pack_pos) AS pack_text
              |FROM _pack p JOIN documents d ON p.id = d.doc_id
              |GROUP BY pack_shard, pack_bin
              |ORDER BY pack_shard, pack_bin""".stripMargin)),

    OracleQuery("ccnet_bucket",
      (s, dir) => bucketOp(lmOp(Tables(s, dir, "documents")))
        .select(col("doc_id"),
          round(col("lm_perplexity"), 2).as("lm_perplexity"),
          col("ccnet_bucket"))
        .orderBy(col("doc_id")),
      Some {
        // the score CTE mirrors the ngram_lm_score gate's left join +
        // coalesce (empty docs score logprob 0 → perplexity 1.0)
        s"""WITH ${lmOp.scoreCteSql("documents", "doc_id")},
           |_s AS (SELECT d.doc_id,
           |  coalesce(l.lm_perplexity, 1.0) AS lm_perplexity
           |  FROM documents d LEFT JOIN _lm l ON d.doc_id = l.id),
           |${bucketOp.thresholdCteSql("_s", "lm_perplexity")}
           |SELECT doc_id, round(lm_perplexity, 2) AS lm_perplexity,
           |  ${bucketOp.bucketSql("lm_perplexity")} AS ccnet_bucket
           |FROM _s, _cb ORDER BY doc_id""".stripMargin
      }))
}
