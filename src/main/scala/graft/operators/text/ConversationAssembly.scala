package graft.operators.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SFT conversation assembly — serialize per-key event streams into
  * training-ready conversation transcripts (the chat/instruction-pair
  * packaging step between raw interaction logs and a fine-tuning run;
  * the reference ships no conversation surface at all). Each group's
  * turns render as `role: content` lines, ordered by `(ts, tiebreak)`,
  * truncated deterministically to the FIRST `maxTurns` turns (context
  * windows are bounded; keeping the earliest turns preserves the
  * conversation opening the way SFT packing does).
  *
  * Output per conversation: turn count (pre- and post-truncation),
  * serialized length, and the md5 of the transcript — the transcript
  * itself stays distributed; the hash is what audits/dedups it.
  *
  * Scale shape: one exchange on the conversation key; the turn-rank
  * window and the transcript aggregation are both partitioned by that
  * key (bounded per group — conversations are bounded by maxTurns
  * after the rank filter), never corpus-wide. `array_sort` of
  * `(rank, line)` structs makes the serialization order-invariant
  * under any partitioning.
  */
final class ConversationAssembly(
    keyCol: String = "user_id",
    tsCol: String = "ts",
    tieCol: String = "event_id",
    roleCol: String = "event_type",
    contentCol: String = "props",
    maxTurns: Int = 8) extends graft.core.Operator {

  require(maxTurns >= 1, s"maxTurns must be >= 1, got $maxTurns")

  val name = "conversation_assembly"

  /** `(keyCol, n_events, n_turns, n_chars, convo_md5)` per key, ordered
    * by nothing (caller orders). NULL role/content render as empty — the
    * line is never NULL, so Spark's array_join and DuckDB's string_agg
    * cannot diverge on null-element handling. The turn-rank window
    * orders NULLS FIRST explicitly on both sides (Spark's ascending
    * default; DuckDB defaults NULLS LAST — the r13 parity rule).
    */
  def apply(events: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
    val turns = events.select(col(keyCol), col(tsCol), col(tieCol),
        concat(coalesce(col(roleCol), lit("")), lit(": "),
          coalesce(col(contentCol), lit(""))).as("_line"))
      .withColumn("_rn", row_number().over(w))
    turns
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_events"),
        count(when(col("_rn") <= maxTurns, lit(1))).as("n_turns"),
        // sort the kept (rank, line) structs, then join: deterministic
        // whatever order collect_list saw the rows in
        array_join(transform(
          array_sort(collect_list(when(col("_rn") <= maxTurns,
            struct(col("_rn"), col("_line"))))),
          s => s.getField("_line")), "\n").as("_convo"))
      .select(col(keyCol), col("n_events"), col("n_turns"),
        length(col("_convo")).cast("long").as("n_chars"),
        md5(col("_convo")).as("convo_md5"))
  }

  // ---- DuckDB twin ----

  def sql(table: String): String =
    s"""WITH _ct AS (SELECT $keyCol,
       |    coalesce($roleCol, '') || ': ' || coalesce($contentCol, '') AS _line,
       |    row_number() OVER (PARTITION BY $keyCol
       |      ORDER BY $tsCol NULLS FIRST, $tieCol NULLS FIRST) AS _rn
       |  FROM $table)
       |SELECT $keyCol, count(*) AS n_events,
       |  count(CASE WHEN _rn <= $maxTurns THEN 1 END) AS n_turns,
       |  CAST(length(string_agg(CASE WHEN _rn <= $maxTurns THEN _line END,
       |    chr(10) ORDER BY _rn)) AS BIGINT) AS n_chars,
       |  md5(string_agg(CASE WHEN _rn <= $maxTurns THEN _line END,
       |    chr(10) ORDER BY _rn)) AS convo_md5
       |FROM _ct GROUP BY $keyCol""".stripMargin
}
