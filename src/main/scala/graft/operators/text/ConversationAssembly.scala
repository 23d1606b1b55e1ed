package graft.operators.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SFT conversation assembly — serialize per-key event streams into
  * training-ready conversation transcripts (the chat/instruction-pair
  * packaging step between raw interaction logs and a fine-tuning run;
  * the reference ships no conversation surface at all). Each group's
  * turns render as `role: content` lines, ordered by `(ts, tiebreak)`,
  * truncated deterministically to `maxTurns` turns — `keep = "first"`
  * preserves the conversation opening (the default SFT packing shape);
  * `keep = "last"` preserves the most recent turns (context-window
  * packing for chat fine-tuning commonly keeps the tail — the model
  * trains on the latest exchange with its immediate history). Either
  * way the kept turns serialize in chronological order.
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
    maxTurns: Int = 8,
    keep: String = "first") extends graft.core.Operator {

  require(maxTurns >= 1, s"maxTurns must be >= 1, got $maxTurns")
  require(keep == "first" || keep == "last",
    s"keep must be 'first' or 'last', got '$keep'")

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
    val base = events.select(col(keyCol), col(tsCol), col(tieCol),
        concat(coalesce(col(roleCol), lit("")), lit(": "),
          coalesce(col(contentCol), lit(""))).as("_line"))
      .withColumn("_rn", row_number().over(w))
    // keep-last needs the group size; the count window shares the rank
    // window's key-partitioned exchange (no order — whole-partition
    // frame), so the plan stays one exchange either way
    val turns =
      if (keep == "first") base
      else base.withColumn("_n", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col(keyCol))))
    val kept =
      if (keep == "first") col("_rn") <= maxTurns
      else col("_rn") > col("_n") - maxTurns
    turns
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_events"),
        count(when(kept, lit(1))).as("n_turns"),
        // sort the kept (rank, line) structs, then join: deterministic
        // whatever order collect_list saw the rows in
        array_join(transform(
          array_sort(collect_list(when(kept,
            struct(col("_rn"), col("_line"))))),
          s => s.getField("_line")), "\n").as("_convo"))
      .select(col(keyCol), col("n_events"), col("n_turns"),
        length(col("_convo")).cast("long").as("n_chars"),
        md5(col("_convo")).as("convo_md5"))
  }

  // ---- DuckDB twin ----

  def sql(table: String): String = {
    val kept =
      if (keep == "first") s"_rn <= $maxTurns"
      else s"_rn > _n - $maxTurns"
    s"""WITH _ct AS (SELECT $keyCol,
       |    coalesce($roleCol, '') || ': ' || coalesce($contentCol, '') AS _line,
       |    row_number() OVER (PARTITION BY $keyCol
       |      ORDER BY $tsCol NULLS FIRST, $tieCol NULLS FIRST) AS _rn,
       |    count(*) OVER (PARTITION BY $keyCol) AS _n
       |  FROM $table)
       |SELECT $keyCol, count(*) AS n_events,
       |  count(CASE WHEN $kept THEN 1 END) AS n_turns,
       |  CAST(length(string_agg(CASE WHEN $kept THEN _line END,
       |    chr(10) ORDER BY _rn)) AS BIGINT) AS n_chars,
       |  md5(string_agg(CASE WHEN $kept THEN _line END,
       |    chr(10) ORDER BY _rn)) AS convo_md5
       |FROM _ct GROUP BY $keyCol""".stripMargin
  }
}

/** SFT-format validator over per-key turn streams — the structural
  * checks a fine-tuning pipeline runs BEFORE packing transcripts
  * ([[ConversationAssembly]] serializes; this reports what's broken):
  * consecutive same-role turns (an alternation violation that confuses
  * chat templates), empty-content turns, and the turn-length profile.
  *
  * Exactness: violation/empty counts are exact BIGINTs off one
  * key-partitioned lag; `avg_turn_chars` is one fixed-shape division
  * over exact sums, rounded — the twin replays it. NULL roles compare
  * null-safely (`<=>` / IS NOT DISTINCT FROM): two consecutive NULL
  * roles ARE a repeat.
  *
  * Scale shape: one exchange on the conversation key; the lag window is
  * key-partitioned (bounded per conversation), never corpus-wide.
  */
final class ConversationQuality(
    keyCol: String = "user_id",
    tsCol: String = "ts",
    tieCol: String = "event_id",
    roleCol: String = "event_type",
    contentCol: String = "props") extends graft.core.Operator {

  val name = "conversation_quality"

  /** `(keyCol, n_turns, role_repeats, empty_turns, avg_turn_chars)`. */
  def apply(events: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
    events.select(col(keyCol), col(tsCol), col(tieCol),
        col(roleCol).as("_role"),
        length(coalesce(col(contentCol), lit(""))).cast("long").as("_len"))
      .withColumn("_prev", lag(col("_role"), 1).over(w))
      .withColumn("_first", row_number().over(w) === 1)
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_turns"),
        count(when(!col("_first") && (col("_role") <=> col("_prev")), lit(1)))
          .as("role_repeats"),
        count(when(col("_len") === 0L, lit(1))).as("empty_turns"),
        round(sum(col("_len")).cast("double") / count(lit(1)).cast("double"), 6)
          .as("avg_turn_chars"))
  }

  // ---- DuckDB twin ----

  def sql(table: String): String =
    s"""WITH _cq AS (SELECT $keyCol, $roleCol AS _role,
       |    CAST(length(coalesce($contentCol, '')) AS BIGINT) AS _len,
       |    lag($roleCol) OVER (PARTITION BY $keyCol
       |      ORDER BY $tsCol NULLS FIRST, $tieCol NULLS FIRST) AS _prev,
       |    row_number() OVER (PARTITION BY $keyCol
       |      ORDER BY $tsCol NULLS FIRST, $tieCol NULLS FIRST) = 1 AS _first
       |  FROM $table)
       |SELECT $keyCol, count(*) AS n_turns,
       |  count(CASE WHEN NOT _first AND _role IS NOT DISTINCT FROM _prev
       |    THEN 1 END) AS role_repeats,
       |  count(CASE WHEN _len = 0 THEN 1 END) AS empty_turns,
       |  round(CAST(sum(_len) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6)
       |    AS avg_turn_chars
       |FROM _cq GROUP BY $keyCol""".stripMargin
}
