package graft.queries

import graft.core.Tables
import graft.operators.events.Sessionize
import graft.operators.text.{BpePairCounts, CorpusDiff, CorpusOverlapReport}
import org.apache.spark.sql.functions._

/** Analytics gates: gap sessionization over the events stream, BPE
  * pair statistics, cross-source overlap reporting — each recomputed
  * from scratch by the DuckDB twin.
  */
object AnalyticsQueries {

  // fixed encode vocab for the bpe_encode_count gate (20 merges tuned
  // to the fixture lexicon so every rule actually fires)
  private val bpeMerges: Seq[(String, String)] = Seq(
    "t" -> "h", "th" -> "e", "the" -> "</w>",
    "s" -> "p", "sp" -> "a", "spa" -> "r", "spar" -> "k", "spark" -> "</w>",
    "j" -> "o", "jo" -> "i", "joi" -> "n", "join" -> "</w>",
    "d" -> "a", "da" -> "t", "dat" -> "a", "data" -> "</w>",
    "e" -> "r", "er" -> "</w>", "i" -> "n", "in" -> "</w>")

  private val sessionOp = new Sessionize(gapMinutes = 30)
  private val bpeOp = new BpePairCounts(topK = 40)

  private val sftOp = new graft.operators.text.ConversationAssembly(
    keyCol = "user_id", tsCol = "ts", tieCol = "event_id",
    roleCol = "event_type", contentCol = "props", maxTurns = 8)

  private val sftLastOp = new graft.operators.text.ConversationAssembly(
    keyCol = "user_id", tsCol = "ts", tieCol = "event_id",
    roleCol = "event_type", contentCol = "props", maxTurns = 8,
    keep = "last")

  private val convQualityOp = new graft.operators.text.ConversationQuality(
    keyCol = "user_id", tsCol = "ts", tieCol = "event_id",
    roleCol = "event_type", contentCol = "props")

  private val trendOp = new graft.operators.events.EventTrend("ts", "event_type")
  private val overlapOp = new CorpusOverlapReport(hashName = "portable")
  private val viterbiOp = new graft.operators.text.UnigramViterbiCount(
    "text", "doc_id", seedMaxLen = 4, topK = 200)
  private val overlapMatrixOp =
    new graft.operators.text.CorpusOverlapMatrix(hashName = "portable")

  /** Overlap fixture: the documents fixture has no cross-source dups,
    * so plant three shared-text classes spanning sources (identical
    * CASE chain both engines, first match wins).
    */
  private def overlapAugSpark(t: org.apache.spark.sql.Column) =
    when(col("doc_id") % 11 === 0,
      concat(lit("shared overlap body number "), (col("doc_id") % 3).cast("string")))
      .otherwise(t)

  private val overlapAugSql =
    """(CASE WHEN doc_id % 11 = 0
      |  THEN 'shared overlap body number ' || CAST(doc_id % 3 AS VARCHAR)
      |  ELSE text END)""".stripMargin

  val queries: Seq[OracleQuery] = Seq(

    OracleQuery("sessionize",
      (s, dir) => sessionOp.sessions(Tables.events(s, dir))
        .orderBy(col("user_id"), col("session_idx")),
      Some(sessionOp.sql("events") + "\nORDER BY user_id, session_idx")),

    OracleQuery("sft_pack",
      // SFT conversation assembly: per-user event streams serialized to
      // role-tagged transcripts, first-8-turns truncation, md5-audited
      (s, dir) => sftOp(Tables.events(s, dir)).orderBy(col("user_id")),
      Some(sftOp.sql("events") + "\nORDER BY user_id")),

    OracleQuery("sft_pack_keep_last",
      // context-window packing that keeps the MOST RECENT turns (r15):
      // same md5-audited chronological serialization, tail truncation
      (s, dir) => sftLastOp(Tables.events(s, dir)).orderBy(col("user_id")),
      Some(sftLastOp.sql("events") + "\nORDER BY user_id")),

    OracleQuery("events_trend",
      // Mann-Kendall monotone trend per type over hourly counts — the
      // outlier-robust companion to the OLS slope
      (s, dir) => trendOp(Tables.events(s, dir)),
      Some(trendOp.sql("events"))),

    OracleQuery("conversation_quality",
      // the pre-packing structural validator: alternation violations,
      // empty turns, turn-length profile per conversation
      (s, dir) => convQualityOp(Tables.events(s, dir)).orderBy(col("user_id")),
      Some(convQualityOp.sql("events") + "\nORDER BY user_id")),

    OracleQuery("bpe_pair_counts",
      (s, dir) => bpeOp.pairCounts(Tables(s, dir, "documents")),
      Some(bpeOp.sql("documents"))),

    OracleQuery("unigram_viterbi_count",
      // distributed Viterbi segmentation count under the seed unigram
      // vocab — integer-scaled log-probs + exact packed-BIGINT DP, so
      // the oracle re-derives the vocab AND replays every
      // segmentation decision bit-for-bit (no float comparisons)
      (s, dir) => {
        val docs = Tables(s, dir, "documents")
        viterbiOp(docs, viterbiOp.vocabScaled(docs))
      },
      Some(viterbiOp.sql("documents"))),

    OracleQuery("unigram_seed_counts",
      // unigram-LM round 0: the distributed seed-substring counts
      // (every 1..4-gram of every distinct word, weighted by word
      // frequency) the EM trainer prunes from — exact BIGINTs
      (s, dir) => new graft.operators.text.UnigramLmInduction("text")
        .seedCounts(Tables(s, dir, "documents"), topK = 40),
      Some(new graft.operators.text.UnigramLmInduction("text")
        .seedCountsSql("documents", topK = 40))),

    // KMV sketch estimate vs the oracle recomputing the SAME sketch from
    // the k-th smallest distinct hash — checks the sketch, not just the
    // neighborhood of the true count.
    OracleQuery("kmv_distinct",
      (s, dir) => Tables(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n_rows"),
          round(graft.functions.KmvSketch.kmvDistinct(
            graft.functions.HashFunctions.portableHash64(col("l_partkey")), 128), 6)
            .as("est_partkeys"))
        .orderBy(col("l_returnflag")),
      Some(s"""WITH ${graft.functions.KmvSketch.sqlCte("l_returnflag",
                 graft.functions.HashFunctions.portableHash64Sql("CAST(l_partkey AS VARCHAR)"),
                 "lineitem", 128)},
              |cnt AS (SELECT l_returnflag, count(*) AS n_rows FROM lineitem GROUP BY 1)
              |SELECT cnt.l_returnflag, cnt.n_rows, round(_kmv.est, 6) AS est_partkeys
              |FROM cnt JOIN _kmv USING (l_returnflag) ORDER BY l_returnflag""".stripMargin)),

    // HLL distinct estimate vs the oracle recomputing the SAME sketch:
    // exact register table (idx, max rho) from the identical 60-bit
    // hash, integer harmonic denominator, mirrored branch/float steps —
    // the gate hash-checks the sketch, not the neighborhood of the true
    // count. Exact distinct rides alongside as the accuracy readout.
    OracleQuery("hll_distinct",
      // plan hygiene, measured on this gate: (1) the hash is STAGED in
      // the scan projection (codegen'd, once per row) instead of riding
      // inside the sketch's child; (2) the exact countDistinct runs in
      // its OWN aggregation joined on the 3 group rows — mixing a
      // distinct aggregate with a TypedImperativeAggregate in one
      // Aggregate node forces the expand + sort-agg plan on the DOUBLED
      // input (2.3 s fused vs 1.3 s split at sf0.1)
      (s, dir) => {
        val staged = Tables(s, dir, "lineitem")
          .select(col("l_returnflag"), col("l_partkey"),
            graft.functions.HashFunctions.portableHash64(col("l_partkey")).as("_h"))
        val sketch = staged.groupBy(col("l_returnflag"))
          .agg(count(lit(1)).as("n_rows"),
            round(graft.functions.HllSketch.hllDistinct(col("_h"), 12), 6)
              .as("est_partkeys"))
        val exact = staged.groupBy(col("l_returnflag"))
          .agg(countDistinct(col("l_partkey")).as("exact_partkeys"))
        sketch.join(exact, Seq("l_returnflag"))
          .select(col("l_returnflag"), col("n_rows"),
            col("exact_partkeys"), col("est_partkeys"))
          .orderBy(col("l_returnflag"))
      },
      Some(s"""WITH ${graft.functions.HllSketch.sqlCte("l_returnflag",
                 graft.functions.HashFunctions.portableHash64Sql("CAST(l_partkey AS VARCHAR)"),
                 "lineitem", 12)},
              |cnt AS (SELECT l_returnflag, count(*) AS n_rows,
              |    count(DISTINCT l_partkey) AS exact_partkeys
              |  FROM lineitem GROUP BY 1)
              |SELECT cnt.l_returnflag, cnt.n_rows, cnt.exact_partkeys,
              |  round(_hll.est, 6) AS est_partkeys
              |FROM cnt JOIN _hll USING (l_returnflag) ORDER BY l_returnflag""".stripMargin)),

    // HLL sketch ALGEBRA as a gate: registers built per half-corpus
    // (l_orderkey parity), merged by element-wise max, estimated
    // declaratively — must equal the whole-corpus estimate EXACTLY
    // (max over a partition of the rows is max over the rows). The
    // oracle computes only the whole-corpus sketch: any drift in the
    // merge or the register-array estimator path breaks the hash.
    OracleQuery("hll_union_merge",
      (s, dir) => {
        import graft.functions.{HashFunctions, HllSketch}
        val p = 12
        val li = Tables(s, dir, "lineitem")
        def regs(half: org.apache.spark.sql.DataFrame, name: String) =
          half.groupBy(col("l_returnflag"))
            .agg(HllSketch.hllRegisters(
              HashFunctions.portableHash64(col("l_partkey")), p).as(name))
        regs(li.where(col("l_orderkey") % 2 === 0), "ra")
          .join(regs(li.where(col("l_orderkey") % 2 === 1), "rb"), Seq("l_returnflag"))
          .select(col("l_returnflag"),
            round(HllSketch.estimateRegisters(
              HllSketch.mergeRegisters(col("ra"), col("rb")), p), 6).as("est_union"))
          .orderBy(col("l_returnflag"))
      },
      Some(s"""WITH ${graft.functions.HllSketch.sqlCte("l_returnflag",
                 graft.functions.HashFunctions.portableHash64Sql("CAST(l_partkey AS VARCHAR)"),
                 "lineitem", 12)}
              |SELECT l_returnflag, round(est, 6) AS est_union
              |FROM _hll ORDER BY l_returnflag""".stripMargin)),

    // Semi-structured extraction: the events `props` JSON column parsed
    // with the codegen'd path expression (no UDF), aggregated per type.
    OracleQuery("events_json_extract",
      (s, dir) => Tables.events(s, dir)
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), round(avg(col("k")), 6).as("avg_k"),
          max(col("k")).as("max_k"),
          count(when(col("k").isNull, 1)).as("n_null"))
        .orderBy(col("event_type")),
      Some("""WITH x AS (SELECT event_type,
             |  CAST(json_extract(props, '$.k') AS BIGINT) AS k FROM events)
             |SELECT event_type, count(*) AS n, round(avg(k), 6) AS avg_k,
             |  max(k) AS max_k,
             |  CAST(sum(CASE WHEN k IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null
             |FROM x GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Snapshot diff: crawl-N vs derived crawl-N+1 (drops, edits, adds by
    // deterministic id rules mirrored in both engines), statused by a
    // hash-only full-outer join.
    OracleQuery("corpus_diff",
      (s, dir) => {
        val docs = Tables(s, dir, "documents").select(col("doc_id"), col("text"))
        val neu = docs.where(col("doc_id") % 17 =!= 0)
          .withColumn("text", when(col("doc_id") % 13 === 0,
            concat(col("text"), lit(" v2"))).otherwise(col("text")))
          .unionByName(docs.where(col("doc_id") % 19 === 0)
            .select((col("doc_id") + 1000000L).as("doc_id"),
              concat(col("text"), lit(" new")).as("text")))
        new CorpusDiff("doc_id", "text", "portable").diff(docs, neu)
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH newt AS (
              |  SELECT doc_id, CASE WHEN doc_id % 13 = 0 THEN text || ' v2' ELSE text END AS text
              |  FROM documents WHERE doc_id % 17 <> 0
              |  UNION ALL
              |  SELECT doc_id + 1000000 AS doc_id, text || ' new' AS text
              |  FROM documents WHERE doc_id % 19 = 0)
              |SELECT * FROM (${new CorpusDiff("doc_id", "text", "portable")
                 .sql("SELECT doc_id, text FROM documents", "SELECT doc_id, text FROM newt")})
              |ORDER BY doc_id""".stripMargin)),

    // Entity-resolution fuzzy join: customers vs a perturbed copy
    // (append / prepend edits), q-gram banding with the hot-gram cap
    // active (every name shares the "customer#0000…" prefix grams),
    // levenshtein-verified; aggregated per left key.
    OracleQuery("fuzzy_join", {
      val op = new graft.operators.text.FuzzyJoin(
        "lkey", "lname", "rkey", "rname", maxDistance = 2, q = 3, maxGramKeys = 200,
        hashName = "portable")
      (s, dir) => {
        val cust = Tables(s, dir, "customer")
        val left = cust.select(col("c_custkey").as("lkey"), lower(col("c_name")).as("lname"))
        val right = cust.select((col("c_custkey") + 100000L).as("rkey"),
          when(col("c_custkey") % 2 === 0, concat(lower(col("c_name")), lit("x")))
            .otherwise(concat(lit("zz"), lower(col("c_name")))).as("rname"))
        op.pairs(left, right)
          .groupBy(col("lkey"))
          .agg(count(lit(1)).as("n_matches"), min(col("dist")).as("best_dist"))
          .orderBy(col("lkey"))
      }
    },
      Some(s"""WITH ${new graft.operators.text.FuzzyJoin(
                 "lkey", "lname", "rkey", "rname", maxDistance = 2, q = 3, maxGramKeys = 200,
                 hashName = "portable")
                 .pairsSql(
                   "SELECT c_custkey AS lkey, lower(c_name) AS lname FROM customer",
                   "SELECT c_custkey + 100000 AS rkey, CASE WHEN c_custkey % 2 = 0 " +
                     "THEN lower(c_name) || 'x' ELSE 'zz' || lower(c_name) END AS rname " +
                     "FROM customer")}
              |SELECT lkey, count(*) AS n_matches, min(dist) AS best_dist
              |FROM _fjout GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Mergeable top-k aggregate vs the all-rows rank window it replaces
    // (the window IS the oracle — same multiset of extreme values).
    OracleQuery("topk_per_group",
      (s, dir) => Tables(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(graft.functions.TopKAgg.topKValues(col("l_extendedprice"), 5).as("tv"))
        .select(col("l_returnflag"), posexplode(col("tv")).as(Seq("pos", "value")))
        .select(col("l_returnflag"), (col("pos") + 1).cast("long").as("rank"), col("value"))
        .orderBy(col("l_returnflag"), col("rank")),
      Some("""SELECT l_returnflag, CAST(rn AS BIGINT) AS rank, v AS value FROM (
             |  SELECT l_returnflag, l_extendedprice AS v, row_number() OVER (
             |    PARTITION BY l_returnflag ORDER BY l_extendedprice DESC) AS rn
             |  FROM lineitem) t
             |WHERE rn <= 5 ORDER BY l_returnflag, rank""".stripMargin)),

    // Z-order codes for (user, day) layout — every Morton code
    // hash-checked against the identical magic-mask pipeline in DuckDB.
    OracleQuery("zorder_code",
      (s, dir) => Tables.events(s, dir)
        .select(col("event_id"), graft.functions.ZOrder.morton(
          col("user_id"), expr("unix_micros(ts) DIV 86400000000")).as("z"))
        .orderBy(col("event_id")),
      Some(s"""SELECT event_id, ${graft.functions.ZOrder.mortonSql(
                 "user_id", "(epoch_us(ts) // 86400000000)")} AS z
              |FROM events ORDER BY event_id""".stripMargin)),

    // Sketch-only cross-source overlap: per-source KMV sketches (k·8
    // bytes each) estimate pairwise Jaccard / union / intersection with
    // NO corpus join — the oracle rebuilds the identical estimates from
    // the raw hash sets. Exact twin: `corpus_overlap_report`.
    OracleQuery("kmv_overlap",
      (s, dir) => {
        val k = 32
        val aug = Tables(s, dir, "documents")
          .withColumn("text", overlapAugSpark(col("text")))
        val sk = aug.groupBy(col("source"))
          .agg(graft.functions.KmvSketch.kmvSketchArr(
            graft.functions.HashFunctions.portableHash64(col("text")), k).as("sk"))
        val a = sk.select(col("source").as("source_a"), col("sk").as("ska"))
        val b = sk.select(col("source").as("source_b"), col("sk").as("skb"))
        val (ej, eu, eo) = graft.functions.KmvSketch.overlap(col("ska"), col("skb"), k)
        a.join(b, col("source_a") < col("source_b"))
          .select(col("source_a"), col("source_b"),
            round(ej, 6).as("est_jaccard"), round(eu, 6).as("est_union"),
            round(eo, 6).as("est_overlap"))
          .orderBy(col("source_a"), col("source_b"))
      },
      {
        val k = 32
        val hv = graft.functions.HashFunctions.portableHash64Sql("text")
        Some(s"""WITH aug AS (SELECT doc_id, $overlapAugSql AS text, source FROM documents),
                |h AS (SELECT DISTINCT source, $hv AS hv FROM aug),
                |srcs AS (SELECT DISTINCT source FROM h),
                |pr AS (SELECT a.source AS source_a, b.source AS source_b
                |       FROM srcs a JOIN srcs b ON a.source < b.source),
                |uh AS (SELECT pr.source_a, pr.source_b, h.hv,
                |         max(CASE WHEN h.source = pr.source_a THEN 1 ELSE 0 END) AS in_a,
                |         max(CASE WHEN h.source = pr.source_b THEN 1 ELSE 0 END) AS in_b
                |       FROM pr JOIN h ON h.source IN (pr.source_a, pr.source_b)
                |       GROUP BY 1, 2, 3),
                |rk AS (SELECT *,
                |         row_number() OVER (PARTITION BY source_a, source_b ORDER BY hv) AS rn,
                |         count(*) OVER (PARTITION BY source_a, source_b) AS d_full FROM uh),
                |est AS (SELECT source_a, source_b,
                |    CAST(sum(CASE WHEN rn <= $k AND in_a = 1 AND in_b = 1 THEN 1 ELSE 0 END) AS DOUBLE)
                |      / CAST(CASE WHEN max(d_full) < $k THEN max(d_full) ELSE $k END AS DOUBLE) AS ej,
                |    CASE WHEN max(d_full) < $k THEN CAST(max(d_full) AS DOUBLE)
                |         ELSE (CAST(${k - 1} AS DOUBLE) * CAST(1152921504606846976 AS DOUBLE))
                |              / CAST(max(CASE WHEN rn = $k THEN hv END) AS DOUBLE) END AS eu
                |  FROM rk GROUP BY 1, 2)
                |SELECT source_a, source_b, round(ej, 6) AS est_jaccard,
                |       round(eu, 6) AS est_union, round(ej * eu, 6) AS est_overlap
                |FROM est ORDER BY source_a, source_b""".stripMargin)
      }),

    OracleQuery("corpus_overlap_report",
      (s, dir) => overlapOp.report(
        Tables(s, dir, "documents").withColumn("text", overlapAugSpark(col("text"))))
        .orderBy(col("source")),
      Some(s"""WITH aug AS (SELECT doc_id, $overlapAugSql AS text, source FROM documents)
              |SELECT * FROM (${overlapOp.sql("aug")}) ORDER BY source""".stripMargin)),

    // The pair-level drill-down: WHICH two sources share texts, and how
    // many distinct texts per pair — per-hash sorted-source-list pair
    // expansion, no self-join (bounded by S² per distinct text).
    OracleQuery("corpus_overlap_matrix",
      (s, dir) => overlapMatrixOp.matrix(
        Tables(s, dir, "documents").withColumn("text", overlapAugSpark(col("text")))),
      Some(s"""WITH aug AS (SELECT doc_id, $overlapAugSql AS text, source FROM documents)
              |SELECT * FROM (${overlapMatrixOp.sql("aug")})
              |ORDER BY source_a, source_b""".stripMargin)),

    // Distributed BPE encode under a FIXED learned merge list (training
    // itself is spec-pinned on the Sennrich worked example; the oracle
    // needs a plan-time-constant vocab): per-doc encoded token counts,
    // the number a token-budget sampler or sequence packer consumes.
    OracleQuery("bpe_encode_count",
      (s, dir) => Tables(s, dir, "documents")
        .select(col("doc_id"),
          size(graft.functions.TextFunctions.tokensOf(col("text"))).cast("long").as("n_words"),
          graft.operators.text.BpeEncode.tokenCount(col("text"), bpeMerges).as("n_tokens"))
        .orderBy(col("doc_id")),
      Some(
        s"""SELECT doc_id,
           |  CAST(len(${graft.functions.TextFunctions.tokensOfSql("text")}) AS BIGINT) AS n_words,
           |  ${graft.operators.text.BpeEncode.tokenCountSql("text", bpeMerges)} AS n_tokens
           |FROM documents ORDER BY doc_id""".stripMargin)),

    // Mergeable fixed-width-histogram quantile sketch — the bounded-
    // memory quantile path (vs the exact q12_percentile tier): sketch
    // size = range/width however many rows feed it, estimates bracket
    // the true inverted-CDF quantile within one bin width.
    OracleQuery("histogram_quantile",
      (s, dir) => graft.operators.stats.HistogramQuantile.quantiles(
        Tables(s, dir, "lineitem"), "l_extendedprice", 1000.0,
        Seq(0.5, 0.9, 0.99)),
      Some(graft.operators.stats.HistogramQuantile.sql(
        "lineitem", "l_extendedprice", 1000.0, Seq(0.5, 0.9, 0.99)))),

    // Rolling z-score anomaly detection on the densified per-(type,
    // hour) count spine: trailing-24h frame excludes the current hour,
    // all windows ride the spine (|types|x|hours| rows), never the
    // event stream
    OracleQuery("events_anomaly",
      (s, dir) => anomalyOp(Tables.events(s, dir)),
      Some(anomalyOp.sql("events"))),

    // 168-cell dow x hour traffic profile (exact counts + shares; the
    // dow convention cross-engine pin: 0 = Sunday in BOTH)
    OracleQuery("events_seasonality",
      (s, dir) => seasonOp(Tables.events(s, dir)),
      Some(seasonOp.sql("events")))
  )

  private lazy val seasonOp = new graft.operators.events.Seasonality()

  private lazy val anomalyOp = new graft.operators.events.EventAnomaly()
}
