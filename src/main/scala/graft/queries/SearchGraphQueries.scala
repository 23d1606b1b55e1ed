package graft.queries

import graft.core.Tables
import graft.functions.{CmsSketch, HashFunctions, TextFunctions}
import graft.operators.graph.{FixedPointPageRank, LabelPropagation}
import graft.operators.text.Bm25Retrieval
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gates for the retrieval/sketch/graph family: BM25 ranked search,
  * Count-Min-Sketch frequency estimates, fixed-point PageRank, and the
  * time-range moving-window aggregate. Each has a full DuckDB recompute
  * twin.
  */
object SearchGraphQueries {

  private val bm25 = new Bm25Retrieval(
    queryTerms = Seq("spark", "join", "window"), topK = 50)

  private val CmsDepth = 3
  private val CmsWidth = 1024
  private val cmsProbes = Seq("data", "spark", "join", "table", "agg", "zzz_absent")

  private val pagerank = new FixedPointPageRank(iterations = 5)

  private val bm25Hybrid = new Bm25Retrieval(
    queryTerms = Seq("spark", "join", "window"), topK = 20)

  private val invIndex = new graft.operators.text.InvertedIndex(
    minDocFreq = 2L, topTerms = 50, postingsCap = 10)

  // INDEPENDENTLY derived by the zlib twin (tools/gen_compression_oracle.py):
  // SyntheticTexts re-generated in Python from the integer spec, deflated by
  // CPython zlib at the kernel's pinned level (BEST_SPEED = 1; Java Deflater
  // and CPython zlib bind the same madler zlib, verified byte-equal), ratio
  // rounded like Spark round(col, 6). `python3
  // tools/gen_compression_oracle.py --check` asserts these blocks match the
  // twin; regenerate with the same script (no --check).
  private val compressionRatioValues = """  (CAST(0 AS BIGINT), CAST(223 AS BIGINT), CAST(0.699552 AS DOUBLE)),
  (CAST(1 AS BIGINT), CAST(798 AS BIGINT), CAST(0.061404 AS DOUBLE)),
  (CAST(2 AS BIGINT), CAST(274 AS BIGINT), CAST(0.879562 AS DOUBLE)),
  (CAST(3 AS BIGINT), CAST(121 AS BIGINT), CAST(0.520661 AS DOUBLE)),
  (CAST(4 AS BIGINT), CAST(0 AS BIGINT), CAST(1.000000 AS DOUBLE)),
  (CAST(5 AS BIGINT), CAST(959 AS BIGINT), CAST(0.311783 AS DOUBLE)),
  (CAST(6 AS BIGINT), CAST(988 AS BIGINT), CAST(0.052632 AS DOUBLE)),
  (CAST(7 AS BIGINT), CAST(459 AS BIGINT), CAST(0.827887 AS DOUBLE)),
  (CAST(8 AS BIGINT), CAST(106 AS BIGINT), CAST(0.500000 AS DOUBLE)),
  (CAST(9 AS BIGINT), CAST(1 AS BIGINT), CAST(9.000000 AS DOUBLE)),
  (CAST(10 AS BIGINT), CAST(681 AS BIGINT), CAST(0.396476 AS DOUBLE)),
  (CAST(11 AS BIGINT), CAST(858 AS BIGINT), CAST(0.057110 AS DOUBLE)),
  (CAST(12 AS BIGINT), CAST(237 AS BIGINT), CAST(0.898734 AS DOUBLE)),
  (CAST(13 AS BIGINT), CAST(111 AS BIGINT), CAST(0.495495 AS DOUBLE)),
  (CAST(14 AS BIGINT), CAST(12 AS BIGINT), CAST(1.666667 AS DOUBLE)),
  (CAST(15 AS BIGINT), CAST(385 AS BIGINT), CAST(0.633766 AS DOUBLE)),
  (CAST(16 AS BIGINT), CAST(1053 AS BIGINT), CAST(0.046534 AS DOUBLE)),
  (CAST(17 AS BIGINT), CAST(422 AS BIGINT), CAST(0.831754 AS DOUBLE)),
  (CAST(18 AS BIGINT), CAST(112 AS BIGINT), CAST(0.508929 AS DOUBLE)),
  (CAST(19 AS BIGINT), CAST(12 AS BIGINT), CAST(1.666667 AS DOUBLE)),
  (CAST(20 AS BIGINT), CAST(1117 AS BIGINT), CAST(0.280215 AS DOUBLE)),
  (CAST(21 AS BIGINT), CAST(897 AS BIGINT), CAST(0.054627 AS DOUBLE)),
  (CAST(22 AS BIGINT), CAST(200 AS BIGINT), CAST(0.920000 AS DOUBLE)),
  (CAST(23 AS BIGINT), CAST(116 AS BIGINT), CAST(0.517241 AS DOUBLE)),
  (CAST(24 AS BIGINT), CAST(85 AS BIGINT), CAST(1.129412 AS DOUBLE)),
  (CAST(25 AS BIGINT), CAST(834 AS BIGINT), CAST(0.334532 AS DOUBLE)),
  (CAST(26 AS BIGINT), CAST(1092 AS BIGINT), CAST(0.047619 AS DOUBLE)),
  (CAST(27 AS BIGINT), CAST(385 AS BIGINT), CAST(0.844156 AS DOUBLE)),
  (CAST(28 AS BIGINT), CAST(107 AS BIGINT), CAST(0.485981 AS DOUBLE)),
  (CAST(29 AS BIGINT), CAST(12 AS BIGINT), CAST(1.666667 AS DOUBLE)),
  (CAST(30 AS BIGINT), CAST(519 AS BIGINT), CAST(0.489403 AS DOUBLE)),
  (CAST(31 AS BIGINT), CAST(936 AS BIGINT), CAST(0.052350 AS DOUBLE)),
  (CAST(32 AS BIGINT), CAST(570 AS BIGINT), CAST(0.815789 AS DOUBLE)),
  (CAST(33 AS BIGINT), CAST(119 AS BIGINT), CAST(0.512605 AS DOUBLE)),
  (CAST(34 AS BIGINT), CAST(12 AS BIGINT), CAST(1.666667 AS DOUBLE)),
  (CAST(35 AS BIGINT), CAST(235 AS BIGINT), CAST(0.685106 AS DOUBLE)),
  (CAST(36 AS BIGINT), CAST(780 AS BIGINT), CAST(0.060256 AS DOUBLE)),
  (CAST(37 AS BIGINT), CAST(348 AS BIGINT), CAST(0.850575 AS DOUBLE)),
  (CAST(38 AS BIGINT), CAST(109 AS BIGINT), CAST(0.504587 AS DOUBLE)),
  (CAST(39 AS BIGINT), CAST(12 AS BIGINT), CAST(1.666667 AS DOUBLE)),
  (CAST(40 AS BIGINT), CAST(963 AS BIGINT), CAST(0.308411 AS DOUBLE)),
  (CAST(41 AS BIGINT), CAST(975 AS BIGINT), CAST(0.050256 AS DOUBLE)),
  (CAST(42 AS BIGINT), CAST(533 AS BIGINT), CAST(0.818011 AS DOUBLE)),
  (CAST(43 AS BIGINT), CAST(110 AS BIGINT), CAST(0.509091 AS DOUBLE)),
  (CAST(44 AS BIGINT), CAST(12 AS BIGINT), CAST(1.666667 AS DOUBLE)),
  (CAST(45 AS BIGINT), CAST(685 AS BIGINT), CAST(0.389781 AS DOUBLE)),
  (CAST(46 AS BIGINT), CAST(819 AS BIGINT), CAST(0.059829 AS DOUBLE)),
  (CAST(47 AS BIGINT), CAST(311 AS BIGINT), CAST(0.858521 AS DOUBLE)),
  (CAST(48 AS BIGINT), CAST(109 AS BIGINT), CAST(0.477064 AS DOUBLE)),
  (CAST(49 AS BIGINT), CAST(132 AS BIGINT), CAST(0.227273 AS DOUBLE)),
  (CAST(50 AS BIGINT), CAST(382 AS BIGINT), CAST(0.636126 AS DOUBLE)),
  (CAST(51 AS BIGINT), CAST(1014 AS BIGINT), CAST(0.048323 AS DOUBLE)),
  (CAST(52 AS BIGINT), CAST(496 AS BIGINT), CAST(0.820565 AS DOUBLE)),
  (CAST(53 AS BIGINT), CAST(107 AS BIGINT), CAST(0.467290 AS DOUBLE)),
  (CAST(54 AS BIGINT), CAST(12 AS BIGINT), CAST(1.666667 AS DOUBLE)),
  (CAST(55 AS BIGINT), CAST(1123 AS BIGINT), CAST(0.280499 AS DOUBLE)),
  (CAST(56 AS BIGINT), CAST(858 AS BIGINT), CAST(0.057110 AS DOUBLE)),
  (CAST(57 AS BIGINT), CAST(274 AS BIGINT), CAST(0.875912 AS DOUBLE)),
  (CAST(58 AS BIGINT), CAST(119 AS BIGINT), CAST(0.504202 AS DOUBLE)),
  (CAST(59 AS BIGINT), CAST(12 AS BIGINT), CAST(1.666667 AS DOUBLE))"""

  private val compressionKeepValues = """  (CAST(0 AS BIGINT)),
  (CAST(2 AS BIGINT)),
  (CAST(3 AS BIGINT)),
  (CAST(5 AS BIGINT)),
  (CAST(7 AS BIGINT)),
  (CAST(8 AS BIGINT)),
  (CAST(10 AS BIGINT)),
  (CAST(12 AS BIGINT)),
  (CAST(13 AS BIGINT)),
  (CAST(15 AS BIGINT)),
  (CAST(17 AS BIGINT)),
  (CAST(18 AS BIGINT)),
  (CAST(20 AS BIGINT)),
  (CAST(22 AS BIGINT)),
  (CAST(23 AS BIGINT)),
  (CAST(25 AS BIGINT)),
  (CAST(27 AS BIGINT)),
  (CAST(28 AS BIGINT)),
  (CAST(30 AS BIGINT)),
  (CAST(32 AS BIGINT)),
  (CAST(33 AS BIGINT)),
  (CAST(35 AS BIGINT)),
  (CAST(37 AS BIGINT)),
  (CAST(38 AS BIGINT)),
  (CAST(40 AS BIGINT)),
  (CAST(42 AS BIGINT)),
  (CAST(43 AS BIGINT)),
  (CAST(45 AS BIGINT)),
  (CAST(47 AS BIGINT)),
  (CAST(48 AS BIGINT)),
  (CAST(50 AS BIGINT)),
  (CAST(52 AS BIGINT)),
  (CAST(53 AS BIGINT)),
  (CAST(55 AS BIGINT)),
  (CAST(57 AS BIGINT)),
  (CAST(58 AS BIGINT))"""

  private def annTop20Sql =
    s"""WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
       |c AS (SELECT vec_id,
       |   ${graft.functions.VectorFunctions.cosineSql("embedding", "qe")} AS cos
       | FROM embeddings, q)
       |SELECT vec_id, round(cos, 6) AS cosine FROM c
       |ORDER BY cos DESC, vec_id LIMIT 20""".stripMargin

  private val HourUs = 3600000000L

  val queries: Seq[OracleQuery] = Seq(

    OracleQuery("bm25_topk",
      (s, dir) => bm25(Tables(s, dir, "documents")),
      Some(bm25.sql("documents"))),

    OracleQuery("hybrid_rrf_search",
      // lexical BM25 + dense cosine top-20 lists fused by reciprocal-
      // rank fusion over the shared id space — hybrid search's standard
      // no-tuning combiner; O(k) work after the bounded upstream top-ks
      (s, dir) => {
        val dense = graft.operators.vector.AnnSearch.bruteForceTopK(
            Tables(s, dir, "embeddings"),
            Tables(s, dir, "embeddings").filter(col("vec_id") === 0),
            "embedding", "vec_id", k = 20)
          .withColumn("cosine", round(col("cosine"), 6))
        graft.operators.text.HybridRetrieval.rrf(
          bm25Hybrid(Tables(s, dir, "documents")), "doc_id", "bm25_score",
          dense, "vec_id", "cosine")
      },
      Some(graft.operators.text.HybridRetrieval.rrfSql(
        bm25Hybrid.sql("documents"), "doc_id", "bm25_score",
        annTop20Sql, "vec_id", "cosine"))),

    OracleQuery("retrieval_ndcg",
      // the ranker eval loop: nDCG@10 + precision@10 of the BM25 top-20
      // against the lang=='en' relevance label — DCG via an
      // ascending-rank list fold (bit-identical to DuckDB list_reduce),
      // never an order-dependent float sum
      (s, dir) => {
        val lex = bm25Hybrid(Tables(s, dir, "documents"))
        val rel = Tables(s, dir, "documents")
          .select(col("doc_id"), (col("lang") === "en").as("rel"))
        graft.operators.ml.RankingMetrics.ndcgAtK(
          lex.join(rel, Seq("doc_id")), "doc_id", "bm25_score", "rel", k = 10)
      },
      Some(graft.operators.ml.RankingMetrics.ndcgSql(
        s"""SELECT b.doc_id, b.bm25_score, d.lang = 'en' AS rel
           |FROM (${bm25Hybrid.sql("documents")}) b
           |JOIN documents d ON d.doc_id = b.doc_id""".stripMargin,
        "doc_id", "bm25_score", "rel", k = 10))),

    OracleQuery("retrieval_mrr",
      // multi-query eval: MRR@10 of dense retrieval against same-label
      // relevance, self-matches excluded — the mean folds per-query RRs
      // in query order (never an order-dependent float sum)
      (s, dir) => {
        val emb = Tables(s, dir, "embeddings")
        val q = emb.filter(col("vec_id") < 5)
          .select(col("vec_id").as("query_id"), col("embedding").as("_qe"),
            col("label").as("_qlab"))
        val scored = emb.crossJoin(broadcast(q))
          .filter(col("vec_id") =!= col("query_id"))
          .select(col("query_id"), col("vec_id"),
            round(graft.functions.VectorFunctions.cosine(
              col("embedding"), col("_qe")), 6).as("cosine"),
            (col("label") === col("_qlab")).as("rel"))
        graft.operators.ml.RankingMetrics.mrrAtK(
          scored, "query_id", "vec_id", "cosine", "rel", k = 10)
      },
      Some(graft.operators.ml.RankingMetrics.mrrSql(
        s"""SELECT q.query_id, e.vec_id,
           |  round(${graft.functions.VectorFunctions.cosineSql("e.embedding", "q.qe")}, 6) AS cosine,
           |  e.label = q.qlab AS rel
           |FROM embeddings e, (SELECT vec_id AS query_id, embedding AS qe, label AS qlab
           |  FROM embeddings WHERE vec_id < 5) q
           |WHERE e.vec_id <> q.query_id""".stripMargin,
        "query_id", "vec_id", "cosine", "rel", k = 10))),

    OracleQuery("inverted_index",
      // (term, doc_freq, capped postings CSV) for the hottest terms —
      // posting lists via the bounded mergeable TopKAgg, never an
      // unbounded collect of a stop-word's full document list
      (s, dir) => invIndex(Tables(s, dir, "documents")),
      Some(invIndex.sql("documents"))),

    OracleQuery("cms_word_counts",
      (s, dir) => {
        val words = Tables(s, dir, "documents")
          .select(explode(TextFunctions.tokensOf(col("text"))).as("_w"))
          .select(col("_w"), HashFunctions.portableHash64(col("_w")).as("_h"))
        val aggCols = Seq(
          CmsSketch.cmsSketch(col("_h"), CmsDepth, CmsWidth).as("_sk")) ++
          cmsProbes.map(t =>
            sum(when(col("_w") === t, 1L).otherwise(0L)).as(s"_true_$t"))
        words.agg(aggCols.head, aggCols.tail: _*)
          .select(explode(array(cmsProbes.map(t => struct(
            lit(t).as("term"),
            CmsSketch.estimate(col("_sk"),
              HashFunctions.portableHash64(lit(t)), CmsDepth, CmsWidth)
              .as("est_count"),
            col(s"_true_$t").as("true_count"))): _*)).as("_p"))
          .select(col("_p.term"), col("_p.est_count"), col("_p.true_count"))
          .orderBy(col("term"))
      },
      Some {
        val probeRows = cmsProbes.map { t =>
          s"""SELECT '$t' AS term,
             |  ${CmsSketch.estimateSql(HashFunctions.portableHash64Sql(s"'$t'"), CmsDepth, CmsWidth)} AS est_count,
             |  (SELECT count(*) FROM _cms_words WHERE w = '$t') AS true_count""".stripMargin
        }.mkString("\nUNION ALL\n")
        s"""WITH _cms_words AS (
           |  SELECT unnest(${TextFunctions.tokensOfSql("text")}) AS w FROM documents),
           |${CmsSketch.rebuildCteSql(
              HashFunctions.portableHash64Sql("w"), "_cms_words", CmsDepth, CmsWidth)}
           |$probeRows
           |ORDER BY term""".stripMargin
      }),

    OracleQuery("triangle_count",
      // per-vertex triangle counts on the circulant graph C(n;1,2) over
      // doc ids (every consecutive id triple closes a triangle) — the
      // degree-ordered wedge join, two hash joins, exact BIGINTs
      (s, dir) => {
        val docs = Tables(s, dir, "documents")
        val n = docs.count()
        val edges = docs.select(col("doc_id").as("src"),
            ((col("doc_id") + 1) % n).as("dst"))
          .unionByName(docs.select(col("doc_id").as("src"),
            ((col("doc_id") + 2) % n).as("dst")))
        new graft.operators.graph.TriangleCount().counts(edges)
      },
      Some(new graft.operators.graph.TriangleCount().countsSql(
        """SELECT doc_id AS src, (doc_id + 1) % (SELECT count(*) FROM documents) AS dst FROM documents
          |UNION ALL
          |SELECT doc_id AS src, (doc_id + 2) % (SELECT count(*) FROM documents) AS dst FROM documents""".stripMargin))),

    OracleQuery("domain_pagerank",
      // deterministic synthetic link graph over doc ids (every node has
      // out-degree 2; both engines derive it from the same CASE-free
      // modular algebra), 5 fixed-point iterations
      (s, dir) => {
        val docs = Tables(s, dir, "documents")
        val n = docs.count()
        val nodes = docs.select(col("doc_id").as("id"))
        val edges = docs.select(col("doc_id").as("src"),
            ((col("doc_id") * 2 + 1) % n).as("dst"))
          .unionByName(docs.select(col("doc_id").as("src"),
            ((col("doc_id") * 3 + 7) % n).as("dst")))
        pagerank.ranks(nodes, edges)
          .select(col("id").as("doc_id"), col("rank_scaled"))
          .orderBy(col("doc_id"))
      },
      Some {
        val nodesSql = "SELECT doc_id AS id FROM documents"
        val edgesSql =
          """SELECT doc_id AS src, (doc_id * 2 + 1) % (SELECT count(*) FROM documents) AS dst FROM documents
            |UNION ALL
            |SELECT doc_id AS src, (doc_id * 3 + 7) % (SELECT count(*) FROM documents) AS dst FROM documents""".stripMargin
        s"""WITH ${pagerank.sqlCte(nodesSql, edgesSql)}
           |SELECT id AS doc_id, rk AS rank_scaled FROM _pr5 ORDER BY doc_id""".stripMargin
      }),

    OracleQuery("label_propagation",
      // community detection over a planted block graph (dense 10-node
      // blocks, one weak cross-block link per block): 4 synchronized
      // weighted-LPA rounds, ties to the smallest label — deterministic,
      // so the oracle unrolls the identical recurrence
      (s, dir) => {
        val docs = Tables(s, dir, "documents")
        val n = docs.count()
        val intra = docs.select(col("doc_id").as("src"),
          (expr("doc_id DIV 10") * 10 + (col("doc_id") * 3 + 1) % 10).as("dst"),
          (col("doc_id") % 5 + 1).as("n"))
        val cross = docs.where(col("doc_id") % 10 === 0)
          .select(col("doc_id").as("src"), ((col("doc_id") + 10) % n).as("dst"),
            lit(1L).as("n"))
        new LabelPropagation(iterations = 4)
          .communities(intra.unionByName(cross))
          .orderBy(col("id"))
      },
      Some {
        val edgesSql =
          """SELECT doc_id AS src, (doc_id // 10) * 10 + (doc_id * 3 + 1) % 10 AS dst,
            |       doc_id % 5 + 1 AS n FROM documents
            |UNION ALL
            |SELECT doc_id AS src, (doc_id + 10) % (SELECT count(*) FROM documents) AS dst,
            |       1 AS n FROM documents WHERE doc_id % 10 = 0""".stripMargin
        s"""WITH ${new LabelPropagation(iterations = 4).sqlCte(edgesSql)}
           |SELECT id, lbl AS community FROM _lp4 ORDER BY id""".stripMargin
      }),

    OracleQuery("compression_ratio",
      // hash-matched against the INDEPENDENT zlib twin
      // (tools/gen_compression_oracle.py) over the SyntheticTexts
      // fixture — no DuckDB zlib exists, so the oracle is a committed
      // VALUES block derived without running any Scala. The
      // documents-table pass keeps its determinism/bounds/monotonicity
      // spec coverage.
      (s, _) => new graft.operators.text.CompressionRatioRefiner()(
          graft.sources.SyntheticTexts.df(s))
        .select(col("doc_id"),
          octet_length(col("text")).cast("long").as("octet_len"),
          col("compression_ratio"))
        .orderBy(col("doc_id")),
      Some(s"""SELECT * FROM (VALUES
              |$compressionRatioValues
              |) AS t(doc_id, octet_len, compression_ratio) ORDER BY doc_id""".stripMargin)),

    OracleQuery("compression_ratio_filter",
      // the keep verdict at the default [0.25, 0.95] band over the same
      // fixture; DeflateKeep is ONE deflate pass per row, so this also
      // pins the fused predicate against the two-sided twin
      (s, _) => new graft.operators.text.CompressionRatioFilter()(
          graft.sources.SyntheticTexts.df(s))
        .select(col("doc_id"))
        .orderBy(col("doc_id")),
      Some(s"""SELECT * FROM (VALUES
              |$compressionKeepValues
              |) AS t(doc_id) ORDER BY doc_id""".stripMargin)),

    OracleQuery("events_debounce",
      // telemetry dedup: drop an event when the PREVIOUS event of the
      // same (user, type) is within 30min — the at-least-once-delivery
      // cleanup every event pipeline runs. lag-based, one user-keyed
      // exchange; kept = first of each burst. Ties on (ts) are ordered
      // by event_id in both engines, so the kept set is deterministic.
      (s, dir) => {
        val ev = Tables.events(s, dir)
          .select(col("event_id"), col("user_id"), col("event_type"),
            unix_micros(col("ts")).as("_us"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id"), col("event_type"))
          .orderBy(col("_us"), col("event_id"))
        ev.withColumn("_prev", lag(col("_us"), 1).over(w))
          .where(col("_prev").isNull || col("_us") - col("_prev") > 1800000000L)
          .select(col("event_id")).orderBy(col("event_id"))
      },
      Some("""SELECT event_id FROM (
             |  SELECT event_id, epoch_us(ts) - lag(epoch_us(ts)) OVER (
             |    PARTITION BY user_id, event_type
             |    ORDER BY epoch_us(ts), event_id) AS gap
             |  FROM events) t
             |WHERE gap IS NULL OR gap > 1800000000
             |ORDER BY event_id""".stripMargin)),

    OracleQuery("salted_join",
      // the skew-mitigation path as a GATE: 70% of events collapse onto
      // one hot key, the salted join spreads it over 8 salt tasks, and
      // the oracle is the PLAIN join — salting must be invisible in the
      // result (exact long counts/sums; the salt never reaches the
      // aggregate keys)
      (s, dir) => {
        val ev = Tables(s, dir, "events")
          .select(when(col("user_id") % 10 < 7, 0L)
            .otherwise(col("user_id")).as("k"))
        val dim = ev.select(col("k")).distinct()
          .withColumn("v", col("k") * 3 + 1)
        graft.core.Skew.saltedJoin(ev, dim, "k", salts = 8)
          .groupBy(col("k"))
          .agg(count(lit(1)).as("n"), sum(col("v")).as("vsum"))
          .orderBy(col("k"))
      },
      Some("""WITH ev AS (SELECT CASE WHEN user_id % 10 < 7 THEN 0
             |    ELSE user_id END AS k FROM events),
             |dim AS (SELECT k, k * 3 + 1 AS v FROM (SELECT DISTINCT k FROM ev))
             |SELECT ev.k, count(*) AS n, CAST(sum(v) AS BIGINT) AS vsum
             |FROM ev JOIN dim ON ev.k = dim.k
             |GROUP BY ev.k ORDER BY ev.k""".stripMargin)),

    OracleQuery("bloom_semi_join",
      // the runtime-filter path as a GATE: a bloom sketch built over the
      // (selective) orders build side prunes lineitem BEFORE its shuffle;
      // false positives are caught by the exact semi join behind it, so
      // the oracle is the PLAIN semi join — the prune must be invisible
      (s, dir) => {
        val build = Tables(s, dir, "orders")
          .where(col("o_totalprice") > 400000.0)
          .select(col("o_orderkey"))
        val li = Tables(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_returnflag"), col("l_quantity"))
        // minFactBytes = 0 forces the bloom path at gate scale — the
        // literal-embedded probe (collected sketch, no cross join)
        graft.core.BloomSemiJoin(li, build,
            col("l_orderkey"), col("o_orderkey"),
            numBits = 1 << 16, numHashes = 4, minFactBytes = 0L)
          .groupBy(col("l_returnflag"))
          .agg(count(lit(1)).as("n"),
            sum(col("l_quantity").cast("long")).as("qty"))
          .orderBy(col("l_returnflag"))
      },
      Some("""SELECT l_returnflag, count(*) AS n,
             |       CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
             |FROM lineitem
             |WHERE l_orderkey IN (SELECT o_orderkey FROM orders
             |                     WHERE o_totalprice > 400000)
             |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    OracleQuery("events_moving_window",
      // per-user trailing-1-hour frame over event time: RANGE, not ROWS,
      // so equal-timestamp peers are in-frame in both engines; values
      // floor-scaled to micros-longs so every aggregate is exact integer
      // arithmetic (a double sum's order-dependence would break the
      // cross-engine hash)
      (s, dir) => {
        val ev = Tables.events(s, dir)
          .select(col("event_id"), col("user_id"),
            unix_micros(col("ts")).as("_us"),
            expr("CAST(floor(value * 1000000) AS BIGINT)").as("_vs"))
        val w = Window.partitionBy(col("user_id")).orderBy(col("_us"))
          .rangeBetween(-HourUs, 0)
        ev.select(col("event_id"),
            count(lit(1)).over(w).as("cnt_1h"),
            sum(col("_vs")).over(w).as("sum_scaled_1h"),
            min(col("_vs")).over(w).as("min_scaled_1h"),
            max(col("_vs")).over(w).as("max_scaled_1h"))
          .orderBy(col("event_id"))
      },
      Some(s"""SELECT event_id,
              |  count(*) OVER w AS cnt_1h,
              |  CAST(sum(_vs) OVER w AS BIGINT) AS sum_scaled_1h,
              |  min(_vs) OVER w AS min_scaled_1h,
              |  max(_vs) OVER w AS max_scaled_1h
              |FROM (SELECT event_id, user_id, epoch_us(ts) AS _us,
              |        CAST(floor(value * 1000000) AS BIGINT) AS _vs FROM events)
              |WINDOW w AS (PARTITION BY user_id ORDER BY _us
              |  RANGE BETWEEN $HourUs PRECEDING AND CURRENT ROW)
              |ORDER BY event_id""".stripMargin)),

    // Graph health report: degree distribution + assortativity over a
    // deterministic skewed link graph (a 97-hub layer over a sparse
    // ring) — decimal(38,0)/HUGEINT moment sums, one degree exchange
    OracleQuery("graph_degree_stats",
      (s, dir) => {
        val docs = Tables(s, dir, "documents")
        val n = docs.count()
        val edges = docs.select(col("doc_id").as("src"),
            ((col("doc_id") * 2 + 1) % n).as("dst"))
          .unionByName(docs.select(col("doc_id").as("src"),
            (col("doc_id") % 97).as("dst")))
          .unionByName(docs.where(col("doc_id") % 3 === 0)
            .select(col("doc_id").as("src"), ((col("doc_id") + 1) % n).as("dst")))
        new graft.operators.graph.DegreeStats().apply(edges)
      },
      Some(new graft.operators.graph.DegreeStats().sql(
        """SELECT doc_id AS src, (doc_id * 2 + 1) % (SELECT count(*) FROM documents) AS dst FROM documents
          |UNION ALL
          |SELECT doc_id AS src, doc_id % 97 AS dst FROM documents
          |UNION ALL
          |SELECT doc_id AS src, (doc_id + 1) % (SELECT count(*) FROM documents) AS dst FROM documents
          |WHERE doc_id % 3 = 0""".stripMargin))),

    // k-core nucleus: 4 peel rounds at k=3 over a mixed-density ring
    // (~1/3 of nodes peel off through 2-hop cascades); the oracle
    // unrolls the identical rounds
    OracleQuery("kcore",
      (s, dir) => {
        val docs = Tables(s, dir, "documents")
        val n = docs.count()
        val edges = docs.select(col("doc_id").as("src"),
            ((col("doc_id") + 1) % n).as("dst"))
          .unionByName(docs.where(col("doc_id") % 2 === 0)
            .select(col("doc_id").as("src"), ((col("doc_id") + 2) % n).as("dst")))
          .unionByName(docs.where(col("doc_id") % 3 === 0)
            .select(col("doc_id").as("src"), ((col("doc_id") + 3) % n).as("dst")))
        new graft.operators.graph.KCore(k = 3, rounds = 4).apply(edges)
      },
      Some(new graft.operators.graph.KCore(k = 3, rounds = 4).sql(
        """SELECT doc_id AS src, (doc_id + 1) % (SELECT count(*) FROM documents) AS dst FROM documents
          |UNION ALL
          |SELECT doc_id AS src, (doc_id + 2) % (SELECT count(*) FROM documents) AS dst FROM documents
          |WHERE doc_id % 2 = 0
          |UNION ALL
          |SELECT doc_id AS src, (doc_id + 3) % (SELECT count(*) FROM documents) AS dst FROM documents
          |WHERE doc_id % 3 = 0""".stripMargin)))
  )
}
