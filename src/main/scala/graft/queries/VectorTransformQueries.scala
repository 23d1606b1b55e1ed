package graft.queries

import graft.core.Tables
import graft.operators.vector.{EmbeddingQuantizer, EmbeddingSimHash, MatryoshkaTruncate, ProductQuantizer, RandomProjection}
import org.apache.spark.sql.functions._

/** Embedding-transform gates: int8 scalar quantization and Matryoshka
  * truncation+renorm — both recomputed elementwise by the DuckDB twin
  * (shared IEEE-754 double arithmetic, same fold order).
  */
object VectorTransformQueries {

  private val quantOp = new EmbeddingQuantizer()
  private val mtOp = new MatryoshkaTruncate(dims = 8)

  private lazy val hdeOp = new graft.operators.vector.HashedDocEmbedding(
    "text", "doc_id", dims = 16, hashName = "portable")
  private val eshOp = new EmbeddingSimHash(
    vecCol = "embedding", idCol = "vec_id", orderCol = "vec_id",
    bits = 12, dims = 64, seed = 7L)
  private val rpOp = new RandomProjection(
    vecCol = "embedding", inDims = 64, outDims = 8, seed = 11L)

  private val pqOp = new ProductQuantizer(
    vecCol = "embedding", dims = 64, numSubspaces = 8,
    numCentroids = 16, seed = 23L)

  // memo for the ORACLE-RENDER fits only (pca_project + pca_whiten both
  // render twins from the same fitted model — one moments pass serves
  // both). Keyed by scale dir: the fixture at a dir is immutable and
  // the fit deterministic, so the cached model is the value either
  // session would compute. The gates' own run() paths deliberately do
  // NOT use this — each gate leg measures its honest per-invocation
  // cost, fit included.
  private val oracleFitCache =
    new java.util.concurrent.ConcurrentHashMap[String, graft.operators.vector.Pca.PcaModel]()
  private def oracleFit(s: org.apache.spark.sql.SparkSession,
      dir: String): graft.operators.vector.Pca.PcaModel =
    oracleFitCache.computeIfAbsent(dir, _ =>
      graft.operators.vector.Pca.fit(Tables(s, dir, "embeddings"), "embedding", d = 64, q = 8))

  val queries: Seq[OracleQuery] = Seq(

    // Exact integer-scaled second moments (the PCA fit's ONLY corpus
    // pass): every (i, j) sum-of-products an exact BIGINT, re-derived
    // by DuckDB from the same floor(x·2^20) scaling — the moment table
    // fully determines the covariance, so the distributed half of the
    // fit is hash-checked even though the (driver, O(d^3)) eigen step
    // itself is not SQL-expressible.
    OracleQuery("embedding_covariance",
      (s, dir) => {
        import graft.operators.vector.Pca
        val d = 64
        val (is, js) = Pca.pairIndices(d)
        Pca.moments(Tables(s, dir, "embeddings"), "embedding", d)
          .select(col("n"), col("sums"),
            posexplode(col("prods")).as(Seq("_pos", "sp")))
          .select(
            element_at(typedlit(is.map(_.toLong).toSeq), col("_pos") + 1).as("i"),
            element_at(typedlit(js.map(_.toLong).toSeq), col("_pos") + 1).as("j"),
            col("n"), col("sums"), col("sp"))
          .select(col("i"), col("j"), col("n"),
            element_at(col("sums"), (col("i") + 1).cast("int")).as("sum_i"),
            element_at(col("sums"), (col("j") + 1).cast("int")).as("sum_j"),
            col("sp"))
          .orderBy(col("i"), col("j"))
      },
      Some(s"""WITH ${graft.operators.vector.Pca.momentsSql(
                 "embeddings", "vec_id", "embedding")}
              |SELECT i, j, n, sum_i, sum_j, sp FROM _pmout
              |ORDER BY i, j""".stripMargin)),

    // PCA projection — FULLY oracle-gated (r18): the fit is
    // deterministic from the data (exact-integer moments hash-checked
    // by embedding_covariance above + fixed-sweep driver Jacobi with
    // canonical sign), so the twin re-fits the SAME model at Verify
    // time and replays the projection arithmetic with the fitted
    // components as shortest-round-trip literals — the RandomProjection
    // discipline, via the data-dependent oracleFor hook. PcaSpec pins
    // orthonormality, variance ordering, covariance reconstruction, and
    // the manual-replay projection.
    OracleQuery("pca_project",
      (s, dir) => {
        import graft.operators.vector.Pca
        val emb = Tables(s, dir, "embeddings")
        val model = Pca.fit(emb, "embedding", d = 64, q = 8)
        // null vectors are droppable rows in BOTH engines (the twin's
        // _pca CTE filters IS NOT NULL); the fixture has none, but the
        // gate must not depend on that
        Pca.project(emb.filter(col("embedding").isNotNull), "embedding", model)
          .select(col("vec_id") +:
            (1 to 8).map(i => element_at(col("embedding_pca"), i).as(s"p$i")): _*)
          .orderBy(col("vec_id"))
      },
      None,
      oracleFor = Some { (s, dir) =>
        import graft.operators.vector.Pca
        val model = oracleFit(s, dir)
        s"""WITH ${Pca.projectSql("embeddings", "vec_id", "embedding", model)}
           |SELECT id AS vec_id,
           |  ${(1 to 8).map(i => s"projected[$i] AS p$i").mkString(", ")}
           |FROM _pca ORDER BY vec_id""".stripMargin
      }),

    // PCA WHITENING (r18): the same fitted model with each component
    // scaled 1/sqrt(λ) — unit-variance decorrelated output (PcaSpec
    // pins both properties). Gate and twin consume the SAME
    // driver-scaled model literals, so the whitening arithmetic
    // hash-checks exactly like pca_project.
    OracleQuery("pca_whiten",
      (s, dir) => {
        import graft.operators.vector.Pca
        val emb = Tables(s, dir, "embeddings")
        val model = Pca.whitened(Pca.fit(emb, "embedding", d = 64, q = 8))
        Pca.project(emb.filter(col("embedding").isNotNull), "embedding",
            model, "embedding_white")
          .select(col("vec_id") +:
            (1 to 8).map(i => element_at(col("embedding_white"), i).as(s"w$i")): _*)
          .orderBy(col("vec_id"))
      },
      None,
      oracleFor = Some { (s, dir) =>
        import graft.operators.vector.Pca
        val model = Pca.whitened(oracleFit(s, dir))
        s"""WITH ${Pca.projectSql("embeddings", "vec_id", "embedding", model)}
           |SELECT id AS vec_id,
           |  ${(1 to 8).map(i => s"projected[$i] AS w$i").mkString(", ")}
           |FROM _pca ORDER BY vec_id""".stripMargin
      }),

    // INCREMENTAL moments (r18): per-epoch exact moment artifacts
    // (vec_id % 4 — four epoch slices) merged on the driver with exact
    // integer adds must equal the one-pass corpus moments — the oracle
    // is embedding_covariance's own SQL, so the epoch-store fit path
    // (refit after epoch N = fold N 17 KB rows, never a corpus rescan)
    // is hash-checked end to end.
    OracleQuery("embedding_covariance_merged",
      (s, dir) => {
        import graft.operators.vector.Pca
        val d = 64
        val epochRows = Pca.momentsBy(Tables(s, dir, "embeddings"),
            "embedding", d, col("vec_id") % 4)
          .collect().map(r => (r.getLong(1), r.getSeq[Long](2), r.getSeq[Long](3)))
        val (n, sums, prods) = Pca.mergeMomentRows(epochRows.toSeq, d)
        val (is, js) = Pca.pairIndices(d)
        import s.implicits._
        prods.indices.map(p =>
            (is(p).toLong, js(p).toLong, n, sums(is(p)), sums(js(p)), prods(p)))
          .toDF("i", "j", "n", "sum_i", "sum_j", "sp")
          .orderBy(col("i"), col("j"))
      },
      Some(s"""WITH ${graft.operators.vector.Pca.momentsSql(
                 "embeddings", "vec_id", "embedding")}
              |SELECT i, j, n, sum_i, sum_j, sp FROM _pmout
              |ORDER BY i, j""".stripMargin)),

    // The q-selection tuner (r18, the operating-point family): every
    // candidate component count priced in one report — per-k and
    // cumulative explained-variance ratio against the exact
    // integer-micro-unit trace — with ONE chosen row (smallest k
    // reaching the variance target; maxQ fallback). The chosen q MOVES
    // with the corpus: 4 at sf0.001/0.01, 5 at sf0.1.
    OracleQuery("pca_q_operating_point",
      (s, dir) => graft.operators.vector.Pca.qOperatingPoint(
          Tables(s, dir, "embeddings"), "embedding", d = 64, maxQ = 8,
          targetVar = 0.1)
        .orderBy(col("q_components")),
      None,
      oracleFor = Some { (s, dir) =>
        graft.operators.vector.Pca.qOperatingPointSql(
          "embeddings", "vec_id", "embedding", oracleFit(s, dir),
          targetVar = 0.1)
      }),

    // The COMPOSED reduce-then-dedup recipe (r18) — what the shipped
    // vectors config runs: project to the fitted 8-dim PCA basis, then
    // cosine-threshold dedup over the PROJECTED vectors (the
    // centered basis reshapes the geometry: raw near-dups read ~0.9+
    // here, and 0.9 visibly binds at every scale). Every stage's
    // arithmetic is hash-checked end to end: the projection via the
    // pca_project literals discipline, the pairwise cosine + first-wins
    // keep rule via the embedding_cosine_dedup twin shape, here over
    // the _pca CTE. Planted duplicates survive any linear projection at
    // cosine ≈ 1, so the dedup visibly binds at every scale.
    OracleQuery("pca_semantic_dedup",
      (s, dir) => {
        import graft.operators.vector.{EmbeddingCosineDedup, Pca}
        val emb = Tables(s, dir, "embeddings")
        val model = Pca.fit(emb, "embedding", d = 64, q = 8)
        val proj = Pca.project(
          emb.filter(col("embedding").isNotNull), "embedding", model)
        new EmbeddingCosineDedup(
            vecCol = "embedding_pca", idCol = "vec_id", threshold = 0.9)(proj)
          .select(col("vec_id")).orderBy(col("vec_id"))
      },
      None,
      oracleFor = Some { (s, dir) =>
        import graft.operators.vector.Pca
        val model = oracleFit(s, dir)
        s"""WITH ${Pca.projectSql("embeddings", "vec_id", "embedding", model)},
           |v AS (SELECT id, projected AS e FROM _pca),
           |ver AS (SELECT a.id AS d1, b.id AS d2
           |  FROM v a JOIN v b ON a.id < b.id
           |  WHERE ${graft.functions.VectorFunctions.cosineSql("a.e", "b.e")} >= 0.9)
           |SELECT id AS vec_id FROM _pca
           |WHERE id NOT IN (SELECT d2 FROM ver) ORDER BY vec_id""".stripMargin
      }),

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

    // PQ encode: 64 floats -> one packed long (8 subspaces x 16
    // centroids), argmin ties to the smallest centroid id in both
    // engines via lexicographic struct-min
    OracleQuery("pq_encode",
      (s, dir) => pqOp(Tables(s, dir, "embeddings"))
        .select(col("vec_id"), col("pq_code"))
        .orderBy(col("vec_id")),
      Some(s"""WITH ${pqOp.cteSql("embeddings", "vec_id")}
              |SELECT id AS vec_id, code AS pq_code FROM _pq
              |ORDER BY vec_id""".stripMargin)),

    // ADC ranking over the codes: per-query lookup table as plan-time
    // literals, top-20 by (distance, id) — ordering on FULL precision,
    // rounding only in the projection
    OracleQuery("ann_pq_adc_topk",
      (s, dir) => {
        val q = pqOp.syntheticQuery(qseed = 101L)
        pqOp(Tables(s, dir, "embeddings"))
          .select(col("vec_id"), pqOp.adcDistance(col("pq_code"), q).as("adc"))
          .orderBy(col("adc"), col("vec_id")).limit(20)
          .select(col("vec_id"), round(col("adc"), 6).as("adc"))
      },
      Some {
        val q = pqOp.syntheticQuery(qseed = 101L)
        s"""WITH ${pqOp.cteSql("embeddings", "vec_id")}
           |SELECT id AS vec_id, round(${pqOp.adcSql("code", q)}, 6) AS adc
           |FROM _pq ORDER BY ${pqOp.adcSql("code", q)}, id LIMIT 20""".stripMargin
      }),

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
              |WHERE rn = 1 ORDER BY vec_id""".stripMargin)),

    // Feature-hashing doc embeddings: the zero-model text->vector
    // bridge (signed per-slot counts, exact BIGINTs, L2-normalized);
    // scalar-column projection like matryoshka (doubles don't FORMAT
    // identically across engines)
    OracleQuery("hashed_doc_embedding",
      (s, dir) => hdeOp(Tables(s, dir, "documents"))
        .select(col("id").as("doc_id") +:
          (1 to 8).map(i => element_at(col("emb"), i).as(s"emb$i")): _*)
        .orderBy(col("doc_id")),
      Some(hdeOp.sql("documents", "doc_id", out = 8, outIdAlias = "doc_id"))),

    // Does 64 -> 8 matryoshka truncation preserve neighborhoods?
    // recall@10 of truncated-vector brute kNN vs full-vector kNN for
    // the first 20 queries (self kept on both sides - symmetric)
    OracleQuery("truncation_recall",
      (s, dir) => {
        import graft.operators.vector.AnnSearch
        val emb = Tables(s, dir, "embeddings")
        val q = emb.filter(col("vec_id") < 20)
        val full = AnnSearch.knnJoin(emb, q, "embedding", "vec_id", "vec_id", k = 10)
          .select(col("query_id"), col("vec_id"))
        // a vector whose first 8 dims are all zero truncates to NULL;
        // filter it BEFORE the knn join (whose tuple encoder is
        // non-nullable) - DuckDB mirrors with IS NOT NULL
        val tr = mtOp(Tables(s, dir, "embeddings"))
          .select(col("vec_id"), col("embedding_truncated").as("emb8"))
          .filter(col("emb8").isNotNull)
        val trQ = tr.filter(col("vec_id") < 20)
        val trTop = AnnSearch.knnJoin(tr, trQ, "emb8", "vec_id", "vec_id", k = 10)
          .select(col("query_id").as("_tq"), col("vec_id").as("_tv"))
        full.join(trTop,
            col("query_id") === col("_tq") && col("vec_id") === col("_tv"),
            "left")
          .groupBy(col("query_id"))
          .agg(count(col("_tv")).as("n_overlap"),
            round(count(col("_tv")).cast("double") / 10.0, 4).as("recall"))
          .orderBy(col("query_id"))
      },
      Some {
        val cos = graft.functions.VectorFunctions.cosineSql("e.embedding", "q.embedding")
        val cosT = graft.functions.VectorFunctions.cosineSql("e.truncated", "q.truncated")
        s"""WITH ${mtOp.cteSql("embeddings", "vec_id")},
           |_fr AS (SELECT q.vec_id AS qid, e.vec_id AS vid,
           |    row_number() OVER (PARTITION BY q.vec_id ORDER BY $cos DESC, e.vec_id) AS rn
           |  FROM embeddings e CROSS JOIN (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 20) q),
           |_ft AS (SELECT qid, vid FROM _fr WHERE rn <= 10),
           |_tr AS (SELECT q.id AS qid, e.id AS vid,
           |    row_number() OVER (PARTITION BY q.id ORDER BY $cosT DESC, e.id) AS rn
           |  FROM (SELECT id, truncated FROM _mt WHERE truncated IS NOT NULL) e
           |  CROSS JOIN (SELECT id, truncated FROM _mt
           |    WHERE id < 20 AND truncated IS NOT NULL) q),
           |_tt AS (SELECT qid, vid FROM _tr WHERE rn <= 10)
           |SELECT f.qid AS query_id, count(t.vid) AS n_overlap,
           |  round(CAST(count(t.vid) AS DOUBLE) / 10.0, 4) AS recall
           |FROM _ft f LEFT JOIN _tt t ON f.qid = t.qid AND f.vid = t.vid
           |GROUP BY f.qid ORDER BY query_id""".stripMargin
      })
  )
}
