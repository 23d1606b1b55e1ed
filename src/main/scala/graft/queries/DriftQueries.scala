package graft.queries

import graft.core.Tables
import graft.functions.TextFunctions
import graft.operators.ml.ClusterSilhouette
import graft.operators.stats.{DistributionDrift, KsStatistic, RaterAgreement, ZipfFit}
import graft.operators.text.{C4Clean, C4QualityFilter, CurriculumBuckets, GopherQuality, GopherQualityFilter, JsDivergence, NgramDiversity, PiiDensity, TokenFertility}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-12 corpus-health gates: distribution drift (PSI) between two
  * source slices, Jensen–Shannon divergence between their unigram
  * distributions, chance-corrected agreement (Cohen's kappa) between
  * two independent quality filters, and per-cluster simplified
  * silhouette for the k-means buckets. These are the monitoring ops a
  * 100 TB pipeline runs per snapshot: drift says the input changed,
  * JSD says which sources are redundant, kappa says whether a second
  * filter adds signal, silhouette says whether the semantic-dedup
  * buckets are still tight.
  */
object DriftQueries {

  private val driftOp = new DistributionDrift(
    metricCol = "n_chars", groupCol = "source",
    baseVal = "src0", curVal = "src1", buckets = 10, width = 60L)

  private val jsdOp = new JsDivergence("text", "source", "src0", "src1")

  // all-pairs divergence over a 6-source slice set: 15 pairs from one
  // corpus scan (the full 20-source matrix is 190 plan-time columns —
  // a caller choice, not a gate default)
  private val jsdMatrixOp = new graft.operators.text.JsDivergenceMatrix(
    "text", "source", (0 until 6).map(i => s"src$i"))

  private val silOp = new ClusterSilhouette("embedding", k = 8)

  private val kappaOp = new RaterAgreement(
    new GopherQualityFilter("text2").keepCol,
    new C4QualityFilter("text2").keepCol)

  // Raw fixture text fails BOTH filters everywhere (single line, no
  // terminal punctuation, exactly one stoplist word), which makes the
  // 2×2 table degenerate. The deterministic augmentation populates all
  // four agreement cells: %3 docs get three stopword-rich sentences
  // (C4 passes; Gopher passes only when the raw prefix clears the
  // 50-word floor), %5 docs a stopword tail WITHOUT terminal
  // punctuation (Gopher-only), the rest stay raw (both drop).
  private val kStop = " and more data that we have to consider with care." +
    " it should be of interest to everyone involved here." +
    " the results are ready for review and release."
  private val kTail = " and that we have to work with all of the above"

  private def kappaAug(df: DataFrame): DataFrame =
    df.withColumn("text2",
      when(col("doc_id") % 3 === 0, concat(col("text"), lit(kStop)))
        .when(col("doc_id") % 5 === 0, concat(col("text"), lit(kTail)))
        .otherwise(col("text")))

  private val kappaAugSql =
    s"""aug AS (SELECT doc_id, CASE
       |    WHEN doc_id % 3 = 0 THEN text || '$kStop'
       |    WHEN doc_id % 5 = 0 THEN text || '$kTail'
       |    ELSE text END AS text2 FROM documents),
       |tk AS (SELECT doc_id, text2, ${TextFunctions.tokensOfSql("text2")} AS toks FROM aug),""".stripMargin

  // SQL predicate twins (the c4/gopher filter gates pin kernel == these
  // expressions on their own augmented fixtures)
  private val gopherKeepSql =
    GopherQuality.keepSql("text2", "toks", 50L, 100000L, 2)
  private val c4CleanSql =
    s"coalesce(list_aggregate(${C4Clean.keptLinesSql("text2", 5)}, 'string_agg', chr(10)), '')"
  private val c4KeepSql =
    C4Clean.docKeepSql("text2", C4Clean.sentenceCountSql(c4CleanSql), 3)

  private val curriculumOp = new CurriculumBuckets("text", width = 0.01)

  private val ksOp = new KsStatistic("n_chars", "source", "src0", "src1")

  private val fertilityOp = new TokenFertility("text", "source")

  private val heapsOp = new graft.operators.stats.HeapsFit(
    "text", "doc_id", levels = 12)

  // induction params for the induced-vocab fertility gate: 8 merges
  // over the 300 most frequent words (freq >= 2) — small enough that
  // the DuckDB twin's CTE-chain re-derivation stays cheap, large
  // enough that every merge is corpus-driven at all three scales
  private val fertilityInduction = new graft.operators.text.BpeVocabInduction(
    "text", numMerges = 8, maxVocabWords = 300, minWordFreq = 2L)

  private val diversityOp = new NgramDiversity("text", maxN = 3)

  private val zipfOp = new ZipfFit("text", topK = 1000)

  private lazy val qrankOp = new graft.operators.stats.QuantileRank("n_chars")

  private lazy val balanceOp = new graft.operators.stats.SourceBalance(
    "source", weightCol = Some("n_chars"))

  private val voteWordlist = new graft.operators.text.WordlistFilter(
    Seq("slow", "dup", "skew"), maxHitFrac = 0.12, maxHits = 40L,
    prefix = "flag", textCol = "text2")

  private lazy val voteOp = new graft.operators.text.QualityVote(
    Seq(new GopherQualityFilter("text2").keepCol,
      new C4QualityFilter("text2").keepCol,
      voteWordlist.keepCol),
    minVotes = 2)

  private val miOp = new graft.operators.stats.MutualInformation(
    "source", "lang")

  private val outlierOp = new graft.operators.stats.RobustOutliers(
    "doc_id", "m2", k = 5.0)

  private val piiOp = new PiiDensity("text2", "source")

  // Sparse deterministic PII injection (the dense every-doc fixture of
  // the pii_redaction gate would make every density cell 100%): email
  // on %7 docs, an IP on %11, a phone on %13 — so sources differ and
  // most docs stay clean.
  private def piiAug(df: DataFrame): DataFrame =
    df.withColumn("text2", concat(col("text"),
      when(col("doc_id") % 7 === 0,
        concat(lit(" mail user"), col("doc_id").cast("string"),
          lit("@example.com now"))).otherwise(lit("")),
      when(col("doc_id") % 11 === 0,
        concat(lit(" node 10.0."), (col("doc_id") % 250).cast("string"),
          lit(".7 up"))).otherwise(lit("")),
      when(col("doc_id") % 13 === 0,
        concat(lit(" call 415-555-"),
          lpad((col("doc_id") % 10000).cast("string"), 4, "0"))).otherwise(lit(""))))

  private val piiAugSql =
    "(text || " +
      "(CASE WHEN doc_id % 7 = 0 THEN ' mail user' || CAST(doc_id AS VARCHAR) || '@example.com now' ELSE '' END) || " +
      "(CASE WHEN doc_id % 11 = 0 THEN ' node 10.0.' || CAST(doc_id % 250 AS VARCHAR) || '.7 up' ELSE '' END) || " +
      "(CASE WHEN doc_id % 13 = 0 THEN ' call 415-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END))"

  val queries: Seq[OracleQuery] = Seq(

    OracleQuery("drift_psi",
      // headline drift number between the src0 baseline and src1 slice
      (s, dir) => driftOp.psi(Tables(s, dir, "documents")),
      Some(driftOp.psiSql("documents"))),

    OracleQuery("drift_psi_per_group",
      // per-source PSI against the whole corpus — "which source's
      // length distribution diverges"; the replanned broadcast-total
      // path now under its own oracle (was CLI/spec-covered only)
      (s, dir) => DistributionDrift.psiPerGroup(
        Tables(s, dir, "documents"), col("n_chars"), "source",
        buckets = 10, width = 60L),
      Some(DistributionDrift.psiPerGroupSql(
        "documents", "n_chars", "source", buckets = 10, width = 60L))),

    OracleQuery("drift_psi_buckets",
      // the per-bucket drill-down: which length bands moved
      (s, dir) => driftOp.bucketTable(Tables(s, dir, "documents")),
      Some(driftOp.bucketTableSql("documents"))),

    OracleQuery("js_divergence",
      // unigram-distribution distance between the two sources, in bits
      (s, dir) => jsdOp(Tables(s, dir, "documents")),
      Some(jsdOp.sql("documents"))),

    OracleQuery("js_divergence_matrix",
      // every source pair's divergence from ONE corpus scan — the
      // "which sources are redundant" mixture-planning table
      (s, dir) => jsdMatrixOp(Tables(s, dir, "documents")),
      Some(jsdMatrixOp.sql("documents"))),

    OracleQuery("filter_agreement_kappa",
      // do the Gopher and C4 quality filters agree beyond chance?
      (s, dir) => kappaOp(kappaAug(Tables(s, dir, "documents"))),
      Some(kappaOp.sql("tk", gopherKeepSql, c4KeepSql, prelude = kappaAugSql))),

    OracleQuery("curriculum_buckets",
      // quality-quantile tiers: the curriculum-schedule planning table
      (s, dir) => curriculumOp(Tables(s, dir, "documents")),
      Some(curriculumOp.sql("documents"))),

    OracleQuery("ks_statistic",
      // bucketless drift: the largest CDF gap between the two slices
      (s, dir) => ksOp(Tables(s, dir, "documents")),
      Some(ksOp.sql("documents"))),

    OracleQuery("token_fertility",
      // tokenizer efficiency per source: subwords per word, chars per subword
      (s, dir) => fertilityOp(Tables(s, dir, "documents")),
      Some(fertilityOp.sql("documents"))),

    OracleQuery("token_fertility_induced",
      // fertility under the ACTUAL induced BPE vocab (not the greedy
      // stand-in): Spark trains the merge list from the corpus at
      // runtime (distributed word counts + driver merge loop), the
      // oracle RE-DERIVES the same merges in pure SQL — so the gate
      // stays honest at any scale with zero data-derived literals
      (s, dir) => {
        val docs = Tables(s, dir, "documents")
        fertilityOp.withMerges(docs, fertilityInduction.train(docs))
      },
      Some(fertilityOp.sqlInduced("documents", fertilityInduction))),

    OracleQuery("ngram_diversity",
      // distinct-1/2/3 ratios — the mode-collapse alarm
      (s, dir) => diversityOp(Tables(s, dir, "documents")),
      Some(diversityOp.sql("documents"))),

    OracleQuery("zipf_fit",
      // rank-frequency OLS in log-log space: does the corpus look like language
      (s, dir) => zipfOp(Tables(s, dir, "documents")),
      Some(zipfOp.sql("documents"))),

    OracleQuery("heaps_fit",
      // vocabulary GROWTH (V ≈ K·n^β over hash-nested subsamples):
      // does the corpus keep minting types like language, or saturate
      // (duplication) / explode (ids) — the companion to zipf_fit
      (s, dir) => heapsOp(Tables(s, dir, "documents")),
      Some(heapsOp.sql("documents"))),

    OracleQuery("pii_density",
      // per-source PII rates over sparsely-injected deterministic PII
      (s, dir) => piiOp(piiAug(Tables(s, dir, "documents"))),
      Some(piiOp.sql("documents", piiAugSql))),

    OracleQuery("quantile_rank",
      // corpus-relative tie-averaged percentile of n_chars per doc via
      // the two-level rank decomposition (never a global rank window);
      // the oracle pays the single-window form of the same algebra
      (s, dir) => qrankOp(Tables(s, dir, "documents"))
        .select(col("doc_id"), col("quantile_rank")).orderBy(col("doc_id")),
      Some(s"""SELECT doc_id, quantile_rank FROM (
           |${qrankOp.sqlProjection("documents", "doc_id", "n_chars")}
           |) ORDER BY doc_id""".stripMargin)),

    OracleQuery("source_balance",
      // corpus concentration: Gini / effective source counts over
      // char-mass shares - exact rank-form numerator, floor-scaled
      // entropy terms, windows on the |sources|-row table only
      (s, dir) => balanceOp(Tables(s, dir, "documents")),
      Some(balanceOp.sql("documents", massSql = "sum(n_chars)"))),

    OracleQuery("quality_vote",
      // agreement-of-2 ensemble over three independent quality raters
      // (Gopher battery, C4 rules, wordlist caps) on the kappa-gate
      // augmentation - one fused projection, no shuffle
      (s, dir) => voteOp(kappaAug(Tables(s, dir, "documents"))),
      Some(voteOp.sql("tk",
        Seq(gopherKeepSql, c4KeepSql, voteWordlist.keepSql),
        prelude = kappaAugSql))),

    OracleQuery("mutual_information",
      // does source predict language? floor-scaled integer MI
      // contributions make the cross-cell sum order-invariant
      (s, dir) => miOp(Tables(s, dir, "documents")),
      Some(miOp.sql("documents"))),

    OracleQuery("robust_outliers",
      // median/MAD outlier flags over a deterministically-planted
      // megadoc/stub augmentation (raw fixture lengths are too uniform
      // to exercise the rule); the median/MAD base stays unmoved by the
      // planted tail - that robustness is the point of the operator
      (s, dir) => outlierOp(
        Tables(s, dir, "documents").withColumn("m2",
          when(col("doc_id") % 251 === 0, col("n_chars") * 40)
            .when(col("doc_id") % 97 === 0, lit(3L))
            .otherwise(col("n_chars")))),
      Some(outlierOp.sql(
        """(SELECT doc_id, CASE WHEN doc_id % 251 = 0 THEN n_chars * 40
          |  WHEN doc_id % 97 = 0 THEN 3 ELSE n_chars END AS m2
          |FROM documents)""".stripMargin))),

    OracleQuery("cluster_silhouette",
      // bucket tightness for the first-8-centroid k-means assignment
      (s, dir) => {
        val emb = Tables(s, dir, "embeddings")
        val cents = emb.orderBy(col("vec_id")).limit(8)
          .select(col("vec_id").cast("long"), col("embedding").cast("array<double>"))
          .collect()
        silOp(emb, cents.map(_.getSeq[Double](1).toSeq).toSeq,
          Some(cents.map(_.getLong(0)).toSeq))
      },
      Some(silOp.sql("embeddings", "vec_id"))))
}
