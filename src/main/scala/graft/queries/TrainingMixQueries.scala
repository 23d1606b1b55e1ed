package graft.queries

import graft.core.Tables
import graft.functions.{HashFunctions, TextFunctions, VectorFunctions}
import graft.operators.text.{C4Clean, C4CleanRefiner, C4QualityFilter, DupNgramRefiner, NgramLmScoreRefiner, SourceWeightedSampleFilter, StratifiedSampleFilter, TokenBudgetSampleFilter}
import graft.operators.vector.CrossModalAlignmentRefiner
import org.apache.spark.sql.functions._

/** Gates for the round-6 training-data additions: C4-style page
  * cleaning, duplicated-n-gram span removal, corpus n-gram LM scoring,
  * per-source weighted sampling (data mixing), and cross-modal
  * alignment. Each oracle RECOMPUTES the semantics in DuckDB from the
  * same raw tables — list-lambda line/token algebra for C4/dup-ngram,
  * window-function term counts for the LM, md5-prefix hashing for the
  * sampler, and the same left-to-right double fold for the cosine — so
  * nothing is pinned from the implementation.
  */
object TrainingMixQueries {

  // ---- C4 page-cleaning fixture: every rule fires somewhere. Lines:
  // good sentence / too-short / javascript / no terminal punctuation;
  // page-level lorem-ipsum (doc_id%13) and code-brace (doc_id%17)
  // poison lines; doc_id%89 pages are NULL text (the disposition case).
  private val c4GoodLine = " has plenty of words to pass the bar."
  private val c4Lorem = "Lorem ipsum dolor sit amet obviously removes this page."
  private val c4LoremAlt = "Another perfectly fine sentence with adequate length here."
  private val c4Brace = "This sentence contains a { code brace clearly right here."
  private val c4BraceAlt = "A third valid sentence keeps the whole document alive."

  private def c4Aug(df: org.apache.spark.sql.DataFrame) =
    df.withColumn("text2",
      when(col("doc_id") % 89 === 0, lit(null).cast("string")).otherwise(concat(
        lit("Sentence "), col("doc_id").cast("string"), lit(c4GoodLine),
        lit("\nshort one.\nenable the javascript framework to view this content now."),
        lit("\nline with no terminal punctuation at all\n"),
        when(col("doc_id") % 13 === 0, lit(c4Lorem)).otherwise(lit(c4LoremAlt)),
        lit("\n"),
        when(col("doc_id") % 17 === 0, lit(c4Brace)).otherwise(lit(c4BraceAlt)))))

  private val c4AugSql =
    s"""(SELECT doc_id, CASE WHEN doc_id % 89 = 0 THEN NULL ELSE
       |  ('Sentence ' || CAST(doc_id AS VARCHAR) || '$c4GoodLine' ||
       |   chr(10) || 'short one.' ||
       |   chr(10) || 'enable the javascript framework to view this content now.' ||
       |   chr(10) || 'line with no terminal punctuation at all' || chr(10) ||
       |   (CASE WHEN doc_id % 13 = 0 THEN '$c4Lorem' ELSE '$c4LoremAlt' END) ||
       |   chr(10) ||
       |   (CASE WHEN doc_id % 17 = 0 THEN '$c4Brace' ELSE '$c4BraceAlt' END))
       |  END AS text2 FROM documents)""".stripMargin

  // ---- dup-ngram fixture: doc_id%4 pages share an 11-token tail, so
  // its interior 8-grams are corpus-duplicated; everything else only
  // duplicates if the underlying text genuinely repeats.
  private val dnTail = " the quick brown fox jumps over the lazy dog again today"
  private val dupNgramOp = new DupNgramRefiner("text2", "doc_id", ngramWidth = 8)

  private def dnAug(df: org.apache.spark.sql.DataFrame) =
    df.withColumn("text2",
      when(col("doc_id") % 4 === 0, concat(col("text"), lit(dnTail)))
        .otherwise(col("text")))

  private val dnAugSql =
    s"""(SELECT doc_id, CASE WHEN doc_id % 4 = 0 THEN (text || '$dnTail')
       |  ELSE text END AS text2 FROM documents)""".stripMargin

  // Lee et al. "all but one" policy twin of dup_ngram (r17): the
  // corpus-first instance of each duplicated gram keeps its tokens
  private val dupNgramKeepFirstOp =
    new DupNgramRefiner("text2", "doc_id", ngramWidth = 8, keepFirst = true)

  private val lmOp = new NgramLmScoreRefiner("text", "doc_id")

  private val mixOp = new SourceWeightedSampleFilter(
    weights = Map("src0" -> 0.0, "src3" -> 0.25, "src7" -> 0.5, "src12" -> 0.9),
    defaultFraction = 0.7, sourceCol = "source", idCol = "doc_id",
    hashName = "portable", salt = "r8")

  private val xmodalOp = new CrossModalAlignmentRefiner("embedding", "emb_b")

  val queries: Seq[OracleQuery] = Seq(

    OracleQuery("c4_clean",
      (s, dir) => new C4CleanRefiner("text2")(c4Aug(Tables(s, dir, "documents")))
        .select(col("doc_id"), col("text_c4_clean"), col("c4_lines_kept"),
          col("c4_lines_removed"), col("c4_sentences"), col("c4_keep"))
        .orderBy(col("doc_id")),
      Some {
        val sentences = C4Clean.sentenceCountSql("text_c4_clean")
        s"""WITH aug AS $c4AugSql,
           |k AS (SELECT doc_id, text2,
           |  ${C4Clean.keptLinesSql("text2", 5)} AS _kept,
           |  CAST(len(string_split(coalesce(text2, ''), chr(10))) AS BIGINT) AS _total
           |  FROM aug),
           |c AS (SELECT doc_id, text2, _total,
           |  coalesce(list_aggregate(_kept, 'string_agg', chr(10)), '') AS text_c4_clean,
           |  CAST(len(_kept) AS BIGINT) AS c4_lines_kept FROM k)
           |SELECT doc_id, text_c4_clean, c4_lines_kept,
           |  _total - c4_lines_kept AS c4_lines_removed,
           |  $sentences AS c4_sentences,
           |  ${C4Clean.docKeepSql("text2", sentences, 3)} AS c4_keep
           |FROM c ORDER BY doc_id""".stripMargin
      }),

    OracleQuery("c4_quality_filter",
      (s, dir) => {
        val aug = c4Aug(Tables(s, dir, "documents"))
        val f = new C4QualityFilter("text2")
        aug.where(f.keep(aug)).select(col("doc_id")).orderBy(col("doc_id"))
      },
      Some {
        val clean =
          s"coalesce(list_aggregate(${C4Clean.keptLinesSql("text2", 5)}, 'string_agg', chr(10)), '')"
        s"""WITH aug AS $c4AugSql
           |SELECT doc_id FROM aug
           |WHERE ${C4Clean.docKeepSql("text2", C4Clean.sentenceCountSql(clean), 3)}
           |ORDER BY doc_id""".stripMargin
      }),

    OracleQuery("dup_ngram",
      (s, dir) => dupNgramOp(dnAug(Tables(s, dir, "documents")))
        .select(col("doc_id"), col("dup_ngram_count"),
          round(col("dup_ngram_fraction"), 6).as("dup_ngram_fraction"),
          col("text_dedup_spans"), col("dup_tokens_removed"))
        .orderBy(col("doc_id")),
      Some {
        val mask = dupNgramOp.maskSql("toks", "d.dups")
        s"""WITH aug AS $dnAugSql,
           |${dupNgramOp.dupCteSql("aug", "doc_id")},
           |tk AS (SELECT doc_id, ${TextFunctions.tokensOfSql("text2")} AS toks FROM aug)
           |SELECT tk.doc_id,
           |  coalesce(d.dup_cnt, 0) AS dup_ngram_count,
           |  round(CASE WHEN greatest(len(toks) - 7, 0) = 0 THEN 0.0
           |    ELSE coalesce(d.dup_cnt, 0) / CAST(greatest(len(toks) - 7, 0) AS DOUBLE)
           |    END, 6) AS dup_ngram_fraction,
           |  coalesce(list_aggregate($mask, 'string_agg', ' '), '') AS text_dedup_spans,
           |  CAST(len(toks) - len($mask) AS BIGINT) AS dup_tokens_removed
           |FROM tk LEFT JOIN _dn d ON tk.doc_id = d.id
           |ORDER BY tk.doc_id""".stripMargin
      }),

    OracleQuery("dup_ngram_keep_first",
      // the "all but one" variant on the same planted-tail fixture: the
      // smallest doc_id sharing the 11-token tail keeps it; later
      // copies lose exactly the covered span
      (s, dir) => dupNgramKeepFirstOp(dnAug(Tables(s, dir, "documents")))
        .select(col("doc_id"), col("dup_ngram_count"),
          round(col("dup_ngram_fraction"), 6).as("dup_ngram_fraction"),
          col("text_dedup_spans"), col("dup_tokens_removed"))
        .orderBy(col("doc_id")),
      Some {
        val mask = dupNgramKeepFirstOp.maskSql("toks", "d.dups")
        s"""WITH aug AS $dnAugSql,
           |${dupNgramKeepFirstOp.dupCteSql("aug", "doc_id")},
           |tk AS (SELECT doc_id, ${TextFunctions.tokensOfSql("text2")} AS toks FROM aug)
           |SELECT tk.doc_id,
           |  coalesce(d.dup_cnt, 0) AS dup_ngram_count,
           |  round(CASE WHEN greatest(len(toks) - 7, 0) = 0 THEN 0.0
           |    ELSE coalesce(d.dup_cnt, 0) / CAST(greatest(len(toks) - 7, 0) AS DOUBLE)
           |    END, 6) AS dup_ngram_fraction,
           |  coalesce(list_aggregate($mask, 'string_agg', ' '), '') AS text_dedup_spans,
           |  CAST(len(toks) - len($mask) AS BIGINT) AS dup_tokens_removed
           |FROM tk LEFT JOIN _dn d ON tk.doc_id = d.id
           |ORDER BY tk.doc_id""".stripMargin
      }),

    OracleQuery("ngram_lm_score",
      (s, dir) => lmOp(Tables(s, dir, "documents"))
        .select(col("doc_id"),
          round(col("lm_logprob_avg"), 6).as("lm_logprob_avg"),
          round(col("lm_perplexity"), 2).as("lm_perplexity"))
        .orderBy(col("doc_id")),
      Some(s"""WITH ${lmOp.scoreCteSql("documents", "doc_id")}
              |SELECT d.doc_id,
              |  round(coalesce(l.lm_logprob_avg, 0.0), 6) AS lm_logprob_avg,
              |  round(coalesce(l.lm_perplexity, 1.0), 2) AS lm_perplexity
              |FROM documents d LEFT JOIN _lm l ON d.doc_id = l.id
              |ORDER BY d.doc_id""".stripMargin)),

    OracleQuery("source_weighted_sample",
      (s, dir) => mixOp(Tables(s, dir, "documents"))
        .select(col("doc_id"), col("source")).orderBy(col("doc_id")),
      Some(s"""SELECT doc_id, source FROM documents
              |WHERE ${mixOp.keepSql("doc_id", "source")}
              |ORDER BY doc_id""".stripMargin)),

    OracleQuery("stratified_sample",
      // exact 10 docs per source (fixture strata hold 25), ranked by
      // salted portable hash — the per-source-cap / balanced-eval-set
      // operation; both engines recompute the identical window
      (s, dir) => {
        val op = new StratifiedSampleFilter(
          k = 10, stratumCol = "source", idCol = "doc_id",
          hashName = "portable", salt = "r10")
        op(Tables(s, dir, "documents"))
          .select(col("doc_id"), col("source")).orderBy(col("doc_id"))
      },
      Some({
        val op = new StratifiedSampleFilter(
          k = 10, stratumCol = "source", idCol = "doc_id",
          hashName = "portable", salt = "r10")
        s"""SELECT doc_id, source FROM documents
           |WHERE doc_id IN ${op.keepSql("documents", "source", "doc_id")}
           |ORDER BY doc_id""".stripMargin
      })),

    OracleQuery("token_budget_sample",
      // per-source TOKEN budgets (how training mixes are specified):
      // default 700, src0 capped at 300, src1 at 2000 — the map and the
      // default both bite at every scale factor. The Spark side runs the
      // distributed two-level prefix sum; the oracle runs the
      // single-window form, so the hash-match proves the decomposition.
      (s, dir) => {
        val op = new TokenBudgetSampleFilter(
          budgets = Map("src0" -> 300L, "src1" -> 2000L),
          defaultBudget = 700L, sourceCol = "source", idCol = "doc_id",
          textCol = "text", numBuckets = 8, hashName = "portable", salt = "tb")
        op(Tables(s, dir, "documents"))
          .select(col("doc_id"), col("source")).orderBy(col("doc_id"))
      },
      Some({
        val op = new TokenBudgetSampleFilter(
          budgets = Map("src0" -> 300L, "src1" -> 2000L),
          defaultBudget = 700L, sourceCol = "source", idCol = "doc_id",
          textCol = "text", numBuckets = 8, hashName = "portable", salt = "tb")
        s"""SELECT doc_id, source FROM documents
           |WHERE doc_id IN ${op.keepSql("documents", "source", "doc_id")}
           |ORDER BY doc_id""".stripMargin
      })),

    OracleQuery("cross_modal_alignment",
      (s, dir) => {
        val aug = Tables(s, dir, "embeddings").withColumn("emb_b",
          when(col("vec_id") % 13 === 0, lit(null).cast("array<float>"))
            .when(col("vec_id") % 11 === 0, array().cast("array<float>"))
            .when(col("vec_id") % 17 === 0,
              transform(col("embedding"), _ => lit(0.0f)))
            .when(col("vec_id") % 19 === 0, slice(col("embedding"), 1, 32))
            .otherwise(reverse(col("embedding"))))
        xmodalOp(aug)
          .select(col("vec_id"),
            round(col("cross_modal_cosine"), 6).as("cross_modal_cosine"))
          .orderBy(col("vec_id"))
      },
      Some(s"""WITH aug AS (SELECT vec_id, embedding,
              |  CASE WHEN vec_id % 13 = 0 THEN NULL
              |       WHEN vec_id % 11 = 0 THEN []
              |       WHEN vec_id % 17 = 0 THEN list_transform(embedding, x -> CAST(0.0 AS FLOAT))
              |       WHEN vec_id % 19 = 0 THEN embedding[1:32]
              |       ELSE list_reverse(embedding) END AS emb_b
              |  FROM embeddings)
              |SELECT vec_id,
              |  round(${xmodalOp.scoreSql("embedding", "emb_b")}, 6) AS cross_modal_cosine
              |FROM aug ORDER BY vec_id""".stripMargin)),

    OracleQuery("token_budget_waterfill",
      // equal-share budget allocation with surplus redistribution over
      // the skewed lang groups: 17/20 of the corpus total funds every
      // minor language in full and caps the dominant one at the water
      // level — both branches bite at every scale factor
      (s, dir) => waterfillOp(Tables(s, dir, "documents")),
      Some(waterfillOp.sql("documents"))))

  private lazy val waterfillOp = new graft.operators.text.BudgetWaterfill(
    textCol = "text", groupCol = "lang", budgetNum = 17L, budgetDen = 20L)
}
