package graft.operators.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ranked-retrieval evaluation: nDCG@k and precision@k of a ranked
  * candidate list against a binary relevance label — the eval loop for
  * every retrieval surface in the library (BM25, ANN, hybrid RRF): a
  * ranker change ships when nDCG says it helps.
  *
  * Determinism discipline: a plain `sum` of per-rank DCG terms would be
  * float-order-dependent; instead the k (rank, gain) pairs — k is tiny,
  * the list is already a top-k — are collected, sorted by rank, and
  * folded ASCENDING with `aggregate`, the same left-to-right double
  * fold DuckDB's `list_reduce` performs, so DCG is bit-identical across
  * engines and partitionings. IDCG folds the same gains sorted
  * descending.
  *
  * Scale shape: the input is a k-row ranked list (the corpus-scale work
  * already happened upstream under bounded exchanges); everything here
  * is O(k).
  */
object RankingMetrics {

  /** One row `(k, n_relevant, precision_at_k, dcg, idcg, ndcg)` for a
    * ranked list `(idCol, scoreCol)` with per-row 0/1 `relCol`.
    * Ranks come from `(score DESC, id)`; binary gains.
    */
  def ndcgAtK(ranked: DataFrame, idCol: String, scoreCol: String,
      relCol: String, k: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col(scoreCol).desc, col(idCol))
    val top = ranked
      .select(col(idCol), col(scoreCol), col(relCol).cast("long").as("_rel"))
      .withColumn("_r", row_number().over(w))
      .filter(col("_r") <= k)
    val pairs = top.agg(
      sort_array(collect_list(struct(col("_r").as("r"), col("_rel").as("g")))).as("_ps"),
      sum(col("_rel")).as("n_relevant"))
    // DCG: ascending-rank fold of g / log2(r + 1)
    val dcg = aggregate(col("_ps"), lit(0.0),
      (acc, p) => acc + p.getField("g").cast("double") /
        (log(p.getField("r").cast("double") + lit(1.0)) / log(lit(2.0))))
    // IDCG: the same gains sorted best-first, folded at ranks 1..n
    val gainsDesc = reverse(sort_array(transform(col("_ps"), p => p.getField("g"))))
    val idcg = aggregate(zip_with(gainsDesc,
        sequence(lit(1), size(col("_ps"))), (g, r) => struct(g.as("g"), r.as("r"))),
      lit(0.0),
      (acc, p) => acc + p.getField("g").cast("double") /
        (log(p.getField("r").cast("double") + lit(1.0)) / log(lit(2.0))))
    // empty ranked list → NULL dcg/idcg (matching the twin, where
    // list() over zero rows is NULL — Spark's aggregate over the empty
    // collect_list would otherwise say 0.0) and ndcg 0.0 in both;
    // the guard also keeps sequence(1, 0)'s count-DOWN surprise out
    val hasRows = size(col("_ps")) > 0
    pairs.select(
      lit(k).as("k"), col("n_relevant"),
      round(col("n_relevant").cast("double") / lit(k.toDouble), 6).as("precision_at_k"),
      when(hasRows, round(dcg, 6)).as("dcg"),
      when(hasRows, round(idcg, 6)).as("idcg"),
      round(when(hasRows && idcg > lit(0.0), dcg / idcg).otherwise(lit(0.0)), 6).as("ndcg"))
  }

  /** Mean reciprocal rank over a MULTI-QUERY ranked table
    * `(queryCol, idCol, scoreCol, relCol)`: per query, 1/rank of the
    * first relevant candidate within the top `k` (0 when none); the
    * mean folds the per-query RRs in query-id order (sorted list
    * fold — same determinism discipline as [[ndcgAtK]]). One row:
    * `(k, n_queries, mrr)`.
    */
  def mrrAtK(ranked: DataFrame, queryCol: String, idCol: String,
      scoreCol: String, relCol: String, k: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("_q")).orderBy(col(scoreCol).desc, col(idCol))
    val firstRel = ranked
      .select(col(queryCol).as("_q"), col(idCol), col(scoreCol),
        col(relCol).cast("long").as("_rel"))
      .withColumn("_r", row_number().over(w))
      .filter(col("_r") <= k)
      .groupBy(col("_q"))
      .agg(min(when(col("_rel") === 1L, col("_r"))).as("_fr"))
    val rrs = firstRel.agg(
      count(lit(1)).as("n_queries"),
      sort_array(collect_list(struct(col("_q").as("q"),
        coalesce(lit(1.0) / col("_fr").cast("double"), lit(0.0)).as("rr")))).as("_rs"))
    // zero queries → NULL mrr (the guarded CaseWhen skips the division
    // entirely — ANSI mode would otherwise throw on 0.0/0.0)
    rrs.select(lit(k).as("k"), col("n_queries"),
      when(col("n_queries") > 0,
        round(aggregate(col("_rs"), lit(0.0),
          (acc, p) => acc + p.getField("rr")) / col("n_queries").cast("double"), 6))
        .as("mrr"))
  }

  /** Twin of [[mrrAtK]] over a ranked-table SELECT. */
  def mrrSql(rankedSql: String, queryCol: String, idCol: String,
      scoreCol: String, relCol: String, k: Int): String =
    s"""WITH _mrk AS ($rankedSql),
       |_mtop AS (SELECT $queryCol AS q, CAST($relCol AS BIGINT) AS rel,
       |    row_number() OVER (PARTITION BY $queryCol
       |      ORDER BY $scoreCol DESC, $idCol) AS r
       |  FROM _mrk QUALIFY r <= $k),
       |_mfr AS (SELECT q, min(CASE WHEN rel = 1 THEN r END) AS fr
       |  FROM _mtop GROUP BY q),
       |_mrs AS (SELECT count(*) AS n_queries,
       |    list_sort(list({'q': q,
       |      'rr': coalesce(CAST(1.0 AS DOUBLE) / CAST(fr AS DOUBLE), CAST(0.0 AS DOUBLE))})) AS rs
       |  FROM _mfr)
       |SELECT $k AS k, n_queries,
       |  CASE WHEN n_queries > 0 THEN
       |    round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |        list_transform(rs, p -> p.rr)), (acc, x) -> acc + x)
       |      / CAST(n_queries AS DOUBLE), 6) END AS mrr
       |FROM _mrs""".stripMargin

  /** DuckDB twin over a complete ranked-list SELECT producing
    * `(idCol, scoreCol, relCol)`.
    */
  def ndcgSql(rankedSql: String, idCol: String, scoreCol: String,
      relCol: String, k: Int): String = {
    val term = (g: String, r: String) =>
      s"CAST($g AS DOUBLE) / (ln(CAST($r AS DOUBLE) + 1.0) / ln(2.0))"
    s"""WITH _rk AS ($rankedSql),
       |_top AS (SELECT $idCol AS id, CAST($relCol AS BIGINT) AS g,
       |    row_number() OVER (ORDER BY $scoreCol DESC, $idCol) AS r
       |  FROM _rk QUALIFY r <= $k),
       |_ps AS (SELECT list_sort(list({'r': r, 'g': g})) AS ps,
       |    CAST(sum(g) AS BIGINT) AS n_relevant FROM _top),
       |_m AS (SELECT n_relevant,
       |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |      list_transform(ps, p -> ${term("p.g", "p.r")})),
       |      (acc, x) -> acc + x) AS dcg,
       |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |      list_transform(
       |        list_zip(list_reverse(list_sort(list_transform(ps, p -> p.g))),
       |                 range(1, len(ps) + 1)),
       |        z -> ${term("z[1]", "z[2]")})),
       |      (acc, x) -> acc + x) AS idcg
       |  FROM _ps)
       |SELECT $k AS k, n_relevant,
       |  round(CAST(n_relevant AS DOUBLE) / ${k.toDouble}, 6) AS precision_at_k,
       |  round(dcg, 6) AS dcg, round(idcg, 6) AS idcg,
       |  round(CASE WHEN idcg > 0.0 THEN dcg / idcg ELSE 0.0 END, 6) AS ndcg
       |FROM _m""".stripMargin
  }
}
