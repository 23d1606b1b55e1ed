package graft.operators.ml

import graft.functions.{HashFunctions, TextFunctions}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multinomial Naive Bayes over hashed token buckets — the GENERATIVE
  * counterpart of [[LogisticRegression]] (the two classic cheap text
  * classifiers; NB is the standard first model for language/source
  * discrimination because its training phase is pure counting).
  *
  * Training is ONE corpus scan: explode tokens → bucket by the portable
  * 64-bit hash mod `buckets` → per-(bucket, class) occurrence counts.
  * Every model quantity is an EXACT integer (order-invariant sums, no
  * floating point anywhere in the fit), so the model table itself is a
  * hash-exact oracle gate — stronger than the quantization discipline
  * the GD trainer needs. Scoring joins doc tokens to the (≤ `buckets`
  * rows, broadcastable) model: add-α smoothed per-occurrence log-ratio
  * terms, one per-doc aggregate; the only floating point is the final
  * fixed-shape log expression both engines evaluate identically, with
  * the per-doc sum rounded to 6.
  *
  * Scale shape: fit = one explode + one bounded-key aggregate (the
  * model is ≤ `buckets` rows no matter the corpus); scoring = one
  * broadcast join + one per-doc aggregate. No shuffle ever carries more
  * than (doc, bucket) pairs.
  */
final class NaiveBayes(
    textCol: String = "text",
    idCol: String = "doc_id",
    label: Column,
    labelSql: String,
    buckets: Int = 4096,
    alpha: Double = 1.0) {

  require(buckets >= 2, "nb: at least 2 buckets")
  require(alpha > 0.0, "nb: positive smoothing")

  val name = "naive_bayes"

  private def dl(x: Double): String = s"CAST('${x.toString}' AS DOUBLE)"

  private def bucketOf(tok: Column): Column =
    pmod(HashFunctions.portableHash64(tok), lit(buckets.toLong))

  private def bucketSql(tokExpr: String): String = {
    val h = HashFunctions.portableHash64Sql(tokExpr)
    s"((($h) % $buckets) + $buckets) % $buckets"
  }

  /** `(idCol, _b (bucket), _n (occurrences), _y)` per (doc, bucket) —
    * the shared explode for fit and score. Null labels count as
    * negative (CASE ELSE), matching every other weak-label surface.
    */
  private def docBuckets(df: DataFrame): DataFrame =
    df.select(col(idCol),
        when(label, lit(1L)).otherwise(lit(0L)).as("_y"),
        explode_outer(TextFunctions.tokensOf(col(textCol))).as("_t"))
      .withColumn("_b", when(col("_t").isNotNull, bucketOf(col("_t"))))
      .groupBy(col(idCol), col("_y"), col("_b"))
      .agg(count(col("_t")).as("_n"))

  /** The fitted model: `(bucket, c_pos, c_neg)` occurrence counts for
    * every bucket that occurs in the corpus, bucket-ascending — exact
    * integers end to end.
    */
  def modelCounts(df: DataFrame): DataFrame =
    docBuckets(df).filter(col("_b").isNotNull)
      .groupBy(col("_b").as("bucket"))
      .agg(sum(when(col("_y") === 1L, col("_n")).otherwise(0L)).as("c_pos"),
        sum(when(col("_y") === 0L, col("_n")).otherwise(0L)).as("c_neg"))
      .orderBy(col("bucket"))

  /** One-row totals spine: token totals per class + doc counts per
    * class (priors) — broadcast, never collected.
    */
  private def totals(df: DataFrame): DataFrame =
    df.select(when(label, lit(1L)).otherwise(lit(0L)).as("_y"),
        TextFunctions.tokenCount(col(textCol)).as("_m"))
      .agg(
        sum(when(col("_y") === 1L, col("_m")).otherwise(0L)).as("_tpos"),
        sum(when(col("_y") === 0L, col("_m")).otherwise(0L)).as("_tneg"),
        sum(col("_y")).as("_dpos"),
        sum(lit(1L) - col("_y")).as("_dneg"))

  /** `(idCol, score, y)` — score = add-α smoothed log-odds
    * (positive vs negative), rounded to 6. Docs with no tokens score
    * the bare prior log-odds. The per-occurrence term shape is
    * identical in the SQL twin:
    * `n·((ln(c⁺+α) − ln(T⁺+α·B)) − (ln(c⁻+α) − ln(T⁻+α·B)))`,
    * priors `ln(d⁺+1) − ln(d⁻+1)` (add-one: a single-class corpus
    * stays finite).
    */
  def scored(df: DataFrame): DataFrame = scoredOn(df, df)

  /** Fit on `fitDf`, score every row of `scoreDf` (the
    * train-here/score-there split the registry refiner needs for
    * alive-only disposition fits).
    */
  def scoredOn(fitDf: DataFrame, scoreDf: DataFrame): DataFrame = {
    val model = modelCounts(fitDf)
    // score-side aggregation keys on (id, bucket) ONLY — one exchange,
    // label merged by max in the same pass — so exactly one output row
    // per id even if the id repeats (a duplicate id with conflicting
    // labels used to emit two score rows, which a consumer joining back
    // on the id would fan out). Identical rows to the fit-side
    // (id, y, bucket) grouping whenever ids are unique (every gate), so
    // the twin keeps its shape.
    val db = scoreDf.select(col(idCol),
        when(label, lit(1L)).otherwise(lit(0L)).as("_y"),
        explode_outer(TextFunctions.tokensOf(col(textCol))).as("_t"))
      .withColumn("_b", when(col("_t").isNotNull, bucketOf(col("_t"))))
      .groupBy(col(idCol), col("_b"))
      .agg(count(col("_t")).as("_n"), max(col("_y")).as("_y"))
      .join(broadcast(model), col("_b") === col("bucket"), "left_outer")
    val aD = lit(alpha * buckets)
    val term = col("_n").cast("double") *
      ((log(coalesce(col("c_pos"), lit(0L)).cast("double") + lit(alpha)) -
        log(col("_tpos").cast("double") + aD)) -
       (log(coalesce(col("c_neg"), lit(0L)).cast("double") + lit(alpha)) -
        log(col("_tneg").cast("double") + aD)))
    val prior = log(col("_dpos").cast("double") + lit(1.0)) -
      log(col("_dneg").cast("double") + lit(1.0))
    db.crossJoin(broadcast(totals(fitDf)))
      // key on the id ONLY and merge the label by max here too — a
      // duplicate id whose labels differ across buckets must still
      // collapse to one output row
      .groupBy(col(idCol), col("_dpos"), col("_dneg"))
      .agg(sum(when(col("_b").isNotNull, term).otherwise(lit(0.0))).as("_s"),
        max(col("_y")).as("_y"))
      .select(col(idCol),
        round(prior + coalesce(col("_s"), lit(0.0)), 6).as("score"),
        col("_y").cast("double").as("y"))
  }

  /** `(idCol, score)`, id-ordered — the gate shape. */
  def score(df: DataFrame): DataFrame =
    scored(df).select(col(idCol), col("score")).orderBy(col(idCol))

  /** Rank-sum AUC of the NB score against the training label. */
  def auc(df: DataFrame): DataFrame =
    BinaryAuc.auc(scored(df), col("score"), col("y") === 1.0)

  // ---- DuckDB twins ----

  /** Shared CTEs: `_nbd` per-(doc, bucket) counts (tokenless docs keep
    * one null-bucket row), `_nbm` the model, `_nbt` the totals spine.
    */
  private def baseCtes(fromSql: String): String =
    s"""_nbr AS MATERIALIZED (SELECT $idCol,
       |    CASE WHEN $labelSql THEN 1 ELSE 0 END AS y,
       |    ${TextFunctions.tokensOfSql(textCol)} AS toks
       |  FROM $fromSql),
       |_nbd AS MATERIALIZED (SELECT $idCol, y, _b, CAST(count(_t) AS BIGINT) AS _n
       |  FROM (SELECT $idCol, y, _t,
       |      CASE WHEN _t IS NOT NULL THEN ${bucketSql("_t")} END AS _b
       |    FROM (SELECT $idCol, y,
       |        unnest(CASE WHEN len(toks) = 0 THEN [NULL] ELSE toks END) AS _t
       |      FROM _nbr))
       |  GROUP BY $idCol, y, _b),
       |_nbm AS MATERIALIZED (SELECT _b AS bucket,
       |    CAST(sum(CASE WHEN y = 1 THEN _n ELSE 0 END) AS BIGINT) AS c_pos,
       |    CAST(sum(CASE WHEN y = 0 THEN _n ELSE 0 END) AS BIGINT) AS c_neg
       |  FROM _nbd WHERE _b IS NOT NULL GROUP BY _b),
       |_nbt AS MATERIALIZED (SELECT
       |    CAST(sum(CASE WHEN y = 1 THEN len(toks) ELSE 0 END) AS BIGINT) AS tpos,
       |    CAST(sum(CASE WHEN y = 0 THEN len(toks) ELSE 0 END) AS BIGINT) AS tneg,
       |    CAST(sum(y) AS BIGINT) AS dpos,
       |    CAST(sum(1 - y) AS BIGINT) AS dneg
       |  FROM _nbr)""".stripMargin

  /** Twin of [[modelCounts]]. */
  def modelSql(fromSql: String): String =
    s"""WITH ${baseCtes(fromSql)}
       |SELECT bucket, c_pos, c_neg FROM _nbm ORDER BY bucket""".stripMargin

  /** Twin of [[scored]] — a complete `WITH … SELECT` statement
    * (compose by wrapping as a parenthesized subquery).
    */
  def scoredSql(fromSql: String): String = {
    val aD = dl(alpha * buckets)
    val a = dl(alpha)
    s"""WITH ${baseCtes(fromSql)},
       |_nbs AS (SELECT d.$idCol, d.y,
       |    sum(CASE WHEN d._b IS NOT NULL THEN CAST(d._n AS DOUBLE) *
       |      ((ln(CAST(coalesce(m.c_pos, 0) AS DOUBLE) + $a) - ln(CAST(t.tpos AS DOUBLE) + $aD)) -
       |       (ln(CAST(coalesce(m.c_neg, 0) AS DOUBLE) + $a) - ln(CAST(t.tneg AS DOUBLE) + $aD)))
       |      ELSE 0.0 END) AS _s,
       |    any_value(t.dpos) AS dpos, any_value(t.dneg) AS dneg
       |  FROM _nbd d LEFT JOIN _nbm m ON d._b = m.bucket, _nbt t
       |  GROUP BY d.$idCol, d.y)
       |SELECT $idCol,
       |  round((ln(CAST(dpos AS DOUBLE) + 1.0) - ln(CAST(dneg AS DOUBLE) + 1.0))
       |    + coalesce(_s, 0.0), 6) AS score,
       |  CAST(y AS DOUBLE) AS y
       |FROM _nbs""".stripMargin
  }

  /** Twin of [[score]]. */
  def scoreSql(fromSql: String): String =
    s"""SELECT $idCol, score FROM (
       |${scoredSql(fromSql)}
       |) ORDER BY $idCol""".stripMargin

  /** Twin of [[auc]]. */
  def aucSql(fromSql: String): String =
    BinaryAuc.sql("score", "y = 1.0", s"(\n${scoredSql(fromSql)}\n)")
}

/** Registry face: adds `outputCol` = the NB log-odds of every row,
  * fitted on the incoming frame against the weak label (the
  * [[LogregQualityRefiner]] contract for the generative family). One
  * fit per frame via the single-slot cache; in disposition mode the fit
  * sees alive rows only. The fitted model rides as a broadcast join,
  * so unlike the logreg refiner this enrich is a join + per-doc
  * aggregate, not a pure projection — [[added]] is therefore not
  * expressible and the operator implements [[graft.core.Operator]]
  * directly (the output column joins back on `idCol`).
  */
final class NbQualityRefiner(
    textCol: String = "text",
    idCol: String = "id",
    labelCol: String = "label",
    labelValue: Option[String] = None,
    outputCol: String = "nb_score",
    buckets: Int = 4096,
    alpha: Double = 1.0) extends graft.core.Operator {

  val name = "nb_quality"

  private val label: Column =
    labelValue.fold(col(labelCol) === true)(v => col(labelCol) === v)

  private[graft] val trainer = new NaiveBayes(
    textCol, idCol, label,
    // quotes doubled — the twin must stay legal SQL for any label_value
    labelValue.fold(s"$labelCol = true")(v =>
      s"$labelCol = '${v.replace("'", "''")}'"),
    buckets = buckets, alpha = alpha)

  private def scoresOf(fitFrame: DataFrame, scoreFrame: DataFrame): DataFrame =
    // fit on fitFrame, score scoreFrame: NaiveBayes.scored fits and
    // scores the same frame; split the two by scoring through the
    // fitted model pieces directly
    trainer.scoredOn(fitFrame, scoreFrame)
      .select(col(idCol), col("score").as(outputCol))

  def apply(df: DataFrame): DataFrame =
    df.join(scoresOf(df, df), Seq(idCol), "left_outer")

  override def applyGated(df: DataFrame, alive: Column): DataFrame =
    df.join(scoresOf(df.filter(alive), df), Seq(idCol), "left_outer")
}
