package graft.operators.ml

import graft.functions.HashFunctions
import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, StructField, StructType}

/** One trainer feature: the Spark [[Column]] and the DuckDB SQL text
  * must compute the SAME double per row (build them from integer counts
  * with fixed-shape rational arithmetic — IEEE `+ - * /` over exactly
  * representable operands is bit-identical in any engine; only
  * transcendentals may differ in the last ulp, and the trainer's
  * rounding discipline absorbs those).
  */
final case class LogregFeature(name: String, expr: Column, sql: String)

/** Distributed logistic-regression TRAINER — the missing half of the
  * learned-quality-classifier loop (the reference ships fixed
  * classifier weights and a 547-line map/reduce k-means trainer,
  * models/kmeans/distributed_trainer.py; training the quality model
  * itself is the same partial-sums discipline applied to the logistic
  * loss). Full-batch gradient descent:
  *
  *   w ← round₆( w + lr · Σᵢ xᵢ·(yᵢ − σ(w·xᵢ)) / n )
  *
  * one aggregate job per iteration over a persisted featurized frame —
  * at 100 TB each iteration is ONE partial-aggregated scan shipping
  * d+1 doubles per partition (no row shuffle), and [[fitSampleMod]]
  * bounds the fit to a deterministic hash-mod sample (the k-means
  * `train_sample_mod` discipline) while scoring still covers the full
  * corpus.
  *
  * Reproducibility: the model is quantized to the 10⁻⁶ grid after
  * every iteration — a deterministic-allreduce stand-in that makes the
  * trajectory bit-identical regardless of partitioning, summation
  * order, or engine (cross-engine/cross-run float-sum jitter is
  * ~10⁻¹² absolute against a 10⁻⁶ grid). The DuckDB twin refits the
  * whole trajectory from scratch as a chained-CTE unroll of the same
  * update — a fully independent second implementation, not a literal
  * injection.
  */
final class LogisticRegression(
    features: Seq[LogregFeature],
    label: Column,
    labelSql: String,
    val lr: Double = 1.0,
    val iters: Int = 8,
    val idCol: String = "doc_id",
    val fitSampleMod: Option[Int] = None,
    val posWeight: Double = 1.0,
    val l2: Double = 0.0) {

  require(features.nonEmpty, "logreg: at least one feature")
  require(iters >= 1 && iters <= 64, "logreg: 1..64 iterations")
  require(lr > 0.0, "logreg: positive learning rate")
  require(posWeight > 0.0, "logreg: positive pos_weight")
  require(l2 >= 0.0, "logreg: non-negative l2")
  fitSampleMod.foreach(m => require(m >= 1, "logreg: fit_sample_mod >= 1"))

  /** The weighted/regularized paths only engage off their defaults, so
    * the default trainer's arithmetic (and every existing gate hash)
    * stays byte-identical.
    */
  private val weighted = posWeight != 1.0

  val name = "logistic_regression"
  private val d = features.size

  private def dl(x: Double): String = s"CAST('${x.toString}' AS DOUBLE)"

  /** `idCol, _x1.._xd (double), _y (1.0/0.0)` — null labels count as
    * negative (CASE ELSE) in both engines.
    */
  def featurized(df: DataFrame): DataFrame =
    df.select(
      (col(idCol) +:
        features.zipWithIndex.map { case (f, j) =>
          f.expr.cast("double").as(s"_x${j + 1}") }) :+
        when(label, lit(1.0)).otherwise(lit(0.0)).as("_y"): _*)

  private def fitFrame(df: DataFrame): DataFrame = {
    val fr = featurized(df)
    fitSampleMod.fold(fr)(m =>
      fr.filter(HashFunctions.portableHash64(col(idCol)) % lit(m.toLong) === 0L))
  }

  /** z = b + w₁x₁ + … (left-assoc, the exact shape the SQL twin uses). */
  private def zOf(w: Array[Double]): Column =
    features.indices.foldLeft(lit(w(0)): Column) { (acc, j) =>
      acc + lit(w(j + 1)) * col(s"_x${j + 1}")
    }

  private def sigmoid(z: Column): Column = lit(1.0) / (lit(1.0) + exp(-z))

  /** The weight trajectory: element t = `(b, w1..wd)` AFTER iteration
    * t+1 (length [[iters]]). One aggregate job per iteration; the
    * rounded update itself is computed INSIDE the aggregate (Spark's
    * `round` = the twin's `round`), the driver only carries the d+1
    * quantized doubles forward. Empty fit input → weights stay put.
    */
  def fit(df: DataFrame): Seq[Array[Double]] = {
    val fr = fitFrame(df).persist()
    try {
      var w = Array.fill(d + 1)(0.0)
      (1 to iters).map { _ =>
        val resid0 = col("_y") - sigmoid(zOf(w))
        // pos_weight: the standard imbalanced-weak-label lever — each
        // positive example counts pos_weight times in BOTH the gradient
        // and the normalizer (sum of example weights)
        val resid = if (weighted)
          when(col("_y") === 1.0, lit(posWeight)).otherwise(lit(1.0)) * resid0
        else resid0
        val n = count(lit(1))
        val norm: Column = if (weighted)
          sum(when(col("_y") === 1.0, lit(posWeight)).otherwise(lit(1.0)))
        else n.cast("double")
        // coalesce: a row whose features are all null contributes a null
        // resid, which sum() skips while count() still sees the row — an
        // ALL-null corpus would make the sum itself null. Treat it as a
        // zero gradient (weights stay put) in BOTH engines rather than
        // letting Row.getDouble silently read null as 0.0 here while the
        // twin propagates NULL weights.
        def upd(old: Double, g: Column, reg: Boolean): Column = {
          val step =
            if (l2 != 0.0 && reg)
              lit(lr) * (coalesce(g, lit(0.0)) / norm - lit(l2) * lit(old))
            else lit(lr) * coalesce(g, lit(0.0)) / norm
          when(n > 0L, round(lit(old) + step, 6)).otherwise(lit(old))
        }
        // bias stays unregularized (standard)
        val aggs = upd(w(0), sum(resid), reg = false).as("b") +:
          features.indices.map(j =>
            upd(w(j + 1), sum(col(s"_x${j + 1}") * resid), reg = true).as(s"w${j + 1}"))
        val row = fr.agg(aggs.head, aggs.tail: _*).head()
        w = Array.tabulate(d + 1)(row.getDouble)
        w.clone()
      }
    } finally { fr.unpersist(); () }
  }

  /** Trajectory as a tiny driver-built frame:
    * `(iter, bias, w_<feature>…)` — iters × (d+2) quantized doubles
    * (the frozen-centroid-literals shape, not a distributed result).
    */
  def train(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val rows = fit(df).zipWithIndex.map { case (w, i) =>
      Row.fromSeq((i + 1).toLong +: w.toSeq)
    }
    val schema = StructType(
      StructField("iter", LongType) +: StructField("bias", DoubleType) +:
        features.map(f => StructField("w_" + f.name, DoubleType)))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
      .orderBy("iter")
  }

  /** `(idCol, score, y)` over the FULL frame with the given weights —
    * scoring is a codegen'd scalar projection (broadcast-free: the
    * model is d+1 literals). Scores round to 6 (rank-stable across
    * engines); `y` rides along for the eval loop ([[BinaryAuc]]).
    */
  def scoredWith(df: DataFrame, w: Array[Double]): DataFrame = {
    require(w.length == d + 1, s"logreg: ${d + 1} weights expected")
    featurized(df).select(col(idCol),
      round(sigmoid(zOf(w)), 6).as("score"), col("_y").as("y"))
  }

  /** Fit (on the sample if [[fitSampleMod]]) then score the full frame. */
  def scored(df: DataFrame): DataFrame = scoredWith(df, fit(df).last)

  /** `(idCol, score)` — the plain scoring surface. */
  def score(df: DataFrame): DataFrame = scored(df).select(col(idCol), col("score"))

  /** Active-learning batch: the k rows nearest the decision boundary
    * (smallest |score − 0.5|; ties by id). The labeling loop's next
    * batch — an argmin-k on the quantized margin, one global sort of
    * (margin, id) pairs.
    */
  def marginSample(df: DataFrame, k: Int): DataFrame = {
    val s = score(df)
    s.select(col(idCol),
        round(abs(col("score") - lit(0.5)), 6).as("margin"))
      .orderBy(col("margin"), col(idCol))
      .limit(k)
  }

  // ---- DuckDB twins: a from-scratch refit as chained-CTE unroll ----

  private def hashSql: String =
    HashFunctions.portableHash64Sql(s"CAST($idCol AS VARCHAR)")

  /** Feature CTE over `fromSql` rows (twin of [[featurized]]);
    * `sampled` adds the fit-sample predicate, `extraWhere` an arbitrary
    * one (the holdout split).
    */
  private def featsCte(cteName: String, fromSql: String, sampled: Boolean,
      extraWhere: Option[String] = None): String = {
    val xs = features.zipWithIndex.map { case (f, j) =>
      s"CAST(${f.sql} AS DOUBLE) AS x${j + 1}" }.mkString(",\n|    ")
    val preds =
      (if (sampled) fitSampleMod.map(m => s"$hashSql % $m = 0").toSeq else Nil) ++
        extraWhere.toSeq
    val where = if (preds.isEmpty) "" else s"\n|  WHERE ${preds.mkString(" AND ")}"
    // MATERIALIZED: the iteration chain references each level several
    // times (cross join + the empty-input ELSE subqueries) — inlined
    // CTEs would re-expand the scan/tokenize tree exponentially.
    s"""$cteName AS MATERIALIZED (SELECT $idCol,
       |    $xs,
       |    CASE WHEN $labelSql THEN 1.0 ELSE 0.0 END AS y
       |  FROM $fromSql$where)""".stripMargin
  }

  /** z/σ text over a weight row `(b, w1..wd)` cross-joined per feature
    * row — the same left-assoc shape as [[zOf]].
    */
  private val sigSql: String = {
    val z = features.indices.foldLeft("b") { (acc, j) => s"$acc + w${j + 1} * x${j + 1}" }
    s"1.0 / (1.0 + exp(-($z)))"
  }

  /** `_lg_it0.._lg_it{iters}` — the unrolled trajectory over `featsName`. */
  private def iterCtes(featsName: String): String = {
    val it0 = s"_lg_it0 AS MATERIALIZED (SELECT ${(0 to d).map(j => s"0.0 AS ${wn(j)}").mkString(", ")})"
    val steps = (1 to iters).map { t =>
      val prev = s"_lg_it${t - 1}"
      val residSql =
        if (weighted) s"CASE WHEN y = 1.0 THEN ${dl(posWeight)} ELSE 1.0 END * (y - $sigSql)"
        else s"y - $sigSql"
      val normSql =
        if (weighted) s"sum(CASE WHEN y = 1.0 THEN ${dl(posWeight)} ELSE 1.0 END)"
        else "CAST(count(*) AS DOUBLE)"
      val cols = (0 to d).map { j =>
        val g = if (j == 0) s"sum($residSql)" else s"sum(x$j * ($residSql))"
        val step =
          if (l2 != 0.0 && j > 0)
            s"${dl(lr)} * (coalesce($g, 0.0) / $normSql - ${dl(l2)} * any_value(${wn(j)}))"
          else s"${dl(lr)} * coalesce($g, 0.0) / $normSql"
        s"""CASE WHEN count(*) > 0
           |      THEN round(any_value(${wn(j)}) + $step, 6)
           |      ELSE (SELECT ${wn(j)} FROM $prev) END AS ${wn(j)}""".stripMargin
      }.mkString(",\n|    ")
      s"""_lg_it$t AS MATERIALIZED (SELECT $cols
         |  FROM $featsName, $prev)""".stripMargin
    }
    (it0 +: steps).mkString(",\n")
  }

  private def wn(j: Int): String = if (j == 0) "b" else s"w$j"

  /** Twin of [[train]]: the full unrolled trajectory. */
  def trainSql(fromSql: String): String = {
    val outCols = (s"b AS bias" +:
      features.zipWithIndex.map { case (f, j) => s"w${j + 1} AS w_${f.name}" })
      .mkString(", ")
    val arms = (1 to iters).map(t =>
      s"SELECT CAST($t AS BIGINT) AS iter, $outCols FROM _lg_it$t").mkString("\nUNION ALL\n")
    s"""WITH ${featsCte("_lgf", fromSql, sampled = true)},
       |${iterCtes("_lgf")}
       |$arms
       |ORDER BY iter""".stripMargin
  }

  /** Twin of [[scored]]: refit on the (possibly sampled) fit CTE, score
    * every row of the full frame. No ORDER BY — composable as a
    * subquery.
    */
  def scoredSql(fromSql: String): String =
    s"""WITH ${featsCte("_lgf", fromSql, sampled = true)},
       |${iterCtes("_lgf")},
       |${featsCte("_lgs", fromSql, sampled = false)}
       |SELECT $idCol, round($sigSql, 6) AS score, y
       |FROM _lgs, _lg_it$iters""".stripMargin

  /** Twin of [[score]], id-ordered (the gate shape). */
  def scoreSql(fromSql: String): String =
    s"""SELECT $idCol, score FROM (
       |${scoredSql(fromSql)}
       |) ORDER BY $idCol""".stripMargin

  /** Twin of the AUC eval over [[scored]] output. */
  def aucSql(fromSql: String): String =
    BinaryAuc.sql("score", "y = 1.0", s"(\n${scoredSql(fromSql)}\n)")

  // ---- holdout split: fit on hash%mod != 0, evaluate on == 0 ----

  /** `(idCol, score, y)` over the HELD-OUT 1-in-mod slice, scored by a
    * model fitted on the complement — the honest generalization eval
    * (the in-sample AUC gate rewards memorization at small n). The
    * split is the deterministic portable hash, so it is replay-stable
    * and engine-independent.
    */
  def holdoutScored(df: DataFrame, mod: Int): DataFrame = {
    require(mod >= 2, "holdout: mod >= 2 (1 would leave no training rows)")
    val h = HashFunctions.portableHash64(col(idCol))
    val w = fit(df.filter(h % mod =!= 0L)).last
    scoredWith(df.filter(h % mod === 0L), w)
  }

  /** Rank-sum AUC of [[holdoutScored]]. */
  def holdoutAuc(df: DataFrame, mod: Int): DataFrame =
    BinaryAuc.auc(holdoutScored(df, mod), col("score"), col("y") === 1.0)

  private def holdoutScoredSql(fromSql: String, mod: Int): String =
    s"""WITH ${featsCte("_lgf", fromSql, sampled = true,
          extraWhere = Some(s"$hashSql % $mod <> 0"))},
       |${iterCtes("_lgf")},
       |${featsCte("_lgs", fromSql, sampled = false,
          extraWhere = Some(s"$hashSql % $mod = 0"))}
       |SELECT $idCol, round($sigSql, 6) AS score, y
       |FROM _lgs, _lg_it$iters""".stripMargin

  /** Twin of [[holdoutAuc]]. */
  def holdoutAucSql(fromSql: String, mod: Int): String =
    BinaryAuc.sql("score", "y = 1.0", s"(\n${holdoutScoredSql(fromSql, mod)}\n)")

  /** Twin of [[marginSample]]. */
  def marginSampleSql(fromSql: String, k: Int): String =
    s"""WITH ${featsCte("_lgf", fromSql, sampled = true)},
       |${iterCtes("_lgf")},
       |${featsCte("_lgs", fromSql, sampled = false)},
       |_lgsc AS (SELECT $idCol, round(abs(round($sigSql, 6) - 0.5), 6) AS margin
       |  FROM _lgs, _lg_it$iters)
       |SELECT $idCol, margin FROM _lgsc
       |ORDER BY margin, $idCol LIMIT $k""".stripMargin
}
