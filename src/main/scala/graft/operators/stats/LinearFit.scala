package graft.operators.stats

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed ordinary-least-squares over INTEGER feature columns via
  * the normal equations — the map/reduce model-fitting tier (the
  * reference ships a 547-line map/reduce k-means trainer,
  * models/kmeans/distributed_trainer.py; this is the same partial-sums
  * discipline applied to regression). One pass computes the 9 moment
  * sums of `(1, x1, x2) × (x1, x2, y)` as EXACT BIGINT partial
  * aggregates (integer features ⇒ integer products ⇒ order-invariant
  * sums — no floating-point reduction, so the result is independent of
  * partitioning and bit-reproducible in any engine); the 3×3 system is
  * then solved in fixed-shape double arithmetic (Cramer's rule), which
  * the DuckDB oracle replays expression-for-expression.
  *
  * Scale shape: ONE partial-aggregated scan (9 longs per partition on
  * the wire, no shuffle of rows), driver-free — the solve itself is a
  * scalar projection over the one-row aggregate. The exact-integer trick
  * holds while Σx·y < 2⁶³ (at 100 TB: feature magnitudes ~10³–10⁴ and
  * 10¹¹ rows keep products < 10¹⁹ only marginally — production would
  * shard the sums or centre features first; both folds stay exact
  * far beyond the benched scales).
  *
  * Correlation ([[corr]]) reuses the same exact sums for the closed-form
  * Pearson r of every feature pair.
  */
final class LinearFit(
    targetCol: String,
    f1Col: String,
    f2Col: String) {

  val name = "linear_fit"

  private def sums(df: DataFrame, groupCol: Option[String] = None): DataFrame = {
    val x1 = col("_x1"); val x2 = col("_x2"); val y = col("_y")
    val proj = df.select(
      (groupCol.map(col).toSeq :+
        col(f1Col).cast("long").as("_x1")) ++
        Seq(col(f2Col).cast("long").as("_x2"),
          col(targetCol).cast("long").as("_y")): _*)
    val aggs = Seq(
      count(lit(1)).as("n"),
      sum(x1).as("sx1"), sum(x2).as("sx2"), sum(y).as("sy"),
      sum(x1 * x1).as("s11"), sum(x1 * x2).as("s12"), sum(x2 * x2).as("s22"),
      sum(x1 * y).as("s1y"), sum(x2 * y).as("s2y"),
      sum(y * y).as("syy"))
    groupCol match {
      case Some(g) => proj.groupBy(col(g)).agg(aggs.head, aggs.tail: _*)
      case None => proj.agg(aggs.head, aggs.tail: _*)
    }
  }

  /** One row: `(n, beta0, beta1, beta2)` for
    * `target ≈ beta0 + beta1·f1 + beta2·f2`, rounded to 6 decimals.
    */
  def fit(df: DataFrame): DataFrame = solve(sums(df), Nil)

  /** Per-group fits — grouped normal equations (one keyed exchange of
    * 10 longs per group per partition; the "model per domain" loop of
    * per-source quality trend analysis). One row per `groupCol` value.
    */
  def fitBy(df: DataFrame, groupCol: String): DataFrame =
    solve(sums(df, Some(groupCol)), Seq(col(groupCol))).orderBy(col(groupCol))

  private def solve(s: DataFrame, keyCols: Seq[Column]): DataFrame = {
    val n = col("n").cast("double")
    val sx1 = col("sx1").cast("double"); val sx2 = col("sx2").cast("double")
    val sy = col("sy").cast("double")
    val s11 = col("s11").cast("double"); val s12 = col("s12").cast("double")
    val s22 = col("s22").cast("double")
    val s1y = col("s1y").cast("double"); val s2y = col("s2y").cast("double")
    // Cramer's rule on [[n sx1 sx2][sx1 s11 s12][sx2 s12 s22]] β = [sy s1y s2y]
    val det = n * (s11 * s22 - s12 * s12) - sx1 * (sx1 * s22 - s12 * sx2) +
      sx2 * (sx1 * s12 - s11 * sx2)
    val det0 = sy * (s11 * s22 - s12 * s12) - sx1 * (s1y * s22 - s12 * s2y) +
      sx2 * (s1y * s12 - s11 * s2y)
    val det1 = n * (s1y * s22 - s12 * s2y) - sy * (sx1 * s22 - s12 * sx2) +
      sx2 * (sx1 * s2y - s1y * sx2)
    val det2 = n * (s11 * s2y - s1y * s12) - sx1 * (sx1 * s2y - s1y * sx2) +
      sy * (sx1 * s12 - s11 * sx2)
    // Singular normal matrix (collinear/constant features, tiny groups)
    // → null betas. CASE branches evaluate lazily, so the division never
    // runs when det = 0 — under ANSI mode x/0.0 would otherwise throw.
    def safe(num: Column): Column = when(det =!= 0d, round(num / det, 6))
    s.select(keyCols ++ Seq(col("n"),
      safe(det0).as("beta0"),
      safe(det1).as("beta1"),
      safe(det2).as("beta2")): _*)
  }

  /** One row: pairwise Pearson r over `(f1, f2, target)`, rounded to 6. */
  def corr(df: DataFrame): DataFrame = {
    val s = sums(df)
    val n = col("n").cast("double")
    def r(sa: String, sb: String, sab: String, saa: String, sbb: String): Column = {
      val a = col(sa).cast("double"); val b = col(sb).cast("double")
      val ab = col(sab).cast("double")
      val aa = col(saa).cast("double"); val bb = col(sbb).cast("double")
      // Zero variance in either column → undefined r → null (lazy CASE
      // keeps the ANSI divide from ever seeing a 0 denominator).
      val denomSq = (n * aa - a * a) * (n * bb - b * b)
      when(denomSq > 0d, (n * ab - a * b) / sqrt(denomSq))
    }
    s.select(col("n"),
      round(r("sx1", "sx2", "s12", "s11", "s22"), 6).as("r_f1_f2"),
      round(r("sx1", "sy", "s1y", "s11", "syy"), 6).as("r_f1_y"),
      round(r("sx2", "sy", "s2y", "s22", "syy"), 6).as("r_f2_y"))
  }

  // ---- DuckDB twins (expression shape mirrors the Column forms) ----

  /** `_lfsums` CTE over feature/target EXPRESSIONS (must yield
    * integers); optional per-group variant.
    */
  private def sumsCte(table: String, x1E: String, x2E: String, yE: String,
      group: Option[String] = None): String = {
    val gSel = group.map(g => s"$g, ").getOrElse("")
    val gBy = group.map(g => s" GROUP BY $g").getOrElse("")
    s"""_lfr AS (SELECT $gSel CAST($x1E AS BIGINT) AS x1, CAST($x2E AS BIGINT) AS x2,
       |    CAST($yE AS BIGINT) AS y FROM $table),
       |_lfsums AS (SELECT $gSel count(*) AS n,
       |    CAST(sum(x1) AS BIGINT) AS sx1, CAST(sum(x2) AS BIGINT) AS sx2,
       |    CAST(sum(y) AS BIGINT) AS sy,
       |    CAST(sum(x1 * x1) AS BIGINT) AS s11, CAST(sum(x1 * x2) AS BIGINT) AS s12,
       |    CAST(sum(x2 * x2) AS BIGINT) AS s22,
       |    CAST(sum(x1 * y) AS BIGINT) AS s1y, CAST(sum(x2 * y) AS BIGINT) AS s2y,
       |    CAST(sum(y * y) AS BIGINT) AS syy
       |  FROM _lfr$gBy)""".stripMargin
  }

  private def d(c: String): String = s"CAST($c AS DOUBLE)"

  def fitSql(table: String, x1E: String, x2E: String, yE: String,
      group: Option[String] = None): String = {
    val (n, sx1, sx2, sy) = (d("n"), d("sx1"), d("sx2"), d("sy"))
    val (s11, s12, s22) = (d("s11"), d("s12"), d("s22"))
    val (s1y, s2y) = (d("s1y"), d("s2y"))
    val det = s"$n * ($s11 * $s22 - $s12 * $s12) - $sx1 * ($sx1 * $s22 - $s12 * $sx2) + " +
      s"$sx2 * ($sx1 * $s12 - $s11 * $sx2)"
    val det0 = s"$sy * ($s11 * $s22 - $s12 * $s12) - $sx1 * ($s1y * $s22 - $s12 * $s2y) + " +
      s"$sx2 * ($s1y * $s12 - $s11 * $s2y)"
    val det1 = s"$n * ($s1y * $s22 - $s12 * $s2y) - $sy * ($sx1 * $s22 - $s12 * $sx2) + " +
      s"$sx2 * ($sx1 * $s2y - $s1y * $sx2)"
    val det2 = s"$n * ($s11 * $s2y - $s1y * $s12) - $sx1 * ($sx1 * $s2y - $s1y * $sx2) + " +
      s"$sy * ($sx1 * $s12 - $s11 * $sx2)"
    val gSel = group.map(g => s"$g, ").getOrElse("")
    val order = group.map(g => s" ORDER BY $g").getOrElse("")
    // Mirror the Spark-side singular-system guard: null betas when det=0
    // (DuckDB would return inf instead of throwing — still a divergence).
    def safe(num: String): String =
      s"CASE WHEN ($det) <> 0 THEN round(($num) / ($det), 6) END"
    s"""WITH ${sumsCte(table, x1E, x2E, yE, group)}
       |SELECT $gSel n, ${safe(det0)} AS beta0,
       |  ${safe(det1)} AS beta1,
       |  ${safe(det2)} AS beta2
       |FROM _lfsums$order""".stripMargin
  }

  def corrSql(table: String, x1E: String, x2E: String, yE: String): String = {
    val n = d("n")
    def r(sa: String, sb: String, sab: String, saa: String, sbb: String): String = {
      val (a, b, ab, aa, bb) = (d(sa), d(sb), d(sab), d(saa), d(sbb))
      val denomSq = s"($n * $aa - $a * $a) * ($n * $bb - $b * $b)"
      s"CASE WHEN ($denomSq) > 0 THEN ($n * $ab - $a * $b) / sqrt($denomSq) END"
    }
    s"""WITH ${sumsCte(table, x1E, x2E, yE)}
       |SELECT n, round(${r("sx1", "sx2", "s12", "s11", "s22")}, 6) AS r_f1_f2,
       |  round(${r("sx1", "sy", "s1y", "s11", "syy")}, 6) AS r_f1_y,
       |  round(${r("sx2", "sy", "s2y", "s22", "syy")}, 6) AS r_f2_y
       |FROM _lfsums""".stripMargin
  }
}
