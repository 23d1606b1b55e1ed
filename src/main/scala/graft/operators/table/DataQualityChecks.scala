package graft.operators.table

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality constraint suite (the Deequ/Great-Expectations
  * slot): a pipeline firewall that validates a table BEFORE expensive
  * curation runs on it. The reference validates loader output ad hoc
  * (reference: mega_data_factory/loaders/base_loader.py checks field
  * presence per record); at 100 TB the same contract belongs in one
  * declarative pass over the table, not per-record Python.
  *
  * Every scan check compiles into conditional aggregates of ONE `agg` over
  * the table — a partial-aggregated single scan whose shuffled state is a
  * handful of longs — then the per-check rows are exploded from the 1-row
  * result (driver-free, `inline`). Referential integrity is the one check
  * that genuinely needs a second table: a LEFT ANTI join counted the same
  * way (broadcast when the dim is small, shuffle hash otherwise — planner's
  * choice, both scale).
  *
  * Exactness contract: `passed` is decided by INTEGER cross-multiplication
  * (`ok * 10^6 >= floor(minFrac*10^6) * total`) — never by comparing the
  * rounded double `observed` to a double threshold, so both engines agree
  * at the boundary (e.g. observed == threshold exactly). `observed` is
  * `round(ok/total, 6)` for display; NULL (with NULL `passed`) on an empty
  * table — an empty input is "no evidence", not "pass".
  */
object DataQualityChecks {

  /** One declarative constraint. `minFrac` thresholds are in [0,1] and
    * compare against the fraction of non-null-scoped rows passing.
    */
  sealed trait Check {
    def kind: String
    def target: String
    def minFrac: Double
    /** Numerator predicate over a row; NULL handling per check. */
    def okExpr: Column
    def okSql: String
    /** Denominator: rows the check is scoped to (default: all rows). */
    def scopeExpr: Column = lit(true)
    def scopeSql: String = "TRUE"
  }

  /** Fraction of rows with `col` non-null >= minFrac. */
  final case class Completeness(col: String, minFrac: Double = 1.0) extends Check {
    val kind = "completeness"; val target = col
    def okExpr: Column = org.apache.spark.sql.functions.col(col).isNotNull
    def okSql: String = s"$col IS NOT NULL"
  }

  /** Distinct values / total rows >= minFrac (1.0 = primary key).
    * NULLs contribute ZERO distinct values (both engines' count(distinct)
    * drops NULL entirely), so any NULL key lowers the ratio — pair with a
    * [[Completeness]] check to tell "duplicates" from "nulls" apart.
    */
  final case class Uniqueness(col: String, minFrac: Double = 1.0) extends Check {
    val kind = "uniqueness"; val target = col
    def okExpr: Column = org.apache.spark.sql.functions.col(col) // unused
    def okSql: String = col
  }

  /** Fraction of NON-NULL values inside [lo, hi] >= minFrac. Intended for
    * numeric columns; on a string column a malformed value TRY_CASTs to
    * NULL in BOTH engines (plain CAST would ERROR in both — Spark runs
    * ANSI mode, and DuckDB casts are strict) and counts as failing — a
    * firewall reports bad values, it never blows up on them.
    */
  final case class InRange(col: String, lo: Double, hi: Double, minFrac: Double = 1.0) extends Check {
    val kind = "in_range"; val target = col
    def okExpr: Column = {
      val c = expr(s"try_cast($col AS DOUBLE)")
      c >= lo && c <= hi
    }
    def okSql: String = s"TRY_CAST($col AS DOUBLE) BETWEEN $lo AND $hi"
    override def scopeExpr: Column = org.apache.spark.sql.functions.col(col).isNotNull
    override def scopeSql: String = s"$col IS NOT NULL"
  }

  /** Fraction of NON-NULL values in the allowed set >= minFrac. */
  final case class InSet(col: String, values: Seq[String], minFrac: Double = 1.0) extends Check {
    require(values.nonEmpty,
      "in_set needs at least one allowed value (an empty list would be " +
        "always-false in Spark and a syntax error in the SQL twin)")
    val kind = "in_set"; val target = col
    def okExpr: Column =
      org.apache.spark.sql.functions.col(col).cast("string").isin(values: _*)
    def okSql: String =
      s"TRY_CAST($col AS VARCHAR) IN (${values.map(v => s"'${DataQualityChecks.q(v)}'").mkString(", ")})"
    override def scopeExpr: Column = org.apache.spark.sql.functions.col(col).isNotNull
    override def scopeSql: String = s"$col IS NOT NULL"
  }

  /** Fraction of NON-NULL values matching the regex (full-string anchors are
    * the caller's choice) >= minFrac. The pattern must be RE2-compatible so
    * the DuckDB twin evaluates it identically.
    */
  final case class MatchesRegex(col: String, pattern: String, minFrac: Double = 1.0) extends Check {
    val kind = "matches_regex"; val target = col
    def okExpr: Column =
      org.apache.spark.sql.functions.col(col).cast("string").rlike(pattern)
    def okSql: String =
      s"regexp_matches(TRY_CAST($col AS VARCHAR), '${DataQualityChecks.q(pattern)}')"
    override def scopeExpr: Column = org.apache.spark.sql.functions.col(col).isNotNull
    override def scopeSql: String = s"$col IS NOT NULL"
  }

  private val Scale = 1000000L
  private def thresh(minFrac: Double): Long = math.floor(minFrac * Scale).toLong

  /** SQL string-literal escape for user-supplied values/patterns. */
  private[table] def q(s: String): String = s.replace("'", "''")

  /** All scan checks over `df` in one aggregate pass.
    * Output: (check, target, observed, threshold, passed) ordered by
    * (check, target).
    */
  def apply(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "at least one check")
    require(checks.forall(c => c.minFrac >= 0 && c.minFrac <= 1), "minFrac in [0,1]")
    // one conditional-aggregate pair per check + the distinct counts
    val aggs: Seq[Column] = checks.zipWithIndex.flatMap { case (c, i) =>
      c match {
        case _: Uniqueness =>
          Seq(countDistinct(col(c.target)).as(s"_ok$i"),
            count(when(c.scopeExpr, lit(1))).as(s"_n$i"))
        case _ =>
          Seq(count(when(c.scopeExpr && c.okExpr, lit(1))).as(s"_ok$i"),
            count(when(c.scopeExpr, lit(1))).as(s"_n$i"))
      }
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    // explode the 1-row aggregate into one row per check
    val rows = checks.zipWithIndex.map { case (c, i) =>
      struct(
        lit(c.kind).as("check"),
        lit(c.target).as("target"),
        when(col(s"_n$i") > 0L,
          round(col(s"_ok$i").cast("double") / col(s"_n$i").cast("double"), 6))
          .as("observed"),
        lit(c.minFrac).as("threshold"),
        when(col(s"_n$i") > 0L,
          col(s"_ok$i") * Scale >= lit(thresh(c.minFrac)) * col(s"_n$i"))
          .as("passed"))
    }
    one.select(inline(array(rows: _*)))
      .orderBy(col("check"), col("target"))
  }

  /** Referential integrity: every non-null `factCol` value exists in
    * `dim.dimCol`. One row: observed = fraction of non-null fact rows whose
    * key resolves; passed = violations == 0 when minFrac = 1.0. The anti
    * join shuffles on the key (or broadcasts the dim) — the same shape as
    * the production fact-dim join it protects.
    */
  def refIntegrity(fact: DataFrame, factCol: String, dim: DataFrame,
      dimCol: String, minFrac: Double = 1.0): DataFrame = {
    // ONE pass over the fact table: left join + conditional count (the
    // same shape as the DuckDB twin) — an anti-join plus a separate
    // count would scan the large side twice
    val counted = fact.filter(col(factCol).isNotNull)
      .join(dim.select(col(dimCol).as("_dqk")).distinct(),
        col(factCol) === col("_dqk"), "left")
      .agg(count(lit(1)).as("_n"),
        count(when(col("_dqk").isNull, lit(1))).as("_v"))
    counted.select(
      lit("ref_integrity").as("check"),
      lit(factCol + "->" + dimCol).as("target"),
      when(col("_n") > 0L,
        round((col("_n") - col("_v")).cast("double") / col("_n").cast("double"), 6))
        .as("observed"),
      lit(minFrac).as("threshold"),
      when(col("_n") > 0L,
        (col("_n") - col("_v")) * Scale >= lit(thresh(minFrac)) * col("_n"))
        .as("passed"))
  }

  // ---- DuckDB twins ----

  /** The `_dq AS (...)` CTE body: one aggregate scan of `table`. */
  def scanCteSql(table: String, checks: Seq[Check]): String = {
    val aggs = checks.zipWithIndex.map { case (c, i) =>
      c match {
        case _: Uniqueness =>
          s"count(DISTINCT ${c.okSql}) AS _ok$i, count(CASE WHEN ${c.scopeSql} THEN 1 END) AS _n$i"
        case _ =>
          s"count(CASE WHEN ${c.scopeSql} AND ${c.okSql} THEN 1 END) AS _ok$i, " +
            s"count(CASE WHEN ${c.scopeSql} THEN 1 END) AS _n$i"
      }
    }.mkString(", ")
    s"_dq AS (SELECT $aggs FROM $table)"
  }

  /** UNION-ALL row selects over the `_dq` CTE, one per check. */
  def rowSelectsSql(checks: Seq[Check]): String =
    checks.zipWithIndex.map { case (c, i) =>
      s"""SELECT '${c.kind}' AS "check", '${c.target}' AS target,
         |  CASE WHEN _n$i > 0 THEN round(CAST(_ok$i AS DOUBLE) / CAST(_n$i AS DOUBLE), 6) END AS observed,
         |  CAST(${c.minFrac} AS DOUBLE) AS threshold,
         |  CASE WHEN _n$i > 0 THEN _ok$i * $Scale >= ${thresh(c.minFrac)} * _n$i END AS passed
         |FROM _dq""".stripMargin
    }.mkString("\nUNION ALL\n")

  def sql(table: String, checks: Seq[Check]): String =
    s"""WITH ${scanCteSql(table, checks)}
       |${rowSelectsSql(checks)}
       |ORDER BY "check", target""".stripMargin

  /** The ref-integrity row as a plain (CTE-free) SELECT, composable into a
    * UNION ALL chain.
    */
  def refIntegritySql(factTable: String, factCol: String, dimTable: String,
      dimCol: String, minFrac: Double = 1.0): String =
    s"""SELECT 'ref_integrity' AS "check", '$factCol->$dimCol' AS target,
       |  CASE WHEN _n > 0 THEN round(CAST(_n - _v AS DOUBLE) / CAST(_n AS DOUBLE), 6) END AS observed,
       |  CAST($minFrac AS DOUBLE) AS threshold,
       |  CASE WHEN _n > 0 THEN (_n - _v) * $Scale >= ${thresh(minFrac)} * _n END AS passed
       |FROM (SELECT count(*) AS _n,
       |    count(CASE WHEN d.$dimCol IS NULL THEN 1 END) AS _v
       |  FROM (SELECT $factCol FROM $factTable WHERE $factCol IS NOT NULL) f
       |  LEFT JOIN (SELECT DISTINCT $dimCol FROM $dimTable) d
       |    ON f.$factCol = d.$dimCol)""".stripMargin
}
