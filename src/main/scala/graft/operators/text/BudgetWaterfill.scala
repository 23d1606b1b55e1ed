package graft.operators.text

import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Water-filling token-budget allocator — the fair-share planning step
  * for multi-source pretraining mixes ([[MixPlan]] executes explicit
  * WEIGHTS; this solves the dual problem: no weights, split a token
  * budget EQUALLY except where a group can't absorb its share, and
  * redistribute that surplus — how a recipe caps a dominant crawl while
  * taking small high-quality sources whole, à la The Pile's treatment
  * of small academic sets).
  *
  * Water level: sort groups by available tokens ascending; group i is
  * FULLY FUNDED iff `a_i · (n−i+1) ≤ B − prefix_{i−1}` (its full demand
  * fits the equal split of what's left after funding everything
  * smaller — the predicate is monotone along the sort, so funded groups
  * form a prefix); every unfunded group gets the common level
  * `(B − prefix_k) / (n − k)`. Budget is a RATIONAL fraction
  * `num/den` of the corpus total so one gate is meaningful at every
  * scale factor: `B = total · num DIV den`, exact BIGINT.
  *
  * Exactness: counts and prefixes are exact BIGINTs; EVERY product and
  * every mixed sum/difference (the budget product `total · num`, the
  * funded predicate's both sides, the residual `B − prefix_k`) is
  * computed in decimal(38,0)/HUGEINT — two near-2⁶³ longs must not
  * overflow-error in either engine (long operands cast to decimal(20,0)
  * first, so the product precision 20+20+1 caps safely inside 38); only
  * the final level is a double, the same fixed-shape division in both.
  * The one representability bound: the budget B itself must fit a
  * BIGINT after the DIV (a budget beyond 2⁶³ tokens funds everything
  * anyway).
  *
  * Scale shape: ONE corpus aggregate (groupBy(group) over the token
  * counts), staged ([[graft.core.Staging]]) because the k-scalar and the
  * output both consume it; everything downstream — the ordered window,
  * the totals, the funded scan — rides the GROUPS-sized table (the
  * MixPlan posture: sources/langs ≪ rows; a corpus with unbounded group
  * cardinality should pre-bucket before asking for a per-group plan).
  */
final class BudgetWaterfill(
    textCol: String = "text",
    groupCol: String = "source",
    budgetNum: Long,
    budgetDen: Long) {

  require(budgetNum >= 0, s"budgetNum must be >= 0, got $budgetNum")
  require(budgetDen >= 1, s"budgetDen must be >= 1, got $budgetDen")

  val name = "token_budget_waterfill"

  /** `(group, avail_tokens, funded, allocated_tokens)` per group,
    * ordered by group.
    */
  def apply(df: DataFrame): DataFrame =
    fromCounts(df.groupBy(col(groupCol).as("grp"))
      .agg(sum(TextFunctions.tokenCount(col(textCol))).as("avail")))

  /** Same plan over a PRE-AGGREGATED `(grp, avail)` table — the entry a
    * planner uses when token counts already live in a metadata/metrics
    * table (and the entry the overflow property test drives with token
    * totals near 2⁶³, unreachable through row-level text fixtures).
    */
  def fromCounts(counts: DataFrame): DataFrame = {
    val avail = graft.core.Staging.stage(
      counts.select(col("grp"), col("avail").cast("long").as("avail")))
    // long operands enter arithmetic as decimal(20,0): the product
    // precision rule (p1+p2+1 = 41 → capped 38, scale 0) then always
    // holds the full 38-digit product of two longs — no overflow path.
    val d20 = "decimal(20,0)"
    val tot = avail.agg(count(lit(1)).as("_n"), sum(col("avail")).as("_t"))
      .select(col("_n"),
        (col("_t").cast(d20) * lit(budgetNum).cast(d20)).as("_bp"))
      // IntegralDivide yields BIGINT: B must be long-representable (doc'd)
      .select(col("_n"), expr(s"_bp DIV CAST($budgetDen AS $d20)").as("_b"))
    val w = Window.orderBy(col("avail"), col("grp"))
    val ranked = avail
      .withColumn("_rn", row_number().over(w))
      .withColumn("_pfx", sum(col("avail"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .crossJoin(broadcast(tot))
    // both predicate sides in decimal: the left product AND the right
    // mixed sum (B − prefix + avail reaches ±2·2⁶³ before the old cast
    // applied — ADVICE r14)
    val funded = col("avail").cast(d20) * (col("_n") - col("_rn") + 1).cast(d20) <=
      col("_b").cast(d20) - col("_pfx").cast(d20) + col("avail").cast(d20)
    val kRow = ranked.agg(
      coalesce(max(when(funded, col("_rn"))), lit(0L)).cast("long").as("_k"),
      coalesce(max(when(funded, col("_pfx"))), lit(0L)).as("_pk"))
    ranked.crossJoin(broadcast(kRow))
      .select(col("grp").as(groupCol),
        col("avail").as("avail_tokens"),
        (col("_rn") <= col("_k")).as("funded"),
        when(col("_rn") <= col("_k"), round(col("avail").cast("double"), 6))
          .otherwise(round((col("_b").cast(d20) - col("_pk").cast(d20)).cast("double") /
            (col("_n") - col("_k")).cast("double"), 6))
          .as("allocated_tokens"))
      .orderBy(col(groupCol))
  }

  // ---- DuckDB twin: the same integer algebra ----

  def sql(table: String): String = {
    val tc = TextFunctions.tokenCountSql(textCol)
    s"""WITH _av AS (SELECT $groupCol AS grp, CAST(sum($tc) AS BIGINT) AS avail
       |  FROM $table GROUP BY 1),
       |_tot AS (SELECT CAST(count(*) AS BIGINT) AS _n,
       |    CAST((CAST(sum(avail) AS HUGEINT) * $budgetNum) // $budgetDen
       |      AS BIGINT) AS _b
       |  FROM _av),
       |_rk AS (SELECT grp, avail,
       |    CAST(row_number() OVER (ORDER BY avail, grp NULLS FIRST) AS BIGINT) AS _rn,
       |    CAST(sum(avail) OVER (ORDER BY avail, grp NULLS FIRST
       |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS _pfx,
       |    _n, _b
       |  FROM _av CROSS JOIN _tot),
       |_k AS (SELECT
       |    coalesce(max(CASE WHEN CAST(avail AS HUGEINT) * (_n - _rn + 1)
       |      <= CAST(_b AS HUGEINT) - CAST(_pfx AS HUGEINT) + CAST(avail AS HUGEINT)
       |      THEN _rn END), 0) AS _k,
       |    coalesce(max(CASE WHEN CAST(avail AS HUGEINT) * (_n - _rn + 1)
       |      <= CAST(_b AS HUGEINT) - CAST(_pfx AS HUGEINT) + CAST(avail AS HUGEINT)
       |      THEN _pfx END), 0) AS _pk
       |  FROM _rk)
       |SELECT grp AS $groupCol, avail AS avail_tokens,
       |  _rn <= _k AS funded,
       |  CASE WHEN _rn <= _k THEN round(CAST(avail AS DOUBLE), 6)
       |    ELSE round(CAST(_b - _pk AS DOUBLE) / CAST(_n - _k AS DOUBLE), 6)
       |  END AS allocated_tokens
       |FROM _rk CROSS JOIN _k
       |ORDER BY $groupCol NULLS FIRST""".stripMargin
  }
}
