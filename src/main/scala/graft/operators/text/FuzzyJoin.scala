package graft.operators.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Entity-resolution fuzzy join: match rows of two tables whose
  * strings are within `maxDistance` edits — record linkage across
  * catalogs/crawls where ids don't line up. Vanilla Spark offers only
  * `levenshtein()` in an all-pairs cross join: O(|L|·|R|) distance
  * computations.
  *
  * Banded shape: candidates are pairs sharing at least one length-`q`
  * character gram after the HOT grams are dropped — grams occurring in
  * more than `maxGramKeys` keys (the "Customer#0000…" shared-prefix
  * failure mode) carry no discriminating signal and would square the
  * candidate count, so both sides anti-join a (small, broadcast) hot
  * list; the [[graft.operators.dedup.NgramJaccardDedup]] idiom.
  * Survivor pairs get one threshold-bounded `levenshtein` verify
  * (banded O(n·maxDistance) DP). Q-gram recall bound: ≤
  * `maxDistance`·q grams are destroyed by that many edits, so
  * strings with more than `maxDistance·q + q − 1` chars of rare grams
  * always reach the verify; dropping hot grams trades recall on
  * non-discriminative content for the quadratic blowup — documented,
  * and the oracle mirrors the exact same semantics.
  *
  * Measured prune anatomy (r13, sf0.1 name-linkage gate, 15k×15k,
  * 724k candidates): the length prune below is provably output-
  * identical and free (rides the existing gram join), but on
  * name-shaped data it bites only across length classes; the textbook
  * COMMON-GRAM COUNT filter is deliberately NOT applied — with the
  * hot-gram cap active the per-key rare-gram count is ~1.65 ≪
  * `maxDistance·q`, so its provably-safe threshold degenerates to 1
  * (a no-op) while costing two extra aggregations. The verify itself
  * is ~0.3% of the gate's wall time (measured 4.42 s → 4.43 s with
  * the verify stage added); the remaining cost is the gram-stage
  * exchanges, which AQE stage reuse already deduplicates.
  *
  * ==Precondition: join keys are UNIQUE per side==
  * `leftKeyCol` / `rightKeyCol` must be unique within their table (the
  * entity-resolution contract: one string per key). The gram stage
  * dedups grams PER ROW (the fused kernel emits each row's distinct
  * gram hashes); with duplicate keys the hot-gram frequency count `_f`
  * counts per duplicate row, shifting the `maxGramKeys` cap and the
  * candidate set — and the DuckDB twin (which dedups on
  * (key, str, gram)) diverges silently. This was always assumed (the
  * pre-r19 Spark path deduped on (key, len, gram) and already
  * disagreed with the twin under dup keys); it is now the documented
  * constructor contract: callers with non-unique keys must
  * `dropDuplicates(keyCol)` first (ADVICE r19).
  */
final class FuzzyJoin(
    leftKeyCol: String, leftStrCol: String,
    rightKeyCol: String, rightStrCol: String,
    maxDistance: Int = 2,
    q: Int = 3,
    maxGramKeys: Int = 200,
    hashName: String = "xxhash64") {

  require(maxDistance >= 0 && q >= 2 && maxGramKeys >= 1)
  // grams must ride as LONGS (the DupNgram/NgramLm hash-parameter
  // convention: xxhash64 is the codegen'd production default, portable
  // the oracle-portable family)
  require(hashName == "xxhash64" || hashName == "portable",
    s"fuzzy join keys grams on a LONG hash; got '$hashName'")

  // bare (key, gram-HASH) rows — the string is functionally dependent
  // on the key, so it never rides past this projection, and the gram
  // itself rides as a fixed-width long (8 B vs a UTF8String): every
  // groupBy / join downstream keys on longs. Collision semantics: a
  // collision merges
  // two grams' posting lists, which ADDS candidates (filtered by the
  // exact levenshtein verify) — except that a merged list can cross
  // `maxGramKeys` and be dropped as hot, losing any pair whose only
  // shared gram it was. At 60–64 hash bits that event has negligible
  // probability (~|grams|²/2⁶⁰ per corpus), and the oracle stays exact
  // because the DuckDB twin hashes with the identical portable family,
  // so both engines see the same merged lists either way.
  // One (key, gram) row even when a gram repeats in-string: the fused
  // CharGramHashes kernel emits each row's DISTINCT gram hashes, so the
  // former post-explode `.distinct()` EXCHANGE is gone — in-row dedup is
  // global dedup because the key is unique per row (the entity-join
  // contract both engines already relied on: with duplicate keys the
  // DuckDB twin dedupes on (key, str, gram) while the old Spark path
  // deduped on (key, len, gram), so uniqueness was always assumed).
  // r19 plan diff: the staged gram table materializes as
  // scan → project → generate, no shuffle.
  private def grams(df: DataFrame, keyCol: String, strCol: String): DataFrame =
    df.where(length(col(strCol)) >= q)
      .select(col(keyCol), length(col(strCol)).as("_len"),
        explode(graft.plans.kernels.chargram_hashes(
          col(strCol), q, hashName == "portable")).as("_g"))

  /** Verified pairs `(leftKey, rightKey, dist)`. */
  def pairs(left: DataFrame, right: DataFrame): DataFrame = {
    // each gram table feeds TWO consumers (the hot-gram frequency count
    // and the candidate join) whose exchange subtrees differ (freq
    // projects _g only; cand keys the join on _g with key+len riding),
    // so AQE exchange reuse does NOT deduplicate them — unstaged, the
    // explode+hash+distinct ran twice per side (r19 measured: staging
    // cut the gate 3.7 -> 2.9 s). Rows are (key, len, gram-hash) longs:
    // a few MB per million keys, trivially cacheable at any scale.
    val lg = graft.core.Staging.stage(grams(left, leftKeyCol, leftStrCol))
    val rg = graft.core.Staging.stage(grams(right, rightKeyCol, rightStrCol))
    val freq = lg.select(col("_g")).unionByName(rg.select(col("_g")))
      .groupBy(col("_g")).agg(count(lit(1)).as("_f"))
    val hot = freq.where(col("_f") > maxGramKeys).select(col("_g"))
    // candidate dedup on BARE KEYS: a pair sharing g grams would ride
    // the distinct exchange g times — dropping the strings before it
    // cuts the exchange to two longs per row; names re-attach after
    // via two key joins against the (narrow) input projections. The
    // string LENGTH (one int, functionally dependent on the key) rides
    // along so the length prune `|len(l) − len(r)| ≤ maxDistance` — a
    // necessary condition for edit distance ≤ maxDistance, so provably
    // output-identical — kills impossible pairs BEFORE they fatten the
    // candidate distinct and the levenshtein verify fan-in.
    val cand = lg.join(broadcast(hot), Seq("_g"), "left_anti")
      .select(col(leftKeyCol), col("_len").as("_ll"), col("_g"))
      .join(rg.join(broadcast(hot), Seq("_g"), "left_anti")
        .select(col(rightKeyCol), col("_len").as("_rl"), col("_g")), Seq("_g"))
      .where(abs(col("_ll") - col("_rl")) <= maxDistance)
      .select(col(leftKeyCol), col(rightKeyCol))
      .distinct()
    // threshold-bounded levenshtein: the banded O(n·maxDistance) DP
    // (returns -1 past the bound) instead of the full O(n²) table —
    // the verify is the gate's dominant compute and the bound is
    // exactly the predicate anyway, so output is identical (the
    // DuckDB twin keeps the full-DP form; values agree on survivors)
    cand
      .join(left.select(col(leftKeyCol), col(leftStrCol)), Seq(leftKeyCol))
      .join(right.select(col(rightKeyCol), col(rightStrCol)), Seq(rightKeyCol))
      .withColumn("dist",
        levenshtein(col(leftStrCol), col(rightStrCol), maxDistance).cast("long"))
      .where(col("dist") >= 0L && col("dist") <= maxDistance)
      .select(col(leftKeyCol), col(rightKeyCol), col("dist"))
  }

  /** DuckDB twin of [[pairs]] as a CTE chain whose last member,
    * `_fjout`, holds `(leftKey, rightKey, dist)` — use as
    * `WITH ${pairsSql(...)} SELECT … FROM _fjout`. Same gram window,
    * same hot-gram cap, same verify. `maxLen` bounds the unnested gram
    * positions (any value ≥ the longest string is exact).
    */
  def pairsSql(leftSql: String, rightSql: String, maxLen: Int = 512): String = {
    require(hashName == "portable", "oracle covers the portable hash family")
    s"""_fjl AS (SELECT $leftKeyCol, $leftStrCol FROM ($leftSql)),
       |_fjr AS (SELECT $rightKeyCol, $rightStrCol FROM ($rightSql)),
       |_fjlg AS (SELECT DISTINCT $leftKeyCol, $leftStrCol,
       |    ${graft.functions.HashFunctions.portableHash64Sql(s"substring($leftStrCol, g, $q)")} AS _g
       |  FROM _fjl, (SELECT unnest(range(1, $maxLen)) AS g) gs
       |  WHERE length($leftStrCol) >= $q AND g <= length($leftStrCol) - ${q - 1}),
       |_fjrg AS (SELECT DISTINCT $rightKeyCol, $rightStrCol,
       |    ${graft.functions.HashFunctions.portableHash64Sql(s"substring($rightStrCol, g, $q)")} AS _g
       |  FROM _fjr, (SELECT unnest(range(1, $maxLen)) AS g) gs
       |  WHERE length($rightStrCol) >= $q AND g <= length($rightStrCol) - ${q - 1}),
       |_fjf AS (SELECT _g, count(*) AS _f FROM (
       |    SELECT _g FROM _fjlg UNION ALL SELECT _g FROM _fjrg) GROUP BY 1),
       |_fjhot AS (SELECT _g FROM _fjf WHERE _f > $maxGramKeys),
       |_fjc AS (SELECT DISTINCT l.$leftKeyCol, l.$leftStrCol, r.$rightKeyCol, r.$rightStrCol
       |  FROM _fjlg l JOIN _fjrg r USING (_g)
       |  WHERE l._g NOT IN (SELECT _g FROM _fjhot)
       |    AND abs(length(l.$leftStrCol) - length(r.$rightStrCol)) <= $maxDistance),
       |_fjp AS (SELECT $leftKeyCol, $rightKeyCol,
       |    levenshtein($leftStrCol, $rightStrCol) AS dist
       |  FROM _fjc),
       |_fjout AS (SELECT $leftKeyCol, $rightKeyCol, CAST(dist AS BIGINT) AS dist
       |  FROM _fjp WHERE dist <= $maxDistance)""".stripMargin
  }
}
