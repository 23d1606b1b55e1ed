package graft.operators.text

import graft.functions.TextFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** BPE pair statistics — round 1 of byte-pair-encoding vocabulary
  * induction: every word becomes its character symbols plus an
  * end-of-word marker, and adjacent symbol pairs are counted weighted
  * by corpus word frequency. The most frequent pair is the first BPE
  * merge; the full iterative trainer is [[BpeVocabInduction]].
  *
  * Scale shape: word frequencies via the two-level aggregation
  * (map-side combine bounds shuffle volume by distinct words, not
  * corpus tokens); pair generation then runs over the DISTINCT-word
  * table — orders of magnitude smaller than the corpus — so the
  * per-character explode never touches full-corpus row counts.
  */
final class BpePairCounts(
    textCol: String = "text",
    topK: Int = 20) {

  require(topK >= 1, s"topK must be >= 1, got $topK")

  /** `(pair, pair_count)` — "a b" symbol pairs, top-K by weighted
    * count (pair string as deterministic tiebreak).
    */
  def pairCounts(df: DataFrame): DataFrame = {
    val words = df
      .select(explode(TextFunctions.tokensOf(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("freq"))
    val syms = concat(split(col("w"), ""), array(lit("</w>")))
    words
      .withColumn("pair", explode(transform(sequence(lit(0), size(syms) - 2),
        i => concat(element_at(syms, i + 1), lit(" "), element_at(syms, i + 2)))))
      .groupBy("pair").agg(sum("freq").as("pair_count"))
      .orderBy(col("pair_count").desc, col("pair"))
      .limit(topK)
  }

  /** DuckDB twin over `table` (same symbolization and weighting). */
  def sql(table: String): String =
    s"""WITH wf AS (SELECT w, count(*) AS freq FROM
       |    (SELECT unnest(${TextFunctions.tokensOfSql(textCol)}) AS w FROM $table) GROUP BY 1),
       |sy AS (SELECT freq, list_append(string_split(w, ''), '</w>') AS syms FROM wf),
       |pr AS (SELECT freq, unnest(list_transform(range(1, len(syms)),
       |         i -> syms[i] || ' ' || syms[i + 1])) AS pair FROM sy)
       |SELECT pair, CAST(sum(freq) AS BIGINT) AS pair_count FROM pr
       |GROUP BY 1 ORDER BY pair_count DESC, pair LIMIT $topK""".stripMargin
}

/** Iterative BPE vocabulary induction (Sennrich et al. 2016): start
  * from characters, repeatedly merge the most frequent adjacent symbol
  * pair (count desc, pair asc as the deterministic tiebreak), stop
  * after `numMerges` merges or when no pair repeats.
  *
  * Scale split, the same pattern as the reference's offline k-means
  * trainer: the CORPUS pass — word frequency counting — is fully
  * distributed (two-level aggregation, shuffle bounded by distinct
  * words); the merge loop then runs driver-side over the frequency-
  * capped vocabulary (`maxVocabWords` most frequent words, `minWordFreq`
  * floor) — exactly how production tokenizer trainers work (they train
  * from a word-count table, not from raw text), so the driver holds at
  * most `maxVocabWords` short arrays regardless of corpus size.
  */
final class BpeVocabInduction(
    textCol: String = "text",
    numMerges: Int = 50,
    maxVocabWords: Int = 100000,
    minWordFreq: Long = 1L) {

  require(numMerges >= 1 && maxVocabWords >= 1 && minWordFreq >= 1)

  /** Distributed word-frequency table, capped for the driver loop. */
  def wordFrequencies(df: DataFrame): DataFrame =
    df.select(explode(TextFunctions.tokensOf(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .filter(col("freq") >= minWordFreq)
      .orderBy(col("freq").desc, col("w"))
      .limit(maxVocabWords)

  /** The ordered merge list learned from the corpus. */
  def train(df: DataFrame): Seq[(String, String)] = {
    import scala.collection.mutable
    var words: Array[(Array[String], Long)] = wordFrequencies(df)
      .collect()
      .map(r => (r.getString(0).split("").filter(_.nonEmpty) :+ "</w>", r.getLong(1)))
    val merges = mutable.ArrayBuffer.empty[(String, String)]
    var done = false
    while (!done && merges.length < numMerges) {
      val counts = mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (syms, f) =>
        var i = 0
        while (i < syms.length - 1) {
          val k = (syms(i), syms(i + 1))
          counts.update(k, counts.getOrElse(k, 0L) + f)
          i += 1
        }
      }
      val best = counts.toSeq
        .sortBy { case ((a, b), c) => (-c, a, b) }.headOption
      best match {
        case Some((pair, c)) if c >= 2 =>
          merges += pair
          words = words.map { case (syms, f) => (mergePair(syms, pair), f) }
        case _ => done = true
      }
    }
    merges.toSeq
  }

  /** Apply one merge left-to-right (the BPE application order). */
  private def mergePair(syms: Array[String], pair: (String, String)): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i < syms.length - 1 && syms(i) == pair._1 && syms(i + 1) == pair._2) {
        out += syms(i) + syms(i + 1)
        i += 2
      } else {
        out += syms(i)
        i += 1
      }
    }
    out.toArray
  }

  /** Tokenize one word with a learned merge list (merges applied in
    * learned order — the standard BPE encode).
    */
  def encode(word: String, merges: Seq[(String, String)]): Seq[String] = {
    var syms: Array[String] = word.split("").filter(_.nonEmpty) :+ "</w>"
    merges.foreach(m => syms = mergePair(syms, m))
    syms.toSeq
  }

  /** DuckDB twin of [[train]]: a WITH-clause fragment (no `WITH`
    * keyword) that re-derives the SAME ordered merge list from the
    * same table — so an oracle can replay a gate whose Spark side
    * trains at runtime, at ANY scale, without baking data-derived
    * merges as literals. The final CTE `_bpem` is ONE row with columns
    * `p0,r0 .. p{numMerges-1},r{numMerges-1}`: the wrapped
    * pattern/replacement for each merge step, with steps past the
    * "best pair count < 2" stop degraded to a `chr(3)` no-op pattern
    * (chr(3) never occurs in a wrapped symbol string, so the replace
    * chain applies exactly the merges [[train]] would return).
    *
    * Step semantics mirror [[train]] exactly: pair counts are
    * per-position (overlaps counted) weighted by word frequency over
    * the SAME capped word table (`freq DESC, w ASC` total order, so
    * the cap is deterministic on both engines), the argmax tiebreak is
    * `(count DESC, a ASC, b ASC)`, and each apply is one non-
    * overlapping left-to-right `replace`. Orderings agree between
    * Java and DuckDB for ASCII; non-ASCII ties beyond the BMP could
    * diverge (UTF-16 vs codepoint order) — the same caveat the whole
    * BpeEncode family documents.
    *
    * Each step's CTEs are `MATERIALIZED`: the chain references each
    * stage twice (pair count + next apply), and un-materialized CTE
    * inlining would blow up exponentially in `numMerges`.
    */
  def trainSqlCtes(table: String): String = {
    val toks = TextFunctions.tokensOfSql(textCol)
    val step = (0 until numMerges).map { i =>
      // the LAST step's apply output would be dead (consumers read only
      // the _bpm merge rows plus the _bpw stages that feed later pair
      // counts), so _bpw{i+1} is emitted only for non-final steps
      val apply =
        if (i == numMerges - 1) ""
        else
          s""",
             |_bpw${i + 1} AS MATERIALIZED (SELECT freq,
             |    replace(repr, coalesce((SELECT pat FROM _bpm$i), chr(3)),
             |      coalesce((SELECT rep FROM _bpm$i), chr(3))) AS repr FROM _bpw$i)""".stripMargin
      s"""_bps$i AS (SELECT freq, list_transform(string_split(repr, chr(2) || chr(1)),
         |    s -> replace(replace(s, chr(1), ''), chr(2), '')) AS syms FROM _bpw$i),
         |_bpp$i AS (SELECT pr[1] AS a, pr[2] AS b, freq FROM (
         |  SELECT freq, unnest(list_transform(range(1, len(syms)),
         |      j -> [syms[j], syms[j + 1]])) AS pr FROM _bps$i)),
         |_bpm$i AS MATERIALIZED (
         |  SELECT chr(1) || a || chr(2) || chr(1) || b || chr(2) AS pat,
         |         chr(1) || a || b || chr(2) AS rep
         |  FROM _bpp$i GROUP BY a, b HAVING CAST(sum(freq) AS BIGINT) >= 2
         |  ORDER BY sum(freq) DESC, a, b LIMIT 1)$apply""".stripMargin
    }.mkString(",\n")
    val mergeCols = (0 until numMerges).map(i =>
      s"coalesce((SELECT pat FROM _bpm$i), chr(3)) AS p$i, " +
        s"coalesce((SELECT rep FROM _bpm$i), chr(3)) AS r$i").mkString(",\n    ")
    s"""_bpw0 AS MATERIALIZED (
       |  SELECT freq, array_to_string(list_transform(string_split(w, ''),
       |      c -> chr(1) || c || chr(2)), '') || chr(1) || '</w>' || chr(2) AS repr
       |  FROM (SELECT w, count(*) AS freq FROM
       |      (SELECT unnest($toks) AS w FROM $table) GROUP BY w
       |    HAVING count(*) >= $minWordFreq
       |    ORDER BY freq DESC, w LIMIT $maxVocabWords)),
       |$step,
       |_bpem AS MATERIALIZED (SELECT
       |    $mergeCols)""".stripMargin
  }

  /** Per-document BPE token count under the `trainSqlCtes`-derived
    * vocab — the encode expression for a query that `CROSS JOIN
    * _bpem`s the merge row in scope (lambdas capture the `p_i`/`r_i`
    * columns; a scalar subquery can't appear inside a DuckDB lambda).
    * Same delimited-symbol replace chain as
    * [[BpeEncode.tokenCountSql]], with derived columns instead of
    * literal merges.
    */
  def tokenCountSqlDerived(expr: String): String = {
    val base = "array_to_string(list_transform(string_split(w, ''), " +
      "c -> chr(1) || c || chr(2)), '') || chr(1) || '</w>' || chr(2)"
    val merged = (0 until numMerges).foldLeft(base) { case (s, i) =>
      s"replace($s, p$i, r$i)"
    }
    val perWord = s"list_transform(${TextFunctions.tokensOfSql(expr)}, " +
      s"w -> CAST(length($merged) - length(replace($merged, chr(1), '')) AS BIGINT))"
    s"CAST(coalesce(list_aggregate($perWord, 'sum'), 0) AS BIGINT)"
  }
}

/** Distributed BPE ENCODE with a fixed learned merge list — the apply
  * side of [[BpeVocabInduction]] (train once, encode the corpus): the
  * per-document token count a budgeted sampler or packer actually
  * consumes. Implemented ENTIRELY with builtin string expressions
  * (whole-stage codegen, no UDF): each word becomes a control-char-
  * delimited symbol string, each merge is one `replace` — Java and
  * DuckDB `replace` share the exact non-overlapping left-to-right scan
  * (both resume AFTER the replacement, so `aaaa` under merge (a,a)
  * gives `[aa, aa]` in both) — and the final token count is the
  * surviving open-delimiter count. The delimiters (U+0001/U+0002)
  * cannot appear in whitespace-normalized fixture text; the JVM
  * reference semantics live in [[BpeVocabInduction.encode]]
  * (spec-pinned equal).
  *
  * Scale shape: stateless per-row map, the merge list is a plan-time
  * literal (the tokenizer vocab IS a constant at encode time) — no
  * broadcast, no shuffle, scan speed.
  */
object BpeEncode {
  private val O = "\u0001"
  private val C = "\u0002"

  private def wrap(sym: String): String = O + sym + C

  /** Per-document total encoded-token count over all words — the
    * memoized JVM kernel ([[graft.plans.kernels.BpeTokenCount]]);
    * bit-parity with [[tokenCountDeclarative]] is spec-pinned.
    */
  def tokenCount(text: org.apache.spark.sql.Column,
      merges: Seq[(String, String)]): org.apache.spark.sql.Column =
    graft.plans.kernels.bpe_token_count(text, merges)

  /** The pure-builtin form the kernel replaced (delimited symbol string,
    * one `replace` per merge) — kept as the semantics REFERENCE: it is
    * the exact Spark-side mirror of [[tokenCountSql]], so kernel ==
    * declarative == DuckDB is a two-hop equality chain.
    */
  def tokenCountDeclarative(text: org.apache.spark.sql.Column,
      merges: Seq[(String, String)]): org.apache.spark.sql.Column = {
    val words = TextFunctions.tokensOf(text)
    val perWord = transform(words, w => {
      val chars = filter(split(w, ""), c => c =!= "")
      val base = concat(
        concat_ws("", transform(chars, ch => concat(lit(O), ch, lit(C)))),
        lit(wrap("</w>")))
      val merged = merges.foldLeft(base) { case (s, (a, b)) =>
        call_function("replace", s, lit(wrap(a) + wrap(b)), lit(wrap(a + b)))
      }
      (length(merged) -
        length(call_function("replace", merged, lit(O), lit("")))).cast("long")
    })
    aggregate(perWord, lit(0L), (acc, x) => acc + x)
  }

  /** DuckDB twin of [[tokenCount]] over `expr` (a text column). */
  def tokenCountSql(expr: String, merges: Seq[(String, String)]): String = {
    def wrapSql(sym: String) = s"chr(1) || '$sym' || chr(2)"
    val base = s"array_to_string(list_transform(string_split(w, ''), " +
      s"c -> chr(1) || c || chr(2)), '') || ${wrapSql("</w>")}"
    val merged = merges.foldLeft(base) { case (s, (a, b)) =>
      s"replace($s, ${wrapSql(a)} || ${wrapSql(b)}, ${wrapSql(a + b)})"
    }
    val perWord = s"list_transform(${TextFunctions.tokensOfSql(expr)}, " +
      s"w -> CAST(length($merged) - length(replace($merged, chr(1), '')) AS BIGINT))"
    s"CAST(coalesce(list_aggregate($perWord, 'sum'), 0) AS BIGINT)"
  }
}
