package graft.operators.text

import graft.functions.TextFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Unigram-LM tokenizer induction (Kudo 2018, the SentencePiece
  * unigram algorithm) — the other major subword trainer next to
  * [[BpeVocabInduction]]: start from a large seed vocabulary of
  * frequent substrings, alternate EM (E: Viterbi-segment every word
  * under current piece log-probs; M: piece usage counts → new probs),
  * and prune the least-used pieces until `vocabSize` remain. Single
  * characters are never pruned (coverage guarantee: every word stays
  * segmentable).
  *
  * Same production shape as the BPE trainer: the DISTRIBUTED work is
  * the word-frequency table and the seed-substring counting (two-level
  * exact aggregations — shuffle bounded by distinct words/pieces, not
  * corpus tokens; the `unigram_seed_counts` gate hash-matches the
  * substring counting against DuckDB); the EM loop then runs
  * driver-side over the frequency-capped word table, which is how
  * SentencePiece itself trains (from word counts, not raw text).
  * Pruning uses the usage-count criterion (the loss-delta criterion's
  * cheap monotone proxy); ties everywhere break lexicographically so
  * the learned vocab is partition- and run-invariant.
  */
final class UnigramLmInduction(
    textCol: String = "text",
    seedMaxLen: Int = 4,
    seedSize: Int = 2000,
    vocabSize: Int = 60,
    emIters: Int = 3,
    maxVocabWords: Int = 100000,
    minWordFreq: Long = 1L) {

  require(seedMaxLen >= 2 && seedSize >= 1 && vocabSize >= 1 && emIters >= 1)

  /** Distributed word-frequency table, capped for the driver loop. */
  def wordFrequencies(df: DataFrame): DataFrame =
    df.select(explode(TextFunctions.tokensOf(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .filter(col("freq") >= minWordFreq)
      .orderBy(col("freq").desc, col("w"))
      .limit(maxVocabWords)

  /** Distributed seed-substring counts: every substring of length
    * 1..seedMaxLen of every distinct word, weighted by word frequency
    * (all occurrence positions count). Exact BIGINTs; the gate surface.
    */
  def seedCounts(df: DataFrame, topK: Int): DataFrame = {
    val words = wordFrequencies(df)
    words
      .withColumn("_i", explode(sequence(lit(1), length(col("w")))))
      .withColumn("_l", explode(sequence(lit(1), lit(seedMaxLen))))
      .filter(col("_i") + col("_l") - 1 <= length(col("w")))
      .select(expr("substring(w, _i, _l)").as("piece"), col("freq"))
      .groupBy(col("piece")).agg(sum(col("freq")).as("piece_count"))
      .orderBy(col("piece_count").desc, col("piece"))
      .limit(topK)
  }

  /** DuckDB twin of [[seedCounts]] (same cap, same weighting). */
  def seedCountsSql(table: String, topK: Int): String =
    s"""WITH wf AS (SELECT w, count(*) AS freq FROM
       |    (SELECT unnest(${TextFunctions.tokensOfSql(textCol)}) AS w FROM $table)
       |  GROUP BY 1 HAVING count(*) >= $minWordFreq
       |  ORDER BY freq DESC, w LIMIT $maxVocabWords),
       |sub AS (SELECT unnest(flatten(list_transform(range(1, len(w) + 1),
       |      i -> list_transform(range(1, least($seedMaxLen, len(w) - i + 1) + 1),
       |        l -> substring(w, CAST(i AS INT), CAST(l AS INT)))))) AS piece, freq
       |  FROM wf)
       |SELECT piece, CAST(sum(freq) AS BIGINT) AS piece_count FROM sub
       |GROUP BY piece ORDER BY piece_count DESC, piece LIMIT $topK""".stripMargin

  /** Viterbi segmentation of `word` under piece log-probs: maximizes
    * Σ log p(piece); ties prefer the segmentation whose LAST piece is
    * longer (then recursively — deterministic because the piece loop
    * scans lengths ascending and strictly-greater updates let the
    * longest tying piece win).
    */
  def segment(word: String, logp: Map[String, Double]): Seq[String] = {
    val n = word.length
    if (n == 0) return Seq.empty
    val best = Array.fill(n + 1)(Double.NegativeInfinity)
    val back = Array.fill(n + 1)(-1)
    best(0) = 0.0
    var i = 1
    while (i <= n) {
      var l = 1
      while (l <= math.min(i, seedMaxLen)) {
        val piece = word.substring(i - l, i)
        logp.get(piece) match {
          case Some(p) if best(i - l) + p >= best(i) && best(i - l) > Double.NegativeInfinity =>
            // >= with ascending l: the longest tying piece wins
            best(i) = best(i - l) + p
            back(i) = l
          case _ =>
        }
        l += 1
      }
      i += 1
    }
    if (back(n) < 0) return word.map(_.toString) // unreachable with char coverage
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var pos = n
    while (pos > 0) { out += word.substring(pos - back(pos), pos); pos -= back(pos) }
    out.reverse.toSeq
  }

  /** Train: `(piece, log-prob)` vocabulary of exactly `vocabSize`
    * pieces (or fewer if the corpus is tiny), single chars always kept.
    */
  def train(df: DataFrame): Seq[(String, Double)] = {
    val words: Array[(String, Long)] = wordFrequencies(df).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val chars: Set[String] = words.flatMap(_._1.map(_.toString)).toSet
    // seed: top substrings by count (driver replay of seedCounts'
    // arithmetic over the same capped word table) + full char coverage
    val seedMap = scala.collection.mutable.HashMap.empty[String, Long]
    words.foreach { case (w, f) =>
      for (i <- 0 until w.length; l <- 1 to math.min(seedMaxLen, w.length - i)) {
        val p = w.substring(i, i + l)
        seedMap.update(p, seedMap.getOrElse(p, 0L) + f)
      }
    }
    var counts: Map[String, Long] = {
      val top = seedMap.toSeq.sortBy { case (p, c) => (-c, p) }.take(seedSize).toMap
      top ++ chars.map(c => c -> seedMap.getOrElse(c, 1L))
    }
    var iter = 0
    while (iter < emIters) {
      val total = counts.values.sum.toDouble
      val logp = counts.map { case (p, c) => p -> math.log(c / total) }
      // E-step: usage counts under Viterbi segmentation
      val usage = scala.collection.mutable.HashMap.empty[String, Long]
      words.foreach { case (w, f) =>
        segment(w, logp).foreach(p => usage.update(p, usage.getOrElse(p, 0L) + f))
      }
      // M+prune: keep the `vocabSize` most-used pieces (ties lexicographic),
      // chars unconditionally (smoothed to 1 when unused)
      val multi = usage.toSeq.filter(_._1.length > 1)
        .sortBy { case (p, c) => (-c, p) }
        .take(math.max(0, vocabSize - chars.size))
      counts = (multi ++ chars.map(c => c -> math.max(1L, usage.getOrElse(c, 0L)))).toMap
      iter += 1
    }
    val total = counts.values.sum.toDouble
    counts.toSeq.sortBy { case (p, c) => (-c, p) }
      .map { case (p, c) => p -> math.log(c / total) }
  }

  /** Tokenize one word with a trained vocab. */
  def encode(word: String, vocab: Seq[(String, Double)]): Seq[String] =
    segment(word, vocab.toMap)
}
