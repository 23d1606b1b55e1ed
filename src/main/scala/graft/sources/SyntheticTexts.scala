package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Deterministic synthetic TEXT fixture for the compression-ratio
  * oracle (the [[SyntheticImages]] idea applied to text: a fully
  * integer/ASCII-specified generator that an independent Python twin —
  * tools/gen_compression_oracle.py — reproduces BYTE-identically, so
  * the zlib output length can be derived without running any Scala).
  *
  * Spec (doc_id in 0..59), kind = doc_id % 5:
  *  - vocabulary: the fixed 64-word ASCII list below; LCG state
  *    s0 = (doc_id * 2654435761) & 0xFFFFFFFF, draw:
  *    s = (1103515245*s + 12345) & 0x7FFFFFFF (the SyntheticImages LCG).
  *  - kind 0 (prose): n = 40 + (doc_id % 7) * 25 words, space-joined,
  *    '.' appended to every 13th word (i % 13 == 12). Mid ratio.
  *  - kind 1 (templated boilerplate): the HTML row literal below with
  *    the doc_id spliced, repeated 20 + doc_id % 9 times. Low ratio.
  *  - kind 2 (high entropy): 200 + (doc_id % 11) * 37 chars drawn from
  *    the base64 alphabet via the LCG. Ratio near/above 1.
  *  - kind 3 (run repetition): "ha" * (30 + doc_id % 5) + " " + 8 words.
  *  - kind 4 (degenerate shorts): 4 -> "", 9 -> "x",
  *    else "short doc <doc_id>".
  *  - unicode overrides (multi-byte UTF-8 coverage; built from \u
  *    escapes so both sources are pure ASCII): doc_id 24 and 49.
  */
object SyntheticTexts {

  val N = 60

  private val Words: Array[String] = Array(
    "the", "quick", "brown", "fox", "jumps", "over", "lazy", "dog",
    "data", "pipeline", "filter", "quality", "corpus", "token", "model", "train",
    "large", "scale", "spark", "shuffle", "partition", "join", "hash", "text",
    "document", "sample", "weight", "score", "clean", "dedup", "batch", "stream",
    "and", "with", "from", "into", "while", "where", "when", "then",
    "alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta",
    "one", "two", "three", "four", "five", "six", "seven", "eight",
    "red", "green", "blue", "cyan", "magenta", "yellow", "black", "white")

  private val B64 =
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789+/"

  private val Unicode24 =
    "caf\u00e9 r\u00e9sum\u00e9 na\u00efve \u65e5\u672c\u8a9e\u30c6\u30ad\u30b9\u30c8 \u043a\u0438\u0440\u0438\u043b\u043b\u0438\u0446\u0430 stra\u00dfe \u2014 f\u00fcr \u00fcber"
  private val Unicode49 =
    ("\u65e5\u672c\u8a9e " * 12) + "\u00e9\u00e9\u00e9\u00e9 end"

  def text(docId: Long): String = {
    if (docId == 24L) return Unicode24
    if (docId == 49L) return Unicode49
    var s = (docId * 2654435761L) & 0xFFFFFFFFL
    def draw(): Int = {
      s = (1103515245L * s + 12345L) & 0x7FFFFFFFL
      (s % 64).toInt
    }
    (docId % 5).toInt match {
      case 0 =>
        val n = (40 + (docId % 7) * 25).toInt
        val sb = new java.lang.StringBuilder
        var i = 0
        while (i < n) {
          if (i > 0) sb.append(' ')
          sb.append(Words(draw()))
          if (i % 13 == 12) sb.append('.')
          i += 1
        }
        sb.toString
      case 1 =>
        val unit = s"<tr><td>row $docId</td><td>value</td></tr>\n"
        unit * (20 + (docId % 9)).toInt
      case 2 =>
        // draw from the HIGH bits: an LCG's low 6 bits have period <= 64
        // (the classic low-bit weakness), which would make "high entropy"
        // text periodic and compressible
        val n = (200 + (docId % 11) * 37).toInt
        val sb = new java.lang.StringBuilder(n)
        var i = 0
        while (i < n) {
          s = (1103515245L * s + 12345L) & 0x7FFFFFFFL
          sb.append(B64.charAt(((s >> 10) % 64).toInt))
          i += 1
        }
        sb.toString
      case 3 =>
        val sb = new java.lang.StringBuilder
        sb.append("ha" * (30 + (docId % 5)).toInt).append(' ')
        var i = 0
        while (i < 8) {
          if (i > 0) sb.append(' ')
          sb.append(Words(draw()))
          i += 1
        }
        sb.toString
      case _ =>
        if (docId == 4L) "" else if (docId == 9L) "x" else s"short doc $docId"
    }
  }

  /** (doc_id, text) over the full fixture — partition-count pinned so
    * per-row kernels are exercised across tasks.
    */
  def df(spark: SparkSession): DataFrame = {
    import spark.implicits._
    spark.createDataset((0L until N.toLong).map(i => (i, text(i))))
      .toDF("doc_id", "text")
      .repartition(4)
  }
}
