package graft

import graft.operators.text.{TextAnalysis, TextAnalysisRefiner}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants of the text-analysis family (the oracle gate
  * covers cross-engine equality; these pin the intended behavior).
  */
class TextAnalysisSpec extends AnyFunSuite {
  import TestSpark._

  private def one(text: String): org.apache.spark.sql.Row =
    new TextAnalysisRefiner("text")(
      spark.createDataFrame(Seq((1L, text))).toDF("doc_id", "text"))
      .select(col("lang_id"), col("quality_score"), col("bpe_token_count"),
        col("doc_fingerprint")).head()

  test("fingerprint is whitespace/case-normalization invariant") {
    assert(one("The  Quick\tBrown").getLong(3) == one("the quick brown").getLong(3))
    assert(one("the quick brown").getLong(3) != one("the quick browns").getLong(3))
  }

  test("bpe token count: runs split into max-6 pieces, punctuation counts singly") {
    // "hello world!" -> ceil(5/6) + ceil(5/6) + 1
    assert(one("hello world!").getLong(2) == 3L)
    // 13-letter run -> ceil(13/6) = 3 pieces
    assert(one("extraordinary").getLong(2) == 3L)
    assert(one("").getLong(2) == 0L)
  }

  test("language id picks the profile with most function-word hits") {
    assert(one("the cat sat on the mat and it is that").getString(0) == "en")
    assert(one("der hund ist nicht mit der katze und das").getString(0) == "de")
    assert(one("xyzzy qwerty plugh").getString(0) == "und")
  }

  test("quality: empty text scores 0; english prose scores high") {
    assert(one("").getDouble(1) == 0.0)
    val prose = one("The quick brown fox jumps over the lazy dog and it is fine.").getDouble(1)
    assert(prose > 0.8, s"prose=$prose")
  }

  test("fingerprint stays in [0, 2^31) and token counts are non-negative on random input") {
    val gen = org.scalacheck.Gen.listOfN(200,
      org.scalacheck.Gen.listOf(org.scalacheck.Gen.oneOf(
        org.scalacheck.Gen.alphaNumStr, org.scalacheck.Gen.const(" "),
        org.scalacheck.Gen.const("\t"), org.scalacheck.Gen.const("!?.,"),
        org.scalacheck.Gen.const("Ünïcode"))).map(_.mkString))
    val samples = gen.sample.get
    val df = spark.createDataFrame(samples.zipWithIndex.map { case (t, i) => (i.toLong, t) })
      .toDF("doc_id", "text")
    val rows = new TextAnalysisRefiner("text")(df)
      .select(col("doc_fingerprint"), col("bpe_token_count")).collect()
    rows.foreach { r =>
      val fp = r.getLong(0)
      assert(fp >= 0L && fp < 2147483647L, s"fingerprint out of field: $fp")
      assert(r.getLong(1) >= 0L)
    }
  }

  test("refiner drops its staging columns") {
    val out = new TextAnalysisRefiner("text")(table("documents"))
    assert(!out.columns.exists(_.startsWith("_")))
    assert(out.count() == table("documents").count())
  }
}
