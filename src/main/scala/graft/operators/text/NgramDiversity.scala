package graft.operators.text

import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distinct-n diversity of a corpus — for each n-gram order, the ratio
  * of distinct n-grams to total n-grams (distinct-1/2/3 of the NLG
  * evaluation literature, Li et al. 2016). The training-data use:
  * synthetic or template-generated corpora collapse to low distinct-2/3
  * long before a human notices ("the model generated 50k variants of
  * the same sentence"), and a diversity drop between snapshots is the
  * cheapest mode-collapse alarm a data pipeline can run.
  *
  * Exactness: totals and distinct counts are exact integer aggregates
  * (COUNT + COUNT DISTINCT over the shingle exchange — the same
  * shuffle a word count pays, once per order); the ratio is one
  * fixed-shape division.
  *
  * Scale shape: one token-keyed partial aggregate per order (orders
  * are independent scans — production stages the token array column
  * once and fans the orders out from it; the distinct count is
  * Spark's two-stage hash distinct, no row blowup beyond the shingle
  * explode).
  */
final class NgramDiversity(textCol: String, maxN: Int = 3) {

  require(maxN >= 1 && maxN <= 5, s"maxN $maxN out of [1,5]")
  val name = "ngram_diversity"

  /** One row per order: `(n, total_ngrams, distinct_ngrams,
    * distinct_ratio)`; ratio null for an order with no n-grams.
    */
  def apply(df: DataFrame): DataFrame = {
    // STAGE the token array behind a projection boundary: the shingle
    // lambda references the token expression (w+1) times and Catalyst
    // does not dedupe subexpressions inside lambdas, so an unstaged
    // tokensOf re-runs normalize+split per reference — measured 23.5 s
    // → ~1 s at sf0.1 (the TextFunctions.shingles contract)
    val staged = df.select(TextFunctions.tokensOf(col(textCol)).as("_toks"))
    val perOrder = (1 to maxN).map { n =>
      val grams = if (n == 1) col("_toks")
        else TextFunctions.shingles(col("_toks"), n)
      staged.select(explode(grams).as("_g"))
        .agg(count(lit(1)).as("total_ngrams"),
          countDistinct(col("_g")).as("distinct_ngrams"))
        .select(lit(n).cast("long").as("n"), col("total_ngrams"),
          col("distinct_ngrams"),
          when(col("total_ngrams") > 0,
            round(col("distinct_ngrams").cast("double") /
              col("total_ngrams").cast("double"), 6)).as("distinct_ratio"))
    }
    perOrder.reduce(_ unionByName _).orderBy(col("n"))
  }

  // ---- DuckDB twin ----

  def sql(table: String): String = {
    val toks = TextFunctions.tokensOfSql(textCol)
    val orders = (1 to maxN).map { n =>
      val grams = if (n == 1) "toks" else TextFunctions.shinglesSql("toks", n)
      s"""SELECT CAST($n AS BIGINT) AS n, count(*) AS total_ngrams,
         |  count(DISTINCT g) AS distinct_ngrams,
         |  CASE WHEN count(*) > 0
         |    THEN round(CAST(count(DISTINCT g) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6)
         |  END AS distinct_ratio
         |FROM (SELECT unnest($grams) AS g
         |      FROM (SELECT $toks AS toks FROM $table))""".stripMargin
    }
    orders.mkString("", "\nUNION ALL\n", "\nORDER BY n")
  }
}
