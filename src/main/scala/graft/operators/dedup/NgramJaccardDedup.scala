package graft.operators.dedup

import graft.core.{Operator, Rejection}
import graft.functions.{HashFunctions, TextFunctions}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact n-gram Jaccard near-duplicate dedup via an inverted shingle index.
  *
  * Candidate pairs = documents sharing ≥1 shingle (posting-list self-join);
  * Jaccard is computed exactly from the shared-shingle count
  * (|A∩B| / (|A|+|B|-|A∩B|)); a row is DROPPED when an earlier row
  * (smaller `idCol`) has Jaccard ≥ `threshold`.
  *
  * This is the exact (no-false-negative) counterpart of
  * [[MinHashLSHDedup]]: every MinHash drop is a Jaccard drop, never the
  * reverse — asserted in DedupSpec.
  *
  * Scale shape: the explode + self-join shuffles on the shingle string —
  * an inverted index build. Stop-shingles appearing in more than
  * `maxDocFreq` documents are removed from the index first (standard
  * practice; a shingle in f docs contributes f² join rows, so the cap
  * bounds the quadratic blowup; pairs whose only shared shingles are
  * dropped lose candidacy — at a sane cap such pairs are far below any
  * useful threshold anyway). At 100 TB you'd run [[MinHashLSHDedup]]
  * instead; this operator is the exact-verification path.
  */
final class NgramJaccardDedup(
    textCol: String = "text",
    idCol: String = "id",
    shingleWidth: Int = 3,
    threshold: Double = 0.8,
    val maxDocFreq: Option[Int] = None) extends graft.core.RejectingOperator {

  val name = "ngram_jaccard_dedup"

  /** doc → (id, distinct hashed shingle set) via the fused
    * kernels.ShingleHashes loop (tokenize+shingle+hash once per row).
    */
  private def shingled(df: DataFrame): DataFrame =
    df.select(col(idCol).as("_id"),
      graft.plans.kernels.shingle_hashes(col(textCol), shingleWidth).as("_hs"))

  /** Verified duplicate pairs (d1 < d2, exact Jaccard ≥ threshold).
    * Posting lists carry the 60-bit hash of each shingle, not the string —
    * the inverted-index shuffle moves fixed-width longs.
    */
  def verifiedPairs(df: DataFrame): DataFrame = {
    val sh = shingled(df)
    val sizes = sh.select(col("_id"), size(col("_hs")).as("_n"))
    val postings0 = sh.select(col("_id"), explode(col("_hs")).as("_g"))
    val postings = maxDocFreq match {
      case Some(cap) =>
        val hot = postings0.groupBy(col("_g")).agg(count(lit(1)).as("_df"))
          .filter(col("_df") > cap).select(col("_g"))
        postings0.join(broadcast(hot), Seq("_g"), "left_anti")
      case None => postings0
    }
    val pairs = postings.select(col("_g"), col("_id").as("d1"))
      .join(postings.select(col("_g"), col("_id").as("d2")), Seq("_g"))
      .filter(col("d1") < col("d2"))
      .groupBy(col("d1"), col("d2")).agg(count(lit(1)).as("_i"))
    pairs
      .join(sizes.withColumnRenamed("_id", "d1").withColumnRenamed("_n", "_n1"), Seq("d1"))
      .join(sizes.withColumnRenamed("_id", "d2").withColumnRenamed("_n", "_n2"), Seq("d2"))
      .withColumn("_j", col("_i").cast("double") /
        (col("_n1") + col("_n2") - col("_i")).cast("double"))
      .filter(col("_j") >= threshold)
      .select(col("d1"), col("d2"), col("_j").as("jaccard"))
  }

  def apply(df: DataFrame): DataFrame =
    df.join(verifiedPairs(df).select(col("d2").as(idCol)).distinct(), Seq(idCol), "left_anti")

  def mark(df: DataFrame, alive: org.apache.spark.sql.Column, tag: String): graft.core.Marked =
    graft.core.PairwiseMark(df, alive, tag, idCol, name, verifiedPairs)

  def rejected(df: DataFrame): DataFrame = {
    val reps = verifiedPairs(df).groupBy(col("d2")).agg(min(col("d1")).as("_rep"))
      .withColumnRenamed("d2", idCol)
    df.join(reps, Seq(idCol))
      .withColumn(Rejection.ColName,
        Rejection.duplicate(name, lit(null).cast("string"), col("_rep")))
      .drop("_rep")
  }

  // ---- DuckDB twin ----

  def keepSql(table: String): String = {
    val hotFilter = maxDocFreq.map(cap =>
      s"AND a.g NOT IN (SELECT g FROM (SELECT g, count(*) AS f FROM ex GROUP BY g) hot WHERE f > $cap)")
      .getOrElse("")
    s"""WITH sh AS (SELECT $idCol AS id,
       |    list_distinct(list_transform(${TextFunctions.shinglesSql("t", shingleWidth)},
       |      x -> ${HashFunctions.portableHash64Sql("x")})) AS s
       |  FROM (SELECT $idCol, ${TextFunctions.tokensOfSql(textCol)} AS t FROM $table)),
       |ex AS (SELECT id, unnest(s) AS g FROM sh),
       |p AS (SELECT a.id AS d1, b.id AS d2, count(*) AS i
       |  FROM ex a JOIN ex b ON a.g = b.g AND a.id < b.id
       |  WHERE TRUE $hotFilter
       |  GROUP BY 1, 2),
       |sz AS (SELECT id, len(s) AS n FROM sh),
       |ver AS (SELECT d1, d2 FROM p
       |  JOIN sz sa ON sa.id = d1 JOIN sz sb ON sb.id = d2
       |  WHERE CAST(i AS DOUBLE) / CAST(sa.n + sb.n - i AS DOUBLE) >= $threshold)
       |SELECT $idCol FROM $table WHERE $idCol NOT IN (SELECT d2 FROM ver)
       |ORDER BY $idCol""".stripMargin
  }
}
