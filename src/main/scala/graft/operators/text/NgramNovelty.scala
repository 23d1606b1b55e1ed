package graft.operators.text

import graft.functions.{HashFunctions, TextFunctions}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-document n-gram novelty: the fraction of a document's distinct
  * shingles whose corpus-wide FIRST occurrence (minimum `idCol` over
  * every document containing the shingle) is this document. Late
  * documents assembled from previously-seen text (boilerplate, quote
  * farms, template spam) score near 0; genuinely new prose scores near
  * 1 — the corpus-ordered novelty signal behind "fraction of duplicated
  * n-grams" curation metrics (Lee et al. 2022 report it corpus-wide;
  * this is the per-doc attribution view the reference's metrics layer
  * would chart). Reference context: mega-data-factory's dedup family
  * stops at document granularity (operators/dedup/text_exact_dedup.py);
  * this extends the same hashed-shingle universe the near-dup tier
  * already builds to a scoring operator.
  *
  * Scale shape: one explode of distinct shingle hashes, one
  * `groupBy(hash) → min(doc)` (fixed-width longs on the wire, partial
  * aggregation map-side), one hash-keyed join back, one `groupBy(doc)`.
  * No pair joins, no windows — survives 100× the corpus untouched.
  * Documents with no shingles (shorter than the window) score null.
  */
final class NgramNovelty(
    textCol: String = "text",
    idCol: String = "doc_id",
    shingleWidth: Int = 3) {

  val name = "ngram_novelty"

  /** `(idCol, n_shingles, n_novel, novelty)` per document. */
  def apply(df: DataFrame): DataFrame = {
    val ex = df.select(col(idCol).as("_id"),
        explode(graft.plans.kernels.shingle_hashes(col(textCol), shingleWidth)).as("_g"))
    val first = ex.groupBy(col("_g")).agg(min(col("_id")).as("_first"))
    ex.join(first, Seq("_g"))
      .groupBy(col("_id"))
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("_first") === col("_id"), 1L).otherwise(0L)).as("n_novel"))
      .select(col("_id").as(idCol), col("n_shingles"), col("n_novel"),
        round(col("n_novel").cast("double") / col("n_shingles").cast("double"), 6)
          .as("novelty"))
  }

  // ---- DuckDB twin ----

  def sql(table: String): String =
    s"""WITH sh AS (SELECT $idCol AS id,
       |    list_distinct(list_transform(${TextFunctions.shinglesSql("t", shingleWidth)},
       |      x -> ${HashFunctions.portableHash64Sql("x")})) AS s
       |  FROM (SELECT $idCol, ${TextFunctions.tokensOfSql(textCol)} AS t FROM $table)),
       |ex AS (SELECT id, unnest(s) AS g FROM sh),
       |fst AS (SELECT g, min(id) AS first_id FROM ex GROUP BY g)
       |SELECT ex.id AS $idCol, count(*) AS n_shingles,
       |  CAST(sum(CASE WHEN fst.first_id = ex.id THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
       |  round(CAST(sum(CASE WHEN fst.first_id = ex.id THEN 1 ELSE 0 END) AS DOUBLE)
       |    / CAST(count(*) AS DOUBLE), 6) AS novelty
       |FROM ex JOIN fst ON fst.g = ex.g
       |GROUP BY ex.id ORDER BY $idCol""".stripMargin
}

/** YAML-registrable refiner: appends `(n_shingles, n_novel, novelty)`
  * to every row. Corpus first-occurrence state comes from the whole —
  * or, under disposition, the alive — input (a row rejected upstream
  * must not claim first occurrence of a shingle); shingle-less rows
  * keep nulls.
  */
final class NgramNoveltyRefiner(
    textCol: String = "text",
    idCol: String = "doc_id",
    shingleWidth: Int = 3) extends graft.core.Operator {

  val name = "ngram_novelty"
  private val inner = new NgramNovelty(textCol, idCol, shingleWidth)

  def apply(df: DataFrame): DataFrame =
    df.join(inner(df), Seq(idCol), "left")

  override def applyGated(df: DataFrame, alive: Column): DataFrame =
    df.join(inner(df.filter(alive)), Seq(idCol), "left")
}
