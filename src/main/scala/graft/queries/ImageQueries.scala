package graft.queries

import graft.operators.image._
import graft.sources.SyntheticImages
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Image CPU operator family gates (SURVEY.md §2 R1/R2/F3/D2) over the
  * deterministic synthetic image fixture (graft.sources.SyntheticImages).
  *
  * Oracle strategy: the fixture's pixels are integer-specified and PNG is
  * lossless, so pixel-pure metrics (dims, entropy, blockiness, filter
  * decisions) are VALUES literals computed by an INDEPENDENT numpy
  * implementation (tools/gen_image_oracle.py) — the reference's own
  * Python-vs-Rust parity idea (tests/test_image_technical_quality.py)
  * applied cross-language at authoring time. The phash keep-set is
  * Scala-derived (canonical-alg decision, SURVEY.md §7.4) and locks
  * determinism; ImageSpec asserts its dedup behavior independently.
  * Queries exclude the two JPEG rows (58,59) wherever the metric depends
  * on decoded pixels of a lossy codec.
  */
object ImageQueries {

  private val metadataOp = new ImageMetadataRefiner("image")
  private val qualityOp = new ImageTechnicalQualityRefiner("image")
  private val filterOp = new ImageQualityFilter(
    minWidth = 64, minHeight = 64,
    maxCompressionArtifacts = 0.8, minInformationEntropy = 3.0)
  private val phashOp = new ImagePhashDedup("image", idCol = "id", orderCol = "id")
  private val phashNearOp = new ImagePhashNearDedup("image", idCol = "id", k = 8)

  private def fixture(s: SparkSession): DataFrame = SyntheticImages.df(s)

  /** Fixture plus two perturbed near-duplicates of id 3 (phash hamming 2
    * and 8 — inside k, below the ≥ 10 cross-image floor), so the near
    * gate distinguishes hamming search from exact matching.
    */
  private def nearFixture(s: SparkSession): DataFrame = {
    import org.apache.spark.sql.Row
    val extra = Seq(
      Row(100L, Row(SyntheticImages.perturbed(3L, 53, 4))),
      Row(101L, Row(SyntheticImages.perturbed(3L, 23, 12))))
    fixture(s).filter(col("id") <= 57).unionByName(
      s.createDataFrame(s.sparkContext.parallelize(extra, 1), SyntheticImages.schema))
  }

  private val metadataValues = """  (CAST(0 AS BIGINT), 48, 48, 'PNG'),
  (CAST(1 AS BIGINT), 78, 104, 'PNG'),
  (CAST(2 AS BIGINT), 108, 160, 'PNG'),
  (CAST(3 AS BIGINT), 138, 48, 'PNG'),
  (CAST(4 AS BIGINT), 168, 104, 'PNG'),
  (CAST(5 AS BIGINT), 48, 160, 'PNG'),
  (CAST(6 AS BIGINT), 78, 48, 'PNG'),
  (CAST(7 AS BIGINT), 108, 104, 'PNG'),
  (CAST(8 AS BIGINT), 138, 160, 'PNG'),
  (CAST(9 AS BIGINT), 168, 48, 'PNG'),
  (CAST(10 AS BIGINT), 48, 104, 'PNG'),
  (CAST(11 AS BIGINT), 78, 160, 'PNG'),
  (CAST(12 AS BIGINT), 108, 48, 'PNG'),
  (CAST(13 AS BIGINT), 138, 104, 'PNG'),
  (CAST(14 AS BIGINT), 168, 160, 'PNG'),
  (CAST(15 AS BIGINT), 48, 48, 'PNG'),
  (CAST(16 AS BIGINT), 78, 104, 'PNG'),
  (CAST(17 AS BIGINT), 108, 160, 'PNG'),
  (CAST(18 AS BIGINT), 138, 48, 'PNG'),
  (CAST(19 AS BIGINT), 168, 104, 'PNG'),
  (CAST(20 AS BIGINT), 48, 160, 'PNG'),
  (CAST(21 AS BIGINT), 78, 48, 'PNG'),
  (CAST(22 AS BIGINT), 108, 104, 'PNG'),
  (CAST(23 AS BIGINT), 138, 160, 'PNG'),
  (CAST(24 AS BIGINT), 168, 48, 'PNG'),
  (CAST(25 AS BIGINT), 48, 104, 'PNG'),
  (CAST(26 AS BIGINT), 78, 160, 'PNG'),
  (CAST(27 AS BIGINT), 108, 48, 'PNG'),
  (CAST(28 AS BIGINT), 138, 104, 'PNG'),
  (CAST(29 AS BIGINT), 168, 160, 'PNG'),
  (CAST(30 AS BIGINT), 48, 48, 'PNG'),
  (CAST(31 AS BIGINT), 78, 104, 'PNG'),
  (CAST(32 AS BIGINT), 108, 160, 'PNG'),
  (CAST(33 AS BIGINT), 138, 48, 'PNG'),
  (CAST(34 AS BIGINT), 168, 104, 'PNG'),
  (CAST(35 AS BIGINT), 48, 160, 'PNG'),
  (CAST(36 AS BIGINT), 78, 48, 'PNG'),
  (CAST(37 AS BIGINT), 108, 104, 'PNG'),
  (CAST(38 AS BIGINT), 138, 160, 'PNG'),
  (CAST(39 AS BIGINT), 168, 48, 'PNG'),
  (CAST(40 AS BIGINT), 48, 104, 'PNG'),
  (CAST(41 AS BIGINT), 78, 160, 'PNG'),
  (CAST(42 AS BIGINT), 108, 48, 'PNG'),
  (CAST(43 AS BIGINT), 138, 104, 'PNG'),
  (CAST(44 AS BIGINT), 168, 160, 'PNG'),
  (CAST(45 AS BIGINT), 48, 48, 'PNG'),
  (CAST(46 AS BIGINT), 78, 104, 'PNG'),
  (CAST(47 AS BIGINT), 108, 160, 'PNG'),
  (CAST(48 AS BIGINT), 138, 48, 'PNG'),
  (CAST(49 AS BIGINT), 168, 104, 'PNG'),
  (CAST(50 AS BIGINT), 78, 104, 'PNG'),
  (CAST(51 AS BIGINT), 108, 160, 'PNG'),
  (CAST(52 AS BIGINT), 138, 48, 'PNG'),
  (CAST(53 AS BIGINT), 78, 48, 'PNG'),
  (CAST(54 AS BIGINT), 0, 0, 'ERROR'),
  (CAST(55 AS BIGINT), 0, 0, 'ERROR'),
  (CAST(56 AS BIGINT), 0, 0, 'ERROR'),
  (CAST(57 AS BIGINT), 0, 0, 'ERROR'),
  (CAST(58 AS BIGINT), 138, 104, 'JPEG'),
  (CAST(59 AS BIGINT), 168, 160, 'JPEG')"""

  private val entropyValues = """  (CAST(0 AS BIGINT), CAST(0.000000 AS DOUBLE)),
  (CAST(1 AS BIGINT), CAST(6.285402 AS DOUBLE)),
  (CAST(2 AS BIGINT), CAST(1.000000 AS DOUBLE)),
  (CAST(3 AS BIGINT), CAST(7.999881 AS DOUBLE)),
  (CAST(4 AS BIGINT), CAST(0.000000 AS DOUBLE)),
  (CAST(5 AS BIGINT), CAST(5.584963 AS DOUBLE)),
  (CAST(6 AS BIGINT), CAST(1.000000 AS DOUBLE)),
  (CAST(7 AS BIGINT), CAST(7.999959 AS DOUBLE)),
  (CAST(8 AS BIGINT), CAST(0.000000 AS DOUBLE)),
  (CAST(9 AS BIGINT), CAST(7.392317 AS DOUBLE)),
  (CAST(10 AS BIGINT), CAST(1.000000 AS DOUBLE)),
  (CAST(11 AS BIGINT), CAST(7.999943 AS DOUBLE)),
  (CAST(12 AS BIGINT), CAST(0.000000 AS DOUBLE)),
  (CAST(13 AS BIGINT), CAST(7.108524 AS DOUBLE)),
  (CAST(14 AS BIGINT), CAST(1.000000 AS DOUBLE)),
  (CAST(15 AS BIGINT), CAST(8.000000 AS DOUBLE)),
  (CAST(16 AS BIGINT), CAST(0.000000 AS DOUBLE)),
  (CAST(17 AS BIGINT), CAST(6.754888 AS DOUBLE)),
  (CAST(18 AS BIGINT), CAST(1.000000 AS DOUBLE)),
  (CAST(19 AS BIGINT), CAST(7.999971 AS DOUBLE)),
  (CAST(20 AS BIGINT), CAST(0.000000 AS DOUBLE)),
  (CAST(21 AS BIGINT), CAST(6.285402 AS DOUBLE)),
  (CAST(22 AS BIGINT), CAST(0.999994 AS DOUBLE)),
  (CAST(23 AS BIGINT), CAST(7.999982 AS DOUBLE)),
  (CAST(24 AS BIGINT), CAST(0.000000 AS DOUBLE)),
  (CAST(25 AS BIGINT), CAST(5.584963 AS DOUBLE)),
  (CAST(26 AS BIGINT), CAST(1.000000 AS DOUBLE)),
  (CAST(27 AS BIGINT), CAST(7.999673 AS DOUBLE)),
  (CAST(28 AS BIGINT), CAST(0.000000 AS DOUBLE)),
  (CAST(29 AS BIGINT), CAST(7.392317 AS DOUBLE)),
  (CAST(30 AS BIGINT), CAST(1.000000 AS DOUBLE)),
  (CAST(31 AS BIGINT), CAST(7.999845 AS DOUBLE)),
  (CAST(32 AS BIGINT), CAST(0.000000 AS DOUBLE)),
  (CAST(33 AS BIGINT), CAST(7.108524 AS DOUBLE)),
  (CAST(34 AS BIGINT), CAST(0.999990 AS DOUBLE)),
  (CAST(35 AS BIGINT), CAST(8.000000 AS DOUBLE)),
  (CAST(36 AS BIGINT), CAST(0.000000 AS DOUBLE)),
  (CAST(37 AS BIGINT), CAST(6.754888 AS DOUBLE)),
  (CAST(38 AS BIGINT), CAST(1.000000 AS DOUBLE)),
  (CAST(39 AS BIGINT), CAST(7.999818 AS DOUBLE)),
  (CAST(40 AS BIGINT), CAST(0.000000 AS DOUBLE)),
  (CAST(41 AS BIGINT), CAST(6.285402 AS DOUBLE)),
  (CAST(42 AS BIGINT), CAST(1.000000 AS DOUBLE)),
  (CAST(43 AS BIGINT), CAST(7.999987 AS DOUBLE)),
  (CAST(44 AS BIGINT), CAST(0.000000 AS DOUBLE)),
  (CAST(45 AS BIGINT), CAST(5.584963 AS DOUBLE)),
  (CAST(46 AS BIGINT), CAST(0.999997 AS DOUBLE)),
  (CAST(47 AS BIGINT), CAST(7.999960 AS DOUBLE)),
  (CAST(48 AS BIGINT), CAST(0.000000 AS DOUBLE)),
  (CAST(49 AS BIGINT), CAST(7.392317 AS DOUBLE)),
  (CAST(50 AS BIGINT), CAST(6.285402 AS DOUBLE)),
  (CAST(51 AS BIGINT), CAST(1.000000 AS DOUBLE)),
  (CAST(52 AS BIGINT), CAST(7.999881 AS DOUBLE)),
  (CAST(53 AS BIGINT), CAST(1.000000 AS DOUBLE)),
  (CAST(54 AS BIGINT), CAST(0.000000 AS DOUBLE)),
  (CAST(55 AS BIGINT), CAST(0.000000 AS DOUBLE)),
  (CAST(56 AS BIGINT), CAST(0.000000 AS DOUBLE)),
  (CAST(57 AS BIGINT), CAST(0.000000 AS DOUBLE))"""

  private val blockinessValues = """  (CAST(0 AS BIGINT), CAST(0.000000 AS DOUBLE)),
  (CAST(1 AS BIGINT), CAST(0.002397 AS DOUBLE)),
  (CAST(2 AS BIGINT), CAST(0.000000 AS DOUBLE)),
  (CAST(3 AS BIGINT), CAST(0.192249 AS DOUBLE)),
  (CAST(4 AS BIGINT), CAST(0.000000 AS DOUBLE)),
  (CAST(5 AS BIGINT), CAST(0.003137 AS DOUBLE)),
  (CAST(6 AS BIGINT), CAST(0.000000 AS DOUBLE)),
  (CAST(7 AS BIGINT), CAST(0.190900 AS DOUBLE)),
  (CAST(8 AS BIGINT), CAST(0.000000 AS DOUBLE)),
  (CAST(9 AS BIGINT), CAST(0.000980 AS DOUBLE)),
  (CAST(10 AS BIGINT), CAST(0.000000 AS DOUBLE)),
  (CAST(11 AS BIGINT), CAST(0.190345 AS DOUBLE)),
  (CAST(12 AS BIGINT), CAST(0.000000 AS DOUBLE)),
  (CAST(13 AS BIGINT), CAST(0.010381 AS DOUBLE)),
  (CAST(14 AS BIGINT), CAST(0.000000 AS DOUBLE)),
  (CAST(15 AS BIGINT), CAST(0.198431 AS DOUBLE)),
  (CAST(16 AS BIGINT), CAST(0.000000 AS DOUBLE)),
  (CAST(17 AS BIGINT), CAST(0.001357 AS DOUBLE)),
  (CAST(18 AS BIGINT), CAST(0.000000 AS DOUBLE)),
  (CAST(19 AS BIGINT), CAST(0.187549 AS DOUBLE)),
  (CAST(20 AS BIGINT), CAST(0.000000 AS DOUBLE)),
  (CAST(21 AS BIGINT), CAST(0.020044 AS DOUBLE)),
  (CAST(22 AS BIGINT), CAST(0.000000 AS DOUBLE)),
  (CAST(23 AS BIGINT), CAST(0.193353 AS DOUBLE)),
  (CAST(24 AS BIGINT), CAST(0.000000 AS DOUBLE)),
  (CAST(25 AS BIGINT), CAST(0.003922 AS DOUBLE)),
  (CAST(26 AS BIGINT), CAST(0.000000 AS DOUBLE)),
  (CAST(27 AS BIGINT), CAST(0.193363 AS DOUBLE)),
  (CAST(28 AS BIGINT), CAST(0.000000 AS DOUBLE)),
  (CAST(29 AS BIGINT), CAST(0.001275 AS DOUBLE)),
  (CAST(30 AS BIGINT), CAST(0.000000 AS DOUBLE)),
  (CAST(31 AS BIGINT), CAST(0.190142 AS DOUBLE)),
  (CAST(32 AS BIGINT), CAST(0.000000 AS DOUBLE)),
  (CAST(33 AS BIGINT), CAST(0.000807 AS DOUBLE)),
  (CAST(34 AS BIGINT), CAST(0.000000 AS DOUBLE)),
  (CAST(35 AS BIGINT), CAST(0.202601 AS DOUBLE)),
  (CAST(36 AS BIGINT), CAST(0.000000 AS DOUBLE)),
  (CAST(37 AS BIGINT), CAST(0.001357 AS DOUBLE)),
  (CAST(38 AS BIGINT), CAST(0.000000 AS DOUBLE)),
  (CAST(39 AS BIGINT), CAST(0.189804 AS DOUBLE)),
  (CAST(40 AS BIGINT), CAST(0.000000 AS DOUBLE)),
  (CAST(41 AS BIGINT), CAST(0.002397 AS DOUBLE)),
  (CAST(42 AS BIGINT), CAST(0.000000 AS DOUBLE)),
  (CAST(43 AS BIGINT), CAST(0.193195 AS DOUBLE)),
  (CAST(44 AS BIGINT), CAST(0.000000 AS DOUBLE)),
  (CAST(45 AS BIGINT), CAST(0.003137 AS DOUBLE)),
  (CAST(46 AS BIGINT), CAST(0.000000 AS DOUBLE)),
  (CAST(47 AS BIGINT), CAST(0.192189 AS DOUBLE)),
  (CAST(48 AS BIGINT), CAST(0.000000 AS DOUBLE)),
  (CAST(49 AS BIGINT), CAST(0.001176 AS DOUBLE)),
  (CAST(50 AS BIGINT), CAST(0.002397 AS DOUBLE)),
  (CAST(51 AS BIGINT), CAST(0.000000 AS DOUBLE)),
  (CAST(52 AS BIGINT), CAST(0.192249 AS DOUBLE)),
  (CAST(53 AS BIGINT), CAST(0.000000 AS DOUBLE)),
  (CAST(54 AS BIGINT), CAST(0.000000 AS DOUBLE)),
  (CAST(55 AS BIGINT), CAST(0.000000 AS DOUBLE)),
  (CAST(56 AS BIGINT), CAST(0.000000 AS DOUBLE)),
  (CAST(57 AS BIGINT), CAST(0.000000 AS DOUBLE))"""

  private val filterKeepValues = """  (CAST(1 AS BIGINT)),
  (CAST(7 AS BIGINT)),
  (CAST(11 AS BIGINT)),
  (CAST(13 AS BIGINT)),
  (CAST(17 AS BIGINT)),
  (CAST(19 AS BIGINT)),
  (CAST(23 AS BIGINT)),
  (CAST(29 AS BIGINT)),
  (CAST(31 AS BIGINT)),
  (CAST(37 AS BIGINT)),
  (CAST(41 AS BIGINT)),
  (CAST(43 AS BIGINT)),
  (CAST(47 AS BIGINT)),
  (CAST(49 AS BIGINT)),
  (CAST(50 AS BIGINT))"""

  val queries: Seq[OracleQuery] = Seq(

    OracleQuery("image_metadata",
      (s, _) => metadataOp(fixture(s))
        .select(col("id"), col("image_width"), col("image_height"), col("image_format"))
        .orderBy(col("id")),
      Some(s"""SELECT * FROM (VALUES
              |$metadataValues
              |) AS t(id, image_width, image_height, image_format) ORDER BY id""".stripMargin)),

    OracleQuery("image_entropy",
      (s, _) => qualityOp(fixture(s)).filter(col("id") <= 57)
        .select(col("id"), round(col("image_information_entropy"), 6).as("entropy"))
        .orderBy(col("id")),
      Some(s"""SELECT * FROM (VALUES
              |$entropyValues
              |) AS t(id, entropy) ORDER BY id""".stripMargin)),

    OracleQuery("image_blockiness",
      (s, _) => {
        val f = fixture(s)
        f.filter(col("id") <= 57)
          .select(col("id"), round(qualityOp.blockinessCol(f), 6).as("blockiness"))
          .orderBy(col("id"))
      },
      Some(s"""SELECT * FROM (VALUES
              |$blockinessValues
              |) AS t(id, blockiness) ORDER BY id""".stripMargin)),

    OracleQuery("image_quality_filter",
      (s, _) => filterOp(qualityOp(metadataOp(fixture(s))).filter(col("id") <= 57))
        .select(col("id")).orderBy(col("id")),
      Some(s"""SELECT * FROM (VALUES
              |$filterKeepValues
              |) AS t(id) ORDER BY id""".stripMargin)),

    OracleQuery("image_phash_dedup",
      (s, _) => phashOp(fixture(s).filter(col("id") <= 57))
        .select(col("id")).orderBy(col("id")),
      Some(s"""SELECT * FROM (VALUES
              |  (CAST(0 AS BIGINT)),
  (CAST(1 AS BIGINT)),
  (CAST(2 AS BIGINT)),
  (CAST(3 AS BIGINT)),
  (CAST(4 AS BIGINT)),
  (CAST(5 AS BIGINT)),
  (CAST(6 AS BIGINT)),
  (CAST(7 AS BIGINT)),
  (CAST(8 AS BIGINT)),
  (CAST(9 AS BIGINT)),
  (CAST(10 AS BIGINT)),
  (CAST(11 AS BIGINT)),
  (CAST(12 AS BIGINT)),
  (CAST(13 AS BIGINT)),
  (CAST(14 AS BIGINT)),
  (CAST(15 AS BIGINT)),
  (CAST(16 AS BIGINT)),
  (CAST(17 AS BIGINT)),
  (CAST(18 AS BIGINT)),
  (CAST(19 AS BIGINT)),
  (CAST(20 AS BIGINT)),
  (CAST(21 AS BIGINT)),
  (CAST(22 AS BIGINT)),
  (CAST(23 AS BIGINT)),
  (CAST(24 AS BIGINT)),
  (CAST(25 AS BIGINT)),
  (CAST(26 AS BIGINT)),
  (CAST(27 AS BIGINT)),
  (CAST(28 AS BIGINT)),
  (CAST(29 AS BIGINT)),
  (CAST(30 AS BIGINT)),
  (CAST(31 AS BIGINT)),
  (CAST(32 AS BIGINT)),
  (CAST(33 AS BIGINT)),
  (CAST(34 AS BIGINT)),
  (CAST(35 AS BIGINT)),
  (CAST(36 AS BIGINT)),
  (CAST(37 AS BIGINT)),
  (CAST(38 AS BIGINT)),
  (CAST(39 AS BIGINT)),
  (CAST(40 AS BIGINT)),
  (CAST(41 AS BIGINT)),
  (CAST(42 AS BIGINT)),
  (CAST(43 AS BIGINT)),
  (CAST(44 AS BIGINT)),
  (CAST(45 AS BIGINT)),
  (CAST(46 AS BIGINT)),
  (CAST(47 AS BIGINT)),
  (CAST(48 AS BIGINT)),
  (CAST(49 AS BIGINT)),
  (CAST(54 AS BIGINT)),
  (CAST(55 AS BIGINT)),
  (CAST(56 AS BIGINT)),
  (CAST(57 AS BIGINT))
              |) AS t(id) ORDER BY id""".stripMargin)),

    // keep-set: everything except the exact pixel dups (50-53, hamming 0)
    // and the planted perturbed near-dups of id 3 (100-101, hamming 2/8);
    // undecodable (54,55) and null (56,57) rows never join and are kept.
    // Regenerate via `sbt "Test/runMain graft.PrintPhashKeep"`.
    OracleQuery("phash_near_dedup",
      (s, _) => phashNearOp(nearFixture(s))
        .select(col("id")).orderBy(col("id")),
      Some(s"""SELECT * FROM (VALUES
              |${((0L to 49L) ++ (54L to 57L)).map(i => s"  (CAST($i AS BIGINT))").mkString(",\n")}
              |) AS t(id) ORDER BY id""".stripMargin)))
}
