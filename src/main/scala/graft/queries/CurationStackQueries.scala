package graft.queries

import graft.core.Tables
import graft.functions.TextFunctions
import graft.operators.dedup.TextExactDedup
import graft.operators.text.{C4Clean, DupNgramRefiner, GopherQuality}
import graft.runner.{PipelineConf, PipelineRunner}
import org.apache.spark.sql.functions._

/** The realistic curation ORDER as one gate: C4 page cleaning → C4 page
  * filter → Gopher quality filter (over the cleaned text) → duplicated
  * n-gram span removal (over the survivors' corpus) → exact dedup on the
  * span-removed text — run through the YAML registry with disposition
  * (single-pass reject routing) enabled, exactly how a user composes the
  * engine (the reference chains filters the same way in
  * configs/example_commoncrawl.yaml). The DuckDB oracle recomputes the
  * whole stack as a SEQUENTIAL CTE chain, so the gate also proves the
  * disposition path preserves sequential semantics end-to-end —
  * including that dup-ngram counts grams over the rows that survived the
  * two filters, not the raw input.
  *
  * Fixture classes (first matching rule wins, both engines):
  * doc_id%89 NULL text (C4 rejects, lands in the rejected output);
  * %13 lorem-ipsum page (C4 doc rule); %7∈{0,1} PAIRED pages — two
  * identical docs, below dup-ngram's minCount=3, so the pair survives
  * span removal intact and exact dedup drops the second; %4 boilerplate
  * class — three sentences shared by the whole class, so every instance
  * is span-removed down to its unique closing line; %5 numeric flood
  * (Gopher alpha-fraction reject); everything else three unique
  * sentences that pass every stage.
  */
object CurationStackQueries {

  private val minCount = 3

  private val sShort = "short one."
  private val sharedA =
    "The quick brown fox jumps over the lazy dog again and again here today."
  private val sharedB =
    "Pack my box with five dozen liquor jugs of the finest quality available today."
  private val sNums =
    "Numbers 11 22 33 44 55 66 77 88 99 00 11 22 33 44 55 66 77 88 99 00 fill this line today."
  private val sLorem =
    "Lorem ipsum dolor sit amet fills this entire page with that old filler text."

  private def sent(prefix: String, idExpr: org.apache.spark.sql.Column, suffix: String) =
    concat(lit(prefix), idExpr.cast("string"), lit(suffix))

  private def stackAug(df: org.apache.spark.sql.DataFrame) = {
    val id = col("doc_id")
    val pairId = col("doc_id") - (col("doc_id") % 7)
    val s1 = sent("Sentence one for document ", id, " carries enough words with the right shape.")
    val s2 = sent("Second sentence for document ", id, " adds more of that necessary body text.")
    val s3 = sent("Third sentence for document ", id, " completes the document with room to spare.")
    val uniq = sent("Unique closing line ", id, " finishes the page with that extra information today.")
    val p1 = sent("Paired sentence ", pairId, " repeats the same words with enough length to pass muster.")
    val p2 = sent("Paired follow-up ", pairId, " continues with that same shared body of words here.")
    val p3 = sent("Paired closer ", pairId, " rounds out the needed three sentences for the cleaner.")
    df.withColumn("text2",
      when(id % 89 === 0, lit(null).cast("string"))
        .when(id % 13 === 0, concat(s1, lit("\n" + sLorem + "\n"), s3))
        .when(id % 7 <= 1, concat(p1, lit("\n"), p2, lit("\n"), p3))
        .when(id % 4 === 0, concat(lit(sharedA + "\n" + sharedB + "\n"), uniq))
        .when(id % 5 === 0, concat(s1, lit("\n" + sNums + "\n"), s3))
        .otherwise(concat(s1, lit("\n" + sShort + "\n"), s2, lit("\n"), s3)))
  }

  private val stackAugSql = {
    val id = "CAST(doc_id AS VARCHAR)"
    val pairId = "CAST(doc_id - (doc_id % 7) AS VARCHAR)"
    val s1 = s"'Sentence one for document ' || $id || ' carries enough words with the right shape.'"
    val s2 = s"'Second sentence for document ' || $id || ' adds more of that necessary body text.'"
    val s3 = s"'Third sentence for document ' || $id || ' completes the document with room to spare.'"
    val uniq = s"'Unique closing line ' || $id || ' finishes the page with that extra information today.'"
    val p1 = s"'Paired sentence ' || $pairId || ' repeats the same words with enough length to pass muster.'"
    val p2 = s"'Paired follow-up ' || $pairId || ' continues with that same shared body of words here.'"
    val p3 = s"'Paired closer ' || $pairId || ' rounds out the needed three sentences for the cleaner.'"
    s"""(SELECT doc_id, CASE
       |  WHEN doc_id % 89 = 0 THEN NULL
       |  WHEN doc_id % 13 = 0 THEN $s1 || chr(10) || '$sLorem' || chr(10) || $s3
       |  WHEN doc_id % 7 <= 1 THEN $p1 || chr(10) || $p2 || chr(10) || $p3
       |  WHEN doc_id % 4 = 0 THEN '$sharedA' || chr(10) || '$sharedB' || chr(10) || $uniq
       |  WHEN doc_id % 5 = 0 THEN $s1 || chr(10) || '$sNums' || chr(10) || $s3
       |  ELSE $s1 || chr(10) || '$sShort' || chr(10) || $s2 || chr(10) || $s3
       |  END AS text2 FROM documents)""".stripMargin
  }

  // twin generators configured exactly like the YAML operators below
  private val dupOp = new DupNgramRefiner(
    "text_c4_clean", "doc_id", ngramWidth = 8, minCount = minCount, hashName = "portable")

  /** Materialize the augmented input for `dir` ONCE (atomic publish,
    * reused across bench reps and Verify runs — the WarcQueries idiom);
    * re-writing it per invocation doubled the gate's job count per rep.
    */
  private def fixtureInDir(s: org.apache.spark.sql.SparkSession, dir: String): String = {
    val key = Integer.toHexString(dir.hashCode)
    val out = java.nio.file.Paths.get(
      sys.props("java.io.tmpdir"), s"graft_stack_fixture_$key")
    if (!java.nio.file.Files.isDirectory(out)) {
      val tmp = java.nio.file.Files.createTempDirectory("graft_stack_build")
      stackAug(Tables(s, dir, "documents")).write.mode("overwrite")
        .parquet(s"$tmp/in")
      try java.nio.file.Files.move(tmp, out,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      catch { // lost the publish race: another run's fixture is in place
        case _: java.nio.file.FileAlreadyExistsException
           | _: java.nio.file.DirectoryNotEmptyException => ()
      }
    }
    s"$out/in"
  }

  val queries: Seq[OracleQuery] = Seq(
    OracleQuery("curation_stack",
      (s, dir) => {
        val in = fixtureInDir(s, dir)
        val base = java.nio.file.Files.createTempDirectory("graft_stack").toString
        val conf = PipelineConf.fromYaml(
          s"""data_loader:
             |  type: ParquetLoader
             |  params: {format: parquet, path: "$in"}
             |stages:
             |  - name: curation
             |    operators:
             |      - name: c4_clean
             |        params: {text_field: "text2"}
             |      - name: c4_quality_filter
             |        params: {text_field: "text2"}
             |      - name: gopher_quality_filter
             |        params: {text_field: "text_c4_clean", min_words: 10, min_stopwords: 2}
             |      - name: dup_ngram
             |        params: {text_field: "text_c4_clean", id_field: "doc_id", ngram_width: 8, min_count: $minCount, hash_algorithm: "portable"}
             |      - name: text_exact_deduplicator
             |        params: {text_field: "text_dedup_spans", id_field: "doc_id", hash_algorithm: "portable"}
             |data_writer:
             |  type: ParquetDataWriter
             |  params: {output_path: "$base/out", table_name: "docs"}
             |executor:
             |  rejected_samples: {enabled: true}
             |""".stripMargin)
        PipelineRunner.run(s, conf)
        s.read.parquet(s"$base/out/docs")
          .select(col("doc_id"), col("c4_lines_kept"),
            col("dup_ngram_count"), col("text_dedup_spans"))
          .orderBy(col("doc_id"))
      },
      Some {
        val gopherKeep = GopherQuality.keepSql("text_c4_clean", "toks", 10L, 100000L, 2)
        val mask = dupOp.maskSql("toks", "d.dups")
        s"""WITH aug AS $stackAugSql,
           |c4k AS (SELECT doc_id, text2,
           |  ${C4Clean.keptLinesSql("text2", 5)} AS _kept FROM aug),
           |c4 AS (SELECT doc_id, text2,
           |  coalesce(list_aggregate(_kept, 'string_agg', chr(10)), '') AS text_c4_clean,
           |  CAST(len(_kept) AS BIGINT) AS c4_lines_kept FROM c4k),
           |keep1 AS (SELECT * FROM c4
           |  WHERE ${C4Clean.docKeepSql("text2", C4Clean.sentenceCountSql("text_c4_clean"), 3)}),
           |tk1 AS (SELECT doc_id, text_c4_clean, c4_lines_kept,
           |  ${TextFunctions.tokensOfSql("text_c4_clean")} AS toks FROM keep1),
           |keep2 AS (SELECT doc_id, text_c4_clean, c4_lines_kept FROM tk1
           |  WHERE $gopherKeep),
           |${dupOp.dupCteSql("keep2", "doc_id")},
           |tk2 AS (SELECT doc_id, c4_lines_kept,
           |  ${TextFunctions.tokensOfSql("text_c4_clean")} AS toks FROM keep2),
           |spans AS (SELECT tk2.doc_id, c4_lines_kept,
           |  coalesce(d.dup_cnt, 0) AS dup_ngram_count,
           |  coalesce(list_aggregate($mask, 'string_agg', ' '), '') AS text_dedup_spans
           |  FROM tk2 LEFT JOIN _dn d ON tk2.doc_id = d.id)
           |SELECT doc_id, c4_lines_kept, dup_ngram_count, text_dedup_spans FROM (
           |  SELECT *, row_number() OVER (
           |    PARTITION BY ${TextExactDedup.keySql("text_dedup_spans", "doc_id")}
           |    ORDER BY doc_id) AS rn FROM spans) t
           |WHERE rn = 1 ORDER BY doc_id""".stripMargin
      }))
}
