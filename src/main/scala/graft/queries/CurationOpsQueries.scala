package graft.queries

import graft.core.Tables
import graft.functions.TextFunctions
import graft.operators.text.{BenchmarkDecontaminationFilter, DeterministicSampleFilter, LineDedupRefiner, PiiRedaction, PiiRedactionRefiner, TextRepetition, TextRepetitionRefiner, UnicodeNormalizeRefiner}
import org.apache.spark.sql.functions._

/** Gates for the round-5 training-data curation additions: benchmark
  * decontamination (n-gram leak removal), PII redaction, deterministic
  * sampling, and Gopher repetition signals. Each oracle RECOMPUTES the
  * semantics in DuckDB from the same raw tables — list-function shingle
  * algebra for decontamination/repetition, DuckDB's own RE2 engine for
  * the PII regexes, md5-prefix hashing for the sampler — so nothing is
  * pinned from the implementation.
  */
object CurationOpsQueries {

  // Held-out "benchmark" = every 97th document; the training corpus is
  // the full table, so benchmark members self-contaminate and any doc
  // sharing an 8-gram with one leaks — both must drop.
  private val decontam = new BenchmarkDecontaminationFilter(
    _ => sys.error("oracle template only"), "doc_id", "text", ngramWidth = 8)

  // Deterministic PII augmentation, built identically on both sides so
  // the counts/redaction run over text KNOWN to carry each kind.
  private def augSql =
    "(text || ' reach user' || CAST(doc_id AS VARCHAR) || '@example.com via 10.1.2.' || " +
      "CAST(doc_id % 200 AS VARCHAR) || ' or 415-555-' || " +
      "lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || ' end')"

  // Canonical-dedup URL fixture: docs (4m, 4m+1) and (4m+2, 4m+3) land on
  // the same canonical URL through DIFFERENT mess (tracking param vs
  // fragment, trailing slash, mixed-case host + default port), so the
  // dedup exercises every canonicalization rule with real collisions.
  private def canonDedupUrl: org.apache.spark.sql.Column =
    concat(
      when(col("doc_id") % 2 === 0, lit("HTTPS")).otherwise(lit("https")),
      lit("://"),
      when(col("doc_id") % 2 === 0, lit("Example.COM:443"))
        .otherwise(lit("example.com")),
      lit("/P"), expr("CAST(doc_id DIV 2 AS STRING)"),
      when(col("doc_id") % 4 === 0, lit("/?utm_source=feed&q=1"))
        .when(col("doc_id") % 4 === 1, lit("?q=1#top"))
        .when(col("doc_id") % 4 === 2, lit("/#frag"))
        .otherwise(lit("/")))

  private val canonDedupUrlSql: String =
    "((CASE WHEN doc_id % 2 = 0 THEN 'HTTPS' ELSE 'https' END) || '://' || " +
      "(CASE WHEN doc_id % 2 = 0 THEN 'Example.COM:443' ELSE 'example.com' END) || " +
      "'/P' || CAST(doc_id // 2 AS VARCHAR) || " +
      "(CASE WHEN doc_id % 4 = 0 THEN '/?utm_source=feed&q=1' " +
      "WHEN doc_id % 4 = 1 THEN '?q=1#top' " +
      "WHEN doc_id % 4 = 2 THEN '/#frag' ELSE '/' END))"

  // first-wins on the hashed CANONICAL key; a NULL url falls back to the
  // id (no key, no dedup evidence — the TextExactDedup contract)
  private val canonDedupOp = new graft.operators.dedup.ExactDedup(
    "canonical_url_dedup",
    df => when(col("url3").isNull, col("doc_id").cast("string"))
      .otherwise(graft.functions.HashFunctions.portableHash64(
        expr(graft.operators.text.UrlCanonicalize.canonicalSqlSpark("url3")))
        .cast("string")),
    orderCol = "doc_id", repCol = "doc_id")

  private val canonDedupKeySql: String =
    "(CASE WHEN url3 IS NULL THEN CAST(doc_id AS VARCHAR) ELSE " +
      s"CAST(${graft.functions.HashFunctions.portableHash64Sql(
        graft.operators.text.UrlCanonicalize.canonicalSql("url3"))} AS VARCHAR) END)"

  val queries: Seq[OracleQuery] = Seq(

    OracleQuery("benchmark_decontamination",
      (s, dir) => {
        val docs = Tables(s, dir, "documents")
        val bench = docs.filter(col("doc_id") % 97 === 0).select(col("text"))
        BenchmarkDecontaminationFilter(bench, "doc_id", "text", ngramWidth = 8)(docs)
          .select(col("doc_id")).orderBy(col("doc_id"))
      },
      Some(s"""SELECT doc_id FROM documents
              |WHERE ${decontam.keepSql("documents",
                "SELECT text FROM documents WHERE doc_id % 97 = 0")}
              |ORDER BY doc_id""".stripMargin)),

    OracleQuery("pii_redaction",
      (s, dir) => {
        val aug = Tables(s, dir, "documents").withColumn("text2",
          concat(col("text"), lit(" reach user"), col("doc_id").cast("string"),
            lit("@example.com via 10.1.2."), (col("doc_id") % 200).cast("string"),
            lit(" or 415-555-"), lpad((col("doc_id") % 10000).cast("string"), 4, "0"),
            lit(" end")))
        new PiiRedactionRefiner("text2")(aug)
          .select(col("doc_id"), col("pii_email_count"), col("pii_ipv4_count"),
            col("pii_phone_count"), col("text_redacted"))
          .orderBy(col("doc_id"))
      },
      Some(s"""SELECT doc_id,
              |  ${PiiRedaction.countOfSql(augSql, "email")} AS pii_email_count,
              |  ${PiiRedaction.countOfSql(augSql, "ipv4")} AS pii_ipv4_count,
              |  ${PiiRedaction.countOfSql(augSql, "phone")} AS pii_phone_count,
              |  ${PiiRedaction.redactSql(augSql)} AS text_redacted
              |FROM documents ORDER BY doc_id""".stripMargin)),

    OracleQuery("deterministic_sample",
      (s, dir) => {
        val op = new DeterministicSampleFilter(
          fraction = 0.8, idCol = "doc_id", hashName = "portable", salt = "r5")
        op(Tables(s, dir, "documents")).select(col("doc_id")).orderBy(col("doc_id"))
      },
      Some({
        val op = new DeterministicSampleFilter(
          fraction = 0.8, idCol = "doc_id", hashName = "portable", salt = "r5")
        s"""SELECT doc_id FROM documents
           |WHERE ${op.keepSql("doc_id")} ORDER BY doc_id""".stripMargin
      })),

    OracleQuery("line_dedup",
      (s, dir) => {
        // multi-line docs with PLANTED cross-document boilerplate: every
        // doc in a doc_id % 7 class shares that class's line — only the
        // first doc of each class keeps it; the unique line survives
        val aug = Tables(s, dir, "documents").withColumn("text2",
          concat(col("text"), lit("\nshared boilerplate line "),
            (col("doc_id") % 7).cast("string"),
            lit("\nunique line "), col("doc_id").cast("string")))
        new LineDedupRefiner("text2", "doc_id", "doc_id",
          minLineLength = 1, hashName = "portable")(aug)
          .select(col("doc_id"), col("text_line_deduped").as("text_clean"),
            col("lines_removed"))
          .orderBy(col("doc_id"))
      },
      Some({
        val op = new LineDedupRefiner("text2", "doc_id", "doc_id",
          minLineLength = 1, hashName = "portable")
        val augSql = "(SELECT doc_id, (text || chr(10) || 'shared boilerplate line ' || " +
          "CAST(doc_id % 7 AS VARCHAR) || chr(10) || 'unique line ' || " +
          "CAST(doc_id AS VARCHAR)) AS text2 FROM documents)"
        s"""WITH ${op.rebuildCteSql(augSql, "text2")}
           |SELECT id AS doc_id, text_clean, lines_removed FROM _ld
           |ORDER BY doc_id""".stripMargin
      })),

    OracleQuery("intra_doc_line_dedup",
      (s, dir) => {
        // planted WITHIN-doc repeats: a footer line appears twice plus a
        // doc-unique line between them — first occurrence survives in
        // place, the second is dropped; corpus-global state untouched
        val aug = Tables(s, dir, "documents").withColumn("text2",
          concat(col("text"), lit("\nfooter line"),
            lit("\nunique line "), (col("doc_id") % 13).cast("string"),
            lit("\nfooter line\nfooter line")))
        new graft.operators.text.IntraDocLineDedup("text2")(aug)
          .select(col("doc_id"),
            col("text_intra_deduped").as("text_clean"),
            col("intra_lines_removed").as("lines_removed"))
          .orderBy(col("doc_id"))
      },
      Some {
        val (textExpr, removedExpr) =
          new graft.operators.text.IntraDocLineDedup("text2").sqlExprs
        val augSql = "(SELECT doc_id, (text || chr(10) || 'footer line' || " +
          "chr(10) || 'unique line ' || CAST(doc_id % 13 AS VARCHAR) || " +
          "chr(10) || 'footer line' || chr(10) || 'footer line') AS text2 FROM documents)"
        s"""SELECT doc_id, $textExpr AS text_clean, $removedExpr AS lines_removed
           |FROM $augSql ORDER BY doc_id""".stripMargin
      }),

    OracleQuery("boilerplate_line_removal",
      (s, dir) => {
        // cross-doc template lines: the %7-class line sits in ~n/7 docs
        // (over any threshold → removed from EVERY doc, unlike
        // line_dedup's first-survivor), the unique line survives
        val aug = Tables(s, dir, "documents").withColumn("text2",
          concat(col("text"), lit("\nshared boilerplate line "),
            (col("doc_id") % 7).cast("string"),
            lit("\nunique line "), col("doc_id").cast("string")))
        new graft.operators.text.BoilerplateLineRemoval("text2", "doc_id",
          maxDocFreq = 5, minLineLength = 1, hashName = "portable")(aug)
          .select(col("doc_id"),
            col("text_boilerplate_removed").as("text_clean"),
            col("boilerplate_lines_removed").as("lines_removed"))
          .orderBy(col("doc_id"))
      },
      Some({
        val op = new graft.operators.text.BoilerplateLineRemoval("text2", "doc_id",
          maxDocFreq = 5, minLineLength = 1, hashName = "portable")
        val augSql = "(SELECT doc_id, (text || chr(10) || 'shared boilerplate line ' || " +
          "CAST(doc_id % 7 AS VARCHAR) || chr(10) || 'unique line ' || " +
          "CAST(doc_id AS VARCHAR)) AS text2 FROM documents)"
        s"""WITH ${op.rebuildCteSql(augSql, "text2")}
           |SELECT id AS doc_id, text_clean, lines_removed FROM _bl
           |ORDER BY doc_id""".stripMargin
      })),

    OracleQuery("unicode_normalize",
      // docs with doc_id % 3 == 0 get a DECOMPOSED suffix (e + combining
      // acute, i + combining diaeresis): NFC must compose them, flag the
      // row changed, and leave already-composed rows untouched
      (s, dir) => {
        val aug = Tables(s, dir, "documents").withColumn("text2",
          when(col("doc_id") % 3 === 0,
            concat(col("text"), lit(" cafe\u0301 na\u0131\u0308ve")))
            .otherwise(col("text")))
        new UnicodeNormalizeRefiner("text2")(aug)
          .select(col("doc_id"), col("text_normalized"), col("unicode_changed"))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH aug AS (SELECT doc_id, CASE WHEN doc_id % 3 = 0
              |  THEN (text || ' caf' || 'e' || chr(769) || ' na' || chr(305) || chr(776) || 've')
              |  ELSE text END AS text2 FROM documents)
              |SELECT doc_id, nfc_normalize(text2) AS text_normalized,
              |  (nfc_normalize(text2) <> text2) AS unicode_changed
              |FROM aug ORDER BY doc_id""".stripMargin)),

    OracleQuery("paragraph_dedup",
      (s, dir) => {
        // paragraph units ("\n\n"-separated): every doc_id % 5 class
        // shares a boilerplate paragraph (first doc of the class keeps
        // it); each doc also has a unique paragraph that must survive
        val aug = Tables(s, dir, "documents").withColumn("text2",
          concat(col("text"), lit("\n\nshared footer paragraph number "),
            (col("doc_id") % 5).cast("string"),
            lit("\n\nunique closing paragraph "), col("doc_id").cast("string")))
        new LineDedupRefiner("text2", "doc_id", "doc_id",
          minLineLength = 1, hashName = "portable",
          outputCol = "text_paragraph_deduped",
          removedCol = "paragraphs_removed", separator = "\n\n")(aug)
          .select(col("doc_id"), col("text_paragraph_deduped").as("text_clean"),
            col("paragraphs_removed"))
          .orderBy(col("doc_id"))
      },
      Some({
        val op = new LineDedupRefiner("text2", "doc_id", "doc_id",
          minLineLength = 1, hashName = "portable",
          outputCol = "text_paragraph_deduped",
          removedCol = "paragraphs_removed", separator = "\n\n")
        val augSql = "(SELECT doc_id, (text || chr(10) || chr(10) || " +
          "'shared footer paragraph number ' || CAST(doc_id % 5 AS VARCHAR) || " +
          "chr(10) || chr(10) || 'unique closing paragraph ' || " +
          "CAST(doc_id AS VARCHAR)) AS text2 FROM documents)"
        s"""WITH ${op.rebuildCteSql(augSql, "text2")}
           |SELECT id AS doc_id, text_clean,
           |  lines_removed AS paragraphs_removed FROM _ld
           |ORDER BY doc_id""".stripMargin
      })),

    OracleQuery("url_canonicalize",
      (s, dir) => {
        // deterministic messy URLs: mixed-case scheme/host, default port,
        // tracking params around a kept one, fragment
        val aug = Tables(s, dir, "documents").withColumn("url2",
          concat(lit("HTTPS://Example"), (col("doc_id") % 5).cast("string"),
            lit(".COM:443/Path"), col("doc_id").cast("string"),
            lit("/?utm_source=feed&id="), col("doc_id").cast("string"),
            lit("&gclid=x17&q=Keep#sec"), (col("doc_id") % 3).cast("string")))
        new graft.operators.text.UrlCanonicalizeRefiner("url2")(aug)
          .select(col("doc_id"), col("url_canonical"))
          .orderBy(col("doc_id"))
      },
      Some({
        val augSql = "('HTTPS://Example' || CAST(doc_id % 5 AS VARCHAR) || " +
          "'.COM:443/Path' || CAST(doc_id AS VARCHAR) || '/?utm_source=feed&id=' || " +
          "CAST(doc_id AS VARCHAR) || '&gclid=x17&q=Keep#sec' || CAST(doc_id % 3 AS VARCHAR))"
        s"""SELECT doc_id, ${graft.operators.text.UrlCanonicalize.canonicalSql(augSql)} AS url_canonical
           |FROM documents ORDER BY doc_id""".stripMargin
      })),

    OracleQuery("canonical_url_dedup",
      // crawl-side dedup the reference's raw-string include_url mode
      // can't do: first-wins on the CANONICAL url key, so the same page
      // under tracking params / mixed case / default port / fragment /
      // trailing-slash spellings collapses to one survivor. Composes
      // ExactDedup (one exchange on a hashed fixed-width key) with the
      // UrlCanonicalize kernel; the fixture engineers every messy pair
      // (4m, 4m+1) and (4m+2, 4m+3) to collide after canonicalization.
      (s, dir) => {
        val aug = Tables(s, dir, "documents").withColumn("url3", canonDedupUrl)
        canonDedupOp(aug).select(col("doc_id")).orderBy(col("doc_id"))
      },
      Some(s"""SELECT doc_id FROM (
              |  SELECT doc_id, row_number() OVER (
              |    PARTITION BY ${canonDedupKeySql} ORDER BY doc_id) AS rn
              |  FROM (SELECT doc_id, $canonDedupUrlSql AS url3 FROM documents))
              |WHERE rn = 1 ORDER BY doc_id""".stripMargin)),

    OracleQuery("text_repetition",
      (s, dir) => new TextRepetitionRefiner("text")(Tables(s, dir, "documents"))
        .select(col("doc_id"),
          round(col("text_dup_token_ratio"), 6).as("text_dup_token_ratio"),
          round(col("text_dup_2gram_ratio"), 6).as("text_dup_2gram_ratio"))
        .orderBy(col("doc_id")),
      Some(s"""WITH tk AS (SELECT doc_id, ${TextFunctions.tokensOfSql("text")} AS toks
              |           FROM documents)
              |SELECT doc_id,
              |  round(${TextRepetition.dupTokenRatioSql("toks")}, 6) AS text_dup_token_ratio,
              |  round(${TextRepetition.dup2gramRatioSql("toks")}, 6) AS text_dup_2gram_ratio
              |FROM tk ORDER BY doc_id""".stripMargin)))
}
