package graft.queries

import graft.core.Tables
import graft.sources.Warc
import org.apache.spark.sql.functions._

/** S2/S3 gate: the WARC loader + HTML extractor run end-to-end over an
  * archive GENERATED from the documents fixture (each doc wrapped in a
  * minimal HTML page inside an HTTP response record), and the DuckDB twin
  * predicts the extractor's exact output from the wrapper's algebra: the
  * body paragraph becomes one whitespace-collapsed line (the title is
  * its own field, never part of `text`), records keep only ≥100-char
  * HTML bodies and ≥50-char extractions. Fixture text is verified ASCII
  * with no markup characters, so no entity/tag edge cases apply.
  */
object WarcQueries {

  private val htmlOverhead =
    "<html><head><title>".length + "</title></head><body><p>".length + "</p></body></html>".length

  /** Build the WARC archive bytes from (doc_id, text) pairs. */
  private[queries] def buildWarc(docs: Seq[(Long, String)]): Array[Byte] = {
    val sb = new StringBuilder
    docs.foreach { case (id, text) =>
      val collapsed = Option(text).getOrElse("").replaceAll("\\s+", " ").trim
      val html = s"<html><head><title>t$id</title></head><body><p>$collapsed</p></body></html>"
      val payload = s"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n$html"
      sb ++= s"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: http://fixture/$id\r\n"
      sb ++= s"WARC-Date: 2024-12-01T00:00:00Z\r\nContent-Length: ${payload.getBytes("UTF-8").length}\r\n\r\n"
      sb ++= payload
      sb ++= "\r\n\r\n"
    }
    sb.toString.getBytes("UTF-8")
  }

  val queries: Seq[OracleQuery] = Seq(
    OracleQuery("warc_extract",
      (s, dir) => {
        val docs = Tables(s, dir, "documents")
          .select(col("doc_id"), col("text")).orderBy(col("doc_id"))
          .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) null else r.getString(1)))
        val file = java.nio.file.Files.createTempDirectory("graft_warc_gate")
          .resolve("fixture.warc")
        java.nio.file.Files.write(file, buildWarc(docs.toSeq))
        Warc.load(s, file.toString, "CC-FIX")
          .select(col("url"), col("text"), col("text_length"))
          .orderBy(col("url"))
      },
      Some(s"""WITH c AS (SELECT doc_id,
              |    trim(regexp_replace(coalesce(text, ''), '\\s+', ' ', 'g')) AS ct
              |  FROM documents),
              |e AS (SELECT 'http://fixture/' || CAST(doc_id AS VARCHAR) AS url, ct AS text
              |  FROM c
              |  WHERE $htmlOverhead + length('t' || CAST(doc_id AS VARCHAR)) + length(ct) >= 100)
              |SELECT url, text, CAST(length(text) AS BIGINT) AS text_length
              |FROM e WHERE length(text) >= 50
              |ORDER BY url""".stripMargin)))
}
