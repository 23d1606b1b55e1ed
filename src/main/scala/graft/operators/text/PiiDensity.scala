package graft.operators.text

import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-source PII density report — the compliance dashboard over the
  * [[PiiRedactionRefiner]] detectors: how many documents in each
  * source carry any PII, per-kind match totals, and matches per 1k
  * tokens (the rate that stays comparable when sources have wildly
  * different document lengths). The pipeline use: a source whose PII
  * rate jumps between snapshots needs its redaction pass re-audited
  * BEFORE export, and per-source rates say where scrubbing effort
  * goes.
  *
  * Exactness: counts ride the refiner's fused single-pass kernel
  * ([[graft.plans.kernels.PiiSignals]]) and aggregate as exact
  * BIGINTs; the per-1k rate is one fixed-shape division, so the
  * DuckDB twin (independent regexp evaluation) reproduces every cell.
  *
  * Scale shape: one scan + one partial-aggregated groupBy(source) —
  * 5 longs per source per partition on the wire.
  */
final class PiiDensity(textCol: String = "text", sourceCol: String = "source") {

  val name = "pii_density"

  /** `(source, docs, docs_with_pii, email_count, ipv4_count,
    * phone_count, pii_per_1k_tokens)` per source; the rate is null for
    * a source with zero tokens.
    */
  def apply(df: DataFrame): DataFrame = {
    val withCounts = new PiiRedactionRefiner(textCol)(df)
    val anyPii = col("pii_email_count") + col("pii_ipv4_count") +
      col("pii_phone_count") > 0L
    val g = withCounts.groupBy(col(sourceCol))
      .agg(count(lit(1)).as("docs"),
        count(when(anyPii, lit(1))).as("docs_with_pii"),
        sum(col("pii_email_count")).as("email_count"),
        sum(col("pii_ipv4_count")).as("ipv4_count"),
        sum(col("pii_phone_count")).as("phone_count"),
        sum(TextFunctions.tokenCount(col(textCol))).as("_tokens"))
    val totalPii = (col("email_count") + col("ipv4_count") + col("phone_count"))
      .cast("double")
    g.select(col(sourceCol), col("docs"), col("docs_with_pii"),
        col("email_count"), col("ipv4_count"), col("phone_count"),
        when(col("_tokens") > 0L,
          round(totalPii * lit(1000.0) / col("_tokens").cast("double"), 6))
          .as("pii_per_1k_tokens"))
      .orderBy(col(sourceCol))
  }

  // ---- DuckDB twin (independent regexp evaluation over `textExpr`) ----

  def sql(table: String, textExpr: String): String = {
    val e = PiiRedaction.countOfSql(textExpr, "email")
    val i = PiiRedaction.countOfSql(textExpr, "ipv4")
    val p = PiiRedaction.countOfSql(textExpr, "phone")
    s"""WITH _pd AS (SELECT $sourceCol AS src, $e AS ec, $i AS ic, $p AS pc,
       |    ${TextFunctions.tokenCountSql(textExpr)} AS tk
       |  FROM $table),
       |_pg AS (SELECT src, count(*) AS docs,
       |    count(CASE WHEN ec + ic + pc > 0 THEN 1 END) AS docs_with_pii,
       |    CAST(sum(ec) AS BIGINT) AS email_count,
       |    CAST(sum(ic) AS BIGINT) AS ipv4_count,
       |    CAST(sum(pc) AS BIGINT) AS phone_count,
       |    CAST(sum(tk) AS BIGINT) AS tokens
       |  FROM _pd GROUP BY src)
       |SELECT src AS $sourceCol, docs, docs_with_pii, email_count,
       |  ipv4_count, phone_count,
       |  CASE WHEN tokens > 0
       |    THEN round(CAST(email_count + ipv4_count + phone_count AS DOUBLE)
       |      * 1000.0 / CAST(tokens AS DOUBLE), 6)
       |  END AS pii_per_1k_tokens
       |FROM _pg ORDER BY $sourceCol""".stripMargin
  }
}
