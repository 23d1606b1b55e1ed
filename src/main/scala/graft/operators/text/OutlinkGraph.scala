package graft.operators.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Outlink extraction + host-level link graph — the step between the
  * HTML extractor (S3) and the graph family (domain PageRank): pull
  * `href` targets out of raw page HTML, reduce them to hosts, and
  * aggregate the host→host edge list whose weights seed link-authority
  * scoring (the reference's URL filters consume exactly this kind of
  * domain signal; see /root/reference/mega_data_factory/operators/
  * url_filter.py for the consuming side).
  *
  * Everything is builtin Column regexp (whole-stage codegen, no UDF);
  * the aggregate is a plain (src, dst) groupBy — map-side partial
  * combine, one shuffle bounded by the DISTINCT edge count, not the
  * page count, which is what makes a 100 TB crawl's link graph (~10⁹
  * distinct host pairs vs ~10¹¹ anchors) tractable.
  */
object OutlinkGraph {

  /** All `href="…"` targets of an HTML string, document order. */
  def hrefs(html: Column): Column =
    regexp_extract_all(html, lit("href=\"([^\"]+)\""), lit(1))

  /** Host of an absolute http(s) URL; '' when not absolute http(s). */
  def host(url: Column): Column =
    regexp_extract(url, "^https?://([^/]+)", 1)

  /** Host-level weighted edge list `(src_host, dst_host, n)`:
    * `df.htmlCol` pages attributed to `df.srcHostCol`, self-links kept
    * (they're a real signal: template navs), non-absolute targets
    * dropped.
    */
  def edges(df: DataFrame, htmlCol: String, srcHostCol: String): DataFrame =
    df.select(col(srcHostCol).as("src_host"),
        explode(hrefs(col(htmlCol))).as("_u"))
      .select(col("src_host"), host(col("_u")).as("dst_host"))
      .where(col("dst_host") =!= "")
      .groupBy(col("src_host"), col("dst_host"))
      .agg(count(lit(1)).as("n"))

  /** DuckDB twin of [[edges]] over `pages(src_host, html)`. */
  def edgesSql(pagesCte: String): String =
    s"""SELECT src_host, dst_host, count(*) AS n FROM (
       |  SELECT src_host,
       |         regexp_extract(u, '^https?://([^/]+)', 1) AS dst_host
       |  FROM (SELECT src_host,
       |               unnest(regexp_extract_all(html, 'href="([^"]+)"', 1)) AS u
       |        FROM ($pagesCte)))
       |WHERE dst_host <> ''
       |GROUP BY src_host, dst_host""".stripMargin
}
