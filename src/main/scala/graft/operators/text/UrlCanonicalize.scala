package graft.operators.text

import graft.core.Operator
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.expr

/** URL canonicalization — the normalization pass URL-keyed dedup
  * depends on (beyond the reference's operator set; its exact-dedup
  * `include_url` mode compares raw strings, so trivially different
  * spellings of one address defeat it): lowercase scheme+host, drop
  * the fragment, drop default ports, strip tracking parameters
  * (utm_*, fbclid, gclid, ref, igshid, mc_eid), and trim a trailing
  * slash. Pure regexp/string expressions (codegen, zero shuffle).
  *
  * The patterns are RE2-compatible (no lookarounds), so the DuckDB
  * twin evaluates the SAME regexes; the two engines differ only in
  * replacement backreference syntax ($1 vs \1) and DuckDB's explicit
  * 'g' flag, which [[canonicalSqlFor]] parameterizes.
  */
object UrlCanonicalize {

  private val SchemeHost = "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*"
  private val Tracking = "(utm_[^&#=]*|fbclid|gclid|ref|igshid|mc_eid)"

  /** Spark SQL form (expression text; also valid inside `expr`). */
  def canonicalSqlSpark(u: String): String = canonicalSqlFor(u, sparkSyntax = true)

  /** DuckDB twin of the same transformation. */
  def canonicalSql(u: String): String = canonicalSqlFor(u, sparkSyntax = false)

  private def canonicalSqlFor(u: String, sparkSyntax: Boolean): String = {
    val g = if (sparkSyntax) "" else ", 'g'"
    def refs(n: Int) = (1 to n).map(i => if (sparkSyntax) s"$$$i" else s"\\$i").mkString
    // 1. fragment off
    val noFrag = s"regexp_replace($u, '#.*', ''$g)"
    // 2. lowercase scheme://host[:port], leave path/query casing alone
    val pfx = s"regexp_extract($noFrag, '$SchemeHost', 0)"
    val lowered = s"(lower($pfx) || substring($noFrag, length($pfx) + 1))"
    // 3. default ports (both capture groups re-emitted: host, then the
    //    optional path/query tail — RE2-safe, no lookarounds)
    val dropPorts =
      s"regexp_replace(regexp_replace($lowered, " +
        s"'^(http://[^/?#]*):80([/?#].*)?$$', '${refs(2)}'$g), " +
        s"'^(https://[^/?#]*):443([/?#].*)?$$', '${refs(2)}'$g)"
    // 4. tracking params off (their leading separator is the capture,
    //    re-emitted so later params keep a separator), then '?&' and
    //    trailing '?'/'&' artifacts cleaned
    val noTrack = s"regexp_replace($dropPorts, '([?&])$Tracking=[^&#]*', '${refs(1)}'$g)"
    // consecutive removals leave '&' runs and '?&' heads; collapse both
    val cleaned = s"regexp_replace(replace(regexp_replace($noTrack, '&&+', '&'$g), " +
      s"'?&', '?'), '[?&]+$$', ''$g)"
    // 5. trailing slash — at the end of the path before a query ('/[?]'
    //    — a character class, so neither engine needs escape games) and
    //    at the end of the URL (also canonicalizes the bare-host root)
    val slashQ = s"regexp_replace($cleaned, '/[?]', '?'$g)"
    s"(CASE WHEN $slashQ LIKE '%/' AND $slashQ NOT LIKE '%://' " +
      s"THEN substring($slashQ, 1, length($slashQ) - 1) ELSE $slashQ END)"
  }
}

/** Adds `url_canonical` from the raw URL column (null-safe: null → null). */
final class UrlCanonicalizeRefiner(
    urlCol: String = "url",
    outputCol: String = "url_canonical") extends Operator {
  val name = "url_canonicalize"
  def apply(df: DataFrame): DataFrame =
    df.withColumn(outputCol, expr(UrlCanonicalize.canonicalSqlSpark(urlCol)))
}
