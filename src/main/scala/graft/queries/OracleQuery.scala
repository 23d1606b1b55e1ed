package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One gate-checked query: a Spark implementation and (when SQL-expressible)
  * the equivalent DuckDB SQL the driver runs as oracle. Column names and row
  * order must match between the two (the driver hash-compares values with
  * columns sorted by name).
  *
  * `oracleFor` is the DATA-DEPENDENT twin variant (r18): a gate whose
  * oracle embeds model literals FITTED from the scale dir (the PCA
  * projection — components come out of a driver eigendecomposition, not
  * SQL) renders its SQL per (session, sfDir) at Verify time. The fit
  * must be deterministic from the data (exact-integer moments + a
  * deterministic solver), so the query's own fit and the twin's
  * literals agree to the bit. Exactly one of `oracle`/`oracleFor` is
  * set for an oracle-gated query; both None = rows-only.
  */
final case class OracleQuery(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    oracleFor: Option[(SparkSession, String) => String] = None) {
  require(oracle.isEmpty || oracleFor.isEmpty,
    s"$name: oracle and oracleFor are mutually exclusive")
}
