package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One gate-checked query: a Spark implementation and (when SQL-expressible)
  * the equivalent DuckDB SQL the driver runs as oracle. Column names and row
  * order must match between the two (the driver hash-compares values with
  * columns sorted by name).
  */
final case class OracleQuery(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])
