package graft.operators.table

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{NumericType, StringType}

/** Single-pass column profiler — the data-quality report a pipeline runs
  * before committing a new corpus snapshot (row counts, null ratios,
  * cardinalities, ranges per column). One `agg` over the table computes
  * every statistic; the long (column-per-row) shape comes from a stack
  * of the aggregated struct, so the table is scanned ONCE however many
  * columns are profiled.
  *
  * Scale shape: count/min/max partial-aggregate map-side; the exact
  * `count(DISTINCT)` per column plans as one Expand(×n_cols) + a single
  * hash aggregate — exact because the oracle demands it; at 10¹¹ rows
  * swap `exact = false` for `approx_count_distinct` (HLL++, no Expand)
  * with everything else unchanged.
  */
object ColumnProfiler {

  def profile(df: DataFrame, cols: Seq[String], exact: Boolean = true): DataFrame = {
    val aggs = cols.flatMap { c =>
      val f = df.schema(c)
      val (mn, mx) = f.dataType match {
        case _: NumericType =>
          (min(col(c)).cast("double"), max(col(c)).cast("double"))
        case _ => (lit(null).cast("double"), lit(null).cast("double"))
      }
      val (ms, xs) = f.dataType match {
        case StringType => (min(col(c)), max(col(c)))
        case _          => (lit(null).cast("string"), lit(null).cast("string"))
      }
      val nd = if (exact) count_distinct(col(c)) else approx_count_distinct(col(c))
      Seq(
        count(col(c)).as(s"${c}__nn"),
        nd.as(s"${c}__dc"),
        mn.as(s"${c}__mn"),
        mx.as(s"${c}__mx"),
        ms.as(s"${c}__ms"),
        xs.as(s"${c}__xs"))
    }
    val wide = df.agg(count(lit(1)).as("__rows"), aggs: _*)
    val stacked = cols.map { c =>
      s"'$c', `${c}__nn`, `${c}__dc`, `${c}__mn`, `${c}__mx`, `${c}__ms`, `${c}__xs`"
    }.mkString(", ")
    wide.selectExpr(
      "__rows",
      s"stack(${cols.size}, $stacked) AS (column_name, n_non_null, n_distinct, min_num, max_num, min_str, max_str)")
      .select(
        col("column_name"),
        col("__rows").as("n_rows"),
        (col("__rows") - col("n_non_null")).as("n_nulls"),
        col("n_distinct"),
        col("min_num"), col("max_num"), col("min_str"), col("max_str"))
  }

  /** DuckDB twin: one SELECT per column, UNION ALL — the oracle pays the
    * multi-scan; the Spark side above is the one-scan plan.
    */
  def sql(table: String, cols: Seq[(String, Boolean)]): String =
    cols.map { case (c, numeric) =>
      val mn = if (numeric) s"CAST(min($c) AS DOUBLE)" else "CAST(NULL AS DOUBLE)"
      val mx = if (numeric) s"CAST(max($c) AS DOUBLE)" else "CAST(NULL AS DOUBLE)"
      val ms = if (!numeric) s"min($c)" else "CAST(NULL AS VARCHAR)"
      val xs = if (!numeric) s"max($c)" else "CAST(NULL AS VARCHAR)"
      s"""SELECT '$c' AS column_name, count(*) AS n_rows,
         |  count(*) - count($c) AS n_nulls, count(DISTINCT $c) AS n_distinct,
         |  $mn AS min_num, $mx AS max_num, $ms AS min_str, $xs AS max_str
         |FROM $table""".stripMargin
    }.mkString("\nUNION ALL\n") + "\nORDER BY column_name"
}
