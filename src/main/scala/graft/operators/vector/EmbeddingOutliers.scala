package graft.operators.vector

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distance-based embedding outlier detection — the "drop mislabeled /
  * noise vectors before training" curation step: each vector's squared-L2
  * distance to its NEAREST fixed centroid is compared against its own
  * cluster's mean distance; rows beyond `ratio ×` the cluster mean are
  * flagged. (SemDeDup-adjacent: where semantic dedup removes the
  * too-SIMILAR, this removes the too-FAR — decode failures, wrong-modality
  * rows, embedding-model regressions all land in the far tail.)
  *
  * Exactness discipline: the per-row distance is one fixed left-to-right
  * double fold (the [[graft.plans.kernels.NearestCentroidDist]] kernel,
  * bit-equal to the DuckDB list_reduce twin); the CLUSTER statistics use
  * `floor(dist·scale)` BIGINTs so the mean is an exact integer sum, and
  * the outlier rule itself is pure integer arithmetic
  * (`scaled · n > ratio · Σscaled`) — no floating-point reduction
  * anywhere, so the flagged set is partition-invariant and
  * engine-portable.
  *
  * Scale shape: per-row map (centroids ride the closure) + one
  * partial-aggregated groupBy on cluster id (two longs per cluster per
  * partition on the wire) + one broadcast-sized join back. No windows,
  * no pair joins.
  */
final class EmbeddingOutliers(
    vecCol: String = "embedding",
    idCol: String = "vec_id",
    centroids: Seq[Seq[Double]],
    ratio: Long = 2L,
    scale: Double = 1e9) {

  val name = "embedding_outliers"

  /** `(idCol, cluster_id, dist2, is_outlier)` for every row. */
  def apply(df: DataFrame): DataFrame = {
    val assigned = df.select(col(idCol).as("_id"),
      graft.plans.kernels.nearest_centroid(col(vecCol), centroids)
        .cast("long").as("cluster_id"),
      floor(graft.plans.kernels.nearest_centroid_dist(col(vecCol), centroids) * lit(scale))
        .cast("long").as("_ds"))
    val stats = assigned.groupBy(col("cluster_id"))
      .agg(count(lit(1)).as("_n"), sum(col("_ds")).as("_sum"))
    assigned.join(stats, Seq("cluster_id"))
      .select(col("_id").as(idCol), col("cluster_id"),
        round(col("_ds").cast("double") / lit(scale), 6).as("dist2"),
        (col("_ds") * col("_n") > lit(ratio) * col("_sum")).cast("long").as("is_outlier"))
  }

  // ---- DuckDB twin ----

  private def l2sqSql(a: String, b: String): String =
    graft.functions.VectorFunctions.l2sqSql(a, b)

  /** Full twin. Centroids are derived IN SQL as the first `k` rows by
    * `idCol` (0-based index order — exactly [[graft.operators.ml
    * .KMeansBuckets.firstKCentroids]], which gate callers pass to the
    * Spark side), then the same floor-scaled integer statistics and the
    * same integer outlier rule.
    */
  def sql(table: String): String = {
    val k = centroids.size
    s"""WITH _cent AS (SELECT CAST(row_number() OVER (ORDER BY $idCol) - 1 AS BIGINT) AS _cid,
       |    $vecCol AS _ce
       |  FROM (SELECT $idCol, $vecCol FROM $table ORDER BY $idCol LIMIT $k)),
       |_dists AS (SELECT t.$idCol AS id, c._cid,
       |    ${l2sqSql(s"t.$vecCol", "c._ce")} AS _d,
       |    row_number() OVER (PARTITION BY t.$idCol
       |      ORDER BY ${l2sqSql(s"t.$vecCol", "c._ce")}, c._cid) AS _rn
       |  FROM $table t CROSS JOIN _cent c),
       |_a AS (SELECT id, CAST(_cid AS BIGINT) AS cluster_id,
       |    CAST(floor(_d * $scale) AS BIGINT) AS ds FROM _dists WHERE _rn = 1),
       |_st AS (SELECT cluster_id, count(*) AS n, CAST(sum(ds) AS BIGINT) AS s
       |  FROM _a GROUP BY cluster_id)
       |SELECT a.id AS $idCol, a.cluster_id,
       |  round(CAST(a.ds AS DOUBLE) / $scale, 6) AS dist2,
       |  CAST(a.ds * st.n > $ratio * st.s AS BIGINT) AS is_outlier
       |FROM _a a JOIN _st st ON st.cluster_id = a.cluster_id
       |ORDER BY $idCol""".stripMargin
  }
}
