package graft.operators.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Simplified (centroid-based) silhouette score per cluster — the
  * clustering-quality readout for the k-means buckets that drive
  * semantic dedup and IVF ANN: for each point, `a` = squared-L2 to its
  * own (nearest) centroid, `b` = to the second-nearest, and
  * `s = (b − a) / max(a, b)` in [-1, 1] (simplified silhouette —
  * Hruschka et al. 2004 — the O(n·k) form of Rousseeuw's O(n²)
  * original; with nearest-centroid assignment, a ≤ b always, so s ≥ 0
  * and low per-cluster means flag buckets whose members sit on the
  * boundary: bad buckets for dedup recall). Reported per cluster so a
  * single collapsed/overlapping bucket is visible instead of averaged
  * away.
  *
  * Exactness discipline: distances are the same left-to-right double
  * fold the k-means gates pin ([[KMeansBuckets.assignCteSql]]); the
  * per-cluster mean is a floor-scaled BIGINT sum over per-row
  * fixed-shape doubles, so any engine reproduces it bit-for-bit.
  *
  * Scale shape: a pure per-row map against broadcast centroids (k×dim
  * doubles in the closure) + one partial-aggregated groupBy(cluster) —
  * the same wire shape as a k-means update step.
  */
final class ClusterSilhouette(vecCol: String = "embedding", k: Int = 8) {

  val name = "cluster_silhouette"

  /** Squared-L2 to one fixed centroid, as the exact element-order fold
    * (matches the DuckDB `list_reduce` twin).
    */
  private def l2sq(v: Column, centroid: Seq[Double]): Column =
    aggregate(
      zip_with(v, typedlit(centroid), (x, c) => (x - c) * (x - c)),
      lit(0.0), (acc, x) => acc + x)

  /** Per-cluster `(cluster_id, n, mean_silhouette)` against
    * caller-supplied fixed centroids (train with
    * [[KMeansBuckets.fit]]/[[KMeansBuckets.firstKCentroids]]).
    * `cluster_id` is the centroid INDEX (ties → lowest, matching
    * [[graft.plans.kernels.nearest_centroid]]) unless `clusterIds`
    * relabels centroid j — pass the centroid rows' ids to line up with
    * the [[KMeansBuckets.assignCteSql]] `_cid` convention.
    */
  def apply(df: DataFrame, centroids: Seq[Seq[Double]],
      clusterIds: Option[Seq[Long]] = None): DataFrame = {
    require(centroids.size == k, s"expected $k centroids, got ${centroids.size}")
    require(centroids.map(_.size).distinct.size == 1, "centroid dims must agree")
    clusterIds.foreach(ids => require(ids.size == k, s"expected $k cluster ids"))
    val dim = centroids.head.size
    val v = col(vecCol).cast("array<double>")
    val dists = array(centroids.map(c => l2sq(v, c)): _*)
    val sorted = array_sort(dists)
    val a = element_at(sorted, 1)
    val b = element_at(sorted, 2)
    val s = when(greatest(a, b) > 0d, (b - a) / greatest(a, b)).otherwise(lit(0.0))
    // the assigned index comes from the SAME distance array (first
    // position of the minimum — ties to the lowest index, exactly the
    // nearest_centroid kernel's rule) so each row pays ONE k×dim
    // distance pass, not two
    val idx1 = array_position(dists, a) // 1-based
    val label = clusterIds match {
      case Some(ids) => element_at(typedlit(ids), idx1.cast("int"))
      case None => (idx1 - 1).cast("long")
    }
    // silhouette of a malformed vector is meaningless, and the engines
    // disagree on how a dimension-mismatched distance degenerates —
    // exclude such rows EXPLICITLY on both sides instead
    df.where(v.isNotNull && size(v) === lit(dim))
      .select(label.as("cluster_id"), s.as("_s"))
      .groupBy(col("cluster_id"))
      .agg(count(lit(1)).as("n"),
        round(sum(floor(col("_s") * lit(1e9)).cast("long")).cast("double") /
          (count(lit(1)).cast("double") * lit(1e9)), 6).as("mean_silhouette"))
      .orderBy(col("cluster_id"))
  }

  // ---- DuckDB twin: centroids derived IN SQL (first-k rows by id, the
  // [[KMeansBuckets.assignCteSql]] discipline), a/b off the same
  // row_number the assignment gate pins ----

  private def l2sqSql(a: String, b: String): String =
    s"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), " +
      s"list_transform(range(1, len($a) + 1), " +
      s"i -> (CAST($a[i] AS DOUBLE) - CAST($b[i] AS DOUBLE)) * (CAST($a[i] AS DOUBLE) - CAST($b[i] AS DOUBLE)))), " +
      s"(acc, x) -> acc + x)"

  /** `dim` must match the centroid dimensionality the Spark side uses
    * (rows with a different vector length are excluded on both sides).
    */
  def sql(table: String, idCol: String, dim: Int = 64): String =
    s"""WITH _cent AS (SELECT $idCol AS _cid, $vecCol AS _ce FROM $table
       |  ORDER BY $idCol LIMIT $k),
       |_sd AS (SELECT t.$idCol AS id, c._cid,
       |    ${l2sqSql(s"t.$vecCol", "c._ce")} AS d,
       |    row_number() OVER (PARTITION BY t.$idCol
       |      ORDER BY ${l2sqSql(s"t.$vecCol", "c._ce")}, c._cid) AS _rn
       |  FROM $table t CROSS JOIN _cent c
       |  WHERE t.$vecCol IS NOT NULL AND len(t.$vecCol) = $dim),
       |_ab AS (SELECT id,
       |    max(CASE WHEN _rn = 1 THEN _cid END) AS cluster_id,
       |    max(CASE WHEN _rn = 1 THEN d END) AS a,
       |    max(CASE WHEN _rn = 2 THEN d END) AS b
       |  FROM _sd GROUP BY id),
       |_sil AS (SELECT cluster_id,
       |    CASE WHEN greatest(a, b) > 0 THEN (b - a) / greatest(a, b)
       |      ELSE 0.0 END AS s
       |  FROM _ab)
       |SELECT CAST(cluster_id AS BIGINT) AS cluster_id,
       |  count(*) AS n,
       |  round(CAST(CAST(sum(CAST(floor(s * 1e9) AS BIGINT)) AS BIGINT) AS DOUBLE)
       |    / (CAST(count(*) AS DOUBLE) * 1e9), 6) AS mean_silhouette
       |FROM _sil GROUP BY cluster_id ORDER BY cluster_id""".stripMargin
}
