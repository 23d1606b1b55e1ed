package graft

import graft.operators.ml.KMeansBuckets
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Trained-model path of KMeansBuckets (the oracle gate covers the
  * fixed-centroid path): the Spark ML model's assignment must agree with
  * our kernel's argmin over the model's own centroids — two independent
  * implementations of the assignment step.
  */
class KMeansSpec extends AnyFunSuite {
  import TestSpark._

  test("trained k-means assignment matches kernel argmin over model centroids") {
    val emb = table("embeddings")
    val km = new KMeansBuckets(vecCol = "embedding", outputCol = "cluster_id",
      k = 4, seed = 7L, maxIter = 10)
    val model = km.fit(emb)
    val assigned = km.transform(emb, model)
    val viaKernel = km.assignFixed(col("embedding"), km.centroidsOf(model))
    val disagree = assigned
      .withColumn("_k", viaKernel)
      .filter(col("cluster_id") =!= col("_k")).count()
    assert(disagree == 0)
    val n = emb.count()
    assert(assigned.count() == n)
    val range = assigned.select(col("cluster_id")).distinct()
      .collect().map(_.getInt(0)).toSet
    assert(range.subsetOf((0 until 4).toSet) && range.size > 1)
  }

  test("cluster bucketing keeps every row exactly once (refiner, not a filter)") {
    val emb = table("embeddings")
    val km = new KMeansBuckets(vecCol = "embedding", k = 4, seed = 7L, maxIter = 5)
    val out = km.fitTransform(emb)
    assert(out.count() == emb.count())
    assert(out.columns.contains("cluster_id"))
  }
}
