package graft

import graft.operators.vector.Pca
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PcaSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private lazy val emb = table("embeddings")
  private val D = 64

  test("moments: partition-order invariant (exact integer adds)") {
    val a = Pca.moments(emb.coalesce(1), "embedding", D).head()
    val b = Pca.moments(emb.repartition(17), "embedding", D).head()
    assert(a.getLong(0) == b.getLong(0))
    assert(a.getSeq[Long](1) == b.getSeq[Long](1))
    assert(a.getSeq[Long](2) == b.getSeq[Long](2))
  }

  test("moments: a by-hand replay of the scaled sums matches the aggregate") {
    val rows = emb.limit(20).select(col("embedding").cast("array<double>"))
      .collect().map(_.getSeq[Double](0).toArray)
    val scale = Pca.DefaultScale.toDouble
    val xs = rows.map(_.map(x => math.floor(x * scale).toLong))
    val m = Pca.moments(emb.limit(20), "embedding", D).head()
    assert(m.getLong(0) == rows.length.toLong)
    val sums = m.getSeq[Long](1)
    assert((0 until D).forall(i => sums(i) == xs.map(_(i)).sum))
    val prods = m.getSeq[Long](2)
    val (is, js) = Pca.pairIndices(D)
    (0 until prods.length by 97).foreach { p =>
      val want = xs.map(r => r(is(p)) * r(js(p))).sum
      assert(prods(p) == want, s"pair (${is(p)},${js(p)})")
    }
  }

  test("fit: components are orthonormal, eigenvalues descending and variance-consistent") {
    val model = Pca.fit(emb, "embedding", D, q = 8)
    assert(model.components.length == 8)
    for (a <- 0 until 8; b <- a until 8) {
      val dot = (0 until D).map(i => model.components(a)(i) * model.components(b)(i)).sum
      if (a == b) assert(math.abs(dot - 1.0) < 1e-9, s"norm of $a: $dot")
      else assert(math.abs(dot) < 1e-9, s"<$a,$b> = $dot")
    }
    val ev = model.eigenvalues
    assert(ev.zip(ev.tail).forall { case (x, y) => x >= y - 1e-12 }, ev.toSeq.toString)
    assert(ev.head > 0)
    // projected variance along component k equals its eigenvalue
    val proj = Pca.project(emb, "embedding", model)
    val v1 = proj.select(element_at(col("embedding_pca"), 1).as("p"))
      .agg((sum(col("p") * col("p")) / count(lit(1))
        - pow(sum(col("p")) / count(lit(1)), 2)).as("v"))
      .as[Double].head()
    assert(math.abs(v1 - ev(0)) < 1e-6 * math.max(1.0, ev(0)), s"var $v1 vs eig ${ev(0)}")
  }

  test("fit is deterministic: two fits agree bit-for-bit") {
    val m1 = Pca.fit(emb, "embedding", D, q = 4)
    val m2 = Pca.fit(emb.repartition(13), "embedding", D, q = 4)
    assert(m1.components.map(_.toSeq).toSeq == m2.components.map(_.toSeq).toSeq)
    assert(m1.eigenvalues.toSeq == m2.eigenvalues.toSeq)
  }

  test("project: matches a driver-side replay with the same fold order") {
    val model = Pca.fit(emb, "embedding", D, q = 3)
    val got = Pca.project(emb.limit(5), "embedding", model)
      .select(col("vec_id"), col("embedding").cast("array<double>"), col("embedding_pca"))
      .collect()
    got.foreach { r =>
      val x = r.getSeq[Double](1)
      val p = r.getSeq[Double](2)
      model.components.zipWithIndex.foreach { case (c, j) =>
        var acc = 0.0
        var i = 0
        while (i < D) { acc += x(i) * c(i); i += 1 }
        assert(p(j) == acc - model.offsets(j), s"vec ${r.getLong(0)} comp $j")
      }
    }
  }

  test("pca beats random projection at equal width on captured variance") {
    // variance captured along the top-8 PCA directions vs 8 random
    // UNIT directions: the data-adaptive basis must capture strictly
    // more (per-direction variance normalized by the direction's norm²
    // so the bases compare on equal footing)
    val model = Pca.fit(emb, "embedding", D, q = 8)
    def dirVars(df: org.apache.spark.sql.DataFrame, colName: String,
        norms2: Seq[Double]): Double =
      (1 to 8).map { i =>
        df.select(element_at(col(colName), i).as("p"))
          .agg((sum(col("p") * col("p")) / count(lit(1))
            - pow(sum(col("p")) / count(lit(1)), 2)).as("v"))
          .as[Double].head() / norms2(i - 1)
      }.sum
    val pcaVar = dirVars(Pca.project(emb, "embedding", model),
      "embedding_pca", Seq.fill(8)(1.0))
    val rp = new graft.operators.vector.RandomProjection(
      vecCol = "embedding", inDims = D, outDims = 8, seed = 11L)
    val rpNorms2 = rp.planes.map(p => p.map(x => x * x).sum).toSeq
    val rpVar = dirVars(rp(emb), "embedding_projected", rpNorms2)
    assert(pcaVar > rpVar, s"pca $pcaVar must exceed random $rpVar")
  }

  test("registry pca_projection: fits on the input and caches the model per frame") {
    val op = graft.runner.OperatorRegistry.create("pca_projection",
      graft.runner.Params(Map("components" -> 4, "dims" -> 64)))
    val out = op(emb)
    assert(out.select(size(col("embedding_pca"))).distinct().as[Int].collect().toSeq == Seq(4))
    // two applies over the SAME frame reuse the fit (reference equality
    // cache) — outputs identical
    val a = op(emb).select(col("vec_id"), col("embedding_pca")).collect().toSeq
    val b = op(emb).select(col("vec_id"), col("embedding_pca")).collect().toSeq
    assert(a == b)
  }

  test("fit: full-rank components reconstruct the moment-derived covariance") {
    // the eigen step's independent cross-check (VERDICT r17 #1): with
    // q = D the spectral decomposition must reproduce the covariance
    // the moments define — Σ_k λ_k v_k v_kᵀ == cov entrywise within
    // Jacobi tolerance. Together with the hash-checked moments
    // (embedding_covariance) and the oracle-gated projection, this
    // closes the loop on the driver-side eigendecomposition.
    val row = Pca.moments(emb, "embedding", D).head()
    val n = row.getLong(0)
    val sums = row.getSeq[Long](1); val prods = row.getSeq[Long](2)
    val sc = Pca.DefaultScale.toDouble
    val mean = Array.tabulate(D)(i => sums(i) / sc / n)
    val cov = Array.ofDim[Double](D, D)
    var p = 0
    for (i <- 0 until D; j <- i until D) {
      val e = prods(p) / (sc * sc) / n - mean(i) * mean(j)
      cov(i)(j) = e; cov(j)(i) = e; p += 1
    }
    val model = Pca.fit(emb, "embedding", D, q = D)
    val maxAbs = cov.map(_.map(math.abs).max).max
    for (i <- 0 until D; j <- 0 until D) {
      val r = (0 until D).map(k =>
        model.eigenvalues(k) * model.components(k)(i) * model.components(k)(j)).sum
      assert(math.abs(r - cov(i)(j)) < 1e-9 * math.max(1.0, maxAbs),
        s"cov($i,$j): reconstructed $r vs ${cov(i)(j)}")
    }
  }

  test("pca_project oracle: rendered per scale dir with the fitted literals") {
    // the gate's twin is DATA-DEPENDENT (oracleFor): absent from the
    // static map, present in the Verify-time rendering, and carrying
    // the fitted components as shortest-round-trip literals
    assert(!SparkEntry.oracleSql.contains("pca_project"))
    val sql = SparkEntry.oracleSqlFor(spark, sfDir)("pca_project")
    assert(sql.contains("_pca") && sql.contains("ORDER BY vec_id"), sql.take(200))
    val model = Pca.fit(emb, "embedding", D, q = 8)
    assert(sql.contains(s"CAST('${model.components(0)(0).toString}' AS DOUBLE)"),
      "the first fitted component literal must appear verbatim")
    assert(sql.contains(model.offsets(7).toString),
      "the last mean offset literal must appear verbatim")
  }

  test("whitening: unit variance per component, decorrelated, eps floor on degenerate directions") {
    val model = Pca.whitened(Pca.fit(emb, "embedding", D, q = 4))
    val w = Pca.project(emb, "embedding", model, "w")
      .select((1 to 4).map(i => element_at(col("w"), i).as(s"w$i")): _*)
    val stats = w.agg(
      expr("avg(w1)"), expr("avg(w2)"), expr("avg(w3)"), expr("avg(w4)"),
      expr("avg(w1*w1)"), expr("avg(w2*w2)"), expr("avg(w3*w3)"), expr("avg(w4*w4)"),
      expr("avg(w1*w2)"), expr("avg(w1*w3)"), expr("avg(w2*w3)"), expr("avg(w3*w4)"))
      .head()
    def g(i: Int) = stats.getDouble(i)
    // population variance: E[w²] − E[w]² == 1 per component
    (0 until 4).foreach { k =>
      val v = g(4 + k) - g(k) * g(k)
      assert(math.abs(v - 1.0) < 1e-6, s"component $k variance $v")
    }
    // covariance between distinct components == 0
    val covs = Seq((0, 1, 8), (0, 2, 9), (1, 2, 10), (2, 3, 11))
    covs.foreach { case (a, b, idx) =>
      val c = g(idx) - g(a) * g(b)
      assert(math.abs(c) < 1e-6, s"cov($a,$b) = $c")
    }
    // degenerate direction: λ = 0 takes the eps floor, never 1/0
    val degenerate = Pca.PcaModel(Array.fill(2)(0.0),
      Array(Array(1.0, 0.0), Array(0.0, 1.0)), Array(4.0, 0.0))
    val wm = Pca.whitened(degenerate)
    assert(wm.components(0)(0) == 0.5)
    assert(wm.components(1)(1) == 1.0 / math.sqrt(1e-12) &&
      !wm.components(1)(1).isInfinite)
  }

  test("moment rows merge exactly: per-epoch artifacts fold to the one-pass moments; fit identical") {
    val direct = Pca.moments(emb, "embedding", D).head()
    val epochRows = Pca.momentsBy(emb, "embedding", D, col("vec_id") % 3)
      .collect().map(r => (r.getLong(1), r.getSeq[Long](2), r.getSeq[Long](3)))
    assert(epochRows.length == 3)
    val (n, sums, prods) = Pca.mergeMomentRows(epochRows.toSeq, D)
    assert(n == direct.getLong(0))
    assert(sums.toSeq == direct.getSeq[Long](1))
    assert(prods.toSeq == direct.getSeq[Long](2))
    val m1 = Pca.fitFromMoments(n, sums, prods, D, q = 4)
    val m2 = Pca.fit(emb, "embedding", D, q = 4)
    assert(m1.components.map(_.toSeq).toSeq == m2.components.map(_.toSeq).toSeq)
    assert(m1.eigenvalues.toSeq == m2.eigenvalues.toSeq)
  }

  test("registry pca_projection: whiten param scales by the fitted spectrum") {
    val op = graft.runner.OperatorRegistry.create("pca_projection",
      graft.runner.Params(Map("components" -> 2, "dims" -> 64, "whiten" -> true)))
    val got = op(emb).select(col("vec_id"), col("embedding_pca")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val model = Pca.whitened(Pca.fit(emb, "embedding", D, q = 2))
    val want = Pca.project(emb, "embedding", model).select(col("vec_id"), col("embedding_pca"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(got == want)
  }

  test("pca_projection disposition: fits on alive rows only; dead rows NULL; empty input degrades to NULL column") {
    val op = new graft.operators.vector.PcaProjection(
      vecCol = "embedding", dims = 64, q = 2)
    val alive = col("vec_id") % 2 === 0
    val gated = op.applyGated(emb, alive)
      .select(col("vec_id"), col("embedding_pca")).collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    // dead rows carry NULL
    assert(gated.filter(_._1 % 2 == 1).values.forall(_.isEmpty))
    // alive rows equal a projection under a model fit on the alive
    // slice alone — NOT the full-frame fit
    val aliveModel = Pca.fit(emb.filter(alive), "embedding", D, q = 2)
    val want = Pca.project(emb.filter(alive), "embedding", aliveModel)
      .select(col("vec_id"), col("embedding_pca")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    gated.filter(_._1 % 2 == 0).foreach { case (id, v) =>
      assert(v.map(_.asInstanceOf[scala.collection.Seq[Double]].toSeq)
        == Some(want(id).toSeq), s"vec $id")
    }
    val fullModel = Pca.fit(emb, "embedding", D, q = 2)
    assert(aliveModel.components(0).toSeq != fullModel.components(0).toSeq,
      "the fixture must distinguish the alive-only fit from the full fit")
    // empty / all-null input: NULL column, never a fit error
    val none = op(emb.filter(lit(false)))
    assert(none.count() == 0 && none.columns.contains("embedding_pca"))
    val allDead = op.applyGated(emb.limit(5), lit(false))
      .select(col("embedding_pca")).collect()
    assert(allDead.forall(_.isNullAt(0)))
  }

  test("q operating point: chosen = smallest k at target, maxQ fallback, full-rank cum ratio reaches 1") {
    val rep = Pca.qOperatingPoint(emb, "embedding", D, maxQ = 8, targetVar = 0.1)
      .collect().sortBy(_.getLong(0))
    assert(rep.length == 8)
    val chosen = rep.filter(_.getBoolean(4))
    assert(chosen.length == 1, "exactly one chosen row")
    val k = chosen.head.getLong(0)
    assert(rep.filter(_.getLong(0) < k).forall(_.getDouble(3) < 0.1),
      "every width below chosen misses the target")
    assert(chosen.head.getDouble(3) >= 0.1, "chosen reaches the target")
    assert(rep.map(_.getDouble(3)).sliding(2).forall(p => p(0) <= p(1)),
      "cumulative ratio is monotone")
    // unreachable target: the conservative fallback keeps all maxQ
    // (a LOSSY reduction must not silently shrink below the offer)
    val fb = Pca.qOperatingPoint(emb, "embedding", D, maxQ = 4, targetVar = 0.99)
      .collect()
    assert(fb.filter(_.getBoolean(4)).map(_.getLong(0)).toSeq == Seq(4L))
    // full rank: the spectrum must account for the WHOLE trace — the
    // eigen-side Σλ and the independent integer-micro-unit trace agree
    val full = Pca.qOperatingPoint(emb, "embedding", D, maxQ = D, targetVar = 2.0)
      .collect().sortBy(_.getLong(0))
    assert(math.abs(full.last.getDouble(3) - 1.0) < 1e-6,
      s"cum ratio at q=d reads ${full.last.getDouble(3)}")
  }

  test("jacobi: recovers a known spectrum") {
    // diag(5, 2, 1) rotated by a fixed orthogonal matrix
    val theta = 0.6
    val c = math.cos(theta); val s = math.sin(theta)
    val r = Array(Array(c, -s, 0.0), Array(s, c, 0.0), Array(0.0, 0.0, 1.0))
    val dvals = Array(5.0, 2.0, 1.0)
    val m = Array.tabulate(3, 3) { (i, j) =>
      (0 until 3).map(k => r(i)(k) * dvals(k) * r(j)(k)).sum
    }
    val (vals, _) = Pca.jacobiEigen(m)
    assert(vals.sorted.reverse.zip(Array(5.0, 2.0, 1.0))
      .forall { case (a, b) => math.abs(a - b) < 1e-10 }, vals.toSeq.toString)
  }
}
