package graft

import graft.operators.dedup.{MinHashLSHDedup, NgramJaccardDedup, SimHashDedup, TextExactDedup}
import graft.operators.text.TextLengthFilter
import graft.operators.vector.{AnnSearch, EmbeddingCosineDedup}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Algebraic properties of the dedup/filter family on the fixture tables:
  * containment between the approximate and exact near-dup operators,
  * idempotence, and complement partitioning. These are the invariants the
  * operators' scaladocs promise.
  */
class DedupSpec extends AnyFunSuite {
  import TestSpark._

  private def ids(df: DataFrame, c: String = "doc_id"): Set[Long] =
    df.select(col(c).cast("long")).collect().map(_.getLong(0)).toSet

  private lazy val docs = table("documents")
  private lazy val allIds = ids(docs)

  test("minhash LSH drops are a subset of exact n-gram Jaccard drops (same threshold)") {
    val minhash = new MinHashLSHDedup(textCol = "text", idCol = "doc_id",
      shingleWidth = 3, numHashes = 16, numBands = 4, threshold = 0.8, portableHashes = true)
    val jaccard = new NgramJaccardDedup(textCol = "text", idCol = "doc_id",
      shingleWidth = 3, threshold = 0.8)
    val minhashDrops = allIds -- ids(minhash(docs))
    val jaccardDrops = allIds -- ids(jaccard(docs))
    assert(minhashDrops.subsetOf(jaccardDrops),
      s"LSH dropped non-duplicates: ${minhashDrops -- jaccardDrops}")
    assert(jaccardDrops.nonEmpty, "fixture has no near-dups — vacuous test")
  }

  test("preCollapseExact minhash is output-identical to the direct form, incl. under replication") {
    def op(collapse: Boolean) = new MinHashLSHDedup(textCol = "text", idCol = "doc_id",
      shingleWidth = 3, numHashes = 16, numBands = 4, threshold = 0.8,
      portableHashes = true, preCollapseExact = collapse)
    // fixture as-is
    assert(ids(op(true)(docs)) == ids(op(false)(docs)))
    // 3x exact replication (the case the collapse exists for): kept set,
    // rejected representative attribution, and transitive components all match
    val big = (0 until 3).map(i => docs.withColumn("doc_id", col("doc_id") + lit(i * 1000000L)))
      .reduce(_ unionByName _)
    assert(ids(op(true)(big)) == ids(op(false)(big)))
    assert(ids(op(true).applyTransitive(big)) == ids(op(false).applyTransitive(big)))
    def repOf(o: MinHashLSHDedup) = o.rejected(big)
      .select(col("doc_id").cast("long"), col(graft.core.Rejection.ColName)("representative_id").cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(repOf(op(true)) == repOf(op(false)))
  }

  test("OPH signature: bin/min/rotation-densify matches an independent reference") {
    import spark.implicits._
    val k = 16
    // independent reference: bin by residue of the 60-bit base hash,
    // min per bin, circular right-borrow encoded d·2^56 + (base >> 4)
    def refSig(hs: Seq[Long]): Seq[Long] = {
      val raw = scala.collection.mutable.Map[Int, Long]()
      hs.foreach { h =>
        val b = (h % k).toInt
        if (!raw.contains(b) || h < raw(b)) raw(b) = h
      }
      (0 until k).map { j =>
        val d = (0 until k).find(d => raw.contains((j + d) % k)).get
        d.toLong * (1L << 56) + (raw((j + d) % k) >> 4)
      }
    }
    val op = new MinHashLSHDedup(textCol = "text", idCol = "doc_id",
      shingleWidth = 3, numHashes = k, numBands = 4, threshold = 0.8,
      portableHashes = true, signatureScheme = "oph")
    // one-shingle doc (full densification), small doc, and 20 fixture docs
    val tiny = Seq((900001L, "alpha beta gamma"),
        (900002L, "alpha beta gamma delta epsilon zeta eta"))
      .toDF("doc_id", "text")
      .unionByName(docs.select(col("doc_id"), col("text")).limit(20))
    val hs = tiny.select(col("doc_id"),
        graft.plans.kernels.shingle_hashes(col("text"), 3).as("_h"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val sigs = op.signatures(tiny).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(sigs.keySet == hs.keySet.filter(hs(_).nonEmpty))
    sigs.foreach { case (id, m) => assert(m == refSig(hs(id)), s"doc $id") }
    // the one-shingle doc has exactly one raw bin (value = base >> 4);
    // the other 15 borrow it at distinct positive distances
    val h1 = hs(900001L).head >> 4
    assert(sigs(900001L).count(_ == h1) == 1)
    assert(sigs(900001L).filter(_ != h1).forall(v => (v - h1) % (1L << 56) == 0))
    assert(sigs(900001L).distinct.size == k)
  }

  test("OPH minhash drops are a subset of exact Jaccard drops; scheme validated") {
    val oph = new MinHashLSHDedup(textCol = "text", idCol = "doc_id",
      shingleWidth = 3, numHashes = 16, numBands = 4, threshold = 0.8,
      portableHashes = true, signatureScheme = "oph")
    val jaccard = new NgramJaccardDedup(textCol = "text", idCol = "doc_id",
      shingleWidth = 3, threshold = 0.8)
    val ophDrops = allIds -- ids(oph(docs))
    val jaccardDrops = allIds -- ids(jaccard(docs))
    assert(ophDrops.subsetOf(jaccardDrops),
      s"OPH dropped non-duplicates: ${ophDrops -- jaccardDrops}")
    assert(ophDrops.nonEmpty, "OPH caught no fixture near-dups — vacuous test")
    assertThrows[IllegalArgumentException](new MinHashLSHDedup(
      textCol = "text", idCol = "doc_id", signatureScheme = "bogus"))
  }

  test("capped near-dup configs only ever keep MORE rows (caps remove candidates)") {
    val capped = new MinHashLSHDedup(textCol = "text", idCol = "doc_id",
      shingleWidth = 3, numHashes = 16, numBands = 4, threshold = 0.8,
      portableHashes = true, maxBucketSize = Some(3))
    val uncapped = new MinHashLSHDedup(textCol = "text", idCol = "doc_id",
      shingleWidth = 3, numHashes = 16, numBands = 4, threshold = 0.8, portableHashes = true)
    assert(ids(uncapped(docs)).subsetOf(ids(capped(docs))))

    val jCapped = new NgramJaccardDedup(textCol = "text", idCol = "doc_id",
      shingleWidth = 3, threshold = 0.8, maxDocFreq = Some(3))
    val jUncapped = new NgramJaccardDedup(textCol = "text", idCol = "doc_id",
      shingleWidth = 3, threshold = 0.8)
    assert(ids(jUncapped(docs)).subsetOf(ids(jCapped(docs))))

    // simhash near-dedup (r17): the (block, value) hot-bucket drop —
    // a cap of 1 disables every pair (every pair needs a shared bucket
    // of >= 2), a huge cap is a no-op
    val sUncapped = new graft.operators.dedup.SimHashNearDedup(textCol = "text", idCol = "doc_id",
      bits = 60, k = 3)
    val sCapped = new graft.operators.dedup.SimHashNearDedup(textCol = "text", idCol = "doc_id",
      bits = 60, k = 3, maxBucketSize = Some(2))
    assert(ids(sUncapped(docs)).subsetOf(ids(sCapped(docs))))
    assert(ids(new graft.operators.dedup.SimHashNearDedup(textCol = "text", idCol = "doc_id",
      bits = 60, k = 3, maxBucketSize = Some(1))(docs)) == ids(docs))
    assert(ids(new graft.operators.dedup.SimHashNearDedup(textCol = "text", idCol = "doc_id",
      bits = 60, k = 3, maxBucketSize = Some(1000000))(docs)) ==
      ids(sUncapped(docs)))

    // incremental minhash (r17): the prior-side hot-bucket guard only
    // ever keeps MORE increment rows; a huge cap is a no-op
    val prior = docs.filter(col("doc_id") % 5 === 0)
    def inc(cap: Option[Int]) = ids(new graft.operators.dedup.IncrementalMinHashDedup(
      prior = Some(prior), textCol = "text", idCol = "doc_id",
      shingleWidth = 3, numHashes = 16, numBands = 4, threshold = 0.8,
      priorMaxBucketSize = cap)(docs))
    assert(inc(None).subsetOf(inc(Some(1))))
    assert(inc(Some(1000000)) == inc(None))
  }

  test("incremental minhash dedup: prior near-dups drop, novel content survives") {
    import spark.implicits._
    val prior = Seq(
      (10L, "the quick brown fox jumps over the lazy dog near the river bank today"),
      (11L, "completely different prior content about distributed database systems design"))
      .toDF("doc_id", "text")
    val inc = Seq(
      // 20: reworded re-crawl of 10 (shares almost every 3-shingle)
      (20L, "the quick brown fox jumps over the lazy dog near the river bank"),
      // 21: exact copy of 11
      (21L, "completely different prior content about distributed database systems design"),
      // 22: novel
      (22L, "unrelated fresh document covering alpine meadow ecology and pollinators"),
      // 23: near-dup of 22 — WITHIN-increment near-dups must survive
      (23L, "unrelated fresh document covering alpine meadow ecology and pollinators yes"))
      .toDF("doc_id", "text")
    val op = new graft.operators.dedup.IncrementalMinHashDedup(
      prior = Some(prior), textCol = "text", idCol = "doc_id",
      shingleWidth = 3, numHashes = 16, numBands = 4, threshold = 0.7)
    val kept = ids(op(inc))
    assert(kept == Set(22L, 23L), kept)
    // rejected carry the matching prior id as representative
    val reps = op.rejected(inc)
      .select(col("doc_id"), col(graft.core.Rejection.ColName)("representative_id").cast("long"))
      .as[(Long, Long)].collect().toMap
    assert(reps == Map(20L -> 10L, 21L -> 11L), reps)
    assert(op(inc).count() + op.rejected(inc).count() == inc.count())
  }

  test("soft dedup: weights sum to 1 per duplicate group, nothing dropped") {
    import spark.implicits._
    // plant exact duplicates: doc_id % 3 == 0 rows share their class text
    val planted = docs.withColumn("text",
      when(col("doc_id") % 3 === 0,
        concat(lit("planted duplicate class "), (col("doc_id") % 9).cast("string")))
        .otherwise(col("text")))
    val op = new graft.operators.dedup.SoftExactDedup(
      textCol = "text", idCol = "doc_id")
    val out = op(planted)
    assert(out.count() == planted.count())
    // per-group weight mass is exactly 1
    val masses = out.groupBy("text").agg(sum("dedup_weight").as("m"))
      .select("m").as[Double].collect()
    masses.foreach(m => assert(math.abs(m - 1.0) < 1e-9, m))
    // every hard-dedup casualty sits in a dup_count > 1 group
    val plantedAll = ids(planted)
    val hardKept = ids(TextExactDedup(
      textCol = "text", idCol = "doc_id", orderCol = "doc_id")(planted))
    val softDupIds = ids(out.filter(col("dup_count") > 1))
    assert((plantedAll -- hardKept).subsetOf(softDupIds))
    assert(softDupIds.nonEmpty, "fixture has no exact dups — vacuous")
  }

  test("exact dedup is idempotent") {
    val op = TextExactDedup(textCol = "text", idCol = "doc_id", orderCol = "doc_id")
    val once = op(docs)
    assert(ids(op(once)) == ids(once))
  }

  test("dedup passed/rejected partition the input, first-wins keeps the smallest order") {
    val op = TextExactDedup(textCol = "text", idCol = "doc_id", orderCol = "doc_id")
    val kept = ids(op(docs))
    val rej = op.rejected(docs)
    assert(kept ++ ids(rej) == allIds)
    assert((kept & ids(rej)).isEmpty)
    // every reject's representative is a kept row with a smaller id
    val bad = rej.select(col("doc_id").cast("long"),
        col("_rejection_details.representative_id").cast("long").as("rep"))
      .filter(col("rep") >= col("doc_id")).count()
    assert(bad == 0)
  }

  test("rejection provenance carries reason/operator for dedup rejects") {
    val op = TextExactDedup(textCol = "text", idCol = "doc_id", orderCol = "doc_id")
    val r = op.rejected(docs).select(
      col("_rejection_details.reason"), col("_rejection_details.operator")).distinct().collect()
    assert(r.forall(row => row.getString(0) == "duplicate" && row.getString(1) == "text_exact_dedup"))
  }

  test("filter keep/rejected partition the input") {
    val f = new TextLengthFilter(minLength = 100, maxLength = Some(400),
      textCol = "text", lengthCol = Some("n_chars"))
    val kept = ids(f(docs))
    val rejected = ids(f.rejected(docs))
    assert(kept ++ rejected == allIds)
    assert((kept & rejected).isEmpty)
    assert(kept.nonEmpty && rejected.nonEmpty, "degenerate filter config")
  }

  test("connected components: chains collapse to the minimum id") {
    import graft.operators.dedup.ConnectedComponents
    // 1-2-3 is a chain (1 and 3 never paired directly); 5-6 separate
    val pairs = spark.createDataFrame(Seq((1L, 2L), (2L, 3L), (5L, 6L))).toDF("d1", "d2")
    val comps = ConnectedComponents.assign(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comps == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 5L -> 5L, 6L -> 5L))
  }

  test("connected components: driver union-find path == distributed pointer-jumping path") {
    import graft.operators.dedup.ConnectedComponents
    // adversarial mix: a long path (pointer-jumping's worst case), a
    // star entered from its tail, a triangle with a redundant edge, and
    // out-of-order ids so min-label != first-seen
    val edges = (10L to 40L).map(i => (i + 1, i)) ++ // descending path
      Seq((100L, 7L), (100L, 8L), (100L, 9L), (9L, 3L)) ++ // star + tail
      Seq((50L, 60L), (60L, 70L), (70L, 50L), (50L, 70L)) // triangle + dup edge
    val pairs = spark.createDataFrame(edges).toDF("d1", "d2")
    def toMapOf(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val local = toMapOf(ConnectedComponents.assign(pairs))
    val dist = toMapOf(ConnectedComponents.assign(pairs, localEdgeLimit = 0L))
    assert(local == dist)
    assert(local(41L) == 10L && local(100L) == 3L && local(70L) == 50L)
  }

  test("connected components: null pair ids fall back to the distributed path without crashing") {
    import graft.operators.dedup.ConnectedComponents
    val pairs = spark.createDataFrame(
      Seq((Some(1L), Some(2L)), (None: Option[Long], Some(3L))))
      .toDF("d1", "d2")
    // union-find would merge null with 3; the distributed fixpoint keeps
    // null as its own label — the null guard must route to the latter
    val rows = ConnectedComponents.assign(pairs).collect()
    val nonNull = rows.filter(r => !r.isNullAt(0))
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getLong(1))).toMap
    assert(nonNull(1L) == 1L && nonNull(2L) == 1L && nonNull(3L) == 3L, rows.mkString(","))
  }

  test("connected components: string ids take the driver path with lexicographic min") {
    import graft.operators.dedup.ConnectedComponents
    val pairs = spark.createDataFrame(Seq(("zz", "mm"), ("mm", "aa"), ("q", "q2")))
      .toDF("d1", "d2")
    val comps = ConnectedComponents.assign(pairs)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(comps == Map("zz" -> "aa", "mm" -> "aa", "aa" -> "aa", "q" -> "q", "q2" -> "q"))
  }

  test("transitive minhash dedup keeps a subset of pairwise (closure only adds drops)") {
    val op = new MinHashLSHDedup(textCol = "text", idCol = "doc_id",
      shingleWidth = 3, numHashes = 16, numBands = 4, threshold = 0.8, portableHashes = true)
    assert(ids(op.applyTransitive(docs)).subsetOf(ids(op(docs))))
  }

  test("simhash near-dedup (hamming<=k) drops a superset of exact-equality drops") {
    import graft.operators.dedup.SimHashNearDedup
    val exact = new SimHashDedup(textCol = "text", idCol = "doc_id", orderCol = "doc_id", bits = 32)
    val near = new graft.operators.dedup.SimHashNearDedup(textCol = "text", idCol = "doc_id", bits = 32, k = 3)
    val exactDrops = allIds -- ids(exact(docs))
    val nearDrops = allIds -- ids(near(docs))
    assert(exactDrops.subsetOf(nearDrops), s"${exactDrops -- nearDrops}")
    assert(nearDrops.size > exactDrops.size, "k=3 found nothing beyond k=0 — vacuous fixture")
  }

  test("simhash dedup keeps exactly one row per fingerprint") {
    val op = new SimHashDedup(textCol = "text", idCol = "doc_id", orderCol = "doc_id", bits = 32)
    val kept = op(docs)
    val fps = kept.select(op.simhash(col("text")).as("fp"))
    assert(fps.count() == fps.distinct().count())
    // complement partition holds here too
    assert(ids(kept) ++ ids(op.rejected(docs)) == allIds)
  }

  test("bucketed cosine dedup keeps a superset of brute-force (bucketing prunes candidates)") {
    val emb = table("embeddings")
    val brute = new EmbeddingCosineDedup(vecCol = "embedding", idCol = "vec_id", threshold = 0.35)
    val withBucket = emb.withColumn("bk",
      AnnSearch.signBucket(col("embedding"), 0 until 4))
    val bucketed = new EmbeddingCosineDedup(vecCol = "embedding", idCol = "vec_id",
      threshold = 0.35, bucketCol = Some("bk"))
    assert(ids(brute(emb), "vec_id").subsetOf(ids(bucketed(withBucket), "vec_id")))
  }

  test("ann lsh top-k results are a subset of brute-force top-k candidates by construction") {
    val emb = table("embeddings")
    val q = emb.filter(col("vec_id") === 0)
    val brute = AnnSearch.bruteForceTopK(emb, q, "embedding", "vec_id", k = 50)
      .collect().map(_.getLong(0)).toSet
    val lsh = AnnSearch.lshTopK(emb, q, "embedding", "vec_id", k = 5, coords = 0 until 4)
      .collect().map(_.getLong(0)).toSet
    assert(lsh.nonEmpty)
    // lsh results all score within the brute-force top-50 (bucket contains the query itself)
    assert(lsh.subsetOf(brute), s"${lsh -- brute}")
  }

  test("multi-probe: flips exactly `probes` least-confident planes; recall never below single-probe") {
    import spark.implicits._
    // hand vector: |coords| magnitudes 0.9, 0.1, -0.05, 0.7 on planes
    // 0..3 → least-confident planes are 2 (|−0.05|) then 1 (|0.1|);
    // base bucket = signs (+,+,−,+) = 1+2+0+8 = 11
    val v = Seq((0L, Array(0.9f, 0.1f, -0.05f, 0.7f))).toDF("vec_id", "embedding")
    val probes = v.select(explode(AnnSearch.probeBuckets(
        col("embedding"), 0 until 4, probes = 2)).as("b"))
      .collect().map(_.getLong(0)).toSet
    assert(probes == Set(11L, 11L ^ 4L, 11L ^ 2L), probes.toString) // base, flip plane2, flip plane1
    // probes = 0 degenerates to the single bucket
    val p0 = v.select(explode(AnnSearch.probeBuckets(
        col("embedding"), 0 until 4, probes = 0)).as("b"))
      .collect().map(_.getLong(0)).toSeq
    assert(p0 == Seq(11L))
    // single-coord SQL twin: the rank term list is empty — must emit a
    // literal 0, never the unparseable `()`
    val oneCoord = AnnSearch.probeBucketsSql("embedding", Seq(0), probes = 1)
    assert(oneCoord.contains("(0) < 1") && !oneCoord.contains("()"), oneCoord)
    // on the fixture corpus: multi-probe candidates strictly contain the
    // single bucket, and measured recall is monotone in probes
    val emb = table("embeddings")
    val rep = AnnSearch.multiProbeRecall(emb, "embedding", "vec_id",
      k = 10, coords = 0 until 4, probes = 2, queryMod = 97).head()
    assert(rep.getLong(2) == rep.getLong(0) * 10) // truth_pairs = queries*k
    assert(rep.getLong(4) >= rep.getLong(3),
      s"multi_hits ${rep.getLong(4)} must be >= single_hits ${rep.getLong(3)}")
    assert(rep.getDouble(6) >= rep.getDouble(5))
  }

  test("lsh recall tuner: sampleMod is required, sample is endpoint-consistent, empty truth gives null recall") {
    import graft.operators.dedup.LshRecall
    def tuner(m: Int) = new LshRecall("text", "doc_id", shingleWidth = 3,
      numHashes = 16, numBands = 4, threshold = 0.8, sampleMod = m)
    assertThrows[IllegalArgumentException](tuner(0))
    // sampled truth pairs == full-corpus truth pairs restricted to sampled ids
    val full = tuner(1).report(docs).collect()(0)
    val sampled = tuner(3).report(docs).collect()(0)
    val jaccard = new NgramJaccardDedup("text", "doc_id", 3, 0.8)
    val fullPairs = jaccard.verifiedPairs(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expect = fullPairs.count { case (a, b) => a % 3 == 0 && b % 3 == 0 }
    assert(sampled.getLong(0) === expect.toLong)
    assert(full.getLong(0) === fullPairs.size.toLong)
    // truth-empty input: recall must be NULL, never DIVIDE_BY_ZERO (ANSI)
    val distinctRows = spark.range(6).selectExpr("id AS doc_id",
      "concat('unique document number ', id, ' with entirely disjoint words ', id * 7) AS text")
    val empty = tuner(1).report(distinctRows).collect()(0)
    assert(empty.getLong(0) === 0L && empty.isNullAt(2))
  }

  test("mutual kNN: reciprocity required, one-directional neighbors dropped") {
    import spark.implicits._
    // chain in angle space: 0 and 1 are each other's top-1; 2's top-1 is
    // 1 but 1's top-1 is 0 -> at k=1 only (0,1) is mutual
    val vs = Seq(
      (0L, Array(1.0f, 0.0f)),
      (1L, Array(1.0f, 0.1f)),
      (2L, Array(1.0f, 0.3f))).toDF("vec_id", "embedding")
    val m1 = AnnSearch.mutualKnnLsh(vs, "embedding", "vec_id", k = 1, coords = Seq(0),
        maxBucketSize = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(m1.toSet == Set((0L, 1L)))
    // at k=2 every pair is reciprocal within the 3-point bucket
    val m2 = AnnSearch.mutualKnnLsh(vs, "embedding", "vec_id", k = 2, coords = Seq(0),
        maxBucketSize = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(m2.toSet == Set((0L, 1L), (0L, 2L), (1L, 2L)))
    assertThrows[IllegalArgumentException](
      AnnSearch.mutualKnnLsh(vs, "embedding", "vec_id", k = 1, coords = Seq(0),
        maxBucketSize = 0))
  }

  test("mutual kNN skew probe: a one-cone corpus spreads across mean-centered buckets and the cap bounds candidates") {
    import spark.implicits._
    // 64 vectors ALL in the positive orthant (every raw coordinate sign
    // agrees corpus-wide) — under raw axis-aligned signs these collapse
    // into ONE bucket and the self-join goes quadratic. Mean-centering
    // must split each bit near the mass center instead.
    val cone = (0 until 64).map { i =>
      (i.toLong, Array(1.0f + (i % 8) * 0.1f, 2.0f + (i / 8) * 0.1f, 0.5f, 3.0f))
    }.toDF("vec_id", "embedding")
    val rawBuckets = cone
      .select(AnnSearch.signBucket(col("embedding"), 0 until 2).as("bk"))
      .groupBy("bk").count().collect()
    assert(rawBuckets.length == 1, "probe must start from a genuinely hot orthant")
    // centered buckets: no bucket may hold the whole cone
    val centered = AnnSearch.mutualKnnLsh(cone, "embedding", "vec_id", k = 3,
      coords = 0 until 2, maxBucketSize = 1000)
    assert(centered.count() > 0)
    // max candidate mass is bounded by the largest centered bucket; with
    // 2 mean-centered bits over the 8x8 grid each bit splits ~half, so
    // the hottest bucket must be well under the raw-sign 64
    val maxBucket = {
      val sums = (0 until 2).map(c => sum(
        floor(element_at(col("embedding"), c + 1).cast("double") * lit(1000000.0d)))
        .as(s"s$c"))
      val st = cone.agg(count(lit(1)).as("n"), sums: _*).head()
      val n = st.getLong(0)
      cone.select((0 until 2).map { c =>
        when(floor(element_at(col("embedding"), c + 1).cast("double") * lit(1000000.0d)) * n
          >= st.getLong(c + 1), lit(1L << c)).otherwise(lit(0L))
      }.reduce(_ + _).as("bk")).groupBy("bk").count()
        .agg(max("count")).head().getLong(0)
    }
    assert(maxBucket < 40, s"hottest centered bucket $maxBucket of 64 — centering failed")
    // and the cap is a hard bound: cap=10 must drop every over-cap
    // bucket (possibly all of them) rather than join them
    val capped = AnnSearch.mutualKnnLsh(cone, "embedding", "vec_id", k = 3,
      coords = 0 until 2, maxBucketSize = 10)
    val keptIds = capped.select("a").union(capped.select("b"))
      .distinct().collect().map(_.getLong(0)).toSet
    // every surviving pair's bucket had <= 10 members; with 64 vectors in
    // <= 4 buckets at least one bucket exceeds 10, so some ids must drop
    assert(keptIds.size < 64)
  }

  test("mutual kNN recall report: self-consistent counts, hit subsets, OR >= single recall") {
    val emb = table("embeddings")
    val bands = (0 until 4).map(b => 4 * b until 4 * (b + 1))
    val r = AnnSearch.mutualKnnRecall(emb, "embedding", "vec_id", k = 5,
      bands = bands, maxBucketSize = 1000, sampleMod = 4).head()
    val (truePairs, singlePairs, orPairs) = (r.getLong(0), r.getLong(1), r.getLong(2))
    val (singleHits, orHits) = (r.getLong(3), r.getLong(4))
    assert(singleHits <= truePairs && singleHits <= singlePairs)
    assert(orHits <= truePairs && orHits <= orPairs)
    if (truePairs > 0) {
      assert(math.abs(r.getDouble(5) - singleHits.toDouble / truePairs) < 1e-6)
      assert(math.abs(r.getDouble(6) - orHits.toDouble / truePairs) < 1e-6)
      // the whole point of OR-amplification (VERDICT r14 #1): the
      // 4-band union must find MATERIALLY more true mutual pairs than
      // one band — 1-(1-p)^4 vs p (measured 0.41 vs 0.11 on the fixture)
      assert(r.getDouble(6) > 2.0 * r.getDouble(5),
        s"OR recall ${r.getDouble(6)} must materially beat single-band ${r.getDouble(5)}")
    }
    assertThrows[IllegalArgumentException](
      AnnSearch.mutualKnnRecall(emb, "embedding", "vec_id", k = 5,
        bands = bands, maxBucketSize = 1000, sampleMod = 0))
  }

  test("OR-amplified mutual kNN: one band reproduces the single-band tier; pairs dedup across bands") {
    import spark.implicits._
    val emb = table("embeddings")
    // L=1: identical semantics to mutualKnnLsh (same buckets, same heap,
    // the dedup path is a no-op when each pair arrives once)
    val single = AnnSearch.mutualKnnLsh(emb, "embedding", "vec_id", k = 5,
        coords = 0 until 4, maxBucketSize = 1000)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val or1 = AnnSearch.mutualKnnLshOr(emb, "embedding", "vec_id", k = 5,
        bands = Seq(0 until 4), maxBucketSize = 1000)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(or1 == single)
    // duplicate-band degeneracy: the SAME band twice must change nothing
    // (every candidate pair arrives twice; heap + prune dedup must hold
    // exact top-k, not burn slots on repeats)
    val orDup = AnnSearch.mutualKnnLshOr(emb, "embedding", "vec_id", k = 5,
        bands = Seq(0 until 4, 0 until 4), maxBucketSize = 1000)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(orDup == single)
    // reciprocity exactness on a tiny case spanning two disjoint bands:
    // 0/1 co-bucket on band 0 only, 1/2 on band 1 only; at k=2 the OR
    // path must see both edges even though no single band has both
    val vs = Seq(
      (0L, Array(1.0f, 0.0f, 1.0f, 0.0f)),
      (1L, Array(1.0f, 0.1f, -1.0f, 0.0f)),
      (2L, Array(-1.0f, 0.2f, -1.0f, 0.1f))).toDF("vec_id", "embedding")
    val or2 = AnnSearch.mutualKnnLshOr(vs, "embedding", "vec_id", k = 2,
        bands = Seq(Seq(0), Seq(2)), maxBucketSize = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b0 = AnnSearch.mutualKnnLsh(vs, "embedding", "vec_id", k = 2,
        coords = Seq(0), maxBucketSize = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b1 = AnnSearch.mutualKnnLsh(vs, "embedding", "vec_id", k = 2,
        coords = Seq(2), maxBucketSize = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert((b0 union b1).subsetOf(or2),
      s"union of band pairs $b0 + $b1 must survive the OR path, got $or2")
    assertThrows[IllegalArgumentException](
      AnnSearch.mutualKnnLshOr(emb, "embedding", "vec_id", k = 5,
        bands = Seq.empty, maxBucketSize = 1000))
    assertThrows[IllegalArgumentException](
      AnnSearch.mutualKnnLshOr(emb, "embedding", "vec_id", k = 5,
        bands = Seq(0 until 4), maxBucketSize = 0))
  }

  test("mutual kNN OR operating point: L=1 reproduces single-band recall, monotone-ish curve, chosen row flagged") {
    val emb = table("embeddings")
    val bands = (0 until 4).map(b => 4 * b until 4 * (b + 1))
    val rows = AnnSearch.mutualKnnOrOperatingPoint(emb, "embedding", "vec_id",
      k = 5, bands = bands, maxBucketSize = 1000, targetRecall = 0.5,
      sampleMod = 4).collect()
    assert(rows.map(_.getInt(0)).toSeq == Seq(1, 2, 3, 4))
    // L=1 must equal the direct single-band readout (cross-validates the
    // leveled one-pass pipeline against mutualKnnLsh)
    val direct = AnnSearch.mutualKnnRecall(emb, "embedding", "vec_id", k = 5,
      bands = bands, maxBucketSize = 1000, sampleMod = 4).head()
    assert(rows(0).getLong(1) == direct.getLong(0), "same truth pairs")
    assert(rows(0).getLong(2) == direct.getLong(1), "L=1 pairs == single_pairs")
    assert(rows(0).getLong(3) == direct.getLong(3), "L=1 hits == single_hits")
    // and L=4 equals the full OR readout
    assert(rows(3).getLong(2) == direct.getLong(2), "L=4 pairs == or_pairs")
    assert(rows(3).getLong(3) == direct.getLong(4), "L=4 hits == or_hits")
    // exactly one chosen row; with target 0.5 unmet on the fixture it is
    // the max-recall level
    val chosen = rows.filter(_.getBoolean(5))
    assert(chosen.length == 1)
    assert(chosen.head.getDouble(4) == rows.map(_.getDouble(4)).max)
  }

  test("semantic dedup recall: bucket pairs subset truth; one-bucket recall is exactly 1") {
    import spark.implicits._
    val emb = table("embeddings")
    // degenerate single bucket: candidates unrestricted -> recall 1.0
    val one = graft.operators.vector.EmbeddingCosineDedup.bucketedRecall(
      emb.withColumn("cluster_id", lit(0)), "embedding", "vec_id",
      "cluster_id", threshold = 0.35, sampleMod = 4).head()
    assert(one.getLong(0) == one.getLong(1) && one.getDouble(2) == 1.0)
    // real buckets: caught <= truth (subset by construction)
    val parted = graft.operators.vector.EmbeddingCosineDedup.bucketedRecall(
      emb.withColumn("cluster_id", col("vec_id") % 8), "embedding", "vec_id",
      "cluster_id", threshold = 0.35, sampleMod = 4).head()
    assert(parted.getLong(1) <= parted.getLong(0))
    assertThrows[IllegalArgumentException](
      graft.operators.vector.EmbeddingCosineDedup.bucketedRecall(
        emb.withColumn("cluster_id", lit(0)), "embedding", "vec_id",
        "cluster_id", threshold = 0.35, sampleMod = 0))
  }

  test("OR-amplified mutual kNN: random vectors match an independent plain-Scala reference") {
    import spark.implicits._
    val rnd = new scala.util.Random(99)
    val dims = 8
    val vecs = (0L until 120L).map(i =>
      (i, Array.fill(dims)(rnd.nextFloat() * 2 - 1)))
    val df = vecs.toDF("vec_id", "embedding")
    val bands = Seq(Seq(0, 1, 2), Seq(3, 4, 5))
    val k = 3; val cap = 50
    val got = AnnSearch.mutualKnnLshOr(df, "embedding", "vec_id", k, bands, cap)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    // reference: the documented math re-implemented without Spark —
    // exact scaled coords, mean-centered bits, per-(band,bucket) cap,
    // per-query distinct candidate union, (cos DESC, id) top-k,
    // reciprocity, a < b
    def scaled(v: Array[Float], c: Int): Long =
      math.floor(v(c).toDouble * 1e6).toLong
    val n = vecs.size
    val byId = vecs.toMap
    def cosine(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        val x = a(i).toDouble; val y = b(i).toDouble
        dot += x * y; na += x * x; nb += y * y; i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val perBand = bands.map { coords =>
      val sums = coords.map(c => c -> vecs.map(t => scaled(t._2, c)).sum).toMap
      val bk = vecs.map { case (id, v) =>
        id -> coords.zipWithIndex.map { case (c, kk) =>
          if (scaled(v, c) * n >= sums(c)) 1L << kk else 0L
        }.sum
      }.toMap
      val groups = bk.groupBy(_._2).map { case (b, m) => b -> m.keySet }
      val kept = groups.filter(_._2.size <= cap)
      bk.flatMap { case (id, b) => kept.get(b).map(g => id -> (g - id)) }
    }
    val topk: Map[Long, Seq[Long]] = vecs.map(_._1).map { id =>
      val cs = perBand.flatMap(_.getOrElse(id, Set.empty[Long])).toSet
      id -> cs.toSeq.map(c => (c, cosine(byId(id), byId(c))))
        .sortBy { case (cid, cos) => (-cos, cid) }.take(k).map(_._1)
    }.toMap
    val want = (for {
      (a, nbrs) <- topk.toSeq; b <- nbrs
      if a < b && topk(b).contains(a)
    } yield (a, b)).toSet
    assert(want.nonEmpty, "vacuous fixture — no mutual pairs at all")
    assert(got == want,
      s"got ${got.size} want ${want.size}; sym-diff ${(got diff want) union (want diff got)}")
  }

  test("minhash operating point under OPH: every geometry equals an independent OPH LshRecall run") {
    graft.core.Staging.scoped {
      val op = new graft.operators.dedup.MinHashOperatingPoint(
        "text", "doc_id", shingleWidth = 3, numHashes = 16,
        threshold = 0.8, targetRecall = 0.9, sampleMod = 3,
        signatureScheme = "oph")
      val rows = op.report(docs).collect()
      assert(rows.map(_.getInt(0)).toSeq == Seq(1, 2, 4, 8, 16))
      rows.foreach { r =>
        val b = r.getInt(0)
        val ind = new graft.operators.dedup.LshRecall("text", "doc_id", 3, 16,
          b, 0.8, sampleMod = 3, signatureScheme = "oph").report(docs).head()
        assert(r.getLong(2) == ind.getLong(0), s"b=$b true pairs")
        assert(r.getLong(3) == ind.getLong(1), s"b=$b caught pairs")
      }
      assert(rows.count(_.getBoolean(6)) == 1, "chosen row must be unique")
    }
  }

  test("operating points: every level equals an independent per-level run (leveled one-pass == per-level joins)") {
    val emb = table("embeddings")
    graft.core.Staging.scoped {
      // multi-probe: hits at level p == a separate knnJoinMultiProbe(p)
      val rows = AnnSearch.multiProbeOperatingPoint(emb, "embedding", "vec_id",
        k = 5, coords = 0 until 4, maxProbes = 2, targetRecall = 0.9,
        queryMod = 5).collect()
      val queries = emb.filter(col("vec_id") % 5 === 0)
      val truth = AnnSearch.knnJoin(emb, queries, "embedding", "vec_id",
          "vec_id", 5, excludeSelf = true)
        .select(col("query_id"), col("vec_id").as("_tid"))
      assert(rows(0).getLong(1) == truth.count())
      for (p <- 0 to 2) {
        val multi = AnnSearch.knnJoinMultiProbe(emb, queries, "embedding",
            "vec_id", "vec_id", 5, 0 until 4, p, excludeSelf = true)
          .select(col("query_id").as("_mq"), col("vec_id").as("_mid"))
        val hits = truth.join(multi,
          col("query_id") === col("_mq") && col("_tid") === col("_mid"),
          "left_semi").count()
        assert(rows(p).getLong(2) == hits,
          s"level $p: leveled ${rows(p).getLong(2)} vs independent $hits")
      }
      // mutual OR: pairs at band count L == a separate mutualKnnLshOr
      // over the first L bands (intermediate Ls too, not just the ends)
      val bands = (0 until 4).map(b => 4 * b until 4 * (b + 1))
      val orRows = AnnSearch.mutualKnnOrOperatingPoint(emb, "embedding",
        "vec_id", k = 5, bands = bands, maxBucketSize = 1000,
        targetRecall = 0.9, sampleMod = 4).collect()
      val sample = emb.filter(col("embedding").isNotNull && col("vec_id") % 4 === 0)
      for (l <- 1 to 4) {
        val direct = AnnSearch.mutualKnnLshOr(sample, "embedding", "vec_id",
          k = 5, bands = bands.take(l), maxBucketSize = 1000).count()
        assert(orRows(l - 1).getLong(2) == direct,
          s"L=$l: leveled ${orRows(l - 1).getLong(2)} vs independent $direct")
      }
    }
  }

  test("mutual kNN band stats: per-band candidate mass respects the cap and matches bucket counts") {
    val emb = table("embeddings")
    val bands = (0 until 4).map(b => 4 * b until 4 * (b + 1))
    val rows = AnnSearch.mutualKnnBandStats(emb, "embedding", "vec_id",
      bands = bands, maxBucketSize = 1000).collect()
    assert(rows.map(_.getInt(0)).toSeq == Seq(0, 1, 2, 3))
    rows.foreach { r =>
      val (buckets, kept, cand) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(buckets <= 16L && kept <= 500L)
      // candidate mass bounded by kept * (cap - 1) per band
      assert(cand <= kept * 999L)
    }
    // a tiny cap drops over-cap buckets from the mass readout
    val capped = AnnSearch.mutualKnnBandStats(emb, "embedding", "vec_id",
      bands = bands, maxBucketSize = 5).collect()
    capped.foreach(r => assert(r.getLong(3) <= r.getLong(2) * 4L))
  }

  test("minhash operating point: every geometry equals an independent LshRecall run; nesting is monotone; chosen unique") {
    graft.core.Staging.scoped {
      val docs = table("documents")
      val op = new graft.operators.dedup.MinHashOperatingPoint(
        "text", "doc_id", shingleWidth = 3, numHashes = 16,
        threshold = 0.8, targetRecall = 0.9, sampleMod = 3)
      assert(op.geometries == Seq(1, 2, 4, 8, 16))
      val rows = op.report(docs).collect()
      assert(rows.map(_.getInt(0)).toSeq == Seq(1, 2, 4, 8, 16))
      assert(rows.map(_.getInt(1)).toSeq == Seq(16, 8, 4, 2, 1))
      // level-equivalence: each geometry's caught count equals an
      // INDEPENDENT LshRecall run at that banding (leveled one-pass vs
      // the band-key-join path — two different algorithms, same answer)
      for (r <- rows) {
        val direct = new graft.operators.dedup.LshRecall(
          "text", "doc_id", shingleWidth = 3, numHashes = 16,
          numBands = r.getInt(0), threshold = 0.8, sampleMod = 3)
          .report(docs).head()
        assert(r.getLong(2) == direct.getLong(0),
          s"b=${r.getInt(0)}: same truth pairs")
        assert(r.getLong(3) == direct.getLong(1),
          s"b=${r.getInt(0)}: leveled ${r.getLong(3)} vs independent ${direct.getLong(1)}")
      }
      // nested band splits: recall monotone in b (caught(b) ⊆ caught(2b)),
      // and candidate mass strictly grows with more bands on this fixture
      val caught = rows.map(_.getLong(3))
      assert(caught.zip(caught.tail).forall { case (a, b) => a <= b },
        s"caught must be monotone in bands: ${caught.toSeq}")
      val mass = rows.map(_.getLong(4))
      assert(mass.zip(mass.tail).forall { case (a, b) => a < b },
        s"candidate mass must grow with bands: ${mass.toSeq}")
      // exactly one chosen row: the smallest (cheapest) b meeting 0.9
      val chosen = rows.filter(_.getBoolean(6))
      assert(chosen.length == 1)
      val meeting = rows.filter(r => !r.isNullAt(5) && r.getDouble(5) >= 0.9)
      if (meeting.nonEmpty)
        assert(chosen.head.getInt(0) == meeting.map(_.getInt(0)).min)
      assertThrows[IllegalArgumentException](new graft.operators.dedup
        .MinHashOperatingPoint("text", "doc_id", sampleMod = 0))
    }
  }

  test("probed semantic dedup: nprobe=1 == single assignment, full probe == brute force, random vectors match a plain-Scala reference") {
    import spark.implicits._
    import graft.operators.vector.EmbeddingCosineDedup
    val rnd = new scala.util.Random(1234)
    val dims = 6
    val vecs = (0L until 150L).map(i => (i, Array.fill(dims)(rnd.nextFloat() * 2 - 1)))
    val df = vecs.toDF("vec_id", "embedding")
    val cents: Seq[Seq[Double]] = vecs.take(5).map(_._2.toSeq.map(_.toDouble))
    val t = 0.2
    def pairsOf(np: Int) = EmbeddingCosineDedup
      .probedPairs(df, "embedding", "vec_id", cents, np, t)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // reference: the documented math without Spark — (l2sq, idx)-ranked
    // probe cells, shared-cell pairs, same left-to-right cosine fold
    def cosine(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        val x = a(i).toDouble; val y = b(i).toDouble
        dot += x * y; na += x * x; nb += y * y; i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    def probes(v: Array[Float], np: Int): Set[Int] =
      cents.indices.map { i =>
        (graft.functions.VectorFunctions.l2sq(v.toSeq.map(_.toDouble), cents(i)), i)
      }.sorted.take(np).map(_._2).toSet
    def want(np: Int) = (for {
      (a, va) <- vecs; (b, vb) <- vecs
      if a < b && (probes(va, np) intersect probes(vb, np)).nonEmpty
      if cosine(va, vb) >= t
    } yield (a, b)).toSet
    for (np <- Seq(1, 2, 5))
      assert(pairsOf(np) == want(np), s"nprobe=$np mismatch vs reference")
    // monotone in nprobe; probing EVERY cell degenerates to brute force
    assert(pairsOf(1).subsetOf(pairsOf(2)) && pairsOf(2).subsetOf(pairsOf(5)))
    val brute = (for { (a, va) <- vecs; (b, vb) <- vecs
      if a < b && cosine(va, vb) >= t } yield (a, b)).toSet
    assert(pairsOf(5) == brute, "nprobe=k must equal all-pairs brute force")
    assert(pairsOf(1) != brute, "vacuous fixture: single assignment misses nothing")
    // nprobe=1 IS the single-assignment bucketed tier on the same cells
    val withBk = df.withColumn("bk",
      graft.plans.kernels.nearest_centroid(col("embedding"), cents))
    val single = new EmbeddingCosineDedup("embedding", "vec_id", t, Some("bk"))
      .verifiedPairs(withBk)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairsOf(1) == single)
    assertThrows[IllegalArgumentException](
      EmbeddingCosineDedup.probedPairs(df, "embedding", "vec_id", cents, 0, t))
    assertThrows[IllegalArgumentException](
      EmbeddingCosineDedup.probedPairs(df, "embedding", "vec_id", cents, 6, t))
  }

  test("probed recall + stats: single <= probed, counts consistent, operator kept-set matches; nprobe lifts recall on the fixture") {
    import graft.operators.vector.EmbeddingCosineDedup
    val emb = table("embeddings")
    val cents = new graft.operators.ml.KMeansBuckets("embedding", "cluster_id", 8)
      .firstKCentroids(emb, "vec_id")
    val r = EmbeddingCosineDedup.probedRecall(emb, "embedding", "vec_id",
      cents, nprobe = 2, threshold = 0.35, sampleMod = 4).head()
    val (tp, sp, pp) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(sp <= pp && pp <= tp, s"single $sp <= probed $pp <= truth $tp")
    if (tp > 0) {
      assert(math.abs(r.getDouble(3) - sp.toDouble / tp) < 1e-6)
      assert(math.abs(r.getDouble(4) - pp.toDouble / tp) < 1e-6)
      // the point of the lever (VERDICT r15 #1): probing the runner-up
      // cell must find MATERIALLY more boundary pairs than single
      // assignment (measured 0.295 -> 0.738 on the sf0.001 fixture)
      assert(r.getDouble(4) > 1.5 * r.getDouble(3),
        s"probed recall ${r.getDouble(4)} must materially beat single ${r.getDouble(3)}")
    }
    // candidate-mass evidence: probed rows sum to nprobe * (rows with a
    // vector); primary rows partition the corpus
    val st = EmbeddingCosineDedup.probedClusterStats(
      emb, "embedding", "vec_id", cents, nprobe = 2).collect()
    val n = emb.filter(col("embedding").isNotNull).count()
    assert(st.map(_.getLong(1)).sum == n, "primary rows partition the corpus")
    assert(st.map(_.getLong(2)).sum == 2L * n, "probed rows = nprobe * n")
    st.foreach { s =>
      assert(s.getLong(3) == s.getLong(1) * (s.getLong(1) - 1))
      assert(s.getLong(4) == s.getLong(2) * (s.getLong(2) - 1))
    }
    // operator surface: kept = ids minus later-of-pair ids
    val op = new graft.operators.vector.ProbedCosineDedup(
      "embedding", "vec_id", 0.35, cents, 2)
    val drops = op.verifiedPairs(emb).select("d2")
      .collect().map(_.getLong(0)).toSet
    val kept = op(emb).select("vec_id").collect().map(_.getLong(0)).toSet
    val all = emb.select("vec_id").collect().map(_.getLong(0)).toSet
    assert(kept == (all diff drops))
    // rejected rows carry the FIRST (min-id) surviving representative
    val rej = op.rejected(emb).select(col("vec_id")).collect().map(_.getLong(0)).toSet
    assert(rej == drops)
    // auto-bucketed registry path: probing can only drop MORE than
    // single assignment (pairs widen monotonically)
    val k1 = new graft.operators.vector.AutoBucketedCosineDedup(
      "embedding", "vec_id", 0.35, numBuckets = 8, nprobe = 1)(emb).count()
    val k2 = new graft.operators.vector.AutoBucketedCosineDedup(
      "embedding", "vec_id", 0.35, numBuckets = 8, nprobe = 2)(emb).count()
    assert(k2 <= k1, s"nprobe=2 kept $k2 must be <= nprobe=1 kept $k1")
    assertThrows[IllegalArgumentException](
      EmbeddingCosineDedup.probedRecall(emb, "embedding", "vec_id", cents,
        nprobe = 2, threshold = 0.35, sampleMod = 0))
  }

  test("hot-cell-capped probed dedup: matches a plain-Scala reference, prefix-stable, huge cap == uncapped, stats bound mass") {
    import spark.implicits._
    import graft.operators.vector.EmbeddingCosineDedup
    val rnd = new scala.util.Random(77)
    val dims = 6
    val vecs = (0L until 150L).map(i => (i, Array.fill(dims)(rnd.nextFloat() * 2 - 1)))
    val df = vecs.toDF("vec_id", "embedding")
    val cents: Seq[Seq[Double]] = vecs.take(4).map(_._2.toSeq.map(_.toDouble))
    val t = 0.2; val np = 2; val cap = 12
    def pairsOf(c: Option[Int], frame: org.apache.spark.sql.DataFrame = df) =
      EmbeddingCosineDedup.probedPairs(frame, "embedding", "vec_id", cents, np, t, c)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val uncapped = pairsOf(None)
    val capped = pairsOf(Some(cap))
    // the cap only removes candidates — and on this fixture it binds
    assert(capped.subsetOf(uncapped))
    assert(capped != uncapped, "vacuous fixture: cap removes nothing")
    // a cap wider than the corpus is a no-op
    assert(pairsOf(Some(100000)) == uncapped)
    // plain-Scala reference of the documented semantics: per cell, the
    // cap smallest ids participate; a pair needs a SHARED cell where
    // both members made the cap, plus the same cosine test
    def cosine(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        val x = a(i).toDouble; val y = b(i).toDouble
        dot += x * y; na += x * x; nb += y * y; i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    def probes(v: Array[Float]): Seq[Int] =
      cents.indices.map { i =>
        (graft.functions.VectorFunctions.l2sq(v.toSeq.map(_.toDouble), cents(i)), i)
      }.sorted.take(np).map(_._2)
    val members: Map[Int, Set[Long]] = cents.indices.map { c =>
      c -> vecs.filter(v => probes(v._2).contains(c)).map(_._1)
        .sorted.take(cap).toSet
    }.toMap
    val want = (for {
      (a, va) <- vecs; (b, vb) <- vecs
      if a < b && cents.indices.exists(c => members(c)(a) && members(c)(b))
      if cosine(va, vb) >= t
    } yield (a, b)).toSet
    assert(capped == want, "capped pairs must match the plain-Scala reference")
    // FIRST-cap prefix stability (the streaming-equivalence property):
    // membership depends only on smaller ids, so the pairs among a
    // prefix of the corpus are exactly the full run's pairs restricted
    // to that prefix
    val cut = 90L
    val prefixPairs = pairsOf(Some(cap), df.filter(col("vec_id") < cut))
    assert(prefixPairs == capped.filter(p => p._1 < cut && p._2 < cut))
    // recall readout: capped <= probed <= truth, ratios consistent
    val r = EmbeddingCosineDedup.cappedRecall(df, "embedding", "vec_id",
      cents, np, t, cap, sampleMod = 1).head()
    val (tp, pp, cp) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(cp <= pp && pp <= tp, s"capped $cp <= probed $pp <= truth $tp")
    assert(cp == capped.size && pp == uncapped.size)
    assert(math.abs(r.getDouble(4) - cp.toDouble / tp) < 1e-6)
    // stats: rows_capped = min(rows_probed, cap); capped mass bounded
    // at cap*(cap-1) regardless of the cell's true size
    val st = EmbeddingCosineDedup.probedCappedStats(
      df, "embedding", "vec_id", cents, np, cap).collect()
    st.foreach { s =>
      assert(s.getLong(2) == math.min(s.getLong(1), cap.toLong))
      assert(s.getLong(4) == s.getLong(2) * (s.getLong(2) - 1))
      assert(s.getLong(4) <= cap.toLong * (cap - 1))
    }
    assert(st.map(_.getLong(1)).sum == np.toLong * vecs.length)
    // operator surface: the cap can only DROP FEWER rows
    val keptCapped = new graft.operators.vector.ProbedCosineDedup(
      "embedding", "vec_id", t, cents, np, Some(cap))(df)
      .collect().map(_.getLong(0)).toSet
    val keptUncapped = new graft.operators.vector.ProbedCosineDedup(
      "embedding", "vec_id", t, cents, np)(df)
      .collect().map(_.getLong(0)).toSet
    assert(keptUncapped.subsetOf(keptCapped))
    assertThrows[IllegalArgumentException](
      EmbeddingCosineDedup.probedPairs(df, "embedding", "vec_id", cents, np, t, Some(0)))
  }

  test("anchored-cap probed dedup: matches a plain-Scala reference, between first-cap and uncapped, catches tail duplicates of anchors, linear mass") {
    import spark.implicits._
    import graft.operators.vector.EmbeddingCosineDedup
    val rnd = new scala.util.Random(77)
    val dims = 6
    val base = (0L until 150L).map(i => (i, Array.fill(dims)(rnd.nextFloat() * 2 - 1)))
    // a duplicate-heavy tail: 30 copies of vector 0 under large ids —
    // the adversarial hot-cell shape for a dedup cap (duplicates
    // CLUSTER, so the hot cell is exactly where the duplicates are)
    val vecs = base ++ (0L until 30L).map(i => (1000L + i, base.head._2))
    val df = vecs.toDF("vec_id", "embedding")
    val cents: Seq[Seq[Double]] = base.take(4).map(_._2.toSeq.map(_.toDouble))
    val t = 0.2; val np = 2; val cap = 12
    def pairsOf(anchored: Boolean, c: Option[Int],
        frame: org.apache.spark.sql.DataFrame = df) =
      EmbeddingCosineDedup.probedPairs(frame, "embedding", "vec_id", cents,
          np, t, c, anchored)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val uncapped = pairsOf(anchored = false, None)
    val first = pairsOf(anchored = false, Some(cap))
    val anch = pairsOf(anchored = true, Some(cap))
    // first ⊆ anchored ⊆ uncapped, all strict on this fixture
    assert(first.subsetOf(anch) && anch.subsetOf(uncapped))
    assert(first != anch && anch != uncapped, "vacuous fixture")
    // a cap wider than the corpus is a no-op in anchored mode too
    assert(pairsOf(anchored = true, Some(100000)) == uncapped)
    // THE anchored-cap guarantee the first-cap lacks: every tail copy
    // of vector 0 pairs with it (vec 0 is the globally smallest id, so
    // it anchors its own cell), while under the first-cap the copies
    // are invisible (both sides past the cap)
    val copies = (0L until 30L).map(1000L + _).toSet
    assert(copies.forall(c => anch((0L, c))),
      "anchored cap must catch tail duplicates of an anchor")
    assert(copies.forall(c => !first((0L, c))),
      "fixture check: the first-cap misses these by construction")
    // plain-Scala reference: pair (a,b), a<b caught iff some cell has a
    // among its cap smallest probed ids and b probing it, same cosine
    def cosine(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        val x = a(i).toDouble; val y = b(i).toDouble
        dot += x * y; na += x * x; nb += y * y; i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    def probes(v: Array[Float]): Seq[Int] =
      cents.indices.map { i =>
        (graft.functions.VectorFunctions.l2sq(v.toSeq.map(_.toDouble), cents(i)), i)
      }.sorted.take(np).map(_._2)
    val cellMembers: Map[Int, Seq[Long]] = cents.indices.map { c =>
      c -> vecs.filter(v => probes(v._2).contains(c)).map(_._1).sorted
    }.toMap
    val anchors: Map[Int, Set[Long]] =
      cellMembers.map { case (c, ms) => c -> ms.take(cap).toSet }
    val want = (for {
      (a, va) <- vecs; (b, vb) <- vecs
      if a < b
      if cents.indices.exists(c => anchors(c)(a) && cellMembers(c).contains(b))
      if cosine(va, vb) >= t
    } yield (a, b)).toSet
    assert(anch == want, "anchored pairs must match the plain-Scala reference")
    // prefix stability (the streaming-equivalence property): anchor
    // sets are the cap smallest ids, so pairs among a prefix equal the
    // full run's pairs restricted to that prefix
    val cut = 90L
    val prefixPairs = pairsOf(anchored = true, Some(cap), df.filter(col("vec_id") < cut))
    assert(prefixPairs == anch.filter(p => p._1 < cut && p._2 < cut))
    // recall readout: first <= anchored <= probed <= truth, consistent
    val r = EmbeddingCosineDedup.anchoredRecall(df, "embedding", "vec_id",
      cents, np, t, cap, sampleMod = 1).head()
    val (tp, pp, cp, ap) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(cp <= ap && ap <= pp && pp <= tp)
    assert(ap == anch.size && cp == first.size && pp == uncapped.size)
    assert(math.abs(r.getDouble(6) - ap.toDouble / tp) < 1e-6)
    // stats: the anchored mass column is a·(2c−a−1) — linear in c,
    // bounded by 2·cap·c regardless of skew
    val st = EmbeddingCosineDedup.anchoredCapStats(
      df, "embedding", "vec_id", cents, np, cap).collect()
    st.foreach { s =>
      val c = s.getLong(1); val a = s.getLong(2)
      assert(a == math.min(c, cap.toLong))
      assert(s.getLong(5) == a * (2 * c - a - 1))
      assert(s.getLong(5) <= 2L * cap * c)
    }
    assert(st.map(_.getLong(1)).sum == np.toLong * vecs.length)
    // operator surface: kept_uncapped ⊆ kept_anchored ⊆ kept_first
    def keptOf(mc: Option[Int], anchored: Boolean) =
      new graft.operators.vector.ProbedCosineDedup(
        "embedding", "vec_id", t, cents, np, mc, anchored)(df)
        .collect().map(_.getLong(0)).toSet
    val kU = keptOf(None, anchored = false)
    val kA = keptOf(Some(cap), anchored = true)
    val kF = keptOf(Some(cap), anchored = false)
    assert(kU.subsetOf(kA) && kA.subsetOf(kF))
    assert(copies.forall(c => !kA(c)), "anchored kept set must drop the tail copies")
    // anchoredCap without a cap is a config error
    assertThrows[IllegalArgumentException](
      EmbeddingCosineDedup.probedPairs(df, "embedding", "vec_id", cents,
        np, t, None, anchoredCap = true))
    assertThrows[IllegalArgumentException](
      new graft.operators.vector.ProbedCosineDedup(
        "embedding", "vec_id", t, cents, np, None, anchoredCap = true))
  }

  test("auto-bucketed cosine dedup fits k-means ONCE per input frame across apply/rejected/mark") {
    val emb = table("embeddings")
    // probed tier (nprobe > 1): apply + rejected + mark on the same
    // frame used to train three separate models (VERDICT r16 #3)
    val probed = new graft.operators.vector.AutoBucketedCosineDedup(
      "embedding", "vec_id", 0.35, numBuckets = 8, nprobe = 2)
    val keptN = probed(emb).count()
    val rejN = probed.rejected(emb).count()
    probed.mark(emb, lit(true), "t")
    assert(probed.fitCount.get() == 1,
      s"expected one k-means fit, got ${probed.fitCount.get()}")
    assert(keptN + rejN == emb.count())
    // single-assignment tier (nprobe = 1) shares the same cache
    val plain = new graft.operators.vector.AutoBucketedCosineDedup(
      "embedding", "vec_id", 0.35, numBuckets = 8)
    plain(emb).count(); plain.rejected(emb).count()
    assert(plain.fitCount.get() == 1)
    // capped registry path routes through the probed tier even at
    // nprobe=1 and keeps at least the uncapped survivors
    val cappedOp = new graft.operators.vector.AutoBucketedCosineDedup(
      "embedding", "vec_id", 0.35, numBuckets = 8, nprobe = 1,
      maxCellSize = Some(10))
    assert(cappedOp(emb).count() >= plain(emb).count())
    assert(cappedOp.fitCount.get() == 1)
  }

  test("semdedup keep: matches a plain-Scala union-find + argmin reference; singletons always survive") {
    import spark.implicits._
    import graft.operators.vector.EmbeddingCosineDedup
    val rnd = new scala.util.Random(55)
    val dims = 6
    val base = (0L until 120L).map(i => (i, Array.fill(dims)(rnd.nextFloat() * 2 - 1)))
    // duplicate families: jittered copies of three seeds, landing at
    // scattered ids so components span the id range
    def jitter(v: Array[Float]): Array[Float] =
      v.map(x => x + (rnd.nextFloat() - 0.5f) * 0.01f)
    val fam = (0L until 18L).map(i =>
      (300L + i, jitter(base((i % 3).toInt)._2)))
    val vecs = base ++ fam
    val df = vecs.toDF("vec_id", "embedding")
    val cents: Seq[Seq[Double]] = base.take(4).map(_._2.toSeq.map(_.toDouble))
    val t = 0.9; val np = 2
    val kept = EmbeddingCosineDedup.semDeDupKeep(df, "embedding", "vec_id",
      cents, np, t).select("vec_id").collect().map(_.getLong(0)).toSet
    // plain-Scala reference: probed pairs (uncapped), union-find
    // components, per-component argmin of (cosine-to-primary-centroid,
    // id); everything unclustered survives
    def cosine(a: Seq[Double], b: Seq[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    def vd(v: Array[Float]): Seq[Double] = v.toSeq.map(_.toDouble)
    def probes(v: Array[Float]): Seq[Int] =
      cents.indices.map { i =>
        (graft.functions.VectorFunctions.l2sq(vd(v), cents(i)), i)
      }.sorted.take(np).map(_._2)
    val pairs = (for {
      (a, va) <- vecs; (b, vb) <- vecs
      if a < b && probes(va).intersect(probes(vb)).nonEmpty
      if cosine(vd(va), vd(vb)) >= t
    } yield (a, b))
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val comps = pairs.flatMap(p => Seq(p._1, p._2)).distinct
      .groupBy(find)
    val vecOf = vecs.toMap
    val dropWant = comps.values.flatMap { members =>
      val keep = members.minBy { id =>
        val v = vecOf(id)
        (cosine(vd(v), cents(probes(v).head)), id)
      }
      members.filterNot(_ == keep)
    }.toSet
    val keptWant = vecs.map(_._1).toSet diff dropWant
    assert(kept == keptWant,
      s"sym-diff: ${(kept diff keptWant) union (keptWant diff kept)}")
    // the families actually clustered (non-vacuous) and each kept
    // exactly one member
    assert(dropWant.nonEmpty && kept.size < vecs.size)
  }

  test("semantic cluster stats: keepers are exactly the clustered survivors of semDeDupKeep, sizes >= 2, sizes sum to clustered nodes") {
    import graft.operators.vector.EmbeddingCosineDedup
    val emb = table("embeddings")
    val cents = new graft.operators.ml.KMeansBuckets("embedding", "cluster_id", 8)
      .firstKCentroids(emb, "vec_id")
    val st = EmbeddingCosineDedup.semanticClusterStats(emb, "embedding",
      "vec_id", cents, nprobe = 3, threshold = 0.35).collect()
    assert(st.nonEmpty && st.forall(_.getLong(1) >= 2L), "only true clusters appear")
    val keepers = st.map(_.getLong(2)).toSet
    val kept = EmbeddingCosineDedup.semDeDupKeep(emb, "embedding", "vec_id",
      cents, nprobe = 3, threshold = 0.35)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(keepers.subsetOf(kept), s"non-kept keepers: ${keepers diff kept}")
    // Σ sizes = clustered nodes = corpus − kept + keepers (each
    // component keeps exactly one member)
    val n = emb.count()
    assert(st.map(_.getLong(1)).sum == n - kept.size + keepers.size)
  }

  test("keep_policy=semdedup on the auto-bucketed operator: partition, keeper provenance, one fit, equals the direct rule") {
    val emb = table("embeddings")
    val op = new graft.operators.vector.AutoBucketedCosineDedup(
      "embedding", "vec_id", 0.35, numBuckets = 8, seed = 42L, nprobe = 2,
      keepPolicy = "semdedup")
    val kept = op(emb).select("vec_id").collect().map(_.getLong(0)).toSet
    val rej = op.rejected(emb)
    val rejIds = rej.select("vec_id").collect().map(_.getLong(0)).toSet
    val all = emb.select("vec_id").collect().map(_.getLong(0)).toSet
    assert(kept.intersect(rejIds).isEmpty && (kept union rejIds) == all)
    assert(op.fitCount.get() == 1, "apply + rejected must share one k-means fit")
    // rejected provenance: every representative is a KEPT id (the
    // component's keeper), never another dropped row
    val reps = rej.select(col(graft.core.Rejection.ColName)("representative_id"))
      .collect().map(_.getString(0).toLong).toSet
    assert(reps.subsetOf(kept), s"non-kept reps: ${reps diff kept}")
    // equals the direct published rule under the same trained centroids
    val km = new graft.operators.ml.KMeansBuckets("embedding", "_b", 8, 42L)
    val want = graft.operators.vector.EmbeddingCosineDedup.semDeDupKeep(
        emb, "embedding", "vec_id", km.centroidsOf(km.fit(emb)),
        nprobe = 2, threshold = 0.35)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(kept == want)
    assert(kept != all, "vacuous fixture: nothing dropped")
    // the policies genuinely differ on this fixture (semdedup keeps the
    // far member, first-wins the min id) while dropping the same COUNT
    // per component is not guaranteed — compare sets
    val first = new graft.operators.vector.AutoBucketedCosineDedup(
      "embedding", "vec_id", 0.35, numBuckets = 8, seed = 42L, nprobe = 2)(emb)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(first != kept, "fixture too easy: both policies picked identical keepers")
    assertThrows[IllegalArgumentException](
      new graft.operators.vector.AutoBucketedCosineDedup(
        "embedding", "vec_id", 0.35, keepPolicy = "sideways"))
  }

  test("explicit-bucket cap policies equal the probed tier at nprobe=1 over the same partition") {
    import spark.implicits._
    import graft.operators.vector.EmbeddingCosineDedup
    val rnd = new scala.util.Random(91)
    val base = (0L until 120L).map(i => (i, Array.fill(6)(rnd.nextFloat() * 2 - 1)))
    val vecs = base ++ (0L until 20L).map(i => (500L + i, base.head._2))
    val df = vecs.toDF("vec_id", "embedding")
    val cents: Seq[Seq[Double]] = base.take(4).map(_._2.toSeq.map(_.toDouble))
    val t = 0.2; val cap = 10
    // bucket = the nprobe=1 assignment, so the bucketed tier and the
    // probed tier run the SAME partition — capped pairs must agree
    // policy-for-policy
    val withBk = df.withColumn("_bk",
      graft.plans.kernels.nearest_centroid(col("embedding"), cents))
    def pairsOf(frame: org.apache.spark.sql.DataFrame) =
      frame.select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def bucketed(mc: Option[Int], anchored: Boolean) =
      pairsOf(new EmbeddingCosineDedup("embedding", "vec_id", t,
        Some("_bk"), mc, anchored).verifiedPairs(withBk))
    def probed(mc: Option[Int], anchored: Boolean) =
      pairsOf(EmbeddingCosineDedup.probedPairs(df, "embedding", "vec_id",
        cents, 1, t, mc, anchored))
    assert(bucketed(None, anchored = false) == probed(None, anchored = false))
    assert(bucketed(Some(cap), anchored = false) == probed(Some(cap), anchored = false))
    assert(bucketed(Some(cap), anchored = true) == probed(Some(cap), anchored = true))
    // the cap binds and the policies differ on this fixture
    assert(bucketed(Some(cap), anchored = false) != bucketed(Some(cap), anchored = true))
    assert(bucketed(Some(cap), anchored = true) != bucketed(None, anchored = false))
    // config errors: a cap without buckets (brute force has nothing to
    // cap), anchored without a cap
    assertThrows[IllegalArgumentException](new EmbeddingCosineDedup(
      "embedding", "vec_id", t, None, Some(cap)))
    assertThrows[IllegalArgumentException](new EmbeddingCosineDedup(
      "embedding", "vec_id", t, Some("_bk"), None, anchoredCap = true))
  }

  test("trainSampleMod fits k-means on the deterministic id sample and assigns the full corpus") {
    val emb = table("embeddings")
    val mod = 3
    val sampled = new graft.operators.vector.AutoBucketedCosineDedup(
      "embedding", "vec_id", 0.35, numBuckets = 8, seed = 42L,
      nprobe = 2, trainSampleMod = Some(mod))
    val got = sampled(emb).select("vec_id").collect().map(_.getLong(0)).toSet
    // reference: centroids of a fit on exactly the 1-in-mod sample,
    // fed to the probed tier over the FULL corpus
    val km = new graft.operators.ml.KMeansBuckets("embedding", "_b", 8, 42L)
    val cents = km.centroidsOf(km.fit(
      emb.filter(col("vec_id") % mod === 0)))
    val want = new graft.operators.vector.ProbedCosineDedup(
        "embedding", "vec_id", 0.35, cents, nprobe = 2)(emb)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(got == want,
      s"sampled-fit kept (${got.size}) must equal the direct run (${want.size})")
    // the sampled fit must differ from the full fit on this fixture —
    // otherwise the test pins nothing
    val full = new graft.operators.vector.AutoBucketedCosineDedup(
      "embedding", "vec_id", 0.35, numBuckets = 8, seed = 42L, nprobe = 2)
    assert(sampled.fitCount.get() == 1)
    // both are valid dedups of the same corpus (sanity, not equality)
    assert(got.nonEmpty && full(emb).count() > 0)
    assertThrows[IllegalArgumentException](
      new graft.operators.vector.AutoBucketedCosineDedup(
        "embedding", "vec_id", 0.35, numBuckets = 8,
        trainSampleMod = Some(0)))
    // a mod that leaves no training rows names the knob instead of
    // failing deep inside the MLlib fit
    val noZero = emb.filter(col("vec_id") >= 1 && col("vec_id") <= 50)
    val err = intercept[IllegalArgumentException](
      new graft.operators.vector.AutoBucketedCosineDedup(
        "embedding", "vec_id", 0.35, numBuckets = 8, nprobe = 2,
        trainSampleMod = Some(1000))(noZero).count())
    assert(err.getMessage.contains("train_sample_mod"))
  }

  test("cap operating point: every level equals an independent anchored run; mass matches anchored stats; chosen unique; recall monotone") {
    import graft.operators.vector.EmbeddingCosineDedup
    val emb = table("embeddings")
    val cents = new graft.operators.ml.KMeansBuckets("embedding", "cluster_id", 8)
      .firstKCentroids(emb, "vec_id")
    val caps = Seq(10, 40, 160, 640)
    val rows = EmbeddingCosineDedup.anchoredCapOperatingPoint(emb, "embedding",
      "vec_id", cents, nprobe = 3, threshold = 0.35, caps,
      targetRecall = 0.8, sampleMod = 2).collect()
    assert(rows.map(_.getInt(0)).toSeq == caps)
    assert(rows.count(_.getBoolean(5)) == 1, "exactly one chosen row")
    // recall is monotone in the cap (a bigger cap only adds anchors)
    val recalls = rows.map(r => if (r.isNullAt(4)) 0.0 else r.getDouble(4))
    assert(recalls.sliding(2).forall(w => w(0) <= w(1) + 1e-9), recalls.toSeq)
    // the chosen row is the smallest cap meeting the target, else the
    // smallest achieving the max measured recall
    val target = 0.8
    val wantChosen = rows.find(r => !r.isNullAt(4) && r.getDouble(4) >= target)
      .map(_.getInt(0))
      .getOrElse(rows.filter(r => !r.isNullAt(4) &&
        r.getDouble(4) == recalls.max).map(_.getInt(0)).min)
    assert(rows.find(_.getBoolean(5)).get.getInt(0) == wantChosen)
    // every level's caught count equals an INDEPENDENT anchored run on
    // the same deterministic sample; mass equals the anchored stats sum
    val sample = emb.filter(col("embedding").isNotNull && col("vec_id") % 2 === 0)
      .select(col("vec_id"), col("embedding"))
    caps.foreach { cap =>
      val row = rows.find(_.getInt(0) == cap).get
      val ind = EmbeddingCosineDedup.probedPairs(sample, "embedding", "vec_id",
        cents, 3, 0.35, Some(cap), anchoredCap = true).count()
      assert(row.getLong(2) == ind, s"cap=$cap caught ${row.getLong(2)} != $ind")
      val stSum = EmbeddingCosineDedup.anchoredCapStats(sample, "embedding",
        "vec_id", cents, 3, cap)
        .agg(org.apache.spark.sql.functions.sum(col("cand_pairs_anchored")))
        .head().getLong(0)
      assert(row.getLong(3) == stSum, s"cap=$cap mass ${row.getLong(3)} != $stSum")
    }
    // config errors: unsorted / duplicate / non-positive cap lists
    assertThrows[IllegalArgumentException](
      EmbeddingCosineDedup.anchoredCapOperatingPoint(emb, "embedding", "vec_id",
        cents, 3, 0.35, Seq(40, 10), 0.8, sampleMod = 2))
    assertThrows[IllegalArgumentException](
      EmbeddingCosineDedup.anchoredCapOperatingPoint(emb, "embedding", "vec_id",
        cents, 3, 0.35, Seq(10, 10), 0.8, sampleMod = 2))
    assertThrows[IllegalArgumentException](
      EmbeddingCosineDedup.anchoredCapOperatingPoint(emb, "embedding", "vec_id",
        cents, 3, 0.35, Seq(0, 10), 0.8, sampleMod = 2))
  }

  test("nprobe operating point: every level equals an independent probed run; mass matches cluster stats; chosen unique") {
    import graft.operators.vector.EmbeddingCosineDedup
    val emb = table("embeddings")
    val cents = new graft.operators.ml.KMeansBuckets("embedding", "cluster_id", 8)
      .firstKCentroids(emb, "vec_id")
    graft.core.Staging.scoped {
      val rows = EmbeddingCosineDedup.probedOperatingPoint(emb, "embedding",
        "vec_id", cents, maxNprobe = 3, threshold = 0.35,
        targetRecall = 0.8, sampleMod = 4).collect()
      assert(rows.map(_.getInt(0)).toSeq == Seq(1, 2, 3))
      val sample = emb.filter(col("embedding").isNotNull && col("vec_id") % 4 === 0)
      for (r <- rows) {
        val lv = r.getInt(0)
        // leveled one-pass == an independent probedPairs run at nprobe=lv
        val direct = EmbeddingCosineDedup.probedPairs(sample, "embedding",
          "vec_id", cents, lv, 0.35).count()
        assert(r.getLong(2) == direct,
          s"nprobe=$lv: leveled ${r.getLong(2)} vs independent $direct")
        // candidate mass == the cluster-stats readout at that level
        val massDirect = EmbeddingCosineDedup.probedClusterStats(sample,
            "embedding", "vec_id", cents, lv)
          .collect().map(s => s.getLong(2) * (s.getLong(2) - 1)).sum
        assert(r.getLong(3) == massDirect,
          s"nprobe=$lv: mass ${r.getLong(3)} vs stats $massDirect")
      }
      // monotone recall and mass; exactly one chosen row
      val caught = rows.map(_.getLong(2))
      assert(caught.zip(caught.tail).forall { case (a, b) => a <= b })
      val mass = rows.map(_.getLong(3))
      assert(mass.zip(mass.tail).forall { case (a, b) => a <= b })
      assert(rows.count(_.getBoolean(5)) == 1)
      // truth agrees with the recall gate's truth on the same sample
      val pr = EmbeddingCosineDedup.probedRecall(emb, "embedding", "vec_id",
        cents, nprobe = 2, threshold = 0.35, sampleMod = 4).head()
      assert(rows(0).getLong(1) == pr.getLong(0), "same truth pairs")
      assert(rows(1).getLong(2) == pr.getLong(2), "level 2 == probed_pairs")
      assertThrows[IllegalArgumentException](
        EmbeddingCosineDedup.probedOperatingPoint(emb, "embedding", "vec_id",
          cents, maxNprobe = 0, threshold = 0.35, targetRecall = 0.8,
          sampleMod = 4))
    }
  }

  test("anchor candidates first-cap: cap monotone, full cap equals the uncapped co-bucket pair set") {
    import graft.operators.vector.AnnSearch
    val emb = table("embeddings")
    val bands = Seq(0 until 4, 4 until 8)
    val stats = AnnSearch.bandStatsOf(emb, "embedding", bands)
    def pairs(cap: Int) = AnnSearch.anchorCandidatesFirstCap(emb, "embedding",
        "vec_id", bands, cap, 0.35, stats)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val tiny = pairs(1)  // every bucket holds one member: no pairs
    assert(tiny.isEmpty)
    val mid = pairs(20) // below the fixture's ~31-row mean bucket: engages
    val big = pairs(1000000)
    assert(mid.subsetOf(big), "a bigger cap keeps a superset membership")
    assert(big.nonEmpty && mid.size < big.size,
      s"cap must engage on the fixture: mid ${mid.size} vs big ${big.size}")
  }
}
