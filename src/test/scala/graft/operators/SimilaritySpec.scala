package graft.operators

import graft.SparkSpec

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private def emb(rows: (Long, Seq[Float], Int)*) =
    rows.toSeq.toDF("vec_id", "embedding", "label")

  test("cosineNearDup: identical vectors have cosine 1.0, orthogonal absent") {
    val d = emb((1L, Seq(1f, 0f, 2f), 0), (2L, Seq(1f, 0f, 2f), 0),
      (3L, Seq(0f, 5f, 0f), 1))
    val out = Similarity.cosineNearDup(d).collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((1L, 2L)))
    assert(out.head.getAs[Double]("cosine") == 1.0)
  }

  test("semanticClusters: a transitive cosine CHAIN merges into one " +
    "component; orthogonal vectors join nothing") {
    // 1-2 and 2-3 clear cos >= 0.5 but 1-3 does NOT (cos(1,3) ≈ 0.33):
    // only the transitive closure puts all three in one cluster
    val d = emb(
      (1L, Seq(1f, 0f, 0f), 0),
      (2L, Seq(1f, 1f, 0f), 0),
      (3L, Seq(0.2f, 1f, 0f), 0),
      (7L, Seq(0f, 0f, 1f), 1),   // orthogonal to all of 1/2/3
      (8L, Seq(0f, 0f, 2f), 1))   // pairs only with 7
    val out = Similarity.semanticClusters(d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(out == Seq((1L, 3L, 3L), (7L, 2L, 8L)), out.toString)
    assertDeterministic(Similarity.semanticClusters(d))
  }

  test("nearDupDegreeProfile: isolated vectors report degree 0; cliques " +
    "and pairs land in the right histogram cells") {
    // {1,2,3} colinear → 3-clique, degree 2 each; {7,8} colinear pair,
    // degree 1 each; 9 orthogonal to both directions → degree 0
    val d = emb(
      (1L, Seq(1f, 0f, 0f), 0), (2L, Seq(2f, 0f, 0f), 0),
      (3L, Seq(3f, 0f, 0f), 0),
      (7L, Seq(0f, 1f, 0f), 1), (8L, Seq(0f, 2f, 0f), 1),
      (9L, Seq(0f, 0f, 1f), 2))
    val out = Similarity.nearDupDegreeProfile(d).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(out == Seq((0L, 1L), (1L, 2L), (2L, 3L)), out.toString)
    assertDeterministic(Similarity.nearDupDegreeProfile(d))
  }

  test("semanticClustersLsh: exact duplicates always cluster (identical " +
    "buckets in every table); LSH components refine the exact ones") {
    val d = emb(
      (1L, Seq(1f, 0f, 2f), 0), (2L, Seq(1f, 0f, 2f), 0), // identical pair
      (3L, Seq(0f, 5f, 0f), 1),                           // orthogonal
      (4L, Seq(2f, 0f, 4f), 0))                           // scaled copy of 1
    val out = Similarity.semanticClustersLsh(d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // cos(1,2)=cos(1,4)=1.0 — same bucket in every table, recall 1.0
    assert(out == Seq((1L, 3L, 4L)), out.toString)
    // refinement: every LSH edge is an exact-cosine edge, so each LSH
    // component sits inside one exact component
    val rnd = new scala.util.Random(7)
    val big = emb((0L until 60L).map(i =>
      (i, Seq.fill(6)(rnd.nextFloat() - 0.5f), 0)): _*)
    val exact = Similarity.cosineNearDup(big).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lshPairs = Similarity.lshNearDupPairs(big, 0.5, 4, 4).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lshPairs.subsetOf(exact), (lshPairs -- exact).toString)
    assertDeterministic(Similarity.semanticClustersLsh(d))
  }

  test("clusterReps: the exemplar is the member with max integer " +
    "centroid-dot, matching a BigInt brute force; singletons are absent") {
    // chain cluster {1,2,3} (1-2, 2-3 similar; 1-3 only transitively) and
    // pair {7,8}; vec 9 is orthogonal to everything -> no edge, no row
    val d = emb(
      (1L, Seq(1f, 0f, 0f), 0),
      (2L, Seq(1f, 1f, 0f), 0),
      (3L, Seq(0.2f, 1f, 0f), 0),
      (7L, Seq(0f, 0f, 1f), 1),
      (8L, Seq(0f, 0f, 2f), 1),
      (9L, Seq(0f, -3f, 0.1f), 2))
    // brute force on the SAME quantization: qv = round(x * 10^4)
    val qv = Map(
      1L -> Seq(10000L, 0L, 0L), 2L -> Seq(10000L, 10000L, 0L),
      3L -> Seq(2000L, 10000L, 0L), 7L -> Seq(0L, 0L, 10000L),
      8L -> Seq(0L, 0L, 20000L))
    def repOf(ms: Seq[Long]): (Long, Long) = {
      val cent = ms.map(qv).transpose.map(_.sum)
      ms.map(v => (v, qv(v).zip(cent).map { case (a, b) => a * b }.sum))
        .minBy { case (v, dot) => (-dot, v) }
    }
    val (r1, d1) = repOf(Seq(1L, 2L, 3L))
    val (r2, d2) = repOf(Seq(7L, 8L))
    val out = Similarity.clusterReps(d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(out == Seq((1L, 3L, r1, d1), (7L, 2L, r2, d2)), s"got $out")
    assertDeterministic(Similarity.clusterReps(d))
  }

  test("annBruteTopK ranks nearer vectors first with stable tie-break") {
    val d = emb(
      (0L, Seq(1f, 0f), 0),   // query
      (10L, Seq(1f, 0.1f), 0), // close
      (11L, Seq(1f, 1f), 0),   // 45°
      (12L, Seq(-1f, 0f), 0))  // opposite
    val out = Similarity.annBruteTopK(d, k = 3, nQueries = 1).collect()
    assert(out.map(_.getAs[Long]("nid")).toSeq == Seq(10L, 11L, 12L))
    assert(out.map(_.getAs[Int]("rank")).toSeq == Seq(1, 2, 3))
  }

  test("annLshTopK: bucketed neighbors are a subset of brute-force ranking") {
    val rnd = new scala.util.Random(1)
    val d = emb((0L until 40L).map(i =>
      (i, Seq.fill(8)(rnd.nextFloat() - 0.5f), 0)): _*)
    val brute = Similarity.annBruteTopK(d, k = 39, nQueries = 3).collect()
      .map(r => (r.getLong(0), r.getAs[Long]("nid"))).toSet
    val lsh = Similarity.annLshTopK(d, k = 5, nQueries = 3).collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("nid"))).toSet
    assert(lsh.subsetOf(brute)) // every LSH hit is a real vector pair
    assert(lsh.nonEmpty)
  }

  test("quantized cosine is deterministic across executions") {
    val rnd = new scala.util.Random(2)
    val d = emb((0L until 30L).map(i =>
      (i, Seq.fill(16)(rnd.nextFloat() - 0.5f), 0)): _*)
    assertDeterministic(Similarity.annBruteTopK(d, k = 5, nQueries = 5))
  }

  test("int8QuantStats: error is zero when a dimension has <=255 distinct " +
    "steps it can hit exactly, bounded by (step/2)^2 per dim otherwise") {
    // dim 0 spans [0, 0.0254] in 1e-4 steps → range 254 in qv units: every
    // value lands exactly on a code → zero reconstruction error
    val exact = (0 until 255).map(i =>
      (i.toLong, Seq(i * 0.0001f, 0f), 0))
    val outExact = Similarity.int8QuantStats(emb(exact: _*)).collect()
    assert(outExact.length == 1)
    assert(outExact.head.getAs[Long]("total_err_q8") == 0L,
      outExact.head.toString)
    // a wide range quantizes with error ≤ (ceil(range/254)/2)^2 per dim
    val rnd = new scala.util.Random(7)
    val wide = (0 until 200).map(i =>
      (i.toLong, Seq.fill(4)(rnd.nextFloat() * 2f - 1f), i % 3))
    val out = Similarity.int8QuantStats(emb(wide: _*)).collect()
    assert(out.map(_.getInt(0)).toSeq == Seq(0, 1, 2))
    // range ≤ 20000 qv units → step ≤ ceil(20000/254) = 79 → per-dim err
    // ≤ (79/2 + 1)^2 < 1681; 4 dims → < 6724 per vector
    out.foreach { r =>
      assert(r.getAs[Long]("max_err_q8") < 4L * 1681L, r.toString)
      assert(r.getAs[Long]("avg_err_q8") <= r.getAs[Long]("max_err_q8"))
      assert(r.getAs[Long]("total_err_q8") >= 0L)
    }
    assertDeterministic(Similarity.int8QuantStats(emb(wide: _*)))
  }

  test("dimProfile: per-dimension n/sum/min/max/variance are integer-exact") {
    // dim 0 values (quantized): 10000, 30000, 20000 → n=3, sum=60000,
    // var = (3·(1e8+9e8+4e8) − 36e8)/9 = 6e8/9 = 66666666 (σ²=2/3 in
    // q8 units); dim 1 is DEAD (all-zero rows); dim 2 constant → var 0
    val d = emb(
      (1L, Seq(1f, 0f, 0.5f), 0),
      (2L, Seq(3f, 0f, 0.5f), 0),
      (3L, Seq(2f, 0f, 0.5f), 1))
    val out = Similarity.dimProfile(d).collect()
    assert(out.length == 3)
    val d0 = out(0)
    assert(d0.getInt(0) == 0 && d0.getLong(1) == 3L && d0.getLong(2) == 60000L)
    assert(d0.getLong(3) == 10000L && d0.getLong(4) == 30000L)
    assert(d0.getLong(5) == (3L * 1400000000L - 60000L * 60000L) / 9L,
      d0.toString)
    assert(d0.getLong(5) == 66666666L)
    val d1 = out(1)
    assert(d1.getLong(2) == 0L && d1.getLong(5) == 0L)
    val d2 = out(2)
    assert(d2.getLong(3) == 5000L && d2.getLong(4) == 5000L &&
      d2.getLong(5) == 0L)
    assertDeterministic(Similarity.dimProfile(d))
  }

  test("hardNegatives: picks the nearest CROSS-label vector, never a " +
    "same-label one, even when the same-label vector is closer") {
    // query 0 (label 0): vec 1 is identical but SAME label — must be
    // skipped; vec 2 is slightly rotated with label 1 — the hard
    // negative; vec 3 is label 1 but near-orthogonal
    val d = emb(
      (0L, Seq(1f, 0f, 0f, 0f), 0),
      (1L, Seq(1f, 0f, 0f, 0f), 0),
      (2L, Seq(1f, 0.2f, 0f, 0f), 1),
      (3L, Seq(0.05f, 1f, 0f, 0f), 1))
    val out = Similarity.hardNegatives(d, nQueries = 1,
      planes = 2, probeRadius = 2).collect()
    // radius = planes ⇒ every bucket probed: recall is exhaustive, so
    // the pick is exactly the brute-force cross-label argmax
    assert(out.length == 1, out.mkString(","))
    val r = out.head
    assert(r.getLong(0) == 0L && r.getInt(1) == 0)
    assert(r.getLong(2) == 2L && r.getInt(3) == 1, r.toString)
    assert(r.getDouble(4) > 0.9 && r.getDouble(4) < 1.0)
    assertDeterministic(Similarity.hardNegatives(d, nQueries = 1,
      planes = 2, probeRadius = 2))
  }

  test("kmeansStep: an identical-vector corpus collapses onto one seed " +
    "with zero inertia and zero centroid movement") {
    // both seeds are copies of the same vector; the score tie breaks to
    // the lower index, so cluster 0 takes everything and cluster 1
    // vanishes (empty clusters emit no row, as at scale)
    val d = emb((1L, Seq(1f, 2f, 0f), 0), (2L, Seq(1f, 2f, 0f), 0),
      (3L, Seq(1f, 2f, 0f), 0))
    val out = Similarity.kmeansStep(d, centroids = 2).collect()
    assert(out.length == 1, out.mkString(","))
    val r = out.head
    assert(r.getAs[Int]("cluster") == 0)
    assert(r.getAs[Long]("n_vecs") == 3L)
    assert(r.getAs[Long]("inertia") == 0L)
    assert(r.getAs[Long]("shift2") == 0L)
  }

  test("kmeansStep: sizes partition the corpus, inertia is nonnegative, " +
    "and the result is partitioning-independent") {
    val d = emb((0L until 12L).map(i =>
      (i, Seq(math.cos(i * 0.5).toFloat, math.sin(i * 0.5).toFloat,
        (i % 3).toFloat), (i % 3).toInt)): _*)
    def run(df: org.apache.spark.sql.DataFrame) =
      Similarity.kmeansStep(df, centroids = 3).collect()
        .map(r => (r.getAs[Int]("cluster"), r.getAs[Long]("n_vecs"),
          r.getAs[Long]("inertia"), r.getAs[Long]("shift2"))).toSeq
    val out = run(d)
    assert(out.map(_._2).sum == 12L, out.toString)
    assert(out.forall(c => c._3 >= 0L && c._4 >= 0L))
    assert(run(d.repartition(7)) == out)
  }

  test("pageRankHubs: a symmetric clique holds the uniform rank as an " +
    "exact fixed point; vectors outside the graph get no row") {
    // K3 of colinear vectors: deg 2 each, contribution 10⁶ DIV 2 from
    // both neighbors → r = 150000 + 85·10⁶ DIV 100 = 10⁶ every round.
    // Vector 9 pairs with nothing (cos ≈ −1) — dropped, not rank 0.
    val d = emb(
      (1L, Seq(1f, 0f), 0), (2L, Seq(2f, 0f), 0), (3L, Seq(3f, 0f), 0),
      (9L, Seq(-1f, 0.01f), 1))
    val out = Similarity.pageRankHubs(d).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(out == Seq((1L, 1000000L), (2L, 1000000L), (3L, 1000000L)),
      out.toString)
    assertDeterministic(Similarity.pageRankHubs(d))
  }

  test("annRecallAudit: exhaustive probing (radius = planes) makes the " +
    "LSH side complete, so every query reads recall 1000 permille") {
    val d = emb((0L until 8L).map(i =>
      (i, Seq(math.cos(i * 0.7).toFloat, math.sin(i * 0.7).toFloat,
        (i % 2).toFloat), (i % 2).toInt)): _*)
    val out = Similarity.annRecallAudit(d, k = 2, nQueries = 3,
      planes = 2, probeRadius = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(out == Seq((0L, 2L, 2L, 1000L), (1L, 2L, 2L, 1000L),
      (2L, 2L, 2L, 1000L)), out.toString)
    // hits can never exceed truth: n_hit ≤ n_true by the join shape
    assertDeterministic(Similarity.annRecallAudit(d, k = 2, nQueries = 3,
      planes = 2, probeRadius = 2))
  }

  test("triangleCensus: a 3-clique yields one triangle per member; a " +
    "mere pair yields a zero-triangle bucket; isolates stay out") {
    val d = emb(
      (1L, Seq(1f, 0f, 0f), 0), (2L, Seq(2f, 0f, 0f), 0),
      (3L, Seq(3f, 0f, 0f), 0),                      // clique K3
      (7L, Seq(0f, 1f, 0f), 1), (8L, Seq(0f, 2f, 0f), 1), // pair, no triangle
      (9L, Seq(0f, 0f, 1f), 2))                      // isolated: no row
    val out = Similarity.triangleCensus(d).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(out == Seq((0L, 2L), (1L, 3L)), out.toString)
    assertDeterministic(Similarity.triangleCensus(d))
    // the wedge-volume tripwire fires loudly on a bound the graph
    // exceeds, instead of letting the cubic join run
    val e = intercept[Exception] {
      Similarity.triangleCensus(d, maxWedges = 0L).collect()
    }
    assert(e.getMessage.contains("maxWedges"), e.getMessage)
  }

  test("triangleSample: sampleMod=1 IS the exact census (clique of 12 → " +
    "C(12,3) triangles); sampleMod=2 keeps a deterministic md5 edge " +
    "subset with tri_est = 8·tri_sampled; tripwire names sampleMod") {
    // 12 colinear vectors = a 12-clique at any positive threshold
    val d = emb((1L to 12L).map(i =>
      (i, Seq(i.toFloat, 0f, 0f), 0)): _*)
    val exact = Similarity.triangleSample(d, threshold = 0.3, sampleMod = 1)
      .as[(Long, Long, Long, Long)].head()
    assert(exact == ((66L, 66L, 220L, 220L)), exact.toString)
    val sampled = Similarity.triangleSample(d, threshold = 0.3, sampleMod = 2)
      .as[(Long, Long, Long, Long)].head()
    assert(sampled._1 == 66L)
    assert(sampled._2 < 66L && sampled._2 > 0L, sampled.toString)
    assert(sampled._4 == 8L * sampled._3, sampled.toString)
    assertDeterministic(
      Similarity.triangleSample(d, threshold = 0.3, sampleMod = 2))
    val e = intercept[Exception] {
      Similarity.triangleSample(d, threshold = 0.3, sampleMod = 2,
        maxWedges = 0L).collect()
    }
    assert(e.getMessage.contains("sampleMod"), e.getMessage)
  }

  test("vectorAudit: null / wrong-dims / NaN / out-of-range / zero-norm " +
    "vectors each land in exactly one bucket, in precedence order; norms " +
    "only from ok; finite-but-huge components classify instead of throwing") {
    val rows = Seq(
      (1L, Some(Seq(1f, 0f)), 0),                 // ok, n2 = 10⁸
      (2L, Some(Seq(3f, 4f)), 0),                 // ok, n2 = 25·10⁸
      (3L, None: Option[Seq[Float]], 0),          // null
      (4L, Some(Seq(1f, 2f, 3f)), 0),             // wrong dims
      (5L, Some(Seq(Float.NaN, 1f)), 0),          // non-finite (despite NaN≠NaN)
      (6L, Some(Seq(0f, 0f)), 0),                 // zero norm
      // finite but past the int64-safe quantization ceiling for 2 dims
      // (≈2.1e5): its quantized square would overflow a + x*x — the
      // audit must BUCKET it, not raise an ANSI ArithmeticException
      (7L, Some(Seq(1e7f, 1f)), 0),
      (8L, Some(Seq(3e18f, 0f)), 0))              // ditto, near double range
    val d = rows.toDF("vec_id", "embedding", "label")
    val out = Similarity.vectorAudit(d, expectDims = 2).collect()
      .map(r => (r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSeq
    assert(out == Seq(
      ("non_finite", 1L, 0L, 0L),
      ("null", 1L, 0L, 0L),
      ("ok", 2L, 100000000L, 2500000000L),
      ("out_of_range", 2L, 0L, 0L),
      ("wrong_dims", 1L, 0L, 0L),
      ("zero_norm", 1L, 0L, 0L)), out.toString)
    assertDeterministic(Similarity.vectorAudit(d, expectDims = 2))
  }

  test("embAdmission: a batch vector matching the base is rejected with " +
    "its best base match; base-base near-dups never appear; the batch " +
    "broadcast guard is loud") {
    // parity sides: even = base, odd = batch.
    //   batch 1 is colinear with base 2 AND base 4 -> best = min id 2
    //   base 2 / base 4 colinear (same side: must NOT appear)
    //   batch 3 is orthogonal to every base vector -> admitted (no row)
    val d = emb(
      (2L, Seq(1f, 0f, 0f), 0), (4L, Seq(2f, 0f, 0f), 0),
      (6L, Seq(0f, 1f, 1f), 1),
      (1L, Seq(3f, 0f, 0f), 0),
      (3L, Seq(0f, 1f, -1f), 2))
    val out = Similarity.embAdmission(d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(out == Seq((1L, 2L, 1.0)), out.toString)
    assertDeterministic(Similarity.embAdmission(d))
    val e = intercept[Exception] {
      Similarity.embAdmission(d, maxBatchRows = 1L).collect()
    }
    assert(e.getMessage.contains("embAdmission batch"), e.getMessage)
  }
}
