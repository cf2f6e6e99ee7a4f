package graft.operators

import graft.SparkSpec

/** The (recall, candidate-fraction) tradeoff CURVE for both ANN paths,
  * measured against the exact brute-force baseline — the defaults'
  * operating points are justified by this data, not folklore.
  *
  * Everything here is deterministic (md5-derived hyperplanes/centroids,
  * no RNG), so the curve is a property of the fixture, not a flaky
  * sample. Measured on sf0.001 (near-random 512-d vectors — the WORST
  * case for any sublinear index; clustered real-world embeddings sit
  * strictly above this curve):
  *
  *   LSH (4 planes)   radius 0: 6.7% candidates → recall@3 0.267
  *                    radius 1: 32% → 0.467   ← default
  *                    radius 2: 69% → 0.833
  *   IVF (16 cells)   nProbe 1: 6.1% → 0.267
  *                    nProbe 2: 13% → 0.367
  *                    nProbe 4: 25% → 0.567   ← default
  *                    nProbe 8: 49% → 0.767
  *
  * Reading the curve: recall ≈ 1.5–4× the candidate fraction at every
  * point (the index carries real signal — random sampling of candidates
  * would put recall ≈ the fraction), and ≥0.7 recall@3 is one knob turn
  * away on BOTH paths (LSH radius 2, IVF nProbe 8) at sublinear cost.
  * The defaults sit at the cost knee: past ~50% candidates an "ANN"
  * query is just a slower brute force. */
class AnnRecallSpecSweep extends SparkSpec {

  private lazy val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
  private lazy val nVecs = emb.count()
  private lazy val brute = Similarity.annBruteTopK(emb, k = 3).collect()
    .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("nid"))).toSet

  private def recallOf(pairs: Set[(Long, Long)]): Double =
    (pairs intersect brute).size.toDouble / brute.size

  private def topkPairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.collect().map(r => (r.getAs[Long]("qid"), r.getAs[Long]("nid"))).toSet

  test("LSH probe-radius sweep: recall rises monotonically, every point " +
    "beats random-sampling parity, and radius 2 reaches >= 0.7 recall@3") {
    val pts = Seq(0, 1, 2).map { radius =>
      val frac = Similarity.annLshScored(emb, 10, 4, radius).count().toDouble /
        (10.0 * (nVecs - 1))
      val rec = recallOf(topkPairs(
        Similarity.annLshTopK(emb, k = 3, probeRadius = radius)))
      info(f"LSH planes=4 radius=$radius candidates=$frac%.3f recall@3=$rec%.3f")
      (frac, rec)
    }
    // monotone: more probes must never lose recall
    assert(pts.sliding(2).forall { case Seq((_, a), (_, b)) => b >= a },
      s"recall not monotone in radius: $pts")
    // signal: every config must beat random candidate sampling, whose
    // expected recall IS the candidate fraction
    pts.foreach { case (frac, rec) =>
      assert(rec >= frac, s"recall $rec below sampling parity $frac")
    }
    // the high-recall operating point exists at sublinear cost
    val (frac2, rec2) = pts(2)
    assert(rec2 >= 0.7, s"radius-2 recall regressed to $rec2")
    assert(frac2 <= 0.75, s"radius-2 candidate fraction blew up to $frac2")
    // default (radius 1) stays at the documented knee
    assert(pts(1)._1 <= 0.40, s"default candidate fraction crept to ${pts(1)._1}")
    assert(pts(1)._2 >= 0.45, s"default recall regressed to ${pts(1)._2}")
  }

  test("IVF nProbe sweep: recall rises monotonically, every point beats " +
    "random-sampling parity, and nProbe=8 reaches >= 0.7 recall@3") {
    val pts = Seq(1, 2, 4, 8).map { np =>
      val frac = Similarity.annIvfScored(emb, 10, 16, np).count().toDouble /
        (10.0 * (nVecs - 1))
      val rec = recallOf(topkPairs(Similarity.annIvfTopK(emb, k = 3, nProbe = np)))
      info(f"IVF centroids=16 nProbe=$np candidates=$frac%.3f recall@3=$rec%.3f")
      (frac, rec)
    }
    assert(pts.sliding(2).forall { case Seq((_, a), (_, b)) => b >= a },
      s"recall not monotone in nProbe: $pts")
    pts.foreach { case (frac, rec) =>
      assert(rec >= frac, s"recall $rec below sampling parity $frac")
    }
    val (frac8, rec8) = pts(3)
    assert(rec8 >= 0.7, s"nProbe-8 recall regressed to $rec8")
    assert(frac8 <= 0.55, s"nProbe-8 candidate fraction blew up to $frac8")
    // default (nProbe 4): the 0.5+ recall / ~25%-candidates knee
    assert(pts(2)._1 <= 0.30, s"default candidate fraction crept to ${pts(2)._1}")
    assert(pts(2)._2 >= 0.50, s"default recall regressed to ${pts(2)._2}")
  }
}
