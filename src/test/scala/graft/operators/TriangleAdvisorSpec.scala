package graft.operators

import graft.SparkSpec

/** The q147 sampleMod advisor ([[Similarity.sampleModFor]] /
  * [[Similarity.triangleSampleAuto]]) and its variance model
  * ([[Similarity.triangleEstimateSigma]]): the advisor's integer
  * arithmetic, its end-to-end consistency with the manually-tuned
  * estimator, and — the compactionCadence pattern — a re-derivation of
  * the committed 30× census (503.6 M triangles) from the committed
  * advisor-mod estimate within the estimator's 3σ bound, so a
  * re-measure that moves either number flags the model. */
class TriangleAdvisorSpec extends SparkSpec {
  import spark.implicits._

  private def emb(rows: (Long, Seq[Float], Int)*) =
    rows.toSeq.toDF("vec_id", "embedding", "label")

  // ---- advisor math: smallest m with m²·budget ≥ wedgeVol -----------

  test("sampleModFor: within budget → 1; exact squares land exactly; " +
    "one-past-a-square rounds UP; loud on a non-positive budget") {
    assert(Similarity.sampleModFor(0L, 100L) == 1)
    assert(Similarity.sampleModFor(100L, 100L) == 1)
    // 9e6 / 1e6 = 9 = 3²: m = 3 exactly (a float-sqrt ceil could give
    // 4 without the integer adjustment)
    assert(Similarity.sampleModFor(9000000L, 1000000L) == 3)
    // one past the square: 3²·1e6 < 9000001 → m = 4
    assert(Similarity.sampleModFor(9000001L, 1000000L) == 4)
    assert(Similarity.sampleModFor(9000000L - 1L, 1000000L) == 3)
    // the committed 30× point: wedge 1.012e9 under a 1e8 budget → 4
    assert(Similarity.sampleModFor(1012231448L, 100000000L) == 4)
    // the 10× q147 point: 32.6e6 under the deployed 1e6 budget → 6
    assert(Similarity.sampleModFor(32630931L,
      Similarity.AdvisorMaxWedges) == 6)
    intercept[IllegalArgumentException] {
      Similarity.sampleModFor(10L, 0L)
    }
    // the advised mod is minimal: (m-1)² · budget < wedgeVol ≤ m² · budget
    for ((wv, b) <- Seq((1012231448L, 100000000L), (32630931L, 1000000L),
                        (5407848762L, 1000000L))) {
      val m = Similarity.sampleModFor(wv, b).toLong
      assert(m * m * b >= wv, s"advised $m does not fit $wv/$b")
      assert(m == 1 || (m - 1) * (m - 1) * b < wv,
        s"advised $m is not minimal for $wv/$b")
    }
  }

  test("triangleEstimateSigma: mod 1 (no sampling) has zero variance; " +
    "the closed form T(m³−1) + 2Δ(m−1) under the root") {
    assert(Similarity.triangleEstimateSigma(1000L, 500L, 1) == 0.0)
    // T=100, Δ=10, m=2: Var = 100·7 + 2·10·1 = 720
    assert(math.abs(Similarity.triangleEstimateSigma(100L, 10L, 2)
      - math.sqrt(720.0)) < 1e-9)
    intercept[IllegalArgumentException] {
      Similarity.triangleEstimateSigma(-1L, 0L, 2)
    }
  }

  // ---- end-to-end: the advisor in the loop ≡ the manual estimator ---

  test("triangleSampleAuto: a tight budget makes the advisor pick " +
    "mod > 1 and the run equals triangleSample at that mod; a loose " +
    "budget degenerates to the exact census (mod 1)") {
    // 16 colinear vectors = a 16-clique at any positive threshold:
    // 120 edges, C(16,3) = 560 triangles
    val d = emb((1L to 16L).map(i => (i, Seq(i.toFloat, 0f, 0f), 0)): _*)
    val wv = Similarity.wedgeVolume(d, 0.3)
    assert(wv > 0L)
    val budget = wv / 9 + 1 // forces m = 3 exactly: 9·budget ≥ wv > 4·budget
    val m = Similarity.sampleModFor(wv, budget)
    assert(m == 3, s"fixture should advise mod 3, got $m (wv=$wv)")
    val auto = Similarity.triangleSampleAuto(d, 0.3, budget)
      .as[(Long, Long, Long, Long, Long, Long)].head()
    assert(auto._1 == wv && auto._2 == m.toLong, auto.toString)
    val manual = Similarity.triangleSample(d, 0.3, m)
      .as[(Long, Long, Long, Long)].head()
    assert((auto._3, auto._4, auto._5, auto._6) == manual,
      s"auto=$auto manual=$manual")
    // loose budget → mod 1 → tri_est IS the exact count
    val census = Similarity.triangleSampleAuto(d, 0.3, maxWedges = wv)
      .as[(Long, Long, Long, Long, Long, Long)].head()
    assert(census._2 == 1L && census._6 == 560L, census.toString)
  }

  // ---- the committed 30× re-derivation (artifact-driven, like -------
  // ---- CompactionPolicySpec's cadence constant) ----------------------

  test("TRIANGLE_SF3_r14: the advisor re-derives the committed mod " +
    "from the committed wedge volume, the estimator is internally " +
    "exact (tri_est = tri_sampled·mod³), and it re-derives the 30× " +
    "census (503,644,355 triangles) within 3σ of the variance bound") {
    val txt = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("TRIANGLE_SF3_r14.json")), "UTF-8")
    def field(key: String): Long =
      ("\"" + key + "\"\\s*:\\s*(\\d+)").r.findFirstMatchIn(txt)
        .map(_.group(1).toLong)
        .getOrElse(fail(s"TRIANGLE_SF3_r14.json: no $key"))
    val (wv, budget, mod) =
      (field("wedge_vol"), field("budget"), field("advised_mod"))
    assert(Similarity.sampleModFor(wv, budget) == mod.toInt,
      s"advisor would pick ${Similarity.sampleModFor(wv, budget)}, " +
        s"artifact committed $mod")
    val (triSampled, triEst, exact) =
      (field("tri_sampled"), field("tri_est"), field("exact_triangles"))
    assert(triEst == triSampled * mod * mod * mod,
      "estimator must be exact integer arithmetic")
    assert(exact == 503644355L,
      s"the committed 30× census moved: $exact — recalibrate the " +
        "numpy oracle and this spec together")
    // Δ = triangle pairs sharing an edge, from the calibrated numpy
    // oracle (the engine census matched it bit-exact at r13); the
    // artifact records it with provenance
    val delta = field("shared_edge_pairs")
    val sigma = Similarity.triangleEstimateSigma(exact, delta, mod.toInt)
    assert(sigma > 0.0)
    val err = math.abs(triEst - exact).toDouble
    assert(err <= 3.0 * sigma,
      f"estimate $triEst vs census $exact: |err|=$err%.0f > 3σ=${3 * sigma}%.0f")
  }
}
