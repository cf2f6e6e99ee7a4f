package graft.operators

import graft.SparkSpec

/** ensembleClassify's closer-centroid vote at scale: the old integer form
  * multiplied through by na²·nb² and silently wrapped Long once a label had
  * O(10³) members — below the fixture size, so only a scale-sized spec can
  * catch it. These pin the overflow-safe double+margin path and the exact
  * BigInt knife-edge fallback. */
class EnsembleVoteSpec extends SparkSpec {

  test("vote survives 1.2·10⁵ members per label (old na²nb² form wrapped Long)") {
    val emb = spark.range(240000).selectExpr(
      "id AS vec_id",
      "CAST(id % 2 AS INT) AS label",
      """transform(sequence(1, 64), d ->
           CASE WHEN id % 2 = 0 THEN 0.1 + (id % 7) * 0.0001
                ELSE -0.1 - (id % 5) * 0.0001 END) AS embedding""")
    val out = MLOps.ensembleClassify(emb).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).toSeq
    assert(out == Seq((0, 0, 120000L), (1, 1, 120000L)),
      s"clusters at ±0.1 must classify perfectly at 10⁵ scale, got: $out")
  }

  test("pairSeparation survives 1.2·10⁵ members per label (old Long lambda " +
    "wrapped: (sa_d·nb − sb_d·na)² ≈ 2·10²⁸ ≫ 2⁶³)") {
    // constant vectors → the analytic answer is exact: per-dim centroid
    // gap is 10⁴ quantized units, over 16 dims → sqrt(16·10⁸) = 40000
    val emb = spark.range(240000).selectExpr(
      "id AS vec_id",
      "CAST(id % 2 AS INT) AS label",
      """transform(sequence(1, 16), d ->
           CASE WHEN id % 2 = 0 THEN 0.5 ELSE -0.5 END) AS embedding""")
    val out = MLOps.pairSeparation(emb).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toSeq
    assert(out == Seq((0, 1, 120000L, 120000L, 40000.0)),
      s"cross terms are ~1.44·10¹⁴, squares ~2·10²⁸ — must compute in " +
        s"DECIMAL(38,0), got: $out")
  }

  test("exact-tie vectors take the BigInt fallback and vote the smaller label") {
    import spark.implicits._
    // label-0 centroid = +0.1·1⃗, label-1 centroid = −0.1·1⃗; the zero
    // vector is exactly equidistant → double gap is 0 < margin → exact
    // path → tie votes the smaller label (its own, 0)
    val emb = Seq(
      (0L, Seq.fill(64)(0.2), 0),
      (1L, Seq.fill(64)(0.0), 0),
      (2L, Seq.fill(64)(-0.1), 1)
    ).toDF("vec_id", "embedding", "label")
    val out = MLOps.ensembleClassify(emb).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).toSeq
    assert(out == Seq((0, 0, 2L), (1, 1, 1L)), out.toString)
  }
}
