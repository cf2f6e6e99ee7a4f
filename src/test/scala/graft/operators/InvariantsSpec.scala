package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Property-style invariants over randomized inputs (seeded): bounds and
  * symmetries that must hold for ANY data, not just the fixtures. */
class InvariantsSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(77)

  private def randomDocs(n: Int) = {
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta", "eta")
    (0 until n).map { i =>
      val words = Seq.fill(5 + rnd.nextInt(30))(vocab(rnd.nextInt(vocab.size)))
      (i.toLong, words.mkString(" "), words.mkString(" ").length.toLong)
    }.toDF("doc_id", "text", "n_chars")
      .selectExpr("doc_id", "text", "'en' AS lang", "'s' AS source", "n_chars")
  }

  test("jaccard outputs are within (0, 1] and pairs are canonical (a < b)") {
    val out = Dedup.minhashDedup(randomDocs(60), threshold = 0.0).collect()
    assert(out.nonEmpty)
    assert(out.forall { r =>
      val j = r.getAs[Double]("jaccard")
      j > 0.0 && j <= 1.0 && r.getLong(0) < r.getLong(1)
    })
  }

  test("minhash candidates are a superset of high-jaccard ngram pairs " +
    "(banding loses nothing above the design threshold on this corpus)") {
    // plant an identical pair: random 7-word-vocab docs essentially never
    // reach jaccard 0.9, so WITHOUT a planted pair `exact` is empty and
    // subsetOf is vacuously true — the property would pin nothing
    val spark0 = spark
    import spark0.implicits._
    val planted = Seq(
      (1000L, "alpha beta gamma delta epsilon zeta eta theta", 46L),
      (1001L, "alpha beta gamma delta epsilon zeta eta theta", 46L))
      .toDF("doc_id", "text", "n_chars")
      .selectExpr("doc_id", "text", "'en' AS lang", "'s' AS source", "n_chars")
    val docs = randomDocs(40).unionByName(planted)
    val mh = Dedup.minhashDedup(docs, threshold = 0.9).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = Dedup.ngramJaccard(docs, threshold = 0.9).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.contains((1000L, 1001L)), "planted pair must be found")
    // ngram blocking conjoins length buckets with the SAME minhash band
    // keys minhashDedup uses, so its candidates are a subset of minhash's
    assert(exact.subsetOf(mh), s"missed: ${exact -- mh}")
  }

  test("ngram candidate volume stays O(docs) under total length skew " +
    "(every doc in one length bucket must NOT go quadratic)") {
    val r = new scala.util.Random(11)
    val n = 200
    // unrelated random content over a large vocab, but IDENTICAL n_chars:
    // length-only blocking would emit n(n-1)/2 = 19900 candidate pairs
    val docs = (0 until n).map { i =>
      val words = Seq.fill(20)(r.alphanumeric.take(5).mkString)
      (i.toLong, words.mkString(" "), "en", "s", 100L)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    // threshold 0 disables both verify filters, so the output IS the
    // candidate set (pairs sharing a length∧band bucket)
    val cands = Dedup.ngramJaccard(docs, threshold = 0.0).count()
    assert(cands <= 3L * n,
      s"$cands candidates for $n same-length docs — blocking went quadratic")
  }

  test("minhash banding derived from threshold keeps recall on planted " +
    "near-dups at two different thresholds") {
    val r = new scala.util.Random(42)
    val planted = 30
    val docs = (0 until planted).flatMap { i =>
      val words = Seq.fill(50)(r.alphanumeric.take(4).mkString)
      val dup = words.updated(25, "changed")
      Seq((2L * i, words.mkString(" ")), (2L * i + 1, dup.mkString(" ")))
    }.map { case (id, t) => (id, t, "en", "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    // planted dups have j = 45/51 ≈ 0.88 (one changed token flips 3 of
    // 48 shingles), so test below that: 0.5 and 0.8
    for (t <- Seq(0.5, 0.8)) {
      val found = Dedup.minhashDedup(docs, threshold = t).collect()
        .map(row => (row.getLong(0), row.getLong(1))).toSet
      val hits = (0 until planted).count(i => found.contains((2L * i, 2L * i + 1)))
      // banding targets ≥92% per-pair recall at the REQUESTED threshold,
      // and the planted pairs sit above it, so recall should be near-total
      assert(hits >= (planted * 0.85).toInt, s"recall $hits/$planted at t=$t")
    }
  }

  test("cosine outputs are within [-1, 1] and symmetric pairs canonical") {
    val emb = (0 until 50).map(i =>
      (i.toLong, Seq.fill(16)(rnd.nextFloat() - 0.5f), 0)).toDF("vec_id", "embedding", "label")
    val out = Similarity.cosineNearDup(emb, threshold = -2.0).collect()
    assert(out.length == 50 * 49 / 2) // every pair, each once, a < b
    assert(out.forall { r =>
      val c = r.getAs[Double]("cosine")
      c >= -1.0 - 1e-9 && c <= 1.0 + 1e-9 && r.getLong(0) < r.getLong(1)
    })
  }

  test("ensemble confusion-matrix counts sum to the vector count") {
    val emb = (0 until 80).map(i =>
      (i.toLong, Seq.fill(8)(rnd.nextFloat() - 0.5f), i % 4)).toDF("vec_id", "embedding", "label")
    val out = MLOps.ensembleClassify(emb)
    assert(out.agg(sum("cnt")).head.getLong(0) == 80L)
  }

  test("stratified sample fraction concentrates near pct for large strata") {
    val customers = (1 to 20000).map(i => (i.toLong, s"seg${i % 2}", 10.0))
      .toDF("c_custkey", "c_mktsegment", "c_acctbal")
    val out = MLOps.stratifiedSample(customers, pct = 10).collect()
    out.foreach { r =>
      val frac = r.getAs[Long]("sampled").toDouble / r.getAs[Long]("total")
      assert(math.abs(frac - 0.10) < 0.02, s"fraction $frac far from 10%")
    }
  }
}
