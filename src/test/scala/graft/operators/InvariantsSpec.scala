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
    val docs = randomDocs(40)
    val mh = Dedup.minhashDedup(docs, threshold = 0.9).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = Dedup.ngramJaccard(docs, threshold = 0.9).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // ngram blocking only pairs length-close docs; every such pair at
    // j≥0.9 must also survive 4×3 minhash banding (miss prob ≤ 1e-4)
    assert(exact.subsetOf(mh), s"missed: ${exact -- mh}")
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
