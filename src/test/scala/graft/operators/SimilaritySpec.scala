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
}
