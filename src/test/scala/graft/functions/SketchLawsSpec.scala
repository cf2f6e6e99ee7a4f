package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Algebraic laws for the deterministic sketch aggregators, exercised
  * directly at the JVM level over seeded randomized inputs: a typed
  * Aggregator is only partition-order-independent if reduce/merge form
  * a commutative monoid up to the finished value — these pin that for
  * every random split of the same multiset, including duplicate hashes
  * and saturation boundaries. */
class SketchLawsSpec extends AnyFunSuite {

  private def splitReduceMergeKmv(agg: KmvSketchAgg, xs: Seq[Long],
                                  pieces: Seq[Seq[Long]]): Array[Long] = {
    val partials = pieces.map(_.foldLeft(agg.zero)(agg.reduce))
    partials.foldLeft(agg.zero)(agg.merge)
  }

  test("KMV: any partitioning of the same multiset finishes identically " +
    "(incl. duplicates and saturation)") {
    val rnd = new scala.util.Random(101)
    val agg = new KmvSketchAgg(16)
    for (trial <- 0 until 50) {
      val n = 1 + rnd.nextInt(120)
      // small value domain forces duplicate hashes
      val xs = Seq.fill(n)(rnd.nextInt(40).toLong)
      val serial = xs.foldLeft(agg.zero)(agg.reduce)
      val nPieces = 1 + rnd.nextInt(6)
      val pieces = xs.grouped(math.max(1, n / nPieces)).toSeq
      val shuffled = rnd.shuffle(xs).grouped(1 + rnd.nextInt(9)).toSeq
      assert(agg.finish(splitReduceMergeKmv(agg, xs, pieces)) ==
        agg.finish(serial), s"trial $trial split")
      assert(agg.finish(splitReduceMergeKmv(agg, xs, shuffled)) ==
        agg.finish(serial), s"trial $trial shuffle")
      // reference semantics: k smallest DISTINCT values
      val expect = xs.distinct.sorted.take(16)
      assert(serial.toSeq == expect, s"trial $trial reference")
    }
  }

  test("quota top-k: any partitioning finishes identically, and equals " +
    "the brute-force 'rank by (surv DESC, pri, doc) then count survivors " +
    "in the first k' reference") {
    val rnd = new scala.util.Random(303)
    for (trial <- 0 until 50) {
      val k = 1 + rnd.nextInt(6)
      val agg = new QuotaTopKAgg(k)
      val n = 1 + rnd.nextInt(80)
      // tiny pri domain forces ties; doc ids unique (the query invariant)
      val xs = rnd.shuffle((0 until n).map(i =>
        (rnd.nextBoolean(), rnd.nextInt(5).toLong, i.toLong,
          rnd.nextInt(50).toLong)).toSeq)
      val serial = xs.foldLeft(agg.zero)(agg.reduce)
      val pieces = rnd.shuffle(xs).grouped(1 + rnd.nextInt(7)).toSeq
      val partials = pieces.map(_.foldLeft(agg.zero)(agg.reduce))
      val merged = rnd.shuffle(partials).foldLeft(agg.zero)(agg.merge)
      assert(agg.finish(merged) == agg.finish(serial),
        s"trial $trial partition-independence")
      // brute force: sort all rows by (surv desc, pri, doc), keep k,
      // count/sum the survivors among them
      val kept = xs.sortBy { case (s, p, d, _) => (if (s) 0L else 1L, p, d) }
        .take(k)
      val expect = (kept.count(_._1).toLong,
        kept.filter(_._1).map(_._4).sum)
      assert(agg.finish(serial) == expect, s"trial $trial reference")
    }
  }

  test("bottom-k sample: any partitioning finishes identically, and " +
    "equals the brute-force k-smallest (hash, value) pairs") {
    val rnd = new scala.util.Random(202)
    val agg = new BottomKSampleAgg(8)
    for (trial <- 0 until 50) {
      val n = 1 + rnd.nextInt(100)
      // collisions on purpose: tiny hash domain, repeated values
      val xs = Seq.fill(n)((rnd.nextInt(12).toLong, rnd.nextInt(6).toDouble))
      val serial = xs.foldLeft(agg.zero)(agg.reduce)
      val pieces = rnd.shuffle(xs).grouped(1 + rnd.nextInt(7)).toSeq
      val partials = pieces.map(_.foldLeft(agg.zero)(agg.reduce))
      val merged = rnd.shuffle(partials).foldLeft(agg.zero)(agg.merge)
      assert(agg.finish(merged).toSeq == agg.finish(serial).toSeq,
        s"trial $trial partition-independence")
      // brute-force reference: k smallest pairs, values sorted
      val expect = xs.sortBy(identity).take(8).map(_._2).sorted
      assert(agg.finish(serial).toSeq == expect, s"trial $trial reference")
    }
  }
}
