package graft.functions

import org.scalatest.funsuite.AnyFunSuite

class KmvSketchSpec extends AnyFunSuite {

  private val agg = new KmvSketchAgg(4)

  private def sketch(hs: Seq[Long]): Array[Long] =
    hs.foldLeft(agg.zero)(agg.reduce)

  test("below saturation the estimate is the exact distinct count") {
    assert(agg.finish(sketch(Seq(7L, 3L, 7L, 9L))) == 3.0)
    assert(agg.finish(agg.zero) == 0.0)
  }

  test("at saturation the estimate is (k-1)*2^32 / kth-min") {
    val s = sketch(Seq(100L, 200L, 300L, 400L, 500L))
    assert(s.toSeq == Seq(100L, 200L, 300L, 400L))
    assert(agg.finish(s) == 3.0 * 4294967296.0 / 400.0)
  }

  test("result is a pure function of the input set (order + partitioning)") {
    val hs = (1L to 100L).map(h => h * h * 2654435761L % 4294967296L)
    val forward = sketch(hs)
    val shuffled = sketch(scala.util.Random.shuffle(hs))
    val merged = agg.merge(sketch(hs.take(37)), sketch(hs.drop(37)))
    assert(forward.toSeq == shuffled.toSeq)
    assert(forward.toSeq == merged.toSeq)
  }

  test("merge dedups hashes present on both sides") {
    val m = agg.merge(sketch(Seq(1L, 2L, 3L)), sketch(Seq(2L, 3L, 4L)))
    assert(m.toSeq == Seq(1L, 2L, 3L, 4L))
  }
}
