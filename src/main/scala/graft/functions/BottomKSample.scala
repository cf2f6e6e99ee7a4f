package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Deterministic bounded reservoir: keeps the k rows with the smallest
  * (hash, value) pairs in lexicographic order — a "reservoir sample over
  * md5 order". Because membership is a pure function of the input
  * MULTISET (ties broken by value; duplicate pairs kept), the same rows
  * are selected on any cluster, any partition order, and in the DuckDB
  * oracle (`row_number() OVER (ORDER BY hash, value) <= k`) — unlike
  * rand()-reservoirs or engine-specific quantile sketches.
  *
  * Used as the bounded-state quantile sketch: an exact percentile over
  * this sample needs ≤ k pairs of state per (partition, group) — the
  * shuffle ships one ≤ k-pair buffer per partial, and no full-group scan
  * or 10%-sample sort exists anywhere. Estimation error is the standard
  * bottom-k sampling bound (k=256 ⇒ median within ~±6% rank error at
  * 95% confidence, independent of group size).
  */
class BottomKSampleAgg(k: Int)
  extends Aggregator[(Long, Double), (Array[Long], Array[Double]), Array[Double]] {
  require(k >= 1, s"bottom-k sample needs k >= 1, got $k")

  override def zero: (Array[Long], Array[Double]) =
    (Array.emptyLongArray, Array.emptyDoubleArray)

  /** First index whose (hash, value) pair is > (h, v); buffer is sorted
    * lexicographically. */
  private def insertPos(hs: Array[Long], vs: Array[Double], h: Long, v: Double): Int = {
    var lo = 0
    var hi = hs.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      val c = java.lang.Long.compare(hs(mid), h) match {
        case 0 => java.lang.Double.compare(vs(mid), v)
        case x => x
      }
      if (c <= 0) lo = mid + 1 else hi = mid
    }
    lo
  }

  override def reduce(buf: (Array[Long], Array[Double]),
                      in: (Long, Double)): (Array[Long], Array[Double]) = {
    val (hs, vs) = buf
    val (h, v) = in
    // saturated and not smaller than the current k-th pair: no-op
    if (hs.length == k && (h > hs(k - 1) || (h == hs(k - 1) && v >= vs(k - 1))))
      return buf
    val ins = insertPos(hs, vs, h, v)
    val n = math.min(hs.length + 1, k)
    val oh = new Array[Long](n)
    val ov = new Array[Double](n)
    System.arraycopy(hs, 0, oh, 0, ins)
    System.arraycopy(vs, 0, ov, 0, ins)
    oh(ins) = h
    ov(ins) = v
    System.arraycopy(hs, ins, oh, ins + 1, n - ins - 1)
    System.arraycopy(vs, ins, ov, ins + 1, n - ins - 1)
    (oh, ov)
  }

  override def merge(a: (Array[Long], Array[Double]),
                     b: (Array[Long], Array[Double])): (Array[Long], Array[Double]) = {
    if (a._1.isEmpty) return b
    if (b._1.isEmpty) return a
    val n = math.min(a._1.length + b._1.length, k)
    val oh = new Array[Long](n)
    val ov = new Array[Double](n)
    var i = 0; var j = 0; var o = 0
    while (o < n) {
      val takeA = j >= b._1.length || (i < a._1.length &&
        (a._1(i) < b._1(j) || (a._1(i) == b._1(j) && a._2(i) <= b._2(j))))
      if (takeA) { oh(o) = a._1(i); ov(o) = a._2(i); i += 1 }
      else { oh(o) = b._1(j); ov(o) = b._2(j); j += 1 }
      o += 1
    }
    (oh, ov)
  }

  /** The sampled VALUES, sorted ascending — ready for exact percentile
    * interpolation over the bounded sample. */
  override def finish(buf: (Array[Long], Array[Double])): Array[Double] = {
    val out = buf._2.clone()
    java.util.Arrays.sort(out)
    out
  }

  override def bufferEncoder: Encoder[(Array[Long], Array[Double])] =
    ExpressionEncoder[(Array[Long], Array[Double])]()
  override def outputEncoder: Encoder[Array[Double]] =
    ExpressionEncoder[Array[Double]]()
}
