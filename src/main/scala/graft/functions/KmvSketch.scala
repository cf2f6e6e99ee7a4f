package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** K-minimum-values distinct-count sketch as a typed Aggregator.
  *
  * Keeps the k smallest DISTINCT 32-bit hash values seen; estimates
  * |distinct| as (k−1)·2³² / h₍ₖ₎ (the classic KMV/bottom-k estimator,
  * Bar-Yossef et al. 2002), or the exact buffer size when fewer than k
  * distinct hashes exist. Unlike HyperLogLog the result is a pure
  * function of the SET of input hashes — order- and partition-
  * independent — so the same md5-derived hashes produce bit-identical
  * estimates in any engine (the DuckDB oracle recomputes it in SQL).
  *
  * Scale shape: the buffer is a bounded sorted array (≤ k longs ≈ 2 KB
  * at k=256); reduce is O(log k) for the common post-saturation skip
  * path, merge is a linear array merge. Partial aggregation map-side is
  * automatic via reduce+merge, so the shuffle carries one ≤2 KB sketch
  * per (partition, group) — the same wire profile approx_count_distinct
  * has, with none of its cross-engine nondeterminism.
  */
class KmvSketchAgg(k: Int) extends Aggregator[Long, Array[Long], Double] {
  require(k >= 2, s"KMV needs k >= 2, got $k")

  override def zero: Array[Long] = Array.emptyLongArray

  override def reduce(buf: Array[Long], h: Long): Array[Long] = {
    // saturated and h not smaller than the current k-th minimum: no-op
    if (buf.length == k && h >= buf(k - 1)) return buf
    val pos = java.util.Arrays.binarySearch(buf, h)
    if (pos >= 0) return buf // already present (distinct semantics)
    val ins = -pos - 1
    val n = math.min(buf.length + 1, k)
    val out = new Array[Long](n)
    System.arraycopy(buf, 0, out, 0, ins)
    out(ins) = h
    System.arraycopy(buf, ins, out, ins + 1, n - ins - 1)
    out
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    if (a.isEmpty) return b
    if (b.isEmpty) return a
    val out = new Array[Long](math.min(a.length + b.length, k))
    var i = 0; var j = 0; var o = 0
    while (o < out.length && (i < a.length || j < b.length)) {
      val take =
        if (j >= b.length || (i < a.length && a(i) <= b(j))) { val v = a(i); i += 1; v }
        else { val v = b(j); j += 1; v }
      if (o == 0 || out(o - 1) != take) { out(o) = take; o += 1 }
    }
    if (o == out.length) out else java.util.Arrays.copyOf(out, o)
  }

  override def finish(buf: Array[Long]): Double =
    if (buf.length < k) buf.length.toDouble
    else (k - 1).toDouble * 4294967296.0 / buf(k - 1).toDouble

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
