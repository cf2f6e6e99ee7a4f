package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded per-group quota selector: keeps the k FIRST rows of a group
  * in (surv DESC, pri ASC, doc_id ASC) order — survivors sort first, so
  * the kept set is exactly `min(k, |survivors|)` survivors (plus filler
  * non-survivors when a group has fewer than k) — and emits
  * (n_final, tok_final): how many of the kept rows are survivors and
  * their token sum.
  *
  * This is the quota stage of the curation funnel fused INTO the
  * per-source aggregation: the buffer is ≤ k rows of state per
  * (partition, group) regardless of group size (the same bound the
  * [[graft.plans.TopKPerKeyExec]] heap operator provides as a physical
  * rewrite, here in Aggregator form so counts and quota ride ONE
  * aggregation pass — one scan, one partial-aggregated shuffle, no
  * window and no per-source sort anywhere). Membership is a pure
  * function of the input multiset (the (surv, pri, doc_id) order is
  * total — doc_id is unique), so the result is deterministic on any
  * cluster and matches the oracle's
  * `ROW_NUMBER() OVER (ORDER BY surv DESC, pri, doc_id) <= k`.
  */
class QuotaTopKAgg(k: Int)
  extends Aggregator[(Boolean, Long, Long, Long),
                     (Array[Long], Array[Long], Array[Long], Array[Long]),
                     (Long, Long)] {
  require(k >= 1, s"quota needs k >= 1, got $k")

  // buffer: parallel arrays (s, pri, doc, tok), sorted lexicographically
  // by (s, pri, doc); s = 0 for survivors, 1 otherwise (so ASC == the
  // query's surv DESC)
  override def zero: (Array[Long], Array[Long], Array[Long], Array[Long]) =
    (Array.emptyLongArray, Array.emptyLongArray, Array.emptyLongArray,
      Array.emptyLongArray)

  private def cmp(s1: Long, p1: Long, d1: Long,
                  s2: Long, p2: Long, d2: Long): Int = {
    val c1 = java.lang.Long.compare(s1, s2)
    if (c1 != 0) return c1
    val c2 = java.lang.Long.compare(p1, p2)
    if (c2 != 0) return c2
    java.lang.Long.compare(d1, d2)
  }

  override def reduce(buf: (Array[Long], Array[Long], Array[Long], Array[Long]),
                      in: (Boolean, Long, Long, Long)):
      (Array[Long], Array[Long], Array[Long], Array[Long]) = {
    val (ss, ps, ds, ts) = buf
    val s = if (in._1) 0L else 1L
    val (p, d, t) = (in._2, in._3, in._4)
    val n0 = ss.length
    // saturated and not before the current k-th row: no-op
    if (n0 == k && cmp(s, p, d, ss(k - 1), ps(k - 1), ds(k - 1)) >= 0) return buf
    // binary search for the insert position
    var lo = 0
    var hi = n0
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (cmp(ss(mid), ps(mid), ds(mid), s, p, d) <= 0) lo = mid + 1 else hi = mid
    }
    if (n0 == k) {
      // steady state: shift-insert IN PLACE, dropping the last row — the
      // Aggregator contract allows mutating and returning the buffer, so
      // the per-row cost after saturation is one shift, zero allocation
      System.arraycopy(ss, lo, ss, lo + 1, k - lo - 1)
      System.arraycopy(ps, lo, ps, lo + 1, k - lo - 1)
      System.arraycopy(ds, lo, ds, lo + 1, k - lo - 1)
      System.arraycopy(ts, lo, ts, lo + 1, k - lo - 1)
      ss(lo) = s; ps(lo) = p; ds(lo) = d; ts(lo) = t
      buf
    } else {
      // growth path (≤ k times per partial): allocate one row larger
      val n = n0 + 1
      val (os, op, od, ot) = (new Array[Long](n), new Array[Long](n),
        new Array[Long](n), new Array[Long](n))
      System.arraycopy(ss, 0, os, 0, lo); System.arraycopy(ps, 0, op, 0, lo)
      System.arraycopy(ds, 0, od, 0, lo); System.arraycopy(ts, 0, ot, 0, lo)
      os(lo) = s; op(lo) = p; od(lo) = d; ot(lo) = t
      System.arraycopy(ss, lo, os, lo + 1, n0 - lo)
      System.arraycopy(ps, lo, op, lo + 1, n0 - lo)
      System.arraycopy(ds, lo, od, lo + 1, n0 - lo)
      System.arraycopy(ts, lo, ot, lo + 1, n0 - lo)
      (os, op, od, ot)
    }
  }

  override def merge(a: (Array[Long], Array[Long], Array[Long], Array[Long]),
                     b: (Array[Long], Array[Long], Array[Long], Array[Long])):
      (Array[Long], Array[Long], Array[Long], Array[Long]) = {
    if (a._1.isEmpty) return b
    if (b._1.isEmpty) return a
    val n = math.min(a._1.length + b._1.length, k)
    val (os, op, od, ot) = (new Array[Long](n), new Array[Long](n),
      new Array[Long](n), new Array[Long](n))
    var i = 0; var j = 0; var o = 0
    while (o < n) {
      val takeA = j >= b._1.length || (i < a._1.length &&
        cmp(a._1(i), a._2(i), a._3(i), b._1(j), b._2(j), b._3(j)) <= 0)
      if (takeA) {
        os(o) = a._1(i); op(o) = a._2(i); od(o) = a._3(i); ot(o) = a._4(i); i += 1
      } else {
        os(o) = b._1(j); op(o) = b._2(j); od(o) = b._3(j); ot(o) = b._4(j); j += 1
      }
      o += 1
    }
    (os, op, od, ot)
  }

  /** (n_final, tok_final) over the kept rows' SURVIVORS only — filler
    * non-survivors (groups with < k survivors) contribute nothing. */
  override def finish(buf: (Array[Long], Array[Long], Array[Long], Array[Long])):
      (Long, Long) = {
    var n = 0L
    var tok = 0L
    var i = 0
    while (i < buf._1.length) {
      if (buf._1(i) == 0L) { n += 1; tok += buf._4(i) }
      i += 1
    }
    (n, tok)
  }

  override def bufferEncoder:
      Encoder[(Array[Long], Array[Long], Array[Long], Array[Long])] =
    ExpressionEncoder[(Array[Long], Array[Long], Array[Long], Array[Long])]()
  override def outputEncoder: Encoder[(Long, Long)] =
    ExpressionEncoder[(Long, Long)]()
}
