package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF: elementwise sum of `array<bigint>` columns — the vector
  * combiner used by the ML ops (per-label embedding sums). Integer adds
  * are associative and order-independent, so results are exact on any
  * partitioning; partial (map-side) aggregation is automatic because
  * Aggregator exposes reduce+merge.
  *
  * Completes the engine's extension ladder alongside the scalar
  * Expressions (Adler32, SortedIntersectSize): scalar → Expression,
  * aggregate → Aggregator, whole-operator → MRJob/mapPartitions.
  */
object VectorSumAgg extends Aggregator[Array[Long], Array[Long], Seq[Long]] {
  override def zero: Array[Long] = null

  override def reduce(buf: Array[Long], v: Array[Long]): Array[Long] =
    if (v == null) buf
    else if (buf == null) v.clone()
    else {
      // fail LOUDLY on ragged vectors: without this, a short row seen
      // first silently truncates every later vector's tail (wrong sums),
      // while the reverse order crashes — arrival-order-dependent either
      // way. A corrupt row should be an error, not a partitioning lottery.
      require(v.length == buf.length,
        s"VectorSumAgg: ragged input vectors (${v.length} vs ${buf.length})")
      var i = 0
      while (i < buf.length) { buf(i) += v(i); i += 1 }
      buf
    }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] =
    reduce(a, b)

  override def finish(r: Array[Long]): Seq[Long] =
    if (r == null) Seq.empty else r.toIndexedSeq

  override def bufferEncoder: Encoder[Array[Long]] =
    ExpressionEncoderHelper.arrayLong
  override def outputEncoder: Encoder[Seq[Long]] =
    ExpressionEncoderHelper.seqLong
}

private object ExpressionEncoderHelper {
  val arrayLong: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  val seqLong: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}
