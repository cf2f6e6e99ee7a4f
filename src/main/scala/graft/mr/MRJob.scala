package graft.mr

import scala.reflect.ClassTag

import org.apache.spark.{HashPartitioner, Partitioner}
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.SparkSession

/** Generic MapReduce kernel on Spark — the engine-parity layer
  * (SURVEY.md §2.A / §7.1; reference contract README.md:40–62,
  * engine/worker.py:79–158).
  *
  * Reproduces the reference's four-function task contract:
  *  - `map`: per-partition scan+transform emitting (key, value) pairs
  *    (reference map_func, worker.py:83–87) — here `mapPartitionsWithIndex`;
  *  - `shuffle`: multicast-capable routing `K => Seq[Int]` (worker.py:93–99:
  *    each key may be sent to several reducers, or dropped when empty) —
  *    encoded as flatMap-explode over targets then `partitionBy`;
  *  - `reduce`: per-key aggregation over grouped values (worker.py:154–158),
  *    identity when omitted.
  *
  * What we deliberately do NOT reproduce (SURVEY.md §7.3): unbounded
  * in-memory grouping (worker.py:146–152) — grouping here is sort-based
  * (`repartitionAndSortWithinPartitions`), so it streams and spills via
  * Spark's ExternalSorter and holds only one key's values at a time.
  * Also not reproduced: silent shuffle data loss (worker.py:128–129) and
  * exec-based code injection (worker.py:71) — Spark's shuffle + compiled
  * closures replace both structurally.
  */
object MRJob {

  /** Routes on the explicit target chosen by the user shuffle function
    * (already floorMod'ed into [0, n)). */
  private final class TargetPartitioner(n: Int) extends Partitioner {
    override def numPartitions: Int = n
    override def getPartition(key: Any): Int =
      key.asInstanceOf[(Int, Any)]._1
    override def equals(o: Any): Boolean = o match {
      case t: TargetPartitioner => t.numPartitions == n
      case _                    => false
    }
    override def hashCode: Int = n
  }

  /** Default single-target hash routing (reference example_wordcount.py:22–27
    * uses adler32 % n; any stable hash is semantically equivalent). */
  def hashShuffle[K](numPartitions: Int): K => Seq[Int] =
    k => Seq(math.floorMod(if (k == null) 0 else k.hashCode, numPartitions))

  /** Run a full map → (multicast) shuffle → sort-group → reduce pipeline.
    *
    * @param input    source rows (any RDD — callers typically pass
    *                 `df.rdd` or a text-file RDD)
    * @param map      per-partition mapper, receives the partition index
    *                 (reference worker_id analog)
    * @param shuffle  key router; may return 0..n targets per key
    *                 (multicast, reference worker.py:95–99)
    * @param reduce   per-key reducer over the value iterator
    */
  def run[T, K: ClassTag: Ordering, V: ClassTag, R: ClassTag](
      input: RDD[T],
      numPartitions: Int,
      map: (Iterator[T], Int) => Iterator[(K, V)],
      shuffle: K => Seq[Int],
      reduce: (K, Iterator[V]) => Iterator[R]): RDD[R] = {

    val mapped: RDD[(K, V)] =
      input.mapPartitionsWithIndex((i, it) => map(it, i))

    // Multicast explode: one record per (target, key) — the same
    // duplication the reference sends over the network (worker.py:95–99).
    val routed: RDD[((Int, K), V)] = mapped.flatMap { case (k, v) =>
      shuffle(k).map(t => ((math.floorMod(t, numPartitions), k), v))
    }

    // null-safe key ordering (nulls first): hashShuffle explicitly routes
    // null keys, so the sort must not NPE on them — the typical
    // Ordering[String] etc. throws on null operands inside ExternalSorter
    val keyOrd = implicitly[Ordering[K]]
    val nullSafeKeyOrd: Ordering[K] = new Ordering[K] {
      override def compare(a: K, b: K): Int =
        if (a == null) (if (b == null) 0 else -1)
        else if (b == null) 1
        else keyOrd.compare(a, b)
    }
    implicit val ord: Ordering[(Int, K)] =
      Ordering.Tuple2(Ordering.Int, nullSafeKeyOrd)

    // Sort within partition by key → adjacent grouping, O(1) keys in
    // memory, spill-safe. This is Spark's sort-based shuffle doing the
    // work of reference phases A5 (transport) + A6 (group).
    routed
      .repartitionAndSortWithinPartitions(new TargetPartitioner(numPartitions))
      .mapPartitions { it =>
        new GroupedIterator(it.map { case ((_, k), v) => (k, v) }, nullSafeKeyOrd)
          .flatMap { case (k, vs) => reduce(k, vs) }
      }
  }

  /** Identity reduce (reference default, worker.py:157–158). */
  def identityReduce[K, V]: (K, Iterator[V]) => Iterator[(K, Seq[V])] =
    (k, vs) => Iterator((k, vs.toSeq))

  /** Groups a key-sorted iterator into (key, values-iterator) chunks
    * without materializing more than one group's boundary row. Grouping
    * uses the SAME ordering's equivalence that sorted the keys — plain
    * `==` would split one logical key into several groups whenever the
    * ordering is coarser than equals (e.g. a case-insensitive
    * Ordering[String] may interleave "A", "a", "A" as sort-equal ties),
    * silently calling reduce twice for the same key. */
  private final class GroupedIterator[K, V](base: Iterator[(K, V)],
                                            ord: Ordering[K])
      extends Iterator[(K, Iterator[V])] {
    private val buf = base.buffered
    override def hasNext: Boolean = buf.hasNext
    override def next(): (K, Iterator[V]) = {
      val k = buf.head._1
      // Materializes one group's values; bounded by max group size, the
      // same bound any (K, Iterable[V]) reduce contract implies.
      val vs = scala.collection.mutable.ArrayBuffer.empty[V]
      while (buf.hasNext && ord.equiv(buf.head._1, k)) vs += buf.next()._2
      (k, vs.iterator)
    }
  }
}
