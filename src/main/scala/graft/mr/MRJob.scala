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
  /** Run a full map → (multicast) shuffle → sort-group → reduce pipeline.
    *
    * `combine`, when given, is the standard MapReduce combiner the
    * reference contract lacks: an associative+commutative merge of two
    * values of one key, applied map-side BEFORE routing, so the shuffle
    * carries per-(partition, key) partials instead of every raw pair
    * (wordcount: |partitions|·|vocab| records instead of every token —
    * measured 10.5 s → below the declarative plan's shuffle volume on a
    * 95 MB corpus). Correctness is unchanged for any reducer that is a
    * fold of `combine` (the caller asserts that by passing it); the
    * reducer still sees an Iterator[V] — of partials.
    *
    * Memory stays BOUNDED (the spill-safe story of this kernel, unlike
    * the reference's unbounded dict, worker.py:146–152): the combiner
    * map is capped at `combineMaxKeys`; on overflow it EMITS its
    * current partials downstream and resets — always correct under
    * associativity+commutativity, degrading gracefully toward
    * no-combine as the per-partition key space outgrows the cap. */
  def run[T, K: ClassTag: Ordering, V: ClassTag, R: ClassTag](
      input: RDD[T],
      numPartitions: Int,
      map: (Iterator[T], Int) => Iterator[(K, V)],
      shuffle: K => Seq[Int],
      reduce: (K, Iterator[V]) => Iterator[R],
      combine: Option[(V, V) => V] = None,
      combineMaxKeys: Int = 1 << 20): RDD[R] = {

    val mapped: RDD[(K, V)] =
      input.mapPartitionsWithIndex((i, it) => map(it, i))

    val preRouted: RDD[(K, V)] = combine match {
      case None => mapped
      case Some(c) => mapped.mapPartitions { it =>
        new BoundedCombineIterator(it, c, combineMaxKeys)
      }
    }

    // Multicast explode: one record per (target, key) — the same
    // duplication the reference sends over the network (worker.py:95–99).
    val routed: RDD[((Int, K), V)] = preRouted.flatMap { case (k, v) =>
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

  /** Bounded map-side combiner: folds the upstream pairs into a hash
    * map of per-key partials, emitting and resetting whenever the map
    * reaches `maxKeys` (so memory is capped regardless of the
    * partition's key cardinality). Emission happens only on overflow or
    * upstream exhaustion; null keys combine under a sentinel.
    * Single-threaded per partition — plain mutable state is safe. */
  private final class BoundedCombineIterator[K, V](
      base: Iterator[(K, V)], c: (V, V) => V, maxKeys: Int)
      extends Iterator[(K, V)] {
    require(maxKeys > 0, s"combineMaxKeys must be positive, got $maxKeys")
    private val NullKey: AnyRef = new AnyRef
    private val m = new java.util.HashMap[AnyRef, V]()
    private var drain: java.util.Iterator[java.util.Map.Entry[AnyRef, V]] = _
    private def fill(): Unit = {
      while (base.hasNext && m.size < maxKeys) {
        val (k, v) = base.next()
        val kk = if (k == null) NullKey else k.asInstanceOf[AnyRef]
        val prev = m.get(kk)
        // HashMap.get returns null for absent keys; a legitimately-null
        // VALUE for a present key must still combine — containsKey
        // disambiguates (one extra probe only on the null-value path)
        if (prev != null || m.containsKey(kk)) m.put(kk, c(prev, v))
        else m.put(kk, v)
        ()
      }
      drain = m.entrySet().iterator()
    }
    override def hasNext: Boolean = {
      if (drain == null) fill()
      if (drain.hasNext) true
      else if (base.hasNext) { m.clear(); fill(); drain.hasNext }
      else false
    }
    override def next(): (K, V) = {
      if (!hasNext) throw new NoSuchElementException
      val e = drain.next()
      val k = if (e.getKey eq NullKey) null.asInstanceOf[K]
      else e.getKey.asInstanceOf[K]
      (k, e.getValue)
    }
  }

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
