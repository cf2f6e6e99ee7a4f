package graft.operators

import org.apache.spark.sql.DataFrame

/** Session-scoped stage cache shared by the expensive multi-consumer
  * stages: the dedup tier's verified-pairs/labels stages (q25/q59/q61/q67
  * pay the signature+verify computation once) and the text tier's
  * (doc, word) collapse (q31 langId and q68 lmScore share one corpus
  * scan + token aggregation). Keyed by the input's semantic plan hash —
  * a different source or filter is a different entry; re-writing files
  * under an identical plan within one session would stale-hit, the
  * standard cache contract ([[clear]] is the escape hatch).
  *
  * Access-ordered LRU bounded at [[MaxMemoEntries]]: evicted entries
  * unpersist their blocks, so entries for finished sessions age out as
  * new work arrives instead of accumulating for the JVM lifetime (a
  * weak-keyed map could not deliver that — the cached Datasets
  * strongly reference their session, pinning a weak key forever).
  * Builds run under a per-entry [[Slot]] lock, NOT this map's monitor:
  * the "labels" stage executes a multi-round job inside its build, and
  * one corpus clustering must not serialize unrelated work. */
private[graft] object StageMemo {

  private val MaxMemoEntries = 16

  private final class Slot {
    @volatile private var df: DataFrame = _
    // set lock-free on eviction/clear; a build that completes after its
    // entry was evicted unpersists its own result, so evicted entries
    // never pin blocks
    @volatile private var dead = false
    def get(build: => DataFrame): DataFrame = {
      val v = df
      if (v != null) v
      else synchronized {
        if (df == null) {
          val built = build
          // a build may persist-and-materialize itself (componentLabels
          // does, to free its round-loop RDDs) — don't re-persist those
          df = if (built.storageLevel == org.apache.spark.storage.StorageLevel.NONE)
            built.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          else built
        }
        if (dead) unpersistQuietly(df)
        df
      }
    }
    def unpersistIfBuilt(): Unit = {
      // deliberately NOT synchronized: callers hold the map's monitor
      // (eviction / clear), while a builder holds this Slot's monitor
      // and re-enters the map via nested memoized stages ("labels"
      // builds on "pairs") — taking the Slot monitor here would be an
      // ABBA deadlock. `dead` hands the unpersist duty to an in-flight
      // builder instead; a double unpersist is harmless.
      dead = true
      val v = df
      if (v != null) unpersistQuietly(v)
    }
    // a stopped session throws from unpersist — eviction of a dead
    // session's entry must not break the live caller inserting
    private def unpersistQuietly(d: DataFrame): Unit =
      try { d.unpersist(); () }
      catch { case scala.util.control.NonFatal(_) => () }
  }

  private type MemoKey = (org.apache.spark.sql.SparkSession, String, Int, Double)
  private val memo =
    new java.util.LinkedHashMap[MemoKey, Slot](MaxMemoEntries, 0.75f, true) {
      override def removeEldestEntry(e: java.util.Map.Entry[MemoKey, Slot]): Boolean =
        if (size() > MaxMemoEntries) { e.getValue.unpersistIfBuilt(); true }
        else false
    }

  // Touch recording (thread-local): Bench's best-of-N needs a repeat
  // attempt of a memoized query to re-pay its shared-stage BUILD (a memo
  // hit would read ~0 s and the minimum would measure nothing) without
  // disturbing stages OTHER queries' first attempts rely on. A full
  // bypass cannot deliver that — Spark's block cache is PLAN-keyed, so
  // an off-memo rebuild of the identical plan silently reads the
  // memoized copy's blocks. Instead: record exactly which entries an
  // attempt touches, [[invalidate]] those (unpersist + remove), and let
  // the next attempt rebuild them with the memo ACTIVE — it pays the
  // real build and leaves the entries repopulated for later consumers.
  private val touchLog =
    new ThreadLocal[scala.collection.mutable.Set[MemoKey]]

  /** Opaque handle over the memo entries a [[recording]] scope touched. */
  final class Touched private[StageMemo] (
    private[StageMemo] val keys: Set[MemoKey])

  /** Run `thunk` recording every memo entry it reads or builds (plan
    * construction and driver-side actions happen on the calling thread,
    * so thread-locality covers the whole query, nested stages
    * included — "labels" touching "pairs" records both). */
  def recording[T](thunk: => T): (T, Touched) = {
    val log = scala.collection.mutable.Set.empty[MemoKey]
    val prev = touchLog.get()
    touchLog.set(log)
    val out = try thunk finally touchLog.set(prev)
    (out, new Touched(log.toSet))
  }

  /** Drop exactly the recorded entries (unpersist + remove), leaving
    * every other query's shared stages in place. */
  def invalidate(touched: Touched): Unit =
    memo.synchronized {
      touched.keys.foreach { k =>
        val s = memo.remove(k)
        if (s != null) s.unpersistIfBuilt()
      }
    }

  /** The memoized build of `stage` over `input`'s semantic plan, with
    * `param` folded into the key (threshold, iteration bound, …). */
  def memoized(input: DataFrame, stage: String, param: Double)
              (build: => DataFrame): DataFrame = {
    val key = (input.sparkSession, stage, input.semanticHash(), param)
    val log = touchLog.get()
    if (log != null) { log += key; () }
    val slot = memo.synchronized {
      val s = memo.get(key)
      if (s != null) s else { val fresh = new Slot; memo.put(key, fresh); fresh }
    }
    // build outside the map lock; concurrent same-key callers share the
    // slot's own monitor (an evicted-mid-build slot still returns a valid
    // DataFrame and unpersists it as soon as the build lands — see
    // Slot.unpersistIfBuilt)
    slot.get(build)
  }

  /** Drop this session's memoized stages (e.g. after overwriting the
    * underlying files in place, which the plan-hash key cannot see). */
  def clear(spark: org.apache.spark.sql.SparkSession): Unit =
    memo.synchronized {
      val it = memo.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getKey._1 eq spark) { e.getValue.unpersistIfBuilt(); it.remove() }
      }
    }
}
