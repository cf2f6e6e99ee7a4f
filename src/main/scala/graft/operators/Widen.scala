package graft.operators

import org.apache.spark.sql.DataFrame

/** Adaptive scan widening for CPU-heavy per-row map stages.
  *
  * Parquet parallelism is bounded by row groups: a table written as one
  * file with one row group plans to ONE scan task no matter what
  * `maxPartitionBytes` says, so everything up to the first shuffle —
  * md5 hashing, tokenization, shingling — serializes onto a single core.
  * That is exactly the small-fixture case; at warehouse scale the same
  * table arrives as thousands of row groups and the scan alone saturates
  * the cluster.
  *
  * [[widen]] therefore repartitions ONLY when the source provides fewer
  * splits than the cluster has slots — a no-op at scale (condition
  * false), a full-width fan-out on single-row-group fixtures. The
  * round-robin exchange it inserts carries the scan's pruned columns
  * once, which is strictly cheaper than leaving (cores − 1) slots idle
  * through the expensive map work that follows.
  */
object Widen {

  /** Repartition `df` to the default parallelism iff its current plan
    * yields at most half that many partitions. */
  def widen(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions * 2 <= target) df.repartition(target) else df
  }
}
