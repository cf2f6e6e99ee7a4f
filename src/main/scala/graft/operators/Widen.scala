package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Generate, Project, Sample, SubqueryAlias}
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

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
  * [[widen]] therefore repartitions ONLY when the file source provides
  * fewer splits than the cluster has slots — a no-op at scale (condition
  * false), a full-width fan-out on single-row-group fixtures. The
  * round-robin exchange it inserts carries the scan's pruned columns
  * once, which is strictly cheaper than leaving (cores − 1) slots idle
  * through the expensive map work that follows.
  *
  * The split count comes from the PHYSICAL SCAN LEAVES of the unexecuted
  * plan — never from `df.rdd`, which under AQE would eagerly materialize
  * every query stage of a shuffled input at plan-build time and throw
  * the work away. Two no-op contracts follow:
  *   - a plan that already contains a shuffle returns unchanged (its
  *     downstream width is `spark.sql.shuffle.partitions` regardless of
  *     scan splits, so widening is moot there);
  *   - a plan with no file scan (in-memory fixtures, cached relations)
  *     returns unchanged — widening exists for the row-group bound,
  *     which only file sources have.
  */
object Widen {

  /** Repartition `df` to the default parallelism iff it is a narrow
    * chain of row-local operators over file scans that together yield at
    * most half that many splits. Never triggers execution.
    *
    * Narrowness is decided on the OPTIMIZED LOGICAL plan (the physical
    * `sparkPlan` carries no exchanges — EnsureRequirements only runs in
    * executedPlan preparation, so a shuffle is undetectable there): any
    * node beyond project/filter/generate/sample over file relations —
    * an aggregate, join, window, repartition, or a non-file leaf —
    * makes widen a no-op. The split count then comes from the physical
    * scan leaves' `inputRDD.getNumPartitions`, which plans file splits
    * without running a job. */
  def widen(df: DataFrame): DataFrame = {
    // streaming inputs pass through untouched: micro-batch width is the
    // runner's concern, and even INSPECTING optimizedPlan on a streaming
    // Dataset throws (batch-only assertion). Checked first so streaming
    // callers (the stateless admission probe shingles its stream side)
    // can share the batch operators.
    if (df.isStreaming) return df
    val target = df.sparkSession.sparkContext.defaultParallelism
    val wideOrNonFile = df.queryExecution.optimizedPlan.find {
      case lr: LogicalRelation => !lr.relation.isInstanceOf[HadoopFsRelation]
      case _: Project | _: Filter | _: Generate | _: Sample | _: SubqueryAlias => false
      case _ => true
    }
    if (wideOrNonFile.isDefined) df
    else {
      val splits = df.queryExecution.sparkPlan.collectLeaves()
        .collect { case s: FileSourceScanExec => s.inputRDD.getNumPartitions }
      if (splits.nonEmpty && splits.sum * 2 <= target) df.repartition(target)
      else df
    }
  }
}
