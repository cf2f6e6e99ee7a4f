package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, Expression, GenericInternalRow, IntegerLiteral, JoinedRow, LessThan, LessThanOrEqual, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow, WindowExpression, WindowSpecDefinition}
import org.apache.spark.sql.catalyst.expressions.AttributeSet
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, UnaryNode, Window, WindowGroupLimit}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Whole-operator extension (the (c) tier of the ladder: LogicalPlan +
  * Rule[LogicalPlan] + SparkStrategy + SparkPlan): bounded per-key top-k.
  *
  * Spark plans `row_number() OVER (PARTITION BY keys ORDER BY o) <= k`
  * as exchange → full sort of every partition's rows → window walk →
  * filter. At 100 TB that full sort is the cost: every row of every hot
  * key is sorted even though only k survive. This operator keeps a
  * bounded k-row heap per key on the MAP side (so at most
  * |keys|·k rows cross the shuffle), repeats the heap reduce-side, then
  * sorts only the k survivors per key to assign ranks. The rewrite rule
  * recognizes the window pattern and swaps it in transparently — queries
  * don't change, the oracle still gates exact results (total orderings
  * required, which our queries guarantee via tie-break columns).
  */
final case class TopKPerKeyLogical(
    partitionExprs: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    rankAttr: Attribute,
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def producedAttributes: AttributeSet = AttributeSet(rankAttr)
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKeyLogical =
    copy(child = newChild)
}

/** Rewrites Filter(rn <= k, Window(rn := row_number() over (p, o))) into
  * [[TopKPerKeyLogical]] when the window computes ONLY row_number and the
  * filter bounds it by a literal. */
object TopKRewriteRule extends Rule[LogicalPlan] {
  private object RowNumberWindow {
    def unapply(w: Window): Option[(Attribute, Seq[Expression], Seq[SortOrder])] =
      w.windowExpressions match {
        case Seq(a @ Alias(WindowExpression(
              _: org.apache.spark.sql.catalyst.expressions.RowNumber,
              WindowSpecDefinition(ps, os, _)), _)) if ps.nonEmpty =>
          Some((a.toAttribute, ps, os))
        case _ => None
      }
  }
  /** Spark's own InsertWindowGroupLimit may already sit under the Window;
    * the heap operator subsumes it (and its two Sorts) — drop it. */
  private def stripGroupLimit(p: LogicalPlan): LogicalPlan = p match {
    case wgl: WindowGroupLimit => wgl.child
    case other => other
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond, w @ RowNumberWindow(rn, ps, os)) =>
      cond match {
        case LessThanOrEqual(a: Attribute, IntegerLiteral(k))
            if a.semanticEquals(rn) && k > 0 =>
          TopKPerKeyLogical(ps, os, k, rn, stripGroupLimit(w.child))
        case LessThan(a: Attribute, IntegerLiteral(k))
            if a.semanticEquals(rn) && k > 1 =>
          TopKPerKeyLogical(ps, os, k - 1, rn, stripGroupLimit(w.child))
        case _ => f
      }
  }
}

object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyLogical(ps, os, k, rank, child) =>
      val partial = TopKPerKeyExec(ps, os, k, rank, planLater(child), partial = true)
      TopKPerKeyExec(ps, os, k, rank, partial, partial = false) :: Nil
    case _ => Nil
  }
}

/** Two-phase physical top-k: partial (map-side heaps, no required
  * distribution) then final (clustered on keys → exchange inserted by
  * EnsureRequirements, heaps again, rank assignment). */
final case class TopKPerKeyExec(
    partitionExprs: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    rankAttr: Attribute,
    child: SparkPlan,
    partial: Boolean) extends UnaryExecNode {

  override def output: Seq[Attribute] =
    if (partial) child.output else child.output :+ rankAttr

  // rankAttr is an expression field of this node, so it counts into
  // `references` even on the partial stage — declare it produced on both
  // stages or the plan renders with a spurious missing-input marker
  override def producedAttributes: AttributeSet = AttributeSet(rankAttr)

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(partitionExprs) :: Nil

  override def outputPartitioning: Partitioning = child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val ps = partitionExprs
    val os = order
    val limit = k
    val isPartial = partial
    child.execute().mapPartitions({ it =>
      val keyProj = UnsafeProjection.create(ps, childOutput)
      val ord = RowOrdering.create(os, childOutput) // total order (ties broken by query)
      val heapOrd: Ordering[InternalRow] = ord
      // per-key bounded heap; head = WORST kept row (reverse ordering)
      val heaps = mutable.LinkedHashMap.empty[UnsafeRow, mutable.PriorityQueue[InternalRow]]
      def insert(row: InternalRow): Unit = {
        val key = keyProj(row)
        val heap = heaps.get(key) match {
          case Some(h) => h
          case None =>
            // copy the key ONLY on first sight — an eager per-row
            // key.copy() would allocate once per input row, not per key
            val h = mutable.PriorityQueue.empty[InternalRow](heapOrd)
            heaps.put(key.copy(), h)
            h
        }
        if (heap.size < limit) {
          heap.enqueue(row.copy())
        } else if (ord.compare(row, heap.head) < 0) {
          heap.dequeue()
          heap.enqueue(row.copy())
        }
      }
      if (isPartial) {
        // BOUNDED map-side state: a map-side task can see EVERY distinct
        // key, so the heap map is flushed (emitted downstream and
        // cleared) whenever it reaches MaxBufferedKeys — a flushed key
        // seen again just contributes a second partial heap, which the
        // final stage merges. Memory is O(MaxBufferedKeys · k) per task
        // regardless of key cardinality; without this, a per-user top-k
        // over 10⁸ users would OOM the map side where the vanilla window
        // sort would have spilled.
        new Iterator[Iterator[InternalRow]] {
          override def hasNext: Boolean = it.hasNext || heaps.nonEmpty
          override def next(): Iterator[InternalRow] = {
            while (it.hasNext && heaps.size < TopKPerKeyExec.MaxBufferedKeys)
              insert(it.next())
            val out = heaps.values.toArray
            heaps.clear()
            out.iterator.flatMap(_.iterator)
          }
        }.flatten
      } else {
        // final stage: memory is proportional to THIS PARTITION'S OUTPUT
        // (≤ its distinct keys · k rows) — the reduced, post-shuffle
        // volume; scale key cardinality by adding partitions (AQE), not
        // by spilling input rows
        it.foreach(insert)
        val outTypes = output.map(_.dataType).toArray
        val outProj = UnsafeProjection.create(outTypes)
        val joined = new JoinedRow
        heaps.valuesIterator.flatMap { heap =>
          val sorted = heap.dequeueAll.reverse // ascending by ord = rank order
          sorted.iterator.zipWithIndex.map { case (row, i) =>
            val rankRow = new GenericInternalRow(Array[Any](i + 1))
            outProj(joined(row, rankRow))
          }
        }
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}

object TopKPerKeyExec {
  /** Map-side flush threshold: the partial stage emits and clears its
    * heap map at this many distinct keys, bounding task memory at
    * MaxBufferedKeys · k rows for any key cardinality. 64k keys · small
    * k is a few MB; raising it trades shuffle volume for memory. */
  val MaxBufferedKeys: Int = 65536
}

/** Runtime installation on an existing session (also injectable at build
  * time via `GraftExtensions`). Idempotent. */
object TopKInstall {
  def install(spark: SparkSession): Unit = {
    if (!spark.experimental.extraOptimizations.contains(TopKRewriteRule))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ TopKRewriteRule
    if (!spark.experimental.extraStrategies.contains(TopKStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKStrategy
  }
}
