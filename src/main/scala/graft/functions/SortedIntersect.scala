package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Static helper shared by the interpreted path and generated code:
  * merge-walk intersection size of two SORTED bigint arrays, reading
  * Tungsten `ArrayData` in place — no per-row deserialization into Scala
  * collections (a plain UDF copies both arrays per invocation, which
  * dominates at ~10⁶ candidate pairs). */
object ArrayOps {
  def sortedIntersectSize(x: ArrayData, y: ArrayData): Int = {
    val nx = x.numElements(); val ny = y.numElements()
    if (nx == 0 || ny == 0) return 0
    // Strategy picked per pair from the sizes, result identical either
    // way. The merge walk is O(nx+ny) — right for the near-dup verify
    // path where both sides are one document's shingles. But against a
    // corpus-scale REFERENCE array (contamination's broadcast benchmark
    // set, which grows with the corpus) the merge re-walks the big side
    // once per row: O(docs·|bench|) = quadratic in corpus size (measured
    // 16× time on 10× data). Binary-searching each small-side element
    // costs small·log(big) reads — per-row cost grows only
    // logarithmically with the reference set — so switch whenever that
    // bound undercuts the merge.
    val (s, g, ns, ng) =
      if (nx <= ny) (x, y, nx, ny) else (y, x, ny, nx)
    val log2g = 32 - Integer.numberOfLeadingZeros(ng)
    if (ns.toLong * log2g < ns.toLong + ng) binarySearchCount(s, g, ns, ng)
    else mergeCount(s, g, ns, ng)
  }

  private def mergeCount(x: ArrayData, y: ArrayData, nx: Int, ny: Int): Int = {
    var i = 0; var j = 0; var inter = 0
    while (i < nx && j < ny) {
      val a = x.getLong(i); val b = y.getLong(j)
      if (a == b) { inter += 1; i += 1; j += 1 }
      else if (a < b) i += 1
      else j += 1
    }
    inter
  }

  /** Both arrays sorted distinct: each probe binary-searches the big
    * side within [lo, ng), where lo advances past confirmed positions —
    * probes are ascending, so the search window only ever shrinks. */
  private def binarySearchCount(s: ArrayData, g: ArrayData, ns: Int, ng: Int): Int = {
    var i = 0; var lo = 0; var inter = 0
    while (i < ns && lo < ng) {
      val v = s.getLong(i)
      var l = lo; var h = ng
      while (l < h) {
        val m = (l + h) >>> 1
        if (g.getLong(m) < v) l = m + 1 else h = m
      }
      if (l < ng && g.getLong(l) == v) { inter += 1; lo = l + 1 } else lo = l
      i += 1
    }
    inter
  }
}

/** `graft_sorted_intersect_size(array<bigint>, array<bigint>) -> int`.
  * Both inputs must be sorted ascending, distinct, and NULL-FREE (the
  * caller builds them with `sort_array(array_distinct(...))` over
  * non-null hashes). The type check accepts a nullable element schema
  * because Catalyst marks most derived arrays containsNull=true even
  * when no null can occur — but an actual null element would read as the
  * raw 0 word through `getLong` and silently match a genuine 0, so the
  * null-free precondition is part of the contract, not enforced per
  * element in the hot path (same contract as [[DotOps.dotLong]]). */
case class SortedIntersectSize(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = ArrayType(LongType, containsNull = false)
    if (Seq(left, right).forall(e => e.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_sorted_intersect_size requires ($ok, $ok), got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
  }
  override def nullSafeEval(l: Any, r: Any): Any =
    ArrayOps.sortedIntersectSize(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.ArrayOps.sortedIntersectSize($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectSize =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "graft_sorted_intersect_size"
}

object SortedIntersectSize {
  val descriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_sorted_intersect_size"),
    new ExpressionInfo(classOf[SortedIntersectSize].getName, "graft_sorted_intersect_size"),
    (children: Seq[Expression]) => {
      require(children.length == 2,
        s"graft_sorted_intersect_size expects exactly 2 arguments, got ${children.length}")
      SortedIntersectSize(children(0), children(1))
    })
}
