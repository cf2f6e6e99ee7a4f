package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Static helper shared by the interpreted path and generated code:
  * integer dot product of two equal-length bigint arrays, reading
  * Tungsten `ArrayData` in place. A plain UDF copies both arrays into
  * Scala collections per invocation, which dominates at ~10⁶+ candidate
  * pairs (same pathology as [[ArrayOps.sortedIntersectSize]]); the
  * higher-order `aggregate(zip_with(...))` alternative is interpreted
  * (CodegenFallback) and ~20× slower. */
object DotOps {
  /** Precondition: equal-length, null-free arrays (the engine only calls
    * this on its own quantized vectors). Unequal lengths fail loudly —
    * a min-length truncation would silently return a PARTIAL dot product
    * for a corrupt row and quietly corrupt downstream similarity
    * rankings, the worst failure mode for a ranking primitive. */
  def dotLong(x: ArrayData, y: ArrayData): Long = {
    val n = x.numElements()
    if (y.numElements() != n) throw new IllegalArgumentException(
      s"graft_dot_long: vector length mismatch ($n vs ${y.numElements()})")
    var i = 0
    var acc = 0L
    while (i < n) { acc += x.getLong(i) * y.getLong(i); i += 1 }
    acc
  }
}

/** `graft_dot_long(array<bigint>, array<bigint>) -> bigint` — exact
  * integer dot product for quantized-embedding similarity (the engine
  * quantizes embeddings to `round(x·10⁴)` so all vector math is
  * order-independent integer arithmetic; see operators/Similarity.scala). */
case class DotLongExpression(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = ArrayType(LongType, containsNull = false)
    if (Seq(left, right).forall(e => e.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_dot_long requires ($ok, $ok), got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
  }
  override def nullSafeEval(l: Any, r: Any): Any =
    DotOps.dotLong(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.DotOps.dotLong($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotLongExpression =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "graft_dot_long"
}

object DotLongExpression {
  val descriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_dot_long"),
    new ExpressionInfo(classOf[DotLongExpression].getName, "graft_dot_long"),
    (children: Seq[Expression]) => {
      require(children.length == 2,
        s"graft_dot_long expects exactly 2 arguments, got ${children.length}")
      DotLongExpression(children(0), children(1))
    })
}
