package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static helper so the interpreted path and generated code share one
  * implementation. */
object H32Helper {
  // MessageDigest.getInstance does a provider lookup per call — a
  // per-thread instance amortizes it (MessageDigest itself is stateful
  // and NOT thread-safe)
  private val tl: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))

  /** First 4 md5 bytes of the UTF-8 input as an unsigned 32-bit value in
    * a long — bit-identical to `CAST(conv(substr(md5(s),1,8),16,10) AS
    * BIGINT)` without materializing the hex string. */
  def h32(s: UTF8String): Long = {
    val md = tl.get(); md.reset()
    val d = md.digest(s.getBytes)
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
  }

  /** String overload for driver-side builders (LSH hyperplane weights,
    * stub-codec oracles) — the ONE implementation of the engine's
    * canonical 32-bit hash; duplicating this arithmetic elsewhere risks
    * the cross-engine determinism anchor silently diverging. */
  def h32(s: String): Long = h32(UTF8String.fromString(s))
}

/** Native Catalyst expression: `graft_h32(str) -> bigint`.
  *
  * The engine's canonical md5-derived 32-bit hash (every sketch, sample
  * and bucket key derives from it so the DuckDB oracle can recompute it
  * exactly). The SQL spelling `CAST(conv(substr(md5(s),1,8),16,10) AS
  * BIGINT)` measured ~12 µs/value even inside whole-stage codegen —
  * Spark's `Md5` calls `DigestUtils.md5Hex` (a MessageDigest provider
  * lookup per row) and then pays hex-encode → substr → base-16 parse
  * allocations. This expression digests the UTF-8 bytes straight to a
  * long (~0.5 µs/value), stays codegen-compatible, and the oracle keeps
  * using the arithmetic SQL form.
  */
case class H32Expression(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes() = {
    if (child.dataType == StringType) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"graft_h32 requires STRING, got ${child.dataType.catalogString}")
  }
  override def nullSafeEval(input: Any): Any =
    H32Helper.h32(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.H32Helper.h32($c)")
  override protected def withNewChildInternal(newChild: Expression): H32Expression =
    copy(child = newChild)
  override def prettyName: String = "graft_h32"
}

object H32Expression {
  val descriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_h32"),
    new ExpressionInfo(classOf[H32Expression].getName, "graft_h32"),
    (children: Seq[Expression]) => {
      require(children.length == 1,
        s"graft_h32 expects exactly 1 argument, got ${children.length}")
      H32Expression(children.head)
    })
}
