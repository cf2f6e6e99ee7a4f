package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}

/** Static helper shared by the interpreted and generated paths. */
object SpanHashHelper {
  private val tl: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))
  private val space = Array[Byte](' '.toByte)
  private val NullBytes = "null".getBytes("UTF-8")

  /** All positional k-token span hashes of a token array: element i is
    * [[H32Helper.h32]] of `toks[i..i+k)` joined by single spaces —
    * byte-identical to md5 over the joined string (the digest is fed
    * the same UTF-8 stream), so the DuckDB oracle's
    * `md5(concat_ws(' ', ...))` recomputes it exactly. Token bytes are
    * extracted ONCE per row and the digest consumes them per span —
    * the UDF this replaces re-encoded the full joined span string per
    * position (each token encoded k times) on top of the Scala-UDF
    * ArrayData→Seq deserialization it paid per row. */
  def spanHashes(toks: ArrayData, k: Int): ArrayData = {
    val nTok = toks.numElements()
    val n = nTok - k + 1
    if (n <= 0) return new GenericArrayData(Array.empty[Long])
    val tb = new Array[Array[Byte]](nTok)
    var t = 0
    while (t < nTok) {
      // null element → the string "null", matching Scala string
      // interpolation (the UDF this replaces concatenated via
      // StringBuilder, which renders null that way); the engine's own
      // split() never produces nulls, but the function is registered
      // for general SQL use. The null probe MUST be isNullAt:
      // UnsafeArrayData.getUTF8String returns an empty string (not
      // null) for null elements on the Tungsten path, so a
      // getUTF8String == null check holds only interpreted and the
      // codegen'd plan would hash the same input differently
      tb(t) =
        if (toks.isNullAt(t)) NullBytes
        else toks.getUTF8String(t).getBytes
      t += 1
    }
    val md = tl.get()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      md.reset()
      var j = 0
      while (j < k) {
        if (j > 0) md.update(space)
        md.update(tb(i + j))
        j += 1
      }
      val d = md.digest()
      out(i) = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** Native Catalyst expression:
  * `graft_span_hashes(toks array<string>, k int) -> array<bigint>`.
  *
  * The span-dup family's hot inner stage (q75/q87/q140): every
  * positional k-token window hashed to the engine's canonical 32-bit
  * md5 value. The higher-order `transform(sequence(...), i ->
  * h32(concat_ws(' ', slice(...))))` spelling is CodegenFallback
  * (every lambda element interpreted) and a Scala UDF pays ArrayData
  * deserialization plus per-span string re-encoding; this expression
  * reads the Tungsten array in place and feeds token bytes straight to
  * one thread-local digest. */
case class SpanHashesExpression(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_span_hashes requires (ARRAY<STRING>, INT), got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }
  override def nullSafeEval(toks: Any, k: Any): Any =
    SpanHashHelper.spanHashes(toks.asInstanceOf[ArrayData],
      k.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, k) => s"graft.functions.SpanHashHelper.spanHashes($a, $k)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SpanHashesExpression =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "graft_span_hashes"
}

object SpanHashesExpression {
  val descriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_span_hashes"),
    new ExpressionInfo(classOf[SpanHashesExpression].getName, "graft_span_hashes"),
    (children: Seq[Expression]) => {
      require(children.length == 2,
        s"graft_span_hashes expects exactly 2 arguments, got ${children.length}")
      SpanHashesExpression(children.head, children(1))
    })
}
