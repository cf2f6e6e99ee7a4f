package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.types.{AbstractDataType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static helper so both the interpreted path and generated code call the
  * exact same implementation. */
object Adler32Helper {
  /** zlib adler32 over UTF-8 bytes — the hash the reference uses to
    * partition wordcount keys (example_wordcount.py:22–27). */
  def adler32(s: UTF8String): Long = {
    val a = new java.util.zip.Adler32
    a.update(s.getBytes)
    a.getValue
  }
}

/** Native Catalyst expression: `graft_adler32(str) -> bigint`.
  *
  * A deliberate showcase of the preferred extension ladder (SURVEY §4.2):
  * where built-ins can't express a scalar (Spark has crc32/md5/xxhash64
  * but not adler32), a codegen'd `Expression` beats a Scala UDF — no
  * row-at-a-time Invoke boundary, participates in whole-stage codegen,
  * null handling for free via [[UnaryExpression.nullSafeEval]].
  */
case class Adler32Expression(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes() = {
    if (child.dataType == StringType) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"graft_adler32 requires STRING, got ${child.dataType.catalogString}")
  }
  override def nullSafeEval(input: Any): Any =
    Adler32Helper.adler32(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Adler32Helper.adler32($c)")
  override protected def withNewChildInternal(newChild: Expression): Adler32Expression =
    copy(child = newChild)
  override def prettyName: String = "graft_adler32"
}

/** Session-extension injection (`spark.sql.extensions=graft.functions.GraftExtensions`)
  * plus a programmatic registrar for already-built sessions. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftFunctions.adler32Descriptor)
    ext.injectFunction(SortedIntersectSize.descriptor)
    ext.injectFunction(DotLongExpression.descriptor)
    ext.injectFunction(H32Expression.descriptor)
  }
}

object GraftFunctions {
  val adler32Descriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_adler32"),
    new ExpressionInfo(classOf[Adler32Expression].getName, "graft_adler32"),
    (children: Seq[Expression]) => {
      require(children.length == 1,
        s"graft_adler32 expects exactly 1 argument, got ${children.length}")
      Adler32Expression(children.head)
    })

  /** Register all graft functions on an existing session (idempotent;
    * used by Verify/Bench/tests and the query lambdas that need them). */
  def register(spark: SparkSession): Unit =
    Seq(adler32Descriptor, SortedIntersectSize.descriptor,
        DotLongExpression.descriptor, H32Expression.descriptor,
        SpanHashesExpression.descriptor).foreach { d =>
      spark.sessionState.functionRegistry.registerFunction(d._1, d._2, d._3)
    }
}
