package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

class Adler32Spec extends SparkSpec {
  import spark.implicits._

  test("matches java.util.zip.Adler32 for random strings") {
    val rnd = new scala.util.Random(9)
    val strs = Seq("", "a", "hello world", "héllo ünïcode ✓") ++
      (1 to 50).map(_ => rnd.alphanumeric.take(rnd.nextInt(40)).mkString)
    GraftFunctions.register(spark)
    val got = strs.toDF("s").selectExpr("graft_adler32(s)").as[Long].collect()
    val exp = strs.map { s =>
      val a = new java.util.zip.Adler32
      a.update(s.getBytes("UTF-8"))
      a.getValue
    }
    assert(got.toSeq == exp)
  }

  test("GENERATED code over a non-foldable input matches the JDK " +
    "reference (LocalRelations constant-fold past doGenCode)") {
    GraftFunctions.register(spark)
    val rows = spark.range(300)
      .selectExpr("concat('w', CAST(id * 13 AS STRING)) AS s")
      .selectExpr("s", "graft_adler32(s) AS a").collect()
    rows.foreach { r =>
      val jdk = new java.util.zip.Adler32()
      jdk.update(r.getString(0).getBytes("UTF-8"))
      assert(r.getLong(1) == jdk.getValue, s"codegen mismatch on '${r.getString(0)}'")
    }
  }

  test("null in, null out") {
    GraftFunctions.register(spark)
    val out = Seq(Some("x"), None).toDF("s")
      .selectExpr("graft_adler32(s)").collect()
    assert(out(0).getLong(0) == Adler32Helper.adler32(UTF8String.fromString("x")))
    assert(out(1).isNullAt(0))
  }

  test("participates in whole-stage codegen (no UDF Invoke boundary)") {
    GraftFunctions.register(spark)
    val df = spark.range(100)
      .selectExpr("graft_adler32(CAST(id AS STRING)) AS h")
      .filter(col("h") >= 0)
    val p = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("codegen"))
    assert(p.contains("WholeStageCodegen"))
    assert(p.contains("Adler32Helper"), "generated code must call the shared helper")
  }

  test("known value: adler32(\"Wikipedia\") == 0x11E60398") {
    assert(Adler32Helper.adler32(UTF8String.fromString("Wikipedia")) == 0x11E60398L)
  }
}
