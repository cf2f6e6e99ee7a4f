package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class TopKPerKeySpec extends SparkSpec {
  import spark.implicits._

  private def topk(df: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("g")).orderBy(col("v").desc, col("id").asc)
    df.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
  }

  private def canon(df: DataFrame): Seq[Seq[Any]] =
    df.collect().toSeq.map(_.toSeq).sortBy(_.toString)

  test("rewritten plan uses TopKPerKeyExec and matches the window result exactly") {
    val rnd = new scala.util.Random(11)
    val df = (1 to 5000).map(i => (s"g${rnd.nextInt(20)}", rnd.nextInt(10000), i.toLong))
      .toDF("g", "v", "id")
    val expected = canon(topk(df, 5)) // vanilla window path
    TopKInstall.install(spark)
    try {
      val rewritten = topk(df, 5)
      rewritten.collect() // finalize adaptive plan
      val plan = rewritten.queryExecution.executedPlan.toString
      assert(plan.contains("TopKPerKey"), plan.take(600))
      assert(!plan.contains("WindowExec"), "window must be rewritten away")
      assert(canon(rewritten) == expected)
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == TopKRewriteRule)
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies.filterNot(_ == TopKStrategy)
    }
  }

  test("groups smaller than k, k=1, and rn < k strict form all match") {
    val df = Seq(("a", 10, 1L), ("a", 20, 2L), ("b", 5, 3L)).toDF("g", "v", "id")
    val expected1 = canon(topk(df, 1))
    val expected9 = canon(topk(df, 9))
    val strictW = Window.partitionBy(col("g")).orderBy(col("v").desc, col("id").asc)
    val expectedStrict = canon(df.withColumn("rn", row_number().over(strictW))
      .filter(col("rn") < 3))
    TopKInstall.install(spark)
    try {
      // each shape must actually RUN the heap operator — without the plan
      // assert, a rule that declines k=1 or k>groupSize would leave the
      // vanilla window comparing against itself
      val k1 = topk(df, 1)
      k1.collect()
      assert(k1.queryExecution.executedPlan.toString.contains("TopKPerKey"))
      assert(canon(k1) == expected1)
      val k9 = topk(df, 9)
      k9.collect()
      assert(k9.queryExecution.executedPlan.toString.contains("TopKPerKey"))
      assert(canon(k9) == expected9) // k larger than any group
      val strict = df.withColumn("rn", row_number().over(strictW))
        .filter(col("rn") < 3)
      strict.collect()
      assert(strict.queryExecution.executedPlan.toString.contains("TopKPerKey"))
      assert(canon(strict) == expectedStrict)
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == TopKRewriteRule)
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies.filterNot(_ == TopKStrategy)
    }
  }

  test("key cardinality past the partial flush threshold (64k) still " +
    "matches the window result — flushed keys merge in the final stage") {
    // 150k distinct keys in ONE input partition → the map-side heap map
    // flushes at least twice; duplicate partial heaps for re-seen keys
    // must merge correctly reduce-side
    val df = spark.range(300000).selectExpr(
      "concat('k', CAST(id % 150000 AS STRING)) AS g",
      "CAST((id * 7919) % 100000 AS INT) AS v",
      "id")
      .coalesce(1)
    // vanilla window reference BEFORE installing the rewrite
    val expect = topk(df, 2).filter(col("g") === "k7").orderBy("rn")
      .collect().map(_.toSeq).toSeq
    TopKInstall.install(spark)
    try {
      val rewritten = topk(df, 2)
      rewritten.collect()
      assert(rewritten.queryExecution.executedPlan.toString.contains("TopKPerKey"))
      // no row lost through the flush boundary: every key keeps both rows
      assert(rewritten.count() == 300000L) // 150k keys × 2 rows each
      val sample = rewritten.filter(col("g") === "k7").orderBy("rn")
        .collect().map(_.toSeq).toSeq
      assert(sample == expect)
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == TopKRewriteRule)
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies.filterNot(_ == TopKStrategy)
    }
  }

  test("non-top-k window patterns are left untouched") {
    TopKInstall.install(spark)
    try {
      // rank() instead of row_number: must NOT rewrite
      val df = Seq(("a", 10, 1L), ("a", 10, 2L)).toDF("g", "v", "id")
      val w = Window.partitionBy(col("g")).orderBy(col("v").desc)
      val q = df.withColumn("r", rank().over(w)).filter(col("r") <= 1)
      q.collect()
      assert(!q.queryExecution.executedPlan.toString.contains("TopKPerKey"))
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == TopKRewriteRule)
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies.filterNot(_ == TopKStrategy)
    }
  }
}
