package graft

/** SqlGate: the safe dynamic-submission analog (SQL text instead of the
  * reference's exec()'d source). */
class SqlGateSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("submitted SQL text runs against the registered fixture tables") {
    val out = SqlGate.submit(spark, sf,
      """SELECT l_returnflag, CAST(SUM(l_quantity) AS BIGINT) AS sum_qty
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin).collect()
    assert(out.nonEmpty)
    assert(out.map(_.getString(0)).toSeq == out.map(_.getString(0)).toSeq.sorted)
  }

  test("submitted SQL equals the precompiled DataFrame operator") {
    val sql = SqlGate.submit(spark, sf,
      """SELECT c_mktsegment AS segment, CAST(COUNT(*) AS BIGINT) AS n
        |FROM customer GROUP BY 1 ORDER BY 1""".stripMargin)
    val df = Tables.customer(spark, sf)
      .groupBy(org.apache.spark.sql.functions.col("c_mktsegment").as("segment"))
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n"))
      .orderBy("segment")
    assert(rows(sql) == rows(df))
  }

  test("submitted SQL can call the graft extension functions") {
    val out = SqlGate.submit(spark, sf,
      "SELECT graft_adler32('hello') AS h").collect()
    assert(out.head.getLong(0) > 0)
  }

  test("a joined-and-windowed submission goes through the same planner " +
    "(broadcast under threshold, pushdown intact)") {
    val df = SqlGate.submit(spark, sf,
      """SELECT n_name, CAST(COUNT(*) AS BIGINT) AS n
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY 1 ORDER BY n DESC, n_name LIMIT 5""".stripMargin)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), p.take(600))
  }
}
