package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** One-pass table profiler (q64's engine side) on a synthetic frame —
  * the fixture tables carry no NULLs, so the null-count and sentinel
  * semantics are pinned here. */
class TableProfileSpec extends SparkSpec {
  import spark.implicits._

  private val keys = Seq(
    ("id", "CAST(id AS STRING)", "CAST(id AS VARCHAR)"),
    ("tag", "tag", "tag"))

  test("profile counts nulls, and below k the distinct estimate is exact " +
    "(NULL coalesced to one sentinel value)") {
    val df = Seq(
      (1L, Some("a")), (2L, Some("b")), (3L, Some("a")),
      (4L, None), (5L, None)).toDF("id", "tag")
    val out = Sketches.tableProfile(df, keys, k = 64).collect()
      .map(r => r.getAs[String]("col_name") -> r).toMap
    assert(out.keySet == Set("id", "tag"))
    assert(out("id").getAs[Long]("n_rows") == 5L)
    assert(out("id").getAs[Long]("n_nulls") == 0L)
    assert(out("id").getAs[Double]("approx_distinct") == 5.0)
    assert(out("tag").getAs[Long]("n_nulls") == 2L)
    // distinct over the null-coalesced key: {a, b, <NULL>} = 3
    assert(out("tag").getAs[Double]("approx_distinct") == 3.0)
  }

  test("profile is one aggregation pass over the table (a single scan in " +
    "the plan) and deterministic across partitionings") {
    val df = (0L until 1000L).map(i => (i % 97, s"t${i % 13}"))
      .toDF("id", "tag")
    val prof = Sketches.tableProfile(df.repartition(7), keys, k = 64)
    prof.collect()
    // AQE's isFinalPlan string prints Final AND Initial sections — count
    // scans in the final section only
    val finalPlan = prof.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(finalPlan.linesIterator.count(_.contains("LocalTableScan")) == 1,
      "the profiler must read the table once")
    // the sketch state combines map-side: only ≤k-long buffers shuffle
    assert(finalPlan.contains("partial_kmvsketchagg"), finalPlan.take(800))
    assertDeterministic(
      Sketches.tableProfile(df.repartition(13), keys, k = 64))
    assert(Sketches.tableProfile(df, keys, k = 64).collect()
      .forall(_.getAs[Double]("approx_distinct") > 0.0))
  }
}
