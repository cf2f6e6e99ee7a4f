package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The bloom-pruned semi join (q106) must be byte-identical to the plain
  * semi join — the bloom is a pre-filter, never a semantics change — and
  * the pruning must actually drop non-matching probe rows map-side. */
class BloomSemiSpec extends SparkSpec {
  import spark.implicits._

  // 200 customers; only custkeys 1..20 hold a qualifying order
  private def fixture = {
    val customer = (1L to 200L).map(i =>
      (i, s"cust$i", if (i % 2 == 0) "EVEN" else "ODD"))
      .toDF("c_custkey", "c_name", "c_mktsegment")
    val orders = (1L to 20L).map(i =>
      (1000L + i, i, 150000.0 + i)) // all above the 120k threshold
      .toDF("o_orderkey", "o_custkey", "o_totalprice")
    (customer, orders)
  }

  test("bloomSemiSegments equals the plain semi join's aggregate " +
    "(false positives scrubbed by the exact join)") {
    val (customer, orders) = fixture
    val got = Joins.bloomSemiSegments(customer, orders).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    val want = customer
      .join(orders.filter(col("o_totalprice") > 120000.0)
        .select(col("o_custkey")),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n"))
      .orderBy(col("c_mktsegment")).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == want, s"got $got want $want")
    assert(got == Seq(("EVEN", 10L), ("ODD", 10L)), got.toString)
    assertDeterministic(Joins.bloomSemiSegments(customer, orders))
  }

  test("the probe is the engine-native BloomFilterMightContain " +
    "expression inside whole-stage codegen — no scalar UDF in the plan") {
    // parquet-backed fixture: over LocalRelations the optimizer folds
    // the whole probe filter away (ConvertToLocalRelation evaluates it
    // at plan time), which hides the very node this test pins
    val tmp = java.nio.file.Files
      .createTempDirectory("graft-bloom-spec").toString
    val (custLocal, ordLocal) = fixture
    custLocal.write.mode("overwrite").parquet(s"$tmp/customer")
    ordLocal.write.mode("overwrite").parquet(s"$tmp/orders")
    val customer = spark.read.parquet(s"$tmp/customer")
    val orders = spark.read.parquet(s"$tmp/orders")
    val df = Joins.bloomSemiSegments(customer, orders)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"),
      s"native bloom probe missing from plan:\n$plan")
    assert(plan.contains("bloom_filter_agg"),
      s"bloom must be built by the distributed aggregate, not on the driver:\n$plan")
    assert(!plan.contains("UDF"), s"scalar UDF crept back into:\n$plan")
    // the filter carrying the probe must sit inside a WholeStageCodegen
    // span (the expression has doGenCode, nothing forces it out) —
    // checked on the FINAL adaptive plan, where codegen stages exist;
    // `*(n) Filter` is the codegen-span marker in the plan string
    df.collect()
    val finalPlan = df.queryExecution.executedPlan.toString
    assert("""\*\(\d+\) Filter [^\n]*might_contain""".r
      .findFirstIn(finalPlan).isDefined,
      s"bloom probe outside codegen:\n$finalPlan")
  }

  test("the bloom probe drops (almost all) non-matching rows BEFORE the " +
    "join — the map-side pruning is real, not decorative") {
    val (customer, orders) = fixture
    val keys = orders.filter(col("o_totalprice") > 120000.0)
      .select(col("o_custkey"))
    val bloom = keys.stat.bloomFilter("o_custkey", 1000000L, 0.01)
    val survivors = customer.collect()
      .map(_.getLong(0)).count(bloom.mightContainLong)
    // 20 true keys; 180 non-members pass only at the ~1% fpp rate.
    // Even a 10x-unlucky bloom stays far below the unpruned 200.
    assert(survivors >= 20 && survivors <= 40,
      s"expected ~20 survivors of 200 probes, got $survivors")
  }
}
