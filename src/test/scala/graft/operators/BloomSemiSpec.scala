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
