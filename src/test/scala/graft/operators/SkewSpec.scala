package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("saltedEquiJoin equals the plain join on a skewed key distribution") {
    val rnd = new scala.util.Random(3)
    // 90% of rows share one hot key
    val big = (1 to 2000).map(i =>
      (if (rnd.nextDouble() < 0.9) 1L else rnd.nextInt(50).toLong, s"v$i"))
      .toDF("k", "payload")
    val small = (0L to 50L).map(k => (k, s"dim$k")).toDF("sk", "name")
    val plain = big.join(small, col("k") === col("sk"))
      .select("k", "payload", "name").collect().map(_.toSeq).sortBy(_.toString)
    val salted = Skew.saltedEquiJoin(big, small, "k", "sk", salts = 8)
      .select("k", "payload", "name").collect().map(_.toSeq).sortBy(_.toString)
    assert(salted.toSeq == plain.toSeq)
  }

  test("salting actually spreads the hot key across partitions — pinned " +
    "on the PRODUCT salt expression, not a test-local copy") {
    val big = (1 to 1000).map(i => (1L, s"v$i")).toDF("k", "payload") // one key
    // Skew.saltOf is the expression saltedEquiJoin applies to the big
    // side; a key-only hash regression (all hot rows → one bucket)
    // must fail HERE, not only in production stragglers
    val used = big.select(countDistinct(Skew.saltOf(big, 8))).head.getLong(0)
    assert(used >= 6, s"expected ~8 salt buckets in use, got $used")
  }

  test("a real __salt input column survives the join untouched") {
    val big = (1 to 50).map(i => (i.toLong % 5, s"v$i", s"mine$i"))
      .toDF("k", "payload", "__salt") // caller-owned column named __salt
    val small = (0L to 5L).map(k => (k, s"dim$k")).toDF("sk", "name")
    val out = Skew.saltedEquiJoin(big, small, "k", "sk", salts = 4)
    assert(out.columns.contains("__salt"), out.columns.mkString(","))
    assert(out.select("__salt").collect().forall(_.getString(0).startsWith("mine")))
  }
}
