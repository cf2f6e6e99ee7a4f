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

  test("salting actually spreads the hot key across partitions") {
    val big = (1 to 1000).map(i => (1L, s"v$i")).toDF("k", "payload") // one key
    val salted = big.withColumn("__salt",
      pmod(xxhash64(col("k"), col("payload")), lit(8)))
    val used = salted.select(countDistinct(col("__salt"))).head.getLong(0)
    assert(used >= 6, s"expected ~8 salt buckets in use, got $used")
  }
}
