package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.functions._

/** BottomKSampleAgg: the deterministic bounded reservoir behind the
  * quantile sketch (q60). Membership must be a pure function of the
  * input multiset — independent of partitioning and arrival order. */
class BottomKSampleSpec extends SparkSpec {
  import spark.implicits._

  private def agg(k: Int) = udaf(new BottomKSampleAgg(k),
    ExpressionEncoder[(Long, Double)]())

  test("selects exactly the k lexicographically-smallest (hash, value) " +
    "pairs, values sorted ascending") {
    val rows = Seq((5L, 50.0), (1L, 10.0), (3L, 30.0), (2L, 99.0), (4L, 40.0))
    val out = rows.toDF("h", "v").agg(agg(3)(col("h"), col("v"))).as[Seq[Double]]
      .head()
    assert(out == Seq(10.0, 30.0, 99.0)) // hashes 1,2,3 → values sorted
  }

  test("partition layout and arrival order never change the sample") {
    val rows = (0 until 5000).map(i => ((i * 2654435761L) % 100003L, i / 7.0))
    val a = spark.createDataset(rows).repartition(1)
      .agg(agg(64)(col("_1"), col("_2"))).as[Seq[Double]].head()
    val b = spark.createDataset(scala.util.Random.shuffle(rows)).repartition(13)
      .agg(agg(64)(col("_1"), col("_2"))).as[Seq[Double]].head()
    assert(a == b)
    assert(a.length == 64)
  }

  test("hash collisions tie-break by value deterministically (duplicate " +
    "pairs kept: multiset semantics)") {
    val rows = Seq((7L, 3.0), (7L, 1.0), (7L, 2.0), (7L, 1.0), (9L, 0.0))
    val out = rows.toDF("h", "v").repartition(3)
      .agg(agg(3)(col("h"), col("v"))).as[Seq[Double]].head()
    // bottom-3 pairs: (7,1.0), (7,1.0), (7,2.0)
    assert(out == Seq(1.0, 1.0, 2.0))
  }

  test("under-full groups return every value (exact small-group path)") {
    val out = Seq((2L, 8.0), (1L, 9.0)).toDF("h", "v")
      .agg(agg(256)(col("h"), col("v"))).as[Seq[Double]].head()
    assert(out == Seq(8.0, 9.0))
  }
}
