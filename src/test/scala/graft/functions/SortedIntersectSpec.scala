package graft.functions

import graft.SparkSpec

class SortedIntersectSpec extends SparkSpec {
  import spark.implicits._

  // exercises BOTH strategies the expression picks from sizes: symmetric
  // pairs stay on the merge walk, asymmetric pairs (one probe set vs a
  // corpus-scale reference array, the contamination shape that went
  // quadratic at 10x) take the advancing-window binary search — results
  // must be identical to a Set-intersection brute force either way
  test("adaptive sorted-intersect equals brute force across symmetric " +
    "and asymmetric size mixes (seed-pinned)") {
    GraftFunctions.register(spark)
    val rnd = new scala.util.Random(20260813)
    def sortedDistinct(n: Int, bound: Long): Seq[Long] =
      Seq.fill(n)(math.abs(rnd.nextLong()) % bound).distinct.sorted
    val cases = Seq(
      (0, 0, 100L), (0, 50, 100L), (3, 3, 10L),
      (50, 50, 200L),      // merge branch, dense overlap
      (50, 50, 100000L),   // merge branch, sparse overlap
      (20, 5000, 20000L),  // binary-search branch, dense overlap
      (20, 5000, 1L << 40),// binary-search branch, sparse overlap
      (5000, 20, 20000L),  // argument order must not matter
      (1, 4096, 8192L), (4096, 1, 8192L))
    val data = cases.zipWithIndex.map { case ((na, nb, bound), i) =>
      (i, sortedDistinct(na, bound), sortedDistinct(nb, bound))
    }
    val got = data.toDF("id", "a", "b")
      .selectExpr("id", "graft_sorted_intersect_size(a, b) AS n")
      .collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
    data.foreach { case (i, a, b) =>
      assert(got(i) == a.toSet.intersect(b.toSet).size,
        s"case $i: |a|=${a.size} |b|=${b.size}")
    }
  }

  test("repeated probes against one reference window advance correctly " +
    "(every probe present, every probe absent, interleaved)") {
    GraftFunctions.register(spark)
    val ref = (0L until 3000L).map(_ * 3) // 0, 3, 6, ...
    val present = ref.take(40)
    val absent = (0L until 40L).map(_ * 3 + 1)
    val interleaved = (present ++ absent).sorted
    val data = Seq((1, present, ref), (2, absent, ref), (3, interleaved, ref))
    val got = data.toDF("id", "a", "b")
      .selectExpr("id", "graft_sorted_intersect_size(a, b) AS n")
      .collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
    assert(got == Map(1 -> 40, 2 -> 0, 3 -> 40), got.toString)
  }
}
