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

  test("sourceJaccardKmv: below k the estimate IS the exact Jaccard " +
    "(floored per-mille); zero-overlap pairs still emit a matrix row") {
    val d = Seq(
      // s1 shingles {abc,bcd,cde,def}; s2 {cde,def,efg,fgh} -> J = 2/6
      (1L, "a b c d e f", "s1"),
      (2L, "c d e f g h", "s2"),
      (3L, "x y z w v", "s3"))   // disjoint from both
      .toDF("doc_id", "text", "source")
      .selectExpr("doc_id", "text", "'en' AS lang", "source",
        "CAST(length(text) AS BIGINT) AS n_chars")
    val out = Sketches.sourceJaccardKmv(d, k = 256).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(out.keySet == Set(("s1", "s2"), ("s1", "s3"), ("s2", "s3")))
    assert(out(("s1", "s2")) == ((4L, 4L, 2L, 1000L * 2 / 6)),
      s"got ${out(("s1", "s2"))}")
    assert(out(("s1", "s3")) == ((4L, 3L, 0L, 0L)))
    assert(out(("s2", "s3")) == ((4L, 3L, 0L, 0L)))
  }

  test("sourceJaccardKmv: a truncated sketch (k below distinct counts) " +
    "matches a brute-force KMV on the same md5-prefix hashes") {
    import org.apache.commons.codec.digest.DigestUtils
    val texts = Seq(
      (1L, "a b c d e f g h i j k l m", "s1"),
      (2L, "e f g h i j k l m n o p q", "s2"),
      (3L, "a b c d e f z1 z2 z3 z4 z5 z6", "s1"))
    val k = 4
    def h(s: String): Long =
      java.lang.Long.parseLong(DigestUtils.md5Hex(s).take(8), 16)
    val sets = texts.groupBy(_._3).map { case (src, ds) =>
      src -> ds.flatMap(_._2.split("\\s+").sliding(3).map(_.mkString(" ")))
        .distinct.map(h).distinct.sorted.take(k).toVector
    }
    val Seq(a, b) = Seq("s1", "s2").map(sets)
    val u = (a ++ b).distinct.sorted.take(k)
    val nBoth = u.count(e => a.contains(e) && b.contains(e)).toLong
    val expected = (a.size.toLong, b.size.toLong, nBoth, nBoth * 1000L / u.size)
    val d = texts.toDF("doc_id", "text", "source")
      .selectExpr("doc_id", "text", "'en' AS lang", "source",
        "CAST(length(text) AS BIGINT) AS n_chars")
    val out = Sketches.sourceJaccardKmv(d, k = k).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(out(("s1", "s2")) == expected, s"${out(("s1", "s2"))} vs $expected")
    assertDeterministic(Sketches.sourceJaccardKmv(d, k = k))
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
