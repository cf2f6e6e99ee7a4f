package graft.operators

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.toSeq.toDF("doc_id", "text")
      .selectExpr("doc_id", "text", "'en' AS lang", "'s' AS source",
        "CAST(length(text) AS BIGINT) AS n_chars")

  test("extractFeatures: byte stats, digest and resize clamp are exact") {
    val out = Multimodal.extractFeatures(spark, docs((0L, "abc"), (7L, "zz")))
      .collect().map(r => r.getLong(0) -> r).toMap
    val r0 = out(0L)
    assert(r0.getAs[String]("fmt") == "jpeg") // 0 % 3
    assert(r0.getAs[Long]("n_bytes") == 3L)
    assert(r0.getAs[Long]("checksum") == ('a' + 'b' + 'c').toLong)
    assert(r0.getAs[String]("digest") == "900150983cd24fb0d6963f7d28e17f72") // md5("abc")
    assert(r0.getAs[Int]("width") == 64 && r0.getAs[Int]("height") == 64)
    val r7 = out(7L)
    assert(r7.getAs[String]("fmt") == "png") // 7 % 3 == 1
    assert(r7.getAs[Int]("width") == math.min(64 + 7 % 8 * 32, 224))
  }

  test("frameSample expands 1 media row to n_frames rows before rollup") {
    val big = "x" * 3000 // 3000 bytes → 3000/1024 + 1 = 3 frames
    val out = Multimodal.frameSample(spark, docs((0L, big))).collect()
    assert(out.length == 1)
    assert(out.head.getAs[Long]("n_media") == 1L)
    assert(out.head.getAs[Long]("total_frames") == 3L)
  }

  test("feature extraction is deterministic across executions") {
    val d = docs((0L, "abc"), (1L, "defg"), (2L, "hij"))
    assertDeterministic(Multimodal.extractFeatures(spark, d))
  }
}
