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

  /** Render a solid-color w×h PNG in memory. */
  private def png(w: Int, h: Int, rgb: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("decodeImages: real PNG round-trip — pad-to-square on white, " +
    "resize to 224, RGB channel means") {
    // 100×50 solid red: padded to a 100×100 square, the red band covers
    // half the area, white the other half → mean_r = 255, mean_g ≈ 127.5
    val media = Seq(
      (0L, png(100, 50, 0xff0000), "png", 100, 50),
      (1L, png(10, 10, 0x0000ff), "png", 10, 10),     // square: no padding
      (2L, "not an image".getBytes("UTF-8"), "png", 0, 0)) // undecodable
      .toDF("doc_id", "payload", "fmt", "declared_w", "declared_h")
    val out = Multimodal.decodeImages(spark, media).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(!out.contains(2L), "undecodable payloads must be skipped")
    val red = out(0L)
    assert(red.getAs[Int]("orig_w") == 100 && red.getAs[Int]("orig_h") == 50)
    assert(math.abs(red.getAs[Double]("mean_r") - 255.0) < 1.0)
    assert(math.abs(red.getAs[Double]("mean_g") - 127.5) < 3.0) // half white
    val blue = out(1L)
    assert(blue.getAs[Double]("mean_b") > 254.0 && blue.getAs[Double]("mean_r") < 1.0)
  }

  /** Render an in-memory 16-bit mono WAV: `samples` at `rate` Hz. */
  private def wav(samples: Array[Short], rate: Float): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(rate, 16, 1, true, false)
    val bytes = new Array[Byte](samples.length * 2)
    samples.zipWithIndex.foreach { case (s, i) =>
      bytes(2 * i) = (s & 0xff).toByte
      bytes(2 * i + 1) = ((s >> 8) & 0xff).toByte
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(bytes), fmt, samples.length),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("decodeAudio: real WAV round-trip — rate, length, peak, RMS") {
    // constant amplitude 1000 → RMS = 1000, peak = 1000; the audio path
    // needs only (doc_id, payload) — no fabricated image metadata
    val tone = wav(Array.fill(8000)(1000.toShort), 8000f)
    val media = Seq(
      (0L, tone),
      (1L, "not audio".getBytes("UTF-8")))
      .toDF("doc_id", "payload")
    val out = Multimodal.decodeAudio(spark, media).collect()
    assert(out.length == 1 && out.head.getLong(0) == 0L)
    val r = out.head
    assert(r.getAs[Int]("sample_rate") == 8000)
    assert(r.getAs[Int]("channels") == 1)
    assert(r.getAs[Long]("n_samples") == 8000L)
    assert(r.getAs[Int]("peak") == 1000)
    assert(math.abs(r.getAs[Double]("rms") - 1000.0) < 1e-9)
  }

  test("decodeImages is deterministic across executions") {
    val media = Seq((0L, png(33, 20, 0x123456), "png", 33, 20))
      .toDF("doc_id", "payload", "fmt", "declared_w", "declared_h")
    assertDeterministic(Multimodal.decodeImages(spark, media))
  }

  test("feature extraction is deterministic across executions") {
    val d = docs((0L, "abc"), (1L, "defg"), (2L, "hij"))
    assertDeterministic(Multimodal.extractFeatures(spark, d))
  }

  test("imageDecodeStats over the committed fixtures: corrupt row drops, " +
    "solid 224×224 sums are analytic, JPEG/BMP plugins decode") {
    val dir = new java.io.File("fixtures/images").getAbsolutePath
    val rows = Multimodal.imageDecodeStats(spark, dir).collect()
    // 9 committed payloads, 1 deliberately corrupt → 8 decoded rows
    assert(rows.length == 8, rows.map(_.getLong(0)).mkString(","))
    assert(!rows.exists(_.getLong(0) == 8L), "corrupt img_008 must drop")
    val byId = rows.map(r => r.getLong(0) -> r).toMap
    // identity-size solid red: sum_r = 255·224², others 0 — analytic,
    // independent of any resample kernel
    assert(byId(0L).getLong(3) == 255L * 224 * 224)
    assert(byId(0L).getLong(4) == 0L && byId(0L).getLong(5) == 0L)
    // solid 50×50 BMP upscales to a still-solid tensor
    assert(byId(6L).getLong(4) == 64L * 224 * 224)
    assert(byId(6L).getLong(5) == 192L * 224 * 224)
    // JPEG (img_007) decoded via the jpeg reader plugin
    assert(byId(7L).getInt(1) == 96 && byId(7L).getInt(2) == 96)
    // and the whole table matches the committed expected CSV the
    // DuckDB oracle reads — the same pin the driver gate applies
    val expected = spark.read.option("header", "true")
      .option("inferSchema", "true")
      .csv(new java.io.File("fixtures/images_expected.csv").getAbsolutePath)
      .collect().map(r => (0 until 6).map(i => r.get(i).toString).mkString(","))
      .sorted.toSeq
    val got = rows.map(r => (0 until 6).map(i => r.get(i).toString).mkString(","))
      .sorted.toSeq
    assert(got == expected)
  }
}
