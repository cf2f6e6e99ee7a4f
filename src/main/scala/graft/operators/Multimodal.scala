package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One opaque media blob with typed metadata (image/audio/video column
  * pattern). Payload is an opaque `binary`; metadata is typed columns. */
final case class MediaRow(doc_id: Long, payload: Array[Byte], fmt: String,
                          declared_w: Int, declared_h: Int)

/** Decoded/extracted features — the output schema of the codec stage. */
final case class MediaFeatures(doc_id: Long, fmt: String, n_bytes: Long,
                               checksum: Long, width: Int, height: Int,
                               n_frames: Int, digest: String)

/** One sampled frame (1 → N expansion of a media row). */
final case class FrameRow(doc_id: Long, fmt: String, frame_idx: Int,
                          frame_hash: Long)

/** Output of the REAL image decode path: original dims + the model-input
  * tensor summarized per channel (mean over the 224×224 RGB plane). */
final case class DecodedImage(doc_id: Long, orig_w: Int, orig_h: Int,
                              mean_r: Double, mean_g: Double, mean_b: Double)

/** Multimodal-column plumbing (north-star; generalizes the reference's
  * image pipeline, plants_classifier.py:116–163): media as opaque
  * `BinaryType` payloads + typed metadata, decoded via per-partition
  * codec init inside `mapPartitions` — the canonical Spark pattern for
  * batched native/model inference (one codec instance per partition, not
  * per row; at 1000 executors this is what amortizes model/codec load).
  *
  * The codec itself is a STUB (no image/audio libs in this container):
  * "decode" computes deterministic byte statistics, "resize" clamps the
  * declared dims, "frame-sample" derives md5-chained frame hashes. The
  * Spark-side plumbing — schema, encoders, partition batching, 1→N frame
  * expansion — is real, and every output is arithmetic the DuckDB oracle
  * reproduces (the fixture payloads are ASCII, so byte sums equal
  * codepoint sums).
  */
object Multimodal {

  /** Synthesize the media table from `documents`: payload = utf-8 bytes
    * of the text, metadata derived deterministically from doc_id. */
  def mediaTable(documents: DataFrame): DataFrame =
    documents.select(col("doc_id"),
      col("text").cast("binary").as("payload"),
      expr("CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'jpeg' WHEN 1 THEN 'png' ELSE 'gif' END").as("fmt"),
      expr("CAST(64 + (doc_id % 8) * 32 AS INT)").as("declared_w"),
      expr("CAST(64 + (doc_id % 5) * 32 AS INT)").as("declared_h"))

  /** Stub codec: stands in for a native decoder (libjpeg/ffmpeg/…).
    * `open()` is the expensive per-partition init a real codec would do. */
  private final class StubCodec {
    private val md = java.security.MessageDigest.getInstance("MD5")
    /** "Decode": byte count + unsigned-byte checksum. A real codec would
      * return pixel buffers; the signature and batch shape are the same. */
    def decode(payload: Array[Byte]): (Long, Long) = {
      var sum = 0L; var i = 0
      while (i < payload.length) { sum += payload(i) & 0xff; i += 1 }
      (payload.length.toLong, sum)
    }
    def md5Hex(b: Array[Byte]): String = {
      md.reset()
      md.digest(b).map(x => f"$x%02x").mkString
    }
    /** The engine's canonical 32-bit hash — delegated to the ONE
      * implementation ([[graft.functions.H32Helper]]). */
    def h32(s: String): Long = graft.functions.H32Helper.h32(s)
  }

  /** REAL image codec on JDK `javax.imageio` — zero extra dependencies.
    * Reproduces the reference transform (plants_classifier.py:116–133):
    * convert to RGB, pad to a centered square on white (255,255,255),
    * resize to 224×224, emit the HWC float tensor. The only deliberate
    * divergence: the JDK has no Lanczos kernel, so resampling is
    * bilinear — same shape and value range, slightly different pixel
    * interpolation (which is why this path is spec-tested, not
    * DuckDB-oracle-checked: no SQL engine decodes PNGs).
    *
    * Same per-partition-init contract as [[StubCodec]]: construct once
    * per partition inside mapPartitions, never per row. */
  private[operators] final class ImageIoCodec {
    import java.awt.image.BufferedImage

    /** payload → (orig_w, orig_h, 224·224·3 floats, HWC, RGB in 0..255);
      * None for undecodable payloads (reference logs + skips, :132–133). */
    def decodeRgb224(payload: Array[Byte]): Option[(Int, Int, Array[Float])] = {
      val img =
        try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload)))
        catch { case _: Exception => None }
      img.map { src =>
        val (w, h) = (src.getWidth, src.getHeight)
        val side = math.max(w, h)
        val square = new BufferedImage(side, side, BufferedImage.TYPE_INT_RGB)
        val g = square.createGraphics()
        try {
          g.setColor(java.awt.Color.WHITE)
          g.fillRect(0, 0, side, side)
          g.drawImage(src, (side - w) / 2, (side - h) / 2, null) // centered paste
        } finally g.dispose()
        val out = new BufferedImage(224, 224, BufferedImage.TYPE_INT_RGB)
        val g2 = out.createGraphics()
        try {
          g2.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
            java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
          g2.drawImage(square, 0, 0, 224, 224, null)
        } finally g2.dispose()
        val px = new Array[Float](224 * 224 * 3)
        var y = 0; var i = 0
        while (y < 224) {
          var x = 0
          while (x < 224) {
            val rgb = out.getRGB(x, y)
            px(i) = ((rgb >> 16) & 0xff).toFloat
            px(i + 1) = ((rgb >> 8) & 0xff).toFloat
            px(i + 2) = (rgb & 0xff).toFloat
            x += 1; i += 3
          }
          y += 1
        }
        (w, h, px)
      }
    }
  }

  /** Output of the real audio decode path: PCM stream stats. */
  final case class DecodedAudio(doc_id: Long, sample_rate: Int, channels: Int,
                                n_samples: Long, peak: Int, rms: Double)

  /** REAL audio codec on JDK `javax.sound.sampled` — zero extra
    * dependencies, same per-partition-init contract as [[ImageIoCodec]].
    * Decodes WAV/PCM payloads to 16-bit samples and computes stream
    * stats (duration, peak, RMS) — the feature-extraction stage an
    * audio curation pipeline runs before filtering. */
  private[operators] final class WavCodec {
    def decodeStats(payload: Array[Byte]): Option[(Int, Int, Long, Int, Double)] =
      try {
        val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(payload))
        try {
          val fmt = in.getFormat
          if (fmt.getSampleSizeInBits != 16) None
          else {
            val bytes = in.readAllBytes()
            val be = fmt.isBigEndian
            val n = bytes.length / 2
            var peak = 0
            var sumSq = 0.0
            var i = 0
            while (i < n) {
              val lo = bytes(2 * i) & 0xff
              val hi = bytes(2 * i + 1) & 0xff
              val s = (if (be) (lo << 8) | hi else (hi << 8) | lo).toShort.toInt
              val a = math.abs(s)
              if (a > peak) peak = a
              sumSq += s.toDouble * s
              i += 1
            }
            val perChannel = n / math.max(1, fmt.getChannels)
            Some((fmt.getSampleRate.toInt, fmt.getChannels, perChannel.toLong,
              peak, math.sqrt(sumSq / math.max(1, n))))
          }
        } finally in.close()
      } catch { case _: Exception => None }
  }

  /** Distributed real audio decode: WAV payloads → per-clip PCM stats;
    * undecodable rows dropped (skip-on-error, like the image path).
    * Reads ONLY (doc_id, payload) — audio tables don't carry the image
    * metadata columns, and routing through [[MediaRow]] forced callers
    * to fabricate declared_w/declared_h just to satisfy the encoder. */
  def decodeAudio(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        val codec = new WavCodec // per-partition init
        rows.flatMap { case (docId, payload) =>
          codec.decodeStats(payload).map { case (sr, ch, ns, peak, rms) =>
            DecodedAudio(docId, sr, ch, ns, peak, rms)
          }
        }
      }.toDF().orderBy(col("doc_id"))
  }

  /** Distributed real decode: binary payloads → per-image tensor stats.
    * Undecodable rows are dropped (the reference's skip-on-error). */
  def decodeImages(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.select(col("doc_id"), col("payload"), col("fmt"),
        col("declared_w"), col("declared_h")).as[MediaRow]
      .mapPartitions { rows =>
        val codec = new ImageIoCodec // per-partition init
        rows.flatMap { m =>
          codec.decodeRgb224(m.payload).map { case (w, h, px) =>
            var r = 0.0; var g = 0.0; var b = 0.0
            var i = 0
            while (i < px.length) { r += px(i); g += px(i + 1); b += px(i + 2); i += 3 }
            val n = 224.0 * 224.0
            DecodedImage(m.doc_id, w, h, r / n, g / n, b / n)
          }
        }
      }.toDF().orderBy(col("doc_id"))
  }

  /** Driver-gated REAL image decode over a committed fixture directory:
    * `binaryFile` scan → per-partition [[ImageIoCodec]] → integer
    * per-channel sums of the 224×224 RGB tensor (pixel values are
    * 0..255 integers stored as floats, so the sums are EXACT longs —
    * no float surface in the gate). Undecodable payloads drop
    * (skip-on-error), so the committed corrupt fixture must NOT
    * surface a row.
    *
    * The oracle reads `fixtures/images_expected.csv` — committed
    * outputs of this exact codec on this JDK (no SQL engine decodes
    * PNGs, so re-derivation is impossible; the gate pins decode
    * determinism and regression instead). The solid-color 224×224
    * rows are analytically checkable by hand: sum = value·224². */
  def imageDecodeStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").load(dir)
      .select(
        expr("CAST(regexp_extract(path, '([0-9]+)\\\\.[a-z]+$', 1) AS BIGINT)")
          .as("doc_id"),
        col("content").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        val codec = new ImageIoCodec // per-partition init
        rows.flatMap { case (id, payload) =>
          codec.decodeRgb224(payload).map { case (w, h, px) =>
            var r = 0L; var g = 0L; var b = 0L
            var i = 0
            while (i < px.length) {
              r += px(i).toLong; g += px(i + 1).toLong; b += px(i + 2).toLong
              i += 3
            }
            (id, w, h, r, g, b)
          }
        }
      }
      .toDF("doc_id", "orig_w", "orig_h", "sum_r", "sum_g", "sum_b")
      .orderBy(col("doc_id"))
  }

  val imageDecodeStatsOracle: String = {
    val p = new java.io.File("fixtures/images_expected.csv").getAbsolutePath
    s"""SELECT CAST(doc_id AS BIGINT) AS doc_id,
       |       CAST(orig_w AS INT) AS orig_w, CAST(orig_h AS INT) AS orig_h,
       |       CAST(sum_r AS BIGINT) AS sum_r, CAST(sum_g AS BIGINT) AS sum_g,
       |       CAST(sum_b AS BIGINT) AS sum_b
       |FROM read_csv('$p', header=true) ORDER BY doc_id""".stripMargin
  }

  /** Decode + feature-extract + resize, one codec per partition. */
  def extractFeatures(spark: SparkSession, documents: DataFrame): DataFrame = {
    import spark.implicits._
    mediaTable(documents).as[MediaRow].mapPartitions { rows =>
      val codec = new StubCodec // per-partition init (amortized, like model load)
      rows.map { m =>
        val (n, sum) = codec.decode(m.payload)
        MediaFeatures(m.doc_id, m.fmt, n, sum,
          math.min(m.declared_w, 224), math.min(m.declared_h, 224),
          (n / 1024 + 1).toInt, codec.md5Hex(m.payload))
      }
    }.toDF().orderBy(col("doc_id"))
  }

  val extractFeaturesOracle: String =
    """SELECT doc_id,
      |       CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'jpeg' WHEN 1 THEN 'png' ELSE 'gif' END AS fmt,
      |       CAST(length(text) AS BIGINT) AS n_bytes,
      |       CAST(list_sum(list_transform(range(1, length(text)+1),
      |              i -> unicode(substr(text, i, 1)))) AS BIGINT) AS checksum,
      |       CAST(least(64 + (doc_id % 8) * 32, 224) AS INT) AS width,
      |       CAST(least(64 + (doc_id % 5) * 32, 224) AS INT) AS height,
      |       CAST(floor(length(text) / 1024) + 1 AS INT) AS n_frames,
      |       md5(text) AS digest
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Frame sampling: 1 media row → n_frames rows (flatMap expansion),
    * then per-format roll-up. The expansion happens distributed, after
    * the narrow decode — no shuffle until the final small aggregation. */
  def frameSample(spark: SparkSession, documents: DataFrame): DataFrame = {
    import spark.implicits._
    val frames = mediaTable(documents).as[MediaRow].mapPartitions { rows =>
      val codec = new StubCodec
      rows.flatMap { m =>
        val digest = codec.md5Hex(m.payload)
        val nFrames = (m.payload.length / 1024 + 1).toInt
        (0 until nFrames).iterator.map(f =>
          FrameRow(m.doc_id, m.fmt, f, codec.h32(s"$digest:$f")))
      }
    }
    frames.toDF()
      .groupBy(col("fmt"))
      .agg(countDistinct(col("doc_id")).as("n_media"),
        count(lit(1)).as("total_frames"),
        sum(col("frame_hash")).as("hash_sum"))
      .orderBy(col("fmt"))
  }

  val frameSampleOracle: String =
    """WITH m AS (
      |  SELECT doc_id,
      |         CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'jpeg' WHEN 1 THEN 'png' ELSE 'gif' END AS fmt,
      |         md5(text) AS digest,
      |         CAST(floor(length(text) / 1024) + 1 AS INT) AS n_frames
      |  FROM documents),
      |frames AS (
      |  SELECT doc_id, fmt,
      |         CAST(concat('0x', substr(md5(concat(digest, ':', CAST(f AS VARCHAR))), 1, 8)) AS BIGINT) AS fh
      |  FROM (SELECT doc_id, fmt, digest, unnest(range(0, n_frames)) AS f FROM m))
      |SELECT fmt, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_media,
      |       CAST(count(*) AS BIGINT) AS total_frames,
      |       CAST(SUM(fh) AS BIGINT) AS hash_sum
      |FROM frames GROUP BY fmt ORDER BY fmt""".stripMargin
}
