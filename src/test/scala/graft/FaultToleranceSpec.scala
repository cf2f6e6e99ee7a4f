package graft

import java.sql.Timestamp

import org.apache.spark.SparkException
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** SURVEY §2.A row A12: the reference DROPS shuffle data after 3 failed
  * sends and never reports task exceptions to the master (worker.py:
  * 124–129, 189–192) — silent loss by design. The engine must do the
  * opposite: a failing task fails the JOB (no partial results ever
  * surface), and streaming state survives a query restart from its
  * checkpoint (exactly-once across restarts, not just within a run). */
class FaultToleranceSpec extends SparkSpec {
  import spark.implicits._

  test("a failing task fails the job — no partial results (anti-A12)") {
    val rdd = spark.sparkContext.parallelize(1 to 100, 4).mapPartitions { it =>
      val bomb = it.map { x =>
        if (x == 60) throw new RuntimeException("injected task failure")
        x
      }
      bomb
    }
    val ex = intercept[SparkException](rdd.collect())
    assert(ex.getMessage.contains("injected task failure") ||
      Option(ex.getCause).exists(_.getMessage.contains("injected task failure")))
  }

  test("CC loop with a reliable checkpointDir survives losing every cached " +
    "block (recompute reads checkpoint files); default local mode dies") {
    // the VERDICT-flagged trade: localCheckpoint truncates lineage to
    // executor blocks that are the ONLY copy — the loop unpersists each
    // round's ancestor once the next round lands, so recomputing the
    // final labels after a block loss has nothing to rerun from. The
    // reliable hatch writes checkpoint FILES instead; this test
    // simulates the loss (unpersist every graft RDD, drop the final
    // labels' cached blocks) and proves recompute still answers.
    val sc = spark.sparkContext
    val part = new org.apache.spark.HashPartitioner(sc.defaultParallelism)
    // a 4096-path has diameter 4096: pointer doubling needs ~13 rounds,
    // so the every-5-rounds checkpoint fires (twice) mid-loop
    def pathEdges() = sc
      .parallelize((0L until 4096L).map(i => (i, i + 1)), 8)
      .flatMap { case (a, b) => Seq((a, b), (b, a)) }
      .partitionBy(part).cache()
    def simulateLoss(labels: org.apache.spark.rdd.RDD[(Long, Long)],
                     edges: org.apache.spark.rdd.RDD[(Long, Long)]): Unit = {
      // executor loss takes cached blocks AND shuffle map outputs; in
      // local mode unpersist alone would let the next action fetch
      // still-registered shuffle files and never walk lineage at all
      labels.unpersist(true)
      edges.unpersist(true)
      org.apache.spark.graft.FaultSim.dropAllShuffleOutputs(sc)
    }

    val ckpt = java.nio.file.Files.createTempDirectory("graft_cc_ckpt").toString
    val e1 = pathEdges()
    val reliable = operators.Dedup.ccLabelsRdd(e1, part, maxIters = 30,
      "spec-reliable", checkpointDir = Some(ckpt))
    assert(reliable.toDebugString.contains("ReliableCheckpointRDD"),
      "checkpointDir set but lineage shows no reliable checkpoint")
    simulateLoss(reliable, e1)
    // recompute path: rounds after the last checkpoint rerun from the
    // checkpoint FILES + the (recomputable) edge list — job completes
    assert(reliable.count() == 4097L)
    assert(reliable.filter(_._2 != 0L).isEmpty(),
      "recomputed labels must still collapse the path to label 0")

    // contrast: the default localCheckpoint loop cannot survive the same
    // loss — its truncated lineage bottoms out at deleted blocks
    val e2 = pathEdges()
    val local = operators.Dedup.ccLabelsRdd(e2, part, maxIters = 30,
      "spec-local")
    simulateLoss(local, e2)
    intercept[SparkException](local.count())
  }

  test("streaming dedup state survives a query RESTART from checkpoint " +
    "(replays after restart are still dropped)") {
    implicit val sqlCtx = spark.sqlContext
    def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    val outDir = java.nio.file.Files.createTempDirectory("graft_sink").toString
    val mem = MemoryStream[(Long, Timestamp, Long, String, Double, String)]
    def stream = streaming.EventStream.dedupedEvents(
      mem.toDF().toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
    // durable parquet sink: the memory sink can't recover a checkpoint
    def start() = stream.writeStream.format("parquet")
      .option("path", outDir).option("checkpointLocation", ckpt)
      .outputMode("append").start()

    val q1 = start()
    try {
      mem.addData(Seq((1L, ts(1), 10L, "click", 1.0, "{}"),
        (2L, ts(2), 10L, "click", 1.0, "{}")))
      q1.processAllAvailable()
    } finally q1.stop()

    // restart: same checkpoint, new query — dedup state must reload
    val q2 = start()
    try {
      mem.addData(Seq(
        (1L, ts(1), 10L, "click", 1.0, "{}"),   // replay from BEFORE restart
        (3L, ts(3), 11L, "view", 1.0, "{}")))   // genuinely new
      q2.processAllAvailable()
      val ids = spark.read.parquet(outDir).select("event_id")
        .collect().map(_.getLong(0)).sorted.toSeq
      assert(ids == Seq(1L, 2L, 3L),
        s"each id exactly once across the restart, got $ids")
    } finally q2.stop()
  }

  test("exactlyOnceParquetSink: a replayed batch id cannot duplicate " +
    "or overwrite committed rows, and a crashed (markerless) batch dir " +
    "is invisible to readers and rewritten cleanly on replay") {
    import org.apache.spark.sql.functions.col
    val out = java.nio.file.Files
      .createTempDirectory("graft-xonce-sink").toString
    val sink = operators.AdmissionIndex.exactlyOnceParquetSink(out)
    val b0 = Seq((1L, 2L, 0.9), (3L, 4L, 0.8))
      .toDF("batch_doc", "base_doc", "jaccard")
    sink(b0, 0L)
    def read() = operators.AdmissionIndex.readSunk(spark, out)
      .select("batch_id", "batch_doc", "base_doc")
      .as[(Long, Long, Long)].collect().toSet
    val first = read()
    assert(first == Set((0L, 1L, 2L), (0L, 3L, 4L)), first.toString)
    // foreachBatch is at-least-once: the same id replays. A committed
    // id must be skipped outright — even a (hypothetically) different
    // frame cannot displace the committed rows
    sink(b0.withColumn("batch_doc", col("batch_doc") + 100), 0L)
    assert(read() == first, "a replayed committed batch id must be a no-op")
    // crash window: a batch dir without its marker is a died-mid-write
    // attempt — readers must not see it, and the replay must rewrite it
    val crashed = java.nio.file.Paths.get(out, "batch=1")
    java.nio.file.Files.createDirectories(crashed)
    java.nio.file.Files.write(crashed.resolve("garbage.parquet"),
      Array[Byte](1, 2, 3))
    assert(read() == first, "a markerless batch dir must be invisible")
    val b1 = Seq((5L, 6L, 0.7)).toDF("batch_doc", "base_doc", "jaccard")
    sink(b1, 1L)
    assert(read() == first + ((1L, 5L, 6L)),
      "the replay over a crashed dir must land exactly once")
    // and replaying THAT id again still cannot duplicate
    sink(b1, 1L)
    assert(read() == first + ((1L, 5L, 6L)))
  }

  test("chunked probe fails LOUD with its chunk id when a verify round " +
    "dies — the A12 fail-loud contract on the probe's own driver pool " +
    "(r15 verdict item 5: the old Await(_, Inf) hung on a wedged round)") {
    import org.apache.spark.sql.functions.{col, concat_ws, lit}
    val AI = operators.AdmissionIndex
    val dir = java.nio.file.Files
      .createTempDirectory("graft-chunkfail").toString + "/idx"
    val docs = spark.range(16).select(col("id").as("doc_id"),
      concat_ws(" ", lit("alpha beta gamma delta epsilon"),
        col("id").cast("string")).as("text"))
    AI.buildIndex(docs.filter(col("doc_id") % 2 === 0), dir,
      threshold = 0.5, maxDfFrac = 1.0)
    // induce a verify-round failure: the hsets table vanishes AFTER the
    // shared band manifest is built, so each chunk's future dies inside
    // the pool (the wedged-round twin of the bounded-timeout path —
    // both surface through the same loud per-chunk await)
    def rm(p: java.io.File): Unit = {
      Option(p.listFiles()).foreach(_.foreach(rm)); p.delete(); ()
    }
    rm(new java.io.File(s"$dir/hsets"))
    val ex = intercept[IllegalStateException] {
      AI.pairsVsIndexChunked(docs.filter(col("doc_id") % 2 === 1), dir,
        threshold = 0.5, maxDocsPerBatch = 2L, probeParallelism = 1)
    }
    // awaits run in chunk order, so the FIRST chunk's id surfaces —
    // an operator can name the wedged/poisoned round from the message
    assert(ex.getMessage.contains("chunk 0/"),
      s"expected the failing chunk id in: ${ex.getMessage}")
  }
}
