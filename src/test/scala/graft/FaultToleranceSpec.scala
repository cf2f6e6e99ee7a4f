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
}
