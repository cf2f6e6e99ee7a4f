package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Runtime proof the admission gate is a genuine stream-static join:
  * the incoming side arrives over a MemoryStream in micro-batches, the
  * base index is a static DataFrame, and the admitted set equals the
  * batch twin with zero streaming state. */
class DocStreamSpec extends SparkSpec {
  import spark.implicits._

  // (doc_id, text): 2/4/6 base; 1 duplicates base 2 (whitespace-
  // normalized), 3 duplicates base 6, 5 and 7 are novel — admitted
  private val base = Seq(
    (2L, "alpha beta gamma"), (4L, "delta epsilon"), (6L, "zeta eta"))
  private val incoming = Seq(
    (1L, "alpha  beta\tgamma"),     // normalizes to base 2's text: rejected
    (3L, "zeta eta"),               // identical to base 6: rejected
    (5L, "totally novel text"),     // admitted
    (7L, "another novel doc"))      // admitted

  private def docsDf(rows: Seq[(Long, String)]) =
    rows.toDF("doc_id", "text")
      .selectExpr("doc_id", "text", "'en' AS lang", "'s' AS source",
        "length(text) AS n_chars")

  test("streamAdmission: batch form admits exactly the novel docs with " +
    "whitespace-normalized matching") {
    val all = docsDf(base ++ incoming)
    val out = graft.streaming.DocStream.streamAdmission(all).collect()
      .map(_.getLong(0)).sorted.toSeq
    assert(out == Seq(5L, 7L), out.toString)
  }

  test("streamAdmission over a MemoryStream (2 micro-batches) against the " +
    "STATIC base equals the batch twin — stream-static anti join, zero state") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val streamDocs = mem.toDF().toDF("doc_id", "text")
      .selectExpr("doc_id", "text", "'en' AS lang", "'s' AS source",
        "length(text) AS n_chars")
    // incoming side STREAMS, base side is a genuinely static DataFrame —
    // the two-sided core plans Spark's stream-static anti join
    val q = graft.streaming.DocStream
      .streamAdmission(streamDocs, docsDf(base))
      .writeStream.format("memory").queryName("admission_test")
      .outputMode("append").start()
    try {
      mem.addData(incoming.take(2))
      q.processAllAvailable()
      mem.addData(incoming.drop(2))
      q.processAllAvailable()
      val streamed = spark.table("admission_test").collect()
        .map(_.getLong(0)).sorted.toSeq
      val batch = graft.streaming.DocStream
        .streamAdmission(docsDf(base ++ incoming)).collect()
        .map(_.getLong(0)).sorted.toSeq
      assert(streamed == batch, s"stream $streamed != batch $batch")
      assert(streamed == Seq(5L, 7L))
      // zero streaming state: a stateless stream-static anti join keeps
      // nothing in the state store across micro-batches
      assert(q.lastProgress == null ||
        Option(q.lastProgress.stateOperators).forall(ops =>
          ops.isEmpty || ops.forall(_.numRowsTotal == 0L)))
    } finally q.stop()
  }
}
