package graft.operators

import graft.SparkSpec
import java.sql.Timestamp

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def events(rows: (Long, Timestamp, Long, String)*) =
    rows.toSeq.toDF("event_id", "ts", "user_id", "event_type")
      .selectExpr("event_id", "ts", "user_id", "event_type",
        "1.0 AS value", "'{}' AS props")

  test("window is [pts-1h, pts): boundary clicks in, purchase-instant out") {
    val p = ts("2024-01-01 12:00:00")
    val d = events(
      (1L, p, 7L, "purchase"),
      (10L, ts("2024-01-01 11:30:00"), 7L, "click"), // inside
      (11L, ts("2024-01-01 11:00:00"), 7L, "click"), // exactly -1h: inclusive
      (12L, ts("2024-01-01 10:59:59"), 7L, "click"), // just outside
      (13L, p, 7L, "click"),                         // purchase instant: exclusive
      (14L, ts("2024-01-01 11:45:00"), 8L, "click"), // other user
      (2L, ts("2024-01-01 09:00:00"), 9L, "purchase")) // no clicks at all
    val out = Joins.rangeJoinClicks(d).collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("n_clicks")).toMap
    assert(out(1L) == 2L) // 11:30 and the 11:00 boundary
    assert(out(2L) == 0L) // purchases without clicks still appear (left join)
  }

  test("a click spanning two probe buckets is counted exactly once") {
    // purchase at :05 probes hour buckets h-1 and h; a click at :50 of
    // the previous hour lands in h-1 only — no double count possible,
    // but assert anyway with a click in the SAME bucket as the purchase
    val d = events(
      (1L, ts("2024-01-01 12:05:00"), 7L, "purchase"),
      (10L, ts("2024-01-01 12:01:00"), 7L, "click"),  // same bucket
      (11L, ts("2024-01-01 11:50:00"), 7L, "click"))  // previous bucket
    val out = Joins.rangeJoinClicks(d).collect()
    assert(out.head.getAs[Long]("n_clicks") == 2L)
  }

  test("range join is deterministic") {
    val rnd = new scala.util.Random(3)
    val d = events((0 until 200).map { i =>
      val t = ts(f"2024-01-01 ${8 + rnd.nextInt(8)}%02d:${rnd.nextInt(60)}%02d:00")
      (i.toLong, t, (i % 5).toLong, if (i % 3 == 0) "purchase" else "click")
    }: _*)
    assertDeterministic(Joins.rangeJoinClicks(d))
  }
}
