package graft.operators

import graft.SparkSpec

/** Cross-engine JSON extraction semantics: the oracle side uses
  * TRY_CAST(json_extract_string(...)), which parses quoted numerics —
  * the engine must match even though the fixtures only emit unquoted
  * numbers (a latent divergence otherwise). */
class EventOpsSpec extends SparkSpec {
  import spark.implicits._

  test("jsonPropsStats parses quoted numerics, null-safe on junk " +
    "(TRY_CAST(json_extract_string) semantics)") {
    val events = Seq(
      ("a", """{"k": 12}"""),
      ("a", """{"k": "34"}"""), // quoted numeric: must parse to 34
      ("a", """{"k": "x"}"""), // non-numeric string: NULL
      ("b", """{"k": 3.5}"""), // non-integral: NULL in both engines
      ("b", "not json"), // malformed: NULL
      ("b", """{"k": 7}""")
    ).toDF("event_type", "props")
    val out = EventOps.jsonPropsStats(events).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    // a: parsed {12, 34}; b: parsed {7}
    assert(out == Seq(("a", 2L, 46L), ("b", 1L, 7L)), out.toString)
  }

  test("propsKeyStats defaults k to 0 on props without a numeric key — " +
    "no ANSI cast crash on the regexp_extract empty-string miss") {
    val events = Seq(
      ("a", """{"k": 12}"""),
      ("a", "{}"),        // no k: regexp_extract yields '' → k = 0
      ("a", "not json"),  // malformed: k = 0
      ("b", """{"k": 5}"""))
      .toDF("event_type", "props")
    val out = EventOps.propsKeyStats(events).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(out("a") == ((3L, 12L, 12L)), out.toString) // cnt, sum_k, max_k
    assert(out("b") == ((1L, 5L, 5L)))
  }

  test("retentionCohorts: hand-computed cohort matrix — first week defines " +
    "the cohort, repeat visits in one week count once, offset-0 is the " +
    "cohort size") {
    val W = 604800L
    // base at an exact week boundary plus a few hours of jitter
    val base = (1704067200L / W) * W
    def ev(id: Long, user: Long, weeks: Long*) = weeks.map(w =>
      (id * 100 + w, new java.sql.Timestamp((base + w * W + 3600 + user) * 1000L),
        user, "click", 1.0, "{}"))
    val events = (
      ev(1, 1L, 0, 1, 3) ++ ev(2, 2L, 0) ++ ev(3, 3L, 1, 2) ++
        ev(4, 1L, 1) // user 1 twice in week 1: counts once
      ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val w0 = base / W
    val out = EventOps.retentionCohorts(events).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(out == Seq(
      (w0, 0L, 2L, 2L, 1000L), (w0, 1L, 1L, 2L, 500L), (w0, 3L, 1L, 2L, 500L),
      (w0 + 1, 0L, 1L, 1L, 1000L), (w0 + 1, 1L, 1L, 1L, 1000L)), s"got $out")
    assertDeterministic(EventOps.retentionCohorts(events))
  }

  test("retentionCohorts plan: ONE user-keyed exchange serves the distinct, " +
    "the first-week aggregate and the join (ReusedExchange)") {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val events = (0L until 50L).map(i =>
        (i, new java.sql.Timestamp(1704067200000L + i * 86400000L), i % 7,
          "click", 1.0, "{}"))
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      val q = EventOps.retentionCohorts(events)
      val plan = q.queryExecution.executedPlan.toString
      val userEx = plan.linesIterator
        .filter(l => l.contains("Exchange hashpartitioning") && l.contains("user_id")
          && !l.contains("ReusedExchange"))
        .size
      assert(userEx == 1,
        s"expected ONE user-keyed exchange, got $userEx:\n" +
          plan.linesIterator.filter(_.contains("Exchange")).mkString("\n"))
      assert(plan.contains("ReusedExchange"),
        "join branch re-scans the events (no ReusedExchange):\n" + plan)
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }
}
