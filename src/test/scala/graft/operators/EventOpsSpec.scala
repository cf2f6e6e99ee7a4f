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

  test("funnelStages: strict ordering — a click BEFORE the first view does " +
    "not convert; equal timestamps do not convert (strict >)") {
    def ts(s: Long) = new java.sql.Timestamp(1704067200000L + s * 1000L)
    val rows = Seq(
      // u1: full ordered funnel view(10) < click(20) < purchase(30)
      (1L, ts(10), 1L, "view"), (2L, ts(20), 1L, "click"),
      (3L, ts(30), 1L, "purchase"),
      // u2: click at 5 BEFORE first view at 10 -> no click conversion;
      // later purchase irrelevant without a qualifying click
      (4L, ts(5), 2L, "click"), (5L, ts(10), 2L, "view"),
      (6L, ts(40), 2L, "purchase"),
      // u3: click EXACTLY at the view instant -> strict > rejects it
      (7L, ts(10), 3L, "view"), (8L, ts(10), 3L, "click"),
      // u4: view then click, purchase BETWEEN view and click -> rejected
      (9L, ts(10), 4L, "view"), (10L, ts(30), 4L, "click"),
      (11L, ts(20), 4L, "purchase"),
      // u5: no view at all
      (12L, ts(10), 5L, "purchase"))
    val events = rows.map { case (id, t, u, ty) => (id, t, u, ty, 1.0, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = EventOps.funnelStages(events).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
    // stage users: any=5, view={1,2,3,4}=4, click(after view)={1,4}=2,
    // purchase(after click)={1}=1
    assert(out == Seq(
      (1, "any_event", 5L, 1000L), (2, "view", 4L, 4000L / 5),
      (3, "click", 2L, 2000L / 4), (4, "purchase", 1L, 1000L / 2)),
      s"got $out")
    assertDeterministic(EventOps.funnelStages(events))
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
