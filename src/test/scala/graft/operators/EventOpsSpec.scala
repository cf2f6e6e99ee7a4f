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

  test("eventTransitions: hand-computed matrix — LAG ties on equal ts break " +
    "by event_id, single-event users contribute nothing, per-mille is exact") {
    def ts(s: Long) = new java.sql.Timestamp(1704067200000L + s * 1000L)
    val rows = Seq(
      // u1: view(10) then a TIE at t=20 — click has the lower event_id, so
      // the deterministic order is view(10) → click(20,#2) → view(20,#3)
      (1L, ts(10), 1L, "view"), (2L, ts(20), 1L, "click"),
      (3L, ts(20), 1L, "view"),
      // u2: click → click
      (4L, ts(5), 2L, "click"), (5L, ts(6), 2L, "click"),
      // u3: single event → no transition
      (6L, ts(1), 3L, "purchase"))
    val events = rows.map { case (id, t, u, ty) => (id, t, u, ty, 1.0, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = EventOps.eventTransitions(events).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSeq
    // matrix: click→click 1, click→view 1 (prev-total click = 2 → 500‰ each),
    // view→click 1 (prev-total view = 1 → 1000‰)
    assert(out == Seq(
      ("click", "click", 1L, 500L), ("click", "view", 1L, 500L),
      ("view", "click", 1L, 1000L)), s"got $out")
    assertDeterministic(EventOps.eventTransitions(events))
  }

  test("eventTransitions plan: the event stream crosses ONE user-keyed " +
    "exchange (the lag window); the rollup exchanges only the bounded matrix") {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val events = (0L until 60L).map(i =>
        (i, new java.sql.Timestamp(1704067200000L + i * 60000L), i % 5,
          if (i % 3 == 0) "view" else "click", 1.0, "{}"))
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      val plan = EventOps.eventTransitions(events)
        .queryExecution.executedPlan.toString
      val userEx = plan.linesIterator.count(l =>
        l.contains("Exchange hashpartitioning") && l.contains("user_id") &&
          !l.contains("ReusedExchange"))
      assert(userEx == 1,
        s"expected ONE user-keyed exchange, got $userEx:\n" +
          plan.linesIterator.filter(_.contains("Exchange")).mkString("\n"))
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("hourlyAnomaly: hand-computed flags — hot hour trips the z²-cleared " +
    "inequality, flat type stays 0, load_pm is the integer per-mille share") {
    def ev(id: Long, ty: String, hod: Int) =
      (id, new java.sql.Timestamp(1704067200000L + hod * 3600000L), 1L, ty,
        1.0, "{}")
    // type a: hod 0 has 20 events, hods 1..7 one each → H=8, T=27, S=407;
    // dev₀=20·8−27=133, 133²=17689 > 4·(407·8−27²)=10108 → +1; cold devs
    // −19, 361 < 10108 → 0. load_pm: 20·8·1000//27=5925, 1·8·1000//27=296.
    val aHot = (0 until 20).map(i => ev(100 + i, "a", 0))
    val aCold = (1 to 7).map(h => ev(200 + h, "a", h))
    // type b: two hours, one event each → dev=0 everywhere → 0, 1000‰
    val b = Seq(ev(300, "b", 0), ev(301, "b", 1))
    val events = (aHot ++ aCold ++ b)
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = EventOps.hourlyAnomaly(events).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getInt(4))).toSeq
    val expected =
      Seq(("a", 0, 20L, 5925L, 1)) ++
        (1 to 7).map(h => ("a", h, 1L, 296L, 0)) ++
        Seq(("b", 0, 1L, 1000L, 0), ("b", 1, 1L, 1000L, 0))
    assert(out == expected, s"got ${out.mkString("\n")}")
    assertDeterministic(EventOps.hourlyAnomaly(events))
  }

  test("hourlyAnomaly: moment arithmetic is exact past the int64 t·t wrap " +
    "(counts in the billions — DECIMAL(38,0) path, no silent wrap)") {
    // One hot bucket of 5e9 and 23 buckets of 4e9: T=9.7e10 so T²≈9.4e21
    // and S≈3.9e20 both exceed Long.MaxValue (9.2e18) — the pre-fix int64
    // arithmetic wraps here. Exact values: dev_hot=23e9, dev²=5.29e20 >
    // 4·(S·24−T²)=9.2e19 → +1; dev_cold=−1e9, 1e18 < 9.2e19 → 0.
    val hot = 5000000000L
    val cold = 4000000000L
    val counts = ((0, hot) +: (1 to 23).map(h => (h, cold)))
      .map { case (h, c) => ("x", h, c) }
      .toDF("event_type", "hod", "n_events")
    val out = EventOps.hourlyAnomalyFromCounts(counts).collect()
      .map(r => (r.getInt(1), r.getLong(2), r.getLong(3), r.getInt(4))).toSeq
    // BigInt reference, same formula
    val bigT = BigInt(hot) + BigInt(cold) * 23
    val bigS = BigInt(hot) * hot + BigInt(cold) * cold * 23
    val rhs = 4 * (bigS * 24 - bigT * bigT)
    def expect(c: Long) = {
      val dev = BigInt(c) * 24 - bigT
      val flag = if (dev * dev > rhs) (if (dev > 0) 1 else -1) else 0
      ((BigInt(c) * 24 * 1000 / bigT).toLong, flag)
    }
    assert(rhs > 0 && bigS > Long.MaxValue / 24,
      "fixture must exercise the wrap regime")
    val (hotPm, hotFlag) = expect(hot)
    val (coldPm, coldFlag) = expect(cold)
    assert(hotFlag == 1 && coldFlag == 0, "fixture must separate hot from cold")
    assert(out.head == ((0, hot, hotPm, hotFlag)), s"hot row: ${out.head}")
    assert(out.tail.forall(r => r._2 == cold && r._3 == coldPm &&
      r._4 == coldFlag), s"cold rows: ${out.tail.mkString("\n")}")
  }

  test("decayedEngagement: hand-computed half-life weights — exact integer " +
    "DIV-by-2^weeks decay, week boundary inclusive, deep ages flatten to 0") {
    val base = 1704067200000L // newest event anchors week 0
    def ev(id: Long, ty: String, weeksAgo: Double, value: Double) =
      (id, new java.sql.Timestamp(base - (weeksAgo * 604800000L).toLong), 1L,
        ty, value, "{}")
    val events = Seq(
      ev(1, "a", 0.0, 2.0),    // wk 0: 20000
      ev(2, "a", 0.9, 1.0),    // wk 0 (age < 1 week): 10000
      ev(3, "a", 1.0, 1.0),    // wk 1 exactly: 10000 DIV 2 = 5000
      ev(4, "a", 2.5, 0.7),    // wk 2: 7000 DIV 4 = 1750
      ev(5, "b", 70.0, 3.0),   // wk 70 >= 63: decays to 0
      ev(6, "b", 0.0, 0.0001)) // v4 = 1 (the newest b event, wk 0)
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = EventOps.decayedEngagement(events).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    // a: raw 47000, decayed 20000+10000+5000+1750 = 36750 → 781‰
    // b: raw 30001, decayed 0+1 = 1 → 0‰
    assert(out == Seq(("a", 4L, 47000L, 36750L, 781L),
      ("b", 2L, 30001L, 1L, 0L)), s"got $out")
    assertDeterministic(EventOps.decayedEngagement(events))
  }

  test("decayedEngagement plan: 1-row max-ts broadcast + ONE partial-agg " +
    "exchange — the event stream never shuffles raw") {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val events = (0L until 50L).map(i =>
        (i, new java.sql.Timestamp(1704067200000L + i * 3600000L), i % 5,
          if (i % 2 == 0) "x" else "y", 1.5, "{}"))
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      val q = EventOps.decayedEngagement(events)
      val plan = q.queryExecution.executedPlan.toString
      val hashEx = plan.linesIterator
        .filter(l => l.contains("Exchange hashpartitioning") &&
          !l.contains("ReusedExchange")).toSeq
      assert(hashEx.size == 1 && hashEx.head.contains("event_type"),
        s"expected ONE type-keyed exchange:\n${hashEx.mkString("\n")}")
      assert(plan.contains("BroadcastExchange") ||
        plan.contains("BroadcastNestedLoopJoin"),
        "max-ts side must broadcast, not shuffle:\n" + plan)
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
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

  test("eventTrigrams: strict per-user time order, hand-counted top ranks, " +
    "deterministic tie-break") {
    def ev(id: Long, user: Long, ty: String, minute: Int) =
      (id, new java.sql.Timestamp(1704067200000L + minute * 60000L), user,
        ty, 1.0, "{}")
    // user 1: v c p v c p → trigrams vcp, cpv, pvc, vcp → vcp ×2
    // user 2: v c p      → vcp ×1
    // user 3: c c        → no trigram (needs 3 events)
    val events = Seq(
      ev(1, 1, "v", 0), ev(2, 1, "c", 1), ev(3, 1, "p", 2),
      ev(4, 1, "v", 3), ev(5, 1, "c", 4), ev(6, 1, "p", 5),
      ev(7, 2, "v", 0), ev(8, 2, "c", 1), ev(9, 2, "p", 2),
      ev(10, 3, "c", 0), ev(11, 3, "c", 1)
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = EventOps.eventTrigrams(events).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getString(3),
        r.getLong(4))).toSeq
    // vcp ×3 (users 1+1+2... user1 contributes vcp at pos 0 AND pos 3)
    assert(out == Seq(
      (1, "v", "c", "p", 3L),
      (2, "c", "p", "v", 1L),
      (3, "p", "v", "c", 1L)), out.toString)
    assertDeterministic(EventOps.eventTrigrams(events))
  }

  test("userBehaviorProfile: timer bot scores entropy 0 / variance 0, " +
    "mixed bursty human is hand-checked, single-event user is all-zero") {
    def ts(s: Long) = new java.sql.Timestamp(1704067200000L + s * 1000L)
    // user 1: 4× one type at exact 10s intervals (the bot signature)
    // user 2: 2 types × 2, gaps 1s/5s/30s → entropy6 = ln6(4) − ln6(2)
    //   = 1386294 − 693147; var = (3·926e6 − 36000²) DIV 9 = 164666666
    // user 3: one event → no gaps, single type
    val events = (
      Seq((1L, ts(0)), (2L, ts(10)), (3L, ts(20)), (4L, ts(30)))
        .map { case (id, t) => (id, t, 1L, "click", 1.0, "{}") } ++
      Seq((5L, ts(100), "a"), (6L, ts(101), "b"), (7L, ts(106), "a"),
        (8L, ts(136), "b"))
        .map { case (id, t, ty) => (id, t, 2L, ty, 1.0, "{}") } ++
      Seq((9L, ts(500), 3L, "view", 1.0, "{}")))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = EventOps.userBehaviorProfile(events).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(out == Seq(
      (1L, 4L, 1L, 0L, 0L),
      (2L, 4L, 2L, 693147L, 164666666L),
      (3L, 1L, 1L, 0L, 0L)), out.toString)
    assertDeterministic(EventOps.userBehaviorProfile(events))
  }

  test("gapFillSummary: interior gap hours carry the LAST observed " +
    "hourly mass (LOCF), observed hours carry their own") {
    def ts(h: Long, m: Long) =
      new java.sql.Timestamp(1704067200000L + (h * 3600L + m * 60L) * 1000L)
    val events = Seq(
      // u1: hours 0 (two events, 1.5+0.5=2.0) and 3 (4.0) observed;
      // hours 1 and 2 are gaps → each carries hour 0's 20000 micro-mass
      (1L, ts(0, 5), 1L, "view", 1.5, "{}"),
      (2L, ts(0, 40), 1L, "view", 0.5, "{}"),
      (3L, ts(3, 10), 1L, "buy", 4.0, "{}"),
      // u2: a single hour — no gaps, nothing carried
      (4L, ts(7, 0), 2L, "view", 2.25, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = EventOps.gapFillSummary(events).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(out == Seq(
      (1L, 4L, 2L, 40000L, 60000L),
      (2L, 1L, 1L, 0L, 22500L)), out.toString)
    assertDeterministic(EventOps.gapFillSummary(events))
  }

  test("winsorizeBounds: rank-picked p1/p99 bounds clip exactly the " +
    "outlier mass (one 10000.0 spike over a 1..100 uniform)") {
    def ts(s: Long) = new java.sql.Timestamp(1704067200000L + s * 1000L)
    val rows = (1 to 100).map(i =>
      (i.toLong, ts(i), 1L, "buy", i.toDouble, "{}")) :+
      (101L, ts(101), 1L, "buy", 10000.0, "{}")
    val events = rows
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = EventOps.winsorizeBounds(events).collect()
    assert(out.length == 1)
    val r = out.head
    // n=101: lo = first v4 with cum >= ceil(101/100)=2 → value 2;
    // hi = first v4 with cum >= ceil(99·101/100)=100 → value 100.
    // Clip drops value 1 below and the 10000 spike above; excess =
    // (10⁸−10⁶) + (2·10⁴−10⁴) = 99 010 000 micro-units.
    assert(r.getAs[Long]("n_events") == 101L)
    assert(r.getAs[Long]("lo4") == 20000L, r.toString)
    assert(r.getAs[Long]("hi4") == 1000000L, r.toString)
    assert(r.getAs[Long]("clipped_lo") == 1L)
    assert(r.getAs[Long]("clipped_hi") == 1L)
    assert(r.getAs[Long]("excess4") == 99010000L, r.toString)
    assertDeterministic(EventOps.winsorizeBounds(events))
  }

  test("rollingActiveUsers: WAU looks back over the trailing window, " +
    "DAU only at the day itself") {
    def ts(d: Long) = new java.sql.Timestamp(1704067200000L + d * 86400000L)
    val events = Seq(
      (1L, ts(0), 1L, "view", 1.0, "{}"),
      (2L, ts(0), 2L, "view", 1.0, "{}"),
      (3L, ts(6), 2L, "view", 1.0, "{}"),
      (4L, ts(6), 3L, "view", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = EventOps.rollingActiveUsers(events).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    // day 0: dau {1,2}, wau {1,2} → 1000‰; day 6: dau {2,3}, wau
    // {1,2,3} (day 0 is still inside the trailing 7) → 666‰
    assert(out == Seq((2L, 2L, 1000L), (2L, 3L, 666L)), out.toString)
    assertDeterministic(EventOps.rollingActiveUsers(events))
  }

  test("nextEventBaseline: per-prev argmax with lexicographic tie-break " +
    "and exact frozen-prediction accuracy") {
    def ts(s: Long) = new java.sql.Timestamp(1704067200000L + s * 1000L)
    val events = Seq(
      // u1: a→b, b→a, a→b  (a: b wins 2/2; b: a wins 1/1)
      (1L, ts(1), 1L, "a", 1.0, "{}"), (2L, ts(2), 1L, "b", 1.0, "{}"),
      (3L, ts(3), 1L, "a", 1.0, "{}"), (4L, ts(4), 1L, "b", 1.0, "{}"),
      // u2: x→y, x→z via y→x: x: {y:1, z:1} tie → y (lexicographic)
      (5L, ts(1), 2L, "x", 1.0, "{}"), (6L, ts(2), 2L, "y", 1.0, "{}"),
      (7L, ts(3), 2L, "x", 1.0, "{}"), (8L, ts(4), 2L, "z", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = EventOps.nextEventBaseline(events).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(out == Seq(
      ("a", "b", 2L, 2L, 1000L),
      ("b", "a", 1L, 1L, 1000L),
      ("x", "y", 2L, 1L, 500L),
      ("y", "x", 1L, 1L, 1000L)), out.toString)
    assertDeterministic(EventOps.nextEventBaseline(events))
  }

  test("cooccurrenceLift: correlated pairs read above 1000 permille; " +
    "never-co-occurring pairs emit no row (n_ab = 0)") {
    def ts(s: Long) = new java.sql.Timestamp(1704067200000L + s * 1000L)
    val events = Seq(
      // u1, u2 do BOTH a and b; u3 only a; u4 only c
      (1L, ts(1), 1L, "a", 1.0, "{}"), (2L, ts(2), 1L, "b", 1.0, "{}"),
      (3L, ts(3), 2L, "a", 1.0, "{}"), (4L, ts(4), 2L, "b", 1.0, "{}"),
      (5L, ts(5), 3L, "a", 1.0, "{}"), (6L, ts(6), 4L, "c", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = EventOps.cooccurrenceLift(events).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    // lift(a,b) = 1000·2·4 / (3·2) = 1333 — above independence because
    // b-users ALWAYS carry a; (a,c)/(b,c) never co-occur → absent
    assert(out == Seq(("a", "b", 3L, 2L, 2L, 1333L)), out.toString)
    assertDeterministic(EventOps.cooccurrenceLift(events))
  }
}
