package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import Relational.exactSumRounded

/** Event-table operators: tumbling-window aggregation (batch form of the
  * Structured Streaming demo in graft.streaming), defensive casts and
  * timestamp arithmetic (SURVEY.md §2.C rows C4/C6/C7).
  */
object EventOps {

  /** Tumbling 1-hour window counts + exact value sums per event type —
    * the batch twin of the streaming query (same plan shape Catalyst
    * produces for a watermarked streaming agg). */
  def hourlyEventStats(events: DataFrame): DataFrame =
    events
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"),
        exactSumRounded(col("value"), 2).as("total_value"))

  val hourlyEventStatsOracle: String =
    """SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour, event_type,
      |       CAST(COUNT(*) AS BIGINT) AS cnt,
      |       CAST(ROUND(SUM(CAST(value AS DECIMAL(30,6))), 2) AS DOUBLE) AS total_value
      |FROM events GROUP BY 1, 2""".stripMargin

  /** Pivot (wide aggregation): events per type per day-of-month — the
    * columnar form of a (day, type) groupBy. Pivot values are declared
    * explicitly so the plan is a single pass (no values-discovery job)
    * and the output schema is stable for the oracle. */
  def eventTypePivot(events: DataFrame): DataFrame =
    events
      .select(dayofmonth(col("ts")).as("day"), col("event_type"))
      .groupBy(col("day"))
      .pivot("event_type", Seq("click", "view", "purchase", "signup", "error"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .orderBy(col("day"))

  val eventTypePivotOracle: String =
    """SELECT CAST(date_part('day', ts) AS INT) AS day,
      |       CAST(COUNT(*) FILTER (event_type = 'click') AS BIGINT) AS click,
      |       CAST(COUNT(*) FILTER (event_type = 'view') AS BIGINT) AS view,
      |       CAST(COUNT(*) FILTER (event_type = 'purchase') AS BIGINT) AS purchase,
      |       CAST(COUNT(*) FILTER (event_type = 'signup') AS BIGINT) AS signup,
      |       CAST(COUNT(*) FILTER (event_type = 'error') AS BIGINT) AS error
      |FROM events GROUP BY 1 ORDER BY day""".stripMargin

  /** Exact interpolated percentiles (both engines implement the standard
    * (n−1)·p linear interpolation; inputs are small ints so the
    * interpolation arithmetic is identical IEEE ops). */
  def quantityPercentiles(lineitem: DataFrame): DataFrame =
    lineitem
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("cnt"),
        expr("percentile(l_quantity, 0.5)").as("median_qty"),
        expr("percentile(l_quantity, 0.9)").as("p90_qty"),
        expr("percentile(l_quantity, 0.99)").as("p99_qty"))
      .orderBy(col("l_returnflag"))

  val quantityPercentilesOracle: String =
    """SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS cnt,
      |       quantile_cont(l_quantity, 0.5) AS median_qty,
      |       quantile_cont(l_quantity, 0.9) AS p90_qty,
      |       quantile_cont(l_quantity, 0.99) AS p99_qty
      |FROM lineitem GROUP BY 1 ORDER BY l_returnflag""".stripMargin

  /** Defensive numeric extraction with default (SURVEY C4/C6, reference
    * accident_analysis.py:30–37): pull "k" out of the JSON-ish props via
    * regex, try-cast, default 0 — exactly the reference's
    * float(...)-except-default semantics, expressed null-safely. */
  def propsKeyStats(events: DataFrame): DataFrame = {
    // try_cast, NOT cast: regexp_extract yields '' when props has no
    // numeric "k", and under Spark 4's default ANSI mode cast('' AS
    // LONG) throws [CAST_INVALID_INPUT] — the oracle's TRY_CAST (and
    // the reference's float-except-default) return 0 instead
    val k = coalesce(
      expr("""try_cast(regexp_extract(props, '"k":\\s*(\\d+)', 1) AS LONG)"""),
      lit(0L))
    events
      .select(col("event_type"), k.as("k"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("k")).as("sum_k"),
        max(col("k")).as("max_k"))
  }

  val propsKeyStatsOracle: String =
    """SELECT event_type, CAST(COUNT(*) AS BIGINT) AS cnt,
      |       CAST(SUM(k) AS BIGINT) AS sum_k, CAST(MAX(k) AS BIGINT) AS max_k
      |FROM (SELECT event_type,
      |             COALESCE(TRY_CAST(regexp_extract(props, '"k":\s*(\d+)', 1) AS BIGINT), 0) AS k
      |      FROM events)
      |GROUP BY event_type""".stripMargin

  /** Typed JSON parsing (the schema-full counterpart of
    * [[propsKeyStats]]'s regex extraction): `from_json` with a declared
    * schema runs in codegen, yields NULL for malformed documents
    * (try/except-default semantics without regex fragility), and prunes
    * to the referenced field. The field is extracted as STRING and
    * try_cast to BIGINT — declaring `k BIGINT` directly would NULL out
    * quoted numerics ({"k":"12"}) that the oracle's
    * TRY_CAST(json_extract_string(...)) parses to 12. */
  def jsonPropsStats(events: DataFrame): DataFrame =
    events
      .select(col("event_type"),
        expr("try_cast(from_json(props, 'k STRING').k AS BIGINT)").as("k"))
      .groupBy(col("event_type"))
      .agg(count(col("k")).as("n_parsed"),
        sum(col("k")).as("sum_k"),
        countDistinct(col("k")).as("distinct_k"),
        min(col("k")).as("min_k"),
        max(col("k")).as("max_k"))
      .orderBy(col("event_type"))

  val jsonPropsStatsOracle: String =
    """SELECT event_type,
      |       CAST(COUNT(k) AS BIGINT) AS n_parsed,
      |       CAST(SUM(k) AS BIGINT) AS sum_k,
      |       CAST(COUNT(DISTINCT k) AS BIGINT) AS distinct_k,
      |       CAST(MIN(k) AS BIGINT) AS min_k,
      |       CAST(MAX(k) AS BIGINT) AS max_k
      |FROM (SELECT event_type,
      |             TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
      |      FROM events)
      |GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Timestamp diff + interval arithmetic (SURVEY C7, reference
    * accident_analysis.py:78–87): ship delay in days per order priority. */
  def shipDelayByPriority(lineitem: DataFrame, orders: DataFrame): DataFrame =
    lineitem
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .select(col("o_orderpriority"),
        datediff(col("l_shipdate"), col("o_orderdate")).as("delay_days"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("cnt"),
        (sum(col("delay_days")).cast("double") / count(lit(1)))
          .as("avg_delay_days"),
        min(col("delay_days")).as("min_delay"),
        max(col("delay_days")).as("max_delay"))

  val shipDelayByPriorityOracle: String =
    """SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS cnt,
      |       CAST(SUM(delay) AS DOUBLE) / COUNT(*) AS avg_delay_days,
      |       CAST(MIN(delay) AS INT) AS min_delay, CAST(MAX(delay) AS INT) AS max_delay
      |FROM (SELECT o_orderpriority,
      |             CAST(l_shipdate AS DATE) - CAST(o_orderdate AS DATE) AS delay
      |      FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
      |GROUP BY o_orderpriority""".stripMargin

  // --------------------------------------------------------------------
  // Cohort retention matrix: users bucketed by first-activity epoch-week
  // (cohort); cell (cohort_wk, wk_offset) = users from that cohort active
  // `offset` weeks later, with retention as exact per-mille of the cohort
  // size. The standard product-analytics view — and the canonical "join
  // back to a per-key minimum" shape.
  //
  // Scale shape: ONE user-keyed exchange serves the whole query — the
  // (user, week) distinct, the per-user first-week aggregate, AND the
  // join all cluster by user_id (HashPartitioning(user_id) satisfies the
  // (user, wk) clustering requirement, so neither aggregate re-shuffles;
  // the explicit repartition gives both join branches one canonical
  // exchange to reuse). The cohort rollup shuffles ≤ |weeks|² tiny rows;
  // the offset-0 backfill window runs on that bounded matrix, never the
  // event stream. Epoch-week floors integer seconds, so the fractional-
  // second difference between Spark's unix_timestamp truncation and
  // DuckDB's fractional epoch() cannot move a row across a week boundary
  // (week boundaries are integer-second multiples).
  // --------------------------------------------------------------------
  def retentionCohorts(events: DataFrame): DataFrame = {
    val parted = events
      .select(col("user_id"),
        expr("CAST(floor(unix_timestamp(ts) / 604800) AS BIGINT)").as("wk"))
      .repartition(col("user_id"))
    val uw = parted.distinct()
    val first = parted.groupBy(col("user_id")).agg(min(col("wk")).as("cohort_wk"))
    uw.join(first, "user_id")
      .groupBy(col("cohort_wk"), (col("wk") - col("cohort_wk")).as("wk_offset"))
      .agg(count(lit(1)).as("active_users"))
      .withColumn("cohort_users", expr(
        "MAX(CASE WHEN wk_offset = 0 THEN active_users END) OVER (PARTITION BY cohort_wk)"))
      .select(col("cohort_wk"), col("wk_offset"), col("active_users"),
        col("cohort_users"),
        expr("active_users * 1000L DIV cohort_users").as("retention_pm"))
      .orderBy(col("cohort_wk"), col("wk_offset"))
  }

  val retentionCohortsOracle: String =
    """WITH uw AS (
      |  SELECT DISTINCT user_id, CAST(floor(epoch(ts) / 604800) AS BIGINT) AS wk
      |  FROM events),
      |f AS (SELECT user_id, MIN(wk) AS cohort_wk FROM uw GROUP BY user_id),
      |m AS (
      |  SELECT f.cohort_wk, uw.wk - f.cohort_wk AS wk_offset,
      |         CAST(COUNT(*) AS BIGINT) AS active_users
      |  FROM uw JOIN f USING (user_id) GROUP BY 1, 2),
      |w AS (
      |  SELECT cohort_wk, wk_offset, active_users,
      |         MAX(CASE WHEN wk_offset = 0 THEN active_users END)
      |           OVER (PARTITION BY cohort_wk) AS cohort_users
      |  FROM m)
      |SELECT cohort_wk, wk_offset, active_users,
      |       CAST(cohort_users AS BIGINT) AS cohort_users,
      |       CAST(active_users * 1000 // cohort_users AS BIGINT) AS retention_pm
      |FROM w ORDER BY cohort_wk, wk_offset""".stripMargin

  // --------------------------------------------------------------------
  // Ordered conversion funnel: view → click → purchase with STRICT
  // temporal ordering per user (a click only counts after that user's
  // first view; a purchase only after that user's qualifying click).
  // The ordering constraint is what separates a funnel from three
  // independent counts — and what forces the staged per-user minima:
  // t1 = min(view ts), t2 = min(click ts > t1), t3 = min(purchase
  // ts > t2). Output: one row per stage with reaching-user counts and
  // exact per-mille conversion vs the previous stage.
  //
  // Scale shape: ONE user-keyed exchange feeds every stage — the three
  // filtered minima and both stage joins cluster by user_id, so stages
  // chain as local joins over the same partitioning (ReusedExchange;
  // no per-stage corpus re-shuffle). Stage tables only shrink
  // (t3 ⊆ t2 ⊆ t1 as user sets), and the final output is four
  // single-row aggregates stacked — constant bytes to the driver.
  // Timestamps are only COMPARED, never formatted, so there is no
  // cross-engine timestamp-rendering surface.
  // --------------------------------------------------------------------
  def funnelStages(events: DataFrame): DataFrame = {
    val parted = events.select(col("user_id"), col("event_type"), col("ts"))
      .repartition(col("user_id"))
    val t1 = parted.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
    val t2 = parted.filter(col("event_type") === "click")
      .join(t1, "user_id").filter(col("ts") > col("t1"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t2"))
    val t3 = parted.filter(col("event_type") === "purchase")
      .join(t2, "user_id").filter(col("ts") > col("t2"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t3"))
    val n0 = parted.select(col("user_id")).distinct().agg(count(lit(1)).as("n0"))
    val counts = n0
      .crossJoin(t1.agg(count(lit(1)).as("n1")))
      .crossJoin(t2.agg(count(lit(1)).as("n2")))
      .crossJoin(t3.agg(count(lit(1)).as("n3")))
    counts.select(explode(expr(
      """array(
        |  struct(1 AS stage, 'any_event' AS event, n0 AS users,
        |         1000L AS conv_pm),
        |  struct(2 AS stage, 'view' AS event, n1 AS users,
        |         CAST(CASE WHEN n0 = 0 THEN 0L ELSE n1 * 1000L DIV n0 END AS BIGINT) AS conv_pm),
        |  struct(3 AS stage, 'click' AS event, n2 AS users,
        |         CAST(CASE WHEN n1 = 0 THEN 0L ELSE n2 * 1000L DIV n1 END AS BIGINT) AS conv_pm),
        |  struct(4 AS stage, 'purchase' AS event, n3 AS users,
        |         CAST(CASE WHEN n2 = 0 THEN 0L ELSE n3 * 1000L DIV n2 END AS BIGINT) AS conv_pm))"""
        .stripMargin)).as("s"))
      .select(col("s.stage"), col("s.event"), col("s.users"), col("s.conv_pm"))
      .orderBy(col("stage"))
  }

  val funnelStagesOracle: String =
    """WITH t1 AS (
      |  SELECT user_id, MIN(ts) AS t1 FROM events
      |  WHERE event_type = 'view' GROUP BY user_id),
      |t2 AS (
      |  SELECT e.user_id, MIN(e.ts) AS t2
      |  FROM events e JOIN t1 USING (user_id)
      |  WHERE e.event_type = 'click' AND e.ts > t1.t1 GROUP BY e.user_id),
      |t3 AS (
      |  SELECT e.user_id, MIN(e.ts) AS t3
      |  FROM events e JOIN t2 USING (user_id)
      |  WHERE e.event_type = 'purchase' AND e.ts > t2.t2 GROUP BY e.user_id),
      |n AS (
      |  SELECT (SELECT COUNT(DISTINCT user_id) FROM events) AS n0,
      |         (SELECT COUNT(*) FROM t1) AS n1,
      |         (SELECT COUNT(*) FROM t2) AS n2,
      |         (SELECT COUNT(*) FROM t3) AS n3)
      |SELECT CAST(stage AS INT) AS stage, event, CAST(users AS BIGINT) AS users,
      |       CAST(conv_pm AS BIGINT) AS conv_pm
      |FROM (
      |  SELECT 1 AS stage, 'any_event' AS event, n0 AS users, 1000 AS conv_pm FROM n
      |  UNION ALL
      |  SELECT 2, 'view', n1, CASE WHEN n0 = 0 THEN 0 ELSE n1 * 1000 // n0 END FROM n
      |  UNION ALL
      |  SELECT 3, 'click', n2, CASE WHEN n1 = 0 THEN 0 ELSE n2 * 1000 // n1 END FROM n
      |  UNION ALL
      |  SELECT 4, 'purchase', n3, CASE WHEN n2 = 0 THEN 0 ELSE n3 * 1000 // n2 END FROM n)
      |ORDER BY stage""".stripMargin

  // --------------------------------------------------------------------
  // Per-user event-type transition matrix (first-order Markov estimate):
  // order each user's events by (ts, event_id) — event_id breaks
  // timestamp ties deterministically, so both engines see the same
  // successor for every event — lag the type, count (prev, next) pairs,
  // and attach an exact per-mille transition probability against the
  // prev-type row total.
  //
  // Scale shape: ONE user-keyed exchange carries the lag window (the
  // only per-event shuffle; the user key is well-distributed and each
  // partition sorts locally). The (prev, next) rollup is ≤ |types|²
  // rows, and the per-prev total is a window over that bounded matrix —
  // never the event stream. Integer per-mille (×1000 DIV) keeps the
  // probability exact cross-engine; numerators are non-negative so
  // DIV ≡ DuckDB //.
  // --------------------------------------------------------------------
  def eventTransitions(events: DataFrame): DataFrame = {
    val nexts = events
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .withColumn("prev_type", expr(
        "LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)"))
      .filter(col("prev_type").isNotNull)
    nexts
      .groupBy(col("prev_type"), col("event_type").as("next_type"))
      .agg(count(lit(1)).as("n_trans"))
      .withColumn("prev_total",
        expr("SUM(n_trans) OVER (PARTITION BY prev_type)"))
      .select(col("prev_type"), col("next_type"), col("n_trans"),
        expr("CAST(n_trans * 1000L DIV prev_total AS BIGINT)").as("trans_pm"))
      .orderBy(col("prev_type"), col("next_type"))
  }

  val eventTransitionsOracle: String =
    """WITH seq AS (
      |  SELECT user_id, event_type,
      |         LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |           AS prev_type
      |  FROM events),
      |m AS (
      |  SELECT prev_type, event_type AS next_type,
      |         CAST(COUNT(*) AS BIGINT) AS n_trans
      |  FROM seq WHERE prev_type IS NOT NULL GROUP BY 1, 2)
      |SELECT prev_type, next_type, n_trans,
      |       CAST(n_trans * 1000 // SUM(n_trans) OVER (PARTITION BY prev_type)
      |            AS BIGINT) AS trans_pm
      |FROM m ORDER BY prev_type, next_type""".stripMargin

  // --------------------------------------------------------------------
  // Frequent user-journey TRIGRAMS — the higher-order sequel to
  // [[eventTransitions]] (first-order pairs miss multi-step paths like
  // view→click→purchase): the global top-k most common 3-step
  // event-type sequences across users, strictly time-ordered within
  // each user. The funnel/UX analysis a product team actually reads.
  //
  // Scale shape: ONE user-keyed exchange serves both LEADs (same
  // window spec); the trigram rollup partial-aggregates map-side and
  // its result is BOUNDED by |types|³ rows — the global rank runs as a
  // guarded single-partition window over that bounded table (the q84
  // pattern, in-plan ceiling via Guards), never a corpus sort.
  // --------------------------------------------------------------------
  def eventTrigrams(events: DataFrame, k: Int = 10): DataFrame = {
    val seq3 = events
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .withColumn("e2", expr(
        "LEAD(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id)"))
      .withColumn("e3", expr(
        "LEAD(event_type, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id)"))
      .filter(col("e2").isNotNull && col("e3").isNotNull)
    seq3
      .groupBy(col("event_type").as("e1"), col("e2"), col("e3"))
      .agg(count(lit(1)).as("n"))
      .withColumn("rnk", expr(Guards.boundedWindowSql(1000000L,
        "eventTrigrams |types|^3 rollup",
        "row_number() OVER (ORDER BY n DESC, e1 ASC, e2 ASC, e3 ASC)",
        "INT")))
      .filter(col("rnk") <= k)
      .select(col("rnk"), col("e1"), col("e2"), col("e3"), col("n"))
      .orderBy(col("rnk"))
  }

  val eventTrigramsOracle: String =
    """WITH s AS (
      |  SELECT user_id, event_type AS e1,
      |         LEAD(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS e2,
      |         LEAD(event_type, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS e3
      |  FROM events),
      |g AS (
      |  SELECT e1, e2, e3, CAST(COUNT(*) AS BIGINT) AS n
      |  FROM s WHERE e2 IS NOT NULL AND e3 IS NOT NULL GROUP BY 1, 2, 3),
      |r AS (
      |  SELECT e1, e2, e3, n,
      |         row_number() OVER (ORDER BY n DESC, e1 ASC, e2 ASC, e3 ASC) AS rnk
      |  FROM g)
      |SELECT CAST(rnk AS INT) AS rnk, e1, e2, e3, n
      |FROM r WHERE rnk <= 10 ORDER BY rnk""".stripMargin

  // --------------------------------------------------------------------
  // Hour-of-day load anomaly detection per event type, with EXACT integer
  // arithmetic end-to-end. For a type with counts c_h over H observed
  // hour buckets (total T, sum of squares S), the two-sided z-test
  // |c − μ| > z·σ with μ = T/H and σ² = (S·H − T²)/H² clears its
  // denominators to the all-integer form
  //     (c·H − T)² > z²·(S·H − T²)          (z = 2 here, so z² = 4)
  // — no float mean, no sqrt, no rounding surface between engines. The
  // per-mille load share (c·H·1000 DIV T) is the integer-exact "how far
  // off the flat line" companion (1000 = exactly at the per-bucket mean).
  //
  // Scale shape: one scan collapsed map-side into a ≤ |types|·24-row
  // (type, hod) aggregate; the per-type moment rollup and the flag
  // evaluation both run on that bounded matrix (window over ≤24 rows per
  // type), so the event volume only ever crosses the one partial-agg
  // shuffle. The squared terms ((c·H−T)², T², S·H) exceed int64 once a
  // single (type, hour) bucket passes ~3·10⁹ events, where Spark would
  // wrap silently and DuckDB would error — so every term of the
  // inequality is computed in DECIMAL(38,0) (HUGEINT on the oracle
  // side): exact to c ≈ 4·10¹⁷ events per bucket (~10²⁰ per type),
  // far past the 100 TB regime, and still a fixed-width integer
  // comparison with no float/rounding surface between engines.
  // --------------------------------------------------------------------
  def hourlyAnomaly(events: DataFrame): DataFrame =
    hourlyAnomalyFromCounts(events
      .select(col("event_type"), hour(col("ts")).as("hod"))
      .groupBy(col("event_type"), col("hod"))
      .agg(count(lit(1)).as("n_events")))

  /** The flag arithmetic on a pre-built (event_type, hod, n_events)
    * matrix — split out so specs can drive it with counts past the
    * int64 t·t wrap point without generating billions of rows. */
  private[operators] def hourlyAnomalyFromCounts(byHod: DataFrame): DataFrame =
    byHod
      .withColumn("h", expr("COUNT(1) OVER (PARTITION BY event_type)"))
      .withColumn("t", expr("SUM(n_events) OVER (PARTITION BY event_type)"))
      .withColumn("s", expr(
        "SUM(CAST(n_events AS DECIMAL(38,0)) * n_events)" +
          " OVER (PARTITION BY event_type)"))
      .withColumn("dev", expr("CAST(n_events AS DECIMAL(38,0)) * h - t"))
      .select(col("event_type"), col("hod"), col("n_events"),
        expr("CAST(CAST(n_events AS DECIMAL(38,0)) * h * 1000 DIV t AS BIGINT)")
          .as("load_pm"),
        // past ~4·10¹⁷ events/bucket the DECIMAL(38,0) products overflow
        // to NULL under Spark's non-ANSI decimal arithmetic, so dev·dev >
        // … would evaluate false and anomaly would SILENTLY read 0 while
        // the HUGEINT oracle stays exact — the first CASE arm turns that
        // silent divergence into a loud in-plan error (the matrix is ≤
        // |types|·24 rows, so the extra comparison is free)
        expr("""CAST(CASE
          |  WHEN n_events > 400000000000000000L
          |  THEN CAST(raise_error(concat('hourlyAnomaly: bucket ',
          |    event_type, '@', hod, ' has ', n_events,
          |    ' events > 4e17 exactness bound — DECIMAL(38,0) squares',
          |    ' would overflow to NULL; pre-aggregate or rescale'))
          |    AS INT)
          |  WHEN dev * dev > 4 * (s * h - CAST(t AS DECIMAL(38,0)) * t)
          |  THEN CASE WHEN dev > 0 THEN 1 ELSE -1 END
          |  ELSE 0 END AS INT)""".stripMargin).as("anomaly"))
      .orderBy(col("event_type"), col("hod"))

  // --------------------------------------------------------------------
  // Freshness-decayed engagement: per event type, the value mass with
  // weights HALVING per week of age relative to the newest event — the
  // recency weighting a freshness-aware source mix or feature-store
  // aggregate applies. The half-life decay is computed EXACTLY in
  // integers: value quantized to 10⁻⁴ units, age in whole weeks from
  // microsecond arithmetic, decay = v4 DIV 2^weeks (a bigint shift —
  // no exp(), no float drift; ages ≥ 63 weeks decay to 0 explicitly
  // rather than overflowing the shift).
  //
  // Scale shape: the corpus max-ts is a 1-row aggregate cross-joined
  // (broadcast) onto the stream; decay is row-local; the only shuffle
  // is the partial-agg collapse to |types| rows. Sums and the final
  // per-mille run in DECIMAL(38,0): Σv4 stays inside int64 to ~1.8·10¹²
  // max-value events per type, but the ×1000 per-mille would wrap far
  // earlier — the decimal widening makes the whole surface exact.
  // --------------------------------------------------------------------
  def decayedEngagement(events: DataFrame): DataFrame = {
    val mx = events.agg(max(unix_micros(col("ts"))).as("mx"))
    events
      .select(col("event_type"),
        expr("CAST(floor(value * 10000 + 0.5) AS BIGINT)").as("v4"),
        unix_micros(col("ts")).as("us"))
      .crossJoin(broadcast(mx))
      .withColumn("wk", expr("(mx - us) DIV 604800000000"))
      .withColumn("dec", expr(
        "CASE WHEN wk >= 63 THEN 0L" +
          " ELSE v4 DIV shiftleft(1L, CAST(wk AS INT)) END"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(expr("CAST(v4 AS DECIMAL(38,0))")).as("r4"),
        sum(expr("CAST(dec AS DECIMAL(38,0))")).as("d4"))
      .select(col("event_type"), col("n_events"),
        expr("CAST(r4 AS BIGINT)").as("raw_v4"),
        expr("CAST(d4 AS BIGINT)").as("decayed_v4"),
        expr("CAST(d4 * 1000 DIV r4 AS BIGINT)").as("freshness_pm"))
      .orderBy(col("event_type"))
  }

  val decayedEngagementOracle: String =
    """WITH m AS (SELECT MAX(epoch_us(ts)) AS mx FROM events),
      |d AS (
      |  SELECT event_type,
      |         CAST(floor(value * 10000 + 0.5) AS BIGINT) AS v4,
      |         (mx - epoch_us(ts)) // 604800000000 AS wk
      |  FROM events, m)
      |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
      |       CAST(SUM(v4) AS BIGINT) AS raw_v4,
      |       CAST(SUM(CASE WHEN wk >= 63 THEN 0
      |                     ELSE v4 // (CAST(1 AS BIGINT) << wk) END) AS BIGINT)
      |         AS decayed_v4,
      |       CAST(SUM(CAST(CASE WHEN wk >= 63 THEN 0
      |                          ELSE v4 // (CAST(1 AS BIGINT) << wk) END AS HUGEINT))
      |              * 1000 // SUM(v4) AS BIGINT) AS freshness_pm
      |FROM d GROUP BY event_type ORDER BY event_type""".stripMargin

  val hourlyAnomalyOracle: String =
    """WITH c AS (
      |  SELECT event_type, CAST(date_part('hour', ts) AS INT) AS hod,
      |         CAST(COUNT(*) AS BIGINT) AS n_events
      |  FROM events GROUP BY 1, 2),
      |m AS (
      |  SELECT event_type, hod, n_events,
      |         COUNT(*) OVER (PARTITION BY event_type) AS h,
      |         SUM(n_events) OVER (PARTITION BY event_type) AS t,
      |         SUM(CAST(n_events AS HUGEINT) * n_events)
      |           OVER (PARTITION BY event_type) AS s
      |  FROM c),
      |d AS (
      |  SELECT *, CAST(n_events AS HUGEINT) * h - t AS dev FROM m)
      |SELECT event_type, hod, n_events,
      |       CAST(CAST(n_events AS HUGEINT) * h * 1000 // t AS BIGINT)
      |         AS load_pm,
      |       CAST(CASE
      |         WHEN dev * dev > 4 * (s * h - CAST(t AS HUGEINT) * t)
      |         THEN CASE WHEN dev > 0 THEN 1 ELSE -1 END
      |         ELSE 0 END AS INT) AS anomaly
      |FROM d ORDER BY event_type, hod""".stripMargin

  // --------------------------------------------------------------------
  // Per-user BEHAVIOR PROFILE — the bot/spam features a user-generated
  // corpus is filtered on before training: event-type entropy (bots do
  // one thing; humans mix) and inter-event gap variance (bots fire on a
  // timer; humans are bursty). Both EXACT integers:
  //   entropy6 = ln6(n) − (Σ cᵢ·ln6(cᵢ)) DIV n   [micro-nats; the q31
  //     ln-quantization — ln6(x) = floor(ln(x)·10⁶ + 0.5) — so both
  //     engines integer-compare identical values; cᵢ = 1 ⇒ ln6 = 0,
  //     single-type users land exactly at 0]
  //   gap_var_ms2 = (g·Σd² − (Σd)²) DIV g²        [ms² population
  //     variance of LAG gaps; numerator ≥ 0 (Cauchy–Schwarz) so
  //     truncating DIV ≡ flooring //; DECIMAL(38,0) ↔ HUGEINT holds to
  //     ~10⁹ gaps/user at month-scale ms gaps]
  //
  // Scale shape: the (user, type) counts partial-aggregate map-side;
  // the gap LAG rides ONE user-keyed exchange whose HashPartitioning
  // satisfies the per-user variance aggregate AND the profile join —
  // three per-user stages, one raw-row shuffle (the q90/q92 pattern).
  // Output is |users| rows — the feature table itself.
  // --------------------------------------------------------------------
  def userBehaviorProfile(events: DataFrame): DataFrame = {
    val ent = events
      .groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("user_id"))
      .agg(sum(col("c")).as("n_events"), count(lit(1)).as("n_types"),
        sum(expr(
          "CAST(c * CAST(floor(ln(c) * 1000000 + 0.5) AS BIGINT)" +
            " AS DECIMAL(38,0))")).as("s"))
      .select(col("user_id"), col("n_events"), col("n_types"),
        expr("""CAST(CAST(floor(ln(n_events) * 1000000 + 0.5) AS BIGINT)
               | - s DIV n_events AS BIGINT)""".stripMargin).as("entropy6"))
    val gv = events
      .select(col("user_id"), expr(
        """(unix_micros(ts) - lag(unix_micros(ts))
          |   OVER (PARTITION BY user_id ORDER BY ts, event_id)) div 1000"""
          .stripMargin).as("gap_ms"))
      .groupBy(col("user_id"))
      .agg(count(col("gap_ms")).as("n_g"),
        sum(expr("CAST(gap_ms AS DECIMAL(38,0))")).as("sg"),
        sum(expr("CAST(gap_ms AS DECIMAL(38,0)) * gap_ms")).as("sg2"))
    ent.join(gv, Seq("user_id"), "left")
      .select(col("user_id"), col("n_events"), col("n_types"),
        col("entropy6"),
        expr("""CASE WHEN n_g IS NULL OR n_g = 0 THEN 0L
               |  ELSE CAST((n_g * sg2 - sg * sg)
               |    DIV (CAST(n_g AS DECIMAL(38,0)) * n_g) AS BIGINT)
               |END""".stripMargin).as("gap_var_ms2"))
      .orderBy(col("user_id"))
  }

  val userBehaviorProfileOracle: String =
    """WITH tc AS (
      |  SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS c
      |  FROM events GROUP BY 1, 2),
      |ent AS (
      |  SELECT user_id, CAST(SUM(c) AS BIGINT) AS n_events,
      |         CAST(count(*) AS BIGINT) AS n_types,
      |         CAST(SUM(c * CAST(floor(ln(c) * 1000000 + 0.5) AS BIGINT))
      |              AS HUGEINT) AS s
      |  FROM tc GROUP BY 1),
      |e2 AS (
      |  SELECT user_id, n_events, n_types,
      |         CAST(CAST(floor(ln(n_events) * 1000000 + 0.5) AS BIGINT)
      |              - s // n_events AS BIGINT) AS entropy6
      |  FROM ent),
      |g AS (
      |  SELECT user_id,
      |         (epoch_us(ts) - lag(epoch_us(ts))
      |            OVER (PARTITION BY user_id ORDER BY ts, event_id)) // 1000
      |           AS gap_ms
      |  FROM events),
      |gv AS (
      |  SELECT user_id, CAST(count(gap_ms) AS BIGINT) AS n_g,
      |         CAST(SUM(gap_ms) AS HUGEINT) AS sg,
      |         CAST(SUM(CAST(gap_ms AS HUGEINT) * gap_ms) AS HUGEINT) AS sg2
      |  FROM g GROUP BY 1)
      |SELECT e2.user_id, n_events, n_types, entropy6,
      |       CASE WHEN n_g IS NULL OR n_g = 0 THEN 0
      |            ELSE CAST((n_g * sg2 - sg * sg)
      |                      // (CAST(n_g AS HUGEINT) * n_g) AS BIGINT)
      |       END AS gap_var_ms2
      |FROM e2 LEFT JOIN gv ON e2.user_id = gv.user_id
      |ORDER BY e2.user_id""".stripMargin

  // --------------------------------------------------------------------
  // Hourly gap-fill + forward-fill per user — the time-series
  // regularization every feature-store / sessionized-training export
  // needs: observed hours carry their value mass, missing hours inside
  // a user's active span carry the LAST observed hourly mass (LOCF).
  // The dense grid comes from sequence()-explode over each user's
  // [first, last] observed hour; the fill is last(v4, ignoreNulls)
  // over the user-ordered window — the first grid hour is observed by
  // construction (the span STARTS at an observed hour), so the fill is
  // total. Values ride as 10⁻⁴ integer units (the q95 quantization).
  //
  // Scale shape: the corpus collapses to (user, hour) partial-agg rows
  // FIRST — the grid, join and window all run on the hourly table
  // (users · span-hours rows, bounded by the retention window — 720
  // rows/user·month), never raw events; the user-keyed window
  // partitioning matches the grid join's exchange. Output is |users|
  // summary rows: the fill is verified by its carried-mass integral
  // rather than materializing the dense series out of the engine.
  // --------------------------------------------------------------------
  def gapFillSummary(events: DataFrame): DataFrame = {
    val hourly = events
      .groupBy(col("user_id"), date_trunc("hour", col("ts")).as("h"))
      .agg(sum(expr("CAST(floor(value * 10000 + 0.5) AS BIGINT)")).as("v4"))
    val grid = hourly.groupBy(col("user_id"))
      .agg(min(col("h")).as("h0"), max(col("h")).as("h1"))
      .select(col("user_id"),
        explode(expr("sequence(h0, h1, interval 1 hour)")).as("h"))
    grid.join(hourly, Seq("user_id", "h"), "left")
      .select(col("user_id"), col("v4"),
        expr("last(v4, true) OVER (PARTITION BY user_id ORDER BY h)").as("fv4"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("hours_total"),
        count(col("v4")).as("hours_observed"),
        sum(when(col("v4").isNull, col("fv4")).otherwise(lit(0L))).as("carried_v4"),
        sum(coalesce(col("v4"), lit(0L))).as("observed_v4"))
      .orderBy(col("user_id"))
  }

  val gapFillSummaryOracle: String =
    """WITH hourly AS (
      |  SELECT user_id, date_trunc('hour', ts) AS h,
      |         CAST(SUM(CAST(floor(value * 10000 + 0.5) AS BIGINT)) AS BIGINT) AS v4
      |  FROM events GROUP BY 1, 2),
      |grid AS (
      |  SELECT user_id, t.g AS h
      |  FROM (SELECT user_id, min(h) AS h0, max(h) AS h1 FROM hourly GROUP BY 1),
      |       unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS t(g)),
      |f AS (
      |  SELECT g.user_id, hr.v4,
      |         last_value(hr.v4 IGNORE NULLS)
      |           OVER (PARTITION BY g.user_id ORDER BY g.h) AS fv4
      |  FROM grid g LEFT JOIN hourly hr
      |    ON hr.user_id = g.user_id AND hr.h = g.h)
      |SELECT user_id, CAST(count(*) AS BIGINT) AS hours_total,
      |       CAST(count(v4) AS BIGINT) AS hours_observed,
      |       CAST(COALESCE(SUM(CASE WHEN v4 IS NULL THEN fv4 END), 0) AS BIGINT)
      |         AS carried_v4,
      |       CAST(SUM(COALESCE(v4, 0)) AS BIGINT) AS observed_v4
      |FROM f GROUP BY user_id ORDER BY user_id""".stripMargin

  // --------------------------------------------------------------------
  // Winsorization bounds + clip audit per event type — the outlier
  // treatment a metrics/feature pipeline applies before value sums mean
  // anything (one fat-fingered 10⁹ "purchase" poisons every average
  // downstream): exact p1/p99 value bounds by RANK PICK over the
  // 10⁻⁴-unit value histogram (the q97 integer machinery — no
  // interpolation, no floats), then how much the clip would touch:
  // rows below/above the bounds and the exact excess mass removed.
  // ceil(p·n/100) = (p·n + 99) DIV 100 on nonnegative integers, so
  // truncating DIV ≡ flooring // and both engines pick the same value.
  //
  // Scale shape: the corpus collapses to the (type, v4) histogram
  // FIRST (one partial-agg exchange); the cumsum window is PARTITIONED
  // by type under an executable per-partition row ceiling (the q108
  // pattern — a value domain that stops being 10⁻⁴-quantized raises
  // loudly instead of silently sorting an unbounded stream); the clip
  // audit joins the ≤|types|-row bounds table back broadcast. Output
  // is |types| rows.
  // --------------------------------------------------------------------
  def winsorizeBounds(events: DataFrame): DataFrame = {
    val hist = events
      .groupBy(col("event_type"),
        expr("CAST(floor(value * 10000 + 0.5) AS BIGINT)").as("v4"))
      .agg(count(lit(1)).as("cnt"))
    val cum = hist.select(col("event_type"), col("v4"), col("cnt"),
      expr("""SUM(cnt) OVER (PARTITION BY event_type ORDER BY v4
          | ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"""
        .stripMargin).as("cum"),
      expr("""CASE WHEN COUNT(1) OVER (PARTITION BY event_type) > 1000001
          |  THEN CAST(raise_error(concat('winsorizeBounds v4 histogram for ',
          |    event_type, ' has ', COUNT(1) OVER (PARTITION BY event_type),
          |    ' rows > documented per-type bound 1000001;',
          |    ' an upstream boundedness invariant broke')) AS BIGINT)
          |  ELSE SUM(cnt) OVER (PARTITION BY event_type) END""".stripMargin)
        .as("tot"))
    val bounds = cum.groupBy(col("event_type"))
      .agg(max(col("tot")).as("n_events"),
        min(when(col("cum") >= expr("(tot + 99) DIV 100"), col("v4")))
          .as("lo4"),
        min(when(col("cum") >= expr("(99L * tot + 99) DIV 100"), col("v4")))
          .as("hi4"))
    hist.join(broadcast(bounds), "event_type")
      .groupBy(col("event_type"))
      .agg(max(col("n_events")).as("n_events"),
        max(col("lo4")).as("lo4"), max(col("hi4")).as("hi4"),
        sum(when(col("v4") < col("lo4"), col("cnt")).otherwise(lit(0L)))
          .as("clipped_lo"),
        sum(when(col("v4") > col("hi4"), col("cnt")).otherwise(lit(0L)))
          .as("clipped_hi"),
        sum(expr("""CASE WHEN v4 > hi4 THEN CAST(cnt AS DECIMAL(38,0)) * (v4 - hi4)
            |  WHEN v4 < lo4 THEN CAST(cnt AS DECIMAL(38,0)) * (lo4 - v4)
            |  ELSE CAST(0 AS DECIMAL(38,0)) END""".stripMargin))
          .cast("long").as("excess4"))
      .orderBy(col("event_type"))
  }

  val winsorizeBoundsOracle: String =
    """WITH hist AS (
      |  SELECT event_type, CAST(floor(value * 10000 + 0.5) AS BIGINT) AS v4,
      |         CAST(count(*) AS BIGINT) AS cnt
      |  FROM events GROUP BY 1, 2),
      |c AS (
      |  SELECT event_type, v4, cnt,
      |         SUM(cnt) OVER (PARTITION BY event_type ORDER BY v4
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
      |         SUM(cnt) OVER (PARTITION BY event_type) AS tot
      |  FROM hist),
      |b AS (
      |  SELECT event_type, CAST(MAX(tot) AS BIGINT) AS n_events,
      |         MIN(CASE WHEN cum >= (tot + 99) // 100 THEN v4 END) AS lo4,
      |         MIN(CASE WHEN cum >= (99 * tot + 99) // 100 THEN v4 END) AS hi4
      |  FROM c GROUP BY 1)
      |SELECT h.event_type, MAX(b.n_events) AS n_events,
      |       MAX(b.lo4) AS lo4, MAX(b.hi4) AS hi4,
      |       CAST(SUM(CASE WHEN h.v4 < b.lo4 THEN h.cnt ELSE 0 END) AS BIGINT)
      |         AS clipped_lo,
      |       CAST(SUM(CASE WHEN h.v4 > b.hi4 THEN h.cnt ELSE 0 END) AS BIGINT)
      |         AS clipped_hi,
      |       CAST(SUM(CASE WHEN h.v4 > b.hi4 THEN CAST(h.cnt AS HUGEINT) * (h.v4 - b.hi4)
      |                     WHEN h.v4 < b.lo4 THEN CAST(h.cnt AS HUGEINT) * (b.lo4 - h.v4)
      |                     ELSE 0 END) AS BIGINT) AS excess4
      |FROM hist h JOIN b ON b.event_type = h.event_type
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // --------------------------------------------------------------------
  // Rolling 7-day active users per day (WAU) + same-day actives (DAU)
  // + the DAU/WAU stickiness ratio — the engagement trend surface every
  // analytics deployment keeps warm. The trailing-range join is
  // EQUI-IZED (the q55 banding trick): each distinct (user, day)
  // activity row fans out to the ≤7 report days it can serve, so the
  // join is a plain equi join on the report day — no theta-join, no
  // per-day rescan of the corpus.
  //
  // Scale shape: raw events collapse to DISTINCT (user, day) FIRST
  // (one exchange, ≤|users|·|days| rows); the 7× fan-out and both
  // distinct-count aggregates run on that collapsed table; report days
  // are semi-joined against observed days so the output is bounded by
  // the data's day span. All-integer stickiness (nonneg ⇒ DIV ≡ //).
  // --------------------------------------------------------------------
  def rollingActiveUsers(events: DataFrame, windowDays: Int = 7): DataFrame = {
    val du = events
      .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
    val days = du.select(col("day")).distinct()
    val fan = du.select(col("user_id"),
      explode(expr(s"transform(sequence(0, ${windowDays - 1})," +
        " i -> date_add(day, CAST(i AS INT)))")).as("day"))
    val wau = fan.join(days, Seq("day"))
      .groupBy(col("day"))
      .agg(countDistinct(col("user_id")).as("wau"))
    du.groupBy(col("day")).agg(countDistinct(col("user_id")).as("dau"))
      .join(wau, Seq("day"))
      // TIMESTAMP output: a DATE column round-trips as python date on
      // the Spark side but pandas Timestamp on the DuckDB side — the
      // driver's value compare needs one carrier type (q37 precedent)
      .select(col("day").cast("timestamp").as("day"),
        col("dau"), col("wau"),
        expr("1000L * dau DIV wau").as("stickiness_pm"))
      .orderBy(col("day"))
  }

  val rollingActiveUsersOracle: String = rollingActiveUsersOracleAt(7)

  def rollingActiveUsersOracleAt(windowDays: Int): String =
    s"""WITH du AS (
      |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
      |days AS (SELECT DISTINCT day FROM du),
      |fan AS (
      |  SELECT user_id, day + CAST(t.i AS INT) AS day
      |  FROM du, unnest(range(0, $windowDays)) AS t(i)),
      |w AS (
      |  SELECT f.day, CAST(count(DISTINCT f.user_id) AS BIGINT) AS wau
      |  FROM fan f JOIN days d ON d.day = f.day GROUP BY 1),
      |a AS (
      |  SELECT day, CAST(count(DISTINCT user_id) AS BIGINT) AS dau
      |  FROM du GROUP BY 1)
      |SELECT CAST(a.day AS TIMESTAMP) AS day, a.dau, w.wau,
      |       CAST(1000 * a.dau // w.wau AS BIGINT) AS stickiness_pm
      |FROM a JOIN w ON w.day = a.day ORDER BY a.day""".stripMargin

  // --------------------------------------------------------------------
  // Majority-class next-event baseline — the sanity bar a sequence
  // model must beat before it earns its training cost: per previous
  // event type, the argmax next type from the global first-order
  // transition counts (q92's matrix; ties → lexicographically first
  // next type, so both engines pick identically) and the exact
  // accuracy that frozen prediction achieves on the corpus itself.
  //
  // Scale shape: the LEAD rides the tier's ONE user-keyed exchange;
  // the transition rollup partial-aggregates map-side and is bounded
  // by |types|²; the argmax windows run on that bounded table,
  // partitioned by prev type under an executable row ceiling (the
  // q108 pattern — an exploding type cardinality raises loudly).
  // --------------------------------------------------------------------
  def nextEventBaseline(events: DataFrame): DataFrame = {
    val seq = events.select(col("user_id"), col("event_type"),
        expr("LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)")
          .as("next_type"))
      .filter(col("next_type").isNotNull)
    seq.groupBy(col("event_type").as("prev_type"), col("next_type"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("prev_type"), col("next_type"), col("cnt"),
        expr("row_number() OVER (PARTITION BY prev_type" +
          " ORDER BY cnt DESC, next_type ASC)").as("rk"),
        expr("""CASE WHEN COUNT(1) OVER (PARTITION BY prev_type) > 100001
            |  THEN CAST(raise_error(concat('nextEventBaseline transition row for ',
            |    prev_type, ' has ', COUNT(1) OVER (PARTITION BY prev_type),
            |    ' next types > documented bound 100001;',
            |    ' the event-type domain stopped being bounded')) AS BIGINT)
            |  ELSE SUM(cnt) OVER (PARTITION BY prev_type) END""".stripMargin)
          .as("tot"))
      .filter(col("rk") === 1)
      .select(col("prev_type"), col("next_type").as("predicted"),
        col("tot").as("n_transitions"), col("cnt").as("hits"),
        expr("1000L * cnt DIV tot").as("accuracy_pm"))
      .orderBy(col("prev_type"))
  }

  val nextEventBaselineOracle: String =
    """WITH seq AS (
      |  SELECT event_type AS prev_type,
      |         LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |           AS next_type
      |  FROM events),
      |m AS (
      |  SELECT prev_type, next_type, CAST(count(*) AS BIGINT) AS cnt
      |  FROM seq WHERE next_type IS NOT NULL GROUP BY 1, 2),
      |r AS (
      |  SELECT prev_type, next_type, cnt,
      |         row_number() OVER (PARTITION BY prev_type
      |           ORDER BY cnt DESC, next_type ASC) AS rk,
      |         SUM(cnt) OVER (PARTITION BY prev_type) AS tot
      |  FROM m)
      |SELECT prev_type, next_type AS predicted,
      |       CAST(tot AS BIGINT) AS n_transitions, cnt AS hits,
      |       CAST(1000 * cnt // tot AS BIGINT) AS accuracy_pm
      |FROM r WHERE rk = 1 ORDER BY prev_type""".stripMargin

  // --------------------------------------------------------------------
  // Event co-occurrence lift — user-level association mining (the
  // market-basket tier): for every unordered pair of event types, how
  // much more often one user does BOTH than independence predicts,
  // lift = P(a∧b) / (P(a)·P(b)) in exact integer per-mille
  // (1000·n_ab·N DIV (n_a·n_b); all operands nonnegative so Spark's
  // truncating DIV ≡ DuckDB's flooring //). Lift ≫ 1000 = correlated
  // behaviors (view→click funnels), ≪ 1000 = substitutes / disjoint
  // user populations — q92's transitions measure ORDER, this measures
  // portfolio overlap regardless of order or gap.
  //
  // Scale shape: raw events collapse to DISTINCT (user, type) FIRST;
  // the pair self-join runs user-keyed on that collapsed table (≤
  // |types| rows per user per side, the q118 shape) and its rollup is
  // bounded by |types|²; the ≤|types|-row marginals broadcast back.
  // --------------------------------------------------------------------
  def cooccurrenceLift(events: DataFrame): DataFrame = {
    val ut = events.select(col("user_id"), col("event_type")).distinct()
    val nUsers = ut.select(countDistinct(col("user_id")).as("n_users"))
    val marg = ut.groupBy(col("event_type")).agg(count(lit(1)).as("n"))
    val pairs = ut.as("x").join(ut.as("y"),
        col("x.user_id") === col("y.user_id") &&
          col("x.event_type") < col("y.event_type"))
      .groupBy(col("x.event_type").as("type_a"),
        col("y.event_type").as("type_b"))
      .agg(count(lit(1)).as("n_ab"))
    pairs
      .join(broadcast(marg.select(col("event_type").as("type_a"),
        col("n").as("n_a"))), Seq("type_a"))
      .join(broadcast(marg.select(col("event_type").as("type_b"),
        col("n").as("n_b"))), Seq("type_b"))
      .crossJoin(broadcast(nUsers))
      .select(col("type_a"), col("type_b"), col("n_a"), col("n_b"),
        col("n_ab"),
        // DECIMAL(38,0): 1000·n_ab·N leaves int64 near 10⁸ users
        expr("""CAST(CAST(1000 AS DECIMAL(38,0)) * n_ab * n_users
            | DIV (CAST(n_a AS DECIMAL(38,0)) * n_b) AS BIGINT)"""
          .stripMargin).as("lift_pm"))
      .orderBy(col("type_a"), col("type_b"))
  }

  val cooccurrenceLiftOracle: String =
    """WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
      |nu AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n_users FROM ut),
      |marg AS (
      |  SELECT event_type, CAST(count(*) AS BIGINT) AS n FROM ut GROUP BY 1),
      |p AS (
      |  SELECT x.event_type AS type_a, y.event_type AS type_b,
      |         CAST(count(*) AS BIGINT) AS n_ab
      |  FROM ut x JOIN ut y
      |    ON y.user_id = x.user_id AND x.event_type < y.event_type
      |  GROUP BY 1, 2)
      |SELECT p.type_a, p.type_b, a.n AS n_a, b.n AS n_b, p.n_ab,
      |       CAST(CAST(1000 AS HUGEINT) * p.n_ab * nu.n_users
      |            // (CAST(a.n AS HUGEINT) * b.n) AS BIGINT) AS lift_pm
      |FROM p JOIN marg a ON a.event_type = p.type_a
      |       JOIN marg b ON b.event_type = p.type_b, nu
      |ORDER BY p.type_a, p.type_b""".stripMargin
}
