package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import Relational.exactSumRounded

/** Join operators (SURVEY.md §2.E "Joins"; the reference's only join is the
  * hand-rolled multicast-shuffle lookup of plants_classifier.py:206–231 —
  * here every variant is a declarative Spark join so Catalyst/AQE pick
  * broadcast vs shuffle strategies).
  *
  * Scale notes: dimension tables (part, customer, nation, region, supplier)
  * are broadcast explicitly — at 100 TB the fact tables (lineitem, orders)
  * shuffle only when joining each other, and AQE handles skew.
  */
object Joins {

  /** As-of join (an operator Spark lacks natively — composed from union +
    * window per the (a)-tier of the extension ladder): attribute each
    * purchase to the user's most recent click at-or-before it.
    *
    * Composition: tag both streams, union, one window pass per user
    * ordered by (ts, src) carrying the last click forward, keep purchase
    * rows. ONE shuffle on user_id for any number of probe rows — the
    * classic scalable as-of encoding (vs a range self-join that explodes).
    * Clicks are deduped per (user, ts) by max event_id so the "most
    * recent" row is deterministic. Oracle: DuckDB's native ASOF JOIN. */
  def asofAttribution(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val clicks = events.filter(col("event_type") === "click")
      .groupBy(col("user_id"), col("ts"))
      .agg(max(col("event_id")).as("click_id"))
      .select(col("user_id"), col("ts"), col("click_id"),
        lit(0).as("src"), lit(null).cast("long").as("purchase_id"))
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), lit(null).cast("long").as("click_id"),
        lit(1).as("src"), col("event_id").as("purchase_id"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("src"), coalesce(col("click_id"), col("purchase_id")))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    clicks.unionAll(purchases)
      .withColumn("attributed_click_id", last(col("click_id"), ignoreNulls = true).over(w))
      .withColumn("click_ts",
        last(when(col("src") === 0, col("ts")), ignoreNulls = true).over(w))
      .filter(col("src") === 1 && col("attributed_click_id").isNotNull)
      .select(col("purchase_id"), col("user_id"), col("attributed_click_id"),
        (unix_micros(col("ts")) - unix_micros(col("click_ts"))).as("delay_us"))
      .orderBy(col("purchase_id"))
  }

  val asofAttributionOracle: String =
    """WITH clicks AS (
      |  SELECT user_id, ts, CAST(MAX(event_id) AS BIGINT) AS click_id
      |  FROM events WHERE event_type = 'click' GROUP BY 1, 2),
      |purchases AS (
      |  SELECT event_id AS purchase_id, user_id, ts
      |  FROM events WHERE event_type = 'purchase')
      |SELECT p.purchase_id, p.user_id, c.click_id AS attributed_click_id,
      |       CAST(epoch_us(p.ts) - epoch_us(c.ts) AS BIGINT) AS delay_us
      |FROM purchases p ASOF JOIN clicks c
      |  ON p.user_id = c.user_id AND p.ts >= c.ts
      |ORDER BY purchase_id""".stripMargin

  /** Fact⋈dim broadcast join: revenue per brand. One shuffle (the final
    * agg); part is broadcast so lineitem never moves. */
  def revenueByBrand(lineitem: DataFrame, part: DataFrame): DataFrame =
    lineitem
      .join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(
        count(lit(1)).as("cnt"),
        exactSumRounded(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 2)
          .as("revenue"))

  val revenueByBrandOracle: String =
    """SELECT p_brand, CAST(COUNT(*) AS BIGINT) AS cnt,
      |       CAST(ROUND(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(30,6))), 2) AS DOUBLE) AS revenue
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |GROUP BY p_brand""".stripMargin

  /** TPC-H Q5-shaped 5-way star join: revenue per nation for a region
    * subset (ASIA/EUROPE/AMERICA) and an order-date range.
    * customer/nation/region broadcast; the only real shuffle is
    * lineitem⋈orders (both hash on orderkey) + final agg. */
  def revenueByNation(lineitem: DataFrame, orders: DataFrame,
      customer: DataFrame, nation: DataFrame, region: DataFrame): DataFrame =
    lineitem
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .filter(col("o_orderdate") >= lit("1996-01-01") &&
        col("o_orderdate") < lit("1998-01-01"))
      .join(broadcast(customer), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .filter(col("r_name").isin("ASIA", "EUROPE", "AMERICA"))
      .groupBy(col("n_name"))
      .agg(
        count(lit(1)).as("cnt"),
        exactSumRounded(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 2)
          .as("revenue"))

  val revenueByNationOracle: String =
    """SELECT n_name, CAST(COUNT(*) AS BIGINT) AS cnt,
      |       CAST(ROUND(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(30,6))), 2) AS DOUBLE) AS revenue
      |FROM lineitem
      |JOIN orders   ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation   ON c_nationkey = n_nationkey
      |JOIN region   ON n_regionkey = r_regionkey
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
      |  AND r_name IN ('ASIA', 'EUROPE', 'AMERICA')
      |GROUP BY n_name""".stripMargin

  /** Left-semi join (EXISTS): customers that placed at least one big order. */
  def customersWithBigOrders(customer: DataFrame, orders: DataFrame): DataFrame =
    customer
      .join(orders.filter(col("o_totalprice") > 150000.0),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))

  val customersWithBigOrdersOracle: String =
    """SELECT c_custkey, c_name, c_mktsegment FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders
      |              WHERE o_custkey = c_custkey AND o_totalprice > 150000.0)""".stripMargin

  /** Left-anti join (NOT EXISTS): customers that never placed a
    * high-value order (the filter runs before the join so the anti side
    * is small; the fixture has orders for every customer, so anti-joining
    * unfiltered orders would be the trivial empty set). */
  def customersWithoutOrders(customer: DataFrame, orders: DataFrame): DataFrame =
    customer
      .join(orders.filter(col("o_totalprice") > 400000.0),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))

  val customersWithoutOrdersOracle: String =
    """SELECT c_custkey, c_name FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders
      |                  WHERE o_custkey = c_custkey AND o_totalprice > 400000.0)""".stripMargin

  /** Theta self cross-join (SURVEY D3, plants_classifier.py:58–63): all
    * unordered label pairs i<j with member counts — the OvO pair table.
    * Label cardinality is tiny (n(n−1)/2 pairs) so this is a broadcast
    * nested-loop over an already-aggregated input, never over raw rows. */
  def labelPairs(embeddings: DataFrame): DataFrame = {
    val counts = embeddings.groupBy(col("label")).agg(count(lit(1)).as("n"))
    val a = counts.select(col("label").as("label_a"), col("n").as("n_a"))
    val b = counts.select(col("label").as("label_b"), col("n").as("n_b"))
    a.crossJoin(broadcast(b))
      .filter(col("label_a") < col("label_b"))
      .withColumn("pair", concat_ws("_", col("label_a"), col("label_b")))
      .withColumn("total", col("n_a") + col("n_b"))
      .select("pair", "label_a", "label_b", "n_a", "n_b", "total")
  }

  val labelPairsOracle: String =
    """WITH counts AS (
      |  SELECT label, CAST(COUNT(*) AS BIGINT) AS n FROM embeddings GROUP BY label)
      |SELECT CAST(a.label AS VARCHAR) || '_' || CAST(b.label AS VARCHAR) AS pair,
      |       a.label AS label_a, b.label AS label_b,
      |       a.n AS n_a, b.n AS n_b, a.n + b.n AS total
      |FROM counts a JOIN counts b ON a.label < b.label""".stripMargin

  /** Banded RANGE JOIN: clicks within the hour before each purchase, per
    * user. A naive time-range join is a per-user cross product; banding
    * each row to its epoch-hour bucket turns it into an EQUI-join — every
    * purchase probes exactly two buckets (its own + the previous hour),
    * so candidates are bounded by bucket population, the shuffle is one
    * narrow (user, bucket) exchange, and the exact `[pts−1h, pts)` range
    * check runs only on candidates. The standard bucketed-range-join
    * shape at any scale; skewed hot users fall to AQE skew handling. */
  def rangeJoinClicks(events: DataFrame): DataFrame = {
    val hourBucket = expr("CAST(floor(unix_timestamp(ts) / 3600) AS BIGINT)")
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("cts"), hourBucket.as("bucket"))
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts").as("pts"),
        explode(array(hourBucket - 1, hourBucket)).as("bucket"))
    purchases.join(clicks, Seq("user_id", "bucket"), "left")
      .select(col("event_id"), col("user_id"),
        when(col("cts").isNotNull &&
          col("cts") >= col("pts") - expr("INTERVAL 1 HOUR") &&
          col("cts") < col("pts"), 1L).otherwise(0L).as("m"))
      .groupBy(col("event_id"), col("user_id"))
      .agg(sum(col("m")).as("n_clicks"))
      .orderBy(col("event_id"))
  }

  val rangeJoinClicksOracle: String =
    """WITH clicks AS (
      |  SELECT user_id, ts AS cts, CAST(floor(epoch(ts) / 3600) AS BIGINT) AS bucket
      |  FROM events WHERE event_type = 'click'),
      |purchases AS (
      |  SELECT event_id, user_id, ts AS pts,
      |         unnest([CAST(floor(epoch(ts) / 3600) AS BIGINT) - 1,
      |                 CAST(floor(epoch(ts) / 3600) AS BIGINT)]) AS bucket
      |  FROM events WHERE event_type = 'purchase'),
      |j AS (
      |  SELECT p.event_id, p.user_id,
      |         CASE WHEN c.cts IS NOT NULL
      |                   AND c.cts >= p.pts - INTERVAL 1 HOUR
      |                   AND c.cts < p.pts
      |              THEN 1 ELSE 0 END AS m
      |  FROM purchases p LEFT JOIN clicks c
      |    ON c.user_id = p.user_id AND c.bucket = p.bucket)
      |SELECT event_id, user_id, CAST(SUM(m) AS BIGINT) AS n_clicks
      |FROM j GROUP BY 1, 2 ORDER BY event_id""".stripMargin

  /** Bloom-pruned LARGE-LARGE semi join: segment counts of customers
    * holding a high-value order, with the probe side pre-filtered by a
    * FIXED-SIZE Bloom filter built from the build side's keys.
    *
    * The scale problem this solves: when BOTH join sides are too big to
    * broadcast, a semi join shuffles the entire probe side — including
    * the (often dominant) fraction with no match. Broadcasting the key
    * SET is unbounded (it grows with the build side); a Bloom filter is
    * not — its bits are sized by (expectedKeys, fpp) only, independent
    * of row count, and it is built DISTRIBUTED (Spark's
    * `stat.bloomFilter` runs a treeAggregate; only the fixed-size bit
    * array reaches the driver). Probe rows failing `mightContain` are
    * dropped map-side BEFORE the exchange; false positives (bounded by
    * fpp, and merely more frequent — never wrong — if the key count
    * overruns `expectedKeys`) are removed by the exact semi join that
    * follows, so the result is byte-identical to the plain semi join
    * the oracle runs. This is the manual, deterministic form of Spark
    * 3.3+'s runtime row-level filtering (which injects the same
    * bloom_filter_agg/might_contain pair when stats warrant it), built
    * from the SAME expression pair that feature uses: the filter is a
    * `bloom_filter_agg` SCALAR SUBQUERY over the build side's keys
    * (computed distributed inside the query — no separate driver-side
    * `stat.bloomFilter` action, no serialized megabyte literal bloating
    * every plan string), probed by Spark's codegen'd
    * `BloomFilterMightContain` (both ends operate on the raw long key:
    * same hash family by construction; spec-pinned byte-identical to
    * the plain semi join). Vs the scalar-UDF probe this replaces: the
    * probe stays inside whole-stage codegen — no per-row virtual call
    * or boxing — and the subquery result ships to executors via the
    * standard subquery broadcast, once per executor. */
  def bloomSemiSegments(customer: DataFrame, orders: DataFrame,
                        expectedKeys: Long = 1000000L,
                        fpp: Double = 0.01): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.{Alias, BloomFilterMightContain, Literal, ScalarSubquery}
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate => LogicalAggregate}
    import org.apache.spark.sql.graft.ColumnBridge
    val keys = orders.filter(col("o_totalprice") > 120000.0)
      .select(col("o_custkey"))
    // optimal bit count for (expectedKeys, fpp) — the classic
    // -n·ln(p)/ln(2)² sizing `BloomFilter.create` applies; the
    // aggregate takes bits explicitly
    val numBits = math.ceil(
      -expectedKeys * math.log(fpp) / (math.log(2) * math.log(2))).toLong
    val keysPlan = keys.queryExecution.analyzed
    val bloomAgg = Alias(
      new BloomFilterAggregate(keysPlan.output.head,
        Literal(expectedKeys), Literal(numBits)).toAggregateExpression(),
      "bloomFilter")()
    val mightContain = ColumnBridge.column(
      BloomFilterMightContain(
        ScalarSubquery(LogicalAggregate(Nil, Seq(bloomAgg), keysPlan)),
        ColumnBridge.expression(col("c_custkey"))))
    customer
      .filter(mightContain)
      .join(keys, col("c_custkey") === col("o_custkey"), "left_semi")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_customers"))
      .orderBy(col("c_mktsegment"))
  }

  val bloomSemiSegmentsOracle: String =
    """SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_customers
      |FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders
      |              WHERE o_custkey = c_custkey AND o_totalprice > 120000.0)
      |GROUP BY 1 ORDER BY 1""".stripMargin
}
