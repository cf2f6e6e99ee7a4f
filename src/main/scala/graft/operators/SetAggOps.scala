package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import Relational.exactSumRounded

/** Set operations, grouping-set aggregates, distinct aggregates, sorts and
  * top-k (SURVEY.md §2.E rows "Set ops", "Aggregations", "Sort/limit/top-k";
  * result-gather in the reference is a bare union-all, master.py:107–124).
  */
object SetAggOps {

  /** UNION ALL of two account populations, re-aggregated. */
  def accountUnion(customer: DataFrame, supplier: DataFrame): DataFrame = {
    val c = customer.select(lit("customer").as("kind"),
      col("c_nationkey").cast("int").as("nationkey"),
      col("c_acctbal").as("acctbal"))
    val s = supplier.select(lit("supplier").as("kind"),
      col("s_nationkey").cast("int").as("nationkey"),
      col("s_acctbal").as("acctbal"))
    c.unionAll(s)
      .groupBy(col("kind"), col("nationkey"))
      .agg(count(lit(1)).as("cnt"),
        exactSumRounded(col("acctbal"), 2).as("total_bal"))
  }

  val accountUnionOracle: String =
    """SELECT kind, nationkey, CAST(COUNT(*) AS BIGINT) AS cnt,
      |       CAST(ROUND(SUM(CAST(acctbal AS DECIMAL(30,6))), 2) AS DOUBLE) AS total_bal
      |FROM (
      |  SELECT 'customer' AS kind, CAST(c_nationkey AS INT) AS nationkey, c_acctbal AS acctbal FROM customer
      |  UNION ALL
      |  SELECT 'supplier' AS kind, CAST(s_nationkey AS INT) AS nationkey, s_acctbal AS acctbal FROM supplier)
      |GROUP BY kind, nationkey""".stripMargin

  /** INTERSECT: nations that have both customers and suppliers. */
  def nationsWithBoth(customer: DataFrame, supplier: DataFrame): DataFrame =
    customer.select(col("c_nationkey").cast("int").as("nationkey"))
      .intersect(supplier.select(col("s_nationkey").cast("int").as("nationkey")))

  val nationsWithBothOracle: String =
    """SELECT CAST(c_nationkey AS INT) AS nationkey FROM customer
      |INTERSECT
      |SELECT CAST(s_nationkey AS INT) AS nationkey FROM supplier""".stripMargin

  /** EXCEPT: customers who ordered, minus those with any high-value
    * order — i.e. buyers whose every order is modest. (Every nation has
    * both customers and suppliers in the fixture, so a nation-level
    * EXCEPT would be the trivial empty set.) */
  def nationsCustomersOnly(customer: DataFrame, orders: DataFrame): DataFrame =
    orders.select(col("o_custkey").as("custkey"))
      .except(orders.filter(col("o_totalprice") > 300000.0)
        .select(col("o_custkey").as("custkey")))

  val nationsCustomersOnlyOracle: String =
    """SELECT o_custkey AS custkey FROM orders
      |EXCEPT
      |SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 300000.0""".stripMargin

  /** DISTINCT + global sort (SURVEY D2, plants_classifier.py:50–54). */
  def distinctLabels(embeddings: DataFrame): DataFrame =
    embeddings.select(col("label").cast("int").as("label"))
      .distinct()
      .orderBy(col("label").asc)

  val distinctLabelsOracle: String =
    "SELECT DISTINCT CAST(label AS INT) AS label FROM embeddings ORDER BY label"

  /** Global top-k (SURVEY C14/A9): Spark plans TakeOrderedAndProject — no
    * full sort, each partition keeps k rows, driver merges k·p. */
  def topOrders(orders: DataFrame, k: Int = 10): DataFrame =
    orders
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(k)

  val topOrdersOracle: String =
    """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""".stripMargin

  /** ROLLUP over (returnflag, linestatus) with a grouping id — multi-level
    * aggregates in one pass (reference cannot express these at all).
    * NULL grouping keys are coalesced to 'ALL' (gid still disambiguates
    * levels) so the result carries no NULLs — the driver's hash compare
    * treats NULL as never-equal. */
  def rollupFlagStatus(lineitem: DataFrame): DataFrame =
    lineitem
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("cnt"),
        exactSumRounded(col("l_quantity"), 2).as("sum_qty"),
        grouping_id().cast("int").as("gid"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("l_returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("l_linestatus"),
        col("cnt"), col("sum_qty"), col("gid"))

  val rollupFlagStatusOracle: String =
    """SELECT COALESCE(l_returnflag, 'ALL') AS l_returnflag,
      |       COALESCE(l_linestatus, 'ALL') AS l_linestatus,
      |       CAST(COUNT(*) AS BIGINT) AS cnt,
      |       CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(30,6))), 2) AS DOUBLE) AS sum_qty,
      |       CAST(GROUPING(l_returnflag, l_linestatus) AS INT) AS gid
      |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin

  /** Arbitrary GROUPING SETS — a shape rollup/cube can NOT express:
    * {(priority), (status)} aggregates two independent dimensions in ONE
    * pass over orders (the Expand operator duplicates each row once per
    * set, then a single partial+final aggregation runs — at 100 TB that
    * is one scan and one shuffle instead of two of each unioned). */
  def groupingSetsPriorityStatus(orders: DataFrame): DataFrame =
    orders
      .groupingSets(
        Seq(Seq(col("o_orderpriority")), Seq(col("o_orderstatus"))),
        col("o_orderpriority"), col("o_orderstatus"))
      .agg(count(lit(1)).as("cnt"),
        exactSumRounded(col("o_totalprice"), 2).as("total_price"),
        grouping_id().cast("int").as("gid"))
      .select(
        coalesce(col("o_orderpriority"), lit("ALL")).as("o_orderpriority"),
        coalesce(col("o_orderstatus"), lit("ALL")).as("o_orderstatus"),
        col("cnt"), col("total_price"), col("gid"))
      .orderBy(col("gid"), col("o_orderpriority"), col("o_orderstatus"))

  val groupingSetsPriorityStatusOracle: String =
    """SELECT COALESCE(o_orderpriority, 'ALL') AS o_orderpriority,
      |       COALESCE(o_orderstatus, 'ALL') AS o_orderstatus,
      |       CAST(COUNT(*) AS BIGINT) AS cnt,
      |       CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(30,6))), 2) AS DOUBLE) AS total_price,
      |       CAST(GROUPING(o_orderpriority, o_orderstatus) AS INT) AS gid
      |FROM orders GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus))
      |ORDER BY gid, o_orderpriority, o_orderstatus""".stripMargin

  /** CUBE over (priority, shipmode-ish flag): all 4 grouping-set levels
    * in one pass; NULL keys coalesced to 'ALL' as in [[rollupFlagStatus]]. */
  def cubePriorityStatus(orders: DataFrame): DataFrame =
    orders
      .cube(col("o_orderpriority"), col("o_orderstatus"))
      .agg(count(lit(1)).as("cnt"),
        exactSumRounded(col("o_totalprice"), 2).as("total_price"),
        grouping_id().cast("int").as("gid"))
      .select(
        coalesce(col("o_orderpriority"), lit("ALL")).as("o_orderpriority"),
        coalesce(col("o_orderstatus"), lit("ALL")).as("o_orderstatus"),
        col("cnt"), col("total_price"), col("gid"))

  val cubePriorityStatusOracle: String =
    """SELECT COALESCE(o_orderpriority, 'ALL') AS o_orderpriority,
      |       COALESCE(o_orderstatus, 'ALL') AS o_orderstatus,
      |       CAST(COUNT(*) AS BIGINT) AS cnt,
      |       CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(30,6))), 2) AS DOUBLE) AS total_price,
      |       CAST(GROUPING(o_orderpriority, o_orderstatus) AS INT) AS gid
      |FROM orders GROUP BY CUBE (o_orderpriority, o_orderstatus)""".stripMargin

  /** Exact distinct-aggregates (Catalyst expands to a two-phase plan;
    * the reference has no distinct aggregation at all). */
  def distinctCounts(lineitem: DataFrame): DataFrame =
    lineitem.groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("cnt"),
        countDistinct(col("l_suppkey")).as("n_suppliers"),
        countDistinct(col("l_partkey")).as("n_parts"))

  val distinctCountsOracle: String =
    """SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS cnt,
      |       CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_suppliers,
      |       CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_parts
      |FROM lineitem GROUP BY l_returnflag""".stripMargin

  /** Frequency table / value_counts (SURVEY D13). */
  def langHistogram(documents: DataFrame): DataFrame =
    documents.groupBy(col("lang")).agg(count(lit(1)).as("cnt"))

  val langHistogramOracle: String =
    "SELECT lang, CAST(COUNT(*) AS BIGINT) AS cnt FROM documents GROUP BY lang"
}
