package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Window-function operators (SURVEY.md §2.E "Window functions"; the
  * reference's majority-vote argmax, scripts/plants_classifier_tester.py:20–34,
  * is a latent row_number pattern — realized here natively).
  *
  * Every ordering includes a unique tie-break key so results are
  * deterministic under any partitioning (required both for the oracle
  * hash compare and for reproducible runs on a real cluster).
  */
object Windows {

  /** Top-k per group via row_number (SURVEY D10 shape): 3 priciest parts
    * per brand. Single shuffle on the partition key. */
  def topPartsPerBrand(part: DataFrame, k: Int = 3): DataFrame = {
    val w = Window.partitionBy(col("p_brand"))
      .orderBy(col("p_retailprice").desc, col("p_partkey").asc)
    part
      .select(col("p_brand"), col("p_partkey"), col("p_retailprice"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
  }

  val topPartsPerBrandOracle: String = topPartsPerBrandOracleAt(3)

  /** Oracle builder on the SAME k as the engine function. */
  def topPartsPerBrandOracleAt(k: Int): String =
    s"""SELECT p_brand, p_partkey, p_retailprice, rn FROM (
      |  SELECT p_brand, p_partkey, p_retailprice,
      |         CAST(ROW_NUMBER() OVER (PARTITION BY p_brand
      |              ORDER BY p_retailprice DESC, p_partkey ASC) AS INT) AS rn
      |  FROM part) WHERE rn <= $k""".stripMargin

  /** Running (cumulative) total per customer over order date. The measure
    * is summed as DECIMAL so the cumulative value is exact regardless of
    * how the window engine associates the additions. */
  def runningOrderTotal(orders: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    orders
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        col("o_totalprice"))
      .withColumn("running_total",
        sum(col("o_totalprice").cast("decimal(30,6)")).over(w).cast("double"))
      .withColumn("order_rank",
        row_number().over(Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)))
      .select("o_custkey", "o_orderkey", "order_rank", "running_total")
  }

  val runningOrderTotalOracle: String =
    """SELECT o_custkey, o_orderkey,
      |       CAST(ROW_NUMBER() OVER w AS INT) AS order_rank,
      |       CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6))) OVER
      |            (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
      |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC)""".stripMargin

  /** Gap-based sessionization via lag (classic event-stream pattern): a new
    * session starts when >30 min passed since the user's previous event.
    * Output: sessions + events per user. */
  def sessionsPerUser(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    events
      .select(col("user_id"), col("event_id"), col("ts"))
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          col("ts").cast("double") - col("prev_ts").cast("double") >
            lit(gapMinutes * 60.0), 1L).otherwise(0L))
      .groupBy(col("user_id"))
      .agg(sum(col("new_session")).as("sessions"),
        count(lit(1)).as("events"))
  }

  val sessionsPerUserOracle: String = sessionsPerUserOracleAt(30)

  /** Oracle builder on the SAME gap as the engine function. */
  def sessionsPerUserOracleAt(gapMinutes: Int): String =
    s"""WITH flagged AS (
      |  SELECT user_id,
      |         CASE WHEN prev_ts IS NULL
      |                OR epoch(ts) - epoch(prev_ts) > ${gapMinutes * 60}.0
      |              THEN 1 ELSE 0 END AS new_session
      |  FROM (SELECT user_id, ts,
      |               LAG(ts) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS prev_ts
      |        FROM events))
      |SELECT user_id, CAST(SUM(new_session) AS BIGINT) AS sessions,
      |       CAST(COUNT(*) AS BIGINT) AS events
      |FROM flagged GROUP BY user_id""".stripMargin

  /** Per-group mode / majority vote (SURVEY D11,
    * plants_classifier_tester.py:44–58): most frequent market segment per
    * nation, deterministic tie-break on segment name. Two shuffles:
    * count-agg then the tiny per-nation argmax. */
  def modeSegmentPerNation(customer: DataFrame, nation: DataFrame): DataFrame = {
    val counts = customer
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"), col("c_mktsegment"))
      .agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy(col("n_name"))
      .orderBy(col("cnt").desc, col("c_mktsegment").asc)
    counts.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("n_name"), col("c_mktsegment").as("top_segment"), col("cnt"))
  }

  val modeSegmentPerNationOracle: String =
    """WITH counts AS (
      |  SELECT n_name, c_mktsegment, CAST(COUNT(*) AS BIGINT) AS cnt
      |  FROM customer JOIN nation ON c_nationkey = n_nationkey
      |  GROUP BY n_name, c_mktsegment)
      |SELECT n_name, c_mktsegment AS top_segment, cnt FROM (
      |  SELECT *, ROW_NUMBER() OVER (PARTITION BY n_name
      |            ORDER BY cnt DESC, c_mktsegment ASC) AS rn
      |  FROM counts) WHERE rn = 1""".stripMargin
}
