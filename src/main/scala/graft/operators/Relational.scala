package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Relational operator library — the reference's query capabilities
  * re-expressed as declarative Spark plans (SURVEY.md §2.B–D).
  *
  * Design notes for 100 TB scale:
  *  - every function returns a lazy DataFrame: Catalyst sees the whole plan,
  *    so filter/projection pushdown and partial aggregation are automatic;
  *  - aggregates over doubles that must be bit-deterministic across
  *    partition orders (the DuckDB-oracle hash compare) are summed as
  *    DECIMAL (associative, exact) and cast back to DOUBLE at the end —
  *    this costs nothing measurable and makes results reproducible on any
  *    cluster size / AQE re-plan;
  *  - no collect(), no driver-side loops: everything is a single
  *    distributed plan.
  */
object Relational {

  /** Exact, order-independent mean of a double column: sum as decimal
    * (associative), divide by count in double (deterministic IEEE op). */
  def exactAvg(c: Column): Column =
    sum(c.cast("decimal(30,6)")).cast("double") / count(lit(1))

  def exactSum(c: Column): Column =
    sum(c.cast("decimal(30,6)")).cast("double")

  /** round(Σc, scale) computed ON THE DECIMAL sum, cast to double last.
    * Decimal rounding is exact digit arithmetic with identical
    * half-away-from-zero halves in Spark and DuckDB; rounding the DOUBLE
    * instead diverges when the value's shortest decimal repr sits on a
    * .5 boundary the binary value doesn't — Spark rounds the repr
    * (BigDecimal of Double.toString), DuckDB rounds the binary. */
  def exactSumRounded(c: Column, scale: Int): Column =
    round(sum(c.cast("decimal(30,6)")), scale).cast("double")

  // --------------------------------------------------------------------
  // Flagship: the accident-analysis query shape (SURVEY.md §2.C, reference
  // tasks/accident_analysis.py:25–129) transplanted onto lineitem.
  //
  // Reference semantics reproduced:
  //  - ordered CASE cascade to a category (C2/C3),
  //  - scalar "impact" arithmetic severity*(1+distance)*(1+duration) (C8)
  //    → l_extendedprice*(1-l_discount)*(1+l_tax),
  //  - multi-aggregate per group: count/avg/min/max (C10),
  //  - post-agg math log_count=ln(n+1), danger=avg*ln(n+1), round(…,2) (C11),
  //  - global sort by danger desc (C14, master.py:117–118).
  //
  // Scale: one shuffle (partial HashAggregate → final), group cardinality
  // tiny (flag×status ≤ 9) so the final agg is trivially small; the sort is
  // over ≤9 rows. Scan is column-pruned to the 6 needed columns.
  // --------------------------------------------------------------------
  def impactAgg(lineitem: DataFrame): DataFrame = {
    val impact = col("l_extendedprice") * (lit(1.0) - col("l_discount")) *
      (lit(1.0) + col("l_tax"))
    // ordered first-match CASE (C2): category from flag/status
    val category = when(col("l_returnflag") === "R", "Returned")
      .when(col("l_linestatus") === "F", "Finished")
      .when(col("l_returnflag") === "A", "Acknowledged")
      .otherwise("Open")
    lineitem
      .select(category.as("category"),
        col("l_returnflag").as("ret_flag"),
        col("l_linestatus").as("line_status"),
        impact.as("impact"))
      .groupBy("category", "ret_flag", "line_status")
      .agg(
        count(lit(1)).as("cnt"),
        round(log(count(lit(1)) + lit(1)), 2).as("log_count"),
        round(exactAvg(col("impact")), 2).as("avg_impact"),
        round(exactAvg(col("impact")) * log(count(lit(1)) + lit(1)), 2)
          .as("danger_score"),
        round(min(col("impact")), 2).as("min_impact"),
        round(max(col("impact")), 2).as("max_impact"))
      // %.2f (not %s): Double.toString vs DuckDB's %s render differently;
      // fixed-precision of an already-2dp-rounded value is identical.
      .withColumn("formula",
        format_string("%.2f * %.2f = %.2f", col("avg_impact"),
          col("log_count"), col("danger_score")))
      .orderBy(desc("danger_score"), asc("category"))
  }

  def impactAggOracle: String =
    """WITH base AS (
      |  SELECT CASE WHEN l_returnflag = 'R' THEN 'Returned'
      |              WHEN l_linestatus = 'F' THEN 'Finished'
      |              WHEN l_returnflag = 'A' THEN 'Acknowledged'
      |              ELSE 'Open' END AS category,
      |         l_returnflag AS ret_flag, l_linestatus AS line_status,
      |         l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) AS impact
      |  FROM lineitem)
      |SELECT category, ret_flag, line_status,
      |       CAST(COUNT(*) AS BIGINT) AS cnt,
      |       ROUND(LN(COUNT(*) + 1), 2) AS log_count,
      |       ROUND(CAST(SUM(CAST(impact AS DECIMAL(30,6))) AS DOUBLE)/COUNT(*), 2) AS avg_impact,
      |       ROUND(CAST(SUM(CAST(impact AS DECIMAL(30,6))) AS DOUBLE)/COUNT(*) * LN(COUNT(*) + 1), 2) AS danger_score,
      |       ROUND(MIN(impact), 2) AS min_impact,
      |       ROUND(MAX(impact), 2) AS max_impact,
      |       printf('%.2f * %.2f = %.2f',
      |              ROUND(CAST(SUM(CAST(impact AS DECIMAL(30,6))) AS DOUBLE)/COUNT(*), 2),
      |              ROUND(LN(COUNT(*) + 1), 2),
      |              ROUND(CAST(SUM(CAST(impact AS DECIMAL(30,6))) AS DOUBLE)/COUNT(*) * LN(COUNT(*) + 1), 2)) AS formula
      |FROM base GROUP BY 1, 2, 3
      |ORDER BY danger_score DESC, category ASC""".stripMargin
}
