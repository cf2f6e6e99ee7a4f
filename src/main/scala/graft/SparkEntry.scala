package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + BASELINE.md.
  *
  * Every key in [[queries]] is one operator/capability from SURVEY.md §2
  * (or a north-star LLM-pipeline extension); [[oracleSql]] carries the
  * DuckDB-equivalent ANSI SQL for the driver's hash compare. Column names
  * and value rounding are aligned on both sides by construction.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.impactAgg(Tables.lineitem(spark, "/root/testdata/sf0.001"))

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_impact_agg" -> ((s, d) => Relational.impactAgg(Tables.lineitem(s, d)))
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a rows-only check. */
  def oracleSql: Map[String, String] = Map(
    "q01_impact_agg" -> Relational.impactAggOracle
  )
}
