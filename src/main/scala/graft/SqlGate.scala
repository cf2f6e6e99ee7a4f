package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The SAFE analog of the reference's dynamic task submission
  * (`POST /submit` with Python source, master.py:41–74, exec()'d on every
  * worker — remote code execution by design, deliberately NOT
  * reproduced). Here a submitted task is ANSI SQL TEXT: Catalyst parses,
  * analyzes, and optimizes it against the registered tables, so a client
  * gets the reference's "ship me a query at runtime" capability with a
  * declarative, sandboxed surface instead of arbitrary code.
  *
  * Scale note: this inherits every engine property the precompiled
  * queries have — pushdown, pruning, AQE, codegen — because it IS the
  * same planner; there is no separate interpreted path.
  */
object SqlGate {

  /** All fixture tables, registered under their reference names. */
  val tableNames: Seq[String] = Seq("region", "nation", "customer",
    "supplier", "part", "orders", "lineitem", "events", "documents",
    "embeddings")

  /** Register every fixture table as a temp view for SQL access
    * (events gets the same nanos→timestamp normalization the typed
    * loaders apply, so SQL and DataFrame callers see one schema). */
  def register(spark: SparkSession, dir: String): Unit = {
    Tables.region(spark, dir).createOrReplaceTempView("region")
    Tables.nation(spark, dir).createOrReplaceTempView("nation")
    Tables.customer(spark, dir).createOrReplaceTempView("customer")
    Tables.supplier(spark, dir).createOrReplaceTempView("supplier")
    Tables.part(spark, dir).createOrReplaceTempView("part")
    Tables.orders(spark, dir).createOrReplaceTempView("orders")
    Tables.lineitem(spark, dir).createOrReplaceTempView("lineitem")
    Tables.events(spark, dir).createOrReplaceTempView("events")
    Tables.documents(spark, dir).createOrReplaceTempView("documents")
    Tables.embeddings(spark, dir).createOrReplaceTempView("embeddings")
  }

  /** Submit a SQL task against the fixture tables; also registers the
    * graft extension functions so submitted text can use them. */
  def submit(spark: SparkSession, dir: String, sql: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    register(spark, dir)
    spark.sql(sql)
  }
}
