package graft.operators

import graft.SparkSpec
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}

/** Widen: the single-row-group fan-out. These pin (a) result identity,
  * (b) the no-op contracts (shuffled plans, in-memory plans), (c) column
  * pruning through the inserted exchange, and (d) that widen NEVER
  * executes anything — the old `df.rdd` probe under AQE eagerly
  * materialized every query stage of a shuffled input at plan-build
  * time. */
class WidenSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private def docs = graft.Tables.documents(spark, sf)

  test("a single-row-group parquet scan widens to default parallelism " +
    "with identical rows") {
    val base = docs.select("doc_id", "source")
    val w = Widen.widen(base)
    assert(rows(w.orderBy("doc_id")) == rows(base.orderBy("doc_id")))
    w.collect()
    val plan = w.queryExecution.executedPlan.toString
    assert(plan.contains("RoundRobinPartitioning"),
      s"expected a round-robin widen exchange in:\n$plan")
  }

  test("the widen exchange carries only the pruned columns") {
    val w = Widen.widen(docs).select("doc_id")
    w.collect()
    val plan = w.queryExecution.executedPlan.toString
    val scanLine = plan.linesIterator.find(_.contains("ReadSchema")).get
    assert(!scanLine.contains("text"),
      s"scan under the widen exchange reads unpruned columns: $scanLine")
  }

  test("no-op contracts: shuffled plans and in-memory plans return the " +
    "same object, and widen never runs a job (the df.rdd AQE trap)") {
    import spark.implicits._
    // build every input OUTSIDE the listener scope: spark.read.parquet
    // itself runs schema-inference jobs that are not widen's doing
    val raw = docs
    val shuffled = raw.groupBy("source").count()
    val local = Seq((1L, "a"), (2L, "b")).toDF("id", "s")
    @volatile var jobs = 0
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs += 1
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      // shuffled input: widening is moot (width = shuffle.partitions)
      assert(Widen.widen(shuffled) eq shuffled)
      // in-memory input: no row-group bound to correct
      assert(Widen.widen(local) eq local)
      // file input: plan inspection only, still no job
      Widen.widen(raw)
      Thread.sleep(500) // listener bus drain grace
      assert(jobs == 0, s"widen materialized $jobs job(s) at plan-build time")
    } finally spark.sparkContext.removeSparkListener(listener)
  }
}
