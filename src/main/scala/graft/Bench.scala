package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm-up: pay JIT/codegen-compiler/session initialization once,
    // outside any query's timing (otherwise the alphabetically-first
    // query absorbs ~5s of one-time cost)
    try SparkEntry.entry(spark).queryExecution.toRdd.count()
    catch { case _: Throwable => }
    // toRdd.count(), NOT df.count(): a count-aggregate on top lets
    // Catalyst prune the query's own output columns (a fingerprint query
    // would "run" without hashing anything); toRdd executes the plan as
    // written, every output column evaluated, nothing shipped to driver.
    // Sorted order keeps per-query numbers comparable across rounds.
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      // pay accumulated session garbage OUTSIDE the next query's timing:
      // without this, measured 56-query sessions inflate individual
      // queries up to 3x their isolated warm time (GC debt lands on
      // whoever runs next)
      System.gc()
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).queryExecution.toRdd.count() }
      catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val json = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    println(json)
    // stdout passes through sbt's logger (an "[info] " prefix broke the
    // driver's JSON parse in round 1) — also write the line to a file so
    // BENCH_r*.json always gets machine-readable per-query numbers
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH.json")
    java.nio.file.Files.write(java.nio.file.Paths.get(out),
      (json + "\n").getBytes("UTF-8"))
    spark.stop()
  }
}
