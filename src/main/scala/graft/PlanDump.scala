package graft

import org.apache.spark.sql.SparkSession

/** Measurement tool (optimization guide §1.2/§7.2): dump
  * `.explain("formatted")` for declared queries to files, so plan claims
  * (Exchange count, join strategy, PushedFilters/ReadSchema) are
  * checkable without running Spark. Same session shape as Bench
  * (local[$SPARK_GRAFT_CPUS], shuffle.partitions = cpus, TopK rule
  * installed up front) so the dumped plan is the benched plan.
  *
  *   SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_PLAN_OUT=plans/r16 \
  *     sbt "runMain graft.PlanDump q143 q144"        // name prefixes
  *   sbt "runMain graft.PlanDump"                    // all queries
  *
  * Suffix via SPARK_GRAFT_PLAN_SUFFIX (default "before"): files land at
  * $out/<query>_<suffix>.txt. Queries whose construction executes eager
  * sub-jobs (index builds) still dump only the RETURNED frame's plan —
  * the declared result the driver hashes.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val outDir = sys.env.getOrElse("SPARK_GRAFT_PLAN_OUT", "plans/r16")
    val suffix = sys.env.getOrElse("SPARK_GRAFT_PLAN_SUFFIX", "before")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    plans.TopKInstall.install(spark)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => args.isEmpty || args.exists(n.startsWith) }
    selected.foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.write(
          java.nio.file.Paths.get(outDir, s"${name}_$suffix.txt"),
          txt.getBytes("UTF-8"))
        println(s"[plandump] $name -> $outDir/${name}_$suffix.txt")
      } catch { case t: Throwable =>
        System.err.println(s"[plandump] $name FAILED: ${t.getMessage}")
      }
    }
    spark.stop()
  }
}
