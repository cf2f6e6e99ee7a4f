import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
object Probe {
  @volatile var stages = List.empty[(Int, Int, Long, Long)]
  def run(name: String, spark: SparkSession)(df: => org.apache.spark.sql.DataFrame): Unit = {
    Thread.sleep(300); stages = Nil
    val t0 = System.nanoTime; df.collect()
    val w = (System.nanoTime-t0)/1e9
    org.apache.spark.graft.ListenerDrain.drain(spark.sparkContext, 5000)
    println(f"$name: wall=$w%.2f s, totalTaskCpu=${stages.map(_._3).sum/1000.0}%.1f s")
  }
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val i = s.stageInfo
        stages ::= ((i.stageId, i.numTasks, i.taskMetrics.executorRunTime,
          i.completionTime.getOrElse(0L) - i.submissionTime.getOrElse(0L)))
      }
    })
    import graft.operators.{Sketches, Widen}
    val li = graft.Tables.lineitem(spark, "/root/testdata/sf0.1")
    li.groupBy("l_returnflag").count().collect()
    val keys = Sketches.lineitemProfileKeys
    def h(sk: String) = s"CAST(conv(substr(md5(coalesce(CAST(($sk) AS STRING), '<NULL>')), 1, 8), 16, 10) AS BIGINT)"
    // E: hashes in a plain Project (splittable codegen), sum them
    val projCols = keys.zipWithIndex.map { case ((n, sk, _), i) => s"${h(sk)} AS h$i" } :+
      keys.zipWithIndex.map { case ((n, _, _), i) => s"CAST(($n IS NULL) AS BIGINT)" }.mkString(" + ") + " AS nuls"
    run("E project 7 hashes, sum", spark)(
      Widen.widen(li).selectExpr(projCols: _*).agg(sum("h0"), sum("h1"), sum("h2"), sum("h3"), sum("h4"), sum("h5"), sum("h6"), sum("nuls")))
    // F: project hashes THEN inline plain structs, kmv
    val kmv = udaf(new graft.functions.KmvSketchAgg(256), org.apache.spark.sql.Encoders.scalaLong)
    val inl = keys.zipWithIndex.map { case ((n, _, _), i) =>
      s"named_struct('c', '$n', 'nul', CAST(($n IS NULL) AS BIGINT), 'h', h$i)" }
    val hashCols = Seq("*") ++ keys.zipWithIndex.map { case ((_, sk, _), i) => s"${h(sk)} AS h$i" }
    run("F project-then-inline, kmv", spark)(
      Widen.widen(li).selectExpr(hashCols: _*)
        .selectExpr(s"inline(array(${inl.mkString(", ")}))")
        .groupBy("c").agg(count(lit(1)).as("n_rows"), sum("nul").as("n_nulls"), kmv(col("h")).as("dv")))
    run("F2 again (codegen cache)", spark)(
      Widen.widen(li).selectExpr(hashCols: _*)
        .selectExpr(s"inline(array(${inl.mkString(", ")}))")
        .groupBy("c").agg(count(lit(1)).as("n_rows"), sum("nul").as("n_nulls"), kmv(col("h")).as("dv")))
  }
}
