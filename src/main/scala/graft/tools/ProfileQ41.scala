package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only stage profiler for q41. */
object ProfileQ41 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.1")
    time("raw count")(emb.count())
    val q = emb.select(col("vec_id"), expr("CAST(label AS INT)").as("label"),
      expr("transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 10000) AS BIGINT))").as("qv"))
    time("quantize+decode")(q.select(col("label"), col("qv"))
      .as[(Int, Array[Long])].rdd.count())
    time("full q41 #1")(graft.operators.MLOps.pairSeparation(emb).count())
    time("full q41 #2")(graft.operators.MLOps.pairSeparation(emb).count())
  }
}
