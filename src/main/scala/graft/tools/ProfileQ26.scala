package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only stage profiler for q26 (simhash). */
object ProfileQ26 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.1")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    println("docs: " + docs.count())

    val sh = docs
      .select(col("doc_id"), split(lower(col("text")), "\\s+").as("toks"))
      .filter(size(col("toks")) >= 3)
      .select(col("doc_id"), expr(
        """array_distinct(transform(sequence(0, size(toks)-3),
          |  i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2])))""".stripMargin)
        .as("sset"))
    time("shingles")(sh.count())

    val th = sh.select(col("doc_id"), expr(
      """transform(sset, x ->
        |  CAST(conv(substr(md5(concat('0:', x)), 1, 8), 16, 10) AS BIGINT))"""
        .stripMargin).as("th"))
    time("token hashes")(th.count())

    val fps = th.select(col("doc_id"), expr(
      """aggregate(
        |  transform(sequence(0, 31), b ->
        |    CASE WHEN aggregate(th, 0L, (acc, h) ->
        |             acc + CASE WHEN (shiftright(h, b) & 1) = 1 THEN 1L ELSE -1L END) > 0
        |         THEN shiftleft(CAST(1 AS BIGINT), b) ELSE 0L END),
        |  0L, (acc, x) -> acc + x)""".stripMargin).as("fp"))
    time("fingerprints")(fps.count())
    fps.explain("formatted")

    val banded = fps.select(col("doc_id"), col("fp"),
      explode(expr("sequence(0, 3)")).as("band"))
      .select(col("doc_id"), col("fp"),
        expr("concat_ws(':', band, shiftright(fp, band*8) & 255)").as("band_key"))
    time("banded")(banded.count())
    val nb = time("band collisions")(
      banded.groupBy("band_key").count().orderBy(desc("count")).limit(10))
    nb.show(10, false)
  }
}
