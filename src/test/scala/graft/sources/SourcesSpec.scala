package graft.sources

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class SourcesSpec extends SparkSpec {

  private def tmpDir(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  test("readTextLines: line scan with source-file lineage (B1)") {
    val dir = tmpDir("txt")
    Files.writeString(java.nio.file.Path.of(dir, "a.txt"), "hello world\nmap reduce\n")
    Files.writeString(java.nio.file.Path.of(dir, "b.txt"), "spark\n")
    val df = Sources.readTextLines(spark, dir)
    assert(df.count() == 3)
    assert(df.filter(col("line") === "spark")
      .select("source_file").head.getString(0).endsWith("b.txt"))
  }

  test("readCsvDefensive: float-with-default semantics of the accident task (C6)") {
    val dir = tmpDir("csv")
    Files.writeString(java.nio.file.Path.of(dir, "d.csv"),
      "Severity,Distance\n3,1.5\nbogus,\n,2.25\n")
    val df = Sources.readCsvDefensive(spark, dir, Map(
      "Severity" -> (DoubleType, 1.0),   // reference default 1
      "Distance" -> (DoubleType, 0.0)))  // reference default 0
    val rows = df.select("Severity", "Distance").collect()
      .map(r => (r.getDouble(0), r.getDouble(1))).sortBy(_._1)
    assert(rows.toSeq == Seq((1.0, 0.0), (1.0, 2.25), (3.0, 1.5)))
  }

  test("readCsvDeclared: explicit schema, ';' separator (D1 DTYPE_DICT analog)") {
    val dir = tmpDir("csv2")
    Files.writeString(java.nio.file.Path.of(dir, "p.csv"),
      "species_id;img\n42;a.jpg\n7;b.jpg\n")
    val schema = StructType(Seq(
      StructField("species_id", LongType), StructField("img", StringType)))
    val df = Sources.readCsvDeclared(spark, dir, schema).select("species_id")
    assert(df.as[Long](org.apache.spark.sql.Encoders.scalaLong)
      .collect().sorted.toSeq == Seq(7L, 42L))
  }

  test("readBinaryDir: directory-as-label binary scan (D5)") {
    val dir = tmpDir("imgs")
    val sub = java.nio.file.Path.of(dir, "species_a")
    Files.createDirectories(sub)
    Files.write(sub.resolve("x.jpg"), Array[Byte](1, 2, 3))
    val df = Sources.readBinaryDir(spark, dir + "/*")
    val row = df.select("label", "length").head
    assert(row.getString(0) == "species_a" && row.getLong(1) == 3L)
  }

  test("writePartitionedParquet round-trips with partition pruning") {
    val dir = tmpDir("sink") + "/out"
    val df = spark.range(100).withColumn("part", expr("CAST(id % 4 AS INT)"))
    Sources.writePartitionedParquet(df, dir, Seq("part"))
    val back = spark.read.parquet(dir).filter(col("part") === 2)
    assert(back.count() == 25)
    val scan = back.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(scan.contains("PartitionFilters: [isnotnull(part"),
      "partition pruning must reach the scan")
  }

  test("ORC round-trip with partition pruning and filter pushdown " +
    "(the parquet surface, second columnar format)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_orc").toString
    val df = spark.range(200)
      .withColumn("part", expr("CAST(id % 4 AS STRING)"))
      .withColumn("v", expr("id * 7"))
    Sources.writeOrc(df, s"$dir/t", Seq("part"))
    val back = Sources.readOrc(spark, s"$dir/t")
      .filter(col("part") === "2" && col("v") > 100)
      .select(col("id"), col("v"))
    assert(back.count() == df.filter("id % 4 = 2 AND id * 7 > 100").count())
    val scan = back.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters: [isnotnull(part"),
      "partition pruning must reach the ORC scan:\n" + scan.take(800))
    assert(scan.contains("PushedFilters: [IsNotNull(v), GreaterThan(v,100)]"),
      "predicate pushdown must reach the ORC scan:\n" + scan.take(800))
  }

  test("writeBucketed: a join of two bucketed tables is co-located — " +
    "zero Exchange in the physical plan") {
    val a = spark.range(1000).withColumn("va", expr("id * 2"))
    val b = spark.range(1000).withColumn("vb", expr("id * 3"))
    Sources.writeBucketed(a, "bkt_a", "id", 4)
    Sources.writeBucketed(b, "bkt_b", "id", 4)
    // the fixture is tiny, so the planner would broadcast (also
    // shuffle-free, but not what this test pins down) — force the
    // co-located shuffle-join path a fact⋈fact join takes at scale
    val prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("bkt_a").join(spark.table("bkt_b"), "id")
        .filter(col("va") > 100)
      assert(joined.count() == 949)
      val p = joined.queryExecution.executedPlan.toString
      assert(!p.contains("Exchange"),
        "bucketed equi-join must not shuffle either side:\n" + p.take(1500))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)
      spark.sql("DROP TABLE IF EXISTS bkt_a")
      spark.sql("DROP TABLE IF EXISTS bkt_b")
      ()
    }
  }
}
