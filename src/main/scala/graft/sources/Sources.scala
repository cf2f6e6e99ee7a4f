package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Source readers covering the reference's input formats (SURVEY §2.E
  * "Sources/sinks"): line-oriented text (B1), headered CSV with
  * defensive casts (C1/C6), `;`-separated CSV with an explicit declared
  * schema (D1 / DTYPE_DICT plants_classifier.py:24–45), JSON, and
  * directory-of-binary-files (D5) — each as a lazy DataFrame so Catalyst
  * pushes projection/predicates into the scan.
  */
object Sources {

  /** B1: whole-directory line scan (`*.txt` glob like
    * example_wordcount.py:10–13) with the source file attached — the
    * Spark-native replacement for per-worker directory ownership. */
  def readTextLines(spark: SparkSession, path: String): DataFrame =
    spark.read.textFile(path).toDF("line")
      .withColumn("source_file", input_file_name())

  /** C1+C6: headered CSV, all-string like csv.DictReader, with the
    * reference's defensive float(x)-except-default casts expressed
    * null-safely. `casts` maps column -> (type, default). */
  def readCsvDefensive(spark: SparkSession, path: String,
                       casts: Map[String, (DataType, Any)]): DataFrame = {
    val raw = spark.read.option("header", "true").csv(path)
    casts.foldLeft(raw) { case (df, (name, (dt, default))) =>
      // try_cast, not cast: ANSI mode makes cast THROW on malformed input,
      // whereas the reference's try/except-default semantics want null→default
      df.withColumn(name,
        coalesce(col(name).try_cast(dt), lit(default).cast(dt)))
    }
  }

  /** D1: `;`-separated CSV with a declared schema (the plants task's
    * DTYPE_DICT analog) — column pruning then happens in the scan, the
    * engine-side equivalent of `usecols=[...]`. */
  def readCsvDeclared(spark: SparkSession, path: String,
                      schema: StructType, sep: String = ";"): DataFrame =
    spark.read.option("sep", sep).option("header", "true")
      .schema(schema).csv(path)

  /** JSON lines via Spark's standard reader. Schema inference runs a
    * full extra pass over the files — fine for fixtures; at scale pass
    * an explicit schema (`spark.read.schema(...).json(path)`) or set
    * `samplingRatio` to bound the inference scan. */
  def readJsonLines(spark: SparkSession, path: String): DataFrame =
    spark.read.json(path)

  /** D5: directory-as-dataset binary scan (plants_classifier.py:141–163):
    * each file one row (path, modificationTime, length, content), label
    * derived from the parent directory name. */
  def readBinaryDir(spark: SparkSession, path: String): DataFrame =
    spark.read.format("binaryFile").load(path)
      .withColumn("label",
        regexp_extract(col("path"), "([^/]+)/[^/]+$", 1))

  /** ORC read — the second columnar format the library speaks (Spark
    * built-in; same pushdown/pruning surface as parquet, `.explain`
    * shows PushedFilters + a pruned ReadSchema). */
  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** ORC sink, optionally partitioned — mirror of the parquet sink for
    * pipelines whose downstream consumers are ORC-native (Hive/Trino). */
  def writeOrc(df: DataFrame, path: String,
               partitionCols: Seq[String] = Nil): String = {
    val w = df.write.mode("overwrite")
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w).orc(path)
    path
  }

  /** Partitioned parquet sink (the engine's durable output path —
    * replaces the reference's in-memory master result dict,
    * master.py:19–20). Returns the written path for chaining. */
  def writePartitionedParquet(df: DataFrame, path: String,
                              partitionCols: Seq[String]): String = {
    df.write.mode("overwrite").partitionBy(partitionCols: _*).parquet(path)
    path
  }

  /** Bucketed catalog table sink: pre-shuffles ONCE at write time so
    * every later equi-join/aggregation on the bucket key is co-located —
    * at 100 TB this is the difference between one shuffle per pipeline
    * run and zero (both sides of a fact⋈fact join arrive pre-hashed;
    * SourcesSpec asserts the join plan has no Exchange). Buckets are
    * Spark's hash buckets, the durable analog of the reference's
    * semantic partitioner (accident_analysis.py:90–104). */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
                    nBuckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(nBuckets, bucketCol).sortBy(bucketCol)
      .format("parquet").saveAsTable(table)
}
