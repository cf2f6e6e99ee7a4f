package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row

import graft.mr.MRJob

/** Wordcount-family operators (SURVEY.md §2.B; reference
  * tasks/example_wordcount.py:5–35): tokenize → scrub → filter → count.
  *
  * Two implementations of the same semantics:
  *  - [[wordcount]]: declarative DataFrame plan — partial aggregation
  *    (map-side combine) is automatic, so unlike the reference (which
  *    ships every raw (word,1) pair across the network, worker.py:93–139)
  *    only one row per distinct word per partition crosses the shuffle;
  *  - [[mrWordcount]]: the same job through the generic [[graft.mr.MRJob]]
  *    kernel, validating the engine-parity layer against the SQL path.
  */
object TextOps {

  /** B1–B7: lower, whitespace-split, strip non-alphanumerics, drop
    * empties, count per word. */
  def wordcount(documents: DataFrame): DataFrame =
    documents
      .select(explode(split(lower(col("text")), "\\s+")).as("tok"))
      .select(regexp_replace(col("tok"), "[^a-z0-9]", "").as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word")
      .agg(count(lit(1)).as("cnt"))

  val wordcountOracle: String =
    """SELECT word, CAST(COUNT(*) AS BIGINT) AS cnt FROM (
      |  SELECT regexp_replace(t.tok, '[^a-z0-9]', '', 'g') AS word
      |  FROM documents, unnest(string_split_regex(lower(text), '\s+')) AS t(tok))
      |WHERE word <> '' GROUP BY word""".stripMargin

  /** Same wordcount through the MapReduce kernel: map = tokenize
    * (reference map_func), shuffle = hash (adler32 analog), reduce = sum
    * (reference reduce_func). Result must equal [[wordcount]] exactly —
    * the driver checks it against the same oracle. */
  def mrWordcount(spark: SparkSession, documents: DataFrame): DataFrame = {
    val n = spark.sparkContext.defaultParallelism
    val counts = MRJob.run[Row, String, Long, (String, Long)](
      documents.select("text").rdd,
      numPartitions = n,
      map = (rows, _) =>
        rows.flatMap { r =>
          Option(r.getString(0)).iterator.flatMap(
            _.toLowerCase.split("\\s+").iterator
              .map(_.replaceAll("[^a-z0-9]", ""))
              .filter(_.nonEmpty)
              .map(w => (w, 1L)))
        },
      shuffle = MRJob.hashShuffle[String](n),
      reduce = (k, vs) => Iterator((k, vs.sum)))
    spark.createDataFrame(counts).toDF("word", "cnt")
  }
}
