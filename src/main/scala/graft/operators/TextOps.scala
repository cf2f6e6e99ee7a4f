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

  /** The ONE tokenize/scrub/filter chain (B2–B4) behind [[wordcount]] and
    * [[adlerPartition]] — a regex tweak applied to a private copy would
    * silently de-synchronize q02/q43 from their shared oracle shape. */
  private def words(documents: DataFrame): DataFrame =
    Widen.widen(documents)
      .select(explode(split(lower(col("text")), "\\s+")).as("tok"))
      .select(regexp_replace(col("tok"), "[^a-z0-9]", "").as("word"))
      .filter(length(col("word")) > 0)

  /** B1–B7: lower, whitespace-split, strip non-alphanumerics, drop
    * empties, count per word. */
  def wordcount(documents: DataFrame): DataFrame =
    words(documents)
      .groupBy("word")
      .agg(count(lit(1)).as("cnt"))

  val wordcountOracle: String =
    """SELECT word, CAST(COUNT(*) AS BIGINT) AS cnt FROM (
      |  SELECT regexp_replace(t.tok, '[^a-z0-9]', '', 'g') AS word
      |  FROM documents, unnest(string_split_regex(lower(text), '\s+')) AS t(tok))
      |WHERE word <> '' GROUP BY word""".stripMargin

  /** Reference hash-partition parity (B6, example_wordcount.py:22–27):
    * bucket wordcount keys by zlib adler32 % 4 via the native codegen'd
    * [[graft.functions.Adler32Expression]] (registered as
    * `graft_adler32`). The oracle recomputes adler32 arithmetically
    * (A = 1+Σd mod 65521, B = n+Σ(n−i+1)·dᵢ mod 65521, B·65536+A). */
  def adlerPartition(documents: DataFrame): DataFrame =
    words(documents)
      .select(col("word"), expr("pmod(graft_adler32(word), 4)").as("bucket"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("cnt"), countDistinct(col("word")).as("words"))
      .orderBy(col("bucket"))

  val adlerPartitionOracle: String =
    """WITH toks AS (
      |  SELECT regexp_replace(t.tok, '[^a-z0-9]', '', 'g') AS word
      |  FROM documents, unnest(string_split_regex(lower(text), '\s+')) AS t(tok)),
      |w AS (SELECT word FROM toks WHERE word <> ''),
      |h AS (
      |  SELECT word,
      |         ((length(word) + CAST(list_sum(list_transform(range(1, length(word)+1),
      |             i -> (length(word)-i+1) * unicode(substr(word, i, 1)))) AS BIGINT)) % 65521) * 65536
      |         + ((1 + CAST(list_sum(list_transform(range(1, length(word)+1),
      |             i -> unicode(substr(word, i, 1)))) AS BIGINT)) % 65521) AS adler
      |  FROM w)
      |SELECT adler % 4 AS bucket, CAST(count(*) AS BIGINT) AS cnt,
      |       CAST(count(DISTINCT word) AS BIGINT) AS words
      |FROM h GROUP BY 1 ORDER BY bucket""".stripMargin

  /** Same wordcount through the MapReduce kernel: map = tokenize
    * (reference map_func), shuffle = hash (adler32 analog), reduce = sum
    * (reference reduce_func). Result must equal [[wordcount]] exactly —
    * the driver checks it against the same oracle. */
  def mrWordcount(spark: SparkSession, documents: DataFrame): DataFrame = {
    val n = spark.sparkContext.defaultParallelism
    // pre-split the scan to the session parallelism — the reference does
    // exactly this outside its engine (data pre-split into data/node*,
    // docker-compose.yml): a single-file corpus otherwise arrives as ONE
    // scan partition and the whole map phase runs on one thread
    // (measured 36.6 s → 6.0 s on a 95 MB single-parquet corpus)
    val text = documents.select("text").rdd
    val split = if (text.getNumPartitions < n) text.repartition(n) else text
    val counts = MRJob.run[Row, String, Long, (String, Long)](
      split,
      numPartitions = n,
      map = (rows, _) =>
        rows.flatMap { r =>
          // Locale.ROOT: the default-locale toLowerCase diverges from
          // Spark's lower() under e.g. tr-TR ('III' → 'ııı', which the
          // scrub then deletes) — breaking the must-equal-wordcount
          // contract on any non-English JVM locale
          Option(r.getString(0)).iterator.flatMap(
            _.toLowerCase(java.util.Locale.ROOT).split("\\s+").iterator
              .map(_.replaceAll("[^a-z0-9]", ""))
              .filter(_.nonEmpty)
              .map(w => (w, 1L)))
        },
      shuffle = MRJob.hashShuffle[String](n),
      reduce = (k, vs) => Iterator((k, vs.sum)),
      // sum is associative+commutative → map-side combine: the shuffle
      // carries |partitions|·|vocab| partials instead of every token
      combine = Some(_ + _))
    spark.createDataFrame(counts).toDF("word", "cnt")
  }
}
