package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet fixture tables (TESTDATA.md).
  *
  * All queries take an `sfDir` (e.g. `/root/testdata/sf0.01`) so the same
  * code runs at every scale factor. At cluster scale these paths would be
  * object-store prefixes; the reader is identical (`spark.read.parquet`),
  * and Catalyst pushes filters/projections into the scan either way.
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  /** The events fixture carries parquet TIMESTAMP(NANOS), which Spark's
    * vectorized reader rejects ([PARQUET_TYPE_ILLEGAL]). Read nanos as
    * long (legacy conf) and convert to a proper timestamp; the fixture's
    * values are whole microseconds so the division is lossless.
    *
    * SIDE EFFECT, by necessity session-wide: the legacy conf cannot be
    * scoped to this one read — Spark re-reads it when the scan is
    * physically planned, which happens after this method returns — so
    * it stays set for the session, and any LATER parquet read of a
    * nanos-timestamp column in the same session will also get a BIGINT
    * instead of the loud [PARQUET_TYPE_ILLEGAL]. Callers embedding graft
    * in a larger application should be aware (or use a separate session
    * for their own reads). */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // ts DIV 1000, NOT ts / 1000: `/` is double division and epoch-nanos
    // (~1.7e18) exceed double's 2^53 exact range — timestamps came out
    // ±1µs off (invisible to windowed aggs, fatal to raw-micros compares)
    load(s, d, "events").withColumn("ts",
      org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts DIV 1000")))
  }
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
