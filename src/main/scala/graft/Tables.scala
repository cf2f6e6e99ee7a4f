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
  /** The events fixture's `ts` encoding has varied across driver
    * generations — parquet TIMESTAMP(NANOS) (which Spark's vectorized
    * reader rejects with [PARQUET_TYPE_ILLEGAL] unless read as long via
    * the legacy conf) and plain TIMESTAMP(MICROS) (which Spark reads as
    * TIMESTAMP_NTZ). Normalize both to a session-zone TIMESTAMP so every
    * downstream query sees one type.
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
    normalizeTs(load(s, d, "events"))
  }

  /** Nanos-as-long → timestamp_micros(ts DIV 1000) (DIV, not `/`:
    * epoch-nanos ~1.7e18 exceed double's 2^53 exact range, so float
    * division came out ±1µs off — invisible to windowed aggs, fatal to
    * raw-micros compares); TIMESTAMP_NTZ → session-zone TIMESTAMP (the
    * session is pinned UTC, so the cast is identity on the instant). */
  def normalizeTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    df.schema("ts").dataType match {
      case LongType => df.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast("timestamp"))
      case _ => df
    }
  }
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
