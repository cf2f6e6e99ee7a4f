package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._

import graft.functions.KmvSketchAgg

/** Deterministic approximate aggregates — the engine's answer to the
  * usual HLL/t-digest sketch tier (reference's offline eval scripts use
  * pandas `nunique`/`quantile`; Spark's stock `approx_count_distinct` /
  * `percentile_approx` are engine-specific, so their results can never
  * be oracle-checked across engines).
  *
  * Instead: (1) distinct counts via a KMV bottom-k sketch over
  * md5-derived hashes ([[graft.functions.KmvSketchAgg]]) — a pure
  * function of the input SET, identical in any engine that can md5; and
  * (2) quantiles as EXACT interpolated percentiles over a deterministic
  * 10% hash sample (sample membership decided by md5 of the row key, so
  * both engines pick the same rows). Both are real sketch/sample
  * semantics with the same shuffle profile as their nondeterministic
  * cousins: the KMV buffer is ≤ k longs per (partition, group) and the
  * sample cuts the sort input 10×.
  */
object Sketches {

  /** 32-bit md5-derived hash of an expression, as SQL (matches the
    * DuckDB `CAST(concat('0x', substr(md5(e),1,8)) AS BIGINT)` idiom) —
    * via the native [[graft.functions.H32Expression]], which skips the
    * md5-hex → substr → conv allocation chain (~25× per value). */
  private def h32sql(e: String): String = s"graft_h32($e)"

  /** Per return-flag: KMV approximate distinct parts, exact median
    * quantity over a deterministic 10% row sample, exact row count. */
  def sketchStats(lineitem: DataFrame, k: Int = 256): DataFrame = {
    graft.functions.GraftFunctions.register(lineitem.sparkSession)
    val kmv = udaf(new KmvSketchAgg(k), Encoders.scalaLong)
    // deliberately NOT widened: the per-row work here is two 32-bit
    // hashes — even fully serialized on one core it is cheaper than the
    // round-robin exchange Widen inserts (measured at sf0.1: the
    // repartition added ~0.3 s and saved nothing). Contrast tableProfile,
    // whose per-row work covers every column and does earn the fan-out.
    lineitem
      .select(col("l_returnflag"), col("l_quantity"),
        expr(h32sql("CAST(l_partkey AS STRING)")).as("h"),
        expr(h32sql(
          "concat(CAST(l_orderkey AS STRING), ':', CAST(l_linenumber AS STRING))"))
          .as("sh"))
      .groupBy(col("l_returnflag"))
      .agg(
        kmv(col("h")).as("approx_parts"),
        expr("percentile(l_quantity, 0.5) FILTER (WHERE pmod(sh, 10) = 0)")
          .as("median_qty"),
        count(lit(1)).as("cnt"))
      .orderBy(col("l_returnflag"))
  }

  /** Bounded-state quantile sketch (q47's scale path): median over the
    * deterministic bottom-k-by-hash row sample
    * ([[graft.functions.BottomKSampleAgg]]). Unlike [[sketchStats]]'s 10%
    * hash sample — whose sort input still grows linearly with the group —
    * the state here is ≤ k (hash, value) pairs per (partition, group)
    * regardless of group size: the classic sketch wire profile, but a
    * pure function of the input multiset, so the DuckDB oracle
    * reproduces it row-for-row (ORDER BY hash, value LIMIT k). */
  def quantileSketch(lineitem: DataFrame, k: Int = 256): DataFrame = {
    // register graft_h32 here too — without this the operator only
    // resolves when some OTHER query already registered it on the shared
    // session (standalone/filtered runs threw UNRESOLVED_ROUTINE). Not
    // widened, for the same measured reason as sketchStats: one hash per
    // row is cheaper than the repartition exchange.
    graft.functions.GraftFunctions.register(lineitem.sparkSession)
    val bks = udaf(new graft.functions.BottomKSampleAgg(k),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Long, Double)]())
    lineitem
      .select(col("l_returnflag"),
        col("l_quantity").cast("double").as("qty"),
        expr(h32sql(
          "concat(CAST(l_orderkey AS STRING), ':', CAST(l_linenumber AS STRING))"))
          .as("sh"))
      .groupBy(col("l_returnflag"))
      .agg(bks(col("sh"), col("qty")).as("qs"), count(lit(1)).as("cnt"))
      .select(col("l_returnflag"),
        expr(
          """CASE WHEN size(qs) % 2 = 1 THEN element_at(qs, CAST((size(qs) + 1) DIV 2 AS INT))
            |     ELSE (element_at(qs, CAST(size(qs) DIV 2 AS INT))
            |           + element_at(qs, CAST(size(qs) DIV 2 + 1 AS INT))) / 2.0D END"""
            .stripMargin).as("median_qty_sketch"),
        expr("CAST(size(qs) AS BIGINT)").as("sampled"),
        col("cnt"))
      .orderBy(col("l_returnflag"))
  }

  val quantileSketchOracle: String = quantileSketchOracleAt(256)

  /** Oracle builder on the SAME k as the engine function — the
    * single-source-of-truth pairing [[graft.operators.Dedup.DefaultThreshold]]
    * uses for banding, applied to the sample size. */
  def quantileSketchOracleAt(k: Int): String =
    s"""WITH hashed AS (
      |  SELECT l_returnflag, CAST(l_quantity AS DOUBLE) AS qty,
      |         CAST(concat('0x', substr(md5(concat(CAST(l_orderkey AS VARCHAR), ':', CAST(l_linenumber AS VARCHAR))), 1, 8)) AS BIGINT) AS sh
      |  FROM lineitem),
      |ranked AS (
      |  SELECT l_returnflag, qty,
      |         row_number() OVER (PARTITION BY l_returnflag ORDER BY sh, qty) AS rn
      |  FROM hashed),
      |samp AS (
      |  SELECT l_returnflag, list(qty ORDER BY qty) AS qs
      |  FROM ranked WHERE rn <= $k GROUP BY 1),
      |cnts AS (
      |  SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS cnt FROM hashed GROUP BY 1)
      |SELECT s.l_returnflag,
      |       CASE WHEN len(qs) % 2 = 1 THEN qs[(len(qs) + 1) // 2]
      |            ELSE (qs[len(qs) // 2] + qs[len(qs) // 2 + 1]) / 2.0 END AS median_qty_sketch,
      |       CAST(len(qs) AS BIGINT) AS sampled,
      |       c.cnt
      |FROM samp s JOIN cnts c USING (l_returnflag)
      |ORDER BY l_returnflag""".stripMargin

  val sketchStatsOracle: String = sketchStatsOracleAt(256)

  /** Oracle builder on the SAME k as the engine function. */
  def sketchStatsOracleAt(k: Int): String =
    s"""WITH hashed AS (
      |  SELECT l_returnflag, l_quantity,
      |         CAST(concat('0x', substr(md5(CAST(l_partkey AS VARCHAR)), 1, 8)) AS BIGINT) AS h,
      |         CAST(concat('0x', substr(md5(concat(CAST(l_orderkey AS VARCHAR), ':', CAST(l_linenumber AS VARCHAR))), 1, 8)) AS BIGINT) AS sh
      |  FROM lineitem),
      |kmv AS (
      |  SELECT l_returnflag, list_sort(list(DISTINCT h)) AS hs
      |  FROM hashed GROUP BY 1),
      |med AS (
      |  SELECT l_returnflag,
      |         quantile_cont(l_quantity, 0.5) FILTER (sh % 10 = 0) AS median_qty,
      |         CAST(COUNT(*) AS BIGINT) AS cnt
      |  FROM hashed GROUP BY 1)
      |SELECT m.l_returnflag,
      |       CASE WHEN len(k.hs) < $k THEN CAST(len(k.hs) AS DOUBLE)
      |            ELSE ${k - 1}.0 * 4294967296.0 / CAST(k.hs[$k] AS DOUBLE) END AS approx_parts,
      |       m.median_qty, m.cnt
      |FROM med m JOIN kmv k USING (l_returnflag)
      |ORDER BY l_returnflag""".stripMargin

  // --------------------------------------------------------------------
  // One-pass table profiler: per-column null counts + KMV approximate
  // distinct over the whole table — the data-quality step a pipeline
  // runs before training. ONE aggregation pass (map-side combined, ≤ k
  // longs of state per column per partition), then a stack() to one row
  // per column; at 100 TB the table is read once and only |cols|·k longs
  // ever cross the shuffle.
  // --------------------------------------------------------------------
  /** Per-column (name, Spark hash-key SQL, DuckDB hash-key SQL) — ONE
    * list drives engine and oracle so the canonical key encoding cannot
    * drift. Doubles are quantized to integer cents (their string forms
    * differ across engines); timestamps formatted explicitly. NULL is
    * coalesced to a sentinel BEFORE hashing (so the distinct count is
    * total and the typed aggregator never sees a null input). */
  val lineitemProfileKeys: Seq[(String, String, String)] = Seq(
    ("l_orderkey", "CAST(l_orderkey AS STRING)", "CAST(l_orderkey AS VARCHAR)"),
    ("l_partkey", "CAST(l_partkey AS STRING)", "CAST(l_partkey AS VARCHAR)"),
    ("l_linenumber", "CAST(l_linenumber AS STRING)", "CAST(l_linenumber AS VARCHAR)"),
    ("l_returnflag", "l_returnflag", "l_returnflag"),
    ("l_quantity",
      "CAST(CAST(round(l_quantity * 100) AS BIGINT) AS STRING)",
      "CAST(CAST(round(l_quantity * 100) AS BIGINT) AS VARCHAR)"),
    ("l_extendedprice",
      "CAST(CAST(round(l_extendedprice * 100) AS BIGINT) AS STRING)",
      "CAST(CAST(round(l_extendedprice * 100) AS BIGINT) AS VARCHAR)"),
    ("l_shipdate",
      "date_format(l_shipdate, 'yyyy-MM-dd HH:mm:ss')",
      "strftime(l_shipdate, '%Y-%m-%d %H:%M:%S')"))

  def tableProfile(table: DataFrame,
                   keys: Seq[(String, String, String)] = lineitemProfileKeys,
                   k: Int = 256): DataFrame = {
    graft.functions.GraftFunctions.register(table.sparkSession)
    val kmv = udaf(new KmvSketchAgg(k), Encoders.scalaLong)
    // UNPIVOT first, aggregate after. The obvious shape — one wide agg
    // with per-column {null-sum, kmv} pairs — generates a 15-function
    // ObjectHashAggregate whose one-time codegen/plan cost ran ~40×
    // longer than the data pass (5.8 s cold vs 0.13 s warm at sf0.1).
    // Inlining (col_name, value) entries feeds ONE kmv instance through
    // one small md5 expression; partial aggregation still collapses
    // every partition to |keys| rows before the single shuffle, so the
    // scale shape is unchanged (map-side CPU identical, shuffle rows
    // |keys| × partitions either way).
    // The md5→h32 hashing must happen INSIDE the codegen'd generate
    // stage, not as an aggregate-input expression: ObjectHashAggregate
    // evaluates its input projection interpreted, and an interpreted
    // md5/conv/substr chain per entry measured ~10× the compiled cost
    // (47.7 s vs ~5 s CPU at sf0.1). Here each entry arrives as a plain
    // (name, null-flag, hash-long) struct and the aggregate touches
    // only primitives. `sk` is null iff its source column is null
    // (casts/formats of the one column), so the null flag is exact.
    val entries = keys.map { case (name, sk, _) =>
      s"named_struct('c', '$name', 'nul', CAST(($name IS NULL) AS BIGINT), " +
        s"'h', ${h32sql(s"coalesce(CAST(($sk) AS STRING), '<NULL>')")})"
    }
    Widen.widen(table)
      .selectExpr(s"inline(array(${entries.mkString(", ")}))")
      .groupBy(col("c").as("col_name"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("nul")).as("n_nulls"),
        kmv(col("h")).as("approx_distinct"))
      .orderBy(col("col_name"))
  }

  val tableProfileOracle: String = tableProfileOracleAt(256)

  /** Oracle builder on the SAME k and key list as the engine function. */
  def tableProfileOracleAt(k: Int): String =
    lineitemProfileKeys.map { case (name, _, dk) =>
      s"""SELECT '$name' AS col_name, CAST(cnt AS BIGINT) AS n_rows,
        |       CAST(nn AS BIGINT) AS n_nulls,
        |       CASE WHEN len(hs) < $k THEN CAST(len(hs) AS DOUBLE)
        |            ELSE ${k - 1}.0 * 4294967296.0 / CAST(hs[$k] AS DOUBLE) END AS approx_distinct
        |FROM (SELECT list_sort(list(DISTINCT CAST(concat('0x', substr(md5(coalesce($dk, '<NULL>')), 1, 8)) AS BIGINT))) AS hs,
        |             COUNT(*) AS cnt,
        |             SUM(CASE WHEN $name IS NULL THEN 1 ELSE 0 END) AS nn
        |      FROM lineitem)""".stripMargin
    }.mkString("", "\nUNION ALL\n", "\nORDER BY col_name")

  // --------------------------------------------------------------------
  // Source-pair Jaccard similarity from bounded KMV sketches — the
  // sketch-tier twin of Dedup.sourceOverlap's exact span matrix: instead
  // of carrying every distinct (source, hash) pair to a self-join, each
  // source is reduced to its k SMALLEST distinct 3-gram hashes (the
  // hashed-shingle contract of the minhash tier, Dedup.hsetUdf), and the
  // standard KMV union estimator runs on the |sources|·k-row table:
  // J(A, B) ≈ |U ∩ A_k ∩ B_k| / |U| where U = the k smallest of
  // A_k ∪ B_k. Deterministic (pure function of the hash sets), so the
  // estimate — not just the true value — is oracle-checkable.
  //
  // Scale shape: shingle hashes collapse to DISTINCT (source, h)
  // map-side; the bottom-k per source is a rank-1..k window the
  // bounded-heap TopKPerKey operator runs in O(k) state per source
  // (install TopKInstall); everything after lives on |S| k-length
  // arrays — the all-pairs stage is |S|²/2 array intersections of
  // k longs, driver-scale work for any |S| that fits a dashboard.
  // --------------------------------------------------------------------
  def sourceJaccardKmv(documents: DataFrame, k: Int = 256): DataFrame = {
    require(k > 0, s"need a positive sketch size, got $k")
    val spans = Widen.widen(documents)
      .select(col("source"), split(lower(col("text")), "\\s+").as("toks"))
      .filter(size(col("toks")) >= 3)
      .select(col("source"), explode(Dedup.hsetUdf(col("toks"))).as("h"))
      .distinct()
    val bottomK = spans
      .withColumn("rn", expr(
        "row_number() OVER (PARTITION BY source ORDER BY h ASC)"))
      .filter(col("rn") <= k)
      .groupBy(col("source"))
      .agg(sort_array(collect_list(col("h"))).as("hs"),
        count(lit(1)).as("n_k"))
    bottomK.as("x").join(bottomK.as("y"),
        col("x.source") < col("y.source"))
      .select(col("x.source").as("src_a"), col("y.source").as("src_b"),
        col("x.n_k").as("a_k"), col("y.n_k").as("b_k"),
        col("x.hs").as("ah"), col("y.hs").as("bh"),
        expr(s"slice(array_sort(array_union(x.hs, y.hs)), 1, $k)").as("u"))
      .select(col("src_a"), col("src_b"), col("a_k"), col("b_k"),
        size(col("u")).cast("long").as("u_k"),
        expr("CAST(size(array_intersect(array_intersect(u, ah), bh)) AS BIGINT)")
          .as("n_both"))
      .select(col("src_a"), col("src_b"), col("a_k"), col("b_k"),
        col("n_both"),
        expr("n_both * 1000L DIV u_k").as("jaccard_pm"))
      .orderBy(col("src_a"), col("src_b"))
  }

  val sourceJaccardKmvOracle: String = sourceJaccardKmvOracleAt(256)

  /** Oracle builder on the SAME k (and 32-bit md5-prefix 3-gram hash)
    * as the engine function. */
  def sourceJaccardKmvOracleAt(k: Int): String =
    s"""WITH toks AS (
      |  SELECT source, string_split_regex(lower(text), '\\s+') AS ts FROM documents),
      |sp AS (
      |  SELECT DISTINCT source,
      |         unnest([CAST(concat('0x', substr(md5(ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2]), 1, 8)) AS BIGINT)
      |                 for i in range(1, len(ts) - 1)]) AS h
      |  FROM toks WHERE len(ts) >= 3),
      |bk AS (
      |  SELECT source, h FROM (
      |    SELECT source, h, row_number() OVER (PARTITION BY source ORDER BY h) AS rn
      |    FROM sp) WHERE rn <= $k),
      |sk AS MATERIALIZED (
      |  SELECT source, list_sort(list(h)) AS hs, CAST(COUNT(*) AS BIGINT) AS n_k
      |  FROM bk GROUP BY source),
      |pairs AS (
      |  SELECT x.source AS src_a, y.source AS src_b, x.n_k AS a_k, y.n_k AS b_k,
      |         list_sort(list_distinct(x.hs || y.hs))[1:$k] AS u,
      |         x.hs AS ah, y.hs AS bh
      |  FROM sk x JOIN sk y ON x.source < y.source)
      |SELECT src_a, src_b, a_k, b_k,
      |       CAST(len(list_filter(u, e -> list_contains(ah, e) AND list_contains(bh, e))) AS BIGINT) AS n_both,
      |       CAST(len(list_filter(u, e -> list_contains(ah, e) AND list_contains(bh, e))) * 1000 // len(u) AS BIGINT) AS jaccard_pm
      |FROM pairs ORDER BY src_a, src_b""".stripMargin
}
