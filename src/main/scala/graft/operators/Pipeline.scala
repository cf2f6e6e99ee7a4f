package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-data curation operators beyond dedup/similarity: PII
  * scrubbing, repetition-based quality filtering, source-mixture
  * sampling, and benchmark-contamination checks (north-star extensions;
  * the reference's nearest analog is the scrub/filter stage of its
  * wordcount task, example_wordcount.py:14–17).
  *
  * Scale design: every operator here is row-local, broadcast-join
  * shaped, or one narrow source-keyed shuffle — nothing shuffles the
  * corpus payload more than once. PII counts and repetition ratios are
  * per-row expressions; mixture sampling is a hash-Bernoulli decision
  * per row aggregated per source; contamination intersects each doc's
  * shingle set against a broadcast benchmark set; packing and quota
  * shuffle only (source, doc_id, token-count) projections. Ratios are
  * integer-exact (ppm via integer division), never float-summed.
  */
object Pipeline {

  // --------------------------------------------------------------------
  // PII scrub: count + redact emails / phone numbers / SSN-shaped ids.
  // Patterns are RE2-safe (same semantics in Java regex and DuckDB).
  // --------------------------------------------------------------------
  private val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val phoneRe = "\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b"
  private val idRe = "\\b\\d{3}-\\d{2}-\\d{4}\\b"

  def piiScrub(documents: DataFrame): DataFrame =
    documents.select(col("doc_id"),
      regexp_count(col("text"), lit(emailRe)).cast("long").as("n_emails"),
      regexp_count(col("text"), lit(phoneRe)).cast("long").as("n_phones"),
      regexp_count(col("text"), lit(idRe)).cast("long").as("n_ids"),
      md5(regexp_replace(
        regexp_replace(
          regexp_replace(col("text"), emailRe, "<EMAIL>"),
          phoneRe, "<PHONE>"),
        idRe, "<ID>")).as("scrubbed_fp"))
      .orderBy(col("doc_id"))

  val piiScrubOracle: String =
    s"""SELECT doc_id,
      |       CAST(len(regexp_extract_all(text, '$emailRe')) AS BIGINT) AS n_emails,
      |       CAST(len(regexp_extract_all(text, '$phoneRe')) AS BIGINT) AS n_phones,
      |       CAST(len(regexp_extract_all(text, '$idRe')) AS BIGINT) AS n_ids,
      |       md5(regexp_replace(regexp_replace(regexp_replace(text,
      |             '$emailRe', '<EMAIL>', 'g'),
      |             '$phoneRe', '<PHONE>', 'g'),
      |             '$idRe', '<ID>', 'g')) AS scrubbed_fp
      |FROM documents ORDER BY doc_id""".stripMargin

  // --------------------------------------------------------------------
  // Repetition-based quality (Gopher-style): duplicate-bigram fraction
  // and most-common-word fraction, entirely row-local (the per-doc
  // word-count scan is O(|distinct|·|words|) inside one row — no
  // doc-word shuffle ever happens). Fractions are exact integer ppm.
  // --------------------------------------------------------------------
  /** (n_words, dup_bigram_ppm, top_word_ppm) in one compiled pass.
    * Integer divisions on nonnegative values == SQL DIV / DuckDB `//`.
    * Replaces interpreted higher-order expressions whose per-element
    * lambda evaluations (O(|distinct|·|words|) per doc) dominated the
    * query: Spark's transform/filter/array_max are CodegenFallback. */
  private val repStatsUdf = udf { toks: Seq[String] =>
    val n = toks.length.toLong
    val bigrams = new java.util.HashSet[String]()
    var i = 0
    while (i + 1 < toks.length) { bigrams.add(toks(i) + " " + toks(i + 1)); i += 1 }
    val counts = new java.util.HashMap[String, Long]()
    var top = 0L
    toks.foreach { w =>
      val c = counts.merge(w, 1L, (a, b) => a + b)
      if (c > top) top = c
    }
    val n2 = n - 1
    ((n, (n2 - bigrams.size) * 1000000L / n2, top * 1000000L / n))
  }

  def repetitionFilter(documents: DataFrame,
                       maxDupBigramPpm: Long = 300000L,
                       maxTopWordPpm: Long = 200000L): DataFrame =
    documents
      .select(col("doc_id"), split(lower(col("text")), "\\s+").as("toks"))
      .filter(size(col("toks")) >= 2)
      .select(col("doc_id"), repStatsUdf(col("toks")).as("s"))
      .select(col("doc_id"),
        col("s._1").as("n_words"),
        col("s._2").as("dup_bigram_ppm"),
        col("s._3").as("top_word_ppm"))
      .withColumn("keep",
        col("dup_bigram_ppm") < maxDupBigramPpm &&
          col("top_word_ppm") < maxTopWordPpm)
      .orderBy(col("doc_id"))

  val repetitionFilterOracle: String = repetitionFilterOracleAt(300000L, 200000L)

  /** Oracle builder on the SAME thresholds as the engine function.
    * Parameters substitute UNAMBIGUOUS placeholder tokens (not numeric
    * literals, which a threshold value or future edit could collide
    * with and silently corrupt the SQL). */
  def repetitionFilterOracleAt(maxDupBigramPpm: Long,
                               maxTopWordPpm: Long): String =
    repetitionFilterOracleBody
      .replace("__MAX_DUP_BIGRAM_PPM__", s"$maxDupBigramPpm")
      .replace("__MAX_TOP_WORD_PPM__", s"$maxTopWordPpm")

  private lazy val repetitionFilterOracleBody: String =
    """WITH toks AS (
      |  SELECT doc_id, string_split_regex(lower(text), '\s+') AS ts FROM documents),
      |stats AS (
      |  SELECT doc_id,
      |         CAST(len(ts) AS BIGINT) AS n_words,
      |         CAST((len(ts) - 1
      |               - len(list_distinct([ts[i] || ' ' || ts[i+1]
      |                                    for i in range(1, len(ts))]))) * 1000000
      |              // (len(ts) - 1) AS BIGINT) AS dup_bigram_ppm,
      |         CAST(list_max(list_transform(list_distinct(ts),
      |                w -> len(list_filter(ts, t -> t = w)))) * 1000000
      |              // len(ts) AS BIGINT) AS top_word_ppm
      |  FROM toks WHERE len(ts) >= 2)
      |SELECT doc_id, n_words, dup_bigram_ppm, top_word_ppm,
      |       dup_bigram_ppm < __MAX_DUP_BIGRAM_PPM__ AND top_word_ppm < __MAX_TOP_WORD_PPM__ AS keep
      |FROM stats ORDER BY doc_id""".stripMargin

  // --------------------------------------------------------------------
  // Source-mixture sampling: per-source target keep-rates (derived
  // deterministically from the source name), applied as hash-Bernoulli
  // per doc — the "downweight the crawl, keep the books" stage of a
  // pretraining mix. Same rows selected on any cluster and in the
  // oracle; no rand() anywhere.
  // --------------------------------------------------------------------
  def sourceMixture(documents: DataFrame): DataFrame =
    documents
      .select(col("source"),
        (expr("CAST(conv(substr(md5(source), 1, 8), 16, 10) AS BIGINT)") % 60 + 10)
          .as("rate_pct"),
        (expr("CAST(conv(substr(md5(concat(source, ':', CAST(doc_id AS STRING))), 1, 8), 16, 10) AS BIGINT)")
          % 100).as("roll"))
      .groupBy(col("source"), col("rate_pct"))
      .agg(count(lit(1)).as("total"),
        sum(when(col("roll") < col("rate_pct"), 1L).otherwise(0L)).as("kept"))
      .orderBy(col("source"))

  val sourceMixtureOracle: String =
    """WITH rolls AS (
      |  SELECT source,
      |         CAST(concat('0x', substr(md5(source), 1, 8)) AS BIGINT) % 60 + 10 AS rate_pct,
      |         CAST(concat('0x', substr(md5(concat(source, ':', CAST(doc_id AS VARCHAR))), 1, 8)) AS BIGINT) % 100 AS roll
      |  FROM documents)
      |SELECT source, rate_pct,
      |       CAST(COUNT(*) AS BIGINT) AS total,
      |       CAST(SUM(CASE WHEN roll < rate_pct THEN 1 ELSE 0 END) AS BIGINT) AS kept
      |FROM rolls GROUP BY 1, 2 ORDER BY source""".stripMargin

  // --------------------------------------------------------------------
  // Benchmark-contamination check: fraction of each corpus doc's shingles
  // that appear in a (small) benchmark set. The benchmark side collapses
  // to ONE distinct-shingle array and broadcasts; the corpus side is a
  // row-local sorted-intersect against it — at 100 TB nothing shuffles
  // but the benchmark array. Docs with ≥50% shingle overlap are flagged.
  // --------------------------------------------------------------------
  /** @param broadcastBench benchmark suites are small BY DEFINITION, so
    *   the default collapses them to one sorted array and broadcasts it —
    *   with an in-plan guard that raises a loud error past
    *   `maxBenchShingles` (instead of silently hitting the 2 GB
    *   single-row limit). For a pathological "benchmark" bigger than
    *   that, pass false: the join fallback shuffles exploded corpus
    *   shingles against the benchmark shingle TABLE (no single-row
    *   collapse anywhere) and aggregates overlap counts per doc. */
  def contamination(documents: DataFrame, benchMod: Int = 50,
                    flagPpm: Long = 500000L,
                    broadcastBench: Boolean = true,
                    maxBenchShingles: Long = 8000000L): DataFrame = {
    graft.functions.GraftFunctions.register(documents.sparkSession)
    val sh = documents
      .select(col("doc_id"), split(lower(col("text")), "\\s+").as("toks"))
      .filter(size(col("toks")) >= 3)
      .select(col("doc_id"), Dedup.hsetUdf(col("toks")).as("hset"))
    val corpus = sh.filter(col("doc_id") % benchMod =!= 0)
    val scored =
      if (broadcastBench) {
        val benchArr = sh.filter(col("doc_id") % benchMod === 0)
          .select(explode(col("hset")).as("h")).distinct()
          .agg(sort_array(collect_list(col("h"))).as("bset"))
          .select(expr(Guards.guardedSql("size(bset)", maxBenchShingles,
            "benchmark shingle set", "bset", "ARRAY<BIGINT>",
            "call contamination with broadcastBench = false")).as("bset"))
        corpus
          .crossJoin(broadcast(benchArr))
          .select(col("doc_id"),
            size(col("hset")).cast("long").as("n_shingles"),
            expr("CAST(graft_sorted_intersect_size(hset, bset) AS BIGINT)").as("n_overlap"))
      } else {
        val bench = sh.filter(col("doc_id") % benchMod === 0)
          .select(explode(col("hset")).as("h")).distinct()
        val overlaps = corpus
          .select(col("doc_id"), explode(col("hset")).as("h"))
          .join(bench, "h")
          .groupBy(col("doc_id")).agg(count(lit(1)).as("n_overlap"))
        corpus.select(col("doc_id"), size(col("hset")).cast("long").as("n_shingles"))
          .join(overlaps, Seq("doc_id"), "left")
          .select(col("doc_id"), col("n_shingles"),
            coalesce(col("n_overlap"), lit(0L)).as("n_overlap"))
      }
    scored
      .withColumn("overlap_ppm",
        expr("CAST(n_overlap * 1000000L DIV n_shingles AS BIGINT)"))
      .withColumn("contaminated", col("overlap_ppm") >= flagPpm)
      .orderBy(col("doc_id"))
  }

  val contaminationOracle: String = contaminationOracleAt(50, 500000L)

  /** Oracle builder on the SAME benchMod/flagPpm as the engine function.
    * Placeholder-token substitution — see [[repetitionFilterOracleAt]]. */
  def contaminationOracleAt(benchMod: Int, flagPpm: Long): String =
    contaminationOracleBody
      .replace("__BENCH_MOD__", s"$benchMod")
      .replace("__FLAG_PPM__", s"$flagPpm")

  private lazy val contaminationOracleBody: String =
    """WITH toks AS (
      |  SELECT doc_id, string_split_regex(lower(text), '\s+') AS ts FROM documents),
      |sh AS (
      |  SELECT doc_id,
      |         list_distinct([CAST(concat('0x', substr(md5(ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2]), 1, 8)) AS BIGINT)
      |                        for i in range(1, len(ts)-1)]) AS hset
      |  FROM toks WHERE len(ts) >= 3),
      |bench AS (
      |  SELECT DISTINCT t.h FROM sh, unnest(hset) AS t(h) WHERE doc_id % __BENCH_MOD__ = 0),
      |ex AS (
      |  SELECT doc_id, t.h FROM sh, unnest(hset) AS t(h) WHERE doc_id % __BENCH_MOD__ <> 0),
      |ov AS (
      |  SELECT ex.doc_id, count(*) AS c FROM ex JOIN bench ON ex.h = bench.h
      |  GROUP BY ex.doc_id),
      |scored AS (
      |  SELECT sh.doc_id,
      |         CAST(len(sh.hset) AS BIGINT) AS n_shingles,
      |         CAST(coalesce(ov.c, 0) AS BIGINT) AS n_overlap
      |  FROM sh LEFT JOIN ov ON sh.doc_id = ov.doc_id
      |  WHERE sh.doc_id % __BENCH_MOD__ <> 0)
      |SELECT doc_id, n_shingles, n_overlap,
      |       CAST(n_overlap * 1000000 // n_shingles AS BIGINT) AS overlap_ppm,
      |       n_overlap * 1000000 // n_shingles >= __FLAG_PPM__ AS contaminated
      |FROM scored ORDER BY doc_id""".stripMargin

  // --------------------------------------------------------------------
  // Sequence packing (concat-and-chunk): pretraining packs each source's
  // token stream in a deterministic document order and cuts it every
  // `budget` tokens. Report the packing layout per source — bins
  // produced, boundary straddlers, fill density — all exact integers.
  //
  // Scale: the global cumsum is computed as a (source, shard) TWO-PASS —
  // a hot source must never serialize into one task. Shards are
  // CONTIGUOUS doc_id ranges (`doc_id DIV shardDocs` is monotone in the
  // packing order), so pass 1's per-shard local cumsum plus pass 2's
  // exclusive per-shard token offset IS the exact per-source running
  // total: cum(doc) = lcum(doc within shard) + Σ tok(earlier shards).
  // Pass 2 runs on the |sources|·|shards| aggregate (bytes per 64k docs,
  // never the docs), and the offset join is keyed (source, shard) — the
  // same partitioning pass 1 just shuffled to, with AQE free to
  // broadcast the tiny offsets side. Bin boundaries are bit-identical to
  // the single-window form for ANY shardDocs by construction.
  // --------------------------------------------------------------------
  def tokenPacking(documents: DataFrame, budget: Long = 4096L,
                   shardDocs: Long = 65536L): DataFrame = {
    // ONE explicit (source, shard) shuffle that pass 1's window, pass 2's
    // aggregate, and the offset join all consume: each requires exactly
    // this clustering, so Catalyst inserts no further exchange and
    // ReuseExchange collapses the two branches onto a single scan.
    val parted = documents
      .select(col("source"), col("doc_id"),
        expr(s"doc_id DIV ${shardDocs}L").as("shard"),
        size(split(trim(lower(col("text"))), "\\s+")).cast("long").as("tok"))
      .repartition(col("source"), col("shard"))
    // pass 1: local running total inside each contiguous shard
    val wLocal = Window.partitionBy(col("source"), col("shard"))
      .orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // pass 2: exclusive prefix of shard totals — a per-source window over
    // |shards| rows, not |docs|
    val wShards = Window.partitionBy(col("source")).orderBy(col("shard"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val local = parted.withColumn("lcum", sum(col("tok")).over(wLocal))
    // Shard totals come from max(lcum) of the SAME windowed plan — not a
    // separate sum over the scan — so both join branches share one
    // canonical Exchange(Project(scan)) subtree and ReuseExchange keeps
    // the corpus to a single scan + single shuffle (the offsets branch
    // re-reads the shuffle output, never the source). The aggregate then
    // runs exchange-free on the clustering it inherits.
    val offsets = local.groupBy(col("source"), col("shard"))
      .agg(max(col("lcum")).as("shard_tok"))
      .select(col("source"), col("shard"),
        coalesce(sum(col("shard_tok")).over(wShards), lit(0L)).as("off"))
    // null-safe join keys: plain equi-keys would infer IsNotNull filters
    // into ONE branch's scan, de-canonicalizing the two identical
    // repartition exchanges and silently doubling the corpus scan; `<=>`
    // infers nothing (keys are never null here) and keeps ReuseExchange
    // eligible. Pinned by the hot-source spec.
    local.as("l")
      .join(offsets.as("r"),
        col("l.source") <=> col("r.source") && col("l.shard") <=> col("r.shard"))
      .select(col("l.source").as("source"), col("l.tok").as("tok"),
        (col("l.lcum") + col("r.off")).as("cum"))
      // a doc occupies token offsets [cum-tok, cum): its first and last
      // bins are exact integer divisions of those offsets
      .select(col("source"), col("tok"),
        expr(s"(cum - tok) DIV ${budget}L").as("start_bin"),
        expr(s"(cum - 1) DIV ${budget}L").as("end_bin"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("tok")).as("total_tokens"),
        expr(s"(sum(tok) + ${budget - 1}L) DIV ${budget}L").as("n_bins"),
        sum(when(col("start_bin") =!= col("end_bin"), 1L).otherwise(0L))
          .as("n_straddlers"),
        expr(s"(count(1) * 1000L) DIV ((sum(tok) + ${budget - 1}L) DIV ${budget}L)")
          .as("docs_per_bin_x1000"))
      .orderBy(col("source"))
  }

  val tokenPackingOracle: String = tokenPackingOracleAt(4096L)

  /** Oracle builder on the SAME budget as the engine function. */
  def tokenPackingOracleAt(budget: Long): String =
    s"""WITH toks AS (
      |  SELECT source, doc_id,
      |         CAST(len(string_split_regex(trim(lower(text)), '\\s+')) AS BIGINT) AS tok
      |  FROM documents),
      |packed AS (
      |  SELECT source, tok,
      |         SUM(tok) OVER (PARTITION BY source ORDER BY doc_id
      |                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      |  FROM toks),
      |bins AS (
      |  SELECT source, tok,
      |         (cum - tok) // $budget AS start_bin,
      |         (cum - 1) // $budget AS end_bin
      |  FROM packed)
      |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |       CAST(SUM(tok) AS BIGINT) AS total_tokens,
      |       CAST((SUM(tok) + ${budget - 1}) // $budget AS BIGINT) AS n_bins,
      |       CAST(SUM(CASE WHEN start_bin <> end_bin THEN 1 ELSE 0 END) AS BIGINT) AS n_straddlers,
      |       CAST((COUNT(*) * 1000) // ((SUM(tok) + ${budget - 1}) // $budget) AS BIGINT) AS docs_per_bin_x1000
      |FROM bins GROUP BY source ORDER BY source""".stripMargin

  // --------------------------------------------------------------------
  // Per-source document quota: keep at most k docs per source, priority
  // = md5(doc_id) — a deterministic "random" draw both engines agree on.
  // This is the hard per-domain CAP of web-corpus curation ([[
  // sourceMixture]] is the complementary soft fractional sampler); the
  // keep set is a pure function of the input multiset, never of arrival
  // order. Scale: with [[graft.plans.TopKInstall]] the row_number<=k
  // window runs on the bounded-heap operator — at most |sources|·k rows
  // cross the shuffle and nothing ever sorts a whole source.
  // --------------------------------------------------------------------
  def domainQuota(documents: DataFrame, k: Int = 20): DataFrame = {
    val w = Window.partitionBy(col("source"))
      .orderBy(col("pri").asc, col("doc_id").asc)
    documents
      .select(col("source"), col("doc_id"),
        expr("CAST(conv(substr(md5(CAST(doc_id AS STRING)), 1, 8), 16, 10) AS BIGINT)")
          .as("pri"),
        size(split(trim(lower(col("text"))), "\\s+")).cast("long").as("tok"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("source"), col("rk"), col("doc_id"), col("tok"))
  }

  // --------------------------------------------------------------------
  // Snapshot delta: the incremental-recrawl update step — diff two
  // corpus snapshots into added / removed / changed / unchanged.
  // Snapshots are deterministic views of the fixture corpus (yesterday
  // misses doc_id%7==0, today misses doc_id%5==0, and doc_id%11==0 was
  // re-crawled with different content), so both engines derive the same
  // pair. Scale: ONLY md5 fingerprints join (16 bytes/doc,
  // co-partitioned full outer on doc_id) — document payloads never
  // shuffle, and the diff of a 100 TB recrawl moves gigabytes, not
  // terabytes.
  // --------------------------------------------------------------------
  def snapshotDelta(documents: DataFrame): DataFrame = {
    val yesterday = documents.filter(col("doc_id") % 7 =!= 0)
      .select(col("doc_id"), md5(col("text")).as("fp_old"))
    val today = documents.filter(col("doc_id") % 5 =!= 0)
      .select(col("doc_id"),
        md5(when(col("doc_id") % 11 === 0, concat(col("text"), lit(" v2")))
          .otherwise(col("text"))).as("fp_new"))
    yesterday.join(today, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        when(col("fp_old").isNull, "added")
          .when(col("fp_new").isNull, "removed")
          .when(col("fp_old") =!= col("fp_new"), "changed")
          .otherwise("unchanged").as("status"))
      .groupBy(col("status"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("doc_id")).as("min_doc"), max(col("doc_id")).as("max_doc"))
      .orderBy(col("status"))
  }

  val snapshotDeltaOracle: String =
    """WITH yesterday AS (
      |  SELECT doc_id, md5(text) AS fp_old FROM documents WHERE doc_id % 7 <> 0),
      |today AS (
      |  SELECT doc_id,
      |         md5(CASE WHEN doc_id % 11 = 0 THEN text || ' v2' ELSE text END) AS fp_new
      |  FROM documents WHERE doc_id % 5 <> 0),
      |delta AS (
      |  SELECT COALESCE(y.doc_id, t.doc_id) AS doc_id,
      |         CASE WHEN y.fp_old IS NULL THEN 'added'
      |              WHEN t.fp_new IS NULL THEN 'removed'
      |              WHEN y.fp_old <> t.fp_new THEN 'changed'
      |              ELSE 'unchanged' END AS status
      |  FROM yesterday y FULL OUTER JOIN today t ON y.doc_id = t.doc_id)
      |SELECT status, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |       MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc
      |FROM delta GROUP BY status ORDER BY status""".stripMargin

  // --------------------------------------------------------------------
  // Training-shard balance audit: assign every document to one of S
  // output shards by the md5(doc_id) bucket (the q73 assignment shape at
  // shard granularity — content-independent, stable under recrawls) and
  // report per-shard doc/token mass plus fill vs the ideal S-way split
  // in exact basis points. Hash sharding balances DOC counts by
  // construction; token totals still skew with document length — this
  // is the manifest check a pretraining run does before writing shards.
  //
  // Scale shape: row-local assignment + one |S|-row aggregate (map-side
  // combined); the fill ratio is a window over |S| rows. Mass arithmetic
  // in DECIMAL(38,0) ↔ HUGEINT: tokens × S × 10⁴ overflows a 64-bit long
  // at real corpus sizes.
  // --------------------------------------------------------------------
  def shardBalance(documents: DataFrame, shards: Int = 32): DataFrame = {
    require(shards > 0, s"need a positive shard count, got $shards")
    documents
      .select(
        (expr("CAST(conv(substr(md5(CAST(doc_id AS STRING)), 1, 8), 16, 10) AS BIGINT)")
          % shards).cast("int").as("shard"),
        size(split(trim(lower(col("text"))), "\\s+")).cast("long").as("tok"))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"), sum(col("tok")).as("n_tokens"))
      .withColumn("fill_bp", expr(Guards.boundedWindowSql(shards.toLong,
        "shardBalance per-shard aggregate",
        s"""CAST((CAST(n_tokens AS DECIMAL(38,0)) * ${shards}L * 10000L)
           | DIV SUM(n_tokens) OVER () AS BIGINT)""".stripMargin, "BIGINT")))
      .orderBy(col("shard"))
  }

  val shardBalanceOracle: String = shardBalanceOracleAt(32)

  /** Oracle builder on the SAME shard count as the engine function. */
  def shardBalanceOracleAt(shards: Int): String =
    s"""WITH assigned AS (
      |  SELECT CAST(CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % $shards AS INT) AS shard,
      |         CAST(len(string_split_regex(trim(lower(text)), '\\s+')) AS BIGINT) AS tok
      |  FROM documents),
      |per AS (
      |  SELECT shard, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |         CAST(SUM(tok) AS BIGINT) AS n_tokens
      |  FROM assigned GROUP BY 1)
      |SELECT shard, n_docs, n_tokens,
      |       CAST(n_tokens * $shards * 10000 // SUM(n_tokens) OVER () AS BIGINT) AS fill_bp
      |FROM per ORDER BY shard""".stripMargin

  // --------------------------------------------------------------------
  // Snapshot CONTENT novelty — q65 diffs snapshots at doc granularity;
  // this answers the question a recrawl budget actually turns on: how
  // much genuinely NEW text did the new crawl bring, per source? Novelty
  // = distinct 3-token shingles present today but absent yesterday (a
  // re-serialized page with identical text contributes zero), using the
  // dedup tier's 32-bit hashed shingle representation and the SAME
  // deterministic snapshot derivation as [[snapshotDelta]].
  //
  // Scale shape: the exploded shingle stream collapses map-side behind
  // (source, h) with max-flags BEFORE any shuffle (the wordcount shape —
  // only distinct (source, h, flags) triples cross the wire); the
  // rollup is |sources| rows. Two snapshot scans of one corpus, no
  // joins, no pairwise work.
  // --------------------------------------------------------------------
  /** Per-source gram counts: n_today (distinct grams today), n_new
    * (unseen yesterday), n_retired (gone today), novelty in basis
    * points — integer-only output. */
  def snapshotNovelty(documents: DataFrame): DataFrame = {
    val docs = Widen.widen(documents)
      .select(col("doc_id"), col("source"), col("text"))
    val yesterday = docs.filter(col("doc_id") % 7 =!= 0)
      .select(col("source"), split(lower(col("text")), "\\s+").as("toks"),
        lit(1).as("o"), lit(0).as("n"))
    val today = docs.filter(col("doc_id") % 5 =!= 0)
      .select(col("source"),
        split(lower(when(col("doc_id") % 11 === 0,
          concat(col("text"), lit(" v2"))).otherwise(col("text"))),
          "\\s+").as("toks"),
        lit(0).as("o"), lit(1).as("n"))
    yesterday.union(today)
      .select(col("source"), explode(Dedup.hsetUdf(col("toks"))).as("h"),
        col("o"), col("n"))
      .groupBy(col("source"), col("h"))
      .agg(max(col("o")).as("o"), max(col("n")).as("n"))
      .groupBy(col("source"))
      .agg(sum(col("n")).as("n_today"),
        sum(when(col("n") === 1 && col("o") === 0, 1L).otherwise(0L)).as("n_new"),
        sum(when(col("o") === 1 && col("n") === 0, 1L).otherwise(0L)).as("n_retired"))
      .select(col("source"), col("n_today"), col("n_new"), col("n_retired"),
        // a source can vanish from today's crawl entirely (n_today = 0,
        // e.g. every surviving doc under 3 tokens) — novelty of an empty
        // crawl is 0, not a division error
        expr("CAST(CASE WHEN n_today = 0 THEN 0 ELSE n_new * 10000L DIV n_today END AS BIGINT)")
          .as("novelty_bp"))
      .orderBy(col("source"))
  }

  val snapshotNoveltyOracle: String = {
    val gram = "CAST(concat('0x', substr(md5(ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2]), 1, 8)) AS BIGINT)"
    s"""WITH yesterday AS (
      |  SELECT source, string_split_regex(lower(text), '\\s+') AS ts
      |  FROM documents WHERE doc_id % 7 <> 0),
      |today AS (
      |  SELECT source,
      |         string_split_regex(lower(CASE WHEN doc_id % 11 = 0 THEN text || ' v2' ELSE text END), '\\s+') AS ts
      |  FROM documents WHERE doc_id % 5 <> 0),
      |grams AS (
      |  SELECT source, h, MAX(o) AS o, MAX(n) AS n FROM (
      |    SELECT source, unnest(list_distinct([$gram for i in range(1, len(ts) - 1)])) AS h,
      |           1 AS o, 0 AS n
      |    FROM yesterday WHERE len(ts) >= 3
      |    UNION ALL
      |    SELECT source, unnest(list_distinct([$gram for i in range(1, len(ts) - 1)])) AS h,
      |           0 AS o, 1 AS n
      |    FROM today WHERE len(ts) >= 3)
      |  GROUP BY 1, 2)
      |SELECT source,
      |       CAST(SUM(n) AS BIGINT) AS n_today,
      |       CAST(SUM(CASE WHEN n = 1 AND o = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_new,
      |       CAST(SUM(CASE WHEN o = 1 AND n = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_retired,
      |       CAST(CASE WHEN SUM(n) = 0 THEN 0
      |            ELSE SUM(CASE WHEN n = 1 AND o = 0 THEN 1 ELSE 0 END) * 10000 // SUM(n) END AS BIGINT) AS novelty_bp
      |FROM grams GROUP BY source ORDER BY source""".stripMargin
  }

  // --------------------------------------------------------------------
  // End-to-end curation FUNNEL: the whole tier composed into one query —
  // per source, how many docs enter, pass repetition-quality, survive
  // near-dup dedup (component keeper), and make the per-source quota,
  // plus the final token budget. This is the shape a real pretraining
  // ingest runs nightly; it exists to prove the operators COMPOSE in one
  // plan, not just pass in isolation.
  //
  // Stage semantics (each evaluated on the full corpus, quota on the
  // survivor set): quality = the q51 thresholds applied to the TRIMMED
  // tokenization (q62/q63's token convention, so tok counts and quality
  // flags share one split; q51 itself tokenizes untrimmed — a doc with
  // leading/trailing whitespace can flag differently there, by design);
  // dedup keep = the q61 keeper decision (component min doc_id — shares
  // the session-memoized minhash pairs/labels stages with q25/q59/q61);
  // quota = q63's md5-priority cap among quality∧keeper survivors.
  //
  // Scale shape: ONE corpus scan → row-local quality flags → one narrow
  // left join against the (small, persisted) component labels → ONE
  // per-source aggregation computing stage counts AND the quota in the
  // same pass: [[graft.functions.QuotaTopKAgg]] keeps the k first rows
  // in (surv DESC, pri, doc_id) order — survivors sort first, so the
  // kept set is exactly min(k, |survivors|) survivors — as a ≤ k-row
  // buffer per (partition, source). The partial/final aggregation ships
  // only counts + bounded buffers (|sources|·k rows per partition), so
  // no window, no per-source sort, and no second corpus scan exist
  // anywhere in the plan; a hot source costs what any source costs.
  // (A window/TopK two-branch form was measured and rejected: per-branch
  // column pruning de-canonicalizes the shared exchange, doubling the
  // scan — fusing the quota into the aggregate is both the smaller plan
  // and the smaller shuffle.)
  // --------------------------------------------------------------------
  def curationFunnel(documents: DataFrame, k: Int = 20,
                     threshold: Double = Dedup.DefaultThreshold,
                     maxDupBigramPpm: Long = 300000L,
                     maxTopWordPpm: Long = 200000L,
                     maxIters: Int = 25): DataFrame = {
    val labels = Dedup.componentLabels(documents, threshold, maxIters)
    val flagged = documents
      .select(col("source"), col("doc_id"),
        split(trim(lower(col("text"))), "\\s+").as("toks"))
      .select(col("source"), col("doc_id"),
        size(col("toks")).cast("long").as("tok"),
        when(size(col("toks")) >= 2, repStatsUdf(col("toks"))).as("s"))
      .join(labels, col("doc_id") === col("v"), "left")
      .select(col("source"), col("doc_id"), col("tok"),
        (col("s").isNotNull &&
          col("s._2") < maxDupBigramPpm &&
          col("s._3") < maxTopWordPpm).as("qual"),
        expr("CAST(conv(substr(md5(CAST(doc_id AS STRING)), 1, 8), 16, 10) AS BIGINT)")
          .as("pri"),
        (coalesce(col("lbl"), col("doc_id")) === col("doc_id")).as("keep"))
      .withColumn("surv", col("qual") && col("keep"))
    val fk = udaf(new graft.functions.QuotaTopKAgg(k))
    flagged.groupBy(col("source"))
      .agg(count(lit(1)).as("n_total"),
        sum(when(col("qual"), 1L).otherwise(0L)).as("n_quality"),
        sum(when(col("surv"), 1L).otherwise(0L)).as("n_unique"),
        fk(col("surv"), col("pri"), col("doc_id"), col("tok")).as("fin"))
      .select(col("source"), col("n_total"), col("n_quality"), col("n_unique"),
        col("fin._1").as("n_final"), col("fin._2").as("tok_final"))
      .orderBy(col("source"))
  }

  val curationFunnelOracle: String = curationFunnelOracleAt(20, Dedup.DefaultThreshold)

  /** Oracle builder on the SAME k/threshold as the engine function. */
  def curationFunnelOracleAt(k: Int, threshold: Double): String =
    s"""WITH RECURSIVE ${Dedup.oracleMinhashPairsCtes(threshold)},
      |edges AS MATERIALIZED (
      |  SELECT a, b FROM mp UNION ALL SELECT b AS a, a AS b FROM mp),
      |reach(v, w) AS (
      |  SELECT DISTINCT a AS v, a AS w FROM edges
      |  UNION
      |  SELECT r.v, e.b AS w FROM reach r JOIN edges e ON e.a = r.w),
      |comp AS (
      |  SELECT v, MIN(w) AS component FROM reach GROUP BY v),
      |ftoks AS (
      |  SELECT source, doc_id,
      |         string_split_regex(trim(lower(text)), '\\s+') AS ts
      |  FROM documents),
      |flags AS (
      |  SELECT source, doc_id, CAST(len(ts) AS BIGINT) AS tok,
      |         COALESCE(len(ts) >= 2
      |           AND (len(ts) - 1
      |                - len(list_distinct([ts[i] || ' ' || ts[i+1]
      |                                     for i in range(1, len(ts))]))) * 1000000
      |               // NULLIF(len(ts) - 1, 0) < 300000
      |           AND list_max(list_transform(list_distinct(ts),
      |                 w -> len(list_filter(ts, t -> t = w)))) * 1000000
      |               // len(ts) < 200000, FALSE) AS qual
      |  FROM ftoks),
      |kf AS (
      |  SELECT f.source, f.doc_id, f.tok, f.qual,
      |         f.qual AND COALESCE(c.component, f.doc_id) = f.doc_id AS surv
      |  FROM flags f LEFT JOIN comp c ON c.v = f.doc_id),
      |ranked AS (
      |  SELECT source, tok, qual, surv,
      |         ROW_NUMBER() OVER (PARTITION BY source ORDER BY surv DESC,
      |           CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT),
      |           doc_id) AS rk
      |  FROM kf),
      |fin AS (
      |  SELECT source,
      |         CAST(SUM(CASE WHEN surv THEN 1 ELSE 0 END) AS BIGINT) AS n_final,
      |         CAST(SUM(CASE WHEN surv THEN tok ELSE 0 END) AS BIGINT) AS tok_final
      |  FROM ranked WHERE rk <= $k GROUP BY source),
      |stages AS (
      |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_total,
      |         CAST(SUM(CASE WHEN qual THEN 1 ELSE 0 END) AS BIGINT) AS n_quality,
      |         CAST(SUM(CASE WHEN surv THEN 1 ELSE 0 END) AS BIGINT) AS n_unique
      |  FROM kf GROUP BY source)
      |SELECT s.source, s.n_total, s.n_quality, s.n_unique,
      |       CAST(COALESCE(f.n_final, 0) AS BIGINT) AS n_final,
      |       CAST(COALESCE(f.tok_final, 0) AS BIGINT) AS tok_final
      |FROM stages s LEFT JOIN fin f ON f.source = s.source
      |ORDER BY s.source""".stripMargin

  // --------------------------------------------------------------------
  // Context-window chunk layout: the sliding-window split every LM
  // pipeline sizes before training — each doc's token stream cut into
  // windows of `maxLen` advancing by `stride` (overlap = maxLen −
  // stride), the final window padded to maxLen. Reports, per source, the
  // exact chunk/overlap/padding economics of those (maxLen, stride)
  // choices: chunks emitted, tokens emitted after overlap duplication,
  // and pad waste. Complements q62's concat-and-chunk packing (the
  // alternative layout that trades doc boundaries for zero padding).
  //
  // Entirely row-local closed-form integer arithmetic — n_chunks =
  // 1 + ceil(max(0, n−maxLen)/stride), emitted = n + (n_chunks−1)·
  // (maxLen−stride), pad = maxLen − (n − (n_chunks−1)·stride) — then
  // one partial-aggregated per-source rollup: no shuffle carries more
  // than |sources| rows. Scale cost is the corpus scan, nothing else.
  // --------------------------------------------------------------------
  def chunkLayout(documents: DataFrame, maxLen: Long = 512L,
                  stride: Long = 384L): DataFrame = {
    require(stride >= 1 && stride <= maxLen,
      s"chunkLayout needs 1 <= stride <= maxLen, got stride=$stride maxLen=$maxLen")
    documents
      .select(col("source"),
        size(split(trim(lower(col("text"))), "\\s+")).cast("long").as("n"))
      .select(col("source"), col("n"),
        expr(s"1L + (greatest(0L, n - ${maxLen}L) + ${stride - 1}L) DIV ${stride}L")
          .as("n_chunks"))
      .select(col("source"), col("n"), col("n_chunks"),
        (col("n") + (col("n_chunks") - 1L) * lit(maxLen - stride)).as("emitted"),
        (lit(maxLen) - (col("n") - (col("n_chunks") - 1L) * lit(stride))).as("pad"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("docs"),
        sum(col("n")).as("total_tokens"),
        sum(col("n_chunks")).as("total_chunks"),
        sum(col("emitted")).as("emitted_tokens"),
        sum(col("pad")).as("pad_tokens"))
      .orderBy(col("source"))
  }

  val chunkLayoutOracle: String = chunkLayoutOracleAt(512L, 384L)

  /** Oracle builder on the SAME (maxLen, stride) as the engine function. */
  def chunkLayoutOracleAt(maxLen: Long, stride: Long): String =
    s"""WITH toks AS (
      |  SELECT source,
      |         CAST(len(string_split_regex(trim(lower(text)), '\\s+')) AS BIGINT) AS n
      |  FROM documents),
      |chunks AS (
      |  SELECT source, n,
      |         1 + (greatest(0, n - $maxLen) + ${stride - 1}) // $stride AS n_chunks
      |  FROM toks),
      |layout AS (
      |  SELECT source, n, n_chunks,
      |         n + (n_chunks - 1) * ${maxLen - stride} AS emitted,
      |         $maxLen - (n - (n_chunks - 1) * $stride) AS pad
      |  FROM chunks)
      |SELECT source, CAST(COUNT(*) AS BIGINT) AS docs,
      |       CAST(SUM(n) AS BIGINT) AS total_tokens,
      |       CAST(SUM(n_chunks) AS BIGINT) AS total_chunks,
      |       CAST(SUM(emitted) AS BIGINT) AS emitted_tokens,
      |       CAST(SUM(pad) AS BIGINT) AS pad_tokens
      |FROM layout GROUP BY source ORDER BY source""".stripMargin

  val domainQuotaOracle: String = domainQuotaOracleAt(20)

  /** Oracle builder on the SAME k as the engine function. */
  def domainQuotaOracleAt(k: Int): String =
    s"""WITH pri AS (
      |  SELECT source, doc_id,
      |         CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) AS pri,
      |         CAST(len(string_split_regex(trim(lower(text)), '\\s+')) AS BIGINT) AS tok
      |  FROM documents),
      |ranked AS (
      |  SELECT source, doc_id, tok,
      |         CAST(ROW_NUMBER() OVER (PARTITION BY source ORDER BY pri, doc_id) AS INT) AS rk
      |  FROM pri)
      |SELECT source, rk, doc_id, tok FROM ranked WHERE rk <= $k""".stripMargin

  // --------------------------------------------------------------------
  // Token-budget sampling: the mixture-weighting step of assembling a
  // training set — each source contributes documents in a deterministic
  // content-independent priority order (md5(doc_id), the q63/q73
  // convention: recrawl-stable, engine-independent) until a fixed token
  // budget fills. q63 caps DOC counts; real mixes are specified in
  // TOKENS, which needs a running sum, not a rank.
  //
  // Scale shape: the per-source cumsum is q62's two-pass trick with
  // RANGE sharding — shard = pr·S / 2³², so shards are contiguous
  // slices of the (pr, doc_id) priority order and an exclusive
  // per-shard offset turns |S| independent local windows into the exact
  // global cumsum. A hot source spreads over all S shards (no
  // single-partition window over a 90%-source corpus); the offsets side
  // is |sources|·S rows, broadcast. One scan, one window exchange, one
  // broadcast join.
  // --------------------------------------------------------------------
  def tokenBudgetSample(documents: DataFrame, budget: Long = 800L,
                        shards: Int = 32): DataFrame = {
    require(budget > 0, s"need a positive token budget, got $budget")
    require(shards > 0 && shards <= 4096, s"bad shard count $shards")
    // ONE explicit (source, shard) shuffle consumed by pass 1's window,
    // pass 2's aggregate, and the offset join — [[tokenPacking]]'s
    // structure (see its ReuseExchange reasoning); the difference is the
    // ORDER: priority shards must be contiguous in (pr, doc_id), so
    // shard = pr·S/2³² (pr ∈ [0, 2³²) — shard order ∘ within-shard
    // (pr, doc_id) order ≡ the global priority order).
    val parted = documents
      .select(col("source"), col("doc_id"),
        expr("CAST(conv(substr(md5(CAST(doc_id AS STRING)), 1, 8), 16, 10) AS BIGINT)")
          .as("pr"),
        size(split(trim(lower(col("text"))), "\\s+")).cast("long").as("tok"))
      .withColumn("shard", expr(s"CAST(pr * ${shards}L DIV 4294967296L AS INT)"))
      .repartition(col("source"), col("shard"))
    val wLocal = Window.partitionBy(col("source"), col("shard"))
      .orderBy(col("pr"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wShards = Window.partitionBy(col("source")).orderBy(col("shard"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val local = parted.withColumn("lcum", sum(col("tok")).over(wLocal))
    // shard totals from max(lcum) of the SAME windowed plan (not a
    // second pass over the scan) — both join branches share one
    // canonical Exchange(Project(scan)) subtree
    val offsets = local.groupBy(col("source"), col("shard"))
      .agg(max(col("lcum")).as("shard_tok"))
      .select(col("source"), col("shard"),
        coalesce(sum(col("shard_tok")).over(wShards), lit(0L)).as("off"))
    // null-safe keys keep ReuseExchange eligible (see tokenPacking)
    local.as("l")
      .join(offsets.as("r"),
        col("l.source") <=> col("r.source") && col("l.shard") <=> col("r.shard"))
      .select(col("l.source").as("source"), col("l.tok").as("tok"),
        (col("l.lcum") + col("r.off")).as("cum"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("total_docs"),
        sum(when(col("cum") <= budget, 1L).otherwise(0L)).as("kept_docs"),
        sum(when(col("cum") <= budget, col("tok")).otherwise(0L))
          .as("kept_tokens"))
      // kept_tokens ≤ budget by construction, so fill_bp ≤ 10000 exact
      .withColumn("fill_bp", expr(s"kept_tokens * 10000L DIV ${budget}L"))
      .orderBy(col("source"))
  }

  val tokenBudgetSampleOracle: String = tokenBudgetSampleOracleAt(800L)

  /** Oracle builder on the SAME budget as the engine function. The
    * shard two-pass is invisible to semantics (range shards are
    * contiguous in the priority order), so the oracle is the plain
    * per-source running sum. */
  def tokenBudgetSampleOracleAt(budget: Long): String =
    s"""WITH d AS (
      |  SELECT source, doc_id,
      |         CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) AS pr,
      |         CAST(len(string_split_regex(trim(lower(text)), '\\s+')) AS BIGINT) AS tok
      |  FROM documents),
      |c AS (
      |  SELECT source, tok,
      |         SUM(tok) OVER (PARTITION BY source ORDER BY pr, doc_id
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      |  FROM d)
      |SELECT source, CAST(COUNT(*) AS BIGINT) AS total_docs,
      |       CAST(SUM(CASE WHEN cum <= $budget THEN 1 ELSE 0 END) AS BIGINT) AS kept_docs,
      |       CAST(SUM(CASE WHEN cum <= $budget THEN tok ELSE 0 END) AS BIGINT) AS kept_tokens,
      |       CAST(SUM(CASE WHEN cum <= $budget THEN tok ELSE 0 END) * 10000 // $budget AS BIGINT) AS fill_bp
      |FROM c GROUP BY source ORDER BY source""".stripMargin

  // --------------------------------------------------------------------
  // Temperature-based source mixing (the multilingual-sampling rule of
  // XLM-R / mT5: sample source i with p_i ∝ T_i^α, α = 1/2): per-source
  // token totals → integer-exact √ weight → floor-allocated share of a
  // global token budget → repeat factor (epochs over the source's own
  // data) in micro-units. α < 1 down-weights head sources and up-weights
  // the tail — the knob that keeps a 90%-one-source crawl from drowning
  // everything else in the training mix. Distinct from [[sourceMixture]]
  // (independent per-source Bernoulli rates; no cross-source coupling)
  // and [[tokenBudgetSample]] (a per-source priority cutoff): the
  // temperature rule is GLOBAL — every allocation depends on Σ√T.
  //
  // Scale shape: ONE partial-agg shuffle collapses the corpus to
  // |sources| rows; the Σw window and all allocation math run on that
  // tiny table (same bounded-table trick as difficultyBins' histogram).
  // isqrt is exact: T fits 2^53 so the double-sqrt candidate is within
  // ±1 of floor(√T), and a two-sided integer correction lands it —
  // identical arithmetic in the DuckDB oracle. Allocation multiplies in
  // DECIMAL(38,0) (q41's pattern): weight·budget overflows int64 once
  // budget ≳ 10¹³ tokens — exactly the 100 TB regime.
  // --------------------------------------------------------------------
  def mixTemperature(documents: DataFrame, budget: Long = 100000L): DataFrame = {
    require(budget > 0, s"need a positive token budget, got $budget")
    val totals = documents
      .select(col("source"),
        size(split(trim(lower(col("text"))), "\\s+")).cast("long").as("tok"))
      .groupBy(col("source")).agg(sum(col("tok")).as("total_tokens"))
    totals
      .withColumn("cand",
        expr("CAST(floor(sqrt(CAST(total_tokens AS DOUBLE))) AS BIGINT)"))
      .withColumn("weight", expr(
        """CASE WHEN (cand + 1) * (cand + 1) <= total_tokens THEN cand + 1
          |     WHEN cand * cand > total_tokens THEN cand - 1
          |     ELSE cand END""".stripMargin))
      // whole-table window over the |sources|-row aggregate — bounded,
      // single partition by design (difficultyBins precedent); the
      // in-plan ceiling makes "|sources| is small" executable: a mix
      // with 10⁶+ distinct sources raises instead of silently
      // single-partitioning
      .withColumn("wsum", expr(Guards.boundedWindowSql(1000000L,
        "mixTemperature per-source aggregate",
        "SUM(weight) OVER ()", "BIGINT")))
      .withColumn("share_bp", expr("weight * 10000L DIV wsum"))
      .withColumn("alloc_tokens", expr(
        s"CAST(CAST(weight AS DECIMAL(38,0)) * ${budget}L DIV CAST(wsum AS DECIMAL(38,0)) AS BIGINT)"))
      .withColumn("epochs_micro", expr(
        "CAST(CAST(alloc_tokens AS DECIMAL(38,0)) * 1000000L DIV CAST(total_tokens AS DECIMAL(38,0)) AS BIGINT)"))
      .select(col("source"), col("total_tokens"), col("weight"),
        col("share_bp"), col("alloc_tokens"), col("epochs_micro"))
      .orderBy(col("source"))
  }

  val mixTemperatureOracle: String = mixTemperatureOracleAt(100000L)

  /** Oracle builder on the SAME budget as the engine function; the isqrt
    * correction is spelled identically, and the allocation multiplies in
    * HUGEINT where Spark multiplies in DECIMAL(38,0). */
  def mixTemperatureOracleAt(budget: Long): String =
    s"""WITH totals AS (
      |  SELECT source,
      |         CAST(SUM(len(string_split_regex(trim(lower(text)), '\\s+'))) AS BIGINT) AS total_tokens
      |  FROM documents GROUP BY source),
      |w AS (
      |  SELECT source, total_tokens,
      |         CASE WHEN (c + 1) * (c + 1) <= total_tokens THEN c + 1
      |              WHEN c * c > total_tokens THEN c - 1
      |              ELSE c END AS weight
      |  FROM (SELECT source, total_tokens,
      |               CAST(floor(sqrt(CAST(total_tokens AS DOUBLE))) AS BIGINT) AS c
      |        FROM totals)),
      |s AS (SELECT source, total_tokens, weight, SUM(weight) OVER () AS wsum FROM w),
      |a AS (
      |  SELECT source, total_tokens, weight,
      |         weight * 10000 // wsum AS share_bp,
      |         CAST(CAST(weight AS HUGEINT) * $budget // wsum AS BIGINT) AS alloc_tokens
      |  FROM s)
      |SELECT source, total_tokens, weight,
      |       CAST(share_bp AS BIGINT) AS share_bp, alloc_tokens,
      |       CAST(CAST(alloc_tokens AS HUGEINT) * 1000000 // total_tokens AS BIGINT) AS epochs_micro
      |FROM a ORDER BY source""".stripMargin

  // --------------------------------------------------------------------
  // Quality-weighted sampling WITHOUT replacement (Efraimidis–Spirakis
  // 2006, "Weighted random sampling with a reservoir"): per source, keep
  // the k docs minimizing the exponential key e_i = −ln(u_i)/w_i — the
  // distributed-friendly formulation of weighted reservoir sampling
  // (key computation is row-local; selection is a bounded top-k). The
  // weight is the q32 quality micro-score, so the sample tilts toward
  // high-quality docs while every doc keeps nonzero probability — the
  // standard curation step between scoring and fixed-size selection
  // (q63 ranks by UNWEIGHTED hash priority; q85 fills a token budget).
  //
  // Determinism: u_i = (h+0.5)/2³² from the md5-derived 32-bit doc hash
  // (both engines compute the identical h; the division by 2³² is exact
  // in binary), −ln(u) is quantized to integer micro-units (the q31
  // pattern — a last-ulp libm divergence flips a floor only when
  // ln·10⁶ lands within ~1e-10 of an integer), and the key is the
  // all-integer l6·10⁶ DIV q6, ties broken by doc_id. q6 ≥ 4000 for any
  // 1-token doc (0.4·n_toks/100 term), but DIV guards with greatest 1.
  //
  // Scale shape: key computation is row-local (no shuffle); the top-k
  // side is row_number ≤ k over (source) — the TopKPerKey bounded-heap
  // operator when installed, so the 90%-hot source costs a k-heap per
  // partition, never a partition sort; the corpus side is a partial-agg
  // collapse to |sources| rows; the final join is tiny-⋈-tiny.
  // --------------------------------------------------------------------
  def weightedSample(documents: DataFrame, k: Int = 25): DataFrame = {
    graft.functions.GraftFunctions.register(documents.sparkSession)
    val keyed = TextAnalysis.perDocQuality(documents)
      .withColumn("h", expr("graft_h32(CAST(doc_id AS STRING))"))
      .withColumn("l6", expr(
        "CAST(floor(-ln((h + 0.5) / 4294967296.0) * 1000000 + 0.5) AS BIGINT)"))
      .withColumn("ekey", expr("l6 * 1000000L DIV greatest(q6, 1L)"))
    val sampled = keyed
      .withColumn("rk", row_number().over(Window.partitionBy(col("source"))
        .orderBy(col("ekey").asc, col("doc_id").asc)))
      .filter(col("rk") <= k)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_sampled"),
        sum(col("n_toks")).as("sample_tokens"),
        sum(col("q6")).as("sq6"))
    keyed.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("q6")).as("cq6"))
      .join(sampled, Seq("source"))
      .select(col("source"), col("n_docs"), col("n_sampled"),
        col("sample_tokens"),
        expr("sq6 DIV n_sampled").as("sample_q6_avg"),
        expr("cq6 DIV n_docs").as("corpus_q6_avg"))
      .orderBy(col("source"))
  }

  val weightedSampleOracle: String = weightedSampleOracleAt(25)

  /** Oracle builder on the SAME k as the engine function; h, the ln
    * quantization and the integer key are spelled identically. */
  def weightedSampleOracleAt(k: Int): String =
    s"""WITH perdoc AS (
      |  SELECT doc_id, source, len(ts) AS n_toks,
      |         len(list_distinct(ts)) AS n_uniq,
      |         CAST(list_sum(list_transform(ts, t -> length(t))) AS BIGINT) AS tok_chars
      |  FROM (SELECT doc_id, source, string_split_regex(lower(text), '\\s+') AS ts
      |        FROM documents)
      |  WHERE len(ts) > 0),
      |scored AS (
      |  SELECT doc_id, source, n_toks,
      |         CAST(floor((
      |           0.4 * least(CAST(n_toks AS DOUBLE) / 100.0, 1.0) +
      |           0.3 * (CAST(n_uniq AS DOUBLE) / n_toks) +
      |           0.3 * least((CAST(tok_chars AS DOUBLE) / n_toks) / 8.0, 1.0)
      |         ) * 1000000 + 0.5) AS BIGINT) AS q6
      |  FROM perdoc),
      |keyed AS (
      |  SELECT *,
      |         CAST(floor(-ln((CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) + 0.5)
      |                         / 4294967296.0) * 1000000 + 0.5) AS BIGINT)
      |           * 1000000 // greatest(q6, 1) AS ekey
      |  FROM scored),
      |ranked AS (
      |  SELECT *, row_number() OVER (PARTITION BY source ORDER BY ekey ASC, doc_id ASC) AS rk
      |  FROM keyed),
      |samp AS (
      |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_sampled,
      |         CAST(SUM(n_toks) AS BIGINT) AS sample_tokens,
      |         CAST(SUM(q6) AS BIGINT) AS sq6
      |  FROM ranked WHERE rk <= $k GROUP BY source),
      |corpus AS (
      |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |         CAST(SUM(q6) AS BIGINT) AS cq6
      |  FROM keyed GROUP BY source)
      |SELECT c.source, n_docs, n_sampled, sample_tokens,
      |       CAST(sq6 // n_sampled AS BIGINT) AS sample_q6_avg,
      |       CAST(cq6 // n_docs AS BIGINT) AS corpus_q6_avg
      |FROM corpus c JOIN samp s ON c.source = s.source
      |ORDER BY c.source""".stripMargin

  // --------------------------------------------------------------------
  // k-anonymity suppression: a corpus composition report ((lang, source)
  // → doc/char counts) that is SAFE TO PUBLISH — any cell describing
  // fewer than k documents is folded into one '__suppressed__' row
  // instead of being released (small cells are the re-identification
  // surface of aggregate releases; suppress-and-pool is the standard
  // k-anonymity remedy for marginal tables). n_groups records how many
  // raw cells each released row pools (1 for every released cell; the
  // suppressed row carries the fold count, so the report is auditable
  // without revealing the small cells themselves).
  //
  // Scale shape: the raw rollup partial-aggregates map-side behind
  // (lang, source); the suppression relabel + re-aggregate runs on the
  // ≤ |langs|·|sources| bounded result, not the corpus. Nothing
  // shuffles the payload; sums stay in int64 (Σ n_chars ≤ corpus bytes
  // ≪ 9·10¹⁸).
  // --------------------------------------------------------------------
  def kAnonymousMix(documents: DataFrame, k: Long = 5L): DataFrame = {
    require(k >= 2, s"k-anonymity needs k >= 2, got $k")
    val cells = Widen.widen(documents)
      .groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("n_chars"))
    cells.select(
        when(col("n_docs") >= k, col("lang"))
          .otherwise(lit("__suppressed__")).as("lang"),
        when(col("n_docs") >= k, col("source"))
          .otherwise(lit("__suppressed__")).as("source"),
        col("n_docs"), col("n_chars"))
      .groupBy(col("lang"), col("source"))
      .agg(sum(col("n_docs")).as("n_docs"), sum(col("n_chars")).as("n_chars"),
        count(lit(1)).as("n_groups"))
      .orderBy(col("lang"), col("source"))
  }

  val kAnonymousMixOracle: String = kAnonymousMixOracleAt(5L)

  /** Oracle builder on the SAME k as the engine function. */
  def kAnonymousMixOracleAt(k: Long): String =
    s"""WITH g AS (
      |  SELECT lang, source, CAST(count(*) AS BIGINT) AS n_docs,
      |         CAST(SUM(n_chars) AS BIGINT) AS n_chars
      |  FROM documents GROUP BY 1, 2),
      |r AS (
      |  SELECT CASE WHEN n_docs >= $k THEN lang
      |              ELSE '__suppressed__' END AS lang,
      |         CASE WHEN n_docs >= $k THEN source
      |              ELSE '__suppressed__' END AS source,
      |         n_docs, n_chars
      |  FROM g)
      |SELECT lang, source, CAST(SUM(n_docs) AS BIGINT) AS n_docs,
      |       CAST(SUM(n_chars) AS BIGINT) AS n_chars,
      |       CAST(count(*) AS BIGINT) AS n_groups
      |FROM r GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // --------------------------------------------------------------------
  // MERGE/upsert changeset application — the data-maintenance op every
  // snapshot-based corpus store runs per ingest cycle (the UPDATE/
  // DELETE the engine's append-only parquet world otherwise lacks):
  // apply a batch of upserts and tombstones to a base snapshot with
  // warehouse MERGE semantics — tombstone wins over upsert, upsert
  // replaces matched rows and inserts unmatched ones, untouched rows
  // carry over. Derived from the one documents table by the q65
  // modulo-split convention (base %5, upserts %3 with revised text,
  // tombstones %7); phantom tombstones (no matching row anywhere)
  // vanish rather than miscounting as deletes. The audit row per
  // action carries an ORDER-INDEPENDENT content checksum (Σ 32-bit
  // md5-prefix of each surviving row's final text, exact integer) so
  // the gate pins WHAT survived, not just how many.
  //
  // Scale shape: one co-partitioned full-outer + one left join, both
  // keyed on doc_id — each payload crosses the shuffle once, the
  // action classification is row-local, and the rollup collapses to 4
  // rows map-side. At 100 TB this is the fingerprints-join q65 shape
  // with payloads riding only where the merged output needs them.
  // --------------------------------------------------------------------
  def mergeUpsert(documents: DataFrame): DataFrame = {
    val d = Widen.widen(documents)
    val base = d.filter(col("doc_id") % 5 =!= 0)
      .select(col("doc_id"), col("text").as("b_text"))
    val upserts = d.filter(col("doc_id") % 3 === 0)
      .select(col("doc_id"), concat(col("text"), lit(" rev2")).as("u_text"))
    val tombs = d.filter(col("doc_id") % 7 === 0)
      .select(col("doc_id"), lit(true).as("tomb"))
    base.join(upserts, Seq("doc_id"), "full_outer")
      .join(tombs, Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("tomb"), lit("deleted"))
          .when(col("b_text").isNotNull && col("u_text").isNotNull, lit("updated"))
          .when(col("u_text").isNotNull, lit("inserted"))
          .otherwise(lit("kept")).as("action"),
        when(col("tomb"), lit(null).cast("string"))
          .otherwise(coalesce(col("u_text"), col("b_text"))).as("final_text"))
      .groupBy(col("action"))
      .agg(count(lit(1)).as("n_docs"),
        // Σ accumulates in DECIMAL(38,0) (terms up to 2³²−1 leave int64
        // near 2·10⁹ surviving docs), then reduces mod 2⁶³ — identically
        // in the oracle's HUGEINT — so the BIGINT output column never
        // overflows at any corpus size; all terms nonneg, so Spark %
        // and DuckDB % agree
        (sum(expr("""CASE WHEN final_text IS NULL THEN CAST(0 AS DECIMAL(38,0))
            |  ELSE CAST(CAST(conv(substr(md5(final_text), 1, 8), 16, 10) AS BIGINT)
            |       AS DECIMAL(38,0)) END""".stripMargin))
          % lit(new java.math.BigDecimal("9223372036854775808")))
          .cast("long").as("content_sum"))
      .orderBy(col("action"))
  }

  val mergeUpsertOracle: String =
    """WITH base AS (
      |  SELECT doc_id, text AS b_text FROM documents WHERE doc_id % 5 <> 0),
      |ups AS (
      |  SELECT doc_id, text || ' rev2' AS u_text FROM documents WHERE doc_id % 3 = 0),
      |tombs AS (
      |  SELECT doc_id, true AS tomb FROM documents WHERE doc_id % 7 = 0),
      |m AS (
      |  SELECT COALESCE(b.doc_id, u.doc_id) AS doc_id, b.b_text, u.u_text
      |  FROM base b FULL OUTER JOIN ups u ON u.doc_id = b.doc_id),
      |r AS (
      |  SELECT m.doc_id,
      |         CASE WHEN t.tomb THEN 'deleted'
      |              WHEN m.b_text IS NOT NULL AND m.u_text IS NOT NULL THEN 'updated'
      |              WHEN m.u_text IS NOT NULL THEN 'inserted'
      |              ELSE 'kept' END AS action,
      |         CASE WHEN t.tomb THEN NULL
      |              ELSE COALESCE(m.u_text, m.b_text) END AS final_text
      |  FROM m LEFT JOIN tombs t ON t.doc_id = m.doc_id)
      |SELECT action, CAST(count(*) AS BIGINT) AS n_docs,
      |       CAST(SUM(CASE WHEN final_text IS NULL THEN 0
      |                     ELSE CAST(concat('0x', substr(md5(final_text), 1, 8)) AS BIGINT)
      |                END) % 9223372036854775808 AS BIGINT) AS content_sum
      |FROM r GROUP BY action ORDER BY action""".stripMargin
}
