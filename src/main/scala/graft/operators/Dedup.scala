package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deduplication operators over the `documents` table — the core of a
  * training-data pipeline at 100 TB (north-star extensions; the reference's
  * nearest analog is the distinct-set pattern, plants_classifier.py:50–54).
  *
  * All hash functions are md5-derived (`conv(substr(md5(seed:x),1,8),16,10)`)
  * so the DuckDB oracle reproduces them bit-for-bit — no RNG, no JVM
  * hashCode, fully deterministic across engines and partition orders.
  *
  * Scale design:
  *  - signatures/fingerprints are computed per-row with higher-order
  *    functions (no explode of shingles through a shuffle: a 100 TB corpus
  *    never materializes |docs|×|shingles| rows);
  *  - candidate generation shuffles only (band_key, doc_id) pairs —
  *    O(bands·docs) narrow rows;
  *  - exact verification joins full shingle sets only for candidates,
  *    which LSH keeps to ~|true dups| + small false-positive tail;
  *  - everything is one lazy plan: Catalyst prunes `documents` to
  *    (doc_id, text) at the scan.
  */
object Dedup {

  /** First-occurrence-distinct 3-word shingles in one compiled pass —
    * the JVM twin of `array_distinct(transform(...))` (which is
    * interpreted per element as a HigherOrderFunction). Set SEMANTICS
    * are what downstream consumes (minhash minima, intersect sizes) —
    * element order never matters, but insertion order matches
    * array_distinct anyway. */
  private val shingleSetUdf = udf { toks: Seq[String] =>
    val seen = new java.util.LinkedHashSet[String]()
    var i = 0
    while (i + 2 < toks.length) {
      seen.add(toks(i) + " " + toks(i + 1) + " " + toks(i + 2)); ()
      i += 1
    }
    val out = new Array[String](seen.size)
    seen.toArray(out)
    out
  }

  /** doc_id + distinct 3-word shingle set; docs with <3 tokens have no
    * shingles and are excluded (cannot near-dup match). */
  private[operators] def shingled(documents: DataFrame): DataFrame =
    Widen.widen(documents)
      .select(col("doc_id"), split(lower(col("text")), "\\s+").as("toks"))
      .filter(size(col("toks")) >= 3)
      .select(col("doc_id"), shingleSetUdf(col("toks")).as("sset"))

  private val oracleShingled: String =
    """toks AS (
      |  SELECT doc_id, string_split_regex(lower(text), '\s+') AS ts FROM documents),
      |sh AS MATERIALIZED (
      |  SELECT doc_id,
      |         list_distinct([ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2]
      |                        for i in range(1, len(ts)-1)]) AS sset
      |  FROM toks WHERE len(ts) >= 3)""".stripMargin

  // --------------------------------------------------------------------
  // Exact dedup: normalize → md5 fingerprint → group. One shuffle on the
  // 128-bit fingerprint (not the document text — at 100 TB you never
  // shuffle full payloads to dedup them).
  // --------------------------------------------------------------------
  def exactDedup(documents: DataFrame): DataFrame =
    documents
      .select(col("doc_id"),
        md5(trim(regexp_replace(lower(col("text")), "\\s+", " "))).as("fp"))
      .groupBy(col("fp"))
      .agg(count(lit(1)).as("cnt"), min(col("doc_id")).as("keeper_id"))

  val exactDedupOracle: String =
    """SELECT md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp,
      |       CAST(COUNT(*) AS BIGINT) AS cnt,
      |       MIN(doc_id) AS keeper_id
      |FROM documents GROUP BY 1""".stripMargin

  // --------------------------------------------------------------------
  // MinHash + LSH with banding DERIVED from the requested threshold.
  // With b bands of r rows, a pair at jaccard j band-collides with
  // probability 1-(1-j^r)^b; [[lshBanding]] picks the cheapest (b, r)
  // whose per-pair recall at j = threshold clears 92%. At the default
  // t=0.5 that is 9 bands × 2 rows (recall ≈ 0.925) — the fixed 4×3 it
  // replaces had ~41% recall at its own advertised threshold.
  // --------------------------------------------------------------------
  /** Mod-p universal-hash permutation constants, shared by the JVM
    * signature UDF, the SQL banding of [[ngramJaccard]], and both DuckDB
    * oracles: h_s(x) = (A(s)·x + B(s)) mod P over the md5 base hash. */
  private[operators] val P = 2147483647L
  private[operators] def permA(s: Int): Long = ((2L * s + 1L) * 1103515245L) % P
  private[operators] def permB(s: Int): Long = s * 12345L + 1L

  /** Cheapest (bands, rows) reaching ≥92% per-pair recall at jaccard =
    * threshold, minimizing total permutations b·r. Bands are capped at 12
    * (shuffle rows per doc scale with b), so sub-0.35 thresholds trade
    * recall for bounded fan-out — documented, and the exact verify stage
    * keeps precision at 1 regardless. */
  private[operators] def lshBanding(threshold: Double,
                                    targetRecall: Double = 0.92): (Int, Int) = {
    val t = math.max(threshold, 0.05)
    val opts = for (r <- 2 to 6) yield {
      val p = math.pow(t, r)
      val b = math.max(1, math.min(12,
        math.ceil(math.log1p(-targetRecall) / math.log1p(-p)).toInt))
      (b, r)
    }
    // among capped options prefer best recall, then fewest permutations
    opts.minBy { case (b, r) =>
      val recall = 1.0 - math.pow(1.0 - math.pow(t, r), b)
      (-recall, b * r)
    }
  }

  /** The default near-dup jaccard threshold. Engine functions AND oracle
    * builders both derive their LSH banding from the threshold they are
    * given, and the parameterless oracle `val`s below are built from THIS
    * constant — so engine and oracle can never silently pair mismatched
    * banding (they share one source of truth). */
  val DefaultThreshold: Double = 0.5

  /** Default document-frequency ceiling for minhash shingles: a shingle
    * present in more than this fraction of shingle-able documents is
    * template text (boilerplate footers, licence sentences, nav chrome)
    * and is removed before signatures, banding, AND verification.
    *
    * This is the LSH tier's scale-survival property, found by the 10×
    * skewed fixture, not by review: one 16-word sentence appended to 30%
    * of a 50k-doc corpus dominated the minimum-hash of every short doc
    * and collapsed 9.4k docs into ONE band bucket — 70.8M candidate
    * pairs (quadratic in corpus size; at 100 TB, billions of docs in the
    * hot bucket ⇒ 10^18 candidates, unrunnable). Filtering shingles with
    * df > 10% removed the degenerate buckets (max bucket 9,436 → dup-
    * cluster-sized) and cut candidates ~500× while keeping every planted
    * near-dup pair; pairs whose ENTIRE similarity was the shared
    * template legitimately fall below threshold, which is the behavior a
    * dedup pipeline wants (CCNet/Gopher-style pipelines normalize
    * template text away before fingerprinting for the same reason).
    *
    * The hot set is provably tiny — Σdf ≤ |docs|·S̄ shingle instances
    * admit at most S̄/frac ≈ 10³ shingles above frac·|docs| — so the
    * engine computes it with one map-combined aggregation and ships it
    * as a broadcast literal; the driver fixtures (max df 0.5%) are
    * unaffected, so the filter is exactly the identity there. */
  val DefaultMaxDfFrac: Double = 0.1

  /** Absolute floor under the relative df ceiling: a shingle counts as
    * template only above max(maxDfFrac·|docs|, THIS) documents. The
    * relative ceiling alone misfires on small corpora — at |docs| < 10
    * it sits below df = 1 and would filter EVERY shingle, and ordinary
    * content reuse (a near-dup chain of sliding windows shares central
    * shingles across most of its members) is indistinguishable from
    * template text until a shingle recurs across dozens of independent
    * documents. Below ~25 recurrences the filter would be deleting the
    * very evidence near-dup detection runs on; above it, at any corpus
    * size where the quadratic guard MATTERS (|docs| ≥ 10³), the
    * relative term dominates and the floor is inert. */
  val DfFloorDocs: Double = 25.0

  /** Template-shingle removal: drop hashed shingles with document
    * frequency > max(maxDfFrac·|docs|, [[DfFloorDocs]]) from every doc's
    * set, then drop docs whose set emptied (pure-template docs cannot
    * near-dup match on content). Operates on the 32-bit-hashed sets the
    * whole minhash pipeline ships (df at hash granularity, mirrored by
    * the oracle at hash granularity — parity by construction).
    * `array_except` preserves the left array's order, so the sorted
    * contract [[hsetUdf]] establishes survives the filter.
    * ONE extra LINEAR job over the shingle stage: a per-row sentinel
    * (outside [[hsetUdf]]'s 32-bit hash range) rides the same explode,
    * so its df in the same map-combined aggregation IS |docs| — no
    * separate count action, and the relative threshold applies
    * engine-side against that broadcast scalar, so the single collect
    * fetches exactly the KB-scale hot set. Fewer driver-side action
    * barriers = fewer windows for box contention to land between jobs
    * (this was the suite's most contention-sensitive query). The caller
    * hands in a PERSISTED shingle stage, so the job is a cached-column
    * scan, not a repeat run of the shingling UDF. */
  private val DfSentinel = -1L

  private def dfFiltered(sh0: DataFrame, maxDfFrac: Double): DataFrame = {
    if (maxDfFrac >= 1.0) return sh0
    applyHotFilter(sh0, hotShingles(sh0, maxDfFrac))
  }

  /** The guarded hot-set computation half of the df-filter: the sorted
    * template-shingle hashes above the df ceiling, collected to the
    * driver under the broadcastability bound. Split from
    * [[applyHotFilter]] so [[AdmissionIndex]] can compute the hot set
    * over the BASE side only, persist it, and apply the SAME persisted
    * set to every later batch probe (df-at-build-time semantics — a
    * persisted signature index is only valid under the hot set its
    * signatures were built with). */
  private[operators] def hotShingles(sh0: DataFrame,
                                     maxDfFrac: Double): Array[Long] = {
    val dfAgg = sh0
      .select(explode(concat(col("hset"), array(lit(DfSentinel)))).as("h"))
      .groupBy(col("h")).agg(count(lit(1)).as("df"))
    val nDocs = broadcast(
      dfAgg.filter(col("h") === DfSentinel).select(col("df").as("n")))
    val hot = dfAgg.filter(col("h") =!= DfSentinel)
      .crossJoin(nDocs)
      .filter(col("df") >
        greatest(col("n") * lit(maxDfFrac), lit(DfFloorDocs)))
      .select(col("h"))
      // bound argument: S̄/frac entries; a blowout means the input is
      // not a document corpus (or frac≈0) — refuse to broadcast it.
      // limit BEFORE collect so the refusal never materializes an
      // unbounded set on the driver first
      .limit(100001)
      .collect().map(_.getLong(0)).sorted
    require(hot.length <= 100000,
      s"minhash df-filter: >100000 shingles above df ${maxDfFrac} — " +
        "hot set is no longer broadcastable; raise maxDfFrac")
    hot
  }

  /** Remove a (broadcast-literal) hot set from every doc's shingle set
    * and drop docs whose set emptied — the application half of the
    * df-filter, shared by the in-session pipelines (hot set computed on
    * the same corpus) and the admission probe (hot set read from the
    * persisted index). */
  private[operators] def applyHotFilter(sh0: DataFrame,
                                        hot: Array[Long]): DataFrame = {
    if (hot.isEmpty) sh0
    else sh0
      // withColumn: any side columns the caller carries (n_chars in the
      // ngram tier) survive the filter
      .withColumn("hset", array_except(col("hset"), typedLit(hot.toSeq)))
      .filter(size(col("hset")) > 0)
  }

  /** doc_id + sorted distinct 32-bit-md5-hashed shingle set — the dedup
    * tier's shuffle representation: 8 bytes per shingle through every
    * exchange (vs ~25-byte strings), and verification becomes the
    * codegen'd [[graft.functions.SortedIntersectSize]] walk instead of
    * an interpreted string `array_intersect`. Jaccard is DEFINED over
    * the hashed sets on both engines (the oracle hashes identically), so
    * parity holds by construction; a 32-bit within-doc collision merely
    * shrinks both engines' sets the same way. */
  private[operators] def hashShingled(documents: DataFrame): DataFrame =
    Widen.widen(documents)
      .select(col("doc_id"), split(lower(col("text")), "\\s+").as("toks"))
      .filter(size(col("toks")) >= 3)
      .select(col("doc_id"), hsetUdf(col("toks")).as("hset"))

  /** Session-scoped stage cache for verified minhash pairs: pair listing
    * (q25) and clustering (q59) share one signature+verify computation per
    * (session, input plan, threshold) — multi-query sessions pay the
    * expensive stage once. The machinery (semantic-plan-hash keys,
    * LRU-bounded persist lifecycle, per-slot build locks) lives in
    * [[StageMemo]], shared with the text tier's (doc, word) stage. */
  private def memoized(documents: DataFrame, stage: String, threshold: Double)
                      (build: => DataFrame): DataFrame =
    StageMemo.memoized(documents, s"dedup:$stage", threshold)(build)

  /** Drop this session's memoized stages (e.g. after overwriting the
    * underlying files in place, which the plan-hash key cannot see).
    * Session-wide: clears the text tier's stages too. */
  def clearStageCache(spark: org.apache.spark.sql.SparkSession): Unit =
    StageMemo.clear(spark)

  private def verifiedPairs(documents: DataFrame, threshold: Double,
                            maxDfFrac: Double): DataFrame =
    memoized(documents, s"pairs:df$maxDfFrac", threshold)(
      minhashPairsPlan(documents, threshold, maxDfFrac))

  /** Verified near-dup pairs (a, b, jac), unordered — the shared stage
    * behind [[minhashDedup]] and [[dupClusters]]. Built entirely on the
    * hashed shingle representation ([[hashShingled]]): signatures come
    * from the shared mod-p permutations over the already-hashed ints
    * (identical minima to hashing the strings directly — colliding
    * duplicates share one affine image, which cannot change a minimum),
    * and verification is the prefiltered codegen'd sorted-intersect walk
    * [[verifyJaccardRaw]] instead of an interpreted string
    * `array_intersect` per candidate. */
  private def minhashPairsPlan(documents: DataFrame, threshold: Double,
                               maxDfFrac: Double): DataFrame = {
    graft.functions.GraftFunctions.register(documents.sparkSession)
    val (b, r) = lshBanding(threshold)
    // The shingling UDF pass (tokenize + md5 + sort-distinct per doc) is
    // the stage's dominant linear cost, and FIVE consumers read it: the
    // df-filter's count and df-aggregation, the signature stage, and both
    // sides of the verify join. Persist it once; every consumer is then a
    // cached-column scan. The cache is released in `finally` after the
    // verified pairs materialize below — this build is eager (the
    // [[StageMemo]] contract explicitly allows a build to persist-and-
    // materialize itself), so no lazy consumer can outlive the unpersist.
    val sh0 = hashShingled(documents)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val sh = dfFiltered(sh0, maxDfFrac)
      val sig = sh.select(col("doc_id"), permMinsUdf(b * r)(col("hset")).as("sig"))
      val bandCols = (0 until r).map(k => s"sig[band*$r+$k]").mkString(", ")
      val banded = sig
        .select(col("doc_id"), explode(expr(s"sequence(0, ${b - 1})")).as("band"), col("sig"))
        .select(col("doc_id"), expr(s"concat_ws('_', band, $bandCols)").as("band_key"))
        // exchange barrier: signatures materialize once; the self-join's two
        // branches reuse the shuffle (ReusedExchange) rather than re-hashing
        // every shingle per branch, and the join needs no further exchange
        .repartition(col("band_key"))
      val cand = banded.as("x").join(banded.as("y"), "band_key")
        .filter(col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
        .distinct()
      val out = verifyJaccardRaw(cand, sh, threshold)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      out.count()
      out
    } finally sh0.unpersist(false)
  }

  def minhashDedup(documents: DataFrame,
                   threshold: Double = DefaultThreshold,
                   maxDfFrac: Double = DefaultMaxDfFrac): DataFrame =
    verifiedPairs(documents, threshold, maxDfFrac)
      .select(col("a"), col("b"), round(col("jac"), 4).as("jaccard"))
      .orderBy(col("a"), col("b"))

  /** The minhash-pairs pipeline as reusable CTEs (shared by the q25
    * oracle and the q59 clustering oracle; final table `mp(a, b, jac)`
    * holds verified pairs at jaccard ≥ threshold). Banding derives from
    * the same threshold the engine function receives, shingle sets are
    * 32-bit-hashed exactly as [[hashShingled]] (jaccard is defined over
    * the hashed sets on both engines), and the df-filter mirrors
    * [[dfFiltered]] at hash granularity: df counted over per-doc
    * DISTINCT hashes, the same IEEE ceiling product, empties dropped
    * before signatures AND verification. */
  /** DuckDB note: `sh`, `shf` and `mp` carry MATERIALIZED hints — DuckDB
    * inlines plain CTEs per REFERENCE, so without them the shingling
    * pipeline evaluates once per reference (sig + both verify joins)
    * and — fatally at scale — once per RECURSION ROUND in the
    * connected-components oracles, whose recursive term references the
    * pair graph every iteration (measured: q59's oracle went from
    * >10 min at 50k docs to seconds). Spark never parses this text; it
    * is oracle-only SQL. */
  private[operators] def oracleMinhashPairsCtes(
      threshold: Double, maxDfFrac: Double = DefaultMaxDfFrac,
      dfScope: String = ""): String = {
    val (b, r) = lshBanding(threshold)
    val bandCols = (1 to r).map(k => s"sig[band*$r+$k]").mkString(", ")
    // dfScope restricts which docs the hot-set STATISTICS are computed
    // over (the filter still applies to every doc's set): the admission
    // oracle passes the base-side predicate to mirror the persisted
    // index's df-at-build-time semantics
    val scopeWhere = if (dfScope.isEmpty) "" else s" WHERE $dfScope"
    val dfCtes =
      if (maxDfFrac >= 1.0) "shf AS MATERIALIZED (SELECT doc_id, hset FROM sh)"
      else
        s"""nd AS (SELECT COUNT(*) AS n FROM sh$scopeWhere),
          |sdf AS (
          |  SELECT h, COUNT(*) AS df
          |  FROM (SELECT unnest(hset) AS h FROM sh$scopeWhere) GROUP BY h),
          |hot AS (
          |  SELECT coalesce(list(h), CAST([] AS BIGINT[])) AS hl
          |  FROM sdf, nd WHERE df > greatest($maxDfFrac * n, $DfFloorDocs)),
          |shf AS MATERIALIZED (
          |  SELECT doc_id, hset FROM (
          |    SELECT doc_id, list_filter(hset, x -> NOT list_contains(hl, x)) AS hset
          |    FROM sh, hot)
          |  WHERE len(hset) > 0)""".stripMargin
    s"""toks AS (
      |  SELECT doc_id, string_split_regex(lower(text), '\\s+') AS ts FROM documents),
      |sh AS MATERIALIZED (
      |  SELECT doc_id,
      |         list_distinct([CAST(concat('0x', substr(md5(ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2]), 1, 8)) AS BIGINT)
      |                        for i in range(1, len(ts)-1)]) AS hset
      |  FROM toks WHERE len(ts) >= 3),
      |$dfCtes,
      |sig AS (
      |  SELECT doc_id,
      |         list_transform(range(0, ${b * r}), s ->
      |           list_min(list_transform(hset, h ->
      |             (((2*s + 1) * 1103515245 % 2147483647) * (h % 2147483647) + s * 12345 + 1) % 2147483647))) AS sig
      |  FROM shf),
      |banded AS MATERIALIZED (
      |  SELECT doc_id,
      |         concat_ws('_', band, $bandCols) AS band_key
      |  FROM sig, range(0, $b) AS t(band)),
      |cand AS (
      |  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
      |  FROM banded x JOIN banded y ON x.band_key = y.band_key AND x.doc_id < y.doc_id),
      |j AS (
      |  SELECT c.a, c.b,
      |         len(list_intersect(sa.hset, sb.hset)) /
      |           CAST(len(sa.hset) + len(sb.hset) - len(list_intersect(sa.hset, sb.hset)) AS DOUBLE) AS jac
      |  FROM cand c JOIN shf sa ON sa.doc_id = c.a JOIN shf sb ON sb.doc_id = c.b),
      |mp AS MATERIALIZED (SELECT a, b, jac FROM j WHERE jac >= $threshold)""".stripMargin
  }

  val minhashDedupOracle: String = minhashDedupOracleAt(DefaultThreshold)

  /** Oracle builder on the SAME threshold and df ceiling as the engine
    * function — see [[ngramJaccardOracleAt]]. */
  def minhashDedupOracleAt(threshold: Double,
                           maxDfFrac: Double = DefaultMaxDfFrac): String =
    s"""WITH ${oracleMinhashPairsCtes(threshold, maxDfFrac)}
      |SELECT a, b, ROUND(jac, 4) AS jaccard FROM mp ORDER BY a, b""".stripMargin

  // --------------------------------------------------------------------
  // Incremental near-dup ADMISSION — dedup an incoming batch against an
  // existing base corpus without ever pairing the base against itself:
  // the operation a continuously-ingesting training pipeline actually
  // runs (re-pairing a 100 TB corpus per ingest is the non-starter the
  // all-pairs formulation would imply). Base/batch derive from the one
  // documents table by the q65 modulo-split convention (doc_id parity:
  // even = base snapshot, odd = incoming batch). Shingles, the
  // df-filter and signatures are computed over the FULL corpus
  // (template shingles are template regardless of side, and df over
  // base+batch is what a real admission gate maintains); the candidate
  // join is batch-bands ⋈ base-bands ONLY — no base×base and no
  // batch×batch pair ever materializes, so per-ingest cost is
  // O(batch bands + matched candidates), never O(corpus²).
  // Output: each batch doc that near-dups the base, with its best base
  // match (max jaccard, ties to lowest base id) — the reject list the
  // gate enforces; admitted docs are the batch minus these rows.
  //
  // Oracle: the all-pairs CTEs filtered to cross-parity pairs. LSH
  // banding gives a cross pair the SAME band keys whether or not
  // same-side pairs are also generated, so candidate recall — and the
  // identical jaccard verification — agree exactly between the two
  // formulations; all-pairs is quadratic at oracle scale only.
  // --------------------------------------------------------------------
  def incrementalDedup(documents: DataFrame,
                       threshold: Double = DefaultThreshold,
                       maxDfFrac: Double = DefaultMaxDfFrac): DataFrame =
    incrementalPairs(documents, threshold, maxDfFrac)
      .withColumn("rnk", expr(
        "row_number() OVER (PARTITION BY a ORDER BY jac DESC, b ASC)"))
      .filter(col("rnk") === 1)
      .select(col("a").as("batch_doc"), col("b").as("base_doc"),
        round(col("jac"), 4).as("jaccard"))
      .orderBy(col("batch_doc"))

  /** Verified cross-side pairs (a = batch doc, b = base doc, jac),
    * session-memoized and eagerly materialized like [[verifiedPairs]]
    * (the shingle cache must not outlive the build). */
  private def incrementalPairs(documents: DataFrame, threshold: Double,
                               maxDfFrac: Double): DataFrame =
    memoized(documents, s"incpairs:df$maxDfFrac", threshold) {
      graft.functions.GraftFunctions.register(documents.sparkSession)
      val (b, r) = lshBanding(threshold)
      val sh0 = hashShingled(documents)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        val sh = dfFiltered(sh0, maxDfFrac)
        val sig = sh.select(col("doc_id"), permMinsUdf(b * r)(col("hset")).as("sig"))
        val bandCols = (0 until r).map(k => s"sig[band*$r+$k]").mkString(", ")
        val banded = sig
          .select(col("doc_id"),
            explode(expr(s"sequence(0, ${b - 1})")).as("band"), col("sig"))
          .select(col("doc_id"),
            expr(s"concat_ws('_', band, $bandCols)").as("band_key"))
        // the parity predicates push below the band projection to the
        // cached shingle scan (verified in the physical plan), so each
        // doc's signature is computed exactly once — on its own side —
        // and the two band exchanges together carry one corpus pass;
        // at a realistic base≫batch ratio AQE broadcasts the small
        // batch side instead of exchanging the base at all
        val cand = banded.filter(col("doc_id") % 2 === 1).as("x")
          .join(banded.filter(col("doc_id") % 2 === 0).as("y"), "band_key")
          .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
          .distinct()
        val out = verifyJaccardRaw(cand, sh, threshold)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        out.count()
        out
      } finally sh0.unpersist(false)
    }

  val incrementalDedupOracle: String =
    incrementalDedupOracleAt(DefaultThreshold)

  /** Oracle builder on the SAME threshold and df ceiling as the engine
    * function — all-pairs CTEs + cross-parity filter + best-match rank. */
  def incrementalDedupOracleAt(threshold: Double,
                               maxDfFrac: Double = DefaultMaxDfFrac): String =
    s"""WITH ${oracleMinhashPairsCtes(threshold, maxDfFrac)},
      |crossp AS (
      |  SELECT CASE WHEN a % 2 = 1 THEN a ELSE b END AS batch_doc,
      |         CASE WHEN a % 2 = 1 THEN b ELSE a END AS base_doc, jac
      |  FROM mp WHERE (a % 2) <> (b % 2)),
      |best AS (
      |  SELECT batch_doc, base_doc, jac,
      |         row_number() OVER (PARTITION BY batch_doc
      |                            ORDER BY jac DESC, base_doc ASC) AS rnk
      |  FROM crossp)
      |SELECT batch_doc, base_doc, ROUND(jac, 4) AS jaccard
      |FROM best WHERE rnk = 1 ORDER BY batch_doc""".stripMargin

  // --------------------------------------------------------------------
  // Near-dup CLUSTERING: connected components over the minhash pair
  // graph via min-label propagation — the step that turns pairwise
  // matches into keep/drop decisions (each cluster keeps its smallest
  // doc_id). Label propagation is the 100 TB-scale CC algorithm: each
  // iteration is one join + one min-aggregation, converging in
  // O(graph diameter) rounds; near-dup clusters are shallow (dups of a
  // common source), so a handful of rounds suffice. The driver loop
  // iterates ROUNDS (with a convergence count), never data.
  // --------------------------------------------------------------------
  def dupClusters(documents: DataFrame, threshold: Double = DefaultThreshold,
                  maxIters: Int = 25,
                  maxDfFrac: Double = DefaultMaxDfFrac): DataFrame =
    componentLabels(documents, threshold, maxIters, maxDfFrac)
      .groupBy(col("lbl").as("component"))
      .agg(count(lit(1)).as("n_docs"), max(col("v")).as("max_doc"))
      .orderBy(col("component"))

  /** Connected-component label per matched vertex (v, lbl) — the shared,
    * session-memoized stage behind [[dupClusters]] and [[dedupKeepers]]. */
  private[operators] def componentLabels(documents: DataFrame, threshold: Double,
                              maxIters: Int,
                              maxDfFrac: Double = DefaultMaxDfFrac): DataFrame =
    // maxIters is folded into the stage key: a memoized unconverged build
    // can never exist (non-convergence throws), but a later call with a
    // LARGER maxIters must not silently inherit the smaller setting's
    // cache entry if that invariant ever changes
    memoized(documents, s"labels:$maxIters:df$maxDfFrac", threshold) {
      // the pairs stage itself is session-memoized ([[verifiedPairs]]) —
      // a session that already ran the pair listing clusters for free
      connectedComponents(
        verifiedPairs(documents, threshold, maxDfFrac), maxIters,
        "dupClusters")
    }

  /** Connected-component labels (v, lbl) over an undirected edge list
    * (columns `a`, `b`) — the Pregel loop shared by the text dedup tier
    * ([[componentLabels]]) and the embedding tier
    * ([[Similarity.semanticClusters]]). Returns a persisted, materialized
    * DataFrame (callers memoize; [[StageMemo]] skips re-persisting).
    *
    * The ROUND LOOP runs on co-partitioned RDDs, not DataFrames — the
    * canonical Pregel shape and one of the few legitimate RDD uses:
    * per-iteration Catalyst planning + fresh codegen cost ~2 s/round on
    * a graph of a few hundred edges (measured), and a lazily-chained
    * multi-round DataFrame plan duplicates every prior round's subtree
    * 2× per level (measured 115 s for 4 unrolled rounds — physical
    * plans are trees, only exchanges get reused). RDD rounds on the
    * cached, hash-partitioned edge list are plain shuffles with zero
    * planning. Only the derived GRAPH (edges + labels) is ever
    * cached/collected-on — never the corpus. */
  private[operators] def connectedComponents(pairs: DataFrame, maxIters: Int,
                                             caller: String,
                                             checkpointDir: Option[String] = None): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._
    // reliable-checkpoint escape hatch (see [[ccLabelsRdd]]): an explicit
    // argument wins; otherwise a deployment sets the session conf once
    // and every CC caller (dedup clusters, semantic clusters, exemplars)
    // inherits loss-proof truncation without signature churn
    val ckDir = checkpointDir.orElse(
      spark.conf.getOption("graft.cc.checkpointDir"))
    // executable form of the persisted-input contract (the comments
    // below rely on it twice: the sizing count and the fast-path
    // collect both re-evaluate `pairs`): an unpersisted pair source —
    // potentially a quadratic candidate join — must not be silently
    // evaluated twice. Persist defensively rather than throw: every
    // in-repo caller hands in a memoized stage (hits the contract), and
    // an external caller gets correct-and-linear instead of a crash.
    val defensivePersist = pairs.storageLevel ==
      org.apache.spark.storage.StorageLevel.NONE
    if (defensivePersist) {
      pairs.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      ()
    }
    val pairsRdd = pairs
      .select(col("a"), col("b")).as[(Long, Long)].rdd
    // right-size the round-loop partitioner to the GRAPH, not the
    // cluster: every Pregel round runs three shuffles over it, and on a
    // small matched-pair graph (thousands of edges) a cluster-width
    // partitioner turns each round into defaultParallelism near-empty
    // tasks of pure scheduling overhead (measured: ~1 s/query at bench
    // scale). ~50k edges/partition keeps per-task state small; giant
    // graphs still spread across the full cluster. The callers hand in
    // a PERSISTED pair stage (memoized verified-pairs / near-dup
    // stages), so the sizing count is a cached-scan action.
    val nEdges = pairs.count()
    // Small-graph fast path: below this bound the whole matched-pair
    // graph is a few MB (two longs per edge) — union-find on the driver
    // beats the round loop's ~4 jobs/round of scheduling latency by
    // ~2 s/query at bench scale, the same bounded-collect pattern as
    // the IVF centroid build. The bound is explicit and the distributed
    // loop is the ONLY path past it, so a 100 TB pair graph never
    // touches the driver. Labels are identical by construction (both
    // produce lbl = min vertex id per component, spec-pinned).
    if (nEdges <= SmallGraphEdges) {
      val labels = smallGraphLabels(pairsRdd.collect(), spark)
      if (defensivePersist) pairs.unpersist(false)
      return labels
    }
    val part = new org.apache.spark.HashPartitioner(
      math.max(1, math.min(spark.sparkContext.defaultParallelism,
        (nEdges / 50000L).toInt + 1)))
    val edgesBySrc = pairsRdd
      .flatMap { case (a, b) => Seq((a, b), (b, a)) }
      .partitionBy(part).cache()
    // try/finally: the non-convergence throw inside the loop must not
    // leak the cached bidirectional edge RDD for the session lifetime
    val labels =
      try ccLabelsRdd(edgesBySrc, part, maxIters, caller,
        checkpointDir = ckDir)
      finally edgesBySrc.unpersist(false)
    // persist + materialize HERE (Slot.get skips already-persisted
    // builds) so the final round's cached RDD can be freed — otherwise
    // every clustered corpus pins its label RDD for the session lifetime
    val out = labels.toDF("v", "lbl")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    out.count()
    labels.unpersist(false)
    if (defensivePersist) pairs.unpersist(false)
    out
  }

  /** Edge ceiling for the driver union-find fast path in
    * [[connectedComponents]] (~3 MB collected at the bound). */
  private val SmallGraphEdges = 200000L

  /** Driver union-find over a bounded collected edge list: union-by-min
    * keeps every root the minimum vertex id of its component (the same
    * label contract as the Pregel loop — induction: each union roots at
    * min(root_a, root_b), and a singleton's root is itself), with path
    * halving on find. Output sorted by v for deterministic row order,
    * persisted + materialized exactly like the distributed path so
    * [[StageMemo]]'s Slot skips re-persisting. */
  private def smallGraphLabels(edges: Array[(Long, Long)],
      spark: org.apache.spark.sql.SparkSession): DataFrame = {
    import spark.implicits._
    val parent = new java.util.HashMap[Long, Long]()
    def find(x0: Long): Long = {
      var x = x0
      while (parent.get(x) != x) {
        val gp = parent.get(parent.get(x))
        parent.put(x, gp)
        x = gp
      }
      x
    }
    edges.foreach { case (a, b) =>
      if (!parent.containsKey(a)) parent.put(a, a)
      if (!parent.containsKey(b)) parent.put(b, b)
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent.put(math.max(ra, rb), math.min(ra, rb))
      ()
    }
    val out = new Array[(Long, Long)](parent.size())
    val it = parent.keySet().iterator()
    var i = 0
    while (it.hasNext) { val v = it.next(); out(i) = (v, find(v)); i += 1 }
    java.util.Arrays.sort(out, java.util.Comparator.comparingLong(
      (t: (Long, Long)) => t._1))
    val df = spark.createDataset(out.toIndexedSeq).toDF("v", "lbl")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    df.count()
    df
  }

  /** The round loop proper, on a cached, hash-partitioned bidirectional
    * edge list. Returns the converged (cached) labels RDD; the caller
    * owns unpersisting it. Split from [[connectedComponents]] so specs
    * can drive deep graphs and assert the lineage stays bounded.
    *
    * Every `checkpointEvery` rounds the new labels RDD is
    * `localCheckpoint()`ed instead of plain-cached: each round's RDD
    * chains joins on the previous round's, so without truncation the
    * DAG deepens per round — fine for the ≤6 rounds a typical corpus
    * needs, but a high-diameter component at 100× scale (or an executor
    * loss forcing recompute of a deep chain) turns it into the classic
    * iterative-lineage blowup. Local (executor-block) checkpointing is
    * the default cost point: lineage is truncated cheaply, but the
    * executor blocks ARE the only copy — losing one (or the executor
    * holding it) past the checkpoint round fails the job rather than
    * recomputing, which is acceptable on a single-node engine where
    * executor loss kills the app anyway. A cluster deployment that needs
    * loss-proof truncation passes `checkpointDir`: the loop then writes
    * reliable `checkpoint()` files there (and caches alongside, so the
    * checkpoint write reads the cached blocks instead of recomputing
    * the round), and a lost cached block recomputes from the checkpoint
    * files instead of dying ([[graft.FaultToleranceSpec]] drives
    * exactly that loss). `checkpointEvery = 0` disables truncation
    * (spec use only). */
  private[graft] def ccLabelsRdd(
      edgesBySrc: org.apache.spark.rdd.RDD[(Long, Long)],
      part: org.apache.spark.HashPartitioner,
      maxIters: Int, caller: String,
      checkpointEvery: Int = 5,
      checkpointDir: Option[String] = None): org.apache.spark.rdd.RDD[(Long, Long)] = {
    val sc = edgesBySrc.sparkContext
    // reliable mode: set the dir once (idempotent for a fixed dir; a
    // CHANGED dir mid-session is a caller error Spark surfaces itself)
    checkpointDir.foreach(sc.setCheckpointDir)
    // init folds the first propagation round in: every vertex starts at
    // min(self, min neighbor) straight off the cached edge partitions
    var labels = edgesBySrc
      .reduceByKey(part, (x: Long, y: Long) => math.min(x, y))
      .mapPartitions(_.map { case (v, m) => (v, math.min(v, m)) },
        preservesPartitioning = true)
      .cache()
    // labels only ever DECREASE, so an unchanged label-sum ⟺ a fixed
    // point — one cheap action per round, no change-join needed
    var prevSum = BigInt(-1)
    var converged = false
    var iter = 0
    while (iter < maxIters && !converged) {
      // neighbor-min: edges ⋈ labels is narrow (co-partitioned); only the
      // reduced messages shuffle, and they merge back narrow
      val msgs = edgesBySrc.join(labels)
        .map { case (_, (dst, lbl)) => (dst, lbl) }
        .reduceByKey(part, (x: Long, y: Long) => math.min(x, y))
      // cached for the round: prop feeds BOTH sides of the doubling join
      // below — uncached, its join-heavy lineage would evaluate twice
      val prop = labels.leftOuterJoin(msgs).mapValues {
        case (l, m) => math.min(l, m.getOrElse(Long.MaxValue))
      }.cache()
      // pointer doubling: v jumps to its label's label (lbl(lbl(v)) ≤
      // lbl(v) since labels are monotone), so chains collapse in
      // O(log diameter) rounds instead of O(diameter)
      val next = prop.map { case (v, l) => (l, v) }
        .join(prop)
        .map { case (_, (v, ll)) => (v, ll) }
        .reduceByKey(part, (x: Long, y: Long) => math.min(x, y))
      // lineage truncation (see Scaladoc); the convergence action below
      // materializes the round either way, so the checkpoint is free of
      // extra passes
      if (checkpointEvery > 0 && (iter + 1) % checkpointEvery == 0) {
        checkpointDir match {
          case Some(_) =>
            // reliable: cache THEN checkpoint — the convergence action
            // below materializes the cache, and the checkpoint job that
            // follows it reads the cached blocks (one extra write pass,
            // zero extra compute passes)
            next.cache()
            next.checkpoint()
          case None => next.localCheckpoint()
        }
      } else next.cache()
      val s = next.aggregate(BigInt(0))((acc, kv) => acc + kv._2, _ + _)
      prop.unpersist(false)
      labels.unpersist(false)
      labels = next
      iter += 1
      converged = s == prevSum
      prevSum = s
    }
    // an unconverged exit would silently return WRONG components (the
    // oracle computes the exact transitive closure) — fail loudly instead
    // (unpersisting the final round's cached labels first: the throw path
    // must not leak a MEMORY_AND_DISK RDD for the session lifetime)
    if (!converged) {
      labels.unpersist(false)
      throw new IllegalStateException(
        s"$caller did not converge in $maxIters rounds — with pointer " +
          s"doubling that needs component diameter > ~2^$maxIters; raise maxIters")
    }
    labels
  }

  /** The keep/drop decision the whole dedup tier exists for: every
    * document's keeper is its component's min doc_id (itself when it
    * matched nothing — including sub-3-token docs that cannot shingle);
    * `keep` marks the component representative. One narrow left join of
    * the corpus ids against the (small) matched-vertex labels. */
  def dedupKeepers(documents: DataFrame, threshold: Double = DefaultThreshold,
                   maxIters: Int = 25,
                   maxDfFrac: Double = DefaultMaxDfFrac): DataFrame = {
    val labels = componentLabels(documents, threshold, maxIters, maxDfFrac)
    documents.select(col("doc_id"))
      .join(labels, col("doc_id") === col("v"), "left")
      .select(col("doc_id"),
        coalesce(col("lbl"), col("doc_id")).as("keeper_id"))
      .withColumn("keep", col("keeper_id") === col("doc_id"))
      .orderBy(col("doc_id"))
  }

  val dedupKeepersOracle: String = dedupKeepersOracleAt(DefaultThreshold)

  /** Oracle builder on the SAME threshold and df ceiling as the engine
    * function. */
  def dedupKeepersOracleAt(threshold: Double,
                           maxDfFrac: Double = DefaultMaxDfFrac): String =
    s"""WITH RECURSIVE ${oracleMinhashPairsCtes(threshold, maxDfFrac)},
      |edges AS MATERIALIZED (
      |  SELECT a, b FROM mp UNION ALL SELECT b AS a, a AS b FROM mp),
      |reach(v, w) AS (
      |  SELECT DISTINCT a AS v, a AS w FROM edges
      |  UNION
      |  SELECT r.v, e.b AS w FROM reach r JOIN edges e ON e.a = r.w),
      |comp AS (
      |  SELECT v, MIN(w) AS component FROM reach GROUP BY v)
      |SELECT d.doc_id,
      |       COALESCE(c.component, d.doc_id) AS keeper_id,
      |       COALESCE(c.component, d.doc_id) = d.doc_id AS keep
      |FROM documents d LEFT JOIN comp c ON c.v = d.doc_id
      |ORDER BY d.doc_id""".stripMargin

  val dupClustersOracle: String = dupClustersOracleAt(DefaultThreshold)

  /** Oracle builder on the SAME threshold and df ceiling as the engine
    * function. */
  def dupClustersOracleAt(threshold: Double,
                          maxDfFrac: Double = DefaultMaxDfFrac): String =
    s"""WITH RECURSIVE ${oracleMinhashPairsCtes(threshold, maxDfFrac)},
      |edges AS MATERIALIZED (
      |  SELECT a, b FROM mp UNION ALL SELECT b AS a, a AS b FROM mp),
      |reach(v, w) AS (
      |  SELECT DISTINCT a AS v, a AS w FROM edges
      |  UNION
      |  SELECT r.v, e.b AS w FROM reach r JOIN edges e ON e.a = r.w),
      |comp AS (
      |  SELECT v, MIN(w) AS component FROM reach GROUP BY v)
      |SELECT component, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |       MAX(v) AS max_doc
      |FROM comp GROUP BY component ORDER BY component""".stripMargin

  /** Quality-aware keep/drop: like [[dedupKeepers]], but each
    * component's representative is its BEST-quality member (ties → min
    * doc_id) instead of its min id — "keep the best copy", the policy a
    * real curation pipeline wants when near-dups differ in cleanliness
    * (truncation, boilerplate, OCR noise). Quality is
    * [[TextAnalysis.perDocQuality]]'s exact integer micro-units, so the
    * argmax is engine-exact.
    *
    * Scale shape: the corpus pays one extra row-local scoring pass and
    * one (doc_id, q6) exchange against the matched-vertex labels (small
    * — dup density bounds it); the argmax window runs over that small
    * joined table, and the final left joins are the [[dedupKeepers]]
    * shape. Component labels themselves are session-memoized, so a
    * session that already clustered pays only the scoring join. */
  def qualityKeepers(documents: DataFrame, threshold: Double = DefaultThreshold,
                     maxIters: Int = 25,
                     maxDfFrac: Double = DefaultMaxDfFrac): DataFrame = {
    val labels = componentLabels(documents, threshold, maxIters, maxDfFrac)
    // matched vertices always tokenize (they shingled), so the inner
    // join against the n_toks>0-filtered scoring pass loses nothing
    val scored = labels.join(
      TextAnalysis.perDocQuality(Widen.widen(documents))
        .select(col("doc_id").as("v"), col("q6")), "v")
    val best = scored
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("lbl")).orderBy(col("q6").desc, col("v").asc)))
      .filter(col("rn") === 1)
      .select(col("lbl"), col("v").as("best_id"))
    documents.select(col("doc_id"))
      .join(labels, col("doc_id") === col("v"), "left")
      .join(best, Seq("lbl"), "left")
      .select(col("doc_id"),
        coalesce(col("best_id"), col("doc_id")).as("keeper_id"))
      .withColumn("keep", col("keeper_id") === col("doc_id"))
      .orderBy(col("doc_id"))
  }

  val qualityKeepersOracle: String = qualityKeepersOracleAt(DefaultThreshold)

  /** Oracle builder on the SAME threshold and df ceiling as the engine
    * function; quality spelling identical to the q32 oracle. */
  def qualityKeepersOracleAt(threshold: Double,
                             maxDfFrac: Double = DefaultMaxDfFrac): String =
    s"""WITH RECURSIVE ${oracleMinhashPairsCtes(threshold, maxDfFrac)},
      |edges AS MATERIALIZED (
      |  SELECT a, b FROM mp UNION ALL SELECT b AS a, a AS b FROM mp),
      |reach(v, w) AS (
      |  SELECT DISTINCT a AS v, a AS w FROM edges
      |  UNION
      |  SELECT r.v, e.b AS w FROM reach r JOIN edges e ON e.a = r.w),
      |comp AS (
      |  SELECT v, MIN(w) AS component FROM reach GROUP BY v),
      |q AS (
      |  SELECT doc_id,
      |         CAST(floor((
      |           0.4 * least(CAST(len(ts) AS DOUBLE) / 100.0, 1.0) +
      |           0.3 * (CAST(len(list_distinct(ts)) AS DOUBLE) / len(ts)) +
      |           0.3 * least((CAST(list_sum(list_transform(ts, t -> length(t))) AS DOUBLE) / len(ts)) / 8.0, 1.0)
      |         ) * 1000000 + 0.5) AS BIGINT) AS q6
      |  FROM (SELECT doc_id, string_split_regex(lower(text), '\\s+') AS ts FROM documents)
      |  WHERE len(ts) > 0),
      |best AS (
      |  SELECT component, v AS best_id,
      |         row_number() OVER (PARTITION BY component ORDER BY q6 DESC, v ASC) AS rn
      |  FROM comp JOIN q ON q.doc_id = comp.v)
      |SELECT d.doc_id,
      |       COALESCE(b.best_id, d.doc_id) AS keeper_id,
      |       COALESCE(b.best_id, d.doc_id) = d.doc_id AS keep
      |FROM documents d
      |LEFT JOIN comp c ON c.v = d.doc_id
      |LEFT JOIN best b ON b.component = c.component AND b.rn = 1
      |ORDER BY d.doc_id""".stripMargin

  // --------------------------------------------------------------------
  // SimHash: 32-bit fingerprint over the shingle set; near-dup pairs found
  // by byte-banding (pigeonhole: hamming ≤ 3 ⇒ at least one of the 4 bytes
  // is identical, so banding is exact — no recall loss at the threshold).
  // --------------------------------------------------------------------
  /** 32-bit simhash over a shingle set, compiled: one md5 per shingle
    * and the bit-vote loop in JVM code. Equivalent to the SQL form
    * `sign(Σ ±1 per bit of conv(substr(md5('0:'||x),1,8),16,10))` the
    * oracle evaluates — but immune to Catalyst's project-collapsing,
    * which would otherwise re-evaluate the md5 chain once per bit and
    * once per join branch (measured 600+ s vs ~1 s at sf0.1). */
  private val simhashUdf = udf { sset: Seq[String] =>
    val md = java.security.MessageDigest.getInstance("MD5")
    val votes = new Array[Int](32)
    sset.foreach { s =>
      val d = md.digest(("0:" + s).getBytes("UTF-8"))
      val h = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      var b = 0
      while (b < 32) {
        if (((h >> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
    }
    var fp = 0L
    var b = 0
    while (b < 32) { if (votes(b) > 0) fp |= 1L << b; b += 1 }
    fp
  }

  /** Per-band (index, bit offset, width) for a 32-bit fingerprint split
    * into maxHamming+1 contiguous slices — the pigeonhole guarantee:
    * hamming ≤ maxHamming flips fewer bits than there are bands, so at
    * least one band is untouched and the pair shares that band_key.
    * Shared by the engine and the oracle builder so the banding can
    * never drift. For the default maxHamming=3 this is exactly the
    * original 4×8-bit byte banding. */
  private[operators] def simhashBands(maxHamming: Int): Seq[(Int, Int, Int)] = {
    require(maxHamming >= 0 && maxHamming <= 31,
      s"simhash banding needs 0 <= maxHamming <= 31, got $maxHamming")
    val nBands = maxHamming + 1
    val widths = Array.tabulate(nBands)(i => 32 / nBands + (if (i < 32 % nBands) 1 else 0))
    val offsets = widths.scanLeft(0)(_ + _)
    (0 until nBands).map(i => (i, offsets(i), widths(i)))
  }

  def simhashDedup(documents: DataFrame, maxHamming: Int = 3,
                   maxCandidates: Long = 20000000000L): DataFrame = {
    // band count DERIVES from maxHamming (bands = maxHamming+1): a fixed
    // byte banding would silently miss pairs once maxHamming > 3 (all
    // four bytes touched, no shared band, pair never a candidate)
    val keyExprs = simhashBands(maxHamming).map { case (i, off, w) =>
      s"concat_ws(':', $i, shiftright(fp, $off) & ${(1L << w) - 1})"
    }
    val fps = shingled(documents).select(col("doc_id"), simhashUdf(col("sset")).as("fp"))
    val banded = fps.select(col("doc_id"), col("fp"),
      explode(expr(s"array(${keyExprs.mkString(", ")})")).as("band_key"))
      // exchange barrier: materialize fingerprints once; both self-join
      // branches read the same shuffle output (ReusedExchange) instead of
      // re-deriving the whole md5 pipeline per branch
      .repartition(col("band_key"))
    // Candidate-volume tripwire (the q123/q88 guard pattern): with
    // B = maxHamming+1 bands over the 32-bit fingerprint, RANDOM band
    // collisions alone contribute ~B·n²/2^(32/B) pair evaluations — at
    // the default 8-bit bands that is quadratic CPU inside the band
    // join (measured at the 100× fixture: 9.5× time on 3.3× docs with
    // flat shuffle-io — the collisions never leave the join stage, so
    // only time betrays them). The exact volume is Σ c·(c−1)/2 over
    // band-value counts — one linear rollup off the banded exchange —
    // and past the bound the query raises with remediation (shard the
    // corpus, or raise maxHamming's signature width upstream) instead
    // of silently burning cluster-days.
    val vol = broadcast(banded.groupBy(col("band_key"))
      .agg(count(lit(1)).as("c"))
      .agg(coalesce(sum(expr("c * (c - 1) DIV 2")), lit(0L)).as("cand_vol")))
    val gated = banded.crossJoin(vol)
      .select(col("doc_id"), col("fp"),
        expr(s"""CASE WHEN cand_vol > ${maxCandidates}L
          |  THEN CAST(raise_error(concat('simhashDedup: ', cand_vol,
          |    ' band-collision candidates > maxCandidates $maxCandidates',
          |    ' — the corpus has outgrown the fingerprint banding;',
          |    ' shard the input or raise the bound')) AS STRING)
          |  ELSE band_key END""".stripMargin).as("band_key"))
    gated.as("x").join(banded.as("y"), "band_key")
      .filter(col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"),
        expr("bit_count(x.fp ^ y.fp)").as("hamming"))
      // filter BEFORE distinct: hamming is a function of (a, b), so the
      // reorder is identity — but the distinct's exchange now carries
      // only plausible pairs instead of every random band collision
      .filter(col("hamming") <= maxHamming)
      .distinct()
      .orderBy(col("a"), col("b"))
  }

  val simhashDedupOracle: String = simhashDedupOracleAt(3)

  /** Oracle builder on the SAME maxHamming (and derived banding) as the
    * engine function. */
  def simhashDedupOracleAt(maxHamming: Int): String = {
    val bandExprs = simhashBands(maxHamming).map { case (i, off, w) =>
      s"concat_ws(':', $i, (fp >> $off) & ${(1L << w) - 1})"
    }
    s"""WITH $oracleShingled,
      |fps AS (
      |  SELECT doc_id,
      |         CAST(list_sum(list_transform(range(0, 32), b ->
      |           CASE WHEN list_sum(list_transform(sset, x ->
      |                  CASE WHEN (CAST(concat('0x', substr(md5(concat('0:', x)), 1, 8)) AS BIGINT) >> b) & 1 = 1
      |                       THEN 1 ELSE -1 END)) > 0
      |                THEN CAST(1 AS BIGINT) << b ELSE 0 END)) AS BIGINT) AS fp
      |  FROM sh),
      |banded AS (
      |  SELECT doc_id, fp, t.band_key
      |  FROM fps, unnest([${bandExprs.mkString(", ")}]) AS t(band_key)),
      |pairs AS (
      |  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b,
      |         CAST(bit_count(xor(x.fp, y.fp)) AS INT) AS hamming
      |  FROM banded x JOIN banded y ON x.band_key = y.band_key AND x.doc_id < y.doc_id)
      |SELECT a, b, hamming FROM pairs WHERE hamming <= $maxHamming ORDER BY a, b""".stripMargin
  }

  // --------------------------------------------------------------------
  // Direct n-gram Jaccard, blocked on (length bucket ∧ minhash band).
  // Staggered length buckets (width 16, offset 8) are exact for
  // SIMILAR-LENGTH near-dups (edit-style edits, boilerplate variants —
  // any pair within 8 chars of each other always shares a bucket) but
  // deliberately exclude containment-style dups whose lengths differ by
  // more than the bucket width (a doc plus a long appended suffix) —
  // those are [[minhashDedup]]'s domain, which has no length blocking.
  // Length buckets alone would also go QUADRATIC at corpus scale —
  // document lengths concentrate, so hot buckets hold O(corpus) docs.
  // Conjoining each
  // length bucket with a threshold-derived minhash band key subdivides
  // every hot bucket by content: unrelated same-length docs land in
  // different bands (random band collision ~ 1/P per row), while a pair
  // at jaccard ≥ t still shares ≥1 of the b bands with ≥92% probability
  // ([[lshBanding]]). Candidate volume drops from Σ bucket² to
  // O(docs·b + true-dup pairs); precision stays exact via verification.
  // --------------------------------------------------------------------
  /** Sorted distinct 32-bit md5 hashes of the 3-token shingles — the JVM
    * twin of `sort_array(array_distinct(transform(..., md5-conv)))`,
    * verified element-identical against the SQL chain. */
  private[operators] val hsetUdf = udf { toks: Seq[String] =>
    val md = java.security.MessageDigest.getInstance("MD5")
    val set = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i + 2 < toks.length) {
      val d = md.digest((toks(i) + " " + toks(i + 1) + " " + toks(i + 2)).getBytes("UTF-8"))
      val h = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      set.add(h); ()
      i += 1
    }
    val out = new Array[Long](set.size)
    val it = set.iterator
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    out
  }

  /** All n affine-permutation minima of an already-hashed shingle set in
    * one compiled pass — the JVM twin of
    * `array_min(transform(hset, h -> (A·(h%P)+B) % P))` per permutation,
    * element-identical by construction (same constants, same mod-p). */
  private[operators] def permMinsUdf(n: Int) = udf { hset: Seq[Long] =>
    val as = Array.tabulate(n)(permA)
    val bs = Array.tabulate(n)(permB)
    val mins = Array.fill(n)(Long.MaxValue)
    hset.foreach { h0 =>
      val h = h0 % P
      var s = 0
      while (s < n) {
        val v = (as(s) * h + bs(s)) % P
        if (v < mins(s)) mins(s) = v
        s += 1
      }
    }
    mins
  }

  def ngramJaccard(documents: DataFrame,
                   threshold: Double = DefaultThreshold,
                   maxDfFrac: Double = DefaultMaxDfFrac): DataFrame =
    ngramPairs(documents, threshold, maxDfFrac)
      .select(col("a"), col("b"), round(col("jac"), 4).as("jaccard"))
      .orderBy(col("a"), col("b"))

  /** The ngram tier's verified pairs — session-memoized and eagerly
    * materialized like [[verifiedPairs]], sharing the same
    * template-shingle [[dfFiltered]] pass: without it, a corpus-wide
    * boilerplate window puts the SAME minhash minima in a constant
    * fraction of docs and the (length-bucket ∧ band) cells go
    * quadratic — measured at the 100× skewed fixture as 29× time /
    * 19× shuffle-io on 3.3× data before the filter (BENCH_NOTES round
    * 9); with it the tier returns to the O(docs·b) candidate contract
    * the blocking is built for. */
  private def ngramPairs(documents: DataFrame, threshold: Double,
                         maxDfFrac: Double): DataFrame =
    memoized(documents, s"ngrampairs:df$maxDfFrac", threshold) {
      graft.functions.GraftFunctions.register(documents.sparkSession)
      val (b, r) = lshBanding(threshold)
      // Shingles are 32-bit-hashed BEFORE the pairwise stage:
      // intersecting bigint arrays is far cheaper than string arrays,
      // and at 100 TB the hashed sets are also what you'd ship through
      // the shuffle (8 bytes per shingle instead of the text).
      // Tokenization stays in SQL (the oracle's split/lower must match
      // bit-for-bit); the md5+distinct+sort stage is a compiled UDF —
      // measured ~1.8× the SQL expression chain. Persist+widen: the
      // hashing pass has FOUR consumers (df-filter aggregation, banding
      // scan, both verify joins) and must neither re-run per consumer
      // nor serialize onto one core for single-row-group inputs.
      val sh0 = Widen.widen(documents)
        .select(col("doc_id"), col("n_chars"),
          split(lower(col("text")), "\\s+").as("toks"))
        .filter(size(col("toks")) >= 3)
        .select(col("doc_id"), col("n_chars"), hsetUdf(col("toks")).as("hset"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        val sh = dfFiltered(sh0, maxDfFrac)
        // 2 staggered length buckets × b minhash bands per doc. The
        // minhash mins reuse hset's md5 values through the shared mod-p
        // permutations (same constants as minhashDedup), so banding
        // costs b·r affine passes over already-hashed ints — no second
        // md5 of the corpus. The mins are computed in ONE compiled pass
        // ([[permMinsUdf]]): Spark's higher-order
        // array_min(transform(...)) is interpreted (CodegenFallback),
        // and b·r per-element lambda evaluations per doc dominated the
        // query at corpus scale.
        val lbs = Seq("CAST(floor(n_chars/16) AS BIGINT)",
          "CAST(floor((n_chars+8)/16) AS BIGINT) + 1000000")
        val keyExprs = for (lb <- lbs; i <- 0 until b) yield {
          val mins = (0 until r).map(k => s"mins[${i * r + k}]")
          s"concat_ws('|', $lb, $i, ${mins.mkString(", ")})"
        }
        val bucketed = sh
          .select(col("doc_id"), col("n_chars"), permMinsUdf(b * r)(col("hset")).as("mins"))
          .select(col("doc_id"), explode(expr(s"array(${keyExprs.mkString(", ")})")).as("bucket"))
          .repartition(col("bucket")) // band keys materialize once for both branches
        val cand = bucketed.as("x").join(bucketed.as("y"), "bucket")
          .filter(col("x.doc_id") < col("y.doc_id"))
          .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
          .distinct()
        val out = verifyJaccardRaw(cand, sh, threshold)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        out.count()
        out
      } finally sh0.unpersist(false)
    }

  /** Exact-jaccard verification of candidate (a, b) pairs against the
    * hashed shingle sets, returning raw (a, b, jac) — the shape the
    * memoized minhash/ngram pairs stages store for their downstream
    * consumers. graft_sorted_intersect_size is a codegen'd merge walk
    * directly over the Tungsten arrays (a Scala UDF would copy both
    * arrays per pair); the algebraic prefilter
    * jac≥t ⟺ inter ≥ t/(1+t)·(|A|+|B|) evaluates the intersect ONCE per
    * candidate, the division only for survivors (clustering joins on
    * (a, b); only the q25/q27 listings round for presentation). */
  private def verifyJaccardRaw(cand: DataFrame, sh: DataFrame,
                               threshold: Double): DataFrame =
    verifyJaccardTwoSided(cand, sh, sh, threshold)

  /** Two-sided form of the verify stage: the `a` side's shingle sets
    * come from `shA`, the `b` side's from `shB` — the shape the
    * admission probe needs (batch shingles in-session, base shingles
    * from the persisted index scan). The one-corpus callers pass the
    * same frame twice. */
  private[operators] def verifyJaccardTwoSided(cand: DataFrame,
      shA: DataFrame, shB: DataFrame, threshold: Double): DataFrame = {
    val d = threshold / (1.0 + threshold)
    cand
      .join(shA.select(col("doc_id"), col("hset").as("sa")), cand("a") === col("doc_id")).drop("doc_id")
      .join(shB.select(col("doc_id"), col("hset").as("sb")), cand("b") === col("doc_id")).drop("doc_id")
      .select(col("a"), col("b"),
        expr("graft_sorted_intersect_size(sa, sb)").as("inter"),
        (size(col("sa")) + size(col("sb"))).as("stot"))
      .filter(col("inter") >= lit(d) * col("stot"))
      .select(col("a"), col("b"),
        (col("inter") / (col("stot") - col("inter")).cast("double")).as("jac"))
      .filter(col("jac") >= threshold) // exact belt for arbitrary thresholds
  }

  val ngramJaccardOracle: String = ngramJaccardOracleAt(DefaultThreshold)

  /** Oracle builder parameterized on the SAME threshold as the engine
    * function, so calling [[ngramJaccard]] at a non-default threshold can
    * be paired with a matching-banding oracle. */
  def ngramJaccardOracleAt(threshold: Double,
                           maxDfFrac: Double = DefaultMaxDfFrac): String = {
    val (b, r) = lshBanding(threshold)
    val lbs = Seq("CAST(floor(n_chars/16) AS BIGINT)",
      "CAST(floor((n_chars+8)/16) AS BIGINT) + 1000000")
    val keyExprs = for (lb <- lbs; i <- 0 until b) yield {
      val mins = (0 until r).map { k =>
        val s = i * r + k
        s"list_min(list_transform(hset, h -> (${permA(s)} * (h % $P) + ${permB(s)}) % $P))"
      }
      s"concat_ws('|', $lb, $i, ${mins.mkString(", ")})"
    }
    // same template-shingle df-filter as [[oracleMinhashPairsCtes]],
    // carrying n_chars through for the length buckets
    val dfCtes =
      if (maxDfFrac >= 1.0)
        "shf AS MATERIALIZED (SELECT doc_id, n_chars, hset FROM sh)"
      else
        s"""nd AS (SELECT COUNT(*) AS n FROM sh),
          |sdf AS (
          |  SELECT h, COUNT(*) AS df
          |  FROM (SELECT unnest(hset) AS h FROM sh) GROUP BY h),
          |hot AS (
          |  SELECT coalesce(list(h), CAST([] AS BIGINT[])) AS hl
          |  FROM sdf, nd WHERE df > greatest($maxDfFrac * n, $DfFloorDocs)),
          |shf AS MATERIALIZED (
          |  SELECT doc_id, n_chars, hset FROM (
          |    SELECT doc_id, n_chars,
          |           list_filter(hset, x -> NOT list_contains(hl, x)) AS hset
          |    FROM sh, hot)
          |  WHERE len(hset) > 0)""".stripMargin
    s"""WITH toks AS (
      |  SELECT doc_id, n_chars, string_split_regex(lower(text), '\\s+') AS ts FROM documents),
      |sh AS MATERIALIZED (
      |  SELECT doc_id, n_chars,
      |         list_distinct([CAST(concat('0x', substr(md5(ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2]), 1, 8)) AS BIGINT)
      |                        for i in range(1, len(ts)-1)]) AS hset
      |  FROM toks WHERE len(ts) >= 3),
      |$dfCtes,
      |bucketed AS (
      |  SELECT doc_id, unnest([${keyExprs.mkString(",\n      |          ")}]) AS bucket
      |  FROM shf),
      |cand AS (
      |  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
      |  FROM bucketed x JOIN bucketed y ON x.bucket = y.bucket AND x.doc_id < y.doc_id),
      |pairs AS (
      |  SELECT c.a, c.b,
      |         len(list_intersect(sa.hset, sb.hset)) /
      |           CAST(len(sa.hset) + len(sb.hset) - len(list_intersect(sa.hset, sb.hset)) AS DOUBLE) AS jac
      |  FROM cand c JOIN shf sa ON sa.doc_id = c.a JOIN shf sb ON sb.doc_id = c.b)
      |SELECT a, b, ROUND(jac, 4) AS jaccard FROM pairs WHERE jac >= $threshold ORDER BY a, b""".stripMargin
  }

  // --------------------------------------------------------------------
  // Duplicated-span profile — the scan-level audit run BEFORE committing
  // to an exact-substring dedup pass ("how much of each document is
  // copied text", cf. Lee et al. 2022, Deduplicating Training Data Makes
  // Language Models Better, §4.1). Spans are POSITIONAL overlapping
  // k-token windows, deliberately unlike the ngram tier's distinct
  // shingle SETS: a doc that repeats one sentence 50 times has 50
  // duplicated span positions but only a handful of distinct shingles,
  // and it is the positional mass that measures removable bytes. A span
  // position counts as duplicated when its 32-bit hash occurs >= 2 times
  // corpus-wide (across docs or within one — both are copies).
  //
  // Scale shape: positions collapse to (doc_id, h, c) triples in the
  // partial aggregate BEFORE any shuffle (raw span rows never cross the
  // wire). The corpus-wide test "does h occur >= 2 times" is NOT joined
  // back onto the triples (a window over them needs a full h-sort and
  // then re-shuffles every triple to the doc rollup — measured as the
  // suite's heaviest executor plan): instead n_dup_spans is computed by
  // complement, n_spans − (spans this doc solely owns with c = 1). A
  // g = 1 span has exactly one (doc, h, 1) row corpus-wide, so the
  // h-rollup itself can name the owning doc (min = only), and every
  // stage after the triple collapse is a hash aggregate whose exchange
  // carries partial-agg-compressed counts — no sort anywhere, and the
  // final join is #docs-sized per side. Every shuffled row is a ~20-byte
  // triple or smaller — the wordcount shape end to end.
  // --------------------------------------------------------------------
  /** Default span width. 5 tokens ≈ the shortest run worth calling
    * "copied text" at web scale while still yielding len−4 spans on the
    * fixture's ~30-token docs (k=50-token spans as in the paper need
    * long-form documents). */
  val DefaultSpanTokens = 5

  // span hashing is the codegen'd
  // [[graft.functions.SpanHashesExpression]] (`graft_span_hashes(toks,
  // k)`): same md5-derived 32-bit value as [[hsetUdf]] so the DuckDB
  // oracle recomputes it exactly; vs the Scala UDF it replaced it reads
  // the Tungsten array in place (no ArrayData→Seq deserialization) and
  // encodes each token's bytes once per row instead of once per span.

  /** Per-doc duplicated-span profile: doc_id, n_spans, n_dup_spans and
    * the duplicated fraction in basis points (integer-only output — no
    * float crosses the engine boundary). */
  def dupSpans(documents: DataFrame, k: Int = DefaultSpanTokens): DataFrame = {
    require(k >= 2, s"span width must be >= 2 tokens, got $k")
    graft.functions.GraftFunctions.register(documents.sparkSession)
    val perDoc = Widen.widen(documents)
      .select(col("doc_id"), split(lower(col("text")), "\\s+").as("toks"))
      .filter(size(col("toks")) >= k)
      .select(col("doc_id"),
        explode(expr(s"graft_span_hashes(toks, $k)")).as("h"))
      .groupBy(col("doc_id"), col("h"))
      .agg(count(lit(1)).as("c"))
    // corpus-wide singles: g = 1 ⟺ one doc, one occurrence — min(doc_id)
    // IS the owner; collapses to ≤ #docs rows before its exchange
    val singles = perDoc
      .groupBy(col("h"))
      .agg(sum(col("c")).as("g"), min(col("doc_id")).as("doc_id"))
      .filter(col("g") === 1L)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_single"))
    perDoc
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_spans"))
      .join(singles, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_spans"),
        (col("n_spans") - coalesce(col("n_single"), lit(0L))).as("n_dup_spans"))
      .select(col("doc_id"), col("n_spans"), col("n_dup_spans"),
        expr("CAST(n_dup_spans * 10000L DIV n_spans AS BIGINT)").as("dup_bp"))
      .orderBy(col("doc_id"))
  }

  /** Duplicated-span SCRUB — the EDIT form of [[dupSpans]]'s audit
    * (Lee et al. 2022 §4.1 as a transform, not a report): every token
    * covered by a k-token span occurring ≥ 2 times CORPUS-WIDE is
    * removed, and the cleaned text re-emitted for the docs that
    * changed — the boilerplate/template scrub a curation pipeline runs
    * where dropping whole documents (the q24–q27 tiers) would throw
    * away the unique remainder. Deliberately scrub-ALL (every
    * occurrence goes, including the "first"): keep-one needs a global
    * occurrence ordering — an inherently sequential tiebreak; the
    * doc-level keeper tier (q77) already covers keep-best semantics.
    * Same 32-bit span hash as [[dupSpans]] on BOTH engines, so the two
    * views agree on what a repeated span is (and a within-corpus hash
    * collision scrubs identically on both sides).
    *
    * Scale shape: corpus-wide exchanges carry (doc_id, pos, h)
    * triples — never text; ONE h-keyed exchange feeds both the
    * duplicate-count aggregation and the duplicated-start join
    * (ReusedExchange, the [[sourceOverlap]] barrier pattern);
    * duplicated START positions collapse to one bounded int-list row
    * per affected doc before the single doc-keyed join that fetches
    * text for AFFECTED docs only; the rebuild is one compiled
    * row-local pass. */
  def scrubDupSpans(documents: DataFrame,
                    k: Int = DefaultSpanTokens): DataFrame = {
    require(k >= 2, s"span width must be >= 2 tokens, got $k")
    graft.functions.GraftFunctions.register(documents.sparkSession)
    val occ = Widen.widen(documents)
      .select(col("doc_id"), split(lower(col("text")), "\\s+").as("lt"))
      .filter(size(col("lt")) >= k)
      .select(col("doc_id"),
        posexplode(expr(s"graft_span_hashes(lt, $k)")))
      .toDF("doc_id", "pos", "h")
      // barrier: one h-keyed exchange feeds BOTH the count and the
      // start join (ReusedExchange) instead of re-deriving the span
      // explosion per branch
      .repartition(col("h"))
    val dupH = occ.groupBy(col("h"))
      .agg(count(lit(1)).as("g")).filter(col("g") >= 2).select(col("h"))
    val starts = occ.join(dupH, Seq("h"))
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(col("pos"))).as("starts"))
    Widen.widen(documents)
      .join(starts, Seq("doc_id"))
      .select(col("doc_id"),
        scrubUdf(k)(split(col("text"), "\\s+"), col("starts")).as("r"))
      .select(col("doc_id"), col("r._1").as("n_tokens"),
        col("r._2").as("n_removed"), col("r._3").as("clean_text"))
      .orderBy(col("doc_id"))
  }

  /** Row-local rebuild: mark [s, s+k) covered for every duplicated
    * start, emit kept ORIGINAL-case tokens space-joined. Compiled UDF —
    * per-token lambda work at corpus scale is the interpreted
    * higher-order-function trap. */
  private def scrubUdf(k: Int) = udf { (toks: Seq[String], starts: Seq[Int]) =>
    val n = toks.length
    val covered = new Array[Boolean](n)
    starts.foreach { s =>
      var i = s
      val e = math.min(s + k - 1, n - 1)
      while (i <= e) { covered(i) = true; i += 1 }
    }
    val sb = new java.lang.StringBuilder()
    var removed = 0
    var i = 0
    while (i < n) {
      if (covered(i)) removed += 1
      else {
        if (sb.length > 0) sb.append(' ')
        sb.append(toks(i)); ()
      }
      i += 1
    }
    (n.toLong, removed.toLong, sb.toString)
  }

  val scrubDupSpansOracle: String = scrubDupSpansOracleAt(DefaultSpanTokens)

  /** Oracle builder on the SAME span width; 1-based positions where the
    * engine is 0-based (internal to each side). The parallel `unnest`s
    * zip in DuckDB; `string_agg` skips the CASE's NULLs, so kept tokens
    * join in position order. */
  def scrubDupSpansOracleAt(k: Int): String =
    s"""WITH toks AS (
      |  SELECT doc_id, string_split_regex(lower(text), '\\s+') AS lts,
      |         string_split_regex(text, '\\s+') AS ots
      |  FROM documents
      |  WHERE len(string_split_regex(lower(text), '\\s+')) >= $k),
      |spans AS (
      |  SELECT doc_id,
      |         unnest([CAST(concat('0x', substr(md5(array_to_string(lts[i:i+${k - 1}], ' ')), 1, 8)) AS BIGINT)
      |                 for i in range(1, len(lts) - ${k - 2})]) AS h,
      |         unnest([i for i in range(1, len(lts) - ${k - 2})]) AS s
      |  FROM toks),
      |dup AS (SELECT h FROM spans GROUP BY h HAVING COUNT(*) >= 2),
      |starts AS (SELECT DISTINCT doc_id, s FROM spans JOIN dup USING (h)),
      |positions AS (
      |  SELECT doc_id, unnest([i for i in range(1, len(ots) + 1)]) AS pos,
      |         unnest(ots) AS tok
      |  FROM toks),
      |covered AS (
      |  SELECT DISTINCT p.doc_id, p.pos
      |  FROM positions p JOIN starts d
      |    ON d.doc_id = p.doc_id AND p.pos BETWEEN d.s AND d.s + ${k - 1}),
      |scrubbed AS (
      |  SELECT p.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
      |         CAST(count(c.pos) AS BIGINT) AS n_removed,
      |         coalesce(string_agg(CASE WHEN c.pos IS NULL THEN p.tok END,
      |                             ' ' ORDER BY p.pos), '') AS clean_text
      |  FROM positions p LEFT JOIN covered c
      |    ON c.doc_id = p.doc_id AND c.pos = p.pos
      |  GROUP BY p.doc_id)
      |SELECT doc_id, n_tokens, n_removed, clean_text
      |FROM scrubbed WHERE n_removed > 0 ORDER BY doc_id""".stripMargin

  val dupSpansOracle: String = dupSpansOracleAt(DefaultSpanTokens)

  /** Oracle builder on the SAME span width as the engine function. */
  def dupSpansOracleAt(k: Int): String =
    s"""WITH toks AS (
      |  SELECT doc_id, string_split_regex(lower(text), '\\s+') AS ts FROM documents),
      |spans AS (
      |  SELECT doc_id,
      |         unnest([CAST(concat('0x', substr(md5(array_to_string(ts[i:i+${k - 1}], ' ')), 1, 8)) AS BIGINT)
      |                 for i in range(1, len(ts) - ${k - 2})]) AS h
      |  FROM toks WHERE len(ts) >= $k),
      |perdoc AS (
      |  SELECT doc_id, h, CAST(COUNT(*) AS BIGINT) AS c FROM spans GROUP BY 1, 2),
      |withg AS (
      |  SELECT doc_id, c, SUM(c) OVER (PARTITION BY h) AS g FROM perdoc)
      |SELECT doc_id,
      |       CAST(SUM(c) AS BIGINT) AS n_spans,
      |       CAST(SUM(CASE WHEN g >= 2 THEN c ELSE 0 END) AS BIGINT) AS n_dup_spans,
      |       CAST(SUM(CASE WHEN g >= 2 THEN c ELSE 0 END) * 10000 // SUM(c) AS BIGINT) AS dup_bp
      |FROM withg GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // --------------------------------------------------------------------
  // Cross-source duplication matrix: which sources copy from which.
  // A (src_a, src_b) cell counts the DISTINCT k-token span hashes
  // present in both sources ([[dupSpans]]' span hash, so the two
  // profiles agree on what a "repeated span" is), plus each side's own
  // distinct-span count and the overlap as per-mille of the smaller
  // side — the provenance view a curation pipeline needs before
  // deciding which of two overlapping crawls to keep. Exact-fingerprint
  // overlap ([[exactDedup]]'s fp) is the wrong granularity here:
  // cross-source copying is span-level (templates, syndication), not
  // whole-document.
  //
  // Scale shape: spans collapse to DISTINCT (source, h) pairs map-side
  // before any shuffle (8 B hash + source id per row — never the text);
  // the h-keyed self-join groups are bounded by |sources| per hash, so
  // the join output is ≤ |H|·|S|²; per-source totals are a |S|-row
  // aggregate broadcast back onto the ≤ |S|²/2-row pair table. One
  // corpus scan, one (source, h) exchange, one h-keyed barrier
  // exchange reused by both join branches.
  // --------------------------------------------------------------------
  def sourceOverlap(documents: DataFrame, k: Int = DefaultSpanTokens): DataFrame = {
    require(k >= 2, s"span width must be >= 2 tokens, got $k")
    graft.functions.GraftFunctions.register(documents.sparkSession)
    val spans = Widen.widen(documents)
      .select(col("source"), split(lower(col("text")), "\\s+").as("toks"))
      .filter(size(col("toks")) >= k)
      .select(col("source"),
        explode(expr(s"graft_span_hashes(toks, $k)")).as("h"))
      .distinct()
      // barrier: one h-keyed exchange feeds BOTH self-join branches
      // (ReusedExchange) instead of re-deriving the span explosion per
      // branch (the CollapseProject trap — see simhashDedup)
      .repartition(col("h"))
    val perSource = spans.groupBy(col("source"))
      .agg(count(lit(1)).as("n_spans"))
    val pairs = spans.as("x").join(spans.as("y"), "h")
      .filter(col("x.source") < col("y.source"))
      .groupBy(col("x.source").as("src_a"), col("y.source").as("src_b"))
      .agg(count(lit(1)).as("shared_spans"))
    pairs
      .join(broadcast(perSource.withColumnRenamed("source", "src_a")
        .withColumnRenamed("n_spans", "a_spans")), Seq("src_a"))
      .join(broadcast(perSource.withColumnRenamed("source", "src_b")
        .withColumnRenamed("n_spans", "b_spans")), Seq("src_b"))
      .select(col("src_a"), col("src_b"), col("shared_spans"),
        col("a_spans"), col("b_spans"),
        expr("shared_spans * 1000L DIV least(a_spans, b_spans)").as("overlap_pm"))
      .orderBy(col("src_a"), col("src_b"))
  }

  val sourceOverlapOracle: String = sourceOverlapOracleAt(DefaultSpanTokens)

  /** Oracle builder on the SAME span width (and 32-bit md5-prefix span
    * hash) as the engine function. */
  def sourceOverlapOracleAt(k: Int): String =
    s"""WITH toks AS (
      |  SELECT source, string_split_regex(lower(text), '\\s+') AS ts FROM documents),
      |sp AS MATERIALIZED (
      |  SELECT DISTINCT source,
      |         unnest([CAST(concat('0x', substr(md5(array_to_string(ts[i:i+${k - 1}], ' ')), 1, 8)) AS BIGINT)
      |                 for i in range(1, len(ts) - ${k - 2})]) AS h
      |  FROM toks WHERE len(ts) >= $k),
      |cnt AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n FROM sp GROUP BY source),
      |pairs AS (
      |  SELECT x.source AS src_a, y.source AS src_b, CAST(COUNT(*) AS BIGINT) AS shared_spans
      |  FROM sp x JOIN sp y ON x.h = y.h AND x.source < y.source
      |  GROUP BY 1, 2)
      |SELECT src_a, src_b, shared_spans,
      |       ca.n AS a_spans, cb.n AS b_spans,
      |       CAST(shared_spans * 1000 // least(ca.n, cb.n) AS BIGINT) AS overlap_pm
      |FROM pairs JOIN cnt ca ON ca.source = src_a JOIN cnt cb ON cb.source = src_b
      |ORDER BY src_a, src_b""".stripMargin

  // --------------------------------------------------------------------
  // Template-opener clusters: documents sharing their EXACT first-P
  // tokens — the prefix form of duplication (boilerplate headers,
  // scraped navigation preambles, form letters) that window-based span
  // matching (q69/q75) dilutes because it weighs the whole document.
  // The prefix fingerprint is md5 over the first P tokens of the SAME
  // lower/whitespace tokenization as the rest of the text tier, so the
  // oracle recomputes it bit-identically.
  //
  // Scale shape: purely row-local fingerprinting (one md5 over ≤P
  // tokens per doc — the tail of the document is never materialized),
  // then ONE partial-agg exchange on the 16-byte fingerprint; output
  // is only the ≥2-doc clusters. The md5 key is uniformly distributed
  // by construction — a billion-doc corpus with one mega-template
  // still aggregates it map-side before the shuffle.
  // --------------------------------------------------------------------
  def prefixDups(documents: DataFrame, prefixTokens: Int = 4): DataFrame =
    Widen.widen(documents)
      .select(col("doc_id"), col("source"),
        md5(concat_ws(" ",
          expr(s"slice(split(lower(text), '\\\\s+'), 1, $prefixTokens)")))
          .as("pfp"))
      .groupBy(col("pfp"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("source")).as("n_sources"),
        min(col("doc_id")).as("min_doc"))
      .filter(col("n_docs") >= 2)
      .orderBy(col("pfp"))

  val prefixDupsOracle: String = prefixDupsOracleAt(4)

  /** Oracle builder on the SAME prefix width as the engine function. */
  def prefixDupsOracleAt(p: Int): String =
    s"""WITH f AS (
      |  SELECT doc_id, source,
      |         md5(array_to_string(string_split_regex(lower(text), '\\s+')[1:$p], ' ')) AS pfp
      |  FROM documents)
      |SELECT pfp, CAST(count(*) AS BIGINT) AS n_docs,
      |       CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
      |       MIN(doc_id) AS min_doc
      |FROM f GROUP BY pfp HAVING count(*) >= 2 ORDER BY pfp""".stripMargin
}
