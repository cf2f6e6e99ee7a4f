package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted near-dup admission index — the durable form of the
  * incremental admission gate (q130).
  *
  * `Dedup.incrementalDedup` already avoids base×base pairs, but it
  * re-shingles and re-signs the ENTIRE base corpus on every invocation:
  * per-ingest cost is O(base), which at 100 TB is a full-corpus pass per
  * ingest — the exact thing an admission gate exists to avoid. This
  * module splits the computation at its natural persistence boundary
  * (the reference's analog: the plants task precomputes its ownership
  * map once and every later request is a lookup,
  * plants_classifier.py:206–219):
  *
  *  - [[buildIndex]] runs ONCE per base snapshot: shingle → hot-set →
  *    minhash-sign the base, then sink three parquet tables under one
  *    index directory:
  *      `hot/`   the template-shingle hot set (KB-scale),
  *      `hsets/` (doc_id, hset, sig), directory-partitioned by
  *               `doc_bucket = pmod(hash(doc_id), DocBuckets)`,
  *      `bands/` (doc_id, band_key), directory-partitioned by
  *               `band_bucket = pmod(hash(band_key), BandBuckets)`.
  *  - [[probePairs]] runs PER INGEST: shingle/sign only the batch
  *    (O(batch)), then read only the index partitions the batch's band
  *    keys / candidate doc ids hash into — partition pruning makes
  *    per-ingest base IO proportional to the touched buckets, not the
  *    corpus, and nothing base-side is ever re-shingled or re-signed.
  *
  * Directory-partitioned parquet, deliberately NOT a catalog-bucketed
  * table (`Sources.writeBucketed`): bucket metadata lives in the
  * catalog, and the default in-memory catalog does not survive the JVM —
  * a fresh session (every driver Verify/Bench run; every real cluster
  * job) would read the files un-bucketed and lose the pruning. Partition
  * directories ARE the metadata; pruning works across sessions with no
  * metastore. On a deployment with a persistent metastore the bucketed
  * sink is the drop-in alternative (SourcesSpec proves its
  * zero-Exchange probe joins).
  *
  * df-at-build-time semantics: the hot set (template shingles,
  * [[Dedup.DefaultMaxDfFrac]]) is computed over the BASE at build time,
  * persisted, and applied unchanged to every batch probe. It cannot be
  * "df over base+batch" — signatures depend on the filtered sets, so
  * admitting the batch into the statistics would invalidate the
  * persisted signatures. A deployment refreshes the index on snapshot
  * cadence (the hot set drifts at corpus speed, not batch speed). The
  * oracles mirror this exactly: hot-set statistics scoped to the base
  * side, filter applied to both sides.
  *
  * Scale shape at 100 TB: index build is one linear pass per snapshot
  * (amortized over every ingest until the next snapshot); a probe costs
  * O(batch) compute + O(touched buckets) IO. Bucket counts are
  * constants here (local[32]-sized); a deployment sizes them so one
  * bucket ≈ one task's worth of IO (e.g. 2^14 buckets at 100 TB) — the
  * layout, pruning and probe plan are unchanged by the constant. */
object AdmissionIndex {

  /** Hash-bucket counts for the two partition layouts. Constants sized
    * for the test boxes; see the scale note above. */
  val BandBuckets = 64
  val DocBuckets = 64

  /** Bumping this invalidates every persisted index (layout change). */
  private val FormatVersion = 2

  /** Repo-local by default (a deployment points this at an object-store
    * prefix). Relative to the working directory like `spark-warehouse`. */
  def indexRoot: String =
    sys.env.getOrElse("GRAFT_INDEX_ROOT", "target/graft-index")

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** Max mtime under a path — the staleness component of the index key:
    * regenerating a fixture in place (same path, new bytes) must produce
    * a different key, or a stale index would silently answer for the new
    * corpus. */
  private def maxMtime(path: String): Long = {
    val p = java.nio.file.Paths.get(path)
    if (!java.nio.file.Files.exists(p)) return 0L
    val s = java.nio.file.Files.walk(p)
    try {
      var m = 0L
      val it = s.iterator()
      while (it.hasNext) {
        val t = java.nio.file.Files.getLastModifiedTime(it.next()).toMillis
        if (t > m) m = t
      }
      m
    } finally s.close()
  }

  /** Index directory for a corpus path + parameter set:
    * `{root}/{path-hash}-{key-hash}`. The path hash groups every index
    * generation of one corpus (so stale generations can be swept); the
    * key hash covers content mtime + every parameter that shapes the
    * persisted bytes. */
  def indexDirFor(docsPath: String, threshold: Double,
                  maxDfFrac: Double): String = {
    val (b, r) = Dedup.lshBanding(threshold)
    dirFor(docsPath,
      s"$threshold|$maxDfFrac|b=$b,r=$r|$BandBuckets|$DocBuckets")
  }

  /** Dir name = `{path-hash}-{family-hash}-{key-hash}`: the family hash
    * covers the PARAMETERS (so two parameterizations of one corpus —
    * e.g. the mod-2 and mod-3 split conventions, or text vs embedding —
    * coexist), the key hash additionally covers content mtime (so
    * [[sweepStale]] can delete superseded GENERATIONS of one family
    * without touching its siblings). */
  private def dirFor(path: String, paramKey: String): String = {
    val pathKey = md5hex(path).take(12)
    val fam = md5hex(paramKey).take(8)
    val key = md5hex(
      s"$path|${maxMtime(path)}|$paramKey|v$FormatVersion").take(16)
    s"$indexRoot/$pathKey-$fam-$key"
  }

  private val okMarker = "_GRAFT_INDEX_OK"

  /** Build-if-absent, synchronized (parallel test suites may race on the
    * same fixture). Sweeps superseded generations of the same corpus
    * before building. Returns the index dir.
    *
    * `baseMod`: the modulo-split convention for the base side — base =
    * doc_id % baseMod == 0 (2 = the q65 even/odd convention; q137's
    * lifecycle uses 3 so two disjoint incoming batches exist). Part of
    * the index key: different conventions are different indexes. */
  def ensureIndex(spark: SparkSession, sfDir: String,
                  threshold: Double = Dedup.DefaultThreshold,
                  maxDfFrac: Double = Dedup.DefaultMaxDfFrac,
                  baseMod: Int = 2): String =
    synchronized {
      val docsPath = s"$sfDir/documents.parquet"
      val dir =
        if (baseMod == 2) indexDirFor(docsPath, threshold, maxDfFrac)
        else {
          val (b, r) = Dedup.lshBanding(threshold)
          dirFor(docsPath, s"$threshold|$maxDfFrac|b=$b,r=$r|" +
            s"$BandBuckets|$DocBuckets|mod$baseMod")
        }
      val marker = java.nio.file.Paths.get(dir, okMarker)
      if (!java.nio.file.Files.exists(marker)) {
        sweepStale(docsPath, keep = dir)
        val base = graft.Tables.documents(spark, sfDir)
          .filter(col("doc_id") % baseMod === 0)
        buildIndex(base, dir, threshold, maxDfFrac)
      }
      dir
    }

  /** Delete superseded index generations (same corpus path, different
    * key — old mtime or params). Keeps the store bounded at one live
    * generation per (corpus, parameter set). */
  private def sweepStale(docsPath: String, keep: String): Unit = {
    val root = java.nio.file.Paths.get(indexRoot)
    if (!java.nio.file.Files.exists(root)) return
    val keepName = java.nio.file.Paths.get(keep).getFileName.toString
    // sweep ONLY superseded generations of the same (corpus, parameter
    // family) — `{path}-{family}-` — never a sibling parameterization
    val prefix = keepName.split("-").take(2).mkString("-") + "-"
    val s = java.nio.file.Files.list(root)
    try {
      val it = s.iterator()
      while (it.hasNext) {
        val child = it.next()
        val name = child.getFileName.toString
        if (name.startsWith(prefix) && name != keepName) deleteRec(child)
      }
    } finally s.close()
  }

  private def deleteRec(p: java.nio.file.Path): Unit = {
    if (java.nio.file.Files.isDirectory(p)) {
      val s = java.nio.file.Files.list(p)
      try {
        val it = s.iterator()
        while (it.hasNext) deleteRec(it.next())
      } finally s.close()
    }
    java.nio.file.Files.deleteIfExists(p)
    ()
  }

  // ---- delta generations: admitted batches folded into the index ----

  /** All live roots of a text index: the base generation plus every
    * COMMITTED delta generation (marker present, non-empty), sorted for
    * deterministic union order. A generation without its marker (a
    * crashed append) is invisible — appends are atomic at the marker. */
  private def indexRoots(dir: String): Seq[String] = {
    val delta = java.nio.file.Paths.get(dir, "delta")
    val gens =
      if (!java.nio.file.Files.isDirectory(delta)) Seq.empty[String]
      else {
        val s = java.nio.file.Files.list(delta)
        try {
          val b = scala.collection.mutable.ArrayBuffer.empty[String]
          val it = s.iterator()
          while (it.hasNext) {
            val g = it.next()
            val m = g.resolve(okMarker)
            if (java.nio.file.Files.exists(m) &&
              !new String(java.nio.file.Files.readAllBytes(m), "UTF-8")
                .contains("\"rows\":0")) b += g.toString
          }
          b.sorted.toSeq
        } finally s.close()
      }
    dir +: gens
  }

  /** Fold an ADMITTED batch into the index as a new delta generation —
    * the maintenance half of the ingest loop (build → probe → admit →
    * append), so later probes reject against base ∪ everything admitted
    * so far without any rebuild. Signatures are computed under the
    * index's FROZEN hot set (df-at-build-time: the persisted base
    * signatures are only valid under it, so admitted docs must use it
    * too — the hot set refreshes at snapshot cadence via a rebuild,
    * which is also when a deployment compacts deltas into the base).
    * IDEMPOTENT per `genKey`: a committed generation (marker present)
    * is never re-appended — re-running a lifecycle query cannot
    * duplicate rows — and the marker is written LAST, so a crashed
    * append leaves an invisible, harmless partial directory. */
  /** True iff the generation for `genKey` has been committed (marker
    * present) — callers can skip the whole probe-and-fold round, not
    * just the fold. */
  def generationCommitted(dir: String, genKey: String): Boolean =
    java.nio.file.Files.exists(java.nio.file.Paths.get(
      s"$dir/delta/${md5hex(genKey).take(16)}", okMarker))

  def appendGeneration(admitted: DataFrame, dir: String, genKey: String,
                       threshold: Double = Dedup.DefaultThreshold): Unit =
    synchronized {
      val spark = admitted.sparkSession
      val gdir = s"$dir/delta/${md5hex(genKey).take(16)}"
      val marker = java.nio.file.Paths.get(gdir, okMarker)
      if (java.nio.file.Files.exists(marker)) return
      val (b, r) = Dedup.lshBanding(threshold)
      val hot = spark.read.parquet(s"$dir/hot").collect().map(_.getLong(0))
      val sh0 = Dedup.applyHotFilter(Dedup.hashShingled(admitted), hot)
      val sig = sh0.select(col("doc_id"), col("hset"),
          Dedup.permMinsUdf(b * r)(col("hset")).as("sig"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        val rows = sig.count()
        if (rows > 0) {
          sig
            .withColumn("doc_bucket", pmod(hash(col("doc_id")), lit(DocBuckets)))
            .repartition(col("doc_bucket"))
            .write.mode("overwrite").partitionBy("doc_bucket")
            .parquet(s"$gdir/hsets")
          sig
            .select(col("doc_id"),
              explode(expr(s"sequence(0, ${b - 1})")).as("band"), col("sig"))
            .select(col("doc_id"), expr(bandKeyExpr("sig", r)).as("band_key"))
            .withColumn("band_bucket", pmod(hash(col("band_key")), lit(BandBuckets)))
            .repartition(col("band_bucket"))
            .write.mode("overwrite").partitionBy("band_bucket")
            .parquet(s"$gdir/bands")
        } else java.nio.file.Files.createDirectories(
          java.nio.file.Paths.get(gdir))
        java.nio.file.Files.write(marker,
          s"""{"genKey":${graft.Verify.jsonQuote(genKey)},"rows":$rows,"version":$FormatVersion}
             |""".stripMargin.getBytes("UTF-8"))
        ()
      } finally sig.unpersist(false)
    }

  private def bandKeyExpr(sigCol: String, r: Int): String = {
    val parts = (0 until r).map(k => s"$sigCol[band*$r+$k]").mkString(", ")
    s"concat_ws('_', band, $parts)"
  }

  /** One linear pass over the base corpus → the three persisted tables.
    * The shingle stage is persisted for its three consumers (hot-set
    * aggregation, signatures via the filtered view, and the hset sink)
    * and released eagerly — same lifecycle discipline as
    * [[Dedup.minhashPairsPlan]]. */
  def buildIndex(base: DataFrame, dir: String,
                 threshold: Double = Dedup.DefaultThreshold,
                 maxDfFrac: Double = Dedup.DefaultMaxDfFrac): Unit = {
    val spark = base.sparkSession
    import spark.implicits._
    val (b, r) = Dedup.lshBanding(threshold)
    val sh0 = Dedup.hashShingled(base)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val hot =
        if (maxDfFrac >= 1.0) Array.empty[Long]
        else Dedup.hotShingles(sh0, maxDfFrac)
      val sh = Dedup.applyHotFilter(sh0, hot)
      val sig = sh.select(col("doc_id"), col("hset"),
          Dedup.permMinsUdf(b * r)(col("hset")).as("sig"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        // repartition by the layout column first: one file per touched
        // bucket instead of tasks × buckets small files
        sig
          .withColumn("doc_bucket", pmod(hash(col("doc_id")), lit(DocBuckets)))
          .repartition(col("doc_bucket"))
          .write.mode("overwrite").partitionBy("doc_bucket")
          .parquet(s"$dir/hsets")
        sig
          .select(col("doc_id"),
            explode(expr(s"sequence(0, ${b - 1})")).as("band"), col("sig"))
          .select(col("doc_id"), expr(bandKeyExpr("sig", r)).as("band_key"))
          .withColumn("band_bucket", pmod(hash(col("band_key")), lit(BandBuckets)))
          .repartition(col("band_bucket"))
          .write.mode("overwrite").partitionBy("band_bucket")
          .parquet(s"$dir/bands")
        hot.toSeq.toDF("h").coalesce(1)
          .write.mode("overwrite").parquet(s"$dir/hot")
        java.nio.file.Files.write(
          java.nio.file.Paths.get(dir, okMarker),
          s"""{"threshold":$threshold,"maxDfFrac":$maxDfFrac,"b":$b,"r":$r,"bandBuckets":$BandBuckets,"docBuckets":$DocBuckets,"version":$FormatVersion}
             |""".stripMargin.getBytes("UTF-8"))
        ()
      } finally sig.unpersist(false)
    } finally sh0.unpersist(false)
  }

  /** Per-ingest probe: verified cross pairs (a = batch doc, b = base
    * doc, jac ≥ threshold), each pair once. Batch-side work is O(batch);
    * base-side IO is the partition-pruned band scan (only buckets the
    * batch's band keys hash into) plus the partition-pruned hset scan
    * (only buckets the matched candidates' doc ids hash into). The two
    * bucket collects are bounded by the bucket constants (≤64 ints
    * each); the candidate materialization is the admission contract's
    * matched set, O(batch) in the non-degenerate regime q26's tripwire
    * family guards. The batch side is persisted and AQE broadcast-joins
    * it against the pruned scans when small — the base never shuffles. */
  def probePairs(batch: DataFrame, dir: String,
                 threshold: Double = Dedup.DefaultThreshold): DataFrame = {
    val spark = batch.sparkSession
    graft.functions.GraftFunctions.register(spark)
    val (b, r) = Dedup.lshBanding(threshold)
    val hot = spark.read.parquet(s"$dir/hot").collect().map(_.getLong(0))
    val shB = Dedup.applyHotFilter(Dedup.hashShingled(batch), hot)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val sigB = shB.select(col("doc_id"),
        Dedup.permMinsUdf(b * r)(col("hset")).as("sig"))
      val bandsB = sigB
        .select(col("doc_id"),
          explode(expr(s"sequence(0, ${b - 1})")).as("band"), col("sig"))
        .select(col("doc_id"), expr(bandKeyExpr("sig", r)).as("band_key"))
        .withColumn("band_bucket", pmod(hash(col("band_key")), lit(BandBuckets)))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        val touched = bandsB.select(col("band_bucket")).distinct()
          .collect().map(_.getInt(0))
        val roots = indexRoots(dir)
        val baseBands = roots.map(rt => spark.read.parquet(s"$rt/bands")
            .filter(col("band_bucket")
              .isin(touched.map(Int.box).toIndexedSeq: _*)))
          .reduce(_.unionByName(_))
        val cand = bandsB.as("x")
          .join(baseBands.as("y"), Seq("band_key"))
          .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
          .distinct()
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try {
          val candBuckets = cand
            .select(pmod(hash(col("b")), lit(DocBuckets)).as("db"))
            .distinct().collect().map(_.getInt(0))
          val baseH = roots.map(rt => spark.read.parquet(s"$rt/hsets")
              .filter(col("doc_bucket")
                .isin(candBuckets.map(Int.box).toIndexedSeq: _*))
              .select(col("doc_id"), col("hset")))
            .reduce(_.unionByName(_))
          val out = Dedup.verifyJaccardTwoSided(cand, shB, baseH, threshold)
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          out.count()
          out
        } finally cand.unpersist(false)
      } finally bandsB.unpersist(false)
    } finally shB.unpersist(false)
  }

  /** q133 driver form: ensure the base-side index for `sfDir` exists
    * (build is the amortized one-time stage; a warm second invocation
    * pays probe cost only), probe the incoming batch (odd doc_ids, q65
    * modulo-split convention), and emit the reject list — each matched
    * batch doc with its best base match (max jaccard, ties to lowest
    * base id). Same output contract as q130; the one semantic delta is
    * documented above (hot-set df statistics over the base at build
    * time, identical on the driver fixtures where the hot set is empty). */
  def admissionReject(spark: SparkSession, sfDir: String,
                      threshold: Double = Dedup.DefaultThreshold,
                      maxDfFrac: Double = Dedup.DefaultMaxDfFrac): DataFrame = {
    val dir = ensureIndex(spark, sfDir, threshold, maxDfFrac)
    val batch = graft.Tables.documents(spark, sfDir)
      .filter(col("doc_id") % 2 === 1)
    probePairs(batch, dir, threshold)
      .withColumn("rnk", expr(
        "row_number() OVER (PARTITION BY a ORDER BY jac DESC, b ASC)"))
      .filter(col("rnk") === 1)
      .select(col("a").as("batch_doc"), col("b").as("base_doc"),
        round(col("jac"), 4).as("jaccard"))
      .orderBy(col("batch_doc"))
  }

  /** Fully STATELESS probe — every stage is a narrow transform or a
    * join against a static index table, so the same plan runs as a
    * Structured Streaming query over a document stream (stream-static
    * joins, zero state-store rows) AND as a batch query (the oracle
    * twin). Three departures from [[probePairs]], all forced by
    * statelessness:
    *
    *  - no partition-prune collects (the batch's bucket set is not
    *    known at plan time on a stream) — the static sides are planned
    *    per micro-batch as ordinary pruned-column parquet scans;
    *  - no `distinct()` for pair dedup: a pair matching in several
    *    bands would emit once per band. Instead each row carries BOTH
    *    full signatures and keeps only the MINIMAL matching band —
    *    `NOT exists(j < band, sig_a[j·r..] = sig_b[j·r..])` is
    *    row-local, so each verified pair is emitted exactly once with
    *    no shuffle and no state;
    *  - verification is row-local too (both hsets are on the row after
    *    the hset join): the codegen'd sorted-intersect walk plus the
    *    same algebraic prefilter as [[Dedup.verifyJaccardTwoSided]].
    *
    * Output: verified cross pairs (batch_doc, base_doc, jaccard), NOT
    * the best-match rank — ranking per batch doc is an aggregation,
    * which on a stream means state; the gate's decision ("matched at
    * all → reject") needs only the pair set. Callers wanting the rank
    * run [[admissionReject]] on the micro-batch output. */
  def pairsVsIndex(batchDocs: DataFrame, dir: String,
                   threshold: Double = Dedup.DefaultThreshold): DataFrame = {
    val spark = batchDocs.sparkSession
    graft.functions.GraftFunctions.register(spark)
    val (b, r) = Dedup.lshBanding(threshold)
    val hot = spark.read.parquet(s"$dir/hot").collect().map(_.getLong(0))
    val shB = Dedup.applyHotFilter(Dedup.hashShingled(batchDocs), hot)
    val sigB = shB.select(col("doc_id").as("a"), col("hset").as("ha"),
      Dedup.permMinsUdf(b * r)(col("hset")).as("siga"))
    val bandsB = sigB
      .select(col("a"), col("ha"), col("siga"),
        explode(expr(s"sequence(0, ${b - 1})")).as("band"))
      .withColumn("band_key", expr(bandKeyExpr("siga", r)))
    val roots = indexRoots(dir)
    val baseBands = roots.map(rt => spark.read.parquet(s"$rt/bands")
        .select(col("doc_id").as("bb"), col("band_key")))
      .reduce(_.unionByName(_))
    val baseH = roots.map(rt => spark.read.parquet(s"$rt/hsets")
        .select(col("doc_id").as("b"), col("hset").as("hb"), col("sig").as("sigb")))
      .reduce(_.unionByName(_))
    val rMatch = (0 until r)
      .map(k => s"siga[j*$r+$k] = sigb[j*$r+$k]").mkString(" AND ")
    val d = threshold / (1.0 + threshold)
    bandsB
      .join(baseBands, Seq("band_key"))
      .join(baseH, col("bb") === col("b"))
      .filter(expr(
        s"NOT exists(filter(sequence(0, ${b - 1}), j -> j < band), j -> $rMatch)"))
      .withColumn("inter", expr("graft_sorted_intersect_size(ha, hb)"))
      .withColumn("stot", size(col("ha")) + size(col("hb")))
      .filter(col("inter") >= lit(d) * col("stot"))
      .withColumn("jac",
        col("inter") / (col("stot") - col("inter")).cast("double"))
      .filter(col("jac") >= threshold)
      .select(col("a").as("batch_doc"), col("b").as("base_doc"),
        round(col("jac"), 4).as("jaccard"))
  }

  /** q134 driver form: the stateless probe's BATCH twin over the
    * modulo-split convention, sorted for the oracle compare. The
    * streaming form is the same [[pairsVsIndex]] call with a streaming
    * `batchDocs` (AdmissionIndexSpec replays it micro-batch-by-
    * micro-batch and pins stream ≡ batch ≡ oracle). */
  def streamNearDup(spark: SparkSession, sfDir: String,
                    threshold: Double = Dedup.DefaultThreshold,
                    maxDfFrac: Double = Dedup.DefaultMaxDfFrac): DataFrame = {
    val dir = ensureIndex(spark, sfDir, threshold, maxDfFrac)
    val batch = graft.Tables.documents(spark, sfDir)
      .filter(col("doc_id") % 2 === 1)
    pairsVsIndex(batch, dir, threshold)
      .orderBy(col("batch_doc"), col("base_doc"))
  }

  /** q137 driver form — the FULL ingest lifecycle over one index:
    * build (base = doc_id % 3 == 0) → probe batch1 (% 3 == 1) → fold
    * batch1's ADMITTED docs into the index as a delta generation →
    * probe batch2 (% 3 == 2). Output = batch2's reject list, whose base
    * side spans base ∪ admitted-batch1 — the property that makes the
    * gate an actual gate: what round 1 admitted, round 2 cannot
    * duplicate. All signatures under the base's frozen hot set; the
    * oracle re-derives admitted-batch1 from the same all-pairs table.
    * Deterministic across re-runs: the index is keyed build-once and
    * the generation append is idempotent per genKey. */
  def admissionLifecycle(spark: SparkSession, sfDir: String,
                         threshold: Double = Dedup.DefaultThreshold,
                         maxDfFrac: Double = Dedup.DefaultMaxDfFrac): DataFrame = {
    val docs = graft.Tables.documents(spark, sfDir)
    val dir = ensureIndex(spark, sfDir, threshold, maxDfFrac, baseMod = 3)
    val genKey = s"$sfDir|gen1"
    // round 1 (probe batch1 + fold its admitted docs in) replays ONLY
    // until its generation is committed: a warm lifecycle pays exactly
    // one probe per ingest — the per-ingest contract — not a re-probe
    // of history (the committed marker already guarantees the fold
    // itself is idempotent; this skips the wasted probe too)
    if (!generationCommitted(dir, genKey)) {
      val batch1 = docs.filter(col("doc_id") % 3 === 1)
      val rejected1 = probePairs(batch1, dir, threshold)
        .select(col("a")).distinct()
      // ids-only broadcast (bounded by the batch), so the anti join
      // never shuffles the batch's text payload
      val admitted1 = batch1
        .join(broadcast(rejected1), batch1("doc_id") === rejected1("a"),
          "left_anti")
      appendGeneration(admitted1, dir, genKey, threshold)
    }
    val batch2 = docs.filter(col("doc_id") % 3 === 2)
    probePairs(batch2, dir, threshold)
      .withColumn("rnk", expr(
        "row_number() OVER (PARTITION BY a ORDER BY jac DESC, b ASC)"))
      .filter(col("rnk") === 1)
      .select(col("a").as("batch_doc"), col("b").as("base_doc"),
        round(col("jac"), 4).as("jaccard"))
      .orderBy(col("batch_doc"))
  }

  val admissionLifecycleOracle: String =
    admissionLifecycleOracleAt(Dedup.DefaultThreshold)

  /** The all-pairs CTEs with hot-set statistics scoped to the mod-3
    * base, then: rejected-batch1 = batch1 docs pairing the base;
    * admitted = batch1 minus those; batch2's reject list ranks pairs
    * whose other side is base ∪ admitted. */
  def admissionLifecycleOracleAt(threshold: Double,
      maxDfFrac: Double = Dedup.DefaultMaxDfFrac): String =
    s"""WITH ${Dedup.oracleMinhashPairsCtes(threshold, maxDfFrac, "doc_id % 3 = 0")},
      |rej1 AS (
      |  SELECT DISTINCT CASE WHEN a % 3 = 1 THEN a ELSE b END AS d
      |  FROM mp WHERE (a % 3 = 1 AND b % 3 = 0) OR (a % 3 = 0 AND b % 3 = 1)),
      |idx AS (
      |  SELECT doc_id FROM documents WHERE doc_id % 3 = 0
      |  UNION ALL
      |  SELECT doc_id FROM documents WHERE doc_id % 3 = 1
      |    AND NOT EXISTS (SELECT 1 FROM rej1 WHERE rej1.d = doc_id)),
      |p2 AS (
      |  SELECT CASE WHEN a % 3 = 2 THEN a ELSE b END AS batch_doc,
      |         CASE WHEN a % 3 = 2 THEN b ELSE a END AS base_doc, jac
      |  FROM mp WHERE ((a % 3 = 2) <> (b % 3 = 2))
      |    AND EXISTS (SELECT 1 FROM idx
      |                WHERE idx.doc_id = CASE WHEN a % 3 = 2 THEN b ELSE a END)),
      |best AS (
      |  SELECT batch_doc, base_doc, jac,
      |         row_number() OVER (PARTITION BY batch_doc
      |                            ORDER BY jac DESC, base_doc ASC) AS rnk
      |  FROM p2)
      |SELECT batch_doc, base_doc, ROUND(jac, 4) AS jaccard
      |FROM best WHERE rnk = 1 ORDER BY batch_doc""".stripMargin

  // ====================================================================
  // Embedding-side persisted admission index (IVF) — q131's scale path
  // made durable. q131 is EXACT: it scans the full base per ingest
  // (broadcast batch, zero base shuffle) — correct, but O(base) IO per
  // ingest forever. This index persists the base ONCE as an IVF layout
  // (the deterministic cheapest-md5 centroids of q54, each base vector
  // assigned to its nearest cell by exact integer distance, cells as
  // partition directories) and the probe reads only the nProbe nearest
  // cells per batch vector — expected nProbe/C of the base per ingest.
  // The trade is the standard IVF one: the reject list is bounded to
  // candidates inside probed cells (recall governed by nProbe/C, the
  // same measured surface as q119); the ORACLE reproduces the identical
  // cell assignment and probe, so correctness is exact w.r.t. the
  // declared approximation. Centroids derive from the BASE at build
  // time (same df-at-build-time reasoning as the text index: cell
  // assignment is only valid under the centroids it was built with).
  // ====================================================================

  val EmbCentroids = 16
  val EmbNProbe = 4
  val EmbThreshold = 0.45

  def embIndexDirFor(embPath: String, centroids: Int): String =
    dirFor(embPath, s"emb|$centroids")

  /** Build-if-absent for the embedding index; same lifecycle contract
    * as [[ensureIndex]]. */
  def ensureEmbIndex(spark: SparkSession, sfDir: String,
                     centroids: Int = EmbCentroids): String =
    synchronized {
      val embPath = s"$sfDir/embeddings.parquet"
      val dir = embIndexDirFor(embPath, centroids)
      val marker = java.nio.file.Paths.get(dir, okMarker)
      if (!java.nio.file.Files.exists(marker)) {
        sweepStale(embPath, keep = dir)
        val base = graft.Tables.embeddings(spark, sfDir)
          .filter(col("vec_id") % 2 === 0)
        embBuildIndex(base, dir, centroids)
      }
      dir
    }

  /** One pass over the base vectors → centroid summary + cell-assigned
    * quantized vectors, partitioned by cell for probe-time pruning. */
  def embBuildIndex(base: DataFrame, dir: String,
                    centroids: Int = EmbCentroids): Unit = {
    val spark = base.sparkSession
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val q = Similarity.quantized(base)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val cents = Similarity.ivfCentroids(q, centroids)
      val bc = spark.sparkContext.broadcast(cents)
      q.select(col("vec_id"), col("qv"), col("n2"),
          Similarity.ivfCellUdf(bc)(col("qv")).as("cell"))
        .repartition(col("cell"))
        .write.mode("overwrite").partitionBy("cell")
        .parquet(s"$dir/cells")
      cents.zipWithIndex
        .map { case ((cqv, cn2), i) => (i, cqv.toSeq, cn2) }.toSeq
        .toDF("idx", "qv", "n2").coalesce(1)
        .write.mode("overwrite").parquet(s"$dir/centroids")
      java.nio.file.Files.write(
        java.nio.file.Paths.get(dir, okMarker),
        s"""{"kind":"emb","centroids":$centroids,"version":$FormatVersion}
           |""".stripMargin.getBytes("UTF-8"))
      ()
    } finally q.unpersist(false)
  }

  /** Per-ingest probe: each batch vector's nProbe nearest cells are
    * computed against the persisted centroid summary (KB-scale collect),
    * the cell scan is partition-pruned to the probed set, and the best
    * base match at cos ≥ threshold per batch vector is the reject row.
    * Candidates bounded to probed cells — the declared IVF
    * approximation, reproduced exactly by the oracle. */
  def embProbe(batch: DataFrame, dir: String,
               threshold: Double = EmbThreshold,
               nProbe: Int = EmbNProbe): DataFrame = {
    val spark = batch.sparkSession
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val cents = spark.read.parquet(s"$dir/centroids")
      .orderBy(col("idx")).select(col("qv"), col("n2"))
      .as[(Array[Long], Long)].collect()
    val bc = spark.sparkContext.broadcast(cents)
    val probes = Similarity.quantized(batch)
      .select(col("vec_id"), col("qv"), col("n2"),
        explode(Similarity.ivfProbeUdf(bc, nProbe)(col("qv"))).as("cell"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val touched = probes.select(col("cell")).distinct()
        .collect().map(_.getInt(0))
      val baseCells = spark.read.parquet(s"$dir/cells")
        .filter(col("cell").isin(touched.map(Int.box).toIndexedSeq: _*))
      val out = probes.as("x").join(baseCells.as("y"), Seq("cell"))
        .select(col("x.vec_id").as("batch_vec"), col("y.vec_id").as("base_vec"),
          expr(Similarity.cosExpr).as("cos"))
        .filter(col("cos") >= threshold)
        .withColumn("rnk", expr(
          "row_number() OVER (PARTITION BY batch_vec ORDER BY cos DESC, base_vec ASC)"))
        .filter(col("rnk") === 1)
        .select(col("batch_vec"), col("base_vec"),
          round(col("cos"), 6).as("cosine"))
        .orderBy(col("batch_vec"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      out.count()
      out
    } finally probes.unpersist(false)
  }

  /** Fully STATELESS embedding probe — the IVF twin of [[pairsVsIndex]]
    * (q134), closing the admission matrix: exact/minhash/embedding ×
    * batch/stream. Departures from [[embProbe]], both forced by
    * statelessness: no cell-prune collect (the probed-cell set is not
    * known at plan time on a stream — the cells table joins
    * stream-static instead, still one partition-pruned scan per
    * micro-batch once Spark pushes the join's cell values; worst case a
    * full narrow scan of the cell layout), and no best-match rank (an
    * aggregation = state; the gate needs the pair set). Each
    * (batch, base) pair emits at most once row-locally: a base vector
    * lives in exactly one cell, and the nProbe probe cells per batch
    * vector are distinct by construction. */
  def embPairsVsIndex(batchVecs: DataFrame, dir: String,
                      threshold: Double = EmbThreshold,
                      nProbe: Int = EmbNProbe): DataFrame = {
    val spark = batchVecs.sparkSession
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val cents = spark.read.parquet(s"$dir/centroids")
      .orderBy(col("idx")).select(col("qv"), col("n2"))
      .as[(Array[Long], Long)].collect()
    val bc = spark.sparkContext.broadcast(cents)
    val probes = Similarity.quantized(batchVecs)
      .select(col("vec_id"), col("qv"), col("n2"),
        explode(Similarity.ivfProbeUdf(bc, nProbe)(col("qv"))).as("cell"))
    val baseCells = spark.read.parquet(s"$dir/cells")
    probes.as("x").join(baseCells.as("y"), Seq("cell"))
      .select(col("x.vec_id").as("batch_vec"), col("y.vec_id").as("base_vec"),
        expr(Similarity.cosExpr).as("cos"))
      .filter(col("cos") >= threshold)
      .select(col("batch_vec"), col("base_vec"),
        round(col("cos"), 6).as("cosine"))
  }

  /** q136 driver form: the stateless embedding probe's BATCH twin over
    * the modulo-split convention, sorted for the oracle compare; the
    * streaming form is the same [[embPairsVsIndex]] call with a
    * streaming `batchVecs` (spec-replayed, zero state rows). */
  def streamEmbAdmission(spark: SparkSession, sfDir: String,
                         threshold: Double = EmbThreshold,
                         centroids: Int = EmbCentroids,
                         nProbe: Int = EmbNProbe): DataFrame = {
    val dir = ensureEmbIndex(spark, sfDir, centroids)
    val batch = graft.Tables.embeddings(spark, sfDir)
      .filter(col("vec_id") % 2 === 1)
    embPairsVsIndex(batch, dir, threshold, nProbe)
      .orderBy(col("batch_vec"), col("base_vec"))
  }

  val streamEmbAdmissionOracle: String =
    streamEmbAdmissionOracleAt(EmbThreshold, EmbCentroids, EmbNProbe)

  /** [[embAdmissionIndexedOracleAt]] without the best-match rank — the
    * stateless form's full verified pair set. */
  def streamEmbAdmissionOracleAt(threshold: Double, centroids: Int,
                                 nProbe: Int): String =
    s"""WITH ${embOracleCtes(centroids, nProbe)}
      |SELECT batch_vec, base_vec, ROUND(cos, 6) AS cosine
      |FROM scored WHERE cos >= $threshold
      |ORDER BY batch_vec, base_vec""".stripMargin

  /** q135 driver form: ensure the base IVF index for `sfDir`, probe the
    * incoming batch (odd vec_ids, q65 modulo-split convention). */
  def embAdmissionIndexed(spark: SparkSession, sfDir: String,
                          threshold: Double = EmbThreshold,
                          centroids: Int = EmbCentroids,
                          nProbe: Int = EmbNProbe): DataFrame = {
    val dir = ensureEmbIndex(spark, sfDir, centroids)
    val batch = graft.Tables.embeddings(spark, sfDir)
      .filter(col("vec_id") % 2 === 1)
    embProbe(batch, dir, threshold, nProbe)
  }

  val embAdmissionIndexedOracle: String =
    embAdmissionIndexedOracleAt(EmbThreshold, EmbCentroids, EmbNProbe)

  /** Shared CTE chain for the embedding-index oracles (through the
    * verified `scored(batch_vec, base_vec, cos)` table): base-scoped
    * centroid selection, exact integer cell assignment (the q54
    * bigint-encoded argmin — no cross-engine struct ordering), nProbe
    * probe cells per batch vector, candidates = probed-cell joins. */
  private def embOracleCtes(centroids: Int, nProbe: Int): String = {
    val OFF = 274877906944L
    val dotCQ =
      """CAST(list_sum(list_transform(range(1, len(q.qv)+1), d -> q.qv[d] * cents[i].qv[d])) AS BIGINT)"""
    val scores =
      s"""list_transform(range(1, len(cents)+1), i ->
         |        (cents[i].n2 - 2 * $dotCQ + $OFF) * 256 + (i - 1))""".stripMargin
    s"""${Similarity.oracleQuantized},
      |ranked_cents AS (
      |  SELECT qv, n2,
      |         CAST(concat('0x', substr(md5(CAST(vec_id AS VARCHAR)), 1, 8)) AS BIGINT) AS h,
      |         vec_id
      |  FROM qn WHERE vec_id % 2 = 0 ORDER BY h, vec_id LIMIT $centroids),
      |carr AS (
      |  SELECT list(struct_pack(qv := qv, n2 := n2) ORDER BY h, vec_id) AS cents
      |  FROM ranked_cents),
      |assigned AS (
      |  SELECT q.vec_id, q.qv, q.n2, list_min($scores) % 256 AS cell
      |  FROM qn q, carr WHERE q.vec_id % 2 = 0),
      |probes AS (
      |  SELECT q.vec_id, q.qv, q.n2, t.pcell
      |  FROM qn q, carr,
      |       unnest(list_transform(list_sort($scores)[1:$nProbe], x -> x % 256)) AS t(pcell)
      |  WHERE q.vec_id % 2 = 1),
      |scored AS (
      |  SELECT x.vec_id AS batch_vec, y.vec_id AS base_vec,
      |         ${Similarity.oracleCosExpr} AS cos
      |  FROM probes x JOIN assigned y ON x.pcell = y.cell)""".stripMargin
  }

  /** Oracle builder on the SAME (threshold, centroids, nProbe) as the
    * engine: the shared CTE chain plus the best-match rank. */
  def embAdmissionIndexedOracleAt(threshold: Double, centroids: Int,
                                  nProbe: Int): String =
    s"""WITH ${embOracleCtes(centroids, nProbe)},
      |ranked AS (
      |  SELECT batch_vec, base_vec, cos,
      |         row_number() OVER (PARTITION BY batch_vec
      |                            ORDER BY cos DESC, base_vec ASC) AS rnk
      |  FROM scored WHERE cos >= $threshold)
      |SELECT batch_vec, base_vec, ROUND(cos, 6) AS cosine
      |FROM ranked WHERE rnk = 1 ORDER BY batch_vec""".stripMargin

  // --------------------------------------------------------------------
  // Oracles — the all-pairs minhash CTEs with hot-set STATISTICS scoped
  // to the base side (df-at-build-time semantics, see the module doc),
  // filtered to cross-parity pairs. LSH banding gives a cross pair the
  // same band keys whether or not same-side pairs are generated, so
  // candidate recall and the jaccard verification agree exactly with
  // the index probe.
  // --------------------------------------------------------------------

  private val baseScope = "doc_id % 2 = 0"

  val admissionRejectOracle: String =
    admissionRejectOracleAt(Dedup.DefaultThreshold)

  def admissionRejectOracleAt(threshold: Double,
      maxDfFrac: Double = Dedup.DefaultMaxDfFrac): String =
    s"""WITH ${Dedup.oracleMinhashPairsCtes(threshold, maxDfFrac, baseScope)},
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

  val streamNearDupOracle: String =
    streamNearDupOracleAt(Dedup.DefaultThreshold)

  def streamNearDupOracleAt(threshold: Double,
      maxDfFrac: Double = Dedup.DefaultMaxDfFrac): String =
    s"""WITH ${Dedup.oracleMinhashPairsCtes(threshold, maxDfFrac, baseScope)},
      |crossp AS (
      |  SELECT CASE WHEN a % 2 = 1 THEN a ELSE b END AS batch_doc,
      |         CASE WHEN a % 2 = 1 THEN b ELSE a END AS base_doc, jac
      |  FROM mp WHERE (a % 2) <> (b % 2))
      |SELECT batch_doc, base_doc, ROUND(jac, 4) AS jaccard
      |FROM crossp ORDER BY batch_doc, base_doc""".stripMargin
}
