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

  /** doc_id + distinct 3-word shingle set; docs with <3 tokens have no
    * shingles and are excluded (cannot near-dup match). */
  private[operators] def shingled(documents: DataFrame): DataFrame =
    documents
      .select(col("doc_id"), split(lower(col("text")), "\\s+").as("toks"))
      .filter(size(col("toks")) >= 3)
      .select(col("doc_id"), expr(
        """array_distinct(transform(sequence(0, size(toks)-3),
          |  i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2])))""".stripMargin)
        .as("sset"))

  private val oracleShingled: String =
    """toks AS (
      |  SELECT doc_id, string_split_regex(lower(text), '\s+') AS ts FROM documents),
      |sh AS (
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
  // MinHash + LSH: 12 permutations, 4 bands × 3 rows. Per-band match
  // probability at jaccard j is j³; with the fixture's planted dups at
  // j≈0.98 the miss probability is (1-0.98³)⁴ ≈ 1e-5 per pair, while
  // unrelated pairs (j<0.1) band-collide with p ≈ 4e-3·j³ — the exact
  // verification pass removes those.
  // --------------------------------------------------------------------
  /** 12-permutation minhash signature, compiled: one md5 per shingle,
    * then affine universal-hash permutations h_i(x) = (a_i·h + b_i) mod p
    * over the shared base hash — the JVM twin of the SQL the oracle
    * evaluates (same constants, same mod-p arithmetic). */
  private val minhashSigUdf = udf { sset: Seq[String] =>
    val P = 2147483647L
    val md = java.security.MessageDigest.getInstance("MD5")
    val mins = Array.fill(12)(Long.MaxValue)
    sset.foreach { x =>
      val d = md.digest(x.getBytes("UTF-8"))
      val h = (((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)) % P
      var s = 0
      while (s < 12) {
        val a = ((2L * s + 1L) * 1103515245L) % P
        val v = (a * h + s * 12345L + 1L) % P
        if (v < mins(s)) mins(s) = v
        s += 1
      }
    }
    mins
  }

  def minhashDedup(documents: DataFrame, threshold: Double = 0.5): DataFrame = {
    val sh = shingled(documents)
    val sig = sh.select(col("doc_id"), col("sset"),
      minhashSigUdf(col("sset")).as("sig"))
    val banded = sig
      .select(col("doc_id"), explode(expr("sequence(0, 3)")).as("band"), col("sig"))
      .select(col("doc_id"), expr(
        "concat_ws('_', band, sig[band*3], sig[band*3+1], sig[band*3+2])").as("band_key"))
      // exchange barrier: signatures materialize once; the self-join's two
      // branches reuse the shuffle (ReusedExchange) rather than re-hashing
      // every shingle per branch, and the join needs no further exchange
      .repartition(col("band_key"))
    val cand = banded.as("x").join(banded.as("y"), "band_key")
      .filter(col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
      .distinct()
    cand
      .join(sh.select(col("doc_id"), col("sset").as("sa")), cand("a") === col("doc_id")).drop("doc_id")
      .join(sh.select(col("doc_id"), col("sset").as("sb")), cand("b") === col("doc_id")).drop("doc_id")
      .select(col("a"), col("b"), expr(
        """size(array_intersect(sa, sb)) /
          |  CAST(size(sa) + size(sb) - size(array_intersect(sa, sb)) AS DOUBLE)""".stripMargin)
        .as("jac"))
      .filter(col("jac") >= threshold)
      .select(col("a"), col("b"), round(col("jac"), 4).as("jaccard"))
      .orderBy(col("a"), col("b"))
  }

  val minhashDedupOracle: String =
    s"""WITH $oracleShingled,
      |bh AS (
      |  SELECT doc_id, sset,
      |         list_transform(sset, x ->
      |           CAST(concat('0x', substr(md5(x), 1, 8)) AS BIGINT) % 2147483647) AS bh
      |  FROM sh),
      |sig AS (
      |  SELECT doc_id, sset,
      |         list_transform(range(0, 12), s ->
      |           list_min(list_transform(bh, h ->
      |             (((2*s + 1) * 1103515245 % 2147483647) * h + s * 12345 + 1) % 2147483647))) AS sig
      |  FROM bh),
      |banded AS (
      |  SELECT doc_id,
      |         concat_ws('_', band, sig[band*3+1], sig[band*3+2], sig[band*3+3]) AS band_key
      |  FROM sig, range(0, 4) AS t(band)),
      |cand AS (
      |  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
      |  FROM banded x JOIN banded y ON x.band_key = y.band_key AND x.doc_id < y.doc_id),
      |j AS (
      |  SELECT c.a, c.b,
      |         len(list_intersect(sa.sset, sb.sset)) /
      |           CAST(len(sa.sset) + len(sb.sset) - len(list_intersect(sa.sset, sb.sset)) AS DOUBLE) AS jac
      |  FROM cand c JOIN sh sa ON sa.doc_id = c.a JOIN sh sb ON sb.doc_id = c.b)
      |SELECT a, b, ROUND(jac, 4) AS jaccard FROM j WHERE jac >= 0.5 ORDER BY a, b""".stripMargin

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

  def simhashDedup(documents: DataFrame, maxHamming: Int = 3): DataFrame = {
    val fps = shingled(documents).select(col("doc_id"), simhashUdf(col("sset")).as("fp"))
    val banded = fps.select(col("doc_id"), col("fp"),
      explode(expr("sequence(0, 3)")).as("band"))
      .select(col("doc_id"), col("fp"),
        expr("concat_ws(':', band, shiftright(fp, band*8) & 255)").as("band_key"))
      // exchange barrier: materialize fingerprints once; both self-join
      // branches read the same shuffle output (ReusedExchange) instead of
      // re-deriving the whole md5 pipeline per branch
      .repartition(col("band_key"))
    banded.as("x").join(banded.as("y"), "band_key")
      .filter(col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"),
        expr("bit_count(x.fp ^ y.fp)").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
      .orderBy(col("a"), col("b"))
  }

  val simhashDedupOracle: String =
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
      |  SELECT doc_id, fp, concat_ws(':', band, (fp >> (band*8)) & 255) AS band_key
      |  FROM fps, range(0, 4) AS t(band)),
      |pairs AS (
      |  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b,
      |         CAST(bit_count(xor(x.fp, y.fp)) AS INT) AS hamming
      |  FROM banded x JOIN banded y ON x.band_key = y.band_key AND x.doc_id < y.doc_id)
      |SELECT a, b, hamming FROM pairs WHERE hamming <= 3 ORDER BY a, b""".stripMargin

  // --------------------------------------------------------------------
  // Direct n-gram Jaccard with staggered length blocking: each doc lands
  // in two length buckets (width 16, offset 8), so any pair differing by
  // <8 chars shares a bucket — exact for near-dups (which are length-
  // close by construction) without the all-pairs cross join. Bucket
  // width is the block-size/recall knob: candidate pairs scale with
  // bucket² so halving the width quarters the verification work.
  // --------------------------------------------------------------------
  def ngramJaccard(documents: DataFrame, threshold: Double = 0.5): DataFrame = {
    graft.functions.GraftFunctions.register(documents.sparkSession)
    // Shingles are 32-bit-hashed BEFORE the pairwise stage: intersecting
    // bigint arrays is far cheaper than string arrays, and at 100 TB the
    // hashed sets are also what you'd ship through the shuffle (8 bytes
    // per shingle instead of the text).
    val sh = documents
      .select(col("doc_id"), col("n_chars"), split(lower(col("text")), "\\s+").as("toks"))
      .filter(size(col("toks")) >= 3)
      .select(col("doc_id"), col("n_chars"), expr(
        """sort_array(array_distinct(transform(sequence(0, size(toks)-3),
          |  i -> CAST(conv(substr(md5(concat_ws(' ', toks[i], toks[i+1], toks[i+2])), 1, 8), 16, 10) AS BIGINT))))"""
          .stripMargin).as("hset"))
    val bucketed = sh.select(col("doc_id"), col("hset"),
      explode(expr(
        "array_distinct(array(CAST(floor(n_chars/16) AS BIGINT), CAST(floor((n_chars+8)/16) AS BIGINT) + 1000000))"))
        .as("bucket"))
      .repartition(col("bucket")) // materialize hashed sets once for both branches
    // graft_sorted_intersect_size: codegen'd merge walk directly over the
    // Tungsten arrays (a Scala UDF would copy both arrays per pair).
    // The algebraic prefilter jac≥t ⟺ inter ≥ t/(1+t)·(|A|+|B|) evaluates
    // the intersect ONCE per candidate; the exact jaccard is recomputed
    // only for the surviving ~|true dup| rows.
    val d = threshold / (1.0 + threshold)
    bucketed.as("x").join(bucketed.as("y"), "bucket")
      .filter(col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"),
        expr("graft_sorted_intersect_size(x.hset, y.hset)").as("inter"),
        (size(col("x.hset")) + size(col("y.hset"))).as("stot"))
      .filter(col("inter") >= lit(d) * col("stot"))
      .select(col("a"), col("b"),
        (col("inter") / (col("stot") - col("inter")).cast("double")).as("jac"))
      .distinct()
      .filter(col("jac") >= threshold) // exact belt for arbitrary thresholds
      .select(col("a"), col("b"), round(col("jac"), 4).as("jaccard"))
      .orderBy(col("a"), col("b"))
  }

  val ngramJaccardOracle: String =
    """WITH toks AS (
      |  SELECT doc_id, n_chars, string_split_regex(lower(text), '\s+') AS ts FROM documents),
      |sh AS (
      |  SELECT doc_id, n_chars,
      |         list_distinct([CAST(concat('0x', substr(md5(ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2]), 1, 8)) AS BIGINT)
      |                        for i in range(1, len(ts)-1)]) AS hset
      |  FROM toks WHERE len(ts) >= 3),
      |bucketed AS (
      |  SELECT doc_id, hset, bucket
      |  FROM sh, unnest(list_distinct([CAST(floor(n_chars/16) AS BIGINT),
      |                                 CAST(floor((n_chars+8)/16) AS BIGINT) + 1000000])) AS t(bucket)),
      |pairs AS (
      |  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b,
      |         len(list_intersect(x.hset, y.hset)) /
      |           CAST(len(x.hset) + len(y.hset) - len(list_intersect(x.hset, y.hset)) AS DOUBLE) AS jac
      |  FROM bucketed x JOIN bucketed y ON x.bucket = y.bucket AND x.doc_id < y.doc_id)
      |SELECT a, b, ROUND(jac, 4) AS jaccard FROM pairs WHERE jac >= 0.5 ORDER BY a, b""".stripMargin
}
