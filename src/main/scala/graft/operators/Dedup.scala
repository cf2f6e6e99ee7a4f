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
  def minhashDedup(documents: DataFrame, threshold: Double = 0.5): DataFrame = {
    val sh = shingled(documents)
    val sig = sh.select(col("doc_id"), col("sset"), expr(
      """transform(sequence(0, 11), s ->
        |  array_min(transform(sset, x ->
        |    CAST(conv(substr(md5(concat(CAST(s AS STRING), ':', x)), 1, 8), 16, 10) AS BIGINT))))"""
        .stripMargin).as("sig"))
    val banded = sig
      .select(col("doc_id"), explode(expr("sequence(0, 3)")).as("band"), col("sig"))
      .select(col("doc_id"), expr(
        "concat_ws('_', band, sig[band*3], sig[band*3+1], sig[band*3+2])").as("band_key"))
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
      |sig AS (
      |  SELECT doc_id, sset,
      |         list_transform(range(0, 12), s ->
      |           list_min(list_transform(sset, x ->
      |             CAST(concat('0x', substr(md5(concat(CAST(s AS VARCHAR), ':', x)), 1, 8)) AS BIGINT)))) AS sig
      |  FROM sh),
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
  def simhashDedup(documents: DataFrame, maxHamming: Int = 3): DataFrame = {
    val fps = shingled(documents).select(col("doc_id"), expr(
      """aggregate(
        |  transform(sequence(0, 31), b ->
        |    CASE WHEN aggregate(
        |           transform(sset, x ->
        |             CAST(conv(substr(md5(concat('0:', x)), 1, 8), 16, 10) AS BIGINT)),
        |           0L, (acc, h) ->
        |             acc + CASE WHEN (shiftright(h, b) & 1) = 1 THEN 1L ELSE -1L END) > 0
        |         THEN shiftleft(CAST(1 AS BIGINT), b) ELSE 0L END),
        |  0L, (acc, x) -> acc + x)""".stripMargin).as("fp"))
    val banded = fps.select(col("doc_id"), col("fp"),
      explode(expr("sequence(0, 3)")).as("band"))
      .select(col("doc_id"), col("fp"),
        expr("concat_ws(':', band, shiftright(fp, band*8) & 255)").as("band_key"))
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
  // in two length buckets (width 64, offset 32), so any pair differing by
  // <32 chars shares a bucket — exact for near-dups (which are length-
  // close by construction) without the all-pairs cross join.
  // --------------------------------------------------------------------
  def ngramJaccard(documents: DataFrame, threshold: Double = 0.5): DataFrame = {
    val sh = documents
      .select(col("doc_id"), col("n_chars"), split(lower(col("text")), "\\s+").as("toks"))
      .filter(size(col("toks")) >= 3)
      .select(col("doc_id"), col("n_chars"), expr(
        """array_distinct(transform(sequence(0, size(toks)-3),
          |  i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2])))""".stripMargin).as("sset"))
    val bucketed = sh.select(col("doc_id"), col("sset"),
      explode(expr(
        "array_distinct(array(CAST(floor(n_chars/64) AS BIGINT), CAST(floor((n_chars+32)/64) AS BIGINT) + 1000000))"))
        .as("bucket"))
    bucketed.as("x").join(bucketed.as("y"), "bucket")
      .filter(col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"),
        expr(
          """size(array_intersect(x.sset, y.sset)) /
            |  CAST(size(x.sset) + size(y.sset) - size(array_intersect(x.sset, y.sset)) AS DOUBLE)"""
            .stripMargin).as("jac"))
      .distinct()
      .filter(col("jac") >= threshold)
      .select(col("a"), col("b"), round(col("jac"), 4).as("jaccard"))
      .orderBy(col("a"), col("b"))
  }

  val ngramJaccardOracle: String =
    """WITH toks AS (
      |  SELECT doc_id, n_chars, string_split_regex(lower(text), '\s+') AS ts FROM documents),
      |sh AS (
      |  SELECT doc_id, n_chars,
      |         list_distinct([ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2]
      |                        for i in range(1, len(ts)-1)]) AS sset
      |  FROM toks WHERE len(ts) >= 3),
      |bucketed AS (
      |  SELECT doc_id, sset, bucket
      |  FROM sh, unnest(list_distinct([CAST(floor(n_chars/64) AS BIGINT),
      |                                 CAST(floor((n_chars+32)/64) AS BIGINT) + 1000000])) AS t(bucket)),
      |pairs AS (
      |  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b,
      |         len(list_intersect(x.sset, y.sset)) /
      |           CAST(len(x.sset) + len(y.sset) - len(list_intersect(x.sset, y.sset)) AS DOUBLE) AS jac
      |  FROM bucketed x JOIN bucketed y ON x.bucket = y.bucket AND x.doc_id < y.doc_id)
      |SELECT a, b, ROUND(jac, 4) AS jaccard FROM pairs WHERE jac >= 0.5 ORDER BY a, b""".stripMargin
}
