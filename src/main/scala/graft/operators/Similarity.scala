package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (north-star extension;
  * generalizes the reference's embedding-shuffle patterns,
  * plants_classifier.py:190–231).
  *
  * Determinism design: embeddings are quantized to integers
  * (`round(x·10⁴)` per dimension) so dot products and squared norms are
  * EXACT integer arithmetic — order-independent, bit-identical across
  * engines, partition counts and AQE re-plans. The only floating-point
  * ops are a final divide/sqrt on exactly-representable integers (all
  * < 2⁵³), which IEEE 754 defines exactly. Quantization error on the
  * cosine is ≤ ~1e-4 — standard practice for large-scale vector search
  * (int8/int16 quantized indexes), not a test-only hack.
  *
  * Scale design: [[cosineNearDup]] and [[annBruteTopK]] are the exact
  * baselines (quadratic candidate generation — fine for a broadcast-able
  * side, not for 100 TB×100 TB); [[annLshTopK]] is the scale path:
  * random-hyperplane LSH buckets vectors in one narrow shuffle, and the
  * quadratic step runs only within buckets (expected bucket size n/2^planes).
  */
object Similarity {

  /** md5-derived 32-bit unsigned hash — the engine's canonical hash,
    * delegated to the ONE implementation in [[graft.functions.H32Helper]]
    * (a local copy here would be a silent-divergence risk for the
    * cross-engine determinism anchor). */
  private def h32(s: String): Long = graft.functions.H32Helper.h32(s)

  /** LSH hyperplane weights w(p, d) = h32("p:d") − 2³¹, grown lazily to
    * whatever dimensionality the data actually has and cached per JVM —
    * a fixed-width table would crash (ArrayIndexOutOfBounds per task) on
    * embeddings wider than its guess. The weights are a pure function of
    * (p, d), so late growth is always consistent with earlier reads. */
  private object LshWeights {
    @volatile private var table: Array[Array[Long]] = Array.empty
    def upTo(planes: Int, dims: Int): Array[Array[Long]] = {
      val t = table
      if (t.length >= planes && (t.length == 0 || t(0).length >= dims)) t
      else synchronized {
        val cur = table
        if (cur.length >= planes && (cur.length == 0 || cur(0).length >= dims)) cur
        else {
          val np = math.max(planes, cur.length)
          val nd = math.max(dims, if (cur.isEmpty) 0 else cur(0).length)
          val fresh = Array.tabulate(np, nd)((p, d) => h32(s"$p:$d") - 2147483648L)
          table = fresh
          fresh
        }
      }
    }
  }

  /** (vec_id, qv: array<bigint> quantized, n2: bigint squared norm). */
  private[operators] def quantized(embeddings: DataFrame,
                                   keepLabel: Boolean = false): DataFrame = {
    val base =
      if (keepLabel) Seq(col("vec_id"), expr("CAST(label AS INT)").as("label"))
      else Seq(col("vec_id"))
    embeddings.select(base :+
        expr("transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 10000) AS BIGINT))").as("qv"): _*)
      .withColumn("n2", expr("aggregate(qv, 0L, (a, x) -> a + x*x)"))
      .filter(col("n2") > 0)
  }

  private[operators] val oracleQuantized: String =
    """q AS (
      |  SELECT vec_id,
      |         list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 10000) AS BIGINT)) AS qv
      |  FROM embeddings),
      |qn AS (
      |  SELECT vec_id, qv,
      |         CAST(list_sum(list_transform(qv, x -> x*x)) AS BIGINT) AS n2
      |  FROM q WHERE CAST(list_sum(list_transform(qv, x -> x*x)) AS BIGINT) > 0)""".stripMargin

  /** Exact quantized cosine between two (qv, n2) pairs as a SQL snippet.
    * The dot product is the codegen'd [[graft.functions.DotLongExpression]]
    * reading both Tungsten arrays in place — the higher-order
    * aggregate(zip_with(...)) form is CodegenFallback (every element
    * evaluates interpreted, ~20× slower), which matters at the ANN
    * functions' candidate volumes. Callers must have run
    * `GraftFunctions.register`. */
  private[operators] val cosExpr =
    """CAST(graft_dot_long(x.qv, y.qv) AS DOUBLE)
      |  / sqrt(CAST(x.n2 AS DOUBLE) * CAST(y.n2 AS DOUBLE))""".stripMargin

  private[operators] val oracleCosExpr =
    """CAST(list_sum(list_transform(range(1, len(x.qv)+1), i -> x.qv[i]*y.qv[i])) AS DOUBLE)
      |  / sqrt(CAST(x.n2 AS DOUBLE) * CAST(y.n2 AS DOUBLE))""".stripMargin

  // --------------------------------------------------------------------
  // Exact near-duplicate pairs by cosine ≥ threshold, as a DISTRIBUTED
  // blocked self-join: vectors are assigned to one of B blocks
  // (vec_id mod B); each row is replicated to every block-pair it
  // participates in (B copies), and the O(n²/2) dot products run inside
  // the ~B²/2 block-pair join groups — each a bounded n/B × n/B tile, so
  // per-task memory is bounded and the work spreads across the cluster.
  // No driver-side materialization anywhere: the old collect()+broadcast
  // shape dies at the driver before the first task at real scale. The
  // dot product itself is a codegen'd native Expression
  // ([[graft.functions.DotLongExpression]]) reading Tungsten arrays in
  // place — no per-pair array copies. All-pairs compute is inherently
  // quadratic; [[annLshTopK]] is the sub-quadratic path at scale.
  // --------------------------------------------------------------------
  def cosineNearDup(embeddings: DataFrame, threshold: Double = 0.5,
                    blocks: Int = 0): DataFrame = {
    val spark = embeddings.sparkSession
    graft.functions.GraftFunctions.register(spark)
    // Default block count scales with the cluster, not the data: B(B+1)/2
    // block-pair join groups ≈ 4× task slots keeps every core busy while
    // bounding row replication (each row ships to ~B/2+1 groups per side).
    // On a 1000-executor × 8-core cluster this derives B ≈ 180 — 16k
    // tiles — with no driver-side data inspection needed.
    val B = if (blocks > 0) blocks
      else math.max(4, math.ceil(math.sqrt(8.0 * spark.sparkContext.defaultParallelism)).toInt)
    val q = quantized(embeddings)
      .withColumn("blk", pmod(col("vec_id"), lit(B.toLong)).cast("int"))
    // A row in block b is the LEFT of block-pairs (b, b..B-1) and the
    // RIGHT of block-pairs (0..b, b): every unordered pair of rows meets
    // in exactly one block-pair group (within-block pairs deduped by the
    // vec_id < vec_id filter below).
    val left = q.withColumn("hi", explode(expr(s"sequence(blk, ${B - 1})")))
      .withColumnRenamed("blk", "lo")
    val right = q.withColumn("lo", explode(expr("sequence(0, blk)")))
      .withColumnRenamed("blk", "hi")
    // shuffle-hash, not sort-merge: the build side is a bounded n/B-row
    // tile and sorting 4 KB array rows is pure waste
    left.as("x").join(right.as("y").hint("shuffle_hash"),
        col("x.lo") === col("y.lo") && col("x.hi") === col("y.hi"))
      .filter(col("x.lo") =!= col("x.hi") || col("x.vec_id") < col("y.vec_id"))
      .select(
        least(col("x.vec_id"), col("y.vec_id")).as("a"),
        greatest(col("x.vec_id"), col("y.vec_id")).as("b"),
        (expr("CAST(graft_dot_long(x.qv, y.qv) AS DOUBLE)") /
          sqrt(col("x.n2").cast("double") * col("y.n2").cast("double"))).as("cos"))
      .filter(col("cos") >= threshold)
      .select(col("a"), col("b"), round(col("cos"), 6).as("cosine"))
      .orderBy(col("a"), col("b"))
  }

  val cosineNearDupOracle: String =
    s"""WITH $oracleQuantized
      |SELECT x.vec_id AS a, y.vec_id AS b,
      |       ROUND($oracleCosExpr, 6) AS cosine
      |FROM qn x JOIN qn y ON x.vec_id < y.vec_id
      |WHERE $oracleCosExpr >= 0.5
      |ORDER BY a, b""".stripMargin

  // --------------------------------------------------------------------
  // Semantic dedup clusters (SemDeDup, Abbas et al. 2023): embeddings
  // whose cosine clears the threshold are near-duplicates in MEANING
  // even when their surface text shares no n-grams (translations,
  // paraphrases, re-renderings) — cluster them transitively and keep one
  // representative per cluster. The pair source is the exact blocked
  // self-join ([[cosineNearDup]]'s plan); the embeddings table is
  // quadratic-by-contract (the LSH/IVF tiers are the sub-quadratic
  // candidate path at scale — swap them in as the pair source when the
  // vector count makes exact all-pairs unaffordable). Components come
  // from the dedup tier's pointer-doubling Pregel loop
  // ([[Dedup.connectedComponents]]) — O(log diameter) rounds on
  // co-partitioned RDDs, loud non-convergence.
  // --------------------------------------------------------------------
  /** Session-memoized (a, b) near-dup pair stage — the embedding tier's
    * twin of the dedup tier's verified-pairs stage: the quadratic
    * blocked self-join builds once per (session, input plan, threshold)
    * and every graph consumer (clusters q78, exemplars q88, degrees
    * q109, PageRank q116, triangles q123) reads the persisted output.
    * Different thresholds are different entries by the memo key. */
  private def nearDupPairs(embeddings: DataFrame,
                           threshold: Double): DataFrame =
    StageMemo.memoized(embeddings, "sim:pairs", threshold)(
      cosineNearDup(embeddings, threshold).select(col("a"), col("b")))

  /** Session-memoized component labels (v, lbl) over [[nearDupPairs]] —
    * the embedding tier's twin of the dedup tier's labels stage, so
    * clusters (q78) and exemplars (q88) pay the Pregel loop once per
    * session. Nested memoization (labels builds on pairs) is the
    * documented [[StageMemo]] pattern. */
  private def semanticLabels(embeddings: DataFrame, threshold: Double,
                             maxIters: Int): DataFrame =
    StageMemo.memoized(embeddings, s"sim:labels:$maxIters", threshold)(
      Dedup.connectedComponents(
        nearDupPairs(embeddings, threshold), maxIters, "semanticLabels"))

  /** Per-cluster rollup (component = min vec_id, n_vecs, max_vec) of the
    * cosine-threshold transitive closure. */
  def semanticClusters(embeddings: DataFrame, threshold: Double = 0.5,
                       maxIters: Int = 25): DataFrame =
    semanticLabels(embeddings, threshold, maxIters)
      .groupBy(col("lbl").as("component"))
      .agg(count(lit(1)).as("n_vecs"), max(col("v")).as("max_vec"))
      .orderBy(col("component"))

  val semanticClustersOracle: String = semanticClustersOracleAt(0.5)

  /** Oracle builder on the SAME cosine threshold as the engine function. */
  def semanticClustersOracleAt(threshold: Double): String =
    s"""WITH RECURSIVE $oracleQuantized,
      |mp AS MATERIALIZED (
      |  SELECT x.vec_id AS a, y.vec_id AS b
      |  FROM qn x JOIN qn y ON x.vec_id < y.vec_id
      |  WHERE $oracleCosExpr >= $threshold),
      |edges AS MATERIALIZED (
      |  SELECT a, b FROM mp UNION ALL SELECT b AS a, a AS b FROM mp),
      |reach(v, w) AS (
      |  SELECT DISTINCT a AS v, a AS w FROM edges
      |  UNION
      |  SELECT r.v, e.b AS w FROM reach r JOIN edges e ON e.a = r.w),
      |comp AS (
      |  SELECT v, MIN(w) AS component FROM reach GROUP BY v)
      |SELECT component, CAST(COUNT(*) AS BIGINT) AS n_vecs, MAX(v) AS max_vec
      |FROM comp GROUP BY component ORDER BY component""".stripMargin

  // --------------------------------------------------------------------
  // Brute-force cosine top-k for a query set (vec_id < 10): the exact
  // baseline every ANN variant is measured against.
  // --------------------------------------------------------------------
  def annBruteTopK(embeddings: DataFrame, k: Int = 5, nQueries: Int = 10): DataFrame = {
    graft.functions.GraftFunctions.register(embeddings.sparkSession)
    val q = quantized(embeddings)
    val queries = q.filter(col("vec_id") < nQueries)
    queries.as("x").join(q.as("y"), col("x.vec_id") =!= col("y.vec_id"))
      .select(col("x.vec_id").as("qid"), col("y.vec_id").as("nid"),
        expr(cosExpr).as("cos"))
      .withColumn("rank", expr(
        "row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid ASC)"))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("nid"), round(col("cos"), 6).as("cosine"))
      .orderBy(col("qid"), col("rank"))
  }

  // --------------------------------------------------------------------
  // Incremental EMBEDDING admission — the semantic twin of the text
  // tier's q130: an incoming batch of vectors (odd vec_ids, the
  // modulo-split convention) is probed against the existing base index
  // (even ids) for near-duplicates at admission time. The batch
  // BROADCASTS (guarded) and the base STREAMS: one base scan per
  // ingest, zero shuffle of the base, no base×base pair ever
  // evaluated — the shape a continuously-ingesting SemDeDup gate runs
  // at 100 TB, where the base is the big thing and the batch is the
  // small thing. Past the broadcast guard the LSH/IVF candidate tiers
  // (q30/q54/q81) are the documented scale path; `broadcastBatch =
  // false` keeps the same semantics and lets Spark plan the join.
  // Output: each batch vector that near-dups the base, with its best
  // base match (max cosine, ties to lowest base id) — the reject list.
  // --------------------------------------------------------------------
  def embAdmission(embeddings: DataFrame, threshold: Double = 0.45,
                   broadcastBatch: Boolean = true,
                   maxBatchRows: Long = 1000000L): DataFrame = {
    graft.functions.GraftFunctions.register(embeddings.sparkSession)
    val q = quantized(embeddings)
    val batch = q.filter(col("vec_id") % 2 === 1)
      .select(col("vec_id").as("bv"), col("qv").as("bqv"), col("n2").as("bn2"))
    val base = q.filter(col("vec_id") % 2 === 0)
    val batchSide =
      if (!broadcastBatch) batch
      else {
        val cnt = batch.agg(count(lit(1)).as("batch_rows"))
        broadcast(batch.crossJoin(cnt).select(
          expr(Guards.guardedSql("batch_rows", maxBatchRows,
            "embAdmission batch", "bv", "BIGINT",
            "call embAdmission with broadcastBatch = false, or use the " +
              "LSH/IVF candidate tiers")).as("bv"),
          col("bqv"), col("bn2")))
      }
    base.as("y").join(batchSide)
      .select(col("bv").as("batch_vec"), col("vec_id").as("base_vec"),
        (expr("CAST(graft_dot_long(bqv, qv) AS DOUBLE)") /
          sqrt(col("bn2").cast("double") * col("n2").cast("double"))).as("cos"))
      .filter(col("cos") >= threshold)
      .withColumn("rnk", expr(
        "row_number() OVER (PARTITION BY batch_vec ORDER BY cos DESC, base_vec ASC)"))
      .filter(col("rnk") === 1)
      .select(col("batch_vec"), col("base_vec"),
        round(col("cos"), 6).as("cosine"))
      .orderBy(col("batch_vec"))
  }

  val embAdmissionOracle: String = embAdmissionOracleAt(0.45)

  /** Oracle builder on the SAME cosine threshold as the engine. */
  def embAdmissionOracleAt(threshold: Double): String =
    s"""WITH $oracleQuantized,
      |scored AS (
      |  SELECT x.vec_id AS batch_vec, y.vec_id AS base_vec,
      |         $oracleCosExpr AS cos
      |  FROM qn x JOIN qn y
      |    ON x.vec_id % 2 = 1 AND y.vec_id % 2 = 0),
      |ranked AS (
      |  SELECT batch_vec, base_vec, cos,
      |         row_number() OVER (PARTITION BY batch_vec
      |                            ORDER BY cos DESC, base_vec ASC) AS rnk
      |  FROM scored WHERE cos >= $threshold)
      |SELECT batch_vec, base_vec, ROUND(cos, 6) AS cosine
      |FROM ranked WHERE rnk = 1 ORDER BY batch_vec""".stripMargin

  val annBruteTopKOracle: String =
    s"""WITH $oracleQuantized,
      |scored AS (
      |  SELECT x.vec_id AS qid, y.vec_id AS nid,
      |         $oracleCosExpr AS cos
      |  FROM qn x JOIN qn y ON x.vec_id <> y.vec_id
      |  WHERE x.vec_id < 10),
      |ranked AS (
      |  SELECT qid, nid, cos,
      |         row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid ASC) AS rank
      |  FROM scored)
      |SELECT qid, CAST(rank AS INT) AS rank, nid, ROUND(cos, 6) AS cosine
      |FROM ranked WHERE rank <= 5 ORDER BY qid, rank""".stripMargin

  // --------------------------------------------------------------------
  // Random-hyperplane LSH ANN with MULTI-PROBE: 4 md5-derived integer
  // hyperplanes bucket every vector (one narrow shuffle on the 4-bit
  // bucket); each query probes its own bucket plus every bucket within
  // `probeRadius` bit flips (radius 1 = planes+1 probes), so a true
  // neighbor is missed only when >probeRadius hyperplanes disagree —
  // measured top-3 recall on the fixture rises from 0.27 (single
  // bucket) to the floor pinned in AnnRecallSpec. Candidate volume is
  // Σ_{r≤radius} C(planes, r) / 2^planes of the corpus per query; the
  // (recall, candidate-fraction) CURVE across planes/radius/nProbe is
  // measured and pinned in AnnRecallSpec — the default operating point
  // (4 planes, radius 1 ≈ 31% candidates) is the cost/recall trade, not
  // an accident. Integer weights w(p,d) = h32("p:d") - 2³¹ keep the
  // sign computation exact — no float accumulation anywhere.
  // --------------------------------------------------------------------
  /** Scored LSH candidates (qid, nid, cos) BEFORE ranking — the stage
    * AnnRecallSpec counts to measure true candidate fractions. */
  /** Hyperplane-sign bucket of a quantized vector. Weights are
    * row-independent and a pure function of (plane, dim) — the same md5
    * formula the oracle recomputes in SQL. [[LshWeights]] grows the
    * cached table to the data's actual dimensionality on first touch
    * per executor; the steady-state cost per row is one volatile
    * read. Shared by [[annLshScored]] and [[hardNegatives]] so the
    * bucketing can never drift between the two. */
  private def bucketUdf(planes: Int) = udf { qv: Seq[Long] =>
    val wts = LshWeights.upTo(planes, qv.length)
    var bucket = 0
    var p = 0
    while (p < planes) {
      var dot = 0L
      var d = 0
      while (d < qv.length) { dot += wts(p)(d) * qv(d); d += 1 }
      if (dot > 0) bucket |= 1 << p
      p += 1
    }
    bucket
  }

  private[graft] def annLshScored(embeddings: DataFrame, nQueries: Int,
                                  planes: Int, probeRadius: Int): DataFrame = {
    graft.functions.GraftFunctions.register(embeddings.sparkSession)
    val q = quantized(embeddings)
    val bucketed = q.withColumn("bucket", bucketUdf(planes)(col("qv")))
      // exchange barrier: quantized vectors + buckets materialize once;
      // the query and candidate branches reuse the same shuffle output
      .repartition(col("bucket"))
    // multi-probe: the query side fans out to every bucket within
    // probeRadius bit flips (an equi-join per probe — never a theta-join
    // over bucket distance)
    val masks = (0 until (1 << planes)).filter(m =>
      Integer.bitCount(m) <= probeRadius)
    val probeList = masks.map {
      case 0 => "bucket"
      case m => s"bucket ^ $m"
    }.mkString(", ")
    val queries = bucketed.filter(col("vec_id") < nQueries)
      .withColumn("probe", explode(expr(s"array($probeList)")))
    queries.as("x").join(bucketed.as("y"),
        col("x.probe") === col("y.bucket") && col("x.vec_id") =!= col("y.vec_id"))
      .select(col("x.vec_id").as("qid"), col("y.vec_id").as("nid"),
        expr(cosExpr).as("cos"))
  }

  def annLshTopK(embeddings: DataFrame, k: Int = 3, nQueries: Int = 10,
                 planes: Int = 4, probeRadius: Int = 1): DataFrame =
    annLshScored(embeddings, nQueries, planes, probeRadius)
      .withColumn("rank", expr(
        "row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid ASC)"))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("nid"), round(col("cos"), 6).as("cosine"))
      .orderBy(col("qid"), col("rank"))

  // --------------------------------------------------------------------
  // IVF (inverted-file) ANN — the second scale path next to LSH:
  // C deterministic centroids (the vectors with the C smallest md5(id)
  // hashes — an engine-independent pseudo-random sample), every vector
  // assigned to its nearest centroid cell by EXACT integer distance
  // (argmin of n2_c − 2·v·c; the ‖v‖² term cancels), queries probe the
  // nProbe nearest cells. One narrow shuffle on the cell id; the
  // quadratic step runs only inside probed cells (expected n/C of the
  // corpus each). The (score, centroid-index) argmin is ENCODED into one
  // bigint (score′·256 + idx with a 2³⁸ offset to keep it nonnegative)
  // so both engines order plain integers — no cross-engine struct
  // comparison semantics anywhere.
  // --------------------------------------------------------------------
  // --------------------------------------------------------------------
  // LSH near-dup pair source — the SUB-QUADRATIC path into
  // [[semanticClusters]]: candidates are same-bucket pairs in ANY of L
  // independent hyperplane tables (union raises recall: P[caught] =
  // 1 − (1 − (1 − θ/π)^planes)^L — at cos ≥ 0.9, 4 tables × 4 planes
  // catch ~95% of true pairs), each verified by the exact quantized
  // cosine before it becomes an edge. Work is Σ_buckets n_b² instead of
  // n²/2; more planes → smaller buckets (the knob to turn when a
  // degenerate embedding distribution concentrates one bucket — that,
  // plus AQE skew-split, is the hot-bucket story at scale).
  // --------------------------------------------------------------------
  /** Verified near-dup pairs (a, b) from L hyperplane tables. Table t
    * uses planes [t·planes, (t+1)·planes) of the shared (p, d) weight
    * formula, so the oracle recomputes every bucket bit-identically. */
  private[graft] def lshNearDupPairs(embeddings: DataFrame, threshold: Double,
                                     tables: Int, planes: Int): DataFrame = {
    graft.functions.GraftFunctions.register(embeddings.sparkSession)
    val bucketsUdf = udf { qv: Seq[Long] =>
      val wts = LshWeights.upTo(tables * planes, qv.length)
      Array.tabulate(tables) { t =>
        var bucket = 0
        var p = 0
        while (p < planes) {
          val w = wts(t * planes + p)
          var dot = 0L
          var d = 0
          while (d < qv.length) { dot += w(d) * qv(d); d += 1 }
          if (dot > 0) bucket |= 1 << p
          p += 1
        }
        // fold the table id into the join key: tables must not cross-match
        (t.toLong << 32) | (bucket.toLong & 0xffffffffL)
      }
    }
    val bucketed = quantized(embeddings)
      .select(col("vec_id"), col("qv"), col("n2"),
        explode(bucketsUdf(col("qv"))).as("bkey"))
      // exchange barrier: the self-join's branches reuse one shuffle
      .repartition(col("bkey"))
    bucketed.as("x")
      .join(bucketed.as("y").hint("shuffle_hash"), Seq("bkey"))
      .filter(col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id").as("a"), col("y.vec_id").as("b"),
        (expr("CAST(graft_dot_long(x.qv, y.qv) AS DOUBLE)") /
          sqrt(col("x.n2").cast("double") * col("y.n2").cast("double"))).as("cos"))
      .filter(col("cos") >= threshold)
      // a true pair can collide in several tables — one edge each
      .select(col("a"), col("b")).distinct()
  }

  /** [[semanticClusters]] on the LSH pair source — identical rollup,
    * sub-quadratic candidate generation; recall bounded by the table ×
    * plane configuration rather than exactness. */
  def semanticClustersLsh(embeddings: DataFrame, threshold: Double = 0.5,
                          tables: Int = 4, planes: Int = 4,
                          maxIters: Int = 25): DataFrame =
    Dedup.connectedComponents(
      lshNearDupPairs(embeddings, threshold, tables, planes), maxIters,
      "semanticClustersLsh")
      .groupBy(col("lbl").as("component"))
      .agg(count(lit(1)).as("n_vecs"), max(col("v")).as("max_vec"))
      .orderBy(col("component"))

  val semanticClustersLshOracle: String = semanticClustersLshOracleAt(0.5, 4, 4)

  /** Oracle builder on the SAME threshold/tables/planes as the engine. */
  def semanticClustersLshOracleAt(threshold: Double, tables: Int,
                                  planes: Int): String =
    s"""WITH RECURSIVE $oracleQuantized,
      |bucketed AS (
      |  SELECT vec_id, qv, n2, t,
      |         CAST(list_sum(list_transform(range(0, $planes), p ->
      |           CASE WHEN list_sum(list_transform(range(1, len(qv)+1), d ->
      |                  (CAST(concat('0x', substr(md5(concat(CAST(t * $planes + p AS VARCHAR), ':', CAST(d-1 AS VARCHAR))), 1, 8)) AS BIGINT)
      |                   - 2147483648) * qv[d])) > 0
      |                THEN 1 << p ELSE 0 END)) AS INT) AS bucket
      |  FROM qn, (SELECT unnest(range(0, $tables)) AS t)),
      |mp AS MATERIALIZED (
      |  SELECT DISTINCT x.vec_id AS a, y.vec_id AS b
      |  FROM bucketed x JOIN bucketed y
      |    ON x.t = y.t AND x.bucket = y.bucket AND x.vec_id < y.vec_id
      |  WHERE $oracleCosExpr >= $threshold),
      |edges AS MATERIALIZED (
      |  SELECT a, b FROM mp UNION ALL SELECT b AS a, a AS b FROM mp),
      |reach(v, w) AS (
      |  SELECT DISTINCT a AS v, a AS w FROM edges
      |  UNION
      |  SELECT r.v, e.b AS w FROM reach r JOIN edges e ON e.a = r.w),
      |comp AS (
      |  SELECT v, MIN(w) AS component FROM reach GROUP BY v)
      |SELECT component, CAST(COUNT(*) AS BIGINT) AS n_vecs, MAX(v) AS max_vec
      |FROM comp GROUP BY component ORDER BY component""".stripMargin

  /** Scored IVF candidates (qid, nid, cos) BEFORE ranking — see
    * [[annLshScored]]; AnnRecallSpec sweeps nProbe/centroids over this. */
  // ---- shared IVF primitives (annIvfScored + the persisted embedding
  // admission index, AdmissionIndex.embBuildIndex/embProbe): exact
  // integer cell scores against a broadcast centroid summary, and the
  // derived nearest-cell / nProbe-probe UDFs. One implementation so the
  // in-session path and the persisted path can never drift. ----

  /** C centroids, cheapest-md5-hash-first, fully deterministic. The
    * collect is the C×dims SUMMARY (a few KB), never the table — the
    * same legitimate driver-side broadcast build as the LSH hyperplane
    * weights; inlining it as a plan subtree instead was measured to
    * re-run the centroid scan once per consumer (3 scans). */
  private[operators] def ivfCentroids(q: DataFrame,
      centroids: Int): Array[(Array[Long], Long)] = {
    val spark = q.sparkSession
    import spark.implicits._
    q.withColumn("h", expr(
        "CAST(conv(substr(md5(CAST(vec_id AS STRING)), 1, 8), 16, 10) AS BIGINT)"))
      .orderBy(col("h"), col("vec_id")).limit(centroids)
      .select(col("qv"), col("n2")).as[(Array[Long], Long)].collect()
  }

  /** Exact integer distance per centroid: n2_c − 2·v·c (the ‖v‖² term
    * cancels in the argmin); ties break to the lower centroid index. */
  private def ivfCellScores(cs: Array[(Array[Long], Long)],
                            qv: Seq[Long]): Array[Long] =
    Array.tabulate(cs.length) { i =>
      val (cqv, cn2) = cs(i)
      var dot = 0L
      var d = 0
      while (d < cqv.length) { dot += qv(d) * cqv(d); d += 1 }
      cn2 - 2L * dot
    }

  private[operators] def ivfCellUdf(
      bc: org.apache.spark.broadcast.Broadcast[Array[(Array[Long], Long)]]) =
    udf { qv: Seq[Long] =>
      val s = ivfCellScores(bc.value, qv)
      var best = 0
      var i = 1
      while (i < s.length) { if (s(i) < s(best)) best = i; i += 1 }
      best
    }

  private[operators] def ivfProbeUdf(
      bc: org.apache.spark.broadcast.Broadcast[Array[(Array[Long], Long)]],
      nProbe: Int) =
    udf { qv: Seq[Long] =>
      ivfCellScores(bc.value, qv).zipWithIndex.sortBy(identity)
        .take(nProbe).map(_._2)
    }

  private[graft] def annIvfScored(embeddings: DataFrame, nQueries: Int,
                                  centroids: Int, nProbe: Int): DataFrame = {
    val spark = embeddings.sparkSession
    graft.functions.GraftFunctions.register(spark)
    val q = quantized(embeddings)
    val bc = spark.sparkContext.broadcast(ivfCentroids(q, centroids))
    val cellUdf = ivfCellUdf(bc)
    val probeUdf = ivfProbeUdf(bc, nProbe)
    val assigned = q
      .select(col("vec_id"), col("qv"), col("n2"), cellUdf(col("qv")).as("cell"))
      .repartition(col("cell"))
    val probes = q.filter(col("vec_id") < nQueries)
      .select(col("vec_id"), col("qv"), col("n2"),
        explode(probeUdf(col("qv"))).as("cell"))
    probes.as("x").join(assigned.as("y"),
        col("x.cell") === col("y.cell") && col("x.vec_id") =!= col("y.vec_id"))
      .select(col("x.vec_id").as("qid"), col("y.vec_id").as("nid"),
        expr(cosExpr).as("cos"))
  }

  /** Default nProbe = 4: the measured sweep (AnnRecallSpecSweep) puts
    * 4-probe at recall@3 0.57 for 25% candidates on the near-random
    * fixture — a strictly better operating point than 2-probe's 0.37 at
    * 13% (recall/candidate ratio 2.3× vs 2.9×, but the absolute recall
    * of 2-probe is too low to ship as the default of a first-class
    * similarity tier). nProbe stays the per-call cost/recall knob. */
  def annIvfTopK(embeddings: DataFrame, k: Int = 3, nQueries: Int = 10,
                 centroids: Int = 16, nProbe: Int = 4): DataFrame =
    annIvfScored(embeddings, nQueries, centroids, nProbe)
      .withColumn("rank", expr(
        "row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid ASC)"))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("nid"), round(col("cos"), 6).as("cosine"))
      .orderBy(col("qid"), col("rank"))

  val annIvfTopKOracle: String = {
    val OFF = 274877906944L
    val dotCQ =
      """CAST(list_sum(list_transform(range(1, len(q.qv)+1), d -> q.qv[d] * cents[i].qv[d])) AS BIGINT)"""
    val scores =
      s"""list_transform(range(1, len(cents)+1), i ->
         |        (cents[i].n2 - 2 * $dotCQ + $OFF) * 256 + (i - 1))""".stripMargin
    s"""WITH $oracleQuantized,
      |ranked_cents AS (
      |  SELECT qv, n2,
      |         CAST(concat('0x', substr(md5(CAST(vec_id AS VARCHAR)), 1, 8)) AS BIGINT) AS h,
      |         vec_id
      |  FROM qn ORDER BY h, vec_id LIMIT 16),
      |carr AS (
      |  SELECT list(struct_pack(qv := qv, n2 := n2) ORDER BY h, vec_id) AS cents
      |  FROM ranked_cents),
      |assigned AS (
      |  SELECT q.vec_id, q.qv, q.n2,
      |         list_min($scores) % 256 AS cell
      |  FROM qn q, carr),
      |probes AS (
      |  SELECT q.vec_id, q.qv, q.n2, t.pcell
      |  FROM qn q, carr,
      |       unnest(list_transform(list_sort($scores)[1:4], x -> x % 256)) AS t(pcell)
      |  WHERE q.vec_id < 10),
      |scored AS (
      |  SELECT x.vec_id AS qid, y.vec_id AS nid,
      |         $oracleCosExpr AS cos
      |  FROM probes x JOIN assigned y
      |    ON x.pcell = y.cell AND x.vec_id <> y.vec_id),
      |ranked AS (
      |  SELECT qid, nid, cos,
      |         row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid ASC) AS rank
      |  FROM scored)
      |SELECT qid, CAST(rank AS INT) AS rank, nid, ROUND(cos, 6) AS cosine
      |FROM ranked WHERE rank <= 3 ORDER BY qid, rank""".stripMargin
  }

  // --------------------------------------------------------------------
  // Int8 scalar quantization audit: per-dimension (min, max) over the
  // corpus → 255-code affine quantization of each vector → exact
  // reconstruction error. The memory-side complement of the ANN tier: a
  // 100 TB float32 index is 4× the RAM of its int8 twin, and this audit
  // is how you decide the compression is safe (avg/max error per label).
  //
  // Exactness: built on the engine's ×10⁴ integer representation, so the
  // code, the dequantized value and the squared error are ALL integer
  // arithmetic — the half-up rational rounding round(p/q) is computed as
  // (2p+q) DIV 2q on nonnegative integers (identical to DuckDB's //).
  // No float op exists anywhere, so no cross-engine rounding surface.
  //
  // Scale shape: pass 1 is a posexplode + (dim)-keyed partial aggregate
  // (64 rows out); the one-row (mins, maxs) summary broadcasts; pass 2
  // is row-local. Two scans of the vectors table by construction
  // (min/max must complete before coding starts — the same two-pass
  // shape as any corpus-statistics quantizer).
  // --------------------------------------------------------------------
  /** Per-element squared reconstruction error in (10⁻⁴)² units:
    * a = qv[i]−mn, b = mx−mn, code = round(254a/b), err = (a −
    * round(code·b/254))². The SQL lambda is shared by engine and oracle
    * modulo 0- vs 1-based indexing. */
  private def int8ErrLambda(v: String, mn: String, mx: String): String =
    s"""CASE WHEN $mx > $mn THEN
       |  ($v - $mn - (2L * ((2L * ($v - $mn) * 254L + ($mx - $mn)) DIV (2L * ($mx - $mn))) * ($mx - $mn) + 254L) DIV 508L)
       |  * ($v - $mn - (2L * ((2L * ($v - $mn) * 254L + ($mx - $mn)) DIV (2L * ($mx - $mn))) * ($mx - $mn) + 254L) DIV 508L)
       |ELSE 0L END""".stripMargin

  def int8QuantStats(embeddings: DataFrame): DataFrame = {
    val q = embeddings.select(expr("CAST(label AS INT)").as("label"),
      expr("transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 10000) AS BIGINT))").as("qv"))
    val dims = q.select(posexplode(col("qv")).as(Seq("d", "v")))
      .groupBy(col("d")).agg(min(col("v")).as("mn"), max(col("v")).as("mx"))
    // one-row (mins, maxs) summary — in-plan, broadcast (q53 pattern);
    // array_sort on (d, mn, mx) structs orders by the leading int d
    val statsRow = dims
      .agg(expr("array_sort(collect_list(struct(d, mn, mx)))").as("s"))
      .select(expr("transform(s, e -> e.mn)").as("mns"),
        expr("transform(s, e -> e.mx)").as("mxs"))
    q.crossJoin(broadcast(statsRow))
      .select(col("label"),
        expr(s"""aggregate(transform(qv, (v, i) ->
          |  ${int8ErrLambda("v", "mns[i]", "mxs[i]")}),
          |  0L, (acc, e) -> acc + e)""".stripMargin).as("err"))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n_vecs"),
        sum(col("err")).as("total_err_q8"),
        expr("CAST(sum(err) DIV count(1) AS BIGINT)").as("avg_err_q8"),
        max(col("err")).as("max_err_q8"))
      .orderBy(col("label"))
  }

  val int8QuantStatsOracle: String = {
    val errExpr = int8ErrLambda("qv[i]", "mns[i]", "mxs[i]")
      .replace("DIV", "//").replace("254L", "254").replace("508L", "508")
      .replace("2L", "2").replace("0L", "0")
    s"""WITH q AS (
      |  SELECT CAST(label AS INT) AS label,
      |         list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 10000) AS BIGINT)) AS qv
      |  FROM embeddings),
      |dims AS (
      |  SELECT d, MIN(qv[d]) AS mn, MAX(qv[d]) AS mx
      |  FROM q, range(1, 65) AS t(d) GROUP BY d),
      |stats AS (
      |  SELECT list(mn ORDER BY d) AS mns, list(mx ORDER BY d) AS mxs FROM dims),
      |pervec AS (
      |  SELECT label,
      |         CAST(list_sum([$errExpr for i in range(1, 65)]) AS BIGINT) AS err
      |  FROM q, stats)
      |SELECT label, CAST(COUNT(*) AS BIGINT) AS n_vecs,
      |       CAST(SUM(err) AS BIGINT) AS total_err_q8,
      |       CAST(SUM(err) // COUNT(*) AS BIGINT) AS avg_err_q8,
      |       CAST(MAX(err) AS BIGINT) AS max_err_q8
      |FROM pervec GROUP BY label ORDER BY label""".stripMargin
  }

  val annLshTopKOracle: String =
    s"""WITH $oracleQuantized,
      |bucketed AS (
      |  SELECT vec_id, qv, n2,
      |         CAST(list_sum(list_transform(range(0, 4), p ->
      |           CASE WHEN list_sum(list_transform(range(1, len(qv)+1), d ->
      |                  (CAST(concat('0x', substr(md5(concat(CAST(p AS VARCHAR), ':', CAST(d-1 AS VARCHAR))), 1, 8)) AS BIGINT)
      |                   - 2147483648) * qv[d])) > 0
      |                THEN 1 << p ELSE 0 END)) AS INT) AS bucket
      |  FROM qn),
      |probes AS (
      |  SELECT vec_id, qv, n2,
      |         unnest([bucket, xor(bucket, 1), xor(bucket, 2), xor(bucket, 4), xor(bucket, 8)]) AS probe
      |  FROM bucketed WHERE vec_id < 10),
      |scored AS (
      |  SELECT x.vec_id AS qid, y.vec_id AS nid,
      |         $oracleCosExpr AS cos
      |  FROM probes x JOIN bucketed y
      |    ON x.probe = y.bucket AND x.vec_id <> y.vec_id),
      |ranked AS (
      |  SELECT qid, nid, cos,
      |         row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid ASC) AS rank
      |  FROM scored)
      |SELECT qid, CAST(rank AS INT) AS rank, nid, ROUND(cos, 6) AS cosine
      |FROM ranked WHERE rank <= 3 ORDER BY qid, rank""".stripMargin

  // --------------------------------------------------------------------
  // Per-dimension embedding moments — the whitening/outlier-dim audit a
  // training pipeline runs before normalizing or PCA-ing an embedding
  // column: n, Σx, min, max and the exact integer variance per
  // dimension (dead dims have var 0; a dim whose |min|/|max| dwarfs the
  // rest dominates unnormalized cosine). All integer-exact in quantized
  // 10⁻⁴ units: var_q8 = (n·Σx² − (Σx)²) DIV n² — the numerator is
  // provably ≥ 0, so Spark's truncating DIV and DuckDB's flooring //
  // agree (the negative-operand divergence never arises), and every
  // product runs in DECIMAL(38,0) ↔ HUGEINT (Σx² leaves int64 near
  // 10¹⁰ rows·dim at |x| ≤ 3·10⁴ — the q93 widening pattern).
  //
  // Scale shape: ONE narrow scan; posexplode fans rows·dims map-side
  // and the hash aggregate collapses to |dims| rows per partition
  // BEFORE the only shuffle — output is |dims| rows regardless of N.
  // --------------------------------------------------------------------
  def dimProfile(embeddings: DataFrame): DataFrame =
    quantized(embeddings)
      .select(posexplode(col("qv")).as(Seq("pos", "x")))
      .groupBy(col("pos"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sum_q"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * x")).as("ssq"),
        min(col("x")).as("min_q"), max(col("x")).as("max_q"))
      .select(col("pos"), col("n"), col("sum_q"), col("min_q"), col("max_q"),
        expr("""CAST((CAST(n AS DECIMAL(38,0)) * ssq
          | - CAST(sum_q AS DECIMAL(38,0)) * sum_q)
          | DIV (CAST(n AS DECIMAL(38,0)) * n) AS BIGINT)""".stripMargin)
          .as("var_q8"))
      .orderBy(col("pos"))

  val dimProfileOracle: String =
    s"""WITH $oracleQuantized,
      |e AS (
      |  SELECT CAST(t.i AS INT) AS pos, qv[t.i + 1] AS x
      |  FROM qn, unnest(range(0, len(qv))) AS t(i)),
      |a AS (
      |  SELECT pos, CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(x) AS BIGINT) AS sum_q,
      |         SUM(x*x) AS ssq, CAST(MIN(x) AS BIGINT) AS min_q,
      |         CAST(MAX(x) AS BIGINT) AS max_q
      |  FROM e GROUP BY pos)
      |SELECT pos, n, sum_q, min_q, max_q,
      |       CAST((n * ssq - sum_q * sum_q) // (n * n) AS BIGINT) AS var_q8
      |FROM a ORDER BY pos""".stripMargin

  // --------------------------------------------------------------------
  // Hard-negative mining for contrastive training: for each query
  // vector, the single most-similar vector with a DIFFERENT label —
  // the "closest wrong answer" a triplet/InfoNCE loss wants as its
  // negative. Candidates come from the SAME multi-probe hyperplane
  // buckets as q30 (sub-quadratic; a hard negative is by definition
  // near the query, exactly what LSH buckets preserve), then the
  // cross-label filter and an exact-cosine rank-1 pick. Deterministic
  // end-to-end — md5 hyperplanes, integer dots — so the DuckDB oracle
  // reproduces the same buckets, candidates and winner bit-for-bit.
  //
  // Scale shape: identical to [[annLshScored]] — one bucket-keyed
  // exchange reused by both join sides, candidate volume bounded by
  // the probe-radius fraction of the corpus, rank-1 per query via
  // bounded window. A query whose probed buckets hold no cross-label
  // vector yields no row (raise planes/probeRadius to widen).
  // --------------------------------------------------------------------
  def hardNegatives(embeddings: DataFrame, nQueries: Int = 20,
                    planes: Int = 4, probeRadius: Int = 1): DataFrame = {
    graft.functions.GraftFunctions.register(embeddings.sparkSession)
    val bucketed = quantized(embeddings, keepLabel = true)
      .withColumn("bucket", bucketUdf(planes)(col("qv")))
      // exchange barrier shared by the query and candidate branches
      .repartition(col("bucket"))
    val masks = (0 until (1 << planes)).filter(m =>
      Integer.bitCount(m) <= probeRadius)
    val probeList = masks.map {
      case 0 => "bucket"
      case m => s"bucket ^ $m"
    }.mkString(", ")
    val queries = bucketed.filter(col("vec_id") < nQueries)
      .withColumn("probe", explode(expr(s"array($probeList)")))
    queries.as("x").join(bucketed.as("y"),
        col("x.probe") === col("y.bucket") &&
          col("x.vec_id") =!= col("y.vec_id") &&
          col("x.label") =!= col("y.label"))
      .select(col("x.vec_id").as("qid"), col("x.label").as("qlabel"),
        col("y.vec_id").as("nid"), col("y.label").as("nlabel"),
        expr(cosExpr).as("cos"))
      .withColumn("rank", expr(
        "row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid ASC)"))
      .filter(col("rank") === 1)
      .select(col("qid"), col("qlabel"), col("nid").as("neg_id"),
        col("nlabel").as("neg_label"), round(col("cos"), 6).as("cosine"))
      .orderBy(col("qid"))
  }

  val hardNegativesOracle: String =
    s"""WITH $oracleQuantized,
      |lab AS (SELECT vec_id, CAST(label AS INT) AS label FROM embeddings),
      |bucketed AS (
      |  SELECT qn.vec_id, qv, n2, lab.label,
      |         CAST(list_sum(list_transform(range(0, 4), p ->
      |           CASE WHEN list_sum(list_transform(range(1, len(qv)+1), d ->
      |                  (CAST(concat('0x', substr(md5(concat(CAST(p AS VARCHAR), ':', CAST(d-1 AS VARCHAR))), 1, 8)) AS BIGINT)
      |                   - 2147483648) * qv[d])) > 0
      |                THEN 1 << p ELSE 0 END)) AS INT) AS bucket
      |  FROM qn JOIN lab ON lab.vec_id = qn.vec_id),
      |probes AS (
      |  SELECT vec_id, qv, n2, label,
      |         unnest([bucket, xor(bucket, 1), xor(bucket, 2), xor(bucket, 4), xor(bucket, 8)]) AS probe
      |  FROM bucketed WHERE vec_id < 20),
      |scored AS (
      |  SELECT x.vec_id AS qid, x.label AS qlabel,
      |         y.vec_id AS nid, y.label AS nlabel,
      |         $oracleCosExpr AS cos
      |  FROM probes x JOIN bucketed y
      |    ON x.probe = y.bucket AND x.vec_id <> y.vec_id
      |       AND x.label <> y.label),
      |ranked AS (
      |  SELECT qid, qlabel, nid, nlabel, cos,
      |         row_number() OVER (PARTITION BY qid
      |                            ORDER BY cos DESC, nid ASC) AS rank
      |  FROM scored)
      |SELECT qid, qlabel, nid AS neg_id, nlabel AS neg_label,
      |       ROUND(cos, 6) AS cosine
      |FROM ranked WHERE rank = 1 ORDER BY qid""".stripMargin

  // --------------------------------------------------------------------
  // SemDeDup-style cluster representative selection (Abbas et al. 2023:
  // prune semantic duplicates by keeping one exemplar per embedding
  // cluster): for every [[semanticClusters]] component, keep the member
  // whose embedding points most along the cluster centroid — argmax of
  // dot(x, Σ members). The centroid is the INTEGER sum of quantized
  // member vectors, never divided by n (same argmax, zero float error);
  // products stay in int64 to ~10⁹ members/cluster (|x_i| ≤ 10⁴,
  // |Σy_i| ≤ n·10⁴, d = 64).
  //
  // Scale shape: the member↔vector join is vec_id-keyed; centroid
  // components and member dots come from ONE (lbl, v, pos, x) explode —
  // a (lbl, pos)-windowed sum carries S(lbl, pos) on each row and the
  // per-member dot collapses through a partial-aggregating (lbl, v)
  // rollup, so the join/quantization subtree evaluates once and no
  // centroid-array table is built or joined back; the per-cluster
  // argmax is a rank-1 window (bounded-heap TopKPerKey when installed).
  // The oracle uses the same identity from the pair side
  // (Σy dot(x, y) ≡ dot(x, Σy)) — same integers, quadratic only at
  // oracle scale.
  // --------------------------------------------------------------------
  /** @param maxClusterSize loud in-plan ceiling on component size. Two
    *   real failure modes live past it: centroid dot products leave
    *   int64 exactness near 10⁹ members (the default), and — the
    *   percolation hazard — a too-low threshold on a dense embedding
    *   space collapses the graph into few giant components whose
    *   per-cluster argmax concentrates on single keys. Both now raise
    *   with remediation instead of silently degrading; tighten the
    *   bound to taste for skew protection. */
  def clusterReps(embeddings: DataFrame, threshold: Double = 0.5,
                  maxIters: Int = 25,
                  maxClusterSize: Long = 1000000000L): DataFrame = {
    graft.functions.GraftFunctions.register(embeddings.sparkSession)
    val q = quantized(embeddings)
    // the pair list AND the Pregel loop ride the session-memoized
    // [[semanticLabels]] stage — a session that already clustered
    // (q78) scores exemplars off the cached labels for free
    val members = semanticLabels(embeddings, threshold, maxIters)
      .select(col("lbl"), col("v"))
    val mq = members.join(q, col("v") === col("vec_id"))
      .select(col("lbl"), col("v"), col("qv"))
    // single-pass scoring via dot(x, Σy) = Σ_pos x_pos · S(lbl, pos):
    // ONE posexplode feeds a (lbl, pos)-partitioned window sum (the
    // centroid component rides each row) and the per-member dot is a
    // plain partial-aggregating rollup — mq is consumed ONCE, so the
    // members⋈vectors join and the quantization never evaluate per
    // branch, and the explicit centroid-array build + join-back
    // disappears from the plan. Same exact integers as the two-branch
    // centroid form (products stay in int64 to ~10⁹ members/cluster,
    // |x_i| ≤ 10⁴, d = 64 — the same bound the size guard enforces).
    mq.select(col("lbl"), col("v"), posexplode(col("qv")).as(Seq("pos", "x")))
      .withColumn("sx", sum(col("x")).over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("lbl"), col("pos"))))
      .groupBy(col("lbl"), col("v"))
      .agg(sum(expr("x * sx")).as("dot"))
      .withColumn("n_vecs", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("lbl"))))
      .withColumn("rnk", expr(
        "row_number() OVER (PARTITION BY lbl ORDER BY dot DESC, v ASC)"))
      .filter(col("rnk") === 1)
      // guard AFTER the rank-1 filter: one row per component carries
      // n_vecs, so the oversize check costs |clusters| comparisons and
      // still fires for every percolated component
      .select(col("lbl").as("component"),
        expr(s"""CASE WHEN n_vecs > ${maxClusterSize}L
          |  THEN CAST(raise_error(concat('clusterReps: component ', lbl,
          |    ' has ', n_vecs, ' members > maxClusterSize $maxClusterSize',
          |    ' — embedding space percolated at this threshold (or past',
          |    ' int64 centroid exactness); raise the threshold or the',
          |    ' bound')) AS BIGINT)
          |  ELSE n_vecs END""".stripMargin).as("n_vecs"),
        col("v").as("rep_vec"), col("dot").as("rep_dot"))
      .orderBy(col("component"))
  }

  val clusterRepsOracle: String = clusterRepsOracleAt(0.5)

  /** Oracle builder on the SAME cosine threshold as the engine function.
    * Scores via Σy dot(x, y) ≡ dot(x, Σy) — exact in integers. */
  def clusterRepsOracleAt(threshold: Double): String =
    s"""WITH RECURSIVE $oracleQuantized,
      |mp AS MATERIALIZED (
      |  SELECT x.vec_id AS a, y.vec_id AS b
      |  FROM qn x JOIN qn y ON x.vec_id < y.vec_id
      |  WHERE $oracleCosExpr >= $threshold),
      |edges AS MATERIALIZED (
      |  SELECT a, b FROM mp UNION ALL SELECT b AS a, a AS b FROM mp),
      |reach(v, w) AS (
      |  SELECT DISTINCT a AS v, a AS w FROM edges
      |  UNION
      |  SELECT r.v, e.b AS w FROM reach r JOIN edges e ON e.a = r.w),
      |comp AS MATERIALIZED (
      |  SELECT v, MIN(w) AS component FROM reach GROUP BY v),
      |scored AS (
      |  SELECT cx.component, cx.v,
      |         CAST(SUM(list_sum(list_transform(range(1, len(x.qv)+1),
      |           i -> x.qv[i] * y.qv[i]))) AS BIGINT) AS dot
      |  FROM comp cx JOIN qn x ON x.vec_id = cx.v
      |       JOIN comp cy ON cy.component = cx.component
      |       JOIN qn y ON y.vec_id = cy.v
      |  GROUP BY 1, 2),
      |ranked AS (
      |  SELECT component, v, dot,
      |         COUNT(*) OVER (PARTITION BY component) AS n_vecs,
      |         row_number() OVER (PARTITION BY component
      |                            ORDER BY dot DESC, v ASC) AS rnk
      |  FROM scored)
      |SELECT component, CAST(n_vecs AS BIGINT) AS n_vecs,
      |       v AS rep_vec, dot AS rep_dot
      |FROM ranked WHERE rnk = 1 ORDER BY component""".stripMargin

  // --------------------------------------------------------------------
  // Similarity-graph DEGREE PROFILE: the histogram of per-vector
  // near-duplicate degree (how many other vectors each one clears the
  // cosine threshold with, isolated vectors included as degree 0). The
  // pre-clustering diagnostic a dedup pass reads: a heavy tail means
  // template/boilerplate hubs that will percolate [[semanticClusters]]
  // into giant components (the q88 guard's failure mode) — cheaper to
  // detect here, before the CC loop runs.
  //
  // Scale shape: pairs come from the exact blocked self-join
  // ([[cosineNearDup]]'s tiled plan — quadratic-by-contract; swap in
  // the LSH candidate source past that). Degree partial-aggregates
  // behind vec_id (each vertex's pair list collapses map-side); the
  // histogram partial-aggregates behind the degree value — output is
  // bounded by max-degree+1 rows, and neither exchange carries more
  // than |V| rows. The isolated-vertex join is |V| × (≤|V|) on the
  // vec_id key.
  // --------------------------------------------------------------------
  def nearDupDegreeProfile(embeddings: DataFrame,
                           threshold: Double = 0.5): DataFrame = {
    val pairs = nearDupPairs(embeddings, threshold)
    val deg = pairs.select(col("a").as("v"))
      .unionAll(pairs.select(col("b").as("v")))
      .groupBy(col("v")).agg(count(lit(1)).as("deg"))
    quantized(embeddings).select(col("vec_id").as("v"))
      .join(deg, Seq("v"), "left")
      .select(coalesce(col("deg"), lit(0L)).as("degree"))
      .groupBy(col("degree")).agg(count(lit(1)).as("n_vecs"))
      .orderBy(col("degree"))
  }

  val nearDupDegreeProfileOracle: String = nearDupDegreeProfileOracleAt(0.5)

  /** Oracle builder on the SAME cosine threshold as the engine function. */
  def nearDupDegreeProfileOracleAt(threshold: Double): String =
    s"""WITH $oracleQuantized,
      |pairs AS (
      |  SELECT x.vec_id AS a, y.vec_id AS b
      |  FROM qn x JOIN qn y ON x.vec_id < y.vec_id
      |  WHERE $oracleCosExpr >= $threshold),
      |deg AS (
      |  SELECT v, CAST(count(*) AS BIGINT) AS deg
      |  FROM (SELECT a AS v FROM pairs UNION ALL SELECT b AS v FROM pairs)
      |  GROUP BY 1)
      |SELECT COALESCE(deg.deg, 0) AS degree,
      |       CAST(count(*) AS BIGINT) AS n_vecs
      |FROM qn LEFT JOIN deg ON qn.vec_id = deg.v
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // --------------------------------------------------------------------
  // One Lloyd refinement step over the IVF seed centroids — the
  // building block of the coarse-quantizer training loop every IVF/PQ
  // vector index runs before it can index 100 TB of embeddings. Seeds
  // are the C cheapest-md5 vectors (q54's deterministic selection);
  // each vector goes to its argmin-distance seed (same encoded integer
  // score n2_c − 2·v·c, ties → lower index), and the step reports per
  // cluster: size, exact inertia Σ‖v−c‖² = Σ(n2_v + score), and the
  // scaled centroid movement ‖Σv − n·c‖² = n²·‖mean − c‖² — kept in
  // SUM form so no division ever happens (Spark's truncating DIV and
  // DuckDB's flooring // would diverge on the negative coordinate
  // sums a mean would need). Products run in DECIMAL(38,0) ↔ HUGEINT
  // (the q93/q100 widening pattern) and land in int64-safe outputs.
  //
  // Scale shape: the seed table is a C×dims driver-side summary (same
  // legitimate broadcast build as q54's centroids); assignment is one
  // codegen-adjacent map over the corpus; the size/inertia rollup
  // partial-aggregates to ≤C rows and the movement term fans rows·dims
  // map-side and collapses to ≤C·dims rows before its one exchange
  // (q100's posexplode shape). Nothing driver-side ever sees a row.
  // --------------------------------------------------------------------
  def kmeansStep(embeddings: DataFrame, centroids: Int = 8): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val q = quantized(embeddings)
    val cents: Array[(Array[Long], Long)] = q
      .withColumn("h", expr(
        "CAST(conv(substr(md5(CAST(vec_id AS STRING)), 1, 8), 16, 10) AS BIGINT)"))
      .orderBy(col("h"), col("vec_id")).limit(centroids)
      .select(col("qv"), col("n2")).as[(Array[Long], Long)].collect()
    val bc = spark.sparkContext.broadcast(cents)
    // (cluster, score) with score = n2_c − 2·v·c: the ‖v‖²-offset
    // squared distance, so inertia per member is just n2 + score
    val assignUdf = udf { qv: Seq[Long] =>
      val cs = bc.value
      var best = 0
      var bestScore = Long.MaxValue
      var i = 0
      while (i < cs.length) {
        val (cqv, cn2) = cs(i)
        var dot = 0L
        var d = 0
        while (d < cqv.length) { dot += qv(d) * cqv(d); d += 1 }
        val s = cn2 - 2L * dot
        if (s < bestScore) { bestScore = s; best = i }
        i += 1
      }
      (best, bestScore)
    }
    val assigned = q
      .withColumn("asg", assignUdf(col("qv")))
      .select(col("vec_id"), col("qv"), col("n2"),
        col("asg._1").as("cluster"), col("asg._2").as("score"))
    val sizes = assigned.groupBy(col("cluster"))
      .agg(count(lit(1)).as("n_vecs"),
        sum(expr("CAST(n2 AS DECIMAL(38,0)) + score")).as("inertia_d"))
    val dimSums = assigned
      .select(col("cluster"), posexplode(col("qv")).as(Seq("d", "x")))
      .groupBy(col("cluster"), col("d"))
      .agg(sum(col("x")).as("s_d"))
    val seedDims = cents.zipWithIndex.flatMap { case ((cqv, _), i) =>
      cqv.zipWithIndex.map { case (c_d, d) => (i, d, c_d) }
    }.toSeq.toDF("cluster", "d", "c_d")
    val shift = dimSums.join(broadcast(seedDims), Seq("cluster", "d"))
      .join(broadcast(sizes.select(col("cluster"), col("n_vecs"))),
        Seq("cluster"))
      .groupBy(col("cluster"))
      .agg(sum(expr(
        """(CAST(s_d AS DECIMAL(38,0)) - CAST(n_vecs AS DECIMAL(38,0)) * c_d)
          | * (CAST(s_d AS DECIMAL(38,0)) - CAST(n_vecs AS DECIMAL(38,0)) * c_d)"""
          .stripMargin)).as("shift2_d"))
    sizes.join(shift, Seq("cluster"))
      .select(col("cluster"), col("n_vecs"),
        col("inertia_d").cast("long").as("inertia"),
        col("shift2_d").cast("long").as("shift2"))
      .orderBy(col("cluster"))
  }

  val kmeansStepOracle: String = kmeansStepOracleAt(8)

  /** Oracle builder on the SAME seed count as the engine function. */
  def kmeansStepOracleAt(centroids: Int): String =
    s"""WITH $oracleQuantized,
      |hs AS (
      |  SELECT vec_id, qv, n2,
      |         CAST(concat('0x', substr(md5(CAST(vec_id AS VARCHAR)), 1, 8)) AS BIGINT) AS h
      |  FROM qn),
      |seeds AS (
      |  SELECT qv AS cqv, n2 AS cn2,
      |         CAST(row_number() OVER (ORDER BY h, vec_id) - 1 AS INT) AS cidx
      |  FROM hs ORDER BY h, vec_id LIMIT $centroids),
      |scored AS (
      |  SELECT v.vec_id, v.qv, v.n2, s.cidx,
      |         s.cn2 - 2 * CAST(list_sum(list_transform(range(1, len(v.qv)+1),
      |           i -> v.qv[i] * s.cqv[i])) AS BIGINT) AS score
      |  FROM qn v CROSS JOIN seeds s),
      |a AS (
      |  SELECT vec_id, qv, n2, cidx, score,
      |         row_number() OVER (PARTITION BY vec_id ORDER BY score, cidx) AS rk
      |  FROM scored QUALIFY rk = 1),
      |sizes AS (
      |  SELECT cidx, CAST(count(*) AS BIGINT) AS n_vecs,
      |         SUM(CAST(n2 AS HUGEINT) + score) AS inertia
      |  FROM a GROUP BY 1),
      |dimsums AS (
      |  SELECT cidx, t.i AS d, CAST(SUM(qv[t.i]) AS HUGEINT) AS s_d
      |  FROM a, unnest(range(1, len(qv)+1)) AS t(i) GROUP BY 1, 2),
      |shift AS (
      |  SELECT ds.cidx,
      |         SUM((ds.s_d - CAST(z.n_vecs AS HUGEINT) * s.cqv[ds.d])
      |           * (ds.s_d - CAST(z.n_vecs AS HUGEINT) * s.cqv[ds.d])) AS shift2
      |  FROM dimsums ds
      |  JOIN seeds s ON s.cidx = ds.cidx
      |  JOIN sizes z ON z.cidx = ds.cidx
      |  GROUP BY 1)
      |SELECT z.cidx AS cluster, z.n_vecs,
      |       CAST(z.inertia AS BIGINT) AS inertia,
      |       CAST(sh.shift2 AS BIGINT) AS shift2
      |FROM sizes z JOIN shift sh ON sh.cidx = z.cidx
      |ORDER BY cluster""".stripMargin

  // --------------------------------------------------------------------
  // PageRank hub scores over the near-duplicate similarity graph — the
  // link-analysis tier of template/boilerplate detection: a vector that
  // accumulates rank from many high-degree neighbors is the center of a
  // templated region even when no single pairwise cosine flags it. The
  // recursion is a FIXED 3-iteration power step in integer micro-units
  // (r₀ = 10⁶; r ← 15·10⁴ + 85·Σ(r_u DIV deg_u) DIV 100) over the
  // non-isolated vertices of the exact threshold graph — every operand
  // is a nonnegative integer, so Spark's truncating DIV and DuckDB's
  // flooring // agree and both engines walk bit-identical ranks.
  //
  // Scale shape: the edge list is built once, persisted, and reused by
  // all three rounds and the degree table; the ROUND LOOP runs on
  // co-partitioned RDDs, not DataFrames — the same legitimate RDD use
  // as [[Dedup.connectedComponents]]'s Pregel loop and for the same
  // measured reason (per-round Catalyst planning + fresh codegen cost
  // ~3 s/round on a graph of a few thousand edges, and each unrolled
  // round replants the previous rounds' join subtrees — physical plans
  // are trees). Each round is one narrow co-partitioned join plus one
  // reduced (dst-keyed) message shuffle, the canonical Pregel shape.
  // The LSH pair source swaps in past exact-pair scale, as everywhere
  // in this tier.
  // --------------------------------------------------------------------
  def pageRankHubs(embeddings: DataFrame, threshold: Double = 0.45,
                   iters: Int = 3, k: Int = 15): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val pairs = nearDupPairs(embeddings, threshold)
      .as[(Long, Long)].rdd
    val part = new org.apache.spark.HashPartitioner(
      spark.sparkContext.defaultParallelism)
    // (src, (dst, deg)): the per-round join probe, built once — degree
    // folds into the edge partitions so rounds never re-join it
    val edges = pairs.flatMap { case (a, b) => Seq((a, b), (b, a)) }
      .partitionBy(part).cache()
    val deg = edges.mapValues(_ => 1L).reduceByKey(part, _ + _)
    val edgesWithDeg = edges.join(deg)
      .partitionBy(part).cache()
    edgesWithDeg.count()
    edges.unpersist(false)
    // init from the CACHED probe table (deg's lineage roots in the
    // now-unpersisted edges — evaluating it lazily inside round 1
    // would replay the quadratic pair join); co-partitioned
    // reduceByKey, so the vertex dedup is narrow
    var ranks = edgesWithDeg.mapValues(_ => 1000000L)
      .reduceByKey(part, (a, _) => a)
    for (_ <- 1 to iters) {
      // all operands nonnegative: Long `/` truncation ≡ floor ≡ the
      // oracle's `//` — the cross-engine contract of the DF version
      ranks = edgesWithDeg.join(ranks)
        .map { case (_, ((dst, dg), r)) => (dst, r / dg) }
        .reduceByKey(part, _ + _)
        .mapValues(s => 150000L + 85L * s / 100L)
    }
    val out = ranks.toDF("v", "r")
      .orderBy(col("r").desc, col("v").asc).limit(k)
      .select(col("v").as("vec_id"), col("r").as("rank_micro"))
    // materialize before freeing the loop's cached edge RDD
    val res = out.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    res.count()
    edgesWithDeg.unpersist(false)
    res
  }

  val pageRankHubsOracle: String = pageRankHubsOracleAt(0.45, 15)

  /** Oracle builder on the SAME threshold/k; iterations fixed at 3 —
    * the unrolled CTE chain below IS the iteration count. */
  def pageRankHubsOracleAt(threshold: Double, k: Int): String =
    s"""WITH $oracleQuantized,
      |mp AS (
      |  SELECT x.vec_id AS a, y.vec_id AS b
      |  FROM qn x JOIN qn y ON x.vec_id < y.vec_id
      |  WHERE $oracleCosExpr >= $threshold),
      |edges AS (
      |  SELECT a AS src, b AS dst FROM mp
      |  UNION ALL SELECT b AS src, a AS dst FROM mp),
      |deg AS (SELECT src, CAST(count(*) AS BIGINT) AS deg FROM edges GROUP BY 1),
      |r0 AS (SELECT src AS v, CAST(1000000 AS BIGINT) AS r FROM deg),
      |r1 AS (
      |  SELECT e.dst AS v, 150000 + 85 * SUM(r.r // d.deg) // 100 AS r
      |  FROM edges e JOIN deg d ON d.src = e.src JOIN r0 r ON r.v = e.src
      |  GROUP BY 1),
      |r2 AS (
      |  SELECT e.dst AS v, 150000 + 85 * SUM(r.r // d.deg) // 100 AS r
      |  FROM edges e JOIN deg d ON d.src = e.src JOIN r1 r ON r.v = e.src
      |  GROUP BY 1),
      |r3 AS (
      |  SELECT e.dst AS v, 150000 + 85 * SUM(r.r // d.deg) // 100 AS r
      |  FROM edges e JOIN deg d ON d.src = e.src JOIN r2 r ON r.v = e.src
      |  GROUP BY 1)
      |SELECT v AS vec_id, CAST(r AS BIGINT) AS rank_micro
      |FROM r3 ORDER BY r DESC, v ASC LIMIT $k""".stripMargin

  // --------------------------------------------------------------------
  // ANN recall audit: per query, how many of the EXACT top-k neighbors
  // (q29 brute force) the LSH index (q30) actually returned — the
  // recall dashboard a deployment reads before trusting an approximate
  // index over 100 TB of embeddings (AnnRecallSpec pins the aggregate
  // floor; THIS emits the per-query surface as data, oracle-checked,
  // because both sides are fully deterministic: md5 hyperplanes +
  // integer dots mean recall itself is reproducible cross-engine).
  //
  // Scale shape: composes the existing plans — the quadratic truth
  // side is the audit's cost by definition (run on a sampled query
  // set, as here with nQueries); the join/rollup is ≤nQueries·k rows.
  // --------------------------------------------------------------------
  def annRecallAudit(embeddings: DataFrame, k: Int = 3, nQueries: Int = 10,
                     planes: Int = 4, probeRadius: Int = 1): DataFrame = {
    val truth = annBruteTopK(embeddings, k, nQueries)
      .select(col("qid"), col("nid"))
    val approx = annLshTopK(embeddings, k, nQueries, planes, probeRadius)
      .select(col("qid").as("aqid"), col("nid").as("anid"))
    truth.join(approx,
        col("qid") === col("aqid") && col("nid") === col("anid"), "left")
      .groupBy(col("qid"))
      .agg(count(lit(1)).as("n_true"), count(col("anid")).as("n_hit"))
      .select(col("qid"), col("n_true"), col("n_hit"),
        expr("1000L * n_hit DIV n_true").as("recall_pm"))
      .orderBy(col("qid"))
  }

  /** The q29 (k=3 truth) ∩ q30 (defaults) audit — parameters locked to
    * the two audited queries' own defaults. */
  val annRecallAuditOracle: String =
    s"""WITH $oracleQuantized,
      |bscored AS (
      |  SELECT x.vec_id AS qid, y.vec_id AS nid,
      |         $oracleCosExpr AS cos
      |  FROM qn x JOIN qn y ON x.vec_id <> y.vec_id
      |  WHERE x.vec_id < 10),
      |truth AS (
      |  SELECT qid, nid FROM (
      |    SELECT qid, nid,
      |           row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid ASC) AS rank
      |    FROM bscored) WHERE rank <= 3),
      |bucketed AS (
      |  SELECT vec_id, qv, n2,
      |         CAST(list_sum(list_transform(range(0, 4), p ->
      |           CASE WHEN list_sum(list_transform(range(1, len(qv)+1), d ->
      |                  (CAST(concat('0x', substr(md5(concat(CAST(p AS VARCHAR), ':', CAST(d-1 AS VARCHAR))), 1, 8)) AS BIGINT)
      |                   - 2147483648) * qv[d])) > 0
      |                THEN 1 << p ELSE 0 END)) AS INT) AS bucket
      |  FROM qn),
      |probes AS (
      |  SELECT vec_id, qv, n2,
      |         unnest([bucket, xor(bucket, 1), xor(bucket, 2), xor(bucket, 4), xor(bucket, 8)]) AS probe
      |  FROM bucketed WHERE vec_id < 10),
      |lscored AS (
      |  SELECT x.vec_id AS qid, y.vec_id AS nid,
      |         $oracleCosExpr AS cos
      |  FROM probes x JOIN bucketed y
      |    ON x.probe = y.bucket AND x.vec_id <> y.vec_id),
      |approx AS (
      |  SELECT qid, nid FROM (
      |    SELECT qid, nid,
      |           row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid ASC) AS rank
      |    FROM lscored) WHERE rank <= 3)
      |SELECT t.qid, CAST(count(*) AS BIGINT) AS n_true,
      |       CAST(count(a.nid) AS BIGINT) AS n_hit,
      |       CAST(1000 * count(a.nid) // count(*) AS BIGINT) AS recall_pm
      |FROM truth t LEFT JOIN approx a ON a.qid = t.qid AND a.nid = t.nid
      |GROUP BY t.qid ORDER BY t.qid""".stripMargin

  // --------------------------------------------------------------------
  // Triangle census of the near-dup graph — the structural complement
  // of q109's degrees and q116's rank: triangle participation
  // separates CLIQUEY template regions (mutually-similar rewrites of
  // one template — many triangles) from STAR hubs (one common snippet
  // pulling unrelated docs together — high degree, no triangles), and
  // the two demand different dedup policies (collapse the clique vs
  // split the star). Classic MapReduce triangle enumeration: each
  // ordered wedge a<b<c closes against the (a, c) edge exactly once,
  // so every triangle is found once without orientation bookkeeping.
  //
  // Scale shape: the verified pair list is built once (memoized,
  // persisted) and self-joined twice ON THE CACHED output — a lazy
  // re-plan would re-run the quadratic pair source per branch (the
  // measured CollapseProject trap). Wedge volume is Σ_b lower(b)·
  // higher(b) — CUBIC-BY-CONTRACT on a dense graph: a percolated
  // region of n mutually-similar vectors intrinsically holds ~n³/6
  // triangles, and no enumeration can undercut its own output (the
  // 30× sweep measured exactly this: the denser synthetic space
  // percolates at 0.4 and the wedge stage carries ~10¹⁰ rows,
  // BENCH_NOTES round 9). The maxWedges tripwire makes the contract
  // executable — the exact wedge volume costs two |V|-row rollups off
  // the cached pairs BEFORE the cubic join materializes, and past the
  // bound the query raises with remediation instead of melting the
  // cluster. The LSH pair source + a raised threshold are the
  // documented scale path; q109's degree profile is the cheap
  // pre-flight. The per-vertex rollup and the ≤max-triangles
  // histogram both collapse map-side.
  // --------------------------------------------------------------------
  def triangleCensus(embeddings: DataFrame, threshold: Double = 0.4,
                     maxWedges: Long = 100000000000L): DataFrame = {
    val pairs = nearDupPairs(embeddings, threshold)
    val lowerDeg = pairs.groupBy(col("b")).agg(count(lit(1)).as("nlo"))
    val higherDeg = pairs.groupBy(col("a").as("b"))
      .agg(count(lit(1)).as("nhi"))
    val wedgeVol = broadcast(lowerDeg.join(higherDeg, "b")
      .agg(coalesce(sum(col("nlo") * col("nhi")), lit(0L)).as("wedge_vol")))
    val gated = pairs.crossJoin(wedgeVol)
      .select(col("a"),
        expr(s"""CASE WHEN wedge_vol > ${maxWedges}L
          |  THEN CAST(raise_error(concat('triangleCensus: ', wedge_vol,
          |    ' wedges > maxWedges $maxWedges — the graph is dense/',
          |    'percolated at this threshold and triangle enumeration is',
          |    ' cubic there; raise the threshold, swap in the LSH pair',
          |    ' source, or raise the bound')) AS BIGINT)
          |  ELSE b END""".stripMargin).as("b"))
    val wedges = gated.join(
      pairs.select(col("a").as("b"), col("b").as("c")), "b")
    val tris = wedges.join(
        pairs.select(col("a").as("ta"), col("b").as("tc")),
        col("a") === col("ta") && col("c") === col("tc"))
      .select(col("a"), col("b"), col("c"))
    val perVertex = tris
      .select(explode(array(col("a"), col("b"), col("c"))).as("v"))
      .groupBy(col("v")).agg(count(lit(1)).as("t"))
    pairs.select(col("a").as("v")).unionAll(pairs.select(col("b").as("v")))
      .distinct()
      .join(perVertex, Seq("v"), "left")
      .select(coalesce(col("t"), lit(0L)).as("triangles"))
      .groupBy(col("triangles")).agg(count(lit(1)).as("n_vecs"))
      .orderBy(col("triangles"))
  }

  /** q146 — the triangle census's SCALE path: a deterministic
    * Doulion-style (Tsourakakis et al., KDD'09) edge-sampled estimate.
    * q123 is cubic-by-contract: a percolated region of n
    * mutually-similar vectors intrinsically holds ~n³/6 triangles and
    * the exact census cannot undercut its own output (the single 30×
    * flag, 49.3× time on 687.7× io). Sampling each EDGE with
    * probability p = 1/sampleMod shrinks the wedge volume by ~p² and
    * the enumerated triangles by ~p³ — the estimator T̂ = T_sampled ·
    * sampleMod³ is unbiased, and because the sample is a DETERMINISTIC
    * md5 keep-test on the edge key (not an RNG), the ESTIMATE itself
    * is exact integer arithmetic the oracle recomputes bit-for-bit.
    * A deployment tunes sampleMod to the graph's density (the wedge
    * tripwire — same contract as q123, on the SAMPLED graph — names
    * the knob when it fires); the threshold default (0.3, vs q123's
    * 0.4) exercises the denser regime sampling exists for.
    *
    * Output (one row, all BIGINT): n_edges (verified near-dup pairs),
    * kept_edges (md5-sampled), tri_sampled (triangles enumerated on
    * the sampled graph), tri_est = tri_sampled · sampleMod³. */
  def triangleSample(embeddings: DataFrame, threshold: Double = 0.3,
                     sampleMod: Int = 2,
                     maxWedges: Long = 100000000000L): DataFrame = {
    require(sampleMod >= 1, s"sampleMod must be >= 1, got $sampleMod")
    val pairs = nearDupPairs(embeddings, threshold)
    val keep =
      expr(s"CAST(conv(substr(md5(concat(CAST(a AS STRING), '_', " +
        s"CAST(b AS STRING))), 1, 8), 16, 10) AS BIGINT) % $sampleMod = 0")
    val kept = pairs.filter(keep)
    val lowerDeg = kept.groupBy(col("b")).agg(count(lit(1)).as("nlo"))
    val higherDeg = kept.groupBy(col("a").as("b"))
      .agg(count(lit(1)).as("nhi"))
    val wedgeVol = broadcast(lowerDeg.join(higherDeg, "b")
      .agg(coalesce(sum(col("nlo") * col("nhi")), lit(0L)).as("wedge_vol")))
    val gated = kept.crossJoin(wedgeVol)
      .select(col("a"),
        expr(s"""CASE WHEN wedge_vol > ${maxWedges}L
          |  THEN CAST(raise_error(concat('triangleSample: ', wedge_vol,
          |    ' wedges > maxWedges $maxWedges on the SAMPLED graph —',
          |    ' raise sampleMod (estimate stays exact) or the bound'))
          |    AS BIGINT)
          |  ELSE b END""".stripMargin).as("b"))
    val tris = gated
      .join(kept.select(col("a").as("b"), col("b").as("c")), "b")
      .join(kept.select(col("a").as("ta"), col("b").as("tc")),
        col("a") === col("ta") && col("c") === col("tc"))
      .agg(count(lit(1)).as("tri_sampled"))
    pairs
      .agg(count(lit(1)).as("n_edges"),
        coalesce(sum(when(keep, 1L).otherwise(0L)), lit(0L))
          .as("kept_edges"))
      .crossJoin(tris)
      .select(col("n_edges"), col("kept_edges"), col("tri_sampled"),
        (col("tri_sampled") *
          lit(sampleMod.toLong * sampleMod * sampleMod)).as("tri_est"))
  }

  // --------------------------------------------------------------------
  // sampleMod ADVISOR — the compactionCadence pattern applied to the
  // triangle tier (r13 verdict item 5): the wedge tripwire NAMES
  // sampleMod as the knob when it fires; this picks it automatically
  // from the degree profile's wedge-volume forecast. Edge-sampling at
  // p = 1/mod shrinks the wedge volume by ~p² (both wedge edges must
  // survive independent md5 keep-tests), so the smallest mod whose
  // EXPECTED sampled wedge volume fits the budget is the smallest m
  // with wedgeVol / m² ≤ maxWedges ⇔ m² · maxWedges ≥ wedgeVol. The
  // pre-flight costs two |V|-row degree rollups off the memoized pair
  // list (q109's profile) — never the cubic join itself.
  // --------------------------------------------------------------------

  /** The advisor's deployed wedge budget: the cubic wedge-close stage
    * is capped at ~10⁶ rows in EXPECTATION at any corpus scale — the
    * fits-in-one-stage knob, far under the 10¹¹ raise-loud tripwire.
    * At the committed fixtures: sf0.01/sf0.1 land at mod 1 (the exact
    * census, no sampling), the 10× skewed fixture at mod 6, 30× at
    * mod 74 — the estimator's resolution degrades gracefully as the
    * graph percolates while its cost stays flat. */
  val AdvisorMaxWedges: Long = 1000000L

  /** Exact wedge volume Σ_b lower(b)·higher(b) of the verified
    * near-dup graph — the same two degree rollups the census tripwire
    * computes BEFORE its cubic join, off the memoized pair list.
    * One-row collect, bounded by construction. */
  def wedgeVolume(embeddings: DataFrame, threshold: Double): Long = {
    val pairs = nearDupPairs(embeddings, threshold)
    val lowerDeg = pairs.groupBy(col("b")).agg(count(lit(1)).as("nlo"))
    val higherDeg = pairs.groupBy(col("a").as("b"))
      .agg(count(lit(1)).as("nhi"))
    lowerDeg.join(higherDeg, "b")
      .agg(coalesce(sum(col("nlo") * col("nhi")), lit(0L)))
      .head().getLong(0)
  }

  /** Smallest sampleMod m with m² · maxWedges ≥ wedgeVol (expected
    * sampled wedges within budget). Integer-exact across engines: the
    * float64 sqrt candidate is within one of the true answer (sqrt is
    * correctly rounded), and a single BigInt-checked adjustment step
    * lands it — the DuckDB oracle mirrors the identical
    * candidate-plus-adjustment arithmetic, so both engines derive the
    * same mod even when wedgeVol/maxWedges is an exact square. */
  def sampleModFor(wedgeVol: Long, maxWedges: Long): Int = {
    require(maxWedges > 0, s"maxWedges must be positive, got $maxWedges")
    require(wedgeVol >= 0, s"wedgeVol must be non-negative, got $wedgeVol")
    if (wedgeVol <= maxWedges) 1
    else {
      val cand = math.max(1L,
        math.ceil(math.sqrt(wedgeVol.toDouble / maxWedges.toDouble)).toLong)
      def fits(m: Long) =
        BigInt(m) * BigInt(m) * BigInt(maxWedges) >= BigInt(wedgeVol)
      val m =
        if (cand > 1 && fits(cand - 1)) cand - 1
        else if (!fits(cand)) cand + 1
        else cand
      math.min(m, Int.MaxValue.toLong).toInt
    }
  }

  /** One standard deviation of the Doulion estimator T̂ = T_s · mod³
    * under independent edge keep-tests at p = 1/mod:
    * Var(T̂) = mod⁶ [ T p³(1−p³) + 2Δ(p⁵−p⁶) ] = T(mod³−1) + 2Δ(mod−1),
    * where Δ = Σ_e C(t_e, 2) counts triangle pairs sharing an edge
    * (triangles with no shared edge have independent keep-tests, zero
    * covariance). t_e must count triangles through e in EVERY role —
    * common neighbors on the SYMMETRIC adjacency, not the oriented
    * wedge-close matrix, which credits each triangle only to its
    * spanning edge and understates σ ~2.4× on the 30× fixture (model
    * σ 1.62 M vs Monte-Carlo 1.76 M once corrected; the artifact
    * records the cross-check). TriangleAdvisorSpec re-derives the
    * committed 30× census (503,644,355 triangles) from the committed
    * mod-4 estimate within 3σ of this bound. */
  def triangleEstimateSigma(tExact: Long, sharedEdgePairs: Long,
                            sampleMod: Int): Double = {
    require(sampleMod >= 1 && tExact >= 0 && sharedEdgePairs >= 0)
    val m = sampleMod.toDouble
    math.sqrt(tExact * (m * m * m - 1.0) + 2.0 * sharedEdgePairs * (m - 1.0))
  }

  /** q147 — [[triangleSample]] with the advisor in the loop: forecast
    * the wedge volume from the degree profile, pick the smallest
    * sampleMod whose expected sampled wedge volume fits `maxWedges`,
    * and run the deterministic estimate at that mod. The sampled-graph
    * tripwire rides at 4× the budget — the advisor sizes the
    * EXPECTATION, the headroom absorbs sampling variance, and a raise
    * past 4× means the independence model itself broke (remediation
    * unchanged). Output adds the advisor's inputs/decision
    * (wedge_vol, sample_mod) to q146's columns so the gate checks the
    * advisory arithmetic end-to-end, not just the estimate. */
  def triangleSampleAuto(embeddings: DataFrame, threshold: Double = 0.3,
                         maxWedges: Long = AdvisorMaxWedges): DataFrame = {
    val wv = wedgeVolume(embeddings, threshold)
    val m = sampleModFor(wv, maxWedges)
    triangleSample(embeddings, threshold, m,
      math.max(4L * maxWedges, maxWedges))
      .select(lit(wv).as("wedge_vol"), lit(m.toLong).as("sample_mod"),
        col("n_edges"), col("kept_edges"), col("tri_sampled"),
        col("tri_est"))
  }

  val triangleAdvisorOracle: String =
    triangleAdvisorOracleAt(0.3, AdvisorMaxWedges)

  /** Oracle with the ADVISOR inside the SQL: the same wedge-volume
    * rollup, the same sqrt-candidate-plus-integer-adjustment mod
    * derivation, the same md5 keep-test and estimator — so the gate
    * proves the advisory arithmetic cross-engine, mod unpinned. */
  def triangleAdvisorOracleAt(threshold: Double, maxWedges: Long): String =
    s"""WITH $oracleQuantized,
      |mp AS MATERIALIZED (
      |  SELECT x.vec_id AS a, y.vec_id AS b
      |  FROM qn x JOIN qn y ON x.vec_id < y.vec_id
      |  WHERE $oracleCosExpr >= $threshold),
      |wv AS (
      |  SELECT CAST(coalesce(sum(lo.nlo * hi.nhi), 0) AS BIGINT) AS wedge_vol
      |  FROM (SELECT b, count(*) AS nlo FROM mp GROUP BY b) lo
      |  JOIN (SELECT a AS b, count(*) AS nhi FROM mp GROUP BY a) hi USING (b)),
      |md AS (
      |  SELECT wedge_vol,
      |         CASE WHEN wedge_vol <= $maxWedges THEN CAST(1 AS BIGINT)
      |              WHEN cand > 1 AND (cand-1)*(cand-1)*$maxWedges >= wedge_vol
      |                THEN cand - 1
      |              WHEN cand*cand*$maxWedges < wedge_vol THEN cand + 1
      |              ELSE cand END AS m
      |  FROM (SELECT wedge_vol,
      |               GREATEST(CAST(1 AS BIGINT),
      |                 CAST(ceil(sqrt(wedge_vol / (1.0 * $maxWedges))) AS BIGINT)) AS cand
      |        FROM wv)),
      |kept AS MATERIALIZED (
      |  SELECT a, b FROM mp, md
      |  WHERE CAST(concat('0x', substr(md5(CAST(a AS VARCHAR) || '_' ||
      |          CAST(b AS VARCHAR)), 1, 8)) AS BIGINT) % md.m = 0),
      |tri AS (
      |  SELECT x.a, x.b, y.b AS c
      |  FROM kept x JOIN kept y ON y.a = x.b
      |  JOIN kept z ON z.a = x.a AND z.b = y.b)
      |SELECT (SELECT wedge_vol FROM md) AS wedge_vol,
      |       (SELECT CAST(m AS BIGINT) FROM md) AS sample_mod,
      |       (SELECT CAST(count(*) AS BIGINT) FROM mp) AS n_edges,
      |       (SELECT CAST(count(*) AS BIGINT) FROM kept) AS kept_edges,
      |       (SELECT CAST(count(*) AS BIGINT) FROM tri) AS tri_sampled,
      |       (SELECT CAST((SELECT count(*) FROM tri) * m * m * m AS BIGINT)
      |        FROM md) AS tri_est""".stripMargin

  val triangleSampleOracle: String = triangleSampleOracleAt(0.3, 2)

  /** Oracle on the SAME (threshold, sampleMod): the identical md5
    * keep-test, wedge-close enumeration and exact-integer estimator. */
  def triangleSampleOracleAt(threshold: Double, sampleMod: Int): String =
    s"""WITH $oracleQuantized,
      |mp AS MATERIALIZED (
      |  SELECT x.vec_id AS a, y.vec_id AS b
      |  FROM qn x JOIN qn y ON x.vec_id < y.vec_id
      |  WHERE $oracleCosExpr >= $threshold),
      |kept AS MATERIALIZED (
      |  SELECT a, b FROM mp
      |  WHERE CAST(concat('0x', substr(md5(CAST(a AS VARCHAR) || '_' ||
      |          CAST(b AS VARCHAR)), 1, 8)) AS BIGINT) % $sampleMod = 0),
      |tri AS (
      |  SELECT x.a, x.b, y.b AS c
      |  FROM kept x JOIN kept y ON y.a = x.b
      |  JOIN kept z ON z.a = x.a AND z.b = y.b)
      |SELECT (SELECT CAST(count(*) AS BIGINT) FROM mp) AS n_edges,
      |       (SELECT CAST(count(*) AS BIGINT) FROM kept) AS kept_edges,
      |       (SELECT CAST(count(*) AS BIGINT) FROM tri) AS tri_sampled,
      |       (SELECT CAST(count(*) * ${sampleMod.toLong * sampleMod * sampleMod} AS BIGINT) FROM tri) AS tri_est""".stripMargin

  val triangleCensusOracle: String = triangleCensusOracleAt(0.4)

  /** Oracle builder on the SAME cosine threshold as the engine function. */
  def triangleCensusOracleAt(threshold: Double): String =
    s"""WITH $oracleQuantized,
      |mp AS MATERIALIZED (
      |  SELECT x.vec_id AS a, y.vec_id AS b
      |  FROM qn x JOIN qn y ON x.vec_id < y.vec_id
      |  WHERE $oracleCosExpr >= $threshold),
      |tri AS (
      |  SELECT x.a, x.b, y.b AS c
      |  FROM mp x JOIN mp y ON y.a = x.b
      |  JOIN mp z ON z.a = x.a AND z.b = y.b),
      |perv AS (
      |  SELECT v, CAST(count(*) AS BIGINT) AS t
      |  FROM (SELECT a AS v FROM tri UNION ALL SELECT b FROM tri
      |        UNION ALL SELECT c FROM tri)
      |  GROUP BY 1),
      |verts AS (
      |  SELECT DISTINCT v
      |  FROM (SELECT a AS v FROM mp UNION ALL SELECT b FROM mp))
      |SELECT COALESCE(p.t, 0) AS triangles, CAST(count(*) AS BIGINT) AS n_vecs
      |FROM verts LEFT JOIN perv p ON p.v = verts.v
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // --------------------------------------------------------------------
  // Vector-column intake audit — the validation pass an index build
  // runs BEFORE quantizing/bucketing anything: per label, how many
  // vectors are unusable (NULL embedding, wrong dimensionality,
  // non-finite components, finite-but-oversized components, zero
  // norm — each lands in exactly ONE bucket, checked in that
  // precedence order) and the norm range of the usable ones in exact
  // quantized units. Every tier above this one (q28-q30, q54,
  // q78-q119) silently FILTERS n2 > 0 — this is the operator that
  // makes that filtered mass visible instead of silently shrinking
  // the corpus.
  //
  // Scale shape: entirely row-local classification (no UDF — isnan/
  // size/exists run codegen'd) into a ≤|labels|-row rollup via one
  // partial-agg exchange.
  // --------------------------------------------------------------------
  /** int64-safe magnitude ceiling for the 1e4 quantization: the
    * quantized square sum Σ(round(x·10⁴))² over `dims` terms stays
    * inside int64 only while every |x| ≤ this. A finite component past
    * it must route to its own audit bucket — an intake audit on dirty
    * vectors classifies, it never throws an ANSI ArithmeticException
    * mid-plan (and DuckDB's HUGEINT promotion would silently diverge
    * where Spark throws). 9.0e18 leaves ~2% headroom under
    * Long.MaxValue for the ±0.5 rounding slack per component. */
  private def quantSafeAbs(dims: Int): Double =
    math.floor(math.sqrt(9.0e18 / math.max(dims, 1))) / 1e4

  def vectorAudit(embeddings: DataFrame, expectDims: Int = 64): DataFrame = {
    val maxAbs = f"${quantSafeAbs(expectDims)}%.4f"
    embeddings
      .select(expr("CAST(label AS INT)").as("label"), col("embedding"),
        expr(s"""CASE
          |  WHEN embedding IS NULL THEN 'null'
          |  WHEN size(embedding) != $expectDims THEN 'wrong_dims'
          |  WHEN exists(embedding,
          |    x -> isnan(CAST(x AS DOUBLE)) OR abs(CAST(x AS DOUBLE)) > 1e30)
          |    THEN 'non_finite'
          |  WHEN exists(embedding, x -> abs(CAST(x AS DOUBLE)) > $maxAbs)
          |    THEN 'out_of_range'
          |  WHEN aggregate(transform(embedding,
          |      x -> CAST(round(CAST(x AS DOUBLE) * 10000) AS BIGINT)),
          |    0L, (a, x) -> a + x*x) = 0L THEN 'zero_norm'
          |  ELSE 'ok' END""".stripMargin).as("status"))
      // n2 evaluates ONLY for status = 'ok' rows: every other bucket's
      // square sum is either unneeded (the min/max below never consume
      // it) or int64-unsafe (the out_of_range rows would overflow the
      // multiply/add itself, which no try_cast on the cast can guard)
      .select(col("label"), col("status"),
        expr("""CASE WHEN status = 'ok'
          |  THEN aggregate(transform(embedding,
          |      x -> CAST(round(CAST(x AS DOUBLE) * 10000) AS BIGINT)),
          |    0L, (a, x) -> a + x*x)
          |  ELSE 0L END""".stripMargin).as("n2"))
      .groupBy(col("label"), col("status"))
      .agg(count(lit(1)).as("n_vecs"),
        min(when(col("status") === "ok", col("n2"))).as("min_n2"),
        max(when(col("status") === "ok", col("n2"))).as("max_n2"))
      .select(col("label"), col("status"), col("n_vecs"),
        coalesce(col("min_n2"), lit(0L)).as("min_n2"),
        coalesce(col("max_n2"), lit(0L)).as("max_n2"))
      .orderBy(col("label"), col("status"))
  }

  val vectorAuditOracle: String = vectorAuditOracleAt(64)

  /** Oracle builder on the SAME expected dimensionality. NaN literals
    * survive DuckDB's isnan the same way; the 1e30 magnitude guard
    * doubles for ±Infinity (no cross-engine isinf needed); the
    * [[quantSafeAbs]] ceiling is injected identically, and gating n2
    * on status = 'ok' keeps DuckDB's list_sum inside the range where
    * its HUGEINT promotion and Spark's int64 arithmetic agree. */
  def vectorAuditOracleAt(expectDims: Int): String = {
    val maxAbs = f"${quantSafeAbs(expectDims)}%.4f"
    s"""WITH c AS (
      |  SELECT CAST(label AS INT) AS label, embedding,
      |         CASE
      |           WHEN embedding IS NULL THEN 'null'
      |           WHEN len(embedding) != $expectDims THEN 'wrong_dims'
      |           WHEN len(list_filter(embedding,
      |             x -> isnan(CAST(x AS DOUBLE)) OR abs(CAST(x AS DOUBLE)) > 1e30)) > 0
      |             THEN 'non_finite'
      |           WHEN len(list_filter(embedding,
      |             x -> abs(CAST(x AS DOUBLE)) > $maxAbs)) > 0
      |             THEN 'out_of_range'
      |           WHEN CAST(list_sum(list_transform(embedding,
      |               x -> CAST(round(CAST(x AS DOUBLE) * 10000) AS BIGINT) *
      |                    CAST(round(CAST(x AS DOUBLE) * 10000) AS BIGINT))) AS BIGINT) = 0
      |             THEN 'zero_norm'
      |           ELSE 'ok' END AS status
      |  FROM embeddings),
      |n AS (
      |  SELECT label, status,
      |         CASE WHEN status = 'ok'
      |              THEN CAST(list_sum(list_transform(embedding,
      |                x -> CAST(round(CAST(x AS DOUBLE) * 10000) AS BIGINT) *
      |                     CAST(round(CAST(x AS DOUBLE) * 10000) AS BIGINT))) AS BIGINT)
      |              ELSE 0 END AS n2
      |  FROM c)
      |SELECT label, status, CAST(count(*) AS BIGINT) AS n_vecs,
      |       COALESCE(MIN(CASE WHEN status = 'ok' THEN n2 END), 0) AS min_n2,
      |       COALESCE(MAX(CASE WHEN status = 'ok' THEN n2 END), 0) AS max_n2
      |FROM n GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
  }
}
