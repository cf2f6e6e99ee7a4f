package graft.operators

import graft.SparkSpec

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String, Long)*) =
    rows.toSeq.toDF("doc_id", "text", "n_chars")
      .selectExpr("doc_id", "text", "'en' AS lang", "'s' AS source", "n_chars")

  private val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 4
  // length-neutral edit: blocked ngramJaccard guarantees recall only for
  // pairs within 8 chars (the fixture's planted dups are within 4)
  private val nearDup = base.replace("delta", "delt4")

  test("exactDedup groups whitespace-normalized identical texts") {
    val d = docs((1L, "a  b\tc", 5L), (2L, "a b c", 5L), (3L, "x y", 3L))
    val out = Dedup.exactDedup(d).collect()
    assert(out.length == 2)
    val dupGroup = out.find(_.getAs[Long]("cnt") == 2).get
    assert(dupGroup.getAs[Long]("keeper_id") == 1L)
  }

  test("minhashDedup finds the planted near-dup pair and nothing else") {
    val d = docs((1L, base, base.length.toLong),
      (2L, nearDup, nearDup.length.toLong),
      (3L, "totally different words nothing shared here at all whatsoever " * 6, 100L))
    val out = Dedup.minhashDedup(d).collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((1L, 2L)))
    val j = out.head.getAs[Double]("jaccard")
    assert(j > 0.5 && j < 1.0)
  }

  test("minhashDedup on identical docs reports jaccard 1.0") {
    val d = docs((1L, base, base.length.toLong), (2L, base, base.length.toLong))
    val out = Dedup.minhashDedup(d).collect()
    assert(out.length == 1 && out.head.getAs[Double]("jaccard") == 1.0)
  }

  test("simhashDedup: identical docs at hamming 0; unrelated docs absent") {
    val d = docs((1L, base, base.length.toLong), (2L, base, base.length.toLong),
      (3L, "completely unrelated content over many distinct tokens " * 8, 100L))
    val out = Dedup.simhashDedup(d).collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1),
      r.getAs[Number]("hamming").intValue)).toSeq == Seq((1L, 2L, 0)))
    // the candidate-volume tripwire fires loudly past the bound
    val e = intercept[Exception] {
      Dedup.simhashDedup(d, maxCandidates = 0L).collect()
    }
    assert(e.getMessage.contains("maxCandidates"), e.getMessage)
  }

  test("simhashDedup banding derives from maxHamming: every pair at " +
    "hamming <= maxHamming is found regardless of WHICH bits differ " +
    "(the fixed 4-byte banding missed cross-byte flip patterns)") {
    // exhaustively: maxHamming+1 bands of a 32-bit fp; any <=maxHamming
    // flips leave >=1 band untouched — brute-check THE PRODUCT band
    // derivation (Dedup.simhashBands, the same one simhashDedup and its
    // oracle builder use) against random fingerprints and flip patterns;
    // a test-local reimplementation would stay green if the product
    // reverted to fixed byte banding
    val rnd = new scala.util.Random(11)
    for (maxHamming <- Seq(3, 5, 7)) {
      val bands = Dedup.simhashBands(maxHamming)
      assert(bands.length == maxHamming + 1)
      def keys(fp: Long): Seq[(Int, Long)] =
        bands.map { case (i, off, w) => (i, (fp >> off) & ((1L << w) - 1)) }
      for (_ <- 0 until 200) {
        val fp = rnd.nextLong() & 0xffffffffL
        // worst case for byte banding: flips spread across distinct bytes
        val nFlips = 1 + rnd.nextInt(maxHamming)
        val bits = rnd.shuffle((0 until 32).toList).take(nFlips)
        val fp2 = bits.foldLeft(fp)((f, b) => f ^ (1L << b))
        assert(keys(fp).toSet.intersect(keys(fp2).toSet).nonEmpty,
          s"maxHamming=$maxHamming flips=$bits: no shared band")
      }
    }
    // and the guard fails closed on an unservable setting
    val d = docs((1L, base, base.length.toLong))
    val e = intercept[IllegalArgumentException](
      Dedup.simhashDedup(d, maxHamming = 32).collect())
    assert(e.getMessage.contains("maxHamming"))
  }

  test("ngramJaccard staggered buckets catch length-close near-dups") {
    val d = docs((1L, base, base.length.toLong),
      (2L, nearDup, nearDup.length.toLong))
    val out = Dedup.ngramJaccard(d).collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((1L, 2L)))
  }

  test("dupClusters merges a transitive CHAIN of near-dups into one " +
    "component (adjacent docs similar, endpoints not)") {
    // sliding 40-word windows over a 70-word vocab: adjacent docs share
    // ~77% of shingles (a pair), endpoints share too little (no pair) —
    // only transitivity connects the chain, so propagation must run
    // multiple rounds (graph diameter 5)
    val vocab = (0 until 70).map(i => f"w$i%02d")
    val chain = (0 until 6).map { i =>
      (10L + i, vocab.slice(i * 5, i * 5 + 40).mkString(" "))
    }
    val lone = Seq((100L, (0 until 40).map(i => s"z$i").mkString(" ")))
    val docs = (chain ++ lone).toDF("doc_id", "text")
      .selectExpr("doc_id", "text", "'en' AS lang", "'s' AS source",
        "CAST(length(text) AS BIGINT) AS n_chars")
    val out = Dedup.dupClusters(docs).collect()
    assert(out.length == 1, out.mkString(","))
    assert(out.head.getLong(0) == 10L)             // component = min doc_id
    assert(out.head.getAs[Long]("n_docs") == 6L)   // whole chain, once each
    assert(out.head.getAs[Long]("max_doc") == 15L)
  }

  test("dedupKeepers: cluster members point at the min doc_id; " +
    "unmatched and unshingleable docs keep themselves") {
    val d = docs(
      (1L, base, base.length.toLong),
      (2L, nearDup, nearDup.length.toLong), // near-dup of 1 → keeper 1
      (3L, "totally different words nothing shared here at all whatsoever " * 6, 100L),
      (4L, "ab", 2L)) // <3 tokens: cannot shingle, must still appear
    val out = Dedup.dedupKeepers(d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSeq
    assert(out == Seq((1L, 1L, true), (2L, 1L, false),
      (3L, 3L, true), (4L, 4L, true)), out.toString)
  }

  test("minhash df-filter: shingles above the df ceiling (template text) " +
    "never create pairs; content near-dups survive the filter") {
    // the degenerate-LSH-bucket guard found by the 10x skewed fixture: a
    // template sentence shared corpus-wide dominates short docs' minhash
    // and collapses them into one quadratic band bucket. 20 docs, every
    // one carrying the same 8-word template suffix (df = 100% > 10%):
    //  - docs 1, 2: tiny distinct bodies — similar ONLY via the template
    //    (unfiltered trigram jaccard 0.6 >= threshold)
    //  - docs 3, 4: 20-word bodies one edit apart — genuinely near-dup
    //    with or without the template
    //  - 26 fillers (distinct 2-word bodies) push the template's df (30)
    //    above the DfFloorDocs=25 floor while docs 3/4's shared body
    //    shingles (df 2) stay far below the ceiling
    val t = "all rights reserved contact site admin for terms"
    val body = (0 until 20).map(i => s"w$i").mkString(" ")
    val fillers = (0 until 26).map(i => (10L + i, s"pad${i}a pad${i}b $t", 10L))
    val all = Seq((1L, s"red fox $t", 10L), (2L, s"blue cat $t", 10L),
      (3L, s"$body $t", 10L), (4L, s"${body.replace("w7", "q7")} $t", 10L)) ++ fillers
    val d = docs(all: _*)
    val filtered = Dedup.minhashDedup(d).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(filtered == Set((3L, 4L)), filtered.toString)
    // maxDfFrac = 1.0 disables the filter: the template pairs reappear
    val unfiltered = Dedup.minhashDedup(d, maxDfFrac = 1.0).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(unfiltered.contains((3L, 4L)) && unfiltered.size > 1,
      unfiltered.toString)
    // keep/drop under the default ceiling: template-only similarity never
    // merges docs; the genuine near-dup still collapses to its keeper
    val keep = Dedup.dedupKeepers(d).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(keep(1L) == 1L && keep(2L) == 2L && keep(4L) == 3L, keep.toString)
  }

  test("dedup plans are deterministic across executions") {
    val d = docs((1L, base, base.length.toLong),
      (2L, nearDup, nearDup.length.toLong))
    assertDeterministic(Dedup.minhashDedup(d))
  }

  test("qualityKeepers: the component keeps its BEST-quality member, " +
    "ties fall back to min id, unmatched docs keep themselves") {
    // doc 3 = base with every "epsilon" lengthened -> same token/uniq
    // counts but higher avg token length -> strictly higher q6 than
    // docs 1/2 (which tie); all three are one near-dup component
    val longTok = base.replace("epsilon", "epsilonnnnn")
    val d = docs(
      (1L, base, base.length.toLong),
      (2L, nearDup, nearDup.length.toLong),
      (3L, longTok, longTok.length.toLong),
      (9L, "totally different words nothing shared here at all whatsoever " * 6, 100L))
    val out = Dedup.qualityKeepers(d).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(out == Map(
      1L -> ((3L, false)), 2L -> ((3L, false)), 3L -> ((3L, true)),
      9L -> ((9L, true))), out.toString)
    // quality tie (base vs nearDup alone differ only in one character
    // substitution of equal length) -> min doc_id wins
    val tied = docs((1L, base, base.length.toLong),
      (2L, nearDup, nearDup.length.toLong))
    val out2 = Dedup.qualityKeepers(tied).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out2 == Map(1L -> 1L, 2L -> 1L), out2.toString)
    assertDeterministic(Dedup.qualityKeepers(d))
  }

  test("dupSpans: cross-doc copies, within-doc repeats, short-doc filter") {
    val shared = "one two three four five six seven eight" // 8 toks, 4 spans
    val d = docs(
      (1L, shared, 10L),                 // all 4 spans duplicated (doc 2)
      (2L, shared, 10L),
      (3L, "u1 u2 u3 u4 u5 u6 u7 u8", 10L), // 4 spans, all unique -> 0 dup
      // period-5 repetition: 15 toks, 11 span positions, spans at offsets
      // 0/5/10 (and 1/6, 2/7, ...) collide WITHIN the doc -> all 11 dup
      (4L, ("x y z w v " * 3).trim, 15L),
      (5L, "too short here", 3L))        // < k toks -> no output row
    val out = Dedup.dupSpans(d).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(out.keySet == Set(1L, 2L, 3L, 4L))
    assert(out(1L) == ((4L, 4L, 10000L)))
    assert(out(2L) == ((4L, 4L, 10000L)))
    assert(out(3L) == ((4L, 0L, 0L)))
    assert(out(4L) == ((11L, 11L, 10000L)))
  }

  test("dupSpans: partial overlap yields exact floored basis points") {
    // doc 1: 10 toks -> 6 spans; doc 2 shares doc 1's LAST 5 toks plus 5
    // of its own -> exactly one colliding span position each
    val d = docs(
      (1L, "a b c d e f g h i j", 10L),
      (2L, "f g h i j p q r s t", 10L))
    val out = Dedup.dupSpans(d).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    // 1 of 6 spans duplicated -> floor(1*10000/6) = 1666 bp
    assert(out(1L) == ((6L, 1L, 1666L)) && out(2L) == ((6L, 1L, 1666L)))
    assertDeterministic(Dedup.dupSpans(d))
  }

  test("scrubDupSpans: covered tokens removed with original case kept, " +
    "fully-templated doc scrubs to empty, clean docs absent") {
    val d = docs(
      // A and B (and D) share the lowercased 5-token span
      // "alpha beta gamma delta epsilon"; case differs — hashing is
      // case-folded, the REBUILT text preserves the original case
      (1L, "Alpha beta gamma delta epsilon UNIQUE1 UNIQUE2", 10L),
      (2L, "prefix1 alpha BETA gamma delta epsilon tail1 tail2", 10L),
      (3L, "c1 c2 c3 c4 c5 c6 entirely clean document", 10L),
      (4L, "alpha beta gamma delta epsilon", 10L))
    val out = Dedup.scrubDupSpans(d).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    assert(out.keySet == Set(1L, 2L, 4L), out.keySet.toString)
    assert(out(1L) == ((7L, 5L, "UNIQUE1 UNIQUE2")), out(1L).toString)
    assert(out(2L) == ((8L, 5L, "prefix1 tail1 tail2")), out(2L).toString)
    assert(out(4L) == ((5L, 5L, "")), out(4L).toString)
    assertDeterministic(Dedup.scrubDupSpans(d))
    // scrub is idempotent on its own output: re-running over the
    // cleaned corpus finds no corpus-repeated span (the shared block is
    // gone from every copy)
    import spark.implicits._
    val cleaned = out.toSeq.map { case (id, (_, _, t)) => (id, t, 1L) } :+
      ((3L, "c1 c2 c3 c4 c5 c6 entirely clean document", 1L))
    val again = Dedup.scrubDupSpans(docs(cleaned: _*)).collect()
    assert(again.isEmpty, again.mkString(","))
  }

  test("sourceOverlap: hand-computed span-overlap matrix; sources with no " +
    "shared span emit no row") {
    import spark.implicits._
    val d = Seq(
      // a∩b = exactly the span "p q r s t"; b∩c = exactly "m n o k l";
      // d shares nothing and must not appear
      (1L, "p q r s t u1a u2a u3a", "a"),
      (2L, "p q r s t v1b v2b v3b", "b"),
      (3L, "m n o k l w1b w2b", "b"),
      (4L, "m n o k l z1c z2c z3c z4c", "c"),
      (5L, "d1 d2 d3 d4 d5", "d"))
      .toDF("doc_id", "text", "source")
      .selectExpr("doc_id", "text", "'en' AS lang", "source",
        "CAST(length(text) AS BIGINT) AS n_chars")
    val out = Dedup.sourceOverlap(d, k = 5).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    // distinct spans: a=4, b=4+3=7, c=5, d=1
    assert(out == Seq(
      ("a", "b", 1L, 4L, 7L, 1000L * 1 / 4),
      ("b", "c", 1L, 7L, 5L, 1000L * 1 / 5)), s"got $out")
    assertDeterministic(Dedup.sourceOverlap(d, k = 5))
  }

  test("sourceOverlap plan: both self-join branches read ONE h-keyed " +
    "exchange (ReusedExchange), not a re-derived span explosion") {
    import spark.implicits._
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val d = (0L until 30L).map(i =>
        (i, s"alpha beta gamma delta epsilon tail$i", s"s${i % 4}"))
        .toDF("doc_id", "text", "source")
        .selectExpr("doc_id", "text", "'en' AS lang", "source",
          "CAST(length(text) AS BIGINT) AS n_chars")
      val q = Dedup.sourceOverlap(d, k = 5)
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("ReusedExchange"),
        "self-join re-derives the span stage (no ReusedExchange):\n" +
          plan.linesIterator.filter(_.contains("Exchange")).mkString("\n"))
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("connectedComponents round loop: localCheckpoint bounds lineage on a " +
    "deep (≥10-round) chain — labels exact, DAG does not grow per round") {
    // WHY the bound matters and why this test never disables truncation:
    // each round's doubling join references the round's `prop` RDD twice,
    // so the UNtruncated lineage is a tree that doubles per round — even
    // `toDebugString` on it is exponential (measured: minutes, then
    // StackOverflow, at ~13 rounds). localCheckpoint resets the tree
    // every `checkpointEvery` rounds, so depth is bounded by the interval
    // regardless of diameter; a run needing 2× the rounds must come back
    // with the SAME order of lineage, which is what this asserts.
    val sc = spark.sparkContext
    val part = new org.apache.spark.HashPartitioner(sc.defaultParallelism)
    // a path 0–1–2–…–n has diameter n; pointer doubling needs ~log₂(n)
    // rounds, so n = 4096 forces ≥ 10 rounds through the loop
    def pathEdges(n: Long) = sc
      .parallelize((0L until n).map(i => (i, i + 1)), 8)
      .flatMap { case (a, b) => Seq((a, b), (b, a)) }
      .partitionBy(part).cache()
    def run(n: Long): (Int, Long) = {
      val edges = pathEdges(n)
      val labels = Dedup.ccLabelsRdd(edges, part, maxIters = 30, "spec")
      val depth = labels.toDebugString.linesIterator.size
      assert(labels.filter(_._2 != 0L).isEmpty(),
        s"path($n) must collapse to the single label 0")
      val cnt = labels.count()
      // a localCheckpoint'ed RDD has no lineage to fall back on —
      // unpersist only after the last action that reads it
      labels.unpersist(false)
      edges.unpersist(false)
      (depth, cnt)
    }
    val (shallowDepth, shallowCnt) = run(128L)   // ~7 rounds
    val (deepDepth, deepCnt) = run(4096L)        // ~13 rounds
    assert(shallowCnt == 129L && deepCnt == 4097L)
    // bounded = a function of the ≤5-round post-checkpoint tail only
    // (measured 193 lines for BOTH runs; the 4× slack covers a ±2-round
    // tail misalignment, each tail round ~doubling the debug tree) —
    // without truncation the 13-round run would be ~2⁶× the 7-round one
    assert(deepDepth <= shallowDepth * 4 && deepDepth < 500,
      s"lineage grew with round count despite truncation: " +
        s"${shallowDepth} lines at ~7 rounds vs ${deepDepth} at ~13")
  }

  test("prefixDups: docs sharing the exact first-P tokens cluster " +
    "regardless of their tails; a changed opener does not") {
    val d = docs(
      (1L, "dear valued customer greetings the quick brown fox", 50L),
      (2L, "dear valued customer greetings a completely different tail", 58L),
      (3L, "dear valued customer greetings", 30L), // exactly P tokens
      (4L, "dear valued customer FAREWELL the quick brown fox", 49L),
      (5L, "lone document with its own opener entirely", 42L))
    val out = Dedup.prefixDups(d).collect()
    assert(out.length == 1, out.mkString(","))
    val r = out.head
    assert(r.getAs[Long]("n_docs") == 3L)
    assert(r.getAs[Long]("n_sources") == 1L)
    assert(r.getAs[Long]("min_doc") == 1L)
    assertDeterministic(Dedup.prefixDups(d))
  }

  test("connectedComponents small-graph fast path matches the Pregel " +
    "loop label-for-label on a mixed random graph") {
    import spark.implicits._
    // deterministic pseudo-random graph: chains, a clique, isolated
    // pairs — enough shape variety to catch a union/find labeling bug
    val edges = (
      (0L until 50L).map(i => (i * 3, i * 3 + 3)) ++        // long chain
      (for (i <- 200L to 205L; j <- (i + 1) to 205L) yield (i, j)) ++ // clique
      Seq((500L, 501L), (600L, 601L), (601L, 602L))
    ).toVector
    val pairsDf = edges.toDF("a", "b")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // fast path (well under the edge bound)
    val fast = Dedup.connectedComponents(pairsDf, maxIters = 30, "spec-fast")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // distributed loop on the same graph
    val sc = spark.sparkContext
    val part = new org.apache.spark.HashPartitioner(4)
    val rdd = sc.parallelize(edges, 4)
      .flatMap { case (a, b) => Seq((a, b), (b, a)) }
      .partitionBy(part).cache()
    val pregel = Dedup.ccLabelsRdd(rdd, part, maxIters = 30, "spec-pregel")
    val slow = pregel.collect().toSet
    pregel.unpersist(false)
    rdd.unpersist(false)
    pairsDf.unpersist(false)
    assert(fast == slow, s"fast-path/Pregel label divergence: " +
      s"only-fast=${(fast -- slow).take(5)} only-pregel=${(slow -- fast).take(5)}")
    // label contract: every label is the component minimum
    assert(fast.forall { case (v, l) => l <= v })
  }

  test("incrementalDedup: a batch doc matching the base is rejected with " +
    "its best base match; base-base and batch-batch dups never appear") {
    // ids chosen by parity: 2/4/6 base, 1/3/5 batch.
    //   batch 3 near-dups base 2 AND base 4 (identical) -> best = min id 2
    //   base 4 duplicates base 2 (same side: must NOT appear)
    //   batch 1 duplicates batch 5 (same side: must NOT appear)
    //   batch 5 matches nothing in base -> admitted (no row)
    val other = "totally different words nothing shared here at all whatsoever " * 6
    val d = docs(
      (2L, base, base.length.toLong), (4L, base, base.length.toLong),
      (6L, other, other.length.toLong),
      (3L, nearDup, nearDup.length.toLong),
      (1L, other + " extra tail tokens here", 100L),
      (5L, other + " extra tail tokens here", 100L))
    val out = Dedup.incrementalDedup(d).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    // 1 and 5 share text (batch side) and both near-dup base 6's text:
    // they ARE rejected against 6 — assert exact decision table
    assert(out == Seq((1L, 6L), (3L, 2L), (5L, 6L)), out.toString)
    assertDeterministic(Dedup.incrementalDedup(d))
  }
}
