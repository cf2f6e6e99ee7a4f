package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PipelineSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.toSeq.toDF("doc_id", "text")
      .selectExpr("doc_id", "text", "'en' AS lang",
        "concat('src', CAST(doc_id % 3 AS STRING)) AS source",
        "CAST(length(text) AS BIGINT) AS n_chars")

  test("piiScrub counts and redacts planted emails, phones, ids") {
    val d = docs(
      (0L, "contact bob@example.com or alice@test.org today"),
      (1L, "call 555-123-4567 or 555.987.6543 now"),
      (2L, "ssn 123-45-6789 on file"),
      (3L, "clean text with no pii at all"))
    val out = Pipeline.piiScrub(d).collect().map(r => r.getLong(0) -> r).toMap
    assert(out(0L).getAs[Long]("n_emails") == 2L)
    assert(out(1L).getAs[Long]("n_phones") == 2L)
    assert(out(2L).getAs[Long]("n_ids") == 1L)
    assert(out(3L).getAs[Long]("n_emails") == 0L &&
      out(3L).getAs[Long]("n_phones") == 0L && out(3L).getAs[Long]("n_ids") == 0L)
    // redaction changes the fingerprint only when something matched
    val cleanFp = out(3L).getAs[String]("scrubbed_fp")
    assert(cleanFp == org.apache.commons.codec.digest.DigestUtils.md5Hex(
      "clean text with no pii at all"))
  }

  test("repetitionFilter: repeated text fails, varied text passes") {
    val varied = (1 to 40).map(i => s"word$i").mkString(" ")
    val looped = Seq.fill(20)("spam eggs").mkString(" ")
    val out = Pipeline.repetitionFilter(docs((0L, varied), (1L, looped)))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(0L).getAs[Boolean]("keep"))
    assert(out(0L).getAs[Long]("dup_bigram_ppm") == 0L)
    assert(!out(1L).getAs[Boolean]("keep"))
    // "spam eggs" x20: top word appears 20/40 times = 500000 ppm
    assert(out(1L).getAs[Long]("top_word_ppm") == 500000L)
  }

  test("sourceMixture keep-rates are per-source deterministic and within [10, 69]") {
    val d = docs((0L until 300L).map(i => (i, s"text $i")): _*)
    val out = Pipeline.sourceMixture(d).collect()
    assert(out.length == 3)
    out.foreach { r =>
      val rate = r.getAs[Long]("rate_pct")
      assert(rate >= 10L && rate <= 69L)
      val frac = r.getAs[Long]("kept").toDouble / r.getAs[Long]("total")
      assert(math.abs(frac - rate / 100.0) < 0.15,
        s"${r.getAs[String]("source")}: kept fraction $frac vs rate $rate%")
    }
    assertDeterministic(Pipeline.sourceMixture(d))
  }

  test("contamination flags docs sharing shingles with the benchmark set") {
    // doc 0 (doc_id % 50 == 0) is the benchmark; doc 7 copies it,
    // doc 1 is unrelated
    val base = "alpha beta gamma delta epsilon zeta eta theta"
    val d = docs((0L, base), (7L, base), (1L, "one two three four five six"))
    val out = Pipeline.contamination(d).collect().map(r => r.getLong(0) -> r).toMap
    assert(!out.contains(0L), "benchmark docs are excluded from the corpus side")
    assert(out(7L).getAs[Boolean]("contaminated"))
    assert(out(7L).getAs[Long]("overlap_ppm") == 1000000L)
    assert(!out(1L).getAs[Boolean]("contaminated"))
    assert(out(1L).getAs[Long]("n_overlap") == 0L)
  }

  test("tokenPacking: bin counts, straddlers and totals obey the " +
    "concat-and-chunk layout invariants") {
    // src0: docs 0,3,6,9 → 4 docs; every doc here is 5 tokens
    val d = docs((0L until 12L).map(i => (i, "a b c d e")): _*)
    val out = Pipeline.tokenPacking(d, budget = 8L).collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    assert(out.keySet == Set("src0", "src1", "src2"))
    out.values.foreach { r =>
      val (docs0, toks, bins, straddlers) = (r.getAs[Long]("n_docs"),
        r.getAs[Long]("total_tokens"), r.getAs[Long]("n_bins"),
        r.getAs[Long]("n_straddlers"))
      assert(docs0 == 4L && toks == 20L)
      // 20 tokens at budget 8 → ceil = 3 bins
      assert(bins == 3L)
      // offsets per doc: [0,5) [5,10) [10,15) [15,20) → docs 2 and 3
      // cross the 8 and 16 boundaries
      assert(straddlers == 2L)
      assert(r.getAs[Long]("docs_per_bin_x1000") == 4000L / 3L)
    }
    assertDeterministic(Pipeline.tokenPacking(d, budget = 8L))
  }

  test("tokenPacking shards a hot source: the doc-level cumsum window is " +
    "keyed (source, shard), never one task per source, and any shardDocs " +
    "gives bit-identical bins") {
    // one source holds 90% of the corpus; token counts vary per doc
    val d = spark.range(1000).selectExpr(
      "id AS doc_id",
      "array_join(transform(sequence(1, CAST(id % 7 + 1 AS INT)), i -> 'w'), ' ') AS text",
      "'en' AS lang",
      "CASE WHEN id % 10 = 0 THEN concat('cold', CAST(id % 3 AS STRING)) " +
        "ELSE 'hot' END AS source",
      "CAST(13 AS BIGINT) AS n_chars")
    val sharded = Pipeline.tokenPacking(d, budget = 8L, shardDocs = 64L)
    val single = Pipeline.tokenPacking(d, budget = 8L, shardDocs = Long.MaxValue)
    assert(rows(sharded) == rows(single),
      "shard size must not change bin boundaries")
    // the hot source really does split: 900 docs over doc_id range 0..999
    // at 64 docs/shard → ≥14 distinct (source, shard) groups
    val hotShards = d.filter(col("source") === "hot")
      .selectExpr("doc_id DIV 64 AS shard").distinct().count()
    assert(hotShards >= 14L, s"expected ≥14 hot shards, got $hotShards")
    // and the doc-level window's exchange is keyed (source, shard) — the
    // serial per-source sort never materializes
    sharded.collect()
    val plan = sharded.queryExecution.executedPlan.toString
    val partLines = plan.linesIterator.filter(_.contains("hashpartitioning")).toSeq
    assert(partLines.exists(l => l.contains("source") && l.contains("shard")),
      s"no (source, shard)-keyed exchange in:\n${partLines.mkString("\n")}")
    // the offsets branch must read the shuffle output, not re-scan the
    // corpus: its repartition exchange is a ReusedExchange
    assert(plan.contains("ReusedExchange"),
      s"offsets branch re-scans the corpus (no ReusedExchange):\n" +
        plan.linesIterator.filter(_.contains("Exchange")).mkString("\n"))
  }

  test("domainQuota keeps exactly k docs per source, by md5 priority, " +
    "through the bounded-heap TopKPerKey operator") {
    graft.plans.TopKInstall.install(spark)
    val d = docs((0L until 90L).map(i => (i, s"doc number $i")): _*)
    val q = Pipeline.domainQuota(d, k = 7)
    val rows0 = q.collect()
    assert(rows0.length == 21, "3 sources x 7 kept")
    val bySrc = rows0.groupBy(_.getAs[String]("source"))
    bySrc.values.foreach { rs =>
      assert(rs.map(_.getAs[Int]("rk")).sorted.toSeq == (1 to 7))
    }
    // the rewrite swapped the row_number window for the heap operator
    assert(q.queryExecution.executedPlan.toString.contains("TopKPerKey"),
      q.queryExecution.executedPlan.toString.take(600))
    // priority is md5(doc_id): independent of input order
    assertDeterministic(Pipeline.domainQuota(d.orderBy(rand()), k = 7))
  }

  test("curationFunnel composes quality → dedup keeper → quota with " +
    "hand-checkable per-source counts") {
    val t0 = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val t1 = "uno dos tres cuatro cinco seis siete ocho nueve diez"
    val t2 = "red orange yellow green blue indigo violet cyan magenta black"
    val t4 = "north south east west up down left right front back"
    val looped = Seq.fill(20)("spam eggs").mkString(" ")
    val d = docs(
      (0L, t0), (3L, t0),              // src0: dup pair, keeper 0
      (6L, looped), (9L, "one"),       // src0: quality failures
      (1L, t1), (4L, t4),              // src1: two unique keepers
      (2L, t2), (5L, t2),              // src2: dup pair, keeper 2
      (8L, looped))                    // src2: quality failure
    val out = Pipeline.curationFunnel(d, k = 1).collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    assert(out.keySet == Set("src0", "src1", "src2"))
    val s0 = out("src0")
    assert(s0.getAs[Long]("n_total") == 4L && s0.getAs[Long]("n_quality") == 2L &&
      s0.getAs[Long]("n_unique") == 1L && s0.getAs[Long]("n_final") == 1L &&
      s0.getAs[Long]("tok_final") == 10L, s0.toString)
    val s1 = out("src1")
    assert(s1.getAs[Long]("n_total") == 2L && s1.getAs[Long]("n_quality") == 2L &&
      s1.getAs[Long]("n_unique") == 2L && s1.getAs[Long]("n_final") == 1L &&
      s1.getAs[Long]("tok_final") == 10L, s1.toString)
    val s2 = out("src2")
    assert(s2.getAs[Long]("n_total") == 3L && s2.getAs[Long]("n_quality") == 2L &&
      s2.getAs[Long]("n_unique") == 1L && s2.getAs[Long]("n_final") == 1L &&
      s2.getAs[Long]("tok_final") == 10L, s2.toString)
    // funnel stages only ever shrink, and the quota caps the final stage
    out.values.foreach { r =>
      assert(r.getAs[Long]("n_total") >= r.getAs[Long]("n_quality"))
      assert(r.getAs[Long]("n_quality") >= r.getAs[Long]("n_unique"))
      assert(r.getAs[Long]("n_unique") >= r.getAs[Long]("n_final"))
      assert(r.getAs[Long]("n_final") <= 1L)
    }
    assertDeterministic(Pipeline.curationFunnel(d.orderBy(rand()), k = 1))
  }

  test("curationFunnel: a source with zero survivors reports n_final = 0 " +
    "(the quota buffer holds only filler non-survivors)") {
    val looped = Seq.fill(20)("spam eggs").mkString(" ")
    val good = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    // src0 (docs 0, 3): every doc fails quality; src1 (doc 1): passes
    val d = docs((0L, looped), (3L, looped), (1L, good))
    val out = Pipeline.curationFunnel(d, k = 5).collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    val s0 = out("src0")
    assert(s0.getAs[Long]("n_total") == 2L && s0.getAs[Long]("n_quality") == 0L)
    assert(s0.getAs[Long]("n_final") == 0L && s0.getAs[Long]("tok_final") == 0L,
      s0.toString)
    val s1 = out("src1")
    assert(s1.getAs[Long]("n_final") == 1L && s1.getAs[Long]("tok_final") == 10L)
  }

  test("curationFunnel plan: counts and quota ride ONE partial-aggregated " +
    "pass — single corpus scan, no window, no per-source sort") {
    // parquet-backed corpus (a LocalRelation would constant-fold the
    // flag projections at plan time and hide the scan shape), with a dup
    // pair so the labels join is real
    val dir = java.nio.file.Files.createTempDirectory("graft_funnel").toString
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs(((0L until 300L).map(i => (i, s"w$i x$i y$i z$i v$i")) ++
      Seq((300L, base), (303L, base))): _*)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val d = spark.read.parquet(s"$dir/documents.parquet")
    val q = Pipeline.curationFunnel(d, k = 5)
    q.collect()
    // AQE's toString appends an "== Initial Plan ==" copy — assert on
    // the final plan section only
    val plan = q.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    // the quota is fused into the aggregation (typed Aggregator →
    // ObjectHashAggregate with a partial pass), not a window
    assert(plan.contains("ObjectHashAggregate"), plan.take(800))
    assert(plan.contains("partial_"),
      "no map-side partial aggregation:\n" + plan.take(800))
    assert(!plan.contains("Window"),
      "a window (full per-source sort) crept back in:\n" +
        plan.linesIterator.filter(l => l.contains("Window") || l.contains("Sort"))
          .mkString("\n"))
    // exactly one scan of the corpus parquet feeds the whole funnel (the
    // dedup labels stage is session-memoized and CACHED — it reads as an
    // InMemoryRelation here, its own build scans pinned by DedupSpec)
    val scans = plan.linesIterator
      .filter(_.contains("Scan parquet")).map(_.trim).toSet
    assert(scans.size == 1, s"expected 1 corpus scan, found " +
      s"${scans.size}:\n${scans.mkString("\n")}")
  }

  test("chunkLayout: closed-form window counts match a brute-force " +
    "sliding-window simulation, including padding and overlap") {
    // doc lengths straddling every regime: shorter than one window,
    // exactly one window, one token over, and many windows
    val lens = Seq(1, 3, 8, 9, 17, 24, 25, 100)
    val d = docs(lens.zipWithIndex.map { case (n, i) =>
      (i.toLong, Seq.fill(n)("w").mkString(" ")) }: _*)
    val (maxLen, stride) = (8L, 5L)
    val out = Pipeline.chunkLayout(d, maxLen, stride).collect()
    // brute force: emit windows [i*stride, i*stride+maxLen) while the
    // previous window did not reach the end
    def sim(n: Long): (Long, Long, Long) = {
      var start = 0L
      var chunks = 0L
      var emitted = 0L
      var lastLen = 0L
      var done = false
      while (!done) {
        val len = math.min(maxLen, n - start)
        chunks += 1; emitted += math.min(maxLen, n - start); lastLen = len
        if (start + maxLen >= n) done = true else start += stride
      }
      (chunks, emitted, maxLen - lastLen)
    }
    // aggregate expectations per source (doc i → src{i%3})
    val bySrc = lens.zipWithIndex.groupBy { case (_, i) => s"src${i % 3}" }
    out.foreach { r =>
      val docs0 = bySrc(r.getAs[String]("source")).map(_._1.toLong)
      val sims = docs0.map(sim)
      assert(r.getAs[Long]("docs") == docs0.length.toLong)
      assert(r.getAs[Long]("total_tokens") == docs0.sum)
      assert(r.getAs[Long]("total_chunks") == sims.map(_._1).sum,
        s"${r.getAs[String]("source")}: chunks")
      assert(r.getAs[Long]("emitted_tokens") == sims.map(_._2).sum,
        s"${r.getAs[String]("source")}: emitted")
      assert(r.getAs[Long]("pad_tokens") == sims.map(_._3).sum,
        s"${r.getAs[String]("source")}: pad")
    }
  }

  test("shardBalance: shards partition the corpus, fill_bp is the exact " +
    "floored S-way ratio, assignment matches the md5 twin") {
    val d = docs((0L until 200L).map(i =>
      (i, ("tok " * (1 + (i % 7).toInt)).trim)): _*)
    val s = 8
    val out = Pipeline.shardBalance(d, shards = s).collect()
    assert(out.map(_.getInt(0)).toSeq == (0 until s), "every shard present, ordered")
    assert(out.map(_.getAs[Long]("n_docs")).sum == 200L)
    val total = out.map(_.getAs[Long]("n_tokens")).sum
    out.foreach { r =>
      assert(r.getAs[Long]("fill_bp") ==
        r.getAs[Long]("n_tokens") * s * 10000L / total)
    }
    // JVM twin of the assignment (the q73/q76 md5-bucket spelling)
    val md = java.security.MessageDigest.getInstance("MD5")
    def shardOf(id: Long): Int = {
      val hex = md.digest(id.toString.getBytes("UTF-8"))
        .take(4).map(b => f"${b & 0xff}%02x").mkString
      (java.lang.Long.parseLong(hex, 16) % s).toInt
    }
    val expDocs = (0L until 200L).groupBy(shardOf).view
      .mapValues(_.size.toLong).toMap
    assert(out.map(r => r.getInt(0) -> r.getAs[Long]("n_docs")).toMap == expDocs)
    assertDeterministic(Pipeline.shardBalance(d, shards = s))
  }

  test("snapshotNovelty counts new/retired grams per source; an empty " +
    "today-crawl yields novelty 0, not a division error") {
    // snapshot membership by the q65 derivation: id%7==0 absent
    // yesterday, id%5==0 absent today, id%11==0 recrawled with ' v2';
    // source = src(id%3) from the fixture helper
    val d = docs(
      (1L, "a b c d"),  // src1, both snapshots
      (3L, "a b c d"),  // src0, both (same grams as src1 — per-source!)
      (7L, "x y z"),    // src1, today only -> new gram
      (5L, "p q r"),    // src2, yesterday only -> retired gram
      (11L, "m n o"))   // src2, recrawl: today = "m n o v2"
    val out = Pipeline.snapshotNovelty(d).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(out == Map(
      "src0" -> ((2L, 0L, 0L, 0L)),
      "src1" -> ((3L, 1L, 0L, 3333L)),
      "src2" -> ((2L, 1L, 1L, 5000L))), out.toString)
    // zero-gram today: the only doc vanishes from today's snapshot
    val z = Pipeline.snapshotNovelty(docs((5L, "p q r"))).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(4))).toSeq
    assert(z == Seq(("src2", 0L, 0L)), z.toString)
    assertDeterministic(Pipeline.snapshotNovelty(d))
  }

  test("snapshotDelta classifies added/removed/changed/unchanged " +
    "against an independent reference computation") {
    val ids = 0L until 70L
    val d = docs(ids.map(i => (i, s"document body $i")): _*)
    // reference: yesterday misses %7==0, today misses %5==0, %11==0
    // recrawled with different content
    val expected = ids.flatMap { i =>
      val inY = i % 7 != 0
      val inT = i % 5 != 0
      if (!inY && !inT) None
      else if (!inY) Some(i -> "added")
      else if (!inT) Some(i -> "removed")
      else if (i % 11 == 0) Some(i -> "changed")
      else Some(i -> "unchanged")
    }.groupBy(_._2).view.mapValues(_.map(_._1)).toMap
    val out = Pipeline.snapshotDelta(d).collect()
      .map(r => r.getAs[String]("status") -> r).toMap
    assert(out.keySet == expected.keySet)
    expected.foreach { case (status, docIds) =>
      assert(out(status).getAs[Long]("n_docs") == docIds.size.toLong, status)
      assert(out(status).getAs[Long]("min_doc") == docIds.min, status)
      assert(out(status).getAs[Long]("max_doc") == docIds.max, status)
    }
  }

  test("tokenBudgetSample: the kept set is the md5-priority prefix whose " +
    "running token sum fits the budget, and the shard count is invisible") {
    import org.apache.commons.codec.digest.DigestUtils
    val d = docs((0L until 60L).map(i =>
      (i, ("tok " * (1 + (i % 7)).toInt).trim)): _*)
    val budget = 25L
    // brute force: per source, order by (md5-prefix, doc_id), keep while
    // the running sum stays within the budget
    def pr(id: Long): Long =
      java.lang.Long.parseLong(DigestUtils.md5Hex(id.toString).take(8), 16)
    val raw = d.select("doc_id", "source", "text").collect().map(r =>
      (r.getString(1), pr(r.getLong(0)), r.getLong(0),
        r.getString(2).split("\\s+").length.toLong))
    val expected = raw.groupBy(_._1).map { case (src, rs) =>
      var cum = 0L; var kd = 0L; var kt = 0L
      rs.sortBy(t => (t._2, t._3)).foreach { t =>
        cum += t._4
        if (cum <= budget) { kd += 1; kt += t._4 }
      }
      src -> ((rs.length.toLong, kd, kt, kt * 10000L / budget))
    }
    val out = Pipeline.tokenBudgetSample(d, budget = budget, shards = 8)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out == expected, s"$out vs $expected")
    // budget is a hard cap
    out.values.foreach { case (_, _, kt, fill) =>
      assert(kt <= budget && fill <= 10000L)
    }
    // the range-shard two-pass decomposition is invisible to semantics
    val oneShard = Pipeline.tokenBudgetSample(d, budget = budget, shards = 1)
      .collect().map(_.toSeq).toSeq
    val manyShards = Pipeline.tokenBudgetSample(d, budget = budget, shards = 64)
      .collect().map(_.toSeq).toSeq
    assert(oneShard == manyShards)
  }

  test("tokenBudgetSample plan: one (source, shard) exchange feeds the local " +
    "window, the offsets aggregate, and the join — no second corpus pass") {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val d = docs((0L until 40L).map(i => (i, s"alpha beta gamma g$i")): _*)
      val q = Pipeline.tokenBudgetSample(d, budget = 10L, shards = 4)
      val plan = q.queryExecution.executedPlan.toString
      val partLines =
        plan.linesIterator.filter(_.contains("hashpartitioning")).toSeq
      assert(partLines.exists(l => l.contains("source") && l.contains("shard")),
        s"no (source, shard)-keyed exchange in:\n${partLines.mkString("\n")}")
      assert(plan.contains("ReusedExchange"),
        "offsets branch re-scans the corpus (no ReusedExchange):\n" +
          plan.linesIterator.filter(_.contains("Exchange")).mkString("\n"))
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("mixTemperature: √-weight allocation matches an exact BigInt brute " +
    "force, including perfect-square and off-by-one totals") {
    import spark.implicits._
    // per-source totals engineered around isqrt boundaries: 16 (exact
    // square), 17 (square+1), 24 (next square−1), 25, 99, 100
    val totals = Seq("a" -> 16, "b" -> 17, "c" -> 24, "d" -> 25,
      "e" -> 99, "f" -> 100)
    val rows = totals.zipWithIndex.map { case ((src, n), i) =>
      (i.toLong, ("tok " * n).trim, "en", src, 0L)
    }
    val d = rows.toDF("doc_id", "text", "lang", "source", "n_chars")
    val budget = 1000L
    def isqrt(n: Long): Long = {
      val c = math.sqrt(n.toDouble).toLong
      if ((c + 1) * (c + 1) <= n) c + 1 else if (c * c > n) c - 1 else c
    }
    val w = totals.map { case (s, n) => (s, n.toLong, isqrt(n.toLong)) }
    val wsum = w.map(_._3).sum
    val expected = w.map { case (s, n, wi) =>
      val alloc = (BigInt(wi) * budget / wsum).toLong
      (s, n, wi, wi * 10000L / wsum, alloc,
        (BigInt(alloc) * 1000000L / n).toLong)
    }.sortBy(_._1)
    val out = Pipeline.mixTemperature(d, budget = budget).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(out == expected, s"$out\nvs\n$expected")
    // floor allocation never over-commits the budget
    assert(out.map(_._5).sum <= budget)
    // √-temperature flattens the mix: the 100-token source gets ≤ 2.5×
    // the 16-token source's share (√ ratio), not the 6.25× raw ratio
    val shares = out.map(t => t._1 -> t._4).toMap
    assert(shares("f") * 2 <= shares("a") * 5,
      s"head share not flattened: ${shares}")
  }

  test("mixTemperature plan: the corpus collapses in ONE source-keyed " +
    "partial-agg exchange; the Σw window runs single-partition on the " +
    "|sources|-row table after it") {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val d = docs((0L until 40L).map(i => (i, s"alpha beta g$i")): _*)
      val q = Pipeline.mixTemperature(d, budget = 500L)
      q.collect()
      val plan = q.queryExecution.executedPlan.toString
      val hashEx =
        plan.linesIterator.filter(_.contains("hashpartitioning")).toSeq
      assert(hashEx.size == 1 && hashEx.head.contains("source"),
        s"expected exactly one source-keyed exchange:\n${hashEx.mkString("\n")}")
      assert(plan.contains("SinglePartition"),
        "Σw window should run on the post-agg tiny table via a " +
          s"SinglePartition exchange:\n$plan")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("weightedSample: matches an exact independent recomputation of the " +
    "Efraimidis–Spirakis integer keys — rank, counts and q6 averages") {
    val fixture = (0L until 24L).map { i =>
      // vary token count and vocabulary so q6 spreads across docs
      val words = (0 to (i % 7).toInt).map(j => s"w${(i + j) % 5}")
      (i, (words ++ words).mkString(" "))
    }
    val d = docs(fixture: _*)
    val k = 3
    val out = Pipeline.weightedSample(d, k).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))).toMap

    // independent recomputation, same integer arithmetic
    def h32(id: Long): Long = {
      val dg = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
      ((dg(0) & 0xffL) << 24) | ((dg(1) & 0xffL) << 16) |
        ((dg(2) & 0xffL) << 8) | (dg(3) & 0xffL)
    }
    val perDoc = fixture.map { case (id, text) =>
      val toks = text.toLowerCase.split("\\s+").filter(_.nonEmpty)
      val nToks = toks.length
      val nUniq = toks.distinct.length
      val tokChars = toks.map(_.length.toLong).sum
      val q6 = math.floor((
        0.4 * math.min(nToks / 100.0, 1.0) +
          0.3 * (nUniq.toDouble / nToks) +
          0.3 * math.min((tokChars.toDouble / nToks) / 8.0, 1.0)) * 1e6 + 0.5)
        .toLong
      val l6 = math.floor(-math.log((h32(id) + 0.5) / 4294967296.0) * 1e6 + 0.5)
        .toLong
      (s"src${id % 3}", id, nToks.toLong, q6, l6 * 1000000L / math.max(q6, 1L))
    }
    val expected = perDoc.groupBy(_._1).map { case (src, rows) =>
      val sample = rows.sortBy(r => (r._5, r._2)).take(k)
      src -> (rows.size.toLong, sample.size.toLong,
        sample.map(_._3).sum,
        sample.map(_._4).sum / sample.size,
        rows.map(_._4).sum / rows.size)
    }
    assert(out == expected, s"got $out\nexpected $expected")
    assertDeterministic(Pipeline.weightedSample(d, k))
  }

  test("weightedSample plan: the per-source selection is the bounded-heap " +
    "TopKPerKey operator, not a partition sort (hot-source safety)") {
    graft.plans.TopKInstall.install(spark)
    val d = docs((0L until 40L).map(i => (i, s"alpha beta gamma t$i")): _*)
    val q = Pipeline.weightedSample(d, 5)
    q.collect()
    assert(q.queryExecution.executedPlan.toString.contains("TopKPerKey"),
      q.queryExecution.executedPlan.toString.take(800))
  }

  test("kAnonymousMix: cells under k fold into ONE __suppressed__ row " +
    "with the pooled counts; released cells pass through untouched") {
    // source = 'src' + (doc_id % 3): src0 ← {0,3,6,9,12,15} (6 docs,
    // released at k=5); src1 ← {1,4} (2) and src2 ← {2,5,8} (3) both
    // fold → one suppressed row with 5 docs from 2 cells
    val d = docs(
      (0L, "aa"), (3L, "bb"), (6L, "cc"), (9L, "dd"), (12L, "ee"),
      (15L, "ff"),
      (1L, "gg"), (4L, "hh"),
      (2L, "ii"), (5L, "jj"), (8L, "kk"))
    val out = Pipeline.kAnonymousMix(d).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(out == Seq(
      ("__suppressed__", "__suppressed__", 5L, 10L, 2L),
      ("en", "src0", 6L, 12L, 1L)), out.toString)
    // every released row satisfies the k-anonymity contract
    assert(out.filter(_._1 != "__suppressed__").forall(_._3 >= 5L))
    assertDeterministic(Pipeline.kAnonymousMix(d))
  }

  test("mergeUpsert: tombstone wins over upsert, phantom tombstones " +
    "vanish, and deleted rows carry no content checksum") {
    // modulo-split roles: 1 kept; 3/6 updated (base ∧ upsert);
    // 30 inserted (%5 drops it from base, %3 upserts it); 7 deleted;
    // 21 deleted EVEN THOUGH upserted (tombstone precedence);
    // 35 phantom tombstone (in no snapshot) — must not appear at all
    val d = docs((1L, "one"), (3L, "three"), (6L, "six"), (30L, "thirty"),
      (7L, "seven"), (21L, "twenty one"), (35L, "thirty five"))
    val out = Pipeline.mergeUpsert(d).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(out.map(t => (t._1, t._2)) == Seq(
      ("deleted", 2L), ("inserted", 1L), ("kept", 1L), ("updated", 2L)),
      out.toString)
    val byAction = out.map(t => t._1 -> t._3).toMap
    assert(byAction("deleted") == 0L, "tombstoned rows must not hash")
    assert(byAction("kept") > 0L && byAction("updated") > 0L)
    assertDeterministic(Pipeline.mergeUpsert(d))
  }
}
