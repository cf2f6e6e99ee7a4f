package graft.operators

import graft.SparkSpec

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String, String, String)*) =
    rows.toSeq.toDF("doc_id", "text", "lang", "source")
      .selectExpr("doc_id", "text", "lang", "source",
        "CAST(length(text) AS BIGINT) AS n_chars")

  test("langId learns separable unigram profiles and classifies correctly") {
    // two 'languages' with disjoint vocabulary → perfect confusion diagonal
    val en = (1L to 5L).map(i => (i, "the quick brown fox jumps " * 3, "en", "s"))
    val de = (6L to 10L).map(i => (i, "der schnelle braune fuchs springt " * 3, "de", "s"))
    val out = TextAnalysis.langId(docs(en ++ de: _*)).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(out == Set(("en", "en", 5L), ("de", "de", 5L)))
  }

  test("langId smoothing floor: partial vocabulary overlap must not " +
    "invert the argmax (unseen words score ln(1/(tot+v)), not zero)") {
    // 'die' exists in BOTH languages; every en doc has 5 words of which
    // de knows exactly one. Without the unseen-word floor, de's score
    // for an en doc is ONE mildly negative term while en's sums five —
    // so de would win every en doc and the diagonal inverts.
    val en = (1L to 5L).map(i => (i, "the quick brown fox die " * 3, "en", "s"))
    val de = (6L to 10L).map(i => (i, "der hund will nicht die katze " * 3, "de", "s"))
    val out = TextAnalysis.langId(docs(en ++ de: _*)).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(out == Set(("en", "en", 5L), ("de", "de", 5L)), out.toString)
  }

  test("qualityScore is bounded in [0,1] and rewards longer diverse docs") {
    val d = docs(
      (1L, (1 to 120).map(i => s"w$i").mkString(" "), "en", "rich"),
      (2L, "a a a a", "en", "poor"))
    val out = TextAnalysis.qualityScore(d).collect()
      .map(r => r.getString(0) -> r.getAs[Double]("avg_quality")).toMap
    assert(out.values.forall(q => q >= 0.0 && q <= 1.0))
    assert(out("rich") > out("poor"))
  }

  test("lmScore: repetitive common-word docs score above the corpus mean, " +
    "rare-vocabulary docs below, and totals are exact") {
    // 8 docs of common shared vocabulary + 2 docs of words seen nowhere
    // else: the rare docs' tokens have near-minimum P(w), so their mean
    // log-likelihood must sit below the corpus mean (n_below flags them)
    val common = (1L to 8L).map(i =>
      (i, "the cat sat on the mat and the dog sat too", "en", "common"))
    val rare = Seq(
      (9L, "zyxqv wqjkx mbfpz qqvnz lpwxk", "en", "rare"),
      (10L, "aardvark quixotic zephyr bumblebee catastrophe", "en", "rare"))
    val out = TextAnalysis.lmScore(docs(common ++ rare: _*)).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out.keySet == Set("common", "rare"))
    val c = out("common")
    assert(c.getAs[Long]("docs") == 8L)
    assert(c.getAs[Long]("total_tokens") == 8L * 11L)
    val r = out("rare")
    assert(r.getAs[Long]("docs") == 2L && r.getAs[Long]("total_tokens") == 10L)
    // the rare source scores strictly worse and is entirely below mean
    assert(r.getAs[Double]("avg_ll") < c.getAs[Double]("avg_ll"))
    assert(r.getAs[Long]("n_below") == 2L)
    assert(c.getAs[Long]("n_below") == 0L)
    assertDeterministic(TextAnalysis.lmScore(docs(common ++ rare: _*)))
  }

  test("lmScore: token-less docs (empty/whitespace text) are excluded " +
    "from the scored population, not scored as zero") {
    val d = docs(
      (1L, "alpha beta gamma delta", "en", "a"),
      (2L, "", "en", "a"),
      (3L, "   ", "en", "a"))
    val out = TextAnalysis.lmScore(d).collect()
    assert(out.length == 1)
    // only doc 1 has tokens: docs counts the scored population
    assert(out.head.getAs[Long]("docs") == 1L)
    assert(out.head.getAs[Long]("total_tokens") == 4L)
  }

  test("lmScore broadcast guard: join fallback equals the broadcast path") {
    val d = docs(
      (1L, "alpha beta gamma delta", "en", "a"),
      (2L, "alpha beta epsilon zeta", "en", "b"),
      (3L, "eta theta iota kappa", "en", "c"))
    val bcast = TextAnalysis.lmScore(d, broadcastProfile = true)
    val join = TextAnalysis.lmScore(d, broadcastProfile = false)
    assert(rows(bcast) == rows(join))
  }

  test("tokenCounts: whitespace vs BPE-ish segmentation counts") {
    val d = docs((1L, "hello world42 foo-bar", "en", "s"))
    val r = TextAnalysis.tokenCounts(d).collect().head
    assert(r.getAs[Long]("ws_tokens") == 3L)
    // [a-z]+ runs: hello,world,foo,bar; digits: 4,2; symbol: -  → 7
    assert(r.getAs[Long]("bpe_tokens") == 7L)
  }

  test("boilerplate: docs sharing windows are flagged, unique docs are " +
    "not, short docs count with zero windows") {
    // docs 1 and 2 share their full text → every window shared in both;
    // doc 3 is unique; doc 4 is too short to window (< 32 chars)
    val shared = "this is the exact same boilerplate footer text repeated " * 2
    val d = docs(
      (1L, shared, "en", "a"),
      (2L, shared, "en", "a"),
      (3L, "completely unique document content with its own words here", "en", "b"),
      (4L, "too short", "en", "b"))
    val out = TextAnalysis.boilerplate(d).collect()
      .map(r => r.getString(0) -> r).toMap
    val a = out("a")
    assert(a.getAs[Long]("docs") == 2L)
    assert(a.getAs[Long]("total_windows") > 0L)
    // identical docs: every window appears in both → all shared, both flagged
    assert(a.getAs[Long]("shared_windows") == a.getAs[Long]("total_windows"))
    assert(a.getAs[Long]("n_flagged") == 2L)
    val b = out("b")
    assert(b.getAs[Long]("docs") == 2L)
    assert(b.getAs[Long]("shared_windows") == 0L && b.getAs[Long]("n_flagged") == 0L)
    assert(b.getAs[Long]("total_windows") > 0L, "unique doc still windows")
    assertDeterministic(TextAnalysis.boilerplate(d))
  }

  test("boilerplate plan: the window stream shuffles ONCE — the doc-count " +
    "aggregate and the join reuse the same h-keyed exchange") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("graft_boiler").toString
    docs((0L until 60L).map(i =>
      (i, s"document number $i with plenty of distinctive content words " +
        s"making windows w$i x$i y$i z$i", "en", s"s${i % 3}")): _*)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val d = spark.read.parquet(s"$dir/documents.parquet")
    val q = TextAnalysis.boilerplate(d)
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(plan.contains("ReusedExchange"),
      "doc-count branch re-derives the window stream (no ReusedExchange):\n" +
        plan.linesIterator.filter(_.contains("Exchange")).mkString("\n"))
    // the corpus parquet is scanned at most twice: once for windows, once
    // for the final source attach (payload-free doc_id/source projection)
    val scans = plan.linesIterator.filter(_.contains("Scan parquet"))
      .map(l => l.substring(l.indexOf("FileScan"))).toSet
    assert(scans.size <= 2, s"expected ≤2 distinct scans:\n${scans.mkString("\n")}")
  }

  test("bpePairs counts weighted adjacent character pairs with a " +
    "deterministic top-k") {
    // "abab" x3 occurrences: pairs ab(x2),ba(x1) per occurrence
    // "abc" x2: ab, bc per occurrence; single-char words contribute nothing
    val d = docs(
      (1L, "abab abab abc", "en", "s"),
      (2L, "abab abc x", "en", "s"))
    val out = TextAnalysis.bpePairs(d, k = 10).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // ab: 3 occurrences of "abab" x 2 + 2 of "abc" x 1 = 8
    assert(out("ab") == 8L)
    assert(out("ba") == 3L)
    assert(out("bc") == 2L)
    assert(!out.contains("x"))
    // top-1 is the first BPE merge
    val top = TextAnalysis.bpePairs(d, k = 1).collect().head
    assert(top.getString(0) == "ab" && top.getLong(1) == 8L)
    // the top-k plans as TakeOrderedAndProject, never a global sort
    val q = TextAnalysis.bpePairs(d, k = 5)
    q.collect()
    assert(q.queryExecution.executedPlan.toString.contains("TakeOrderedAndProject"),
      q.queryExecution.executedPlan.toString.take(600))
  }

  test("fingerprint is identical for identical docs, differs for different") {
    val t1 = "abcdefghij " * 10
    val d = docs((1L, t1, "en", "s"), (2L, t1, "en", "s"),
      (3L, "zyxwvutsrq " * 10, "en", "s"))
    val out = TextAnalysis.fingerprint(d).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out(1L) == out(2L))
    assert(out(1L) != out(3L))
  }

  test("fingerprint windows index by codepoints — matches the SQL form " +
    "on non-BMP text (surrogate pairs)") {
    import org.apache.spark.sql.functions._
    // 😀 is U+1F600: 1 codepoint, 2 UTF-16 units — UTF-16 indexing would
    // shift every window after it and change the window count
    val d = docs(
      (1L, ("ab😀cdefgh " * 8).trim, "en", "s"),
      (2L, "😀" * 40, "en", "s"))
    val udfOut = TextAnalysis.fingerprint(d).collect().map(_.toSeq).toSeq
    val sqlOut = d
      .select(col("doc_id"),
        trim(regexp_replace(lower(col("text")), "\\s+", " ")).as("norm"))
      .filter(length(col("norm")) >= 32)
      .selectExpr("doc_id",
        """array_sort(transform(
          |  sequence(0, CAST(floor((length(norm) - 32) / 8) AS INT)),
          |  i -> CAST(conv(substr(md5(substr(norm, i*8 + 1, 32)), 1, 8), 16, 10) AS BIGINT))) AS hs"""
          .stripMargin)
      .selectExpr("doc_id", "hs[0] AS fp_min",
        "CASE WHEN size(hs) > 1 THEN hs[1] ELSE hs[0] END AS fp_min2",
        "size(hs) AS n_windows")
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(udfOut == sqlOut)
  }

  test("tfidfTerms ranks by tf·N/df with exact integers: source-exclusive " +
    "repeated terms beat corpus-wide stopwords; double-ties break by word") {
    val d = docs(
      (1L, "zebra zebra zebra the the", "en", "a"),
      (2L, "zebra the yak", "en", "a"),
      (3L, "the quokka quokka", "en", "b"),
      (4L, "the yak", "en", "b"))
    // N=4. a: zebra tf=4 df=2 → 8.0; the tf=3 df=4 → 3.0; yak 1·4/2 → 2.0
    //      b: quokka tf=2 df=1 → 8.0; the tf=2 df=4 → 2.0 ties yak
    //      1·4/2 → 2.0, 'the' < 'yak' wins rank 2
    val out = TextAnalysis.tfidfTerms(d, k = 2).collect()
      .map(r => (r.getString(0), r.getInt(1)) ->
        ((r.getString(2), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    assert(out(("a", 1)) == (("zebra", 4L, 2L, 8.0)), out.toString)
    assert(out(("a", 2)) == (("the", 3L, 4L, 3.0)), out.toString)
    assert(out(("b", 1)) == (("quokka", 2L, 1L, 8.0)), out.toString)
    assert(out(("b", 2)) == (("the", 2L, 4L, 2.0)), out.toString)
    assert(out.size == 4)
  }

  test("tfidfTerms: the join fallback matches the broadcast path, and an " +
    "over-bound df table raises loudly instead of broadcasting") {
    val d = docs((1L to 6L).map(i =>
      (i, s"alpha beta gamma delta w$i w$i", "en", s"s${i % 2}")): _*)
    val bc = TextAnalysis.tfidfTerms(d, k = 3).collect().map(_.toSeq).toSeq
    val jn = TextAnalysis.tfidfTerms(d, k = 3, broadcastDf = false)
      .collect().map(_.toSeq).toSeq
    assert(bc == jn)
    val e = intercept[Exception] {
      TextAnalysis.tfidfTerms(d, k = 1, maxDfRows = 2L).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: messages(x.getCause))
    assert(messages(e).exists(m => m != null && m.contains("broadcastDf = false")),
      e.toString)
  }

  test("difficultyBins: by-value quantile bins — equal scores share a bin, " +
    "ids live in [0, B), mass is conserved, ranges are disjoint and ordered") {
    // four exact quality levels (identical texts tie bit-for-bit):
    // ascending q6 with 3, 4, 2, 1 docs → cum-below ranks 0, 3, 7, 9
    // → B=5 bins 0, 1, 3, 4
    val texts =
      Seq.fill(4)("a b") ++ Seq.fill(3)("c c c c") ++
        Seq.fill(2)((1 to 50).map(i => s"w$i").mkString(" ")) :+
        (1 to 120).map(i => s"x$i").mkString(" ")
    val d = docs(texts.zipWithIndex.map {
      case (t, i) => (i.toLong, t, "en", "s") }: _*)
    val out = TextAnalysis.difficultyBins(d, bins = 5).collect()
    val byBin = out.map(r => r.getAs[Int]("bin") -> r.getAs[Long]("docs")).toMap
    assert(byBin == Map(0 -> 3L, 1 -> 4L, 3 -> 2L, 4 -> 1L), byBin.toString)
    assert(out.map(_.getAs[Long]("docs")).sum == 10L)
    val sorted = out.sortBy(_.getAs[Int]("bin"))
    val ranges = sorted.map(r =>
      (r.getAs[Double]("min_quality"), r.getAs[Double]("max_quality")))
    assert(ranges.forall { case (lo, hi) => lo <= hi && lo >= 0.0 && hi <= 1.0 })
    assert(ranges.sliding(2).forall {
      case Array((_, h1), (l2, _)) => h1 < l2
      case _ => true
    }, ranges.mkString(", "))
  }

  test("qualityOutliers: matches an independent median/MAD recomputation — " +
    "interpolated medians in doubled units, 3-MAD flags, MAD=0 edge") {
    // srcA: 9 docs (odd n) of spread-out quality; srcB: 6 docs, five
    // identical (MAD collapses to 0) plus one different → every nonzero
    // deviation flags
    val fixture =
      (0L until 9L).map(i =>
        (i, ((0 to (i % 5).toInt).map(j => s"w$j") ++ Seq.fill(i.toInt)("w0"))
          .mkString(" "), "en", "srcA")) ++
        (10L until 15L).map(i => (i, "same same same", "en", "srcB")) :+
        ((15L, "completely different varied words here", "en", "srcB"))
    val out = TextAnalysis.qualityOutliers(docs(fixture: _*)).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))).toMap

    def q6Of(text: String): Long = {
      val toks = text.toLowerCase.split("\\s+").filter(_.nonEmpty)
      val n = toks.length
      val u = toks.distinct.length
      val c = toks.map(_.length.toLong).sum
      math.floor((0.4 * math.min(n / 100.0, 1.0) + 0.3 * (u.toDouble / n) +
        0.3 * math.min((c.toDouble / n) / 8.0, 1.0)) * 1e6 + 0.5).toLong
    }
    def med2(vs: Seq[Long]): Long = {
      val s = vs.sorted
      val n = s.length
      s((n + 1) / 2 - 1) + s(n / 2) // the two middle order statistics
    }
    val expected = fixture.groupBy(_._4).map { case (src, rows) =>
      val q6s = rows.map(r => q6Of(r._2))
      val m2 = med2(q6s)
      val dev2 = q6s.map(q => math.abs(2 * q - m2))
      val m4 = med2(dev2)
      val nOut = dev2.count(d => 2 * d > 3 * m4).toLong
      src -> ((q6s.size.toLong, m2, m4, nOut, nOut * 1000 / q6s.size))
    }
    assert(out == expected, s"got $out\nexpected $expected")
    assert(out("srcB")._3 == 0L, "five identical docs must give MAD 0")
    assert(out("srcB")._4 == 1L, "the one different doc must flag under MAD 0")
    assertDeterministic(TextAnalysis.qualityOutliers(docs(fixture: _*)))
  }

  test("lengthProfile: hand-computed rank-based percentiles — value at " +
    "rank ceil(f*n), ties collapse into one histogram row, max exact") {
    // srcA: token counts 1..10 (n=10): p50 = rank 5 → 5, p90 = rank 9
    // → 9, p99 = rank 10 → 10. srcB: counts {2,2,2,7} (n=4, tie-heavy):
    // p50 = rank 2 → 2, p90 = rank 4 → 7, p99 = rank 4 → 7.
    def doc(id: Long, nToks: Int, src: String) =
      (id, (1 to nToks).map(j => s"t$j").mkString(" "), "en", src)
    val fixture = (1 to 10).map(i => doc(i, i, "srcA")) ++
      Seq(doc(21, 2, "srcB"), doc(22, 2, "srcB"), doc(23, 2, "srcB"),
        doc(24, 7, "srcB"))
    val out = TextAnalysis.lengthProfile(docs(fixture: _*)).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))).toMap
    assert(out == Map(
      "srcA" -> ((10L, 5L, 9L, 10L, 10L)),
      "srcB" -> ((4L, 2L, 7L, 7L, 7L))), s"got $out")
    assertDeterministic(TextAnalysis.lengthProfile(docs(fixture: _*)))
  }

  test("qualityOutliers plan: the corpus crosses ONE (source, q6) histogram " +
    "exchange, reused by the deviation branch; median sides broadcast") {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val d = docs((0L until 40L).map(i =>
        (i, s"alpha beta gamma delta w$i " * ((i % 4) + 1).toInt, "en",
          s"s${i % 3}")): _*)
      val q = TextAnalysis.qualityOutliers(d)
      q.collect()
      val plan = q.queryExecution.executedPlan.toString
      val q6Ex = plan.linesIterator.filter(l =>
        l.contains("Exchange hashpartitioning") && l.contains("q6") &&
          !l.contains("ReusedExchange")).size
      assert(q6Ex == 1,
        s"expected ONE (source, q6) exchange, got $q6Ex:\n" +
          plan.linesIterator.filter(_.contains("Exchange")).mkString("\n"))
      assert(plan.contains("ReusedExchange"),
        "deviation branch must reuse the histogram exchange:\n" + plan)
      assert(plan.contains("BroadcastExchange"),
        "median/MAD sides must broadcast:\n" + plan)
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("docRarity: rare-vocabulary docs outrank common-vocabulary ones; " +
    "integer mean-idf hand-checked; join fallback identical") {
    // 4 docs: 'common' appears in all (df=4, idf6 = 4e6 DIV 4 = 1e6);
    // 'rare' only in doc 4 (df=1, idf6 = 4e6). doc 4 = {common, rare}
    // → rarity6 = (1e6 + 4e6) DIV 2 = 2_500_000; docs 1–3 = {common}
    // → rarity6 = 1e6. doc 4 must rank 1.
    val d = docs(
      (1L, "common", "en", "s"),
      (2L, "common", "en", "s"),
      (3L, "common", "en", "s"),
      (4L, "common rare", "en", "s"))
    val out = TextAnalysis.docRarity(d).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(out == Seq(
      ("s", 1, 4L, 2500000L, 2L),
      ("s", 2, 1L, 1000000L, 1L),
      ("s", 3, 2L, 1000000L, 1L),
      ("s", 4, 3L, 1000000L, 1L)), out.toString)
    val jn = TextAnalysis.docRarity(d, broadcastDf = false).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(jn == out)
    assertDeterministic(TextAnalysis.docRarity(d))
  }

  test("collocations: discounted Dice hand-checked; adjacency only (no " +
    "skip-grams); minCount prunes; join fallback identical") {
    // 5 docs 'new york city': c(new,york)=c(york,city)=5, unigrams all 5
    //   → dice6 = (5-3)·2·10⁶ DIV 10 = 400000 for both, tie-break w1.
    // 2 docs 'a b a b': (a,b)=4, (b,a)=2 (pruned by minCount=4);
    //   c(a)=c(b)=4 → dice6(a,b) = (4-3)·2·10⁶ DIV 8 = 250000.
    // 'new city' never adjacent → absent even though both words frequent.
    val d = docs(
      (1L, "new york city", "en", "s"), (2L, "new york city", "en", "s"),
      (3L, "new york city", "en", "s"), (4L, "new york city", "en", "s"),
      (5L, "new york city", "en", "s"),
      (6L, "a b a b", "en", "s"), (7L, "a b a b", "en", "s"))
    val out = TextAnalysis.collocations(d).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(out == Seq(
      ("new", "york", 5L, 5L, 5L, 400000L),
      ("york", "city", 5L, 5L, 5L, 400000L),
      ("a", "b", 4L, 4L, 4L, 250000L)), out.toString)
    val jn = TextAnalysis.collocations(d, broadcastUni = false).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(jn == out)
    assertDeterministic(TextAnalysis.collocations(d))
  }

  test("vocabGrowth: cumulative columns end at the global totals, are " +
    "monotone, and a term repeating across buckets is counted ONCE") {
    // 40 docs over a 3-word vocabulary + per-doc unique words: repeats
    // land in many md5 buckets, unique words in exactly one
    val d = docs((1L to 40L).map(i =>
      (i, s"alpha beta gamma unique$i", "en", "s")): _*)
    val out = TextAnalysis.vocabGrowth(d, buckets = 8).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSeq
    assert(out.map(_._1) == (0L to 7L), "one row per bucket, ordered")
    // final cumulatives == global truths
    assert(out.last._3 == 43L, s"cum_vocab: ${out.last}")     // 3 + 40
    assert(out.last._7 == 160L, s"cum_tokens: ${out.last}")   // 40 · 4
    // bigram vocab: 'alpha beta','beta gamma' shared + 40 'gamma uniqueN'
    assert(out.last._5 == 42L, s"cum_bigram_vocab: ${out.last}")
    // monotone cumsums that really are the running sums of the per-bucket
    // columns
    assert(out.map(_._2).sum == 43L)
    assert(out.map(_._4).sum == 42L)
    assert(out.map(_._6).sum == 160L)
    out.foldLeft((0L, 0L, 0L)) { case ((cv, cb, ct), r) =>
      assert(r._3 == cv + r._2 && r._5 == cb + r._4 && r._7 == ct + r._6,
        s"cumsum mismatch at bucket ${r._1}")
      (r._3, r._5, r._7)
    }
    assertDeterministic(TextAnalysis.vocabGrowth(d, buckets = 8))
  }

  test("scoreCalibration: exact lower-ECDF per source in per-mille; " +
    "each source starts at 0 and counts sum to n_docs") {
    // s1: 4 docs of strictly increasing token count → 4 distinct q6 →
    // pct_pm 0, 250, 500, 750. s2: 2 identical docs → ONE row, pct 0.
    val d = docs(
      (1L, "w1", "en", "s1"),
      (2L, "w1 w2", "en", "s1"),
      (3L, "w1 w2 w3", "en", "s1"),
      (4L, "w1 w2 w3 w4", "en", "s1"),
      (5L, "same text", "en", "s2"),
      (6L, "same text", "en", "s2"))
    val out = TextAnalysis.scoreCalibration(d).collect()
      .map(r => (r.getString(0), r.getLong(2), r.getLong(3), r.getLong(4)))
    val s1 = out.filter(_._1 == "s1")
    assert(s1.map(_._4).toSeq == Seq(0L, 250L, 500L, 750L), s1.toSeq.toString)
    assert(s1.forall(r => r._2 == 1L && r._3 == 4L))
    val s2 = out.filter(_._1 == "s2")
    assert(s2.toSeq == Seq(("s2", 2L, 2L, 0L)), s2.toSeq.toString)
    assertDeterministic(TextAnalysis.scoreCalibration(d))
  }

  test("tokenWeightedLengthProfile: the median TOKEN lives in the long " +
    "doc even when most DOCS are short (the q97 contrast)") {
    // lengths [1, 1, 8]: T = 10 tokens. Doc-count median (q97) = 1;
    // token-weighted thresholds ⌈p·10/100⌉ = 5/9/10 all land inside the
    // 8-token doc's mass (below = 2 < 5,9,10 ≤ 10) → all picks = 8.
    val d = docs(
      (1L, "a", "en", "s"),
      (2L, "b", "en", "s"),
      (3L, "c d e f g h i j", "en", "s"))
    val out = TextAnalysis.tokenWeightedLengthProfile(d).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(out == Seq(("s", 3L, 10L, 8L, 8L, 8L)), out.toString)
    val dc = TextAnalysis.lengthProfile(d).collect()
    assert(dc.head.getAs[Long]("p50_toks") == 1L, "doc-count median must differ")
    assertDeterministic(TextAnalysis.tokenWeightedLengthProfile(d))
  }

  test("heavyHitters: exact guaranteed-support result independent of " +
    "partitioning, with a vocabulary 8x the Misra-Gries counter budget") {
    // 3 heavy words (300/200/100 occurrences) buried under 400 singleton
    // words: |V| = 403 >> k = 50 counters, so the candidate pass MUST
    // evict constantly — the weighted-MG survival guarantee (cnt >
    // W_p/(k+1) survives partition p) is what keeps the result exact.
    val heavy = (1L to 10L).map(i =>
      (i, ("alpha " * 30 + "beta " * 20 + "gamma " * 10).trim, "en", "s"))
    val filler = (0 until 400).map(i => s"rare$i").grouped(20).zipWithIndex
      .map { case (ws, i) => ((100 + i).toLong, ws.mkString(" "), "en", "s") }
      .toSeq
    val d = docs(heavy ++ filler: _*)
    // total = 10·60 + 400 = 1000; support 1/50 → cnt > 20 keeps exactly
    // the three heavy words; every rare word (cnt 1) is scrubbed even
    // when it sneaks into some partition's candidate set
    val expected = Set(("alpha", 300L, 1000L), ("beta", 200L, 1000L),
      ("gamma", 100L, 1000L))
    def run(df: org.apache.spark.sql.DataFrame) =
      TextAnalysis.heavyHitters(df, k = 50).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(run(d) == expected, run(d).toString)
    // the candidate SET varies with partitioning; the result must not
    assert(run(d.repartition(1)) == expected)
    assert(run(d.repartition(7)) == expected)
  }

  test("stopwordDrift: a gibberish source reads 0 permille coverage of " +
    "the corpus-global stopword set; prose reads its exact share") {
    val prose = (1L to 5L).map(i =>
      (i, "the cat the dog the bird", "en", "prose"))
    val code = (10L to 13L).map(i =>
      (i, s"xq${i}a zz${i}b vv${i}c ww${i}d kk${i}e", "en", "code"))
    val d = docs(prose ++ code: _*)
    // N = 30 + 20 = 50; k = 5 → stopwords are cnt > 10: only 'the' (15)
    val out = TextAnalysis.stopwordDrift(d, k = 5).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(out == Seq(
      ("code", 20L, 0L, 0L),
      ("prose", 30L, 15L, 500L)), out.toString)
    assertDeterministic(TextAnalysis.stopwordDrift(d, k = 5))
  }

  test("dataMap: the quality marginal recovers difficultyBins exactly " +
    "and the cells partition the corpus") {
    val d = docs((1L to 12L).map { i =>
      val words = (1 to (i * 7 % 11 + 2).toInt)
        .map(j => if (j % 3 == 0) "the" else s"w${(i * j) % 9}")
      (i, words.mkString(" "), "en", "s")
    }: _*)
    val map = TextAnalysis.dataMap(d, bins = 4).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    assert(map.map(_._3).sum == 12L, map.mkString(","))
    val expectedMarginal = TextAnalysis.difficultyBins(d, bins = 4).collect()
      .map(r => (r.getInt(0), r.getLong(1))).toMap
    val marginal = map.groupBy(_._1).map { case (b, cells) =>
      b -> cells.map(_._3).sum }
    assert(marginal == expectedMarginal,
      s"2-D map must refine q84's bins: $marginal vs $expectedMarginal")
    assertDeterministic(TextAnalysis.dataMap(d, bins = 4))
  }

  test("lexicalDiversity: a repeated template reads low TTR and zero " +
    "hapax; all-unique junk reads 1000 permille of both") {
    val template = (1L to 4L).map(i =>
      (i, "click here to subscribe now", "en", "tpl"))
    val junk = Seq((10L, "qxv1 wkz2 bbn3 ppo4 rrt5", "en", "junk"))
    val out = TextAnalysis.lexicalDiversity(docs(template ++ junk: _*))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    // tpl: 20 tokens, 5 types (each seen 4x, no hapax) → TTR 250‰, hapax 0
    // junk: 5 tokens, 5 types, all hapax → TTR 1000‰, hapax 1000‰
    assert(out == Seq(
      ("junk", 5L, 5L, 5L, 1000L, 1000L),
      ("tpl", 20L, 5L, 0L, 250L, 0L)), out.toString)
    assertDeterministic(TextAnalysis.lexicalDiversity(
      docs(template ++ junk: _*)))
  }
}
