package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode

/** Plan-shape regression tests: the properties that matter at 100 TB —
  * broadcast strategy, scan pruning, filter pushdown, map-side partial
  * aggregation, top-k without a global sort, whole-stage codegen. These
  * assert the OPTIMIZED plan, so a refactor that silently turns a
  * broadcast join into a shuffle join or breaks pushdown fails CI. */
class PlanSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def formatted(df: DataFrame): String =
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))

  test("q04: dimension join is a BroadcastHashJoin (fact side never shuffles)") {
    val p = formatted(SparkEntry.queries("q04_join_broadcast")(spark, sf))
    assert(p.contains("BroadcastHashJoin"), p.take(800))
    assert(!p.contains("SortMergeJoin"), "fact-dim join must not sort-merge")
  }

  test("q05: star join broadcasts all three dimensions") {
    val p = formatted(SparkEntry.queries("q05_join_star")(spark, sf))
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 3, p.take(800))
  }

  test("q01: parquet scan prunes to exactly the referenced columns") {
    val p = formatted(SparkEntry.queries("q01_impact_agg")(spark, sf))
    val read = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(read.contains("l_returnflag") && read.contains("l_extendedprice"), read)
    assert(!read.contains("l_comment") && !read.contains("l_shipdate"),
      s"scan reads unneeded columns: $read")
  }

  test("q06: the totalprice predicate pushes down to the parquet scan") {
    val p = formatted(SparkEntry.queries("q06_semi_join")(spark, sf))
    assert(p.contains("PushedFilters: [IsNotNull(o_totalprice), GreaterThan(o_totalprice,"),
      p.linesIterator.filter(_.contains("PushedFilters")).mkString("\n"))
  }

  test("q02: wordcount aggregates map-side before the shuffle (partial+final)") {
    val p = formatted(SparkEntry.queries("q02_wordcount")(spark, sf))
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      "expected partial+final HashAggregate pair")
  }

  test("q17: global top-k plans TakeOrderedAndProject, not a full sort") {
    val p = formatted(SparkEntry.queries("q17_topk")(spark, sf))
    assert(p.contains("TakeOrderedAndProject"), p.take(800))
  }

  test("q01: hot path runs inside whole-stage codegen") {
    val df = SparkEntry.queries("q01_impact_agg")(spark, sf)
    val p = df.queryExecution.explainString(ExplainMode.fromString("codegen"))
    assert(p.contains("WholeStageCodegen"), p.take(400))
  }

  test("q25: dedup scans prune documents to (doc_id, text) — no payload columns") {
    val p = formatted(SparkEntry.queries("q25_dedup_minhash")(spark, sf))
    val reads = p.linesIterator.filter(_.contains("ReadSchema")).toSeq
    assert(reads.nonEmpty)
    assert(reads.forall(r => !r.contains("lang") && !r.contains("source")),
      s"dedup must not read unused document columns: $reads")
  }

  test("q09: row_number<=k window rewrites to the bounded-heap TopKPerKey " +
    "operator — no sort anywhere in the plan") {
    val df = SparkEntry.queries("q09_window_topk")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("TopKPerKey"), p.take(600))
    assert(!p.contains("WindowGroupLimit") && !p.toLowerCase.contains("sort ["),
      "heap operator must replace both the window sort and WindowGroupLimit:\n" +
        p.take(800))
  }

  test("q28: cosineNearDup builds lazily — no driver-side collect of the " +
    "table (zero Spark jobs at construction) and a real join in the plan") {
    val sc = spark.sparkContext
    // spark.read.parquet legitimately runs a schema-inference job; the
    // regression we guard against is a materializing job (collect/count)
    // of the TABLE during operator construction — identify by call site.
    val bad = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        val names = js.stageInfos.map(_.name)
        if (!names.forall(_.startsWith("parquet at"))) {
          bad.add(names.mkString(",")); ()
        }
      }
    }
    sc.addSparkListener(listener)
    try {
      val df = SparkEntry.queries("q28_emb_neardup")(spark, sf)
      val p = formatted(df) // planning must not run jobs either
      // deterministically drain async listener delivery (a fixed sleep can
      // flaky-PASS on a loaded box by missing a late-posted job event)
      org.apache.spark.graft.ListenerDrain.drain(sc)
      assert(bad.isEmpty,
        s"operator construction ran materializing Spark jobs: $bad")
      assert(p.contains("Join"), p.take(800))
    } finally sc.removeSparkListener(listener)
  }

  test("q31: the doc-word ⋈ profile join broadcasts the profile side " +
    "(stopword skew must not shuffle the token stream by word)") {
    val df = SparkEntry.queries("q31_langid")(spark, sf)
    df.collect() // finalize the adaptive plan
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), p.take(1200))
  }

  test("q31: no exchange is hash-partitioned on the raw token column — " +
    "every token-keyed shuffle sits above a map-side partial aggregate") {
    import org.apache.spark.sql.catalyst.plans.physical.HashPartitioning
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    // AQE wraps the whole query in one AdaptiveSparkPlanExec leaf; turn it
    // off while planning so the tree exposes plain ShuffleExchangeExec nodes
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    // (sparkPlan is pre-EnsureRequirements and has no exchanges yet)
    val plan =
      try SparkEntry.queries("q31_langid")(spark, sf).queryExecution.executedPlan
      finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    val shuffles = plan.collect { case e: ShuffleExchangeExec => e }
    assert(shuffles.nonEmpty, "expected at least one shuffle in langId")
    val offenders = shuffles.filter { e =>
      val tokenOnly = e.outputPartitioning match {
        case h: HashPartitioning =>
          val refs = h.expressions.flatMap(_.references.toSeq).map(_.name).toSet
          refs == Set("w")
        case _ => false
      }
      // zipfian keys are fine once partial aggregation has collapsed the
      // stream (≤ #partitions rows per key cross the wire); the regression
      // is a token-keyed exchange fed by raw occurrences (the old
      // repartition(col("w")) barrier)
      tokenOnly && !e.child.exists(_.isInstanceOf[BaseAggregateExec])
    }
    assert(offenders.isEmpty,
      "raw token stream shuffled on the token key:\n" +
        offenders.map(_.treeString).mkString("\n"))
  }

  test("q68: lmScore inherits langId's shape — profile broadcast, and no " +
    "exchange keyed by the raw token column below a partial aggregate") {
    import org.apache.spark.sql.catalyst.plans.physical.HashPartitioning
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val df = SparkEntry.queries("q68_lm_score")(spark, sf)
    df.collect()
    assert(df.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"),
      df.queryExecution.executedPlan.toString.take(1200))
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val plan =
      try SparkEntry.queries("q68_lm_score")(spark, sf).queryExecution.executedPlan
      finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    val offenders = plan.collect { case e: ShuffleExchangeExec => e }.filter { e =>
      val tokenOnly = e.outputPartitioning match {
        case h: HashPartitioning =>
          h.expressions.flatMap(_.references.toSeq).map(_.name).toSet == Set("w")
        case _ => false
      }
      tokenOnly && !e.child.exists(_.isInstanceOf[BaseAggregateExec])
    }
    assert(offenders.isEmpty,
      "raw token stream shuffled on the token key:\n" +
        offenders.map(_.treeString).mkString("\n"))
  }

  test("q31/q68 share the session-memoized (doc, word) collapse: the " +
    "second consumer reads the cached stage instead of re-scanning the " +
    "corpus, and the stage build collapses tokens with NO repartition") {
    // stage-build shape, on a FRESH memo entry (unique filter → unique
    // semantic hash): the memoized stage comes back as an
    // InMemoryRelation whose cachedPlan is the build — it must collapse
    // tokens with a PARTIAL aggregate before its exchange, and no
    // exchange may be keyed by the token column alone (the historical
    // regression was a repartition(col("w")) barrier that shuffled raw
    // zipfian occurrences)
    val fresh = graft.Tables.documents(spark, sf)
      .filter(org.apache.spark.sql.functions.col("doc_id") >= -987654L)
    val stage = graft.operators.TextAnalysis.docWordsShared(fresh)
    val imrs = stage.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.columnar.InMemoryRelation => r
    }
    assert(imrs.nonEmpty, "stage must be session-cached:\n" +
      stage.queryExecution.optimizedPlan.treeString.take(1500))
    val cp = imrs.head.cachedPlan.toString
    assert(cp.contains("partial_count"), cp.take(1500))
    assert(!cp.linesIterator.exists(_.contains("hashpartitioning(w#")),
      "raw token stream shuffled on the token key:\n" + cp.take(1500))
    // memo reuse: run q31, then q68 — q68's executed plan must read the
    // cached stage (InMemoryTableScan / a cache query stage under AQE),
    // i.e. the corpus is tokenized once per session for the whole tier
    SparkEntry.queries("q31_langid")(spark, sf).collect()
    val df = SparkEntry.queries("q68_lm_score")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("InMemoryTableScan") || p.contains("TableCacheQueryStage"),
      p.take(1500))
  }

  test("q51: repetition stats never shuffle a doc-word stream — the only " +
    "exchange is the final presentation sort") {
    val p = formatted(SparkEntry.queries("q51_repetition")(spark, sf))
    assert(!p.contains("hashpartitioning"),
      "row-local ppm stats must not hash-shuffle:\n" +
        p.linesIterator.filter(_.contains("Exchange")).mkString("\n"))
  }

  test("q53: the benchmark shingle array broadcasts — the corpus side " +
    "never shuffles for the overlap join") {
    val df = SparkEntry.queries("q53_contamination")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      p.take(1200))
  }

  test("q26: banded self-join avoids a two-sided shuffle join (broadcast " +
    "at small scale, exchange reuse at large)") {
    val df = SparkEntry.queries("q26_dedup_simhash")(spark, sf)
    df.collect() // finalize the adaptive plan
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin") || p.contains("ReusedExchange"),
      "self-join must broadcast the banded side or reuse its exchange:\n" + p.take(1200))
  }

  /** Every HASH-keyed exchange in the plan sits above a partial
    * aggregate — i.e. raw exploded rows (spans, grams) never cross the
    * wire keyed. Range (presentation sort) and round-robin (the
    * fixture-only Widen split) exchanges are out of scope. */
  private def assertAllShufflesAboveAggregates(query: String): Unit = {
    import org.apache.spark.sql.catalyst.plans.physical.HashPartitioning
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val plan =
      try SparkEntry.queries(query)(spark, sf).queryExecution.executedPlan
      finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    val shuffles = plan.collect { case e: ShuffleExchangeExec => e }
      .filter(_.outputPartitioning.isInstanceOf[HashPartitioning])
    assert(shuffles.nonEmpty, s"expected at least one keyed shuffle in $query")
    val offenders = shuffles.filterNot(
      _.child.exists(_.isInstanceOf[BaseAggregateExec]))
    assert(offenders.isEmpty,
      s"$query shuffles raw (pre-aggregate) rows:\n" +
        offenders.map(_.treeString.take(600)).mkString("\n"))
  }

  test("q75: the exploded span stream collapses map-side — every exchange " +
    "carries (doc, hash, count) triples, never raw span rows") {
    assertAllShufflesAboveAggregates("q75_dup_spans")
  }

  test("q79: the exploded gram stream collapses map-side — every exchange " +
    "carries (source, hash, flags) triples, never raw gram rows") {
    assertAllShufflesAboveAggregates("q79_snapshot_novelty")
  }

  test("q80: shard balance shuffles only aggregated |S|-row state") {
    assertAllShufflesAboveAggregates("q80_shard_balance")
  }

  test("q83: tf and df collapse map-side — no exchange carries the raw " +
    "zipfian token stream") {
    assertAllShufflesAboveAggregates("q83_tfidf_terms")
  }

  test("q84: the quantile cumsum runs over the bounded (q6) histogram — " +
    "every hash exchange sits above the collapse; the corpus is never " +
    "globally row-sorted") {
    assertAllShufflesAboveAggregates("q84_difficulty_bins")
  }

  test("q104: bigram and unigram streams collapse map-side; the unigram " +
    "broadcast is built ONCE and reused for both join probes; the top-k " +
    "is a bounded heap, not a global sort") {
    assertAllShufflesAboveAggregates("q104_collocations")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val q = SparkEntry.queries("q104_collocations")(spark, sf)
      val p = q.queryExecution.executedPlan.toString
      assert(p.contains("TakeOrderedAndProject"),
        "top-k must not globally sort:\n" + p.take(800))
      assert(p.contains("ReusedExchange"),
        "w1/w2 probes must share one unigram broadcast:\n" + p.take(1200))
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("q105: both term streams collapse map-side before their exchanges " +
    "(the zipfian head term never keys a shuffle raw)") {
    assertAllShufflesAboveAggregates("q105_vocab_growth")
  }

  test("q108: every calibration window is PARTITIONED by source — the " +
    "per-source histogram bound keeps partitions small; nothing falls " +
    "into a global single-partition window") {
    import org.apache.spark.sql.execution.window.WindowExec
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val plan =
      try SparkEntry.queries("q108_score_calibration")(spark, sf)
        .queryExecution.executedPlan
      finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    val wins = plan.collect { case w: WindowExec => w }
    assert(wins.nonEmpty, "expected window operators in q108")
    assert(wins.forall(_.partitionSpec.nonEmpty),
      "unpartitioned window found:\n" + plan.toString.take(1200))
  }

  test("q110: the suppression re-aggregate runs on the bounded cell " +
    "table — every exchange sits above an aggregate") {
    assertAllShufflesAboveAggregates("q110_kanon_mix")
  }

  test("q111: exactly ONE raw-row exchange (the user-keyed LAG window); " +
    "type counts collapse map-side and the variance aggregate + profile " +
    "join reuse the window's partitioning") {
    import org.apache.spark.sql.catalyst.plans.physical.HashPartitioning
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val plan =
      try SparkEntry.queries("q111_user_profile")(spark, sf)
        .queryExecution.executedPlan
      finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    val raw = plan.collect { case e: ShuffleExchangeExec => e }
      .filter(_.outputPartitioning.isInstanceOf[HashPartitioning])
      .filterNot(_.child.exists(_.isInstanceOf[BaseAggregateExec]))
    assert(raw.size == 1,
      s"expected exactly one raw user-keyed exchange, got ${raw.size}:\n" +
        raw.map(_.treeString.take(400)).mkString("\n"))
    assert(raw.head.outputPartitioning.asInstanceOf[HashPartitioning]
      .expressions.map(_.toString).exists(_.contains("user_id")),
      raw.head.toString)
  }

  test("q81: the LSH bucket self-join reuses one exchange — the bucketed " +
    "vectors materialize once") {
    // the registered query's plan hides the join behind the persisted
    // CC-labels stage; assert on the pair source itself. AQE off: at
    // fixture scale the pair set is EMPTY and adaptive empty-relation
    // propagation would erase the join before it can be inspected — the
    // PREPARED plan (ReuseExchangeAndSubquery has run) is what we pin.
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val pairs = graft.operators.Similarity.lshNearDupPairs(
        Tables.embeddings(spark, sf), 0.5, 4, 4)
      val p = pairs.queryExecution.executedPlan.toString
      assert(p.contains("ReusedExchange"),
        "bucketed self-join must not scan/bucket the vectors twice:\n" + p.take(1200))
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("q113: the exact recount joins the bounded candidate set as a " +
    "BROADCAST — the open-vocabulary side never sort-merges") {
    val p = formatted(SparkEntry.queries("q113_heavy_hitters")(spark, sf))
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"),
      p.take(1200))
    assert(!p.contains("SortMergeJoin"),
      "candidate recount must not shuffle the vocabulary:\n" + p.take(1200))
  }

  test("q115/q117/q120: every window is PARTITIONED (user / event type) — " +
    "nothing single-partitions an unbounded stream") {
    import org.apache.spark.sql.execution.window.WindowExec
    for (q <- Seq("q115_gap_fill", "q117_winsorize", "q120_next_event_baseline")) {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val plan =
        try SparkEntry.queries(q)(spark, sf).queryExecution.executedPlan
        finally spark.conf.set("spark.sql.adaptive.enabled", "true")
      val wins = plan.collect { case w: WindowExec => w }
      assert(wins.nonEmpty, s"expected window operators in $q")
      assert(wins.forall(_.partitionSpec.nonEmpty),
        s"unpartitioned window in $q:\n" + plan.toString.take(1200))
    }
  }

  test("q121: the prefix fingerprint aggregate collapses map-side — every " +
    "exchange sits above an aggregate") {
    assertAllShufflesAboveAggregates("q121_prefix_dups")
  }

  test("q118: the trailing-window fan-out explodes the DISTINCT " +
    "(user, day) collapse, never raw events") {
    import org.apache.spark.sql.execution.GenerateExec
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val plan =
      try SparkEntry.queries("q118_rolling_active")(spark, sf)
        .queryExecution.executedPlan
      finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    val gens = plan.collect { case g: GenerateExec => g }
    assert(gens.nonEmpty, "expected the sequence-explode in q118")
    assert(gens.forall(_.exists(_.isInstanceOf[BaseAggregateExec])),
      "fan-out must sit above the distinct collapse:\n" + plan.toString.take(1200))
  }

  test("q131: the admission batch BROADCASTS and the base never " +
    "shuffles — one streaming base scan, no base-side exchange") {
    val p = formatted(SparkEntry.queries("q131_emb_admission")(spark, sf))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      "batch side must broadcast:\n" + p.take(1200))
    // the base side reads straight into the join: the only exchanges in
    // the whole plan are the broadcast itself and post-join rank/sort
    // stages over the tiny matched set — never a hashpartitioning of
    // the unmatched base scan below the join
    val joinIdx = p.indexOf("Join")
    val preJoin = p.take(math.max(joinIdx, 0))
    assert(!preJoin.contains("hashpartitioning"),
      "base scan must not exchange before the join:\n" + p.take(1500))
  }

  test("q132: the stream-static gate plans a LEFT ANTI join with the " +
    "fingerprint index broadcast, and the parity predicates push to " +
    "the scans") {
    val p = formatted(SparkEntry.queries("q132_stream_admission")(spark, sf))
    assert(p.contains("LeftAnti"), "gate must be an anti join:\n" + p.take(1200))
    assert(p.contains("BroadcastHashJoin"),
      "fingerprint index must broadcast at this scale:\n" + p.take(1200))
    assert(p.contains("PushedFilters"), p.take(400))
  }
}
