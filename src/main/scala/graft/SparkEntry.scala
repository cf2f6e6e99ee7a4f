package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators._
import graft.Tables._

/** Driver contract — see /root/repo/SURVEY.md §7 + BASELINE.md.
  *
  * Every key in [[queries]] is one operator/capability from SURVEY.md §2
  * (or a north-star LLM-pipeline extension); [[oracleSql]] carries the
  * DuckDB-equivalent ANSI SQL for the driver's hash compare. Column names
  * and value rounding are aligned on both sides by construction.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.impactAgg(lineitem(spark, "/root/testdata/sf0.001"))

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // §2.C flagship: CASE + scalar arithmetic + multi-agg + post-agg + sort
    "q01_impact_agg" -> ((s, d) => Relational.impactAgg(lineitem(s, d))),
    // §2.B wordcount, declarative
    "q02_wordcount" -> ((s, d) => TextOps.wordcount(documents(s, d))),
    // §2.A engine kernel: same wordcount through the MapReduce layer
    "q03_mr_wordcount" -> ((s, d) => TextOps.mrWordcount(s, documents(s, d))),
    // joins
    "q04_join_broadcast" -> ((s, d) => Joins.revenueByBrand(lineitem(s, d), part(s, d))),
    "q05_join_star" -> ((s, d) => Joins.revenueByNation(
      lineitem(s, d), orders(s, d), customer(s, d), nation(s, d), region(s, d))),
    "q06_semi_join" -> ((s, d) => Joins.customersWithBigOrders(customer(s, d), orders(s, d))),
    "q07_anti_join" -> ((s, d) => Joins.customersWithoutOrders(customer(s, d), orders(s, d))),
    "q08_cross_pairs" -> ((s, d) => Joins.labelPairs(embeddings(s, d))),
    // windows (q09 runs through the custom bounded-heap top-k operator:
    // plans.TopKRewriteRule swaps the row_number<=k window for
    // TopKPerKeyExec — same results, gated by the same oracle)
    "q09_window_topk" -> ((s, d) => {
      plans.TopKInstall.install(s)
      Windows.topPartsPerBrand(part(s, d))
    }),
    "q10_running_total" -> ((s, d) => Windows.runningOrderTotal(orders(s, d))),
    "q11_sessionize" -> ((s, d) => Windows.sessionsPerUser(events(s, d))),
    "q12_mode" -> ((s, d) => Windows.modeSegmentPerNation(customer(s, d), nation(s, d))),
    // set ops / aggregates / sort
    "q13_union_agg" -> ((s, d) => SetAggOps.accountUnion(customer(s, d), supplier(s, d))),
    "q14_intersect" -> ((s, d) => SetAggOps.nationsWithBoth(customer(s, d), supplier(s, d))),
    "q15_except" -> ((s, d) => SetAggOps.nationsCustomersOnly(customer(s, d), orders(s, d))),
    "q16_distinct_sort" -> ((s, d) => SetAggOps.distinctLabels(embeddings(s, d))),
    "q17_topk" -> ((s, d) => SetAggOps.topOrders(orders(s, d))),
    "q18_rollup" -> ((s, d) => SetAggOps.rollupFlagStatus(lineitem(s, d))),
    "q19_distinct_agg" -> ((s, d) => SetAggOps.distinctCounts(lineitem(s, d))),
    "q20_value_counts" -> ((s, d) => SetAggOps.langHistogram(documents(s, d))),
    // events / timestamps / defensive casts
    "q21_hourly_events" -> ((s, d) => EventOps.hourlyEventStats(events(s, d))),
    "q22_props_cast" -> ((s, d) => EventOps.propsKeyStats(events(s, d))),
    "q23_ship_delay" -> ((s, d) => EventOps.shipDelayByPriority(lineitem(s, d), orders(s, d))),
    // dedup family (north-star training-data ops)
    "q24_dedup_exact" -> ((s, d) => Dedup.exactDedup(documents(s, d))),
    "q25_dedup_minhash" -> ((s, d) => Dedup.minhashDedup(documents(s, d))),
    "q26_dedup_simhash" -> ((s, d) => Dedup.simhashDedup(documents(s, d))),
    "q27_ngram_jaccard" -> ((s, d) => Dedup.ngramJaccard(documents(s, d))),
    "q59_dup_clusters" -> ((s, d) => Dedup.dupClusters(documents(s, d))),
    // the keep/drop decision: per-doc component keeper (shares the
    // memoized pairs + labels stages with q25/q59 within a session)
    "q61_dedup_keepers" -> ((s, d) => Dedup.dedupKeepers(documents(s, d))),
    // similarity search (north-star)
    "q28_emb_neardup" -> ((s, d) => Similarity.cosineNearDup(embeddings(s, d))),
    "q29_ann_brute" -> ((s, d) => Similarity.annBruteTopK(embeddings(s, d))),
    "q30_ann_lsh" -> ((s, d) => Similarity.annLshTopK(embeddings(s, d))),
    "q54_ann_ivf" -> ((s, d) => Similarity.annIvfTopK(embeddings(s, d))),
    // banded range join (time-window equi-ized via hour buckets)
    "q55_range_join" -> ((s, d) => Joins.rangeJoinClicks(events(s, d))),
    // stream-stream interval join, batch twin (inner-join semantics)
    "q56_stream_join" -> ((s, d) => streaming.EventStream.clickAttributionCounts(events(s, d))),
    // arbitrary GROUPING SETS (not expressible as rollup/cube)
    "q57_grouping_sets" -> ((s, d) => SetAggOps.groupingSetsPriorityStatus(orders(s, d))),
    // typed JSON parse (from_json with declared schema; q22's regex twin)
    "q58_json_props" -> ((s, d) => EventOps.jsonPropsStats(events(s, d))),
    // text analysis (north-star)
    "q31_langid" -> ((s, d) => TextAnalysis.langId(documents(s, d))),
    "q32_quality" -> ((s, d) => TextAnalysis.qualityScore(documents(s, d))),
    "q33_tokens" -> ((s, d) => TextAnalysis.tokenCounts(documents(s, d))),
    "q34_fingerprint" -> ((s, d) => TextAnalysis.fingerprint(documents(s, d))),
    // multimodal plumbing (north-star): typed Dataset + per-partition codec
    "q35_media_features" -> ((s, d) => Multimodal.extractFeatures(s, documents(s, d))),
    "q36_frame_sample" -> ((s, d) => Multimodal.frameSample(s, documents(s, d))),
    // streaming transforms, batch twins (same DataFrame => DataFrame fn
    // runs under readStream with watermarked incremental state)
    "q37_stream_tumbling" -> ((s, d) => streaming.EventStream.tumblingStats(events(s, d))),
    "q38_stream_sliding" -> ((s, d) => streaming.EventStream.slidingStats(events(s, d))),
    "q39_session_window" -> ((s, d) => streaming.EventStream.sessionStats(events(s, d))),
    // ML-pipeline ops (plants analog + deterministic sampling) and cube
    "q40_stratified_sample" -> ((s, d) => MLOps.stratifiedSample(customer(s, d))),
    "q41_pair_separation" -> ((s, d) => MLOps.pairSeparation(embeddings(s, d))),
    "q42_cube" -> ((s, d) => SetAggOps.cubePriorityStatus(orders(s, d))),
    // custom Catalyst expression (native codegen, SparkSessionExtensions)
    "q43_adler_partition" -> ((s, d) => {
      graft.functions.GraftFunctions.register(s)
      TextOps.adlerPartition(documents(s, d))
    }),
    // D10/D11: one-vs-one ensemble voting + confusion matrix
    "q44_ensemble_vote" -> ((s, d) => MLOps.ensembleClassify(embeddings(s, d))),
    // skew-salted join, gated to be result-invariant vs the plain join
    "q45_salted_join" -> ((s, d) => Skew.saltedRevenueByNation(lineitem(s, d), supplier(s, d))),
    // as-of join (composed union+window; oracle = DuckDB native ASOF JOIN)
    "q46_asof_join" -> ((s, d) => Joins.asofAttribution(events(s, d))),
    // wide/pivot aggregation and exact percentiles
    "q48_pivot" -> ((s, d) => EventOps.eventTypePivot(events(s, d))),
    "q49_percentiles" -> ((s, d) => EventOps.quantityPercentiles(lineitem(s, d))),
    // approx sketches: deterministic KMV distinct estimate + exact median
    // over a deterministic hash sample — oracle-checkable, unlike
    // HLL/t-digest whose results differ across engines
    "q47_sketches" -> ((s, d) => Sketches.sketchStats(lineitem(s, d))),
    // bounded-state quantile sketch: exact median over the deterministic
    // bottom-k-by-hash reservoir (≤ k pairs of state per group, no
    // 10%-sample sort anywhere — q47's scale path)
    "q60_quantile_sketch" -> ((s, d) => Sketches.quantileSketch(lineitem(s, d))),
    // one-pass per-column profiler: null counts + KMV distinct, one read
    // of the table, |cols|·k longs of agg state
    "q64_table_profile" -> ((s, d) => Sketches.tableProfile(lineitem(s, d))),
    // training-data curation tier (all row-local / broadcast shaped)
    "q50_pii_scrub" -> ((s, d) => Pipeline.piiScrub(documents(s, d))),
    "q51_repetition" -> ((s, d) => Pipeline.repetitionFilter(documents(s, d))),
    "q52_source_mix" -> ((s, d) => Pipeline.sourceMixture(documents(s, d))),
    "q53_contamination" -> ((s, d) => Pipeline.contamination(documents(s, d))),
    // sequence packing: per-source concat-and-chunk layout at a fixed
    // token budget — one narrow source-keyed shuffle + ordered cumsum
    "q62_token_packing" -> ((s, d) => Pipeline.tokenPacking(documents(s, d))),
    // hard per-source cap, md5 priority; the row_number<=k window runs
    // on the bounded-heap TopKPerKey operator (|sources|·k shuffle rows)
    "q63_domain_quota" -> ((s, d) => {
      plans.TopKInstall.install(s)
      Pipeline.domainQuota(documents(s, d))
    }),
    // incremental-recrawl diff: fingerprints-only full outer join —
    // 16 bytes/doc cross the shuffle, payloads never move
    "q65_snapshot_delta" -> ((s, d) => Pipeline.snapshotDelta(documents(s, d))),
    // the hardened dynamic-submission path end-to-end (§2.A1): the same
    // histogram as q20, but arriving as SQL TEXT through SqlGate's
    // allow-list checks — proving the gated path plans and executes
    // identically under the same oracle
    "q66_sqlgate_roundtrip" -> ((s, d) => SqlGate.submit(s, d,
      "SELECT lang, COUNT(*) AS cnt FROM documents GROUP BY lang")),
    // the whole curation tier COMPOSED in one plan: quality (q51
    // thresholds) → dedup keeper (q61 decision, shared memoized labels)
    // → per-source quota (q63's md5 priority, fused into the one
    // aggregation pass as a bounded top-k Aggregator) — per-source
    // funnel counts + final token budget, one corpus scan end to end
    "q67_curation_funnel" -> ((s, d) => Pipeline.curationFunnel(documents(s, d))),
    // CCNet-style LM quality filter: corpus-trained unigram LM, per-doc
    // mean log-likelihood, exact int128 below-corpus-mean flag; global
    // sums derive from the |V|-row word table (no second corpus pass)
    "q68_lm_score" -> ((s, d) => TextAnalysis.lmScore(documents(s, d))),
    // window-granular exact-substring boilerplate detection: per-doc
    // distinct fingerprint windows matched across the corpus on ONE
    // reused window-keyed exchange; shared-fraction flags in exact ppm
    "q69_boilerplate" -> ((s, d) => TextAnalysis.boilerplate(documents(s, d))),
    // sliding context-window chunk economics (chunks/overlap/padding per
    // source at a given maxLen+stride) — row-local closed-form integers
    "q70_chunk_layout" -> ((s, d) => Pipeline.chunkLayout(documents(s, d))),
    // int8 scalar-quantization audit over the embeddings: per-dim corpus
    // min/max -> 255-code affine quantization -> exact integer
    // reconstruction error per label (the 4x-memory decision for a
    // 100 TB vector index)
    "q71_int8_quant" -> ((s, d) => Similarity.int8QuantStats(embeddings(s, d))),
    // BPE first-merge statistics: top-k adjacent character pairs by
    // corpus frequency — the distinct-word table absorbs the corpus
    // before the pair explosion, top-k is TakeOrderedAndProject
    "q72_bpe_pairs" -> ((s, d) => TextAnalysis.bpePairs(documents(s, d))),
    // deterministic train/val/test split generation (D12's notebook
    // split): md5-bucketed assignment, per-(label, split) counts and
    // exact basis-point fractions — the class-balance audit
    "q73_split_audit" -> ((s, d) => MLOps.trainValTestSplit(embeddings(s, d))),
    // the streaming-capable session_window stage itself under the oracle
    // gate: merged sessions with Spark's (start, last + gap) bounds,
    // recomputed by the oracle via lag/island detection
    "q74_session_bounds" -> ((s, d) =>
      streaming.EventStream.sessionWindowBounds(events(s, d))),
    // duplicated-span profile (Lee et al. 2022 §4.1 audit): positional
    // k-token span hashes collapse to (doc, h, c) triples before any
    // shuffle; corpus-wide occurrence via one window exchange on h
    "q75_dup_spans" -> ((s, d) => Dedup.dupSpans(documents(s, d))),
    // cross-split leakage audit: md5-bucket split x exact-content
    // fingerprint; only (fp, split) pairs shuffle, rollup is 3 rows
    "q76_split_leakage" -> ((s, d) => MLOps.splitLeakage(documents(s, d))),
    // quality-aware dedup policy: each near-dup component keeps its
    // BEST-quality member (exact integer argmax, ties -> min id) —
    // composes the memoized component labels with the q32 scoring pass
    "q77_quality_keepers" -> ((s, d) => Dedup.qualityKeepers(documents(s, d))),
    // SemDeDup-style semantic clusters: cosine-threshold pairs from the
    // blocked exact self-join, transitive closure via the shared
    // pointer-doubling CC loop, one rollup row per cluster
    "q78_semantic_clusters" -> ((s, d) => Similarity.semanticClusters(embeddings(s, d))),
    // recrawl content novelty: distinct hashed 3-gram delta between the
    // q65 snapshots, per source — (source, h) max-flag collapse before
    // the only shuffle, |sources|-row rollup
    "q79_snapshot_novelty" -> ((s, d) => Pipeline.snapshotNovelty(documents(s, d))),
    // training-shard manifest audit: md5-bucket shard assignment,
    // per-shard doc/token mass + exact-bp fill vs the ideal S-way split;
    // row-local + |S|-row aggregate, DECIMAL(38,0) mass arithmetic
    "q80_shard_balance" -> ((s, d) => Pipeline.shardBalance(documents(s, d))),
    // q78's sub-quadratic twin: pairs from 4x4 multi-table hyperplane
    // LSH (union of same-bucket candidates, exact-cosine verified),
    // same CC loop and rollup — the semantic-dedup path at 100 TB
    "q81_semantic_lsh" -> ((s, d) => Similarity.semanticClustersLsh(embeddings(s, d))),
    // streaming admission quota (batch twin): first k events per
    // (user, 5-min-gap session) pass; the stateful gate's TTL is
    // semantically exact — state drops when the watermark closes the
    // session — so per-key state is two longs bounded by active keys
    "q82_session_quota" -> ((s, d) => streaming.EventStream.sessionQuotaBatch(events(s, d))),
    // per-source salient terms by tf·idf with RAW linear idf = N/df (a
    // ratio of exact integers → engine-independent ranking); reads the
    // session-memoized docWords collapse, guarded-broadcast df side,
    // bounded-heap top-k — |sources|·k rows out
    "q83_tfidf_terms" -> ((s, d) => {
      plans.TopKInstall.install(s)
      TextAnalysis.tfidfTerms(documents(s, d))
    }),
    // curriculum difficulty bins: exact BY-VALUE quality quantiles via
    // a bounded (≤10⁶-row) micro-unit histogram — no global row sort
    // of the corpus at any scale
    "q84_difficulty_bins" -> ((s, d) => TextAnalysis.difficultyBins(documents(s, d))),
    // token-budget mixture sampling: per-source md5-priority running
    // token sum (q62's range-sharded two-pass cumsum), keep while the
    // budget lasts; |sources|-row rollup with exact fill bp
    "q85_token_budget" -> ((s, d) => Pipeline.tokenBudgetSample(documents(s, d))),
    // temperature-based source mixing (p_i ∝ √T_i): ONE partial-agg
    // shuffle to |sources| rows, then Σw window + DECIMAL(38,0)
    // allocation math on the tiny table
    "q86_mix_temperature" -> ((s, d) => Pipeline.mixTemperature(documents(s, d))),
    // cross-source span-overlap matrix: distinct (source, span-hash)
    // collapse map-side, h-keyed self-join bounded by |sources| per
    // hash, |S|-row totals broadcast onto the ≤|S|²/2 pair table
    "q87_source_overlap" -> ((s, d) => Dedup.sourceOverlap(documents(s, d))),
    // SemDeDup exemplar per semantic cluster: integer centroid from a
    // map-side-collapsed (lbl, pos) partial agg, codegen'd dot scoring,
    // rank-1 bounded-heap argmax. Threshold 0.4 (vs q78's 0.5) keeps a
    // rich cluster population at fixture scale; percolation into giant
    // components on a denser space now raises loudly via the in-plan
    // maxClusterSize guard (GuardrailSpec-pinned) — the CC stays
    // O(log diameter) rounds either way
    "q88_cluster_reps" -> ((s, d) => {
      plans.TopKInstall.install(s)
      Similarity.clusterReps(embeddings(s, d), threshold = 0.4)
    }),
    // source-pair Jaccard from bounded KMV sketches: q87's sketch-tier
    // twin — |S|·k state instead of the full distinct span stream,
    // deterministic estimator so the ESTIMATE itself is oracle-checked
    "q89_source_jaccard" -> ((s, d) => {
      plans.TopKInstall.install(s)
      Sketches.sourceJaccardKmv(documents(s, d))
    }),
    // cohort retention matrix: ONE user-keyed exchange serves distinct,
    // first-week agg and join; cohort rollup is ≤ |weeks|² rows
    "q90_retention" -> ((s, d) => EventOps.retentionCohorts(events(s, d))),
    // ordered conversion funnel: strict per-user temporal staging on
    // ONE user-keyed exchange; constant-size output
    "q91_funnel" -> ((s, d) => EventOps.funnelStages(events(s, d))),
    // first-order event-type transition matrix: one user-keyed window
    // exchange, |types|² rollup, exact per-mille probabilities
    "q92_transitions" -> ((s, d) => EventOps.eventTransitions(events(s, d))),
    // hour-of-day anomaly flags: all-integer cleared-denominator z-test
    // on a ≤|types|·24 matrix; one partial-agg shuffle total
    "q93_hourly_anomaly" -> ((s, d) => EventOps.hourlyAnomaly(events(s, d))),
    // Efraimidis–Spirakis quality-weighted sampling: row-local integer
    // exponential keys, bounded-heap per-source top-k, |sources| rollup
    "q94_weighted_sample" -> ((s, d) => {
      plans.TopKInstall.install(s)
      Pipeline.weightedSample(documents(s, d))
    }),
    // freshness-decayed engagement: exact integer half-life weights
    // (v4 DIV 2^weeks), 1-row max-ts broadcast, one partial-agg shuffle
    "q95_decayed_engagement" -> ((s, d) => EventOps.decayedEngagement(events(s, d))),
    // median/MAD robust quality outliers: one bounded-histogram corpus
    // shuffle, doubled-unit integer medians, |sources|-row broadcasts
    "q96_quality_outliers" -> ((s, d) => TextAnalysis.qualityOutliers(documents(s, d))),
    // rank-based p50/p90/p99 length profile: one bounded-histogram
    // shuffle, integer ⌈f·n⌉ rank picks, no interpolation/floats
    "q97_length_profile" -> ((s, d) => TextAnalysis.lengthProfile(documents(s, d))),
    // §2.C flagship with the EXACT reference semantics (not the lineitem
    // transplant): Accident.dangerScores over the committed CSV fixture —
    // the one real query a reference user ports (tasks/
    // accident_analysis.py:25–129). Input is the repo fixture, not sfDir:
    // the reference ships its own CSVs the same way.
    "q98_accident_csv" -> ((s, _) => Accident.dangerScores(
      sources.Sources.readCsvDefensive(s, Accident.fixtureCsvPath, Map.empty))),
    // REAL JDK-imageio decode over the committed image fixtures: binary
    // scan → per-partition codec → exact integer channel sums of the
    // 224×224 tensor; the corrupt fixture row must drop (skip-on-error).
    // Oracle = committed expected CSV (no SQL engine decodes PNGs —
    // the gate pins decode determinism; solids are analytic v·224²)
    "q99_image_decode" -> ((s, _) => Multimodal.imageDecodeStats(
      s, new java.io.File("fixtures/images").getAbsolutePath)),
    // per-dimension embedding moments (whitening/outlier-dim audit):
    // posexplode collapses map-side to |dims| rows before the one
    // shuffle; variance numerator n·Σx²−(Σx)² ≥ 0 so DIV == floor-div,
    // all products DECIMAL(38,0) ↔ HUGEINT
    "q100_dim_profile" -> ((s, d) => Similarity.dimProfile(embeddings(s, d))),
    // contrastive hard negatives: nearest CROSS-label vector per query
    // from the q30 multi-probe LSH buckets (one bucket-keyed exchange,
    // never all-pairs), exact-cosine rank-1 pick
    "q101_hard_negatives" -> ((s, d) => {
      plans.TopKInstall.install(s)
      Similarity.hardNegatives(embeddings(s, d))
    }),
    // doc rarity = mean linear-idf over distinct terms, integer
    // micro-units; shares the memoized docWords scan, guarded-broadcast
    // df join (token never keys a shuffle), bounded-heap top-k/source
    "q102_doc_rarity" -> ((s, d) => {
      plans.TopKInstall.install(s)
      TextAnalysis.docRarity(documents(s, d))
    }),
    // user-journey trigram mining: one user-keyed exchange for both
    // LEADs, |types|^3-bounded rollup, guarded single-partition rank
    "q103_event_trigrams" -> ((s, d) => EventOps.eventTrigrams(events(s, d))),
    // collocation mining (word2vec-style phrase detection): map-side
    // adjacent-zip bigrams, partial-agg before the one (w1,w2) exchange,
    // guarded-broadcast |V| unigram table probed twice, discounted-Dice
    // integer score, TakeOrdered bounded-heap top-k
    "q104_collocations" -> ((s, d) => TextAnalysis.collocations(documents(s, d))),
    // Heaps-law vocabulary growth: md5-bucketed corpus order, per-term
    // min-bucket collapses map-side, curve is <=|buckets| rows under an
    // in-plan window ceiling
    "q105_vocab_growth" -> ((s, d) => TextAnalysis.vocabGrowth(documents(s, d))),
    // bloom-pruned large-large semi join: fixed-size distributed bloom
    // build, map-side probe drop before the exchange, exact semi join
    // scrubs false positives — byte-identical to the plain semi join
    "q106_bloom_semi" -> ((s, d) => Joins.bloomSemiSegments(customer(s, d), orders(s, d))),
    // at-least-once -> exactly-once: full double replay deduped by id
    // (batch twin of dropDuplicatesWithinWatermark, state O(ids/hour)
    // in streaming mode), per-type counts/sums pin the dedup itself
    "q107_stream_dedup" -> ((s, d) => streaming.EventStream.dedupReplayStats(events(s, d))),
    // per-source ECDF calibration table (source, q6) -> per-mille
    // percentile: corpus collapses to bounded per-source histograms,
    // partitioned windows under an executable per-partition ceiling
    "q108_score_calibration" -> ((s, d) => TextAnalysis.scoreCalibration(documents(s, d))),
    // similarity-graph degree histogram (hub/template detection before
    // clustering): blocked exact pair source, degree collapses behind
    // vec_id, histogram bounded by max degree
    "q109_neardup_degrees" -> ((s, d) => Similarity.nearDupDegreeProfile(embeddings(s, d))),
    // k-anonymity composition report: cells under k docs fold into one
    // __suppressed__ row; relabel+re-agg runs on the bounded cell table
    "q110_kanon_mix" -> ((s, d) => Pipeline.kAnonymousMix(documents(s, d))),
    // bot-detection features: integer-exact type entropy + gap variance;
    // the LAG's user-keyed exchange serves variance agg AND profile join
    "q111_user_profile" -> ((s, d) => EventOps.userBehaviorProfile(events(s, d))),
    // packing economics follow token mass, not doc counts: percentile of
    // the p-th TOKEN over the bounded per-source length histogram
    "q112_token_weighted_lengths" -> ((s, d) => TextAnalysis.tokenWeightedLengthProfile(documents(s, d))),
    // guaranteed-support heavy hitters: bounded-memory Misra–Gries
    // candidate pass per partition (zero shuffle), exact broadcast-semi
    // recount — the |V|-row wordcount exchange collapses to ≤P·k rows
    "q113_heavy_hitters" -> ((s, d) => TextAnalysis.heavyHitters(documents(s, d))),
    // one Lloyd step over the q54 IVF seeds: size / exact inertia /
    // scaled centroid movement per cluster, division-free integers
    "q114_kmeans_step" -> ((s, d) => Similarity.kmeansStep(embeddings(s, d))),
    // hourly LOCF gap-fill per user, verified via its carried-mass
    // integral; grid+window run on the (user, hour) collapse, not rows
    "q115_gap_fill" -> ((s, d) => EventOps.gapFillSummary(events(s, d))),
    // 3-iteration integer PageRank over the near-dup graph (template
    // hub detection); edge list persisted once, reused by all rounds
    "q116_pagerank_hubs" -> ((s, d) => Similarity.pageRankHubs(embeddings(s, d))),
    // exact p1/p99 winsorization bounds + clip audit per event type:
    // rank picks over the guarded per-type value histogram, no floats
    "q117_winsorize" -> ((s, d) => EventOps.winsorizeBounds(events(s, d))),
    // DAU/WAU/stickiness: trailing 7-day distinct actives with the
    // range join equi-ized by fanning each (user, day) to ≤7 report days
    "q118_rolling_active" -> ((s, d) => EventOps.rollingActiveUsers(events(s, d))),
    // per-query LSH recall vs the exact top-k — the index-quality
    // surface itself as an oracle-checked deterministic result
    "q119_ann_recall" -> ((s, d) => Similarity.annRecallAudit(embeddings(s, d))),
    // majority-class next-event baseline: argmax of the q92 transition
    // matrix (deterministic tie-break) + its exact corpus accuracy
    "q120_next_event_baseline" -> ((s, d) => EventOps.nextEventBaseline(events(s, d))),
    // template-opener clusters: exact first-4-token fingerprint groups,
    // row-local hashing then one 16-byte-key partial-agg exchange
    "q121_prefix_dups" -> ((s, d) => Dedup.prefixDups(documents(s, d))),
    // warehouse MERGE semantics (upserts + tombstones onto a base
    // snapshot) with an order-independent content checksum per action
    "q122_merge_upsert" -> ((s, d) => Pipeline.mergeUpsert(documents(s, d))),
    // triangle census of the near-dup graph: clique templates vs star
    // hubs; ordered-wedge closure on the memoized cached pair list
    "q123_triangles" -> ((s, d) => Similarity.triangleCensus(embeddings(s, d))),
    // vector-column intake audit: the null/dims/non-finite/zero-norm
    // mass every similarity tier silently filters, made visible
    "q124_vector_audit" -> ((s, d) => Similarity.vectorAudit(embeddings(s, d))),
    // stopword-coverage drift per source: the cheapest language/quality
    // tripwire; stopword set = q113's ≤k-bounded heavy hitters
    "q125_stopword_drift" -> ((s, d) => TextAnalysis.stopwordDrift(documents(s, d))),
    // user-level association mining: per type-pair lift vs independence
    // in exact per-mille over the distinct (user, type) collapse
    "q126_cooccurrence_lift" -> ((s, d) => EventOps.cooccurrenceLift(events(s, d))),
    // dataset cartography: joint (quality decile x length decile)
    // doc/token census via q84's exact equal-frequency binning twice
    "q127_data_map" -> ((s, d) => TextAnalysis.dataMap(documents(s, d))),
    // per-source type-token ratio + hapax rate: low-TTR templates and
    // high-hapax OCR junk, off the memoized docWords collapse
    "q128_lexical_diversity" -> ((s, d) => TextAnalysis.lexicalDiversity(documents(s, d))),
    // the affinity planner's (worker -> label pair) assignment as a
    // deterministic table (SURVEY §2.D row D4; reference divide_work,
    // plants_classifier.py:57-96) — a pure function of the sorted label
    // set + worker count, recomputed by the oracle's recursive CTE
    "q129_affinity_plan" -> ((s, d) =>
      graft.mr.AffinityPlan.assignmentTable(nation(s, d), "n_name", 4)),
    // incremental near-dup admission: the incoming batch (odd doc_ids,
    // q65 modulo-split convention) deduped against the base snapshot
    // (even ids) via batch-bands x base-bands ONLY — the per-ingest
    // shape that never re-pairs the corpus against itself; output = the
    // reject list (best base match per matched batch doc)
    "q130_incremental_dedup" -> ((s, d) => {
      plans.TopKInstall.install(s)
      Dedup.incrementalDedup(documents(s, d))
    }),
    // embedding-side admission probe (q130's semantic twin): the batch
    // (odd vec_ids) broadcasts guarded, the base (even ids) streams —
    // one base scan per ingest, zero base shuffle, no base x base pair
    "q131_emb_admission" -> ((s, d) => {
      plans.TopKInstall.install(s)
      Similarity.embAdmission(embeddings(s, d))
    }),
    // stream-static admission gate (exact-dup front door of the
    // admission family): incoming (odd ids) LEFT ANTI joins the STATIC
    // base fingerprint index — stateless, runnable forever as a
    // Structured Streaming query (stream ≡ batch spec-pinned)
    "q132_stream_admission" -> ((s, d) =>
      streaming.DocStream.streamAdmission(documents(s, d))),
    // persisted admission index: q130's semantics split at the
    // persistence boundary — the base band/hset/hot-set index is built
    // ONCE per base snapshot (one-time, amortized), every later probe
    // shingles/signs only the batch and partition-prunes the index scan
    // — per-ingest cost O(batch + touched buckets), never a base re-sign
    "q133_admission_index" -> ((s, d) => {
      plans.TopKInstall.install(s)
      AdmissionIndex.admissionReject(s, d)
    }),
    // near-dup admission as a STATELESS stream-shaped probe against the
    // persisted index (q132's exact-dup gate extended to minhash): every
    // stage is a narrow transform or a static-side join, min-band
    // row-local pair dedup instead of distinct(), row-local verify —
    // the same plan runs under writeStream with zero state-store rows
    // (AdmissionIndexSpec replays it); this is its batch twin
    "q134_stream_neardup" -> ((s, d) => AdmissionIndex.streamNearDup(s, d)),
    // embedding-side persisted admission (q131's scale path made
    // durable): base persisted ONCE as a deterministic IVF layout
    // (cells = partition dirs), probe reads only the nProbe nearest
    // cells per batch vector — expected nProbe/C of the base per
    // ingest vs q131's full-base scan; the oracle reproduces the
    // identical cell assignment, so the declared approximation is
    // exactly checked
    "q135_emb_admission_index" -> ((s, d) => {
      plans.TopKInstall.install(s)
      AdmissionIndex.embAdmissionIndexed(s, d)
    }),
    // the embedding probe as a STATELESS stream-shaped plan (closing
    // the admission matrix: exact q132 / minhash q134 / embedding q136
    // each runnable forever under writeStream with zero state rows);
    // this is its batch twin — full verified pair set, no rank (an
    // aggregation would be state)
    "q136_stream_emb_admission" -> ((s, d) =>
      AdmissionIndex.streamEmbAdmission(s, d)),
    // the FULL ingest lifecycle over one index: build (mod-3 base) →
    // probe batch1 → fold its admitted docs in as an idempotent delta
    // generation → probe batch2, whose rejects now span base ∪
    // admitted-batch1 — what round 1 admitted, round 2 cannot duplicate
    "q137_admission_lifecycle" -> ((s, d) => {
      plans.TopKInstall.install(s)
      AdmissionIndex.admissionLifecycle(s, d)
    }),
    // the lifecycle with the COMPACTION maintenance step in the loop
    // (its own mod-4 index): build → probe → fold → COMPACT (delta
    // generations' stored rows merged into the base tables, IO-only,
    // no re-signing) → probe. The oracle models NO compaction — the
    // pin is that compaction is invisible to every probe answer while
    // returning the index to single-root shape (N ingests = N scan
    // branches per probe otherwise, the ADMISSION_SWEEP_GENS axis)
    "q138_admission_compaction" -> ((s, d) => {
      plans.TopKInstall.install(s)
      AdmissionIndex.admissionCompaction(s, d)
    }),
    // the composed production front door: ONE incoming batch through
    // all three admission tiers in precedence+cost order — exact
    // fingerprint (q132) → minhash index probe (q134) → IVF embedding
    // probe (q136), each tier probing only what the previous passed,
    // every tier reading a PERSISTED index — emitting per-doc reject
    // attribution (doc_id, tier, match_id). The gate a 100 TB ingest
    // actually runs; reference analog: the plants task's one
    // precomputed-lookup pipeline (plants_classifier.py:183-231)
    "q139_front_door" -> ((s, d) => {
      plans.TopKInstall.install(s)
      AdmissionIndex.frontDoor(s, d)
    }),
    // duplicated-span SCRUB: q75's audit as an EDIT — tokens covered by
    // corpus-repeated k-spans removed, cleaned text re-emitted; only
    // (doc_id, pos, h) triples shuffle, text moves once for affected docs
    "q140_span_scrub" -> ((s, d) => Dedup.scrubDupSpans(documents(s, d))),
    // the embedding tier's full ingest lifecycle (q137's IVF twin):
    // build -> probe -> fold admitted vectors as a delta generation
    // under FROZEN centroids -> probe again; and its compaction twin
    "q141_emb_lifecycle" -> ((s, d) =>
      AdmissionIndex.embAdmissionLifecycle(s, d)),
    "q142_emb_compaction" -> ((s, d) =>
      AdmissionIndex.embAdmissionCompaction(s, d)),
    // the COMPOSED front door's full ingest lifecycle (mod-3 split):
    // build all three indexes → batch1 through the three-tier gate →
    // fold its admitted docs into ALL THREE tiers as one idempotent
    // delta generation (fingerprints + minhash signatures + vectors)
    // → batch2 through the same gate. Output = batch2's attribution,
    // whose match_ids reach into batch1: what round 1 admitted through
    // any tier, round 2 cannot re-admit — the composed gate property
    // q139 alone could not state (its fp tier was fold-less)
    "q143_front_door_lifecycle" -> ((s, d) => {
      plans.TopKInstall.install(s)
      AdmissionIndex.frontDoorLifecycle(s, d)
    }),
    // the composed lifecycle with all three tiers' COMPACTION in the
    // maintenance slot (own mod-4 index family); the oracle models no
    // compaction — the pin is joint invisibility across the tiers
    "q144_front_door_compaction" -> ((s, d) => {
      plans.TopKInstall.install(s)
      AdmissionIndex.frontDoorCompaction(s, d)
    }),
    // the composed lifecycle AS THE STREAM it runs in production: the
    // actual startFrontDoorLifecycleStream driven over THREE
    // micro-batches (mod-4 residues — three folded generations, so
    // round 3's rejects prove transitivity across rounds 1 AND 2's
    // admits) plus a REPLAYED round-1 batch (same batch id ⇒ same
    // genKey: probe skipped, folds no-op, delivery byte-identical —
    // the at-least-once → exactly-once bridge, oracle-proven). Output
    // = every delivered attribution tagged with its round
    "q145_front_door_stream" -> ((s, d) => {
      plans.TopKInstall.install(s)
      AdmissionIndex.frontDoorStreamLifecycle(s, d)
    }),
    // q123's SCALE path: deterministic Doulion edge-sampled triangle
    // estimate — the md5 keep-test sparsifies wedges ~p² and triangles
    // ~p³, and the unbiased T̂ = T_sampled·mod³ is exact integer
    // arithmetic the oracle recomputes (threshold 0.3 = the denser
    // regime sampling exists for; sampleMod is the density knob the
    // sampled-graph wedge tripwire names when it fires)
    "q146_triangle_sample" -> ((s, d) =>
      Similarity.triangleSample(embeddings(s, d))),
    // q146 with the sampleMod ADVISOR in the loop: forecast the wedge
    // volume from the degree profile (q109's rollup, off the memoized
    // pair list — never the cubic join), pick the smallest mod whose
    // expected sampled wedge volume fits the ~10⁶-row budget, estimate
    // at that mod. The oracle re-derives the SAME mod in SQL (identical
    // sqrt-candidate + integer-adjustment arithmetic), so the gate
    // proves the advisory decision cross-engine, not a pinned constant
    "q147_triangle_advisor" -> ((s, d) =>
      Similarity.triangleSampleAuto(embeddings(s, d))),
    // the exactly-once SINK's round trip (r15 verdict item 2): two
    // micro-batches of the odd half through the stateless near-dup
    // probe into exactlyOnceParquetSink, batch 0 REPLAYED as a second
    // stream (committed id ⇒ no-op), the store read back via readSunk.
    // Single-copy semantics IS the oracle pin — a duplicated or
    // dropped batch fails the row-count and hash
    "q148_stream_sunk" -> ((s, d) => AdmissionIndex.streamNearDupSunk(s, d))
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a rows-only check. */
  def oracleSql: Map[String, String] = Map(
    "q01_impact_agg" -> Relational.impactAggOracle,
    "q02_wordcount" -> TextOps.wordcountOracle,
    "q03_mr_wordcount" -> TextOps.wordcountOracle,
    "q04_join_broadcast" -> Joins.revenueByBrandOracle,
    "q05_join_star" -> Joins.revenueByNationOracle,
    "q06_semi_join" -> Joins.customersWithBigOrdersOracle,
    "q07_anti_join" -> Joins.customersWithoutOrdersOracle,
    "q08_cross_pairs" -> Joins.labelPairsOracle,
    "q09_window_topk" -> Windows.topPartsPerBrandOracle,
    "q10_running_total" -> Windows.runningOrderTotalOracle,
    "q11_sessionize" -> Windows.sessionsPerUserOracle,
    "q12_mode" -> Windows.modeSegmentPerNationOracle,
    "q13_union_agg" -> SetAggOps.accountUnionOracle,
    "q14_intersect" -> SetAggOps.nationsWithBothOracle,
    "q15_except" -> SetAggOps.nationsCustomersOnlyOracle,
    "q16_distinct_sort" -> SetAggOps.distinctLabelsOracle,
    "q17_topk" -> SetAggOps.topOrdersOracle,
    "q18_rollup" -> SetAggOps.rollupFlagStatusOracle,
    "q19_distinct_agg" -> SetAggOps.distinctCountsOracle,
    "q20_value_counts" -> SetAggOps.langHistogramOracle,
    "q21_hourly_events" -> EventOps.hourlyEventStatsOracle,
    "q22_props_cast" -> EventOps.propsKeyStatsOracle,
    "q23_ship_delay" -> EventOps.shipDelayByPriorityOracle,
    "q24_dedup_exact" -> Dedup.exactDedupOracle,
    "q25_dedup_minhash" -> Dedup.minhashDedupOracle,
    "q26_dedup_simhash" -> Dedup.simhashDedupOracle,
    "q27_ngram_jaccard" -> Dedup.ngramJaccardOracle,
    "q28_emb_neardup" -> Similarity.cosineNearDupOracle,
    "q29_ann_brute" -> Similarity.annBruteTopKOracle,
    "q30_ann_lsh" -> Similarity.annLshTopKOracle,
    "q31_langid" -> TextAnalysis.langIdOracle,
    "q32_quality" -> TextAnalysis.qualityScoreOracle,
    "q33_tokens" -> TextAnalysis.tokenCountsOracle,
    "q34_fingerprint" -> TextAnalysis.fingerprintOracle,
    "q35_media_features" -> Multimodal.extractFeaturesOracle,
    "q36_frame_sample" -> Multimodal.frameSampleOracle,
    "q37_stream_tumbling" -> streaming.EventStream.tumblingStatsOracle,
    "q38_stream_sliding" -> streaming.EventStream.slidingStatsOracle,
    "q39_session_window" -> streaming.EventStream.sessionStatsOracle,
    "q40_stratified_sample" -> MLOps.stratifiedSampleOracle,
    "q41_pair_separation" -> MLOps.pairSeparationOracle,
    "q42_cube" -> SetAggOps.cubePriorityStatusOracle,
    "q43_adler_partition" -> TextOps.adlerPartitionOracle,
    "q44_ensemble_vote" -> MLOps.ensembleClassifyOracle,
    "q45_salted_join" -> Skew.saltedRevenueByNationOracle,
    "q46_asof_join" -> Joins.asofAttributionOracle,
    "q47_sketches" -> Sketches.sketchStatsOracle,
    "q60_quantile_sketch" -> Sketches.quantileSketchOracle,
    "q48_pivot" -> EventOps.eventTypePivotOracle,
    "q49_percentiles" -> EventOps.quantityPercentilesOracle,
    "q50_pii_scrub" -> Pipeline.piiScrubOracle,
    "q51_repetition" -> Pipeline.repetitionFilterOracle,
    "q52_source_mix" -> Pipeline.sourceMixtureOracle,
    "q53_contamination" -> Pipeline.contaminationOracle,
    "q54_ann_ivf" -> Similarity.annIvfTopKOracle,
    "q55_range_join" -> Joins.rangeJoinClicksOracle,
    "q56_stream_join" -> streaming.EventStream.clickAttributionCountsOracle,
    "q57_grouping_sets" -> SetAggOps.groupingSetsPriorityStatusOracle,
    "q58_json_props" -> EventOps.jsonPropsStatsOracle,
    "q59_dup_clusters" -> Dedup.dupClustersOracle,
    "q61_dedup_keepers" -> Dedup.dedupKeepersOracle,
    "q62_token_packing" -> Pipeline.tokenPackingOracle,
    "q63_domain_quota" -> Pipeline.domainQuotaOracle,
    "q64_table_profile" -> Sketches.tableProfileOracle,
    "q65_snapshot_delta" -> Pipeline.snapshotDeltaOracle,
    "q66_sqlgate_roundtrip" -> SetAggOps.langHistogramOracle,
    "q67_curation_funnel" -> Pipeline.curationFunnelOracle,
    "q68_lm_score" -> TextAnalysis.lmScoreOracle,
    "q69_boilerplate" -> TextAnalysis.boilerplateOracle,
    "q70_chunk_layout" -> Pipeline.chunkLayoutOracle,
    "q71_int8_quant" -> Similarity.int8QuantStatsOracle,
    "q72_bpe_pairs" -> TextAnalysis.bpePairsOracle,
    "q73_split_audit" -> MLOps.trainValTestSplitOracle,
    "q74_session_bounds" -> streaming.EventStream.sessionWindowBoundsOracle,
    "q75_dup_spans" -> Dedup.dupSpansOracle,
    "q76_split_leakage" -> MLOps.splitLeakageOracle,
    "q77_quality_keepers" -> Dedup.qualityKeepersOracle,
    "q78_semantic_clusters" -> Similarity.semanticClustersOracle,
    "q79_snapshot_novelty" -> Pipeline.snapshotNoveltyOracle,
    "q80_shard_balance" -> Pipeline.shardBalanceOracle,
    "q81_semantic_lsh" -> Similarity.semanticClustersLshOracle,
    "q82_session_quota" -> streaming.EventStream.sessionQuotaOracle,
    "q83_tfidf_terms" -> TextAnalysis.tfidfTermsOracle,
    "q84_difficulty_bins" -> TextAnalysis.difficultyBinsOracle,
    "q85_token_budget" -> Pipeline.tokenBudgetSampleOracle,
    "q86_mix_temperature" -> Pipeline.mixTemperatureOracle,
    "q87_source_overlap" -> Dedup.sourceOverlapOracle,
    "q88_cluster_reps" -> Similarity.clusterRepsOracleAt(0.4),
    "q89_source_jaccard" -> Sketches.sourceJaccardKmvOracle,
    "q90_retention" -> EventOps.retentionCohortsOracle,
    "q91_funnel" -> EventOps.funnelStagesOracle,
    "q92_transitions" -> EventOps.eventTransitionsOracle,
    "q93_hourly_anomaly" -> EventOps.hourlyAnomalyOracle,
    "q94_weighted_sample" -> Pipeline.weightedSampleOracle,
    "q95_decayed_engagement" -> EventOps.decayedEngagementOracle,
    "q96_quality_outliers" -> TextAnalysis.qualityOutliersOracle,
    "q97_length_profile" -> TextAnalysis.lengthProfileOracle,
    "q98_accident_csv" -> Accident.dangerScoresOracle,
    "q99_image_decode" -> Multimodal.imageDecodeStatsOracle,
    "q100_dim_profile" -> Similarity.dimProfileOracle,
    "q101_hard_negatives" -> Similarity.hardNegativesOracle,
    "q102_doc_rarity" -> TextAnalysis.docRarityOracle,
    "q103_event_trigrams" -> EventOps.eventTrigramsOracle,
    "q104_collocations" -> TextAnalysis.collocationsOracle,
    "q105_vocab_growth" -> TextAnalysis.vocabGrowthOracle,
    "q106_bloom_semi" -> Joins.bloomSemiSegmentsOracle,
    "q107_stream_dedup" -> streaming.EventStream.dedupReplayStatsOracle,
    "q108_score_calibration" -> TextAnalysis.scoreCalibrationOracle,
    "q109_neardup_degrees" -> Similarity.nearDupDegreeProfileOracle,
    "q110_kanon_mix" -> Pipeline.kAnonymousMixOracle,
    "q111_user_profile" -> EventOps.userBehaviorProfileOracle,
    "q112_token_weighted_lengths" -> TextAnalysis.tokenWeightedLengthProfileOracle,
    "q113_heavy_hitters" -> TextAnalysis.heavyHittersOracle,
    "q114_kmeans_step" -> Similarity.kmeansStepOracle,
    "q115_gap_fill" -> EventOps.gapFillSummaryOracle,
    "q116_pagerank_hubs" -> Similarity.pageRankHubsOracle,
    "q117_winsorize" -> EventOps.winsorizeBoundsOracle,
    "q118_rolling_active" -> EventOps.rollingActiveUsersOracle,
    "q119_ann_recall" -> Similarity.annRecallAuditOracle,
    "q120_next_event_baseline" -> EventOps.nextEventBaselineOracle,
    "q121_prefix_dups" -> Dedup.prefixDupsOracle,
    "q122_merge_upsert" -> Pipeline.mergeUpsertOracle,
    "q123_triangles" -> Similarity.triangleCensusOracle,
    "q124_vector_audit" -> Similarity.vectorAuditOracle,
    "q125_stopword_drift" -> TextAnalysis.stopwordDriftOracle,
    "q126_cooccurrence_lift" -> EventOps.cooccurrenceLiftOracle,
    "q127_data_map" -> TextAnalysis.dataMapOracle,
    "q128_lexical_diversity" -> TextAnalysis.lexicalDiversityOracle,
    "q129_affinity_plan" ->
      graft.mr.AffinityPlan.assignmentOracleSql("nation", "n_name", 4),
    "q130_incremental_dedup" -> Dedup.incrementalDedupOracle,
    "q131_emb_admission" -> Similarity.embAdmissionOracle,
    "q132_stream_admission" -> streaming.DocStream.streamAdmissionOracle,
    "q133_admission_index" -> AdmissionIndex.admissionRejectOracle,
    "q134_stream_neardup" -> AdmissionIndex.streamNearDupOracle,
    "q135_emb_admission_index" -> AdmissionIndex.embAdmissionIndexedOracle,
    "q136_stream_emb_admission" -> AdmissionIndex.streamEmbAdmissionOracle,
    "q137_admission_lifecycle" -> AdmissionIndex.admissionLifecycleOracle,
    "q138_admission_compaction" -> AdmissionIndex.admissionCompactionOracle,
    "q139_front_door" -> AdmissionIndex.frontDoorOracle,
    "q140_span_scrub" -> Dedup.scrubDupSpansOracle,
    "q141_emb_lifecycle" -> AdmissionIndex.embAdmissionLifecycleOracle,
    "q142_emb_compaction" -> AdmissionIndex.embAdmissionCompactionOracle,
    "q143_front_door_lifecycle" -> AdmissionIndex.frontDoorLifecycleOracle,
    "q144_front_door_compaction" -> AdmissionIndex.frontDoorCompactionOracle,
    "q145_front_door_stream" -> AdmissionIndex.frontDoorStreamLifecycleOracle,
    "q146_triangle_sample" -> Similarity.triangleSampleOracle,
    "q147_triangle_advisor" -> Similarity.triangleAdvisorOracle,
    "q148_stream_sunk" -> AdmissionIndex.streamNearDupSunkOracle
  )
}
