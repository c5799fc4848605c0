package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Every implemented operator registers a query here; SQL-expressible ones
  * also carry DuckDB oracle SQL (same column names, same ordering, floats
  * rounded identically on both sides).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.groupAvgBrandFlag(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // --- relational core (§2.2–2.7) ---
    "q01_groupavg_brand_flag" -> (Relational.groupAvgBrandFlag _),
    "q02_groupavg_type_status" -> (Relational.groupAvgTypeStatus _),
    "q03_filter_eq" -> (Relational.filterEq _),
    "q04_having" -> (Relational.havingSupport _),
    "q05_join_left_outer" -> (Relational.joinLeftOuter _),
    "q06_join_semi" -> (Relational.joinSemi _),
    "q07_join_anti" -> (Relational.joinAnti _),
    "q08_topk" -> (Relational.topK _),
    "q09_distinct" -> (Relational.distinctPairs _),
    "q10_count_distinct" -> (Relational.countDistinct _),
    "q11_scalar_funcs" -> (Relational.scalarFuncs _),
    "q12_group_collect" -> (Relational.groupCollect _),
    "q13_fmt_11dp" -> (Relational.fmt11dp _),
    "q14_sql_api" -> (Relational.sqlApi _),
    "q15_global_agg" -> (Relational.globalAgg _),
    "q16_set_ops" -> (Relational.setOps _),
    "q17_window_running" -> (Relational.windowRunning _),
    "q18_rollup" -> (Relational.rollupAgg _),
    "q19_sketches" -> (Relational.sketches _),
    "q1a_pivot" -> (Relational.pivotByStatus _),
    "q1b_percentiles" -> (Relational.percentiles _),
    "q1c_column_stats" -> (Relational.columnStats _),
    "q1d_range_frame" -> (Relational.windowRangeFrame _),
    "q1f_cube" -> (Relational.cubeAgg _),
    "q1i_except_all" -> (Relational.setOpsAll _),
    "q1j_collect_set" -> (Relational.groupCollectSet _),
    "q1g_ntile" -> (Relational.ntileQuartiles _),
    // correlated scalar subquery (Catalyst decorrelation) via spark.sql
    "q1h_scalar_subquery" -> (Relational.aboveCustomerAvg _),
    // custom typed Aggregator (UDAF surface) — oracle replays exp(avg(ln))
    "q1e_geomean" -> (Relational.geoMean _),
    // deterministic multiplicative-hash train/val/test assignment
    "q57_hash_split" -> (Sampling.trainValTest _),
    // per-stratum deterministic downsampling (corpus rebalance)
    "q76_stratified_sample" -> (Sampling.rebalanceByLang _),
    // native session_window aggregation; shares q62's oracle
    "q75_session_window" -> ((s, d) => Events.sessionizeNative(s, d)),
    // --- basket analytics (§2.9 G1) ---
    "q20_freq_items" -> ((s, d) => Baskets.freqItems(s, d)),
    "q21_freq_pairs" -> ((s, d) => Baskets.freqPairs(s, d)),
    "q22_son" -> ((s, d) => Baskets.son(s, d)),
    "q23_freq_pairs_generator" -> ((s, d) => Baskets.freqPairsViaGenerator(s, d)),
    // --- graph (§2.9 G2–G6) ---
    "q30_cograph_edges" -> (GraphOps.edgesQuery _),
    "q31_degrees" -> (GraphOps.degrees _),
    "q32_conncomp" -> (GraphOps.connectedComponents _),
    "q33_betweenness" -> ((s, d) => GraphOps.betweennessQuery(s, d)),
    "q36_betweenness_sampled" ->
      ((s, d) => GraphOps.betweennessSampledQuery(s, d, 0.25)),
    "q34_communities" -> ((s, d) => GraphOps.communities(s, d)),
    "q35_modularity_curve" -> ((s, d) => GraphOps.modularityCurve(s, d)),
    // --- dedup (training-data pipeline) ---
    "q40_dedup_exact" -> (Dedup.exact _),
    // the signature MATRIX on the portable hash stack (md5-quadword base
    // hashes + exact-integer affine permutations) — DuckDB replays every
    // value, so the matrix itself is an equality oracle
    "q41_minhash_sig" -> ((s, d) => Dedup.minhashSignatures(s, d)),
    "q42_minhash_pairs" -> ((s, d) => Dedup.minhashPairs(s, d)),
    "q43_simhash" -> (Dedup.simhash _),
    "q44_simhash_pairs" -> ((s, d) => Dedup.simhashPairs(s, d)),
    "q45_ngram_jaccard" -> ((s, d) => Dedup.ngramJaccardTopK(s, d)),
    // ingest shape: delta-vs-corpus candidates only (spec: equals the
    // full pair set restricted to pairs touching the delta)
    "q4b_dedup_incremental" -> ((s, d) => Dedup.minhashPairsIncremental(s, d)),
    // one-permutation signatures (one pass vs 128 folds); recall vs the
    // dense signature measured in DedupSpec
    "q4c_minhash_oph" -> ((s, d) => Dedup.minhashPairsOph(s, d)),
    // --- similarity search ---
    "q46_ann_brute" -> ((s, d) => Similarity.cosineTopK(s, d)),
    "q47_ann_lsh" -> ((s, d) => Similarity.cosineTopKLsh(s, d)),
    // nTables = 16: the gate fixtures' top pairs sit near cosine 0.45
    // (~63°), where per-table collision is ~0.27 at 3 bits — 16
    // OR-amplified tables recall every exact top-25 pair (measured: max
    // first-colliding table = 14 on both gate fixtures; SimilaritySpec
    // pins engine == brute top-20), which is what makes the exact-pair
    // DuckDB oracle sound
    "q48_cosine_neardup" -> ((s, d) => Similarity.cosineNearDups(s, d, nTables = 16)),
    "q49_ann_native" -> ((s, d) => Similarity.cosineTopKNative(s, d)),
    "q4a_ann_ivf" ->
      ((s, d) => Similarity.cosineTopKIvf(s, d, nCells = IvfCells,
        kmeansIters = LloydIters)),
    // product quantization: ADC shortlist + exact re-rank. Since round 12
    // a FULL equality oracle (like q4a/q8h): the driver-side fixed-order
    // Lloyd trainers are bit-stable, so DuckDB replays the whole training
    // loop with ordered aggregates (lloydCentsChain / pqCodebookChain).
    // Geometry comes from the shared PqM/PqK/LloydIters vals — the SAME
    // vals the oracle SQL interpolates, so engine call and oracle
    // constants cannot drift independently.
    "q59_ann_pq" ->
      ((s, d) => Similarity.cosineTopKPq(s, d, m = PqM, kCodes = PqK,
        iters = LloydIters)),
    // the q4a/q59 tiers with the quantizer PINNED to the deterministic
    // stride-sample (kmeansIters/iters = 0). Historically these were the
    // only oracle-able tiers (the treeAggregate-era Lloyd refinement was
    // run-nondeterministic); they stay as the simpler, iteration-free
    // oracle anchor and the warm-path twins the streaming/batch faces
    // share — the REFINED tiers now carry their own unrolled-Lloyd oracle
    "qbe_ann_ivf_rerank" -> ((s, d) => Similarity.cosineTopKIvf(s, d, kmeansIters = 0)),
    "qbf_ann_pq_rerank" -> ((s, d) => Similarity.cosineTopKPq(s, d, iters = 0)),
    // --- text analysis ---
    "q50_text_stats" -> (TextOps.textStats _),
    "q51_token_topk" -> ((s, d) => TextOps.tokenTopK(s, d)),
    "q52_lang_id" -> (TextOps.langId _),
    "q53_fingerprint" -> (TextOps.fingerprint _),
    "q54_clean_corpus" -> ((s, d) => TextOps.cleanCorpusStats(s, d)),
    "q55_bpe_tokens" -> ((s, d) => TextOps.bpeTokenTopK(s, d)),
    // LSH pairs → connected components → keeper; oracled via the exact
    // J >= 0.5 pair set + recursive closure (banding recall 1.0 on the
    // fixtures, DedupSpec-pinned, so the pair lists coincide)
    "q56_dedup_groups" -> ((s, d) => Dedup.dedupGroups(s, d)),
    // file-source streaming exact dedup; shares q40's oracle (the drained
    // stream equals the batch groupBy — min-keeper is arrival-order-free)
    "q58_dedup_stream" -> ((s, d) =>
      graft.streaming.DedupStream.dedupExactFromFiles(s, d)),
    // streaming LSH near-dup: delta files probe the static corpus band
    // index per micro-batch (stream-static join, no state store); drained
    // result == q4b exactly, so it shares q4b's exact-pair oracle
    "qbb_dedup_stream_lsh" -> ((s, d) =>
      graft.streaming.DedupStream.minhashPairsFromStream(s, d)),
    // near-dup-aware split: the split key is the q56 group, so no
    // near-dup pair ever straddles the train/test wall
    "qbc_groupaware_split" -> ((s, d) => Sampling.groupAwareSplit(s, d)),
    // concat-and-cut packing manifest: global token offsets via the
    // two-phase prefix sum (no single-partition global window)
    "qbd_packing_manifest" -> ((s, d) => TextOps.packingManifest(s, d)),
    // manifest-driven packed-corpus source (the 100 TB tiny-file answer:
    // pack files + (path, offset, length) manifest, record-aligned byte
    // slices planned distributed); shares q50's oracle like q84
    "qbg_manifest_source" -> ((s, d) =>
      graft.sources.ManifestDocs.textStatsFromManifest(s, d)),
    // the manifest WRITER's output relation: deterministic pack
    // assignment (doc_id mod nPacks) + doc_id order make every offset a
    // per-pack integer prefix sum the oracle replays exactly
    "qbq_manifest_writer" -> ((s, d) =>
      graft.sources.ManifestDocs.manifestRelation(s, d)),
    // --- event/window analytics ---
    "q60_events_hourly" -> (Events.hourly _),
    "q61_events_ranked" -> ((s, d) => Events.ranked(s, d)),
    // custom LogicalPlan+Strategy+SparkPlan top-k-per-group (plans/)
    "q66_topk_per_group_native" -> ((s, d) => Events.rankedNative(s, d)),
    "q62_sessionize" -> ((s, d) => Events.sessionize(s, d)),
    "q63_events_json" -> (Events.jsonProps _),
    // as-of join: union + carry-forward window, oracled by DuckDB ASOF JOIN
    "q67_asof_join" -> (Events.lastPurchaseAsof _),
    // q60's aggregation fed from a JSON-lines round-trip (shares q60's oracle)
    "q73_events_json_source" -> (Events.hourlyFromJson _),
    // forward as-of (next-event attribution); DuckDB ASOF with <=
    "q74_asof_forward" -> (Events.nextPurchaseAsof _),
    // as-of with staleness tolerance (match nulled when > 24h old)
    "q77_asof_tolerance" -> ((s, d) => Events.lastPurchaseAsofFresh(s, d)),
    // range join: bin-bucketed equi-join vs DuckDB's inequality join
    "q68_range_join" -> (Events.clicksAfterErrors _),
    // --- multimodal (real ImageIO PNG decode; batched per partition) ---
    // MERGE/upsert kernel (union + per-key priority pick on TopKPerGroup)
    "q72_upsert" -> (Mutations.upsertQuery _),
    "q70_media_features" -> (graft.multimodal.MediaOps.mediaFeatureQuery _),
    "q71_media_nearest" -> ((s, d) => graft.multimodal.MediaOps.mediaNearest(s, d)),
    // the streaming-capable plan (watermark + window()) run as batch
    "q64_events_hourly_streamplan" -> ((s, d) =>
      graft.streaming.EventStream.hourlyCounts(Tables(s, d, "events"))
        .orderBy("hour_s", "event_type")),
    // file-source Structured Streaming sessionizer, drained end-to-end;
    // shares q62's oracle (streaming == batch once the watermark flushes)
    "q65_sessionize_stream" -> ((s, d) =>
      graft.streaming.EventStream.sessionizeFromFiles(s, d)),
    // stream-stream interval join drained end-to-end; shares q68's oracle
    "q69_range_join_stream" -> ((s, d) =>
      graft.streaming.EventStream.clicksAfterErrorsStream(s, d)),
    // --- round-3 surface ---
    // TF-IDF top terms per doc (integer-deterministic ranking)
    "q78_tfidf" -> ((s, d) => TextOps.tfidfTopTerms(s, d)),
    // explicit GROUPING SETS lattice (rollup/cube generalization)
    "q79_grouping_sets" -> (Relational.groupingSetsAgg _),
    // lag/lead inter-arrival features per user
    "q7a_lead_lag" -> (Events.leadLag _),
    // sliding 1h/30min windows (streaming-capable window() plan)
    "q7b_sliding_window" -> (Events.slidingCounts _),
    // q60's aggregation through an ORC round-trip (shares q60's oracle)
    "q7c_events_orc_source" -> (Events.hourlyFromOrc _),
    // skew-salted join, result-equal to the plain join (shares q14's oracle)
    "q7d_salted_join" -> (ScaleOps.saltedJoinQuery _),
    // INTERSECT ALL (multiset dual of q1i's EXCEPT ALL)
    "q7e_intersect_all" -> (Relational.intersectAllOp _),
    // train/benchmark n-gram decontamination (pre-training hygiene)
    "q80_decontaminate" -> ((s, d) => TextOps.decontaminate(s, d)),
    // Gopher-style repetition quality gate
    "q81_repetition_quality" -> ((s, d) => TextOps.repetitionQuality(s, d)),
    // corpus bigram statistics (collocations / vocabulary)
    "q82_bigram_topk" -> ((s, d) => TextOps.bigramTopK(s, d)),
    // partition-pruned layout: write Hive-partitioned, read ONE partition
    "q83_pruned_scan" -> ((s, d) => ScaleOps.prunedScanQuery(s, d)),
    // binaryFile ingest → q50's stats (shares q50's oracle)
    "q84_binaryfile_source" -> (graft.sources.BinaryDocs.textStatsFromFiles _),
    // bloom-prefiltered semi-join, result-equal to the plain semi-join
    "q85_bloom_semi" -> ((s, d) => ScaleOps.bloomSemiJoin(s, d)),
    // token-offset packing via distributed two-level prefix sum
    "q86_pack_offsets" -> ((s, d) => TextOps.packSequences(s, d)),
    // fixed-size token chunking with stride (RAG / context-window prep)
    "q87_chunk_docs" -> ((s, d) => TextOps.chunkDocs(s, d)),
    // 10 power iterations over the co-purchase graph (oracle: unrolled CTEs)
    "q88_pagerank" -> ((s, d) => GraphOps.pageRank(s, d)),
    // per-vertex triangle counts, degree-oriented "forward" join
    "q89_triangles" -> ((s, d) => GraphOps.triangleCounts(s, d)),
    // edit-distance self-join via deletion-neighborhood (SymSpell) blocking
    "q8a_fuzzy_join" -> ((s, d) => FuzzyJoin.customerNamePairs(s, d)),
    // Count-Min sketch → shortlist → exact-verify heavy hitters
    "q8b_cms_heavy" -> ((s, d) => Relational.cmsHeavyHitters(s, d)),
    // per-label mean-pooled normalized embeddings (mergeable vector UDAF)
    "q8c_embed_pool" -> (Similarity.meanPoolByLabel _),
    // bucketed co-located join as an end-to-end query (zero-shuffle join)
    "q8d_bucketed_join" -> (ScaleOps.bucketedJoinQuery _),
    // cross-document repeated n-gram spans (exact-substring dedup face)
    "q8e_repeated_ngrams" -> ((s, d) => TextOps.repeatedNgrams(s, d)),
    // corpus-unigram LM scoring (cheap quality / outlier signal)
    "q8g_unigram_logprob" -> (TextOps.unigramLogProb _),
    // spherical k-means corpus clustering profile (SemDeDup shape); full
    // equality oracle since round 12 — the bit-stable driver-side trainer
    // is replayed in DuckDB by lloydCentsChain's unrolled ordered-sum Lloyd
    "q8h_kmeans_profile" -> ((s, d) =>
      Similarity.kmeansClusterProfile(s, d, nCells = IvfCells,
        iters = LloydIters)),
    // the profile with the quantizer PINNED to the stride sample (the
    // qbe/qbf discipline): the iteration-free oracle anchor
    "qbh_kmeans_pinned" -> ((s, d) =>
      Similarity.kmeansClusterProfile(s, d, iters = 0)),
    // SemDeDup decision table (pinned quantizer, distinct-vector collapse,
    // cell-bounded NN): one row per vector with its within-cell nearest
    // neighbor and the keep-lowest-id dup verdict — full DuckDB replay
    "qbj_semantic_dedup" -> ((s, d) => Similarity.semanticDedup(s, d)),
    // cross-document boilerplate: top word-8-grams by distinct contents
    // containing them (exact-dup collapse first; hash-free string oracle)
    "qbi_boilerplate_grams" -> ((s, d) => TextOps.boilerplateGrams(s, d)),
    // doc-level duplicated-span fraction (qbi's per-document twin):
    // distinct-content collapse, portable gram hashes, integer permille
    "qbk_dup_span_ratio" -> ((s, d) => TextOps.dupSpanRatio(s, d)),
    // hashed-feature linear quality classifier, pinned integer weights
    "qbl_quality_score" -> ((s, d) => TextOps.qualityScore(s, d)),
    // cross-document repeated-span scrub (qbk's transform counterpart)
    "qbm_span_scrub" -> ((s, d) => TextOps.spanScrub(s, d)),
    // pinned-hash CMS register table — the sketch construction in SQL
    "qbn_cms_pinned" -> ((s, d) => TextOps.cmsPinned(s, d)),
    // per-source quota cap through the TopKPerGroup physical operator
    "qbp_source_quota" -> ((s, d) => Sampling.sourceQuota(s, d)),
    // pinned-hash HLL register table (p=8), rank via portable bin()
    "qbo_hll_registers" -> ((s, d) => TextOps.hllRegisters(s, d)),
    // content-defined chunking (codegen'd rolling boundary) + chunk dedup
    "q8i_cdc_chunks" -> ((s, d) => TextOps.cdcChunkStats(s, d)),
    // DataSourceV2 multi-char-delim reader (column pruning + filter
    // pushdown in the scan); shares q09's oracle through the round trip
    "q8f_dsv2_source" -> (graft.sources.DelimV2.distinctFlags _),
    // synchronous deterministic label propagation — the distributed
    // community tier beside GN (rows-only; GraphSpec invariants)
    "q8j_lpa_communities" -> ((s, d) => GraphOps.communitiesLpa(s, d)),
    // Efraimidis-Spirakis weighted sampling on the portable arithmetic
    // uniform — global top-k by key, no per-source shuffle
    "q8k_weighted_sample" -> ((s, d) => Sampling.weightedSample(s, d)),
    // FULL OUTER with danglers on both sides (null semantics + side tag)
    "q8l_full_outer" -> ((s, d) => Relational.fullOuterParts(s, d)),
    // gap-filled hourly resample: dense generated axis, zero-fill +
    // carry-forward interpolation
    "q8m_resample_gapfill" -> (Events.hourlyGapfill _),
    // survivorship dedup: keep the highest-quality member per group
    "q8n_dedup_survivors" -> ((s, d) => Dedup.dedupSurvivors(s, d)),
    // ordered conversion funnel (stage-k strictly after stage-(k-1))
    "q8o_funnel" -> (Events.funnel _),
    // first-seen-day cohorts × day-offset active-user retention
    "q8p_cohort_retention" -> ((s, d) => Events.cohortRetention(s, d)),
    // email/digit-run redaction (deterministic planted PII, mirrored oracle)
    "q8q_pii_scrub" -> (TextOps.piiScrub _),
    // per-document token-distribution Shannon entropy (quality signal)
    "q8r_token_entropy" -> (TextOps.tokenEntropy _),
    // percent_rank + cume_dist distribution-position windows
    "q8s_percent_rank" -> (Relational.percentRankBal _),
    // UNPIVOT/melt — pivot round-trip lands on the plain GROUP BY
    "q8t_unpivot" -> (Relational.unpivotTotals _),
    // source-mixture temperature weights (w ∝ n^α) for epoch sampling
    "q8u_mixture_weights" -> ((s, d) => Sampling.mixtureWeights(s, d)),
    // two-phase distributed Pareto frontier (local sweep → global sweep)
    "q8v_skyline" -> (Skyline.skylineQuery _),
    // train/val token-distribution Jensen–Shannon drift (bits)
    "q8w_jsd_drift" -> (TextOps.jsdDrift _),
    // exact interpolated MEDIAN per group beside avg
    "q8x_median" -> (Relational.medianBal _),
    // correlated LATERAL subquery (ORDER BY + LIMIT), decorrelated
    "q8y_lateral_topk" -> (Relational.lateralTopCustomer _),
    // single-source BFS hop distances (frontier join per superstep)
    "q8z_sssp" -> ((s, d) => GraphOps.sssp(s, d)),
    // deterministic per-group mode (rank-1-of-count; TopKRewrite-routed)
    "q9a_mode" -> (Relational.modeNation _),
    // equal-width histogram with broadcast min/max bounds
    "q9b_histogram" -> ((s, d) => Relational.histogramTotals(s, d)),
    // streaming CDC apply (latest-wins state per key), drained end-to-end;
    // shares q72's oracle (max-of-struct state is arrival-order-free)
    "q9c_cdc_stream" -> ((s, d) =>
      graft.streaming.CdcStream.upsertFromFiles(s, d)),
    // item-item CF recommendations: binary cosine on co-occurrence,
    // native top-k per item (TopKRewrite window)
    "q9d_item_recs" -> ((s, d) => Recommend.itemItemTopK(s, d)),
    // k-core peeling to fixpoint (dense-substructure primitive)
    "q9e_kcore" -> ((s, d) => GraphOps.kCore(s, d)),
    // trailing-window z-score anomaly per event type
    "q9f_hourly_anomaly" -> (Events.hourlyAnomaly _),
    // first-order Markov transition matrix over per-user event sequences
    "q9g_transitions" -> (Events.eventTransitions _),
    // vocabulary-growth (Heaps) curve: cumulative tokens vs distinct vocab
    "q9h_vocab_growth" -> (TextOps.vocabGrowth _),
    // DSv2 AGGREGATE pushdown: count/min/max served from the scan
    "q9i_dsv2_agg" -> (graft.sources.DelimV2.aggStats _),
    // higher-order array functions (transform/aggregate/filter), no explode
    "q9j_hof_stats" -> (TextOps.tokenLengthStats _),
    // RFM quartile segmentation of purchasing users
    "q9k_rfm" -> (Events.rfmSegments _),
    // per-type hourly-volume OLS trend via regr_* aggregates
    "q9l_trend" -> (Events.hourlyTrend _),
    // sessions-as-baskets: support/lift between co-occurring event types
    "q9m_session_lift" -> ((s, d) => Events.sessionLift(s, d)),
    // HITS hubs/authorities on the bipartite customer-part incidence
    "q9n_hits" -> ((s, d) => GraphOps.hits(s, d)),
    // Benford first-digit audit (arithmetic digit, never string cast)
    "q9o_benford" -> (Relational.benfordTotals _),
    // SCD type-2 history build from the event stream (runs → intervals)
    "q9p_scd2" -> (Events.scd2History _),
    // entity resolution: fuzzy match edges → CC → canonical entity id
    "q9q_entities" -> ((s, d) => FuzzyJoin.entities(s, d)),
    // the pair-budget tier: hot variant buckets semi-joined away before
    // pair enumeration (bounded recall trade, oracle mirrors the cap)
    "qba_entities_capped" -> ((s, d) => FuzzyJoin.entitiesCapped(s, d)),
    // z-order clustered layout round-trip, 2-d box predicate
    "q9r_zorder_box" -> (ScaleOps.zorderedBoxQuery _),
    // distributed d×d Gramian via the mergeable GramSum aggregate
    "q9s_gramian" -> (Linalg.gramian _),
    // top principal direction: cluster Gramian + driver power iteration
    "q9t_pca_power" -> ((s, d) => Linalg.pcaPower(s, d)),
    // deterministic contrastive negative sampling (offset-mod-n, no self)
    "q9u_neg_pairs" -> ((s, d) => Sampling.negativePairs(s, d)),
    // leave-one-out temporal split (last event per user = eval)
    "q9v_loo_split" -> (Sampling.leaveOneOutSplit _),
    // stream-static broadcast enrichment join, drained end-to-end
    "q9w_stream_enrich" -> (graft.streaming.EventStream.enrichedNationCounts _),
    // incremental aggregate maintenance: stored partials + delta merge
    "q9x_incr_agg" -> ((s, d) => Events.incrementalHourly(s, d)),
    // cumulative distinct users (first-seen agg before the global window)
    "q9y_cum_users" -> (Events.cumulativeUsers _),
    // snapshot-as-of (time travel): priority filter + latest-wins pick
    "q9z_snapshot_asof" -> ((s, d) => Mutations.snapshotAt(s, d)),
    // projection onto the PCA top direction, magnitude-ranked shortlist
    "qa0_pca_scores" -> ((s, d) => Linalg.pcaScores(s, d)),
    // Zipf rank-frequency OLS fit (corpus-health diagnostic)
    "qa1_zipf" -> ((s, d) => TextOps.zipfFit(s, d)),
    // q46 as pure SQL text: injected registry + rewrite rules end-to-end
    "qa2_ann_sql" -> (Similarity.cosineTopKSql _),
    // interval×interval overlap join (bin join + pair dedup)
    "qa3_interval_overlap" -> (Events.overlapJoin _),
    // approximate aggregate from a deterministic sample, with 95% CI
    "qa4_sampled_estimate" -> ((s, d) => Sampling.sampledEstimate(s, d)),
    // mergeSchema read across epochs with different schemas
    "qa5_schema_evolution" -> (ScaleOps.schemaEvolutionRead _),
    // null-safe equality join + explicit NULLS FIRST ordering
    "qa6_null_safe_join" -> (Relational.nullSafeJoin _),
    // personalized PageRank: restart mass on one seed = proximity score
    "qa7_ppr" -> ((s, d) => GraphOps.personalizedPageRank(s, d)),
    // union of overlapping intervals per user (gaps-and-islands merge)
    "qa8_interval_merge" -> ((s, d) => Events.intervalCoverage(s, d)),
    // EXACT distinct-count via mergeable per-segment roaring bitmaps
    "qa9_bitmap_distinct" -> (Relational.bitmapDistinct _),
    // freshness: time-decayed popularity ranking (Σ exp(−λ·age))
    "qaa_decay_topk" -> ((s, d) => Relational.decayedPopularity(s, d)),
    // ordered sequential-pattern pairs (a strictly before b per session)
    "qab_seq_pairs" -> ((s, d) => Events.seqPairs(s, d)),
    // adjacent-pair PMI collocations (phrase mining)
    "qac_bigram_pmi" -> ((s, d) => TextOps.bigramPmi(s, d)),
    // exact set-similarity join via global-rarity prefix filtering
    "qad_prefix_join" -> ((s, d) => Dedup.prefixJaccardJoin(s, d)),
    // int8 embedding quantization round trip + reconstruction-error audit
    "qae_int8_quant" -> (Linalg.int8Quant _),
    // per-group winsorized (p05/p95-clipped) averages
    "qaf_winsorize" -> (Relational.winsorize _),
    // longest consecutive-day streak (gaps-and-islands, dense axis)
    "qag_streaks" -> (Events.activityStreaks _),
    // hourly-series autocorrelation at lag 1 / lag 24 (seasonality screen)
    "qah_autocorr" -> (Events.hourlyAutocorr _),
    // top session-opening event paths (ordered first-3 sequence mining)
    "qai_path_topk" -> ((s, d) => Events.sessionPathTopK(s, d)),
    // BPE-ish tokens per whitespace word, per language (fertility)
    "qaj_fertility" -> (TextOps.tokenizerFertility _),
    // deterministic epoch shuffle + sharding (hash permutation, no sort)
    "qak_epoch_shuffle" -> ((s, d) => Sampling.epochShuffle(s, d)),
    // contrastive hard negatives: nearest neighbor with a different label
    "qal_hard_negatives" -> ((s, d) => Similarity.hardNegatives(s, d)),
    // per-label centroids + nearest-other-centroid separation audit
    "qam_label_centroids" -> (Linalg.labelCentroids _),
    // join-key skew diagnostics: Gini, max share, top-10 share
    "qan_key_skew" -> (ScaleOps.keySkew _),
    // BM25 ranked retrieval for a deterministic 5-term query
    "qao_bm25" -> ((s, d) => TextOps.bm25(s, d)),
    // exact two-sample Kolmogorov–Smirnov drift between hash-split halves
    "qap_ks_drift" -> (Sampling.ksDrift _),
    // median-absolute-deviation robust outlier screen per group
    "qaq_mad_outliers" -> ((s, d) => Relational.madOutliers(s, d)),
    // truncated-EWMA smoothing of the hourly series per event type
    "qar_ewma" -> ((s, d) => Events.hourlyEwma(s, d)),
    // global + average-local clustering coefficients (transitivity)
    "qas_clustering_coeff" -> (GraphOps.clusteringCoeff _),
    // Pareto/Lorenz revenue-concentration curve by customer decile
    "qat_pareto" -> (Relational.paretoCurve _),
    // per-user churn screen vs the corpus max day
    "qau_churn" -> ((s, d) => Events.churnFlags(s, d)),
    // dense 7×24 day-of-week×hour profile with χ²-vs-uniform terms
    "qav_dow_profile" -> (Events.dowHourProfile _),
    // smoothed log-odds emerging/receding terms between corpus epochs
    "qaw_emerging_terms" -> ((s, d) => TextOps.emergingTerms(s, d)),
    // histogram-product join-cardinality estimate (exact for equi-joins)
    "qax_join_cardinality" -> (ScaleOps.joinCardinality _),
    // exact-dedup savings report per source (docs and chars removed)
    "qay_dedup_savings" -> (TextOps.dedupSavings _),
    // degree histogram + complementary CDF (graph-health fingerprint)
    "qaz_degree_dist" -> (GraphOps.degreeDistribution _),
    // cart abandonment per day (click but no purchase afterwards)
    "qb0_cart_abandon" -> (Events.cartAbandonment _),
    // held-out bigram-LM cross-entropy / perplexity per eval doc
    "qb1_bigram_ppl" -> ((s, d) => TextOps.bigramPerplexity(s, d)),
    // directed containment join (subset/boilerplate detection)
    "qb2_containment" -> ((s, d) => Dedup.containmentJoin(s, d)),
    // session-duration histogram on the exact decimal-digit scale
    "qb3_session_hist" -> (Events.sessionDurationHist _),
    // Adamic–Adar link prediction over non-adjacent co-purchase pairs
    "qb4_adamic_adar" -> ((s, d) => GraphOps.adamicAdar(s, d)),
    // rolling 7-day exact median of daily revenue (integer-cents base)
    "qb5_rolling_median" -> (Relational.rollingMedianRevenue _),
    // trapezoidal time-weighted average of each user's value series
    "qb6_time_weighted" -> (Events.timeWeightedAvg _),
    // order-independent md5-XOR content fingerprint per table partition
    "qb7_fingerprint" -> (Relational.tableFingerprint _),
    // co-purchase edges with the hot-item frequency cap (viral parts
    // excluded before the quadratic pair join — the 100 TB skew guard)
    "qb8_copurchase_capped" -> ((s, d) => GraphOps.coPurchaseEdgesCapped(s, d)),
    // the no-driver-OOM betweenness tier run end-to-end at fraction 1.0:
    // join-based Brandes, edge list never leaves the executors
    "qb9_betweenness_distributed" ->
      ((s, d) => GraphOps.betweennessDistributedQuery(s, d)),
  )

  /** DuckDB oracle SQL per query (omitted → driver does a rows-only check).
    * Table names resolve against the same parquet fixtures. */
  def oracleSql: Map[String, String] = {
    val m = baseOracleSql
    // custom-expression variants produce byte-identical results to their
    // built-in twins and share the oracle
    m + ("q23_freq_pairs_generator" -> m("q21_freq_pairs")) +
      ("q49_ann_native" -> m("q46_ann_brute")) +
      ("q65_sessionize_stream" -> m("q62_sessionize")) +
      ("q66_topk_per_group_native" -> m("q61_events_ranked")) +
      ("q58_dedup_stream" -> m("q40_dedup_exact")) +
      ("qbb_dedup_stream_lsh" -> incrementalPairsOracle) +
      // q56's closure labels the groups, q57's arithmetic splits them;
      // ungrouped docs key on their own id (left join + coalesce)
      ("qbc_groupaware_split" ->
        s"""WITH RECURSIVE $dedupClosureCte,
           |keyed AS (SELECT d.doc_id,
           |    coalesce(lab.group_id, d.doc_id) AS group_id
           |  FROM documents d LEFT JOIN lab ON lab.doc_id = d.doc_id),
           |f AS (SELECT doc_id, group_id,
           |    (group_id * 2654435761) % 4294967296 / 4294967296.0 AS frac
           |  FROM keyed)
           |SELECT doc_id, group_id,
           |  CASE WHEN frac < 0.9 THEN 'train'
           |       WHEN frac < 0.95 THEN 'val' ELSE 'test' END AS split
           |FROM f ORDER BY doc_id""".stripMargin) +
      // integer token counts -> one global running sum; window arithmetic
      // is exact, so first/last window ids replay bit-for-bit
      ("qbd_packing_manifest" ->
        """WITH t AS (SELECT doc_id, CAST(len(list_filter(
          |    string_split_regex(lower(text), '\s+'), x -> len(x) > 0)) AS INT)
          |    AS n_tokens FROM documents),
          |c AS (SELECT doc_id, n_tokens,
          |    CAST(sum(n_tokens) OVER (ORDER BY doc_id) - n_tokens AS BIGINT)
          |      AS start
          |  FROM t)
          |SELECT doc_id, n_tokens, start,
          |  CAST(floor(start / 512) AS BIGINT) AS seq_first,
          |  CAST(floor((start + n_tokens - 1) / 512) AS BIGINT) AS seq_last,
          |  CAST(floor((start + n_tokens - 1) / 512) -
          |       floor(start / 512) + 1 AS BIGINT) AS n_seqs
          |FROM c ORDER BY doc_id""".stripMargin) +
      // the pack writer's byte accounting: pack = doc_id mod 8, offset =
      // running sum of (12 header bytes + UTF-8 payload bytes) in doc_id
      // order within the pack — all-integer, so the window replay is
      // bit-exact (strlen = BYTE length in DuckDB, = octet_length in Spark)
      ("qbq_manifest_writer" ->
        """WITH t AS (SELECT doc_id, doc_id % 8 AS pack,
          |    CAST(coalesce(strlen(text), 0) AS BIGINT) AS nbytes
          |  FROM documents)
          |SELECT doc_id, pack,
          |  CAST(sum(12 + nbytes) OVER (PARTITION BY pack ORDER BY doc_id)
          |       - (12 + nbytes) AS BIGINT) AS start,
          |  nbytes
          |FROM t ORDER BY doc_id""".stripMargin) +
      ("q69_range_join_stream" -> m("q68_range_join")) +
      ("q73_events_json_source" -> m("q60_events_hourly")) +
      ("q75_session_window" -> m("q62_sessionize")) +
      ("q7c_events_orc_source" -> m("q60_events_hourly")) +
      ("q7d_salted_join" -> m("q14_sql_api")) +
      ("q84_binaryfile_source" -> m("q50_text_stats")) +
      ("qbg_manifest_source" -> m("q50_text_stats")) +
      ("q8f_dsv2_source" -> m("q09_distinct")) +
      ("q9c_cdc_stream" -> m("q72_upsert")) +
      ("qa2_ann_sql" -> m("q46_ann_brute")) +
      ("q33_betweenness" -> betweennessOracle) +
      // the SAMPLED tier's oracle: the same SQL Brandes restricted to the
      // portably-hashed source set (srcKeySql == the engine's
      // portableSourceKey bit-for-bit), credits rescaled by 1/fraction
      ("q36_betweenness_sampled" ->
        s"""WITH RECURSIVE ${betweennessCteFor(3, BtwUnrollDepth,
             srcFilter = srcKeySql("a") + " < 250000")}
           |SELECT u, v, round(btw * 4, 6) AS btw_est FROM btw
           |ORDER BY round(btw * 4, 9) DESC, u, v""".stripMargin) +
      ("q35_modularity_curve" -> modularityCurveOracle) +
      // Exact-pair oracles for the LSH/blocked near-dup faces (the q56
      // method): the banding/blocking itself is not SQL, but every face's
      // OUTPUT is the exact-verified pair set, which is. Validity:
      //  - q42/q4c: DedupSpec pins banding recall 1.0 AND that no fixture
      //    pair falls in the banding-lossy Jaccard band [0.5, 0.85) — the
      //    32×4 S-curve's miss probability at the fixtures' J ≥ 0.85 is
      //    < 1e-9, so engine pairs = the exact J ≥ 0.5 set, values from
      //    the same round-6dp formula (hashed shingles are a set-
      //    preserving relabeling, the q45 argument).
      //  - q4b: the same set restricted to pairs touching the delta
      //    (spec: incremental = full ∩ delta).
      //  - q44: DETERMINISTICALLY complete — 4×16-bit chunk blocking
      //    covers hamming ≤ 3 by pigeonhole, no probabilistic step; the
      //    portable md5-quadword token hash (qb7's md5_number_lower
      //    alignment) lets DuckDB replay the SimHash fingerprints bit-
      //    for-bit. Same for q43's raw fingerprints.
      ("q42_minhash_pairs" ->
        s"""WITH $exactJaccardPairsCte
           |SELECT doc_a, doc_b, jaccard FROM e WHERE jaccard >= 0.5
           |ORDER BY jaccard DESC, doc_a, doc_b""".stripMargin) +
      ("q4c_minhash_oph" ->
        s"""WITH $exactJaccardPairsCte
           |SELECT doc_a, doc_b, jaccard FROM e WHERE jaccard >= 0.5
           |ORDER BY jaccard DESC, doc_a, doc_b""".stripMargin) +
      ("q4b_dedup_incremental" -> incrementalPairsOracle) +
      // pinned k-means profile (qbh): stride-sample centroids → argmax
      // assignment (ties to the lower cell) → per-cluster population /
      // coherence / exemplar, all replayed; 4-dp rounding absorbs the
      // cross-engine float-sum-order jitter in avg(csim)
      ("qbh_kmeans_pinned" ->
        """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v,
          |       sqrt(list_inner_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
          |     FROM embeddings),
          |n AS (SELECT greatest(1, count(*) // 16) AS stride FROM e),
          |cents AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS cell,
          |            list_transform(v, x -> x / nrm) AS cv
          |          FROM e, n WHERE vec_id % n.stride = 0 ORDER BY vec_id LIMIT 16),
          |sim AS (SELECT e.vec_id, c.cell, list_inner_product(e.v, c.cv) / e.nrm AS csim
          |        FROM e, cents c),
          |rk AS (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, cell) AS r FROM sim),
          |asg AS (SELECT vec_id, cell, csim FROM rk WHERE r = 1),
          |ex AS (SELECT cell, vec_id AS exemplar FROM (
          |         SELECT *, row_number() OVER (PARTITION BY cell ORDER BY csim DESC, vec_id) AS r FROM asg)
          |       WHERE r = 1)
          |SELECT a.cell, count(*) AS n_members, round(avg(a.csim), 4) AS avg_cos,
          |       round(min(a.csim), 4) AS min_cos, any_value(ex.exemplar) AS exemplar
          |FROM asg a JOIN ex ON ex.cell = a.cell
          |GROUP BY a.cell ORDER BY a.cell""".stripMargin) +
      // SemDeDup decision table (qbj): distinct-vector groups (exact
      // copies resolve at cosine 1.0 against their own group — min pairs
      // with second-lowest id, copies pair with the min), pinned-quantizer
      // cell assignment, rep-level within-cell argmax NN (6-dp cosine,
      // ties to the lower id), and the keep-lowest-id verdict — the whole
      // pipeline replayed
      ("qbj_semantic_dedup" ->
        """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v,
          |       sqrt(list_inner_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
          |     FROM embeddings),
          |n AS (SELECT greatest(1, count(*) // 16) AS stride FROM e),
          |cents AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS cell,
          |            list_transform(v, x -> x / nrm) AS cv
          |          FROM e, n WHERE vec_id % n.stride = 0 ORDER BY vec_id LIMIT 16),
          |vg AS (SELECT v, min(vec_id) AS rep, count(*) AS n_copies FROM e GROUP BY v),
          |sec AS (SELECT vg.rep, min(e.vec_id) AS second_id
          |        FROM e JOIN vg ON e.v = vg.v AND e.vec_id > vg.rep GROUP BY vg.rep),
          |er AS (SELECT vg.rep, vg.v, e.nrm FROM vg JOIN e ON e.vec_id = vg.rep),
          |sim AS (SELECT er.rep, c.cell, list_inner_product(er.v, c.cv) / er.nrm AS csim
          |        FROM er, cents c),
          |asg AS (SELECT rep, cell FROM (SELECT *, row_number() OVER (PARTITION BY rep
          |          ORDER BY csim DESC, cell) AS r FROM sim) WHERE r = 1),
          |p AS (SELECT a.rep, b.rep AS nn_rep,
          |        round(list_cosine_similarity(ea.v, eb.v), 6) AS nn_cos
          |      FROM asg a JOIN asg b ON a.cell = b.cell AND a.rep <> b.rep
          |      JOIN er ea ON ea.rep = a.rep JOIN er eb ON eb.rep = b.rep),
          |nn AS (SELECT rep, nn_rep, nn_cos FROM (SELECT *, row_number() OVER (
          |         PARTITION BY rep ORDER BY nn_cos DESC, nn_rep) AS r FROM p) WHERE r = 1),
          |base AS (SELECT e.vec_id, vg.rep, vg.n_copies FROM e JOIN vg ON e.v = vg.v),
          |o AS (SELECT b.vec_id, a.cell,
          |    CASE WHEN b.n_copies >= 2 THEN
          |        (CASE WHEN b.vec_id = b.rep THEN s.second_id ELSE b.rep END)
          |      ELSE nn.nn_rep END AS nn_id,
          |    CAST(CASE WHEN b.n_copies >= 2 THEN 1.0 ELSE nn.nn_cos END AS DOUBLE) AS nn_cos
          |  FROM base b JOIN asg a ON a.rep = b.rep
          |  LEFT JOIN sec s ON s.rep = b.rep
          |  LEFT JOIN nn ON nn.rep = b.rep)
          |SELECT vec_id, cell, nn_id, nn_cos,
          |  coalesce(nn_cos >= 0.9 AND nn_id < vec_id, false) AS is_semdup
          |FROM o ORDER BY vec_id""".stripMargin) +
      // cross-document boilerplate (qbi): exact-dup collapse on md5 of the
      // content, per-content DISTINCT 8-gram windows, corpus counts with
      // the >= 2 distinct-contents floor, top-50 on the total string order
      ("qbi_boilerplate_grams" ->
        """WITH c AS (SELECT count(*) AS n_copies, min(text) AS txt
          |           FROM documents GROUP BY md5(text)),
          |t AS (SELECT n_copies, list_filter(string_split_regex(lower(txt), '\s+'),
          |        x -> len(x) > 0) AS w FROM c),
          |g AS (SELECT n_copies, unnest(list_distinct(list_transform(range(1, len(w) - 6),
          |        i -> array_to_string(w[i:i+7], ' ')))) AS gram
          |      FROM t WHERE len(w) >= 8)
          |SELECT gram, CAST(sum(n_copies) AS BIGINT) AS n_docs,
          |       count(*) AS n_contents
          |FROM g GROUP BY 1 HAVING count(*) >= 2
          |ORDER BY n_contents DESC, n_docs DESC, gram LIMIT 50""".stripMargin) +
      // doc-level duplicated-span fraction (qbk): distinct-content
      // collapse, per-content DISTINCT 8-gram hashes with the engine's
      // short-doc clamp (< 8 tokens -> one truncated gram, '' for empty
      // text), corpus share counts on the portable md5 gram key, integer
      // permille (floor == trunc, all values nonnegative) re-expanded to
      // every doc_id by the content-hash join
      ("qbk_dup_span_ratio" ->
        """WITH d AS (SELECT doc_id, md5(text) AS ch FROM documents),
          |c AS (SELECT md5(text) AS ch, min(text) AS text
          |      FROM documents GROUP BY 1),
          |t AS (SELECT ch, list_filter(string_split_regex(lower(text), '\s+'),
          |        x -> len(x) > 0) AS w FROM c),
          |gr AS (SELECT ch, unnest(list_distinct(list_transform(
          |        range(1, greatest(len(w) - 6, 2)),
          |        i -> md5_number_lower(array_to_string(w[i:i+7], ' '))))) AS g
          |       FROM t),
          |cnt AS (SELECT g, count(*) AS nc FROM gr GROUP BY g),
          |s AS (SELECT ch, count(*) AS n_grams,
          |        sum(CASE WHEN nc >= 2 THEN 1 ELSE 0 END) AS n_shared
          |      FROM gr JOIN cnt USING (g) GROUP BY ch)
          |SELECT doc_id, CAST(n_grams AS BIGINT) AS n_grams,
          |  CAST(n_shared AS BIGINT) AS n_shared,
          |  CAST(n_shared * 1000 // n_grams AS BIGINT) AS dup_permille
          |FROM d JOIN s USING (ch) ORDER BY doc_id""".stripMargin) +
      // hashed-feature linear quality classifier (qbl): bucket =
      // md5_number_lower(token) % 256 (== the engine's pmod of the signed
      // md5_quad64 since 2^64 % 256 = 0), LCG weight in [-1000, 1000],
      // frequency-weighted integer sum per doc — exact equality, no float
      ("qbl_quality_score" ->
        """WITH u AS (SELECT doc_id, unnest(list_filter(
          |    string_split_regex(lower(text), '\s+'), x -> len(x) > 0)) AS token
          |  FROM documents),
          |w AS (SELECT doc_id,
          |    CAST(((md5_number_lower(token) % 256) * 1103515245 + 12345) % 2001
          |         AS BIGINT) - 1000 AS w
          |  FROM u)
          |SELECT doc_id, count(*) AS n_tokens,
          |  CAST(sum(w) AS BIGINT) AS qscore,
          |  CAST(sum(w) AS BIGINT) > 0 AS keep
          |FROM w GROUP BY doc_id ORDER BY doc_id""".stripMargin) +
      // repeated-span scrub (qbm): positional 8-gram windows over distinct
      // contents (short-doc clamp included), shared = >= 2 distinct
      // contents, coverage = union of window spans truncated at the doc
      // end, clean text = the uncovered tokens in position order over the
      // NORMALIZED (lowercased) stream — string_agg(ORDER BY p) mirrors
      // the engine's sorted-struct re-assembly exactly
      ("qbm_span_scrub" ->
        """WITH d AS (SELECT doc_id, md5(text) AS ch FROM documents),
          |c AS (SELECT md5(text) AS ch, min(text) AS text
          |      FROM documents GROUP BY 1),
          |t AS (SELECT ch, list_filter(string_split_regex(lower(text), '\s+'),
          |        x -> len(x) > 0) AS w FROM c),
          |gr0 AS (SELECT ch, len(w) AS nw, unnest(list_transform(
          |          range(1, greatest(len(w) - 6, 2)),
          |          i -> {'i1': i, 'g': md5_number_lower(array_to_string(w[i:i+7], ' '))}))
          |          AS s FROM t),
          |gr AS (SELECT ch, nw, struct_extract(s, 'i1') AS i1,
          |         struct_extract(s, 'g') AS g FROM gr0),
          |sh AS (SELECT g FROM (SELECT g, count(DISTINCT ch) AS nc
          |                      FROM gr GROUP BY g) WHERE nc >= 2),
          |cov0 AS (SELECT gr.ch, unnest(range(gr.i1, least(gr.i1 + 8, gr.nw + 1))) AS p
          |         FROM gr JOIN sh USING (g)),
          |cov AS (SELECT DISTINCT ch, p FROM cov0),
          |u0 AS (SELECT ch, unnest(list_transform(range(1, len(w) + 1),
          |         p -> {'p': p, 'tok': w[p]})) AS s FROM t),
          |u AS (SELECT ch, struct_extract(s, 'p') AS p,
          |        struct_extract(s, 'tok') AS tok FROM u0),
          |uc AS (SELECT u.ch, u.p, u.tok FROM u
          |       LEFT JOIN cov ON cov.ch = u.ch AND cov.p = u.p
          |       WHERE cov.ch IS NULL),
          |cl AS (SELECT ch, count(*) AS n_kept,
          |         string_agg(tok, ' ' ORDER BY p) AS clean_text
          |       FROM uc GROUP BY ch)
          |SELECT d.doc_id, CAST(len(t.w) AS BIGINT) AS n_tokens,
          |  CAST(len(t.w) - coalesce(cl.n_kept, 0) AS BIGINT) AS n_removed,
          |  coalesce(cl.clean_text, '') AS clean_text
          |FROM d JOIN t USING (ch) LEFT JOIN cl ON cl.ch = t.ch
          |ORDER BY doc_id""".stripMargin) +
      // pinned-hash CMS register table (qbn): bucket_i(token) =
      // md5_number_lower(i ':' token) % 256 == the engine's pmod of the
      // signed md5_quad64 (2^64 % 256 = 0) — the sketch construction
      // itself as an exact-equality oracle (depth 4 x width 256)
      ("qbn_cms_pinned" ->
        """WITH u AS (SELECT unnest(list_filter(
          |    string_split_regex(lower(text), '\s+'), x -> len(x) > 0)) AS token
          |  FROM documents),
          |r AS (SELECT t.row_i,
          |        md5_number_lower(concat(t.row_i::VARCHAR, ':', token)) % 256
          |          AS bucket
          |      FROM u, range(4) t(row_i))
          |SELECT CAST(row_i AS BIGINT) AS row_i, CAST(bucket AS BIGINT) AS bucket,
          |  count(*) AS cnt
          |FROM r GROUP BY 1, 2 ORDER BY row_i, bucket""".stripMargin) +
      // pinned-hash HLL register table (qbo): register = top 8 bits of
      // the unsigned md5 quadword, rank = first-1-bit position of the
      // remaining 56 bits via length(bin(rem)) — bin() is minimal-length
      // binary of a nonnegative integer in BOTH engines, so the rank is
      // exact integer arithmetic (57 - length; all-zero remainder = 57)
      ("qbo_hll_registers" ->
        """WITH u AS (SELECT unnest(list_filter(
          |    string_split_regex(lower(text), '\s+'), x -> len(x) > 0)) AS token
          |  FROM documents),
          |h AS (SELECT md5_number_lower(token) AS h FROM u),
          |r AS (SELECT CAST(h // 72057594037927936 AS BIGINT) AS reg,
          |        CAST(h % 72057594037927936 AS BIGINT) AS rem FROM h)
          |SELECT reg,
          |  CAST(max(CASE WHEN rem = 0 THEN 57 ELSE 57 - length(bin(rem)) END)
          |       AS BIGINT) AS max_rank
          |FROM r GROUP BY reg ORDER BY reg""".stripMargin) +
      // per-source quota cap (qbp, k=20): k smallest md5-mod-2^32 doc hashes
      // per source (signed pmod == unsigned modulo at powers of two),
      // doc_id tie-break — the engine runs it through the TopKPerGroup
      // physical operator, the oracle through a plain window; equality
      // of the two formulations is the point
      ("qbp_source_quota" ->
        """WITH d AS (SELECT source, doc_id,
          |    md5_number_lower(concat('quota:', doc_id::VARCHAR)) % 4294967296
          |      AS qk
          |  FROM documents),
          |r AS (SELECT source, doc_id, CAST(row_number() OVER (
          |        PARTITION BY source ORDER BY qk, doc_id) AS BIGINT) AS rn
          |      FROM d)
          |SELECT source, doc_id, rn FROM r WHERE rn <= 20
          |ORDER BY source, rn""".stripMargin) +
      // IVF with the PINNED stride-sample quantizer (qbe): centroids are
      // the normalized vectors at vec_id % stride = 0 (first 16 by id),
      // so DuckDB replays cell assignment (argmax cosine-to-centroid,
      // ties to the lower cell), the nprobe=4 probe set, the cell-join
      // candidates, and the exact re-rank — the whole tier hash-checked.
      ("qbe_ann_ivf_rerank" ->
        """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v,
          |       sqrt(list_inner_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
          |     FROM embeddings),
          |n AS (SELECT greatest(1, count(*) // 16) AS stride FROM e),
          |cents AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS cell,
          |            list_transform(v, x -> x / nrm) AS cv
          |          FROM e, n WHERE vec_id % n.stride = 0 ORDER BY vec_id LIMIT 16),
          |sim AS (SELECT e.vec_id, c.cell, list_inner_product(e.v, c.cv) / e.nrm AS csim
          |        FROM e, cents c),
          |rk AS (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, cell) AS r FROM sim),
          |asg AS (SELECT vec_id, cell FROM rk WHERE r = 1),
          |probes AS (SELECT vec_id AS query_id, cell FROM rk WHERE vec_id < 100 AND r <= 4),
          |cand AS (SELECT DISTINCT p.query_id, a.vec_id AS neighbor_id
          |         FROM probes p JOIN asg a ON a.cell = p.cell
          |         WHERE p.query_id <> a.vec_id),
          |s AS (SELECT cand.query_id, cand.neighbor_id,
          |        round(list_cosine_similarity(a.v, b.v), 6) AS cosine
          |      FROM cand JOIN e a ON a.vec_id = cand.query_id
          |                JOIN e b ON b.vec_id = cand.neighbor_id)
          |SELECT query_id, CAST(rank AS INT) AS rank, neighbor_id, cosine FROM (
          |  SELECT *, row_number() OVER (PARTITION BY query_id
          |            ORDER BY cosine DESC, neighbor_id) AS rank FROM s)
          |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin) +
      // PQ with PINNED codebooks (qbf): codebook (mm, c) = subspace slice
      // of the c-th stride-sample vector, so DuckDB replays pq_encode
      // (per-subspace argmin L2, ties to the lower codeword), the ADC
      // scores, the 50-deep shortlist, and the exact re-rank.
      ("qbf_ann_pq_rerank" ->
        s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v,
          |       sqrt(list_inner_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
          |     FROM embeddings),
          |n AS (SELECT greatest(1, count(*) // $PqK) AS stride FROM e),
          |init AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS c,
          |           list_transform(v, x -> x / nrm) AS cv
          |         FROM e, n WHERE vec_id % n.stride = 0 ORDER BY vec_id LIMIT $PqK),
          |cw AS (SELECT c, mm.mm, cv[mm.mm * $PqSubdim + 1 : mm.mm * $PqSubdim + $PqSubdim] AS sub
          |       FROM init, range($PqM) mm(mm)),
          |u AS (SELECT vec_id, list_transform(v, x -> x / nrm) AS vn FROM e),
          |usub AS (SELECT vec_id, mm.mm, vn[mm.mm * $PqSubdim + 1 : mm.mm * $PqSubdim + $PqSubdim] AS vsub
          |         FROM u, range($PqM) mm(mm)),
          |dist AS (SELECT usub.vec_id, usub.mm, cw.c,
          |           list_sum(list_transform(range(1, ${PqSubdim + 1}), i -> (vsub[i] - sub[i]) * (vsub[i] - sub[i]))) AS d
          |         FROM usub JOIN cw ON cw.mm = usub.mm),
          |codes AS (SELECT vec_id, mm, c FROM (
          |            SELECT *, row_number() OVER (PARTITION BY vec_id, mm ORDER BY d, c) AS r FROM dist)
          |          WHERE r = 1),
          |adc AS (SELECT qs.vec_id AS query_id, cs.vec_id AS neighbor_id,
          |          sum(list_inner_product(qs.vsub, cw.sub)) AS a
          |        FROM usub qs
          |        JOIN codes cs ON cs.mm = qs.mm
          |        JOIN cw ON cw.mm = cs.mm AND cw.c = cs.c
          |        WHERE qs.vec_id < 100 AND qs.vec_id <> cs.vec_id
          |        GROUP BY qs.vec_id, cs.vec_id),
          |short AS (SELECT query_id, neighbor_id FROM (
          |            SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY a DESC, neighbor_id) AS r FROM adc)
          |          WHERE r <= 50),
          |s AS (SELECT short.query_id, short.neighbor_id,
          |        round(list_cosine_similarity(a.v, b.v), 6) AS cosine
          |      FROM short JOIN e a ON a.vec_id = short.query_id
          |                 JOIN e b ON b.vec_id = short.neighbor_id)
          |SELECT query_id, CAST(rank AS INT) AS rank, neighbor_id, cosine FROM (
          |  SELECT *, row_number() OVER (PARTITION BY query_id
          |            ORDER BY cosine DESC, neighbor_id) AS rank FROM s)
          |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin) +
      // The Lloyd-REFINED tiers, previously no_oracle ("FP-argmax
      // nondeterminism"): that rationale died when the trainers went
      // driver-side with one fixed summation order (bit-stable reruns),
      // because DuckDB's ordered aggregates replay the exact same sums —
      // see lloydCentsChain / pqCodebookChain. q8h = the qbh profile over
      // the REFINED quantizer; q4a = the qbe IVF tier over it; q59 = the
      // qbf PQ tier over Lloyd-refined codebooks.
      ("q8h_kmeans_profile" ->
        s"""WITH ${lloydCentsChain(IvfCells, LloydIters, EmbDim)},
           |sim AS (SELECT e.vec_id, c.cell, list_inner_product(e.v, c.cv) / e.nrm AS csim
           |        FROM e, cents c),
           |rk AS (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, cell) AS r FROM sim),
           |fasg AS (SELECT vec_id, cell, csim FROM rk WHERE r = 1),
           |ex AS (SELECT cell, vec_id AS exemplar FROM (
           |         SELECT *, row_number() OVER (PARTITION BY cell ORDER BY csim DESC, vec_id) AS r FROM fasg)
           |       WHERE r = 1)
           |SELECT a.cell, count(*) AS n_members, round(avg(a.csim), 4) AS avg_cos,
           |       round(min(a.csim), 4) AS min_cos, any_value(ex.exemplar) AS exemplar
           |FROM fasg a JOIN ex ON ex.cell = a.cell
           |GROUP BY a.cell ORDER BY a.cell""".stripMargin) +
      ("q4a_ann_ivf" ->
        s"""WITH ${lloydCentsChain(IvfCells, LloydIters, EmbDim)},
           |sim AS (SELECT e.vec_id, c.cell, list_inner_product(e.v, c.cv) / e.nrm AS csim
           |        FROM e, cents c),
           |rk AS (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, cell) AS r FROM sim),
           |fasg AS (SELECT vec_id, cell FROM rk WHERE r = 1),
           |probes AS (SELECT vec_id AS query_id, cell FROM rk WHERE vec_id < 100 AND r <= 4),
           |cand AS (SELECT DISTINCT p.query_id, a.vec_id AS neighbor_id
           |         FROM probes p JOIN fasg a ON a.cell = p.cell
           |         WHERE p.query_id <> a.vec_id),
           |s AS (SELECT cand.query_id, cand.neighbor_id,
           |        round(list_cosine_similarity(a.v, b.v), 6) AS cosine
           |      FROM cand JOIN e a ON a.vec_id = cand.query_id
           |                JOIN e b ON b.vec_id = cand.neighbor_id)
           |SELECT query_id, CAST(rank AS INT) AS rank, neighbor_id, cosine FROM (
           |  SELECT *, row_number() OVER (PARTITION BY query_id
           |            ORDER BY cosine DESC, neighbor_id) AS rank FROM s)
           |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin) +
      ("q59_ann_pq" ->
        s"""WITH ${pqCodebookChain(PqM, PqK, LloydIters, EmbDim)},
           |u AS (SELECT vec_id, list_transform(v, x -> x / nrm) AS vn FROM e),
           |usub AS (SELECT vec_id, mm.mm, vn[mm.mm * $PqSubdim + 1 : mm.mm * $PqSubdim + $PqSubdim] AS vsub
           |         FROM u, range($PqM) mm(mm)),
           |dist AS (SELECT usub.vec_id, usub.mm, cw.c,
           |           list_sum(list_transform(range(1, ${PqSubdim + 1}), i -> (vsub[i] - sub[i]) * (vsub[i] - sub[i]))) AS d
           |         FROM usub JOIN cw ON cw.mm = usub.mm),
           |codes AS (SELECT vec_id, mm, c FROM (
           |            SELECT *, row_number() OVER (PARTITION BY vec_id, mm ORDER BY d, c) AS r FROM dist)
           |          WHERE r = 1),
           |adc AS (SELECT qs.vec_id AS query_id, cs.vec_id AS neighbor_id,
           |          sum(list_inner_product(qs.vsub, cw.sub) ORDER BY qs.mm) AS a
           |        FROM usub qs
           |        JOIN codes cs ON cs.mm = qs.mm
           |        JOIN cw ON cw.mm = cs.mm AND cw.c = cs.c
           |        WHERE qs.vec_id < 100 AND qs.vec_id <> cs.vec_id
           |        GROUP BY qs.vec_id, cs.vec_id),
           |short AS (SELECT query_id, neighbor_id FROM (
           |            SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY a DESC, neighbor_id) AS r FROM adc)
           |          WHERE r <= 50),
           |s AS (SELECT short.query_id, short.neighbor_id,
           |        round(list_cosine_similarity(a.v, b.v), 6) AS cosine
           |      FROM short JOIN e a ON a.vec_id = short.query_id
           |                 JOIN e b ON b.vec_id = short.neighbor_id)
           |SELECT query_id, CAST(rank AS INT) AS rank, neighbor_id, cosine FROM (
           |  SELECT *, row_number() OVER (PARTITION BY query_id
           |            ORDER BY cosine DESC, neighbor_id) AS rank FROM s)
           |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin) +
      // FULL sign-LSH replay (q47): since round 9 the ±1 hyperplane
      // entries derive from the portable md5 low-quadword of "hp:t:b:i"
      // (Hyperplanes.signMatrix), so DuckDB rebuilds the exact plane
      // matrix, bucket ids (bit b of table t = sign of v·plane), the
      // candidate equijoin, and the exact-cosine re-rank — candidate
      // GENERATION and re-rank both hash-checked, not just the output
      // (the only float-semantics exposure is sign(v·plane) at d ≈ 0,
      // probability ~1e-14 per bit on these magnitudes). autoBits is
      // replayed arithmetically from count(*); nTables = 6, k = 5,
      // nQueries = 100 mirror the engine defaults.
      ("q47_ann_lsh" ->
        """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
          |n AS (SELECT count(*) AS n FROM e),
          |bits AS (SELECT coalesce((SELECT min(b) FROM range(1, 24) r(b), n
          |           WHERE (n.n // (1::BIGINT << CAST(b AS INT))) <= 64), 24) AS nb),
          |pl AS (SELECT t.t, b.b, i.i,
          |         CASE WHEN (md5_number_lower('hp:' || t.t || ':' || b.b || ':' || i.i) & 1) = 1
          |           THEN 1.0 ELSE -1.0 END AS s
          |       FROM range(6) t(t), range(24) b(b), bits, range(64) i(i)
          |       WHERE b.b < bits.nb),
          |vd AS (SELECT vec_id, i.i, v[i.i + 1] AS x FROM e, range(64) i(i)),
          |dots AS (SELECT vd.vec_id, pl.t, pl.b, sum(vd.x * pl.s) AS d
          |         FROM vd JOIN pl ON pl.i = vd.i GROUP BY vd.vec_id, pl.t, pl.b),
          |bk AS (SELECT vec_id, t, sum(CASE WHEN d > 0 THEN (1::BIGINT << CAST(b AS INT)) ELSE 0 END) AS bucket
          |       FROM dots GROUP BY vec_id, t),
          |cand AS (SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
          |         FROM bk q JOIN bk c ON q.t = c.t AND q.bucket = c.bucket
          |         WHERE q.vec_id < 100 AND q.vec_id <> c.vec_id),
          |s AS (SELECT cand.query_id, cand.neighbor_id,
          |        round(list_cosine_similarity(a.v, b.v), 6) AS cosine
          |      FROM cand JOIN e a ON a.vec_id = cand.query_id
          |                JOIN e b ON b.vec_id = cand.neighbor_id)
          |SELECT query_id, CAST(rank AS INT) AS rank, neighbor_id, cosine FROM (
          |  SELECT *, row_number() OVER (PARTITION BY query_id
          |            ORDER BY cosine DESC, neighbor_id) AS rank FROM s)
          |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin) +
      // q48's output == the exact global top-20 cosine pair set (the q42
      // flip argument applied to the embedding family): the LSH buckets
      // are candidate PRUNING, and SimilaritySpec pins that every exact
      // top-20 pair bucket-collides on the fixtures (with the planted
      // near-dup margin far above the collision-probability floor), so
      // engine pairs = exact pairs; values share q46's round-6dp
      // list_cosine_similarity equality, ordering is the same
      // (cosine desc, vec_a, vec_b) total order on both sides.
      ("q48_cosine_neardup" ->
        """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
          |p AS (SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
          |        round(list_cosine_similarity(a.v, b.v), 6) AS cosine
          |      FROM e a JOIN e b ON a.vec_id < b.vec_id)
          |SELECT vec_a, vec_b, cosine FROM p
          |ORDER BY cosine DESC, vec_a, vec_b LIMIT 20""".stripMargin) +
      // full MinHash signature-matrix replay (PortableMinHash): base hash
      // = md5_number_lower of the raw 3-gram string (engine's md5_quad64
      // alignment), permutation i = (h·(2i+1) + i·golden) mod 2^64 in
      // exact HUGEINT arithmetic, min over [0, 2^64) = the engine's
      // unsigned min, read back signed. Gram windows carry the engine's
      // clamp (a doc with < 3 tokens emits one truncated gram).
      ("q41_minhash_sig" ->
        """WITH t AS (SELECT doc_id,
          |  list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0) AS w
          |  FROM documents),
          |g AS (SELECT doc_id, list_transform(range(1, greatest(len(w) - 1, 2)), i ->
          |    md5_number_lower(array_to_string(w[i:i+2], ' '))) AS hs FROM t),
          |u AS (SELECT doc_id, unnest(hs) AS hv FROM g),
          |s AS (SELECT doc_id, r.i AS perm,
          |    min((CAST(hv AS HUGEINT) * (2 * r.i + 1)
          |         + CAST(r.i AS HUGEINT) * 11400714819323198485)
          |        % 18446744073709551616) AS mh
          |  FROM u CROSS JOIN range(128) r(i) GROUP BY doc_id, r.i)
          |SELECT doc_id, CAST(perm AS INT) AS perm,
          |  CAST(CASE WHEN mh >= 9223372036854775808
          |    THEN mh - 18446744073709551616 ELSE mh END AS BIGINT) AS minhash
          |FROM s ORDER BY doc_id, perm""".stripMargin) +
      ("q43_simhash" ->
        s"""WITH $portableSimhashCte
           |SELECT doc_id, fp FROM fps ORDER BY doc_id""".stripMargin) +
      // winnowing replay on the same portable gram hash. Grams convert to
      // SIGNED two's-complement before the window min — the engine's
      // array_min compares int64s, where values with the top bit set sort
      // BELOW positives, the opposite of unsigned order. bit_xor then runs
      // on the signed values directly (same bits, no read-back needed).
      // Window ranges carry the engine's greatest(...) CLAMPS: a doc with
      // < 5 tokens still emits one (truncated) gram and one fingerprint —
      // array_to_string over the truncated slice matches the engine's
      // concat_ws∘slice exactly, including the empty-text '' gram. The
      // unclamped range(1, len(w)-3) formulation silently DROPPED short
      // docs from the output (a latent equality-gate failure on any
      // fixture regen containing them).
      ("q53_fingerprint" ->
        """WITH t AS (SELECT doc_id,
          |  list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0) AS w
          |  FROM documents),
          |g AS (SELECT doc_id, list_transform(range(1, greatest(len(w) - 3, 2)), i ->
          |    CAST(CASE WHEN md5_number_lower(array_to_string(w[i:i+4], ' ')) >= 9223372036854775808
          |      THEN md5_number_lower(array_to_string(w[i:i+4], ' ')) - 18446744073709551616
          |      ELSE md5_number_lower(array_to_string(w[i:i+4], ' ')) END AS BIGINT)) AS grams FROM t),
          |m AS (SELECT doc_id, list_distinct(list_transform(range(1, greatest(len(grams) - 2, 2)),
          |    i -> list_aggregate(grams[i:i+3], 'min'))) AS fps FROM g),
          |u AS (SELECT doc_id, unnest(fps) AS f FROM m),
          |x AS (SELECT doc_id, count(*) AS n_fp, bit_xor(f) AS fp_xor FROM u GROUP BY doc_id)
          |SELECT doc_id, CAST(n_fp AS INT) AS n_fp, fp_xor
          |FROM x ORDER BY doc_id""".stripMargin) +
      ("q44_simhash_pairs" ->
        s"""WITH $portableSimhashCte
           |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           |  CAST(bit_count(xor(a.fpu, b.fpu)) AS BIGINT) AS hamming
           |FROM fps a JOIN fps b ON a.doc_id < b.doc_id
           |WHERE bit_count(xor(a.fpu, b.fpu)) <= 3
           |ORDER BY hamming, doc_a, doc_b""".stripMargin) +
      // the distributed tier's face: same SQL Brandes, minShared=5
      // subgraph (diameters 3/7 at the gate SFs), deeper unroll margin
      ("qb9_betweenness_distributed" ->
        s"""WITH RECURSIVE ${betweennessCteFor(5, 16)}
           |SELECT u, v, round(btw, 6) AS btw FROM btw
           |ORDER BY round(btw, 9) DESC, u, v""".stripMargin)
  }

  /** Exact edge betweenness as pure SQL: the Brandes forward/backward
    * passes unrolled level-by-level (the q9t discipline — data-dependent
    * iteration counts become a static unroll bounded above the fixture
    * graphs' diameter; levels past the real depth are empty and cost
    * nothing). Forward: level k = (src, v, σ) reached first at BFS depth
    * k, σ summed over parents; backward: per level, edge credit
    * σ_p/σ_w·(1+δ_w), δ flowing to parents. Validated against the
    * engine to ≤ 1e-12 per edge at sf0.01 (1494 vertices, 64 627 edges).
    *
    * Unroll depth is scoped to the CORRECTNESS-GATE fixtures: measured
    * co-purchase diameters are 2 (sf0.001) and 5 (sf0.01) at minShared=3
    * (depth 10 = 2× margin), 3 and 7 at minShared=5 (depth 16). The
    * sf0.1 minShared=3 graph is sparser (diameter ≥ 18) — the q33/q35
    * oracles are not valid there, and the gate never runs them there
    * (bench SFs are timed, not oracled).
    */
  /** BFS unroll depth of the SQL-Brandes oracles (q33/q35/q36): must
    * cover the co-purchase graph's DIAMETER at every verified SF or the
    * oracle silently truncates shortest paths and disagrees with the
    * (depth-unbounded) engine. Depth 10 was sized on sf0.01's dense
    * graph (diameter 4) and was exactly the kind of scale-dependent
    * oracle bug the round-12 sf0.1 harness run exists to catch: sf0.1's
    * SPARSER graph (14.8k edges over 10k vertices vs sf0.01's 64.6k over
    * 1.5k) has measured diameter 19, and the depth-10 oracle — not the
    * engine — produced wrong betweenness there. 24 = 19 + margin; stages
    * past the true frontier are empty and near-free, so sf0.01 cost is
    * unchanged. */
  private val BtwUnrollDepth = 24

  private def betweennessCte: String = betweennessCteFor(3, BtwUnrollDepth)

  /** DuckDB replay of [[graft.operators.GraphOps]]'s portable source key:
    * md5 low quadword of the id's decimal string, read signed, double-mod
    * pmod (both engines reduce `%` with sign-of-dividend). */
  private def srcKeySql(c: String): String = {
    val h = s"md5_number_lower(CAST($c AS VARCHAR))"
    s"((CAST(CASE WHEN $h >= 9223372036854775808 THEN $h - 18446744073709551616 " +
      s"ELSE $h END AS BIGINT) % 1000000) + 1000000) % 1000000"
  }

  private def betweennessCteFor(minShared: Int, depth: Int,
      srcFilter: String = ""): String = {
    val where = if (srcFilter.isEmpty) "" else s" WHERE $srcFilter"
    val head =
      s"""cp AS MATERIALIZED (SELECT DISTINCT o_custkey AS c, l_partkey AS p
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |e AS MATERIALIZED (SELECT a.c AS u, b.c AS v FROM cp a JOIN cp b
        |  ON a.p = b.p AND a.c < b.c GROUP BY 1, 2 HAVING count(*) >= $minShared),
        |und AS MATERIALIZED (SELECT u AS a, v AS b FROM e UNION ALL SELECT v, u FROM e),
        |l0 AS MATERIALIZED (SELECT DISTINCT a AS src, a AS v, CAST(1 AS DOUBLE) AS sigma FROM und$where),
        |vis0 AS MATERIALIZED (SELECT src, v FROM l0)""".stripMargin
    val fwd = (1 to depth).map { k =>
      s"""l$k AS MATERIALIZED (
         |  SELECT p.src, und.b AS v, sum(p.sigma) AS sigma
         |  FROM l${k - 1} p JOIN und ON und.a = p.v
         |  ANTI JOIN vis${k - 1} t ON t.src = p.src AND t.v = und.b
         |  GROUP BY 1, 2),
         |vis$k AS MATERIALIZED (
         |  SELECT src, v FROM vis${k - 1} UNION ALL SELECT src, v FROM l$k)""".stripMargin
    }.mkString(",\n")
    val seed = s"wd$depth AS MATERIALIZED (SELECT src, v, sigma, " +
      s"CAST(0 AS DOUBLE) AS delta FROM l$depth)"
    val bwd = (depth to 1 by -1).map { k =>
      val cred =
        s"""cred$k AS MATERIALIZED (
           |  SELECT w.src, p.v AS pu, w.v AS wu, p.sigma / w.sigma * (1 + w.delta) AS c
           |  FROM wd$k w JOIN und ON und.a = w.v
           |  JOIN l${k - 1} p ON p.src = w.src AND p.v = und.b)""".stripMargin
      if (k == 1) cred
      else cred + ",\n" +
        s"""wd${k - 1} AS MATERIALIZED (
           |  SELECT l.src, l.v, l.sigma, coalesce(dl.delta, 0) AS delta
           |  FROM l${k - 1} l LEFT JOIN (SELECT src, pu AS v, sum(c) AS delta
           |    FROM cred$k GROUP BY 1, 2) dl
           |    ON dl.src = l.src AND dl.v = l.v)""".stripMargin
    }.mkString(",\n")
    val allCreds = (depth to 1 by -1)
      .map(k => s"SELECT pu, wu, c FROM cred$k").mkString(" UNION ALL ")
    s"""$head,
       |$fwd,
       |$seed,
       |$bwd,
       |summed AS MATERIALIZED (SELECT least(pu, wu) AS u, greatest(pu, wu) AS v,
       |  sum(c) / 2 AS btw FROM ($allCreds) GROUP BY 1, 2),
       |btw AS MATERIALIZED (SELECT e.u, e.v, coalesce(s.btw, 0) AS btw
       |  FROM e LEFT JOIN summed s ON s.u = e.u AND s.v = e.v)""".stripMargin
  }

  private def betweennessOracle: String =
    s"""WITH RECURSIVE $betweennessCte
       |SELECT u, v, round(btw, 6) AS btw FROM btw
       |ORDER BY round(btw, 9) DESC, u, v""".stripMargin

  /** The GN modularity curve on top of the SQL Brandes: removal ranking by
    * the same 1e-9-quantized key as the engine, residual components per
    * curve point via the q32 pruned-label closure (keyed by k so all 15
    * points run in ONE recursive walk), then the closed-form reference
    * modularity Σ_c [E_c − (D_c² − S_c)/(4m)] / (2m) per point. */
  private def modularityCurveOracle: String =
    s"""WITH RECURSIVE $betweennessCte,
       |rankedE AS MATERIALIZED (SELECT u, v,
       |  row_number() OVER (ORDER BY round(btw, 9) DESC, u, v) AS rn FROM btw),
       |params AS (SELECT count(*) AS ne, greatest(1, count(*) // 14) AS s FROM e),
       |ks AS MATERIALIZED (SELECT unnest(range(0, CAST(ne // s + 1 AS BIGINT))) * s AS k FROM params),
       |resid AS MATERIALIZED (SELECT ks.k, r.u, r.v FROM ks, rankedE r WHERE r.rn > ks.k),
       |undk AS MATERIALIZED (SELECT k, u AS a, v AS b FROM resid
       |  UNION ALL SELECT k, v, u FROM resid),
       |vertsAll AS MATERIALIZED (SELECT DISTINCT a AS id FROM und),
       |walk(k, vertex, label) AS (
       |  SELECT k, a, b FROM undk WHERE b < a
       |  UNION
       |  SELECT undk.k, undk.a, walk.label FROM undk JOIN walk
       |    ON walk.k = undk.k AND walk.vertex = undk.b
       |  WHERE walk.label < undk.a),
       |lab2 AS MATERIALIZED (
       |  SELECT k, id, min(label) AS comp FROM (
       |    SELECT ks.k, verts.id, verts.id AS label FROM ks, vertsAll verts
       |    UNION ALL
       |    SELECT k, vertex AS id, label FROM walk)
       |  GROUP BY 1, 2),
       |deg2 AS MATERIALIZED (SELECT k, a AS id, count(*) AS dg FROM undk GROUP BY 1, 2),
       |mm AS (SELECT k, count(*) AS m FROM resid GROUP BY 1),
       |ec AS (SELECT r.k, lu.comp, count(*) AS ec FROM resid r
       |  JOIN lab2 lu ON lu.k = r.k AND lu.id = r.u
       |  JOIN lab2 lv ON lv.k = r.k AND lv.id = r.v
       |  WHERE lu.comp = lv.comp GROUP BY 1, 2),
       |ds AS (SELECT l.k, l.comp, sum(coalesce(dd.dg, 0)) AS dsum,
       |    sum(coalesce(dd.dg, 0) * coalesce(dd.dg, 0)) AS ssum
       |  FROM lab2 l LEFT JOIN deg2 dd ON dd.k = l.k AND dd.id = l.id GROUP BY 1, 2),
       |qv AS (SELECT ds.k,
       |    sum(coalesce(ec.ec, 0) - (ds.dsum * ds.dsum - ds.ssum) / (4.0 * mm.m)) / (2.0 * mm.m) AS q
       |  FROM ds JOIN mm ON mm.k = ds.k
       |  LEFT JOIN ec ON ec.k = ds.k AND ec.comp = ds.comp
       |  GROUP BY ds.k, mm.m),
       |nc AS (SELECT k, count(DISTINCT comp) AS n FROM lab2 GROUP BY 1)
       |SELECT CAST(ks.k AS INT) AS removed, CAST(nc.n AS INT) AS n_communities,
       |  CASE WHEN qv.q IS NULL THEN 0.0 ELSE round(qv.q, 6) END AS modularity
       |FROM ks JOIN nc ON nc.k = ks.k LEFT JOIN qv ON qv.k = ks.k
       |ORDER BY removed""".stripMargin

  /** The q56 near-dup grouping closure as a reusable CTE block: exact
    * J ≥ 0.5 edges over raw 3-gram sets, reachability closure, `lab` =
    * (doc_id, group_id = min reachable id). Valid for the same reason the
    * q56 oracle is (banding recall pinned structurally by DedupSpec's
    * lossy-band assertion). */
  private def dedupClosureCte: String =
    """t AS (SELECT doc_id,
      |  list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0) AS w
      |  FROM documents),
      |g AS MATERIALIZED (SELECT doc_id,
      |  list_distinct(list_transform(range(1, len(w) - 1),
      |    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS sh FROM t),
      |e AS MATERIALIZED (
      |  SELECT a.doc_id AS u, b.doc_id AS v
      |  FROM g a JOIN g b ON a.doc_id < b.doc_id
      |  WHERE round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
      |    (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))), 6) >= 0.5),
      |und AS MATERIALIZED (SELECT u, v FROM e UNION ALL SELECT v AS u, u AS v FROM e),
      |verts AS MATERIALIZED (SELECT DISTINCT u AS id FROM und),
      |reach(id, r) AS (
      |  SELECT id, id FROM verts
      |  UNION
      |  SELECT reach.id, und.v FROM reach JOIN und ON und.u = reach.r),
      |lab AS MATERIALIZED (SELECT id AS doc_id, min(r) AS group_id FROM reach GROUP BY id)""".stripMargin

  /** The q4b/qbb oracle: the exact J >= 0.5 pair set restricted to pairs
    * touching the delta (doc_id >= 400) — the batch-incremental face and
    * its streaming twin drain to the identical relation. */
  // the delta cutoff replays the engine's scale-invariant default —
  // the top fifth of the id space, integer-exact: (max+1)*4//5 = 400 on
  // the 500-doc driver fixtures, and the same CORPUS FRACTION at any sf
  // (Dedup.autoDeltaFrom)
  private def incrementalPairsOracle: String =
    s"""WITH $exactJaccardPairsCte,
       |cut AS (SELECT (max(doc_id) + 1) * 4 // 5 AS c FROM documents)
       |SELECT doc_a, doc_b, jaccard FROM e, cut
       |WHERE jaccard >= 0.5 AND (doc_a >= cut.c OR doc_b >= cut.c)
       |ORDER BY jaccard DESC, doc_a, doc_b""".stripMargin

  /** Shared CTE: raw word-3-gram shingle sets + ALL exact-Jaccard pairs
    * (`e`), the DuckDB-side ground truth the LSH faces' outputs equal on
    * the fixtures (see the flip rationale at the oracleSql call sites).
    * Same tokenization/shingling/round-6dp formula as q45/q56. */
  private def exactJaccardPairsCte: String =
    """t AS (SELECT doc_id,
      |  list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0) AS w
      |  FROM documents),
      |g AS MATERIALIZED (SELECT doc_id,
      |  list_distinct(list_transform(range(1, len(w) - 1),
      |    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS sh FROM t),
      |e AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |    round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
      |      (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))), 6) AS jaccard
      |  FROM g a JOIN g b ON a.doc_id < b.doc_id)""".stripMargin

  /** Shared CTE: bit-exact replay of the engine's SimHash fingerprints
    * ([[graft.functions.SimHash64]] over the PORTABLE md5-quadword token
    * hash = DuckDB's `md5_number_lower`, the qb7 alignment). Per bit j,
    * the engine sets it iff (#tokens with bit j) − (#without) > 0, i.e.
    * 2·#set > n; `fps` carries both the unsigned fingerprint (`fpu`, for
    * xor/bit_count) and its signed two's-complement reading (`fp`,
    * matching the engine's BIGINT output). Docs with no tokens keep
    * fp = 0 exactly as the engine's empty fold does. */
  private def portableSimhashCte: String =
    """t AS (SELECT doc_id,
      |  list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0) AS w
      |  FROM documents),
      |toks AS MATERIALIZED (SELECT doc_id, md5_number_lower(u.h) AS hv
      |  FROM (SELECT doc_id, unnest(w) AS h FROM t) u),
      |bits AS (SELECT doc_id, r.j,
      |    CASE WHEN 2 * sum(CASE WHEN (hv >> CAST(r.j AS INTEGER)) & 1 = 1
      |      THEN 1 ELSE 0 END) > count(*) THEN 1 ELSE 0 END AS b
      |  FROM toks CROSS JOIN range(64) r(j) GROUP BY doc_id, r.j),
      |fpraw AS (SELECT doc_id,
      |    sum(CASE WHEN b = 1 THEN CAST(1 AS UBIGINT) << CAST(j AS INTEGER)
      |        ELSE CAST(0 AS UBIGINT) END) AS fpsum
      |  FROM bits GROUP BY doc_id),
      |fps AS (SELECT t.doc_id,
      |    CAST(coalesce(fpraw.fpsum, 0) AS UBIGINT) AS fpu,
      |    CAST(CASE WHEN coalesce(fpraw.fpsum, 0) >= 9223372036854775808
      |      THEN coalesce(fpraw.fpsum, 0) - 18446744073709551616
      |      ELSE coalesce(fpraw.fpsum, 0) END AS BIGINT) AS fp
      |  FROM t LEFT JOIN fpraw USING (doc_id))""".stripMargin

  /** Unrolled DuckDB replay of [[graft.operators.Similarity.sphericalKMeans]]
    * — the move that flips the Lloyd-REFINED tiers (q8h/q4a) from
    * `no_oracle` to full hash equality. It became possible when the
    * trainer went driver-side with ONE fixed (vec_id-order) summation:
    * DuckDB's ordered aggregates (`sum(x ORDER BY vec_id)`) feed values
    * sequentially in the same order, so every Lloyd sum is the engine's
    * sum bit-for-bit. Emits CTEs `e` (raw vectors), `samp` (the bounded
    * stride sample, unit-normalized), `cents0..cents$iters` (one argmax
    * assignment + recenter per iteration, ties to the lower cell, empty /
    * zero-norm cells carrying the previous centroid — the engine's exact
    * rule), ending in `cents` = the refined quantizer. Residual float
    * exposure is the same class the PINNED twins (qbh/qbe) already
    * accept: an argmax could flip only on an exact dot-product tie at
    * ulp scale. */
  /** ANN-tier geometry shared by the Spark `queries` entries AND the
    * oracle SQL below: the q4a/q8h/q59 entries invoke
    * [[graft.operators.Similarity]] with THESE vals, and the chain
    * builders + the q59 body interpolate the same vals — so a change to
    * either side cannot silently desynchronize engine defaults from
    * oracle constants (the drift class round-12 advice flagged on q59's
    * hardcoded `range(8)` / `mm*8` slices). */
  private val EmbDim = 64
  private val IvfCells = 16
  private val LloydIters = 5
  private val PqM = 8
  private val PqK = 16
  private val PqSubdim = EmbDim / PqM

  private def lloydCentsChain(nCells: Int, iters: Int, dim: Int): String = {
    val sampleTarget = math.max(1000L, 100L * nCells)
    val head =
      s"""e AS (SELECT vec_id, embedding::DOUBLE[] AS v,
         |       sqrt(list_inner_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
         |     FROM embeddings),
         |n AS (SELECT greatest(1, count(*) // $nCells) AS stride,
         |             greatest(1, count(*) // $sampleTarget) AS rate FROM e),
         |cents0 AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS cell,
         |            list_transform(v, x -> x / nrm) AS cv
         |          FROM e, n WHERE vec_id % n.stride = 0 ORDER BY vec_id LIMIT $nCells),
         |samp AS (SELECT vec_id, list_transform(v, x -> x / nrm) AS uv
         |         FROM e, n WHERE vec_id % n.rate = 0 ORDER BY vec_id LIMIT ${2 * sampleTarget})""".stripMargin
    val steps = (1 to iters).map { j =>
      s"""asg$j AS (SELECT vec_id, uv, cell FROM (
         |    SELECT s.vec_id, s.uv, c.cell, row_number() OVER (PARTITION BY s.vec_id
         |      ORDER BY list_inner_product(s.uv, c.cv) DESC, c.cell) AS r
         |    FROM samp s, cents${j - 1} c) WHERE r = 1),
         |comp$j AS (SELECT cell, i.i AS i, sum(uv[i.i] ORDER BY vec_id) AS sv
         |          FROM asg$j, range(1, ${dim + 1}) i(i) GROUP BY cell, i.i),
         |mv$j AS (SELECT cell, list(sv ORDER BY i) AS m FROM comp$j GROUP BY cell),
         |cents$j AS (SELECT p.cell,
         |    CASE WHEN v.m IS NULL
         |           OR sqrt(list_sum(list_transform(v.m, x -> x * x))) = 0 THEN p.cv
         |         ELSE list_transform(v.m,
         |           x -> x / sqrt(list_sum(list_transform(v.m, y -> y * y)))) END AS cv
         |  FROM cents${j - 1} p LEFT JOIN mv$j v ON v.cell = p.cell)""".stripMargin
    }
    (head +: steps).mkString(",\n") +
      s",\ncents AS (SELECT cell, cv FROM cents$iters)"
  }

  /** Unrolled DuckDB replay of [[graft.operators.Similarity.pqCodebooks]]
    * (per-subspace L2 Lloyd), the q59 analog of [[lloydCentsChain]] —
    * same fixed-order-summation argument, argmin ties to the lower
    * codeword, empty codewords carrying over, codewords = plain means
    * (NOT renormalized). Emits `e`, `samp`, `ssub` (per-subspace sample
    * slices) and `cw0..cw$iters`, ending in `cw` = (mm, c, sub). */
  private def pqCodebookChain(m: Int, k: Int, iters: Int, dim: Int): String = {
    val subdim = dim / m
    val sampleTarget = math.max(1000L, 100L * k)
    val head =
      s"""e AS (SELECT vec_id, embedding::DOUBLE[] AS v,
         |       sqrt(list_inner_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
         |     FROM embeddings),
         |n AS (SELECT greatest(1, count(*) // $k) AS stride,
         |             greatest(1, count(*) // $sampleTarget) AS rate FROM e),
         |init AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS c,
         |           list_transform(v, x -> x / nrm) AS cv
         |         FROM e, n WHERE vec_id % n.stride = 0 ORDER BY vec_id LIMIT $k),
         |cw0 AS (SELECT c, mm.mm, cv[mm.mm * $subdim + 1 : mm.mm * $subdim + $subdim] AS sub
         |       FROM init, range($m) mm(mm)),
         |samp AS (SELECT vec_id, list_transform(v, x -> x / nrm) AS uv
         |         FROM e, n WHERE vec_id % n.rate = 0 ORDER BY vec_id LIMIT ${2 * sampleTarget}),
         |ssub AS (SELECT vec_id, mm.mm, uv[mm.mm * $subdim + 1 : mm.mm * $subdim + $subdim] AS vsub
         |         FROM samp, range($m) mm(mm))""".stripMargin
    val steps = (1 to iters).map { j =>
      s"""pd$j AS (SELECT u.vec_id, u.mm, c.c, u.vsub,
         |    list_sum(list_transform(range(1, ${subdim + 1}),
         |      i -> (u.vsub[i] - c.sub[i]) * (u.vsub[i] - c.sub[i]))) AS d
         |  FROM ssub u JOIN cw${j - 1} c ON c.mm = u.mm),
         |pasg$j AS (SELECT vec_id, mm, c, vsub FROM (
         |    SELECT *, row_number() OVER (PARTITION BY vec_id, mm ORDER BY d, c) AS r
         |    FROM pd$j) WHERE r = 1),
         |pcomp$j AS (SELECT mm, c, i.i AS i,
         |      sum(vsub[i.i] ORDER BY vec_id) AS sv, count(*) AS cnt
         |    FROM pasg$j, range(1, ${subdim + 1}) i(i) GROUP BY mm, c, i.i),
         |pm$j AS (SELECT mm, c, list(sv / cnt ORDER BY i) AS sub FROM pcomp$j GROUP BY mm, c),
         |cw$j AS (SELECT p.mm, p.c, coalesce(v.sub, p.sub) AS sub
         |        FROM cw${j - 1} p LEFT JOIN pm$j v ON v.mm = p.mm AND v.c = p.c)""".stripMargin
    }
    (head +: steps).mkString(",\n") +
      s",\ncw AS (SELECT mm, c, sub FROM cw$iters)"
  }

  private def baseOracleSql: Map[String, String] = Map(
    "q01_groupavg_brand_flag" ->
      """SELECT p_brand, l_returnflag, round(avg(l_extendedprice), 6) AS avg_price,
        |       round(sum(l_quantity), 6) AS sum_qty, count(*) AS cnt
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |              JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY p_brand, l_returnflag ORDER BY p_brand, l_returnflag""".stripMargin,
    "q02_groupavg_type_status" ->
      """SELECT p_type, o_orderstatus, round(avg(l_extendedprice), 6) AS avg_price, count(*) AS cnt
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |              JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY p_type, o_orderstatus ORDER BY p_type, o_orderstatus""".stripMargin,
    "q03_filter_eq" ->
      """SELECT c_custkey, c_name, c_acctbal FROM customer
        |WHERE c_mktsegment = 'BUILDING' ORDER BY c_custkey""".stripMargin,
    "q04_having" ->
      """SELECT l_partkey, count(*) AS n_orders
        |FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
        |GROUP BY l_partkey HAVING count(*) >= 40 ORDER BY l_partkey""".stripMargin,
    "q05_join_left_outer" ->
      """SELECT c_custkey, count(o_orderkey) AS n_orders,
        |       round(coalesce(sum(o_totalprice), 0), 6) AS total_spend
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin,
    "q06_join_semi" ->
      """SELECT c_custkey, c_name FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'O')
        |ORDER BY c_custkey""".stripMargin,
    "q07_join_anti" ->
      """SELECT c_custkey, c_name FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o
        |                  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
        |ORDER BY c_custkey""".stripMargin,
    "q08_topk" ->
      """SELECT o_orderkey, o_custkey, round(o_totalprice, 6) AS o_totalprice
        |FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin,
    "q09_distinct" ->
      """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q10_count_distinct" ->
      """SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts,
        |       count(DISTINCT l_suppkey) AS n_supps
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q11_scalar_funcs" ->
      """SELECT l_orderkey, l_linenumber,
        |       least(l_partkey, l_suppkey) AS lo_key,
        |       greatest(l_partkey, l_suppkey) AS hi_key,
        |       concat_ws('|', l_returnflag, l_linestatus) AS tag,
        |       round(l_extendedprice * (1.0 - l_discount), 6) AS net_price
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q12_group_collect" ->
      """SELECT l_orderkey,
        |       string_agg(CAST(l_partkey AS VARCHAR), ',' ORDER BY l_partkey) AS basket,
        |       count(*) AS n_items
        |FROM lineitem GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin,
    "q13_fmt_11dp" ->
      """SELECT l_returnflag, printf('%.11f', avg(l_quantity)) AS avg_qty_11dp
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q14_sql_api" ->
      """SELECT p_brand, round(avg(l_extendedprice), 6) AS avg_price, count(*) AS cnt
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,
    "q15_global_agg" ->
      """SELECT count(*) AS n_rows, round(sum(l_extendedprice), 6) AS total_price,
        |       round(avg(l_discount), 6) AS avg_discount,
        |       count(DISTINCT l_orderkey) AS n_orders
        |FROM lineitem""".stripMargin,
    "q16_set_ops" ->
      """WITH building AS (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'),
        |open_c AS (SELECT c_custkey FROM customer c
        |           WHERE EXISTS (SELECT 1 FROM orders o
        |                         WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'O'))
        |SELECT c_custkey, rel FROM (
        |  SELECT c_custkey, 'both' AS rel FROM (SELECT * FROM building INTERSECT SELECT * FROM open_c)
        |  UNION ALL
        |  SELECT c_custkey, 'building_only' FROM (SELECT * FROM building EXCEPT SELECT * FROM open_c))
        |ORDER BY rel, c_custkey""".stripMargin,
    "q17_window_running" ->
      """SELECT o_custkey, o_orderkey,
        |       round(sum(o_totalprice) OVER (PARTITION BY o_custkey
        |             ORDER BY o_orderdate, o_orderkey
        |             ROWS UNBOUNDED PRECEDING), 6) AS running_spend
        |FROM orders WHERE o_custkey <= 100 ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q18_rollup" ->
      """SELECT coalesce(p_brand, 'ALL') AS brand, count(*) AS cnt,
        |       round(sum(l_quantity), 6) AS sum_qty
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY ROLLUP(p_brand) ORDER BY brand""".stripMargin,
    "q1a_pivot" ->
      """SELECT o_orderpriority,
        |  count(*) FILTER (WHERE o_orderstatus = 'F') AS f_n,
        |  round(sum(o_totalprice) FILTER (WHERE o_orderstatus = 'F'), 6) AS f_spend,
        |  count(*) FILTER (WHERE o_orderstatus = 'O') AS o_n,
        |  round(sum(o_totalprice) FILTER (WHERE o_orderstatus = 'O'), 6) AS o_spend,
        |  count(*) FILTER (WHERE o_orderstatus = 'P') AS p_n,
        |  round(sum(o_totalprice) FILTER (WHERE o_orderstatus = 'P'), 6) AS p_spend
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "q1b_percentiles" ->
      """SELECT l_returnflag,
        |  round(quantile_cont(l_extendedprice, 0.25), 6) AS p25,
        |  round(quantile_cont(l_extendedprice, 0.5), 6) AS p50,
        |  round(quantile_cont(l_extendedprice, 0.75), 6) AS p75,
        |  round(quantile_cont(l_extendedprice, 0.99), 6) AS p99
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "q1c_column_stats" ->
      ("WITH t AS (SELECT * FROM lineitem) " +
        Seq("l_quantity", "l_extendedprice", "l_discount", "l_partkey").map(c =>
          s"""SELECT '$c' AS col_name, count(*) AS n,
             |  CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
             |  count(DISTINCT $c) AS ndv,
             |  round(CAST(min($c) AS DOUBLE), 6) AS min_v,
             |  round(CAST(max($c) AS DOUBLE), 6) AS max_v,
             |  round(avg($c), 6) AS avg_v FROM t""".stripMargin)
          .mkString("", " UNION ALL ", " ORDER BY col_name")),
    "q1d_range_frame" ->
      """SELECT o_custkey, o_orderkey,
        |       CAST(floor(epoch(o_orderdate)) AS BIGINT) AS odate_s,
        |       round(sum(o_totalprice) OVER (
        |         PARTITION BY o_custkey ORDER BY CAST(floor(epoch(o_orderdate)) AS BIGINT)
        |         RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW), 6) AS spend_30d
        |FROM orders WHERE o_custkey <= 100
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q1e_geomean" ->
      """SELECT l_returnflag,
        |       round(exp(avg(ln(l_extendedprice))), 6) AS gm_price,
        |       count(*) AS cnt
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "q1f_cube" ->
      """SELECT coalesce(p_brand, 'ALL') AS brand,
        |       coalesce(l_returnflag, 'ALL') AS flag,
        |       count(*) AS cnt, round(sum(l_quantity), 6) AS sum_qty
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY CUBE(p_brand, l_returnflag) ORDER BY brand, flag""".stripMargin,
    "q1i_except_all" ->
      """SELECT l_partkey, count(*) AS surplus FROM (
        |  SELECT l_partkey FROM lineitem WHERE l_linestatus = 'F'
        |  EXCEPT ALL
        |  SELECT l_partkey FROM lineitem WHERE l_returnflag = 'R')
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q1j_collect_set" ->
      """SELECT l_orderkey,
        |       array_to_string(list_sort(list_distinct(list(l_returnflag))), ',') AS flags,
        |       count(*) AS n_lines
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "q1g_ntile" ->
      """SELECT o_custkey, o_orderkey,
        |       CAST(ntile(4) OVER (PARTITION BY o_custkey
        |                      ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS spend_quartile
        |FROM orders WHERE o_custkey <= 100
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q1h_scalar_subquery" ->
      """SELECT o_orderkey, o_custkey, round(o_totalprice, 6) AS price
        |FROM orders o
        |WHERE o_totalprice > 1.5 * (SELECT avg(o_totalprice) FROM orders i
        |                            WHERE i.o_custkey = o.o_custkey)
        |ORDER BY o_orderkey""".stripMargin,
    "q76_stratified_sample" ->
      """SELECT doc_id, lang FROM (
        |  SELECT doc_id, lang,
        |         (doc_id * 2654435761) % 4294967296 / 4294967296.0 AS frac
        |  FROM documents)
        |WHERE frac < (CASE WHEN lang = 'en' THEN 0.5 ELSE 0.1 END)
        |ORDER BY doc_id""".stripMargin,
    // pure BIGINT arithmetic → bit-identical split fractions cross-engine
    "q57_hash_split" ->
      """SELECT doc_id,
        |  CASE WHEN frac < 0.9 THEN 'train'
        |       WHEN frac < 0.95 THEN 'val' ELSE 'test' END AS split
        |FROM (SELECT doc_id,
        |        (doc_id * 2654435761) % 4294967296 / 4294967296.0 AS frac
        |      FROM documents)
        |ORDER BY doc_id""".stripMargin,
    "q20_freq_items" ->
      """SELECT l_partkey, count(*) AS support
        |FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
        |GROUP BY l_partkey HAVING count(*) >= 40 ORDER BY l_partkey""".stripMargin,
    "q21_freq_pairs" ->
      """WITH b AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
        |SELECT a.l_partkey AS item1, c.l_partkey AS item2, count(*) AS support
        |FROM b a JOIN b c ON a.l_orderkey = c.l_orderkey AND a.l_partkey < c.l_partkey
        |GROUP BY 1, 2 HAVING count(*) >= 3 ORDER BY item1, item2""".stripMargin,
    // The oracle recomputes the engine's adaptive support — max(3, 0.02% of
    // baskets) — in SQL, so it tracks any scale factor. Sizes 1–4 are
    // enumerated (no fixture has a frequent size-4 set; enumerating one
    // level past the deepest survivor means a frequent set the oracle
    // misses would need size ≥ 5, whose size-4 subsets would all be
    // frequent by monotonicity and break the comparison loudly first).
    "q22_son" ->
      """WITH b AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |sup AS (SELECT greatest(3, CAST(round(0.0002 * count(DISTINCT l_orderkey)) AS BIGINT)) AS s FROM b),
        |ones AS (SELECT l_partkey, count(*) AS n FROM b GROUP BY 1
        |         HAVING count(*) >= (SELECT s FROM sup)),
        |twos AS (SELECT a.l_partkey AS x, c.l_partkey AS y, count(*) AS n
        |         FROM b a JOIN b c ON a.l_orderkey = c.l_orderkey AND a.l_partkey < c.l_partkey
        |         GROUP BY 1, 2 HAVING count(*) >= (SELECT s FROM sup)),
        |threes AS (SELECT a.l_partkey AS x, c.l_partkey AS y, e.l_partkey AS z, count(*) AS n
        |           FROM b a JOIN b c ON a.l_orderkey = c.l_orderkey AND a.l_partkey < c.l_partkey
        |                    JOIN b e ON c.l_orderkey = e.l_orderkey AND c.l_partkey < e.l_partkey
        |           GROUP BY 1, 2, 3 HAVING count(*) >= (SELECT s FROM sup)),
        |fours AS (SELECT a.l_partkey AS w, c.l_partkey AS x, e.l_partkey AS y, f.l_partkey AS z, count(*) AS n
        |          FROM b a JOIN b c ON a.l_orderkey = c.l_orderkey AND a.l_partkey < c.l_partkey
        |                   JOIN b e ON c.l_orderkey = e.l_orderkey AND c.l_partkey < e.l_partkey
        |                   JOIN b f ON e.l_orderkey = f.l_orderkey AND e.l_partkey < f.l_partkey
        |          GROUP BY 1, 2, 3, 4 HAVING count(*) >= (SELECT s FROM sup))
        |SELECT itemset, size, support FROM (
        |  SELECT CAST(l_partkey AS VARCHAR) AS itemset, 1 AS size, n AS support FROM ones
        |  UNION ALL
        |  SELECT CAST(x AS VARCHAR) || ',' || CAST(y AS VARCHAR), 2, n FROM twos
        |  UNION ALL
        |  SELECT CAST(x AS VARCHAR) || ',' || CAST(y AS VARCHAR) || ',' || CAST(z AS VARCHAR), 3, n FROM threes
        |  UNION ALL
        |  SELECT CAST(w AS VARCHAR) || ',' || CAST(x AS VARCHAR) || ',' || CAST(y AS VARCHAR) || ',' || CAST(z AS VARCHAR), 4, n FROM fours)
        |ORDER BY size, itemset""".stripMargin,
    "q30_cograph_edges" ->
      """WITH cp AS (SELECT DISTINCT o_custkey AS c, l_partkey AS p
        |            FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
        |SELECT a.c AS u, b.c AS v, count(*) AS shared
        |FROM cp a JOIN cp b ON a.p = b.p AND a.c < b.c
        |GROUP BY 1, 2 HAVING count(*) >= 3 ORDER BY u, v""".stripMargin,
    "q31_degrees" ->
      """WITH cp AS (SELECT DISTINCT o_custkey AS c, l_partkey AS p
        |            FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |e AS (SELECT a.c AS u, b.c AS v FROM cp a JOIN cp b ON a.p = b.p AND a.c < b.c
        |      GROUP BY 1, 2 HAVING count(*) >= 3)
        |SELECT vertex, count(*) AS degree
        |FROM (SELECT u AS vertex FROM e UNION ALL SELECT v FROM e)
        |GROUP BY vertex ORDER BY vertex""".stripMargin,
    // Connected components as a recursive CTE: propagate reachable labels
    // downhill only (label < vertex) — the closure is pruned to pairs that
    // can still lower a vertex's min, then min-reduced; every vertex also
    // contributes itself so singleton-minima survive. Verified identical to
    // the engine's union-find/pointer-jumping output at sf0.01 (~15 s).
    "q32_conncomp" ->
      """WITH RECURSIVE cp AS (SELECT DISTINCT o_custkey AS c, l_partkey AS p
        |            FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |e AS (SELECT a.c AS u, b.c AS v FROM cp a JOIN cp b ON a.p = b.p AND a.c < b.c
        |      GROUP BY 1, 2 HAVING count(*) >= 3),
        |und AS (SELECT u, v FROM e UNION ALL SELECT v AS u, u AS v FROM e),
        |walk(vertex, label) AS (
        |  SELECT u AS vertex, v AS label FROM und WHERE v < u
        |  UNION
        |  SELECT und.u AS vertex, walk.label FROM und JOIN walk ON und.v = walk.vertex
        |  WHERE walk.label < und.u
        |)
        |SELECT vertex, min(label) AS component FROM (
        |  SELECT vertex, label FROM walk
        |  UNION ALL
        |  SELECT DISTINCT u AS vertex, u AS label FROM und
        |) GROUP BY vertex ORDER BY vertex""".stripMargin,
    "q40_dedup_exact" ->
      """SELECT md5(text) AS content_hash, min(doc_id) AS keeper, count(*) AS n_copies
        |FROM documents GROUP BY 1 ORDER BY keeper""".stripMargin,
    // raw word-3-gram sets in SQL; equals the engine's xxhash64-shingle
    // jaccard because 64-bit hashing is collision-free at corpus scale,
    // so |hashed ∩| = |raw ∩| — the hash is a set-preserving relabeling
    "q45_ngram_jaccard" ->
      """WITH t AS (SELECT doc_id,
        |  list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0) AS w
        |  FROM documents),
        |g AS (SELECT doc_id, list_distinct(list_transform(range(1, len(w) - 1),
        |        i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS sh FROM t),
        |p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |        len(list_intersect(a.sh, b.sh)) AS i,
        |        len(a.sh) AS na, len(b.sh) AS nb
        |      FROM g a JOIN g b ON a.doc_id < b.doc_id AND a.doc_id < 500)
        |SELECT doc_a, doc_b, round(CAST(i AS DOUBLE) / (na + nb - i), 6) AS jaccard
        |FROM p ORDER BY jaccard DESC, doc_a, doc_b LIMIT 50""".stripMargin,
    "q46_ann_brute" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |s AS (SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
        |             round(list_cosine_similarity(q.v, e.v), 6) AS cosine
        |      FROM e q JOIN e ON q.vec_id < 100 AND q.vec_id <> e.vec_id)
        |SELECT query_id, CAST(rank AS INT) AS rank, neighbor_id, cosine FROM (
        |  SELECT *, row_number() OVER (PARTITION BY query_id
        |            ORDER BY cosine DESC, neighbor_id) AS rank FROM s)
        |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,
    "q50_text_stats" ->
      """WITH t AS (SELECT doc_id, length(text) AS n_chars,
        |  list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0) AS tokens
        |  FROM documents
        |  WHERE len(list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0)) > 0),
        |u AS (SELECT doc_id, n_chars, len(tokens) AS n_tokens,
        |  len(list_distinct(tokens)) AS n_uniq,
        |  len(list_filter(tokens, x -> x IN ('the','a','of','to','and','in','is'))) AS n_stop
        |  FROM t)
        |SELECT doc_id, CAST(n_chars AS INT) AS n_chars,
        |  CAST(n_tokens AS INT) AS n_tokens, CAST(n_uniq AS INT) AS n_uniq,
        |  round(CAST(n_stop AS DOUBLE) / n_tokens, 6) AS stop_ratio,
        |  round(CAST(n_uniq AS DOUBLE) / n_tokens, 6) AS uniq_ratio,
        |  round(least(CAST(n_tokens AS DOUBLE) / 100, CAST(1 AS DOUBLE)) * 0.4 +
        |        (CAST(1 AS DOUBLE) - CAST(n_stop AS DOUBLE) / n_tokens) * 0.3 +
        |        CAST(n_uniq AS DOUBLE) / n_tokens * 0.3, 6) AS quality
        |FROM u ORDER BY doc_id""".stripMargin,
    "q51_token_topk" ->
      """SELECT token, count(*) AS n FROM (
        |  SELECT unnest(list_filter(string_split_regex(lower(text), '\s+'),
        |                x -> len(x) > 0)) AS token FROM documents)
        |GROUP BY token ORDER BY n DESC, token LIMIT 100""".stripMargin,
    // generated from TextOps.LangMarkers — engine and oracle share the
    // marker lists, argmax tie-break is alphabetical in both (the CASE
    // chain tests languages in sorted order; equality against greatest()
    // is exact, these are the same doubles)
    "q52_lang_id" -> {
      val langs = operators.TextOps.LangMarkers.keys.toSeq.sorted
      val scoreCols = langs.map { l =>
        val inList = operators.TextOps.LangMarkers(l).map(w => s"'$w'").mkString(", ")
        s"CAST(len(list_filter(tokens, x -> x IN ($inList))) AS DOUBLE) / n AS score_$l"
      }.mkString(",\n  ") +
        ",\n  CAST(len(text) - len(regexp_replace(text, '[\\x{4e00}-\\x{9fff}]', '', 'g')) AS DOUBLE) / greatest(len(text), 1) AS score_zh"
      val all = langs :+ "zh"
      val caseChain = all.map(l => s"WHEN score_$l = m THEN '$l'").mkString(" ")
      val caseScore = all.map(l => s"WHEN score_$l = m THEN round(score_$l, 6)").mkString(" ")
      s"""WITH t AS (SELECT doc_id, text,
         |  list_filter(string_split_regex(lower(text), '\\s+'), x -> len(x) > 0) AS tokens
         |  FROM documents),
         |u AS (SELECT doc_id, text, tokens, greatest(len(tokens), 1) AS n FROM t),
         |s AS (SELECT doc_id,
         |  $scoreCols
         |  FROM u),
         |g AS (SELECT *, greatest(${all.map("score_" + _).mkString(", ")}) AS m FROM s)
         |SELECT doc_id, CASE $caseChain END AS lang_pred,
         |       CASE $caseScore END AS score
         |FROM g ORDER BY doc_id""".stripMargin
    },
    // same lookahead-free BPE pre-split pattern under RE2 (TextOps.BpePattern)
    "q55_bpe_tokens" ->
      """SELECT token, count(*) AS n, count(DISTINCT doc_id) AS docs FROM (
        |  SELECT doc_id, unnest(regexp_extract_all(lower(text),
        |                 ' ?[a-z]+| ?[0-9]+| ?[^\sa-z0-9]+')) AS token
        |  FROM documents)
        |GROUP BY token ORDER BY n DESC, token LIMIT 25""".stripMargin,
    // pipeline composition: dedup keepers ⋈ quality gate → per-lang stats
    "q54_clean_corpus" ->
      """WITH keepers AS (SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)),
        |t AS (SELECT doc_id,
        |  list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0) AS tokens
        |  FROM documents
        |  WHERE len(list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0)) > 0),
        |u AS (SELECT doc_id, len(tokens) AS n_tokens,
        |  len(list_distinct(tokens)) AS n_uniq,
        |  len(list_filter(tokens, x -> x IN ('the','a','of','to','and','in','is'))) AS n_stop
        |  FROM t),
        |q AS (SELECT doc_id, n_tokens,
        |  round(least(CAST(n_tokens AS DOUBLE) / 100, CAST(1 AS DOUBLE)) * 0.4 +
        |        (CAST(1 AS DOUBLE) - CAST(n_stop AS DOUBLE) / n_tokens) * 0.3 +
        |        CAST(n_uniq AS DOUBLE) / n_tokens * 0.3, 6) AS quality
        |  FROM u)
        |SELECT d.lang, count(*) AS n_docs,
        |       CAST(sum(q.n_tokens) AS BIGINT) AS total_tokens,
        |       round(avg(q.quality), 6) AS avg_quality
        |FROM documents d JOIN keepers k ON d.doc_id = k.doc_id
        |                 JOIN q ON d.doc_id = q.doc_id
        |WHERE q.quality >= 0.64
        |GROUP BY d.lang ORDER BY d.lang""".stripMargin,
    "q60_events_hourly" ->
      """SELECT CAST(floor(epoch(date_trunc('hour', ts))) AS BIGINT) AS hour_s,
        |       event_type, count(*) AS n, round(sum(value), 6) AS sum_value,
        |       round(avg(value), 6) AS avg_value
        |FROM events GROUP BY 1, 2 ORDER BY hour_s, event_type""".stripMargin,
    "q61_events_ranked" ->
      """SELECT user_id, CAST(rn AS INT) AS rn, event_id, event_type, ts_s FROM (
        |  SELECT user_id, event_id, event_type,
        |         epoch_us(ts) // 1000000 AS ts_s,
        |         row_number() OVER (PARTITION BY user_id
        |                            ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events)
        |WHERE rn <= 3 ORDER BY user_id, rn""".stripMargin,
    "q62_sessionize" ->
      """WITH x AS (SELECT user_id, ts, value, event_id,
        |  CASE WHEN lag(ts) OVER w IS NULL
        |         OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000 THEN 1 ELSE 0 END AS is_new
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (SELECT *, sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                                  ROWS UNBOUNDED PRECEDING) AS session_seq FROM x)
        |SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
        |       count(*) AS n_events,
        |       min(epoch_us(ts) // 1000000) AS start_s,
        |       max(epoch_us(ts) // 1000000) AS end_s,
        |       round(sum(value), 6) AS sum_value
        |FROM s GROUP BY user_id, session_seq ORDER BY user_id, session_seq""".stripMargin,
    // same aggregation as q60 through the streaming-capable window() plan
    "q64_events_hourly_streamplan" ->
      """SELECT CAST(floor(epoch(date_trunc('hour', ts))) AS BIGINT) AS hour_s,
        |       event_type, count(*) AS n, round(sum(value), 6) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY hour_s, event_type""".stripMargin,
    "q63_events_json" ->
      """SELECT event_type, count(*) AS n,
        |       round(avg(k), 6) AS avg_k, min(k) AS min_k, max(k) AS max_k
        |FROM (SELECT event_type, CAST(json_extract_string(props, '$.k') AS INT) AS k
        |      FROM events)
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    // the FULL JOIN + coalesce formulation — a structurally different
    // merge than the engine's union+priority-pick, same required output
    "q72_upsert" ->
      """WITH changes AS (SELECT doc_id, upper(text) AS text, lang
        |                 FROM documents WHERE doc_id % 10 = 0),
        |merged AS (SELECT coalesce(c.doc_id, s.doc_id) AS doc_id,
        |                  coalesce(c.text, s.text) AS text,
        |                  coalesce(c.lang, s.lang) AS lang
        |           FROM documents s FULL JOIN changes c ON s.doc_id = c.doc_id)
        |SELECT doc_id, lang, md5(text) AS h FROM merged ORDER BY doc_id""".stripMargin,
    // DuckDB's native ASOF JOIN pins the union+carry-forward formulation
    "q67_asof_join" ->
      """WITH l AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'view'),
        |     r AS (SELECT user_id AS p_user, ts AS p_ts, round(max(value), 6) AS purchase_value
        |           FROM events WHERE event_type = 'purchase' GROUP BY 1, 2)
        |SELECT l.event_id, l.user_id,
        |       epoch_us(l.ts) // 1000000 AS ts_s,
        |       epoch_us(r.p_ts) // 1000000 AS purchase_ts_s,
        |       r.purchase_value
        |FROM l ASOF LEFT JOIN r ON l.user_id = r.p_user AND l.ts >= r.p_ts
        |ORDER BY l.event_id""".stripMargin,
    // ASOF match post-gated by staleness: nearest-or-nothing within 24h
    "q77_asof_tolerance" ->
      """WITH l AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'view'),
        |     r AS (SELECT user_id AS p_user, ts AS p_ts, round(max(value), 6) AS purchase_value
        |           FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
        |j AS (SELECT l.event_id, l.user_id, l.ts, r.p_ts, r.purchase_value,
        |             CASE WHEN epoch_us(l.ts) - epoch_us(r.p_ts) <= 86400000000 THEN 1 ELSE 0 END AS fresh
        |      FROM l ASOF LEFT JOIN r ON l.user_id = r.p_user AND l.ts >= r.p_ts)
        |SELECT event_id, user_id, epoch_us(ts) // 1000000 AS ts_s,
        |       CASE WHEN fresh = 1 THEN epoch_us(p_ts) // 1000000 END AS purchase_ts_s,
        |       CASE WHEN fresh = 1 THEN purchase_value END AS purchase_value
        |FROM j ORDER BY event_id""".stripMargin,
    // forward direction: DuckDB ASOF picks the NEAREST r with l.ts <= r.p_ts
    "q74_asof_forward" ->
      """WITH l AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'view'),
        |     r AS (SELECT user_id AS p_user, ts AS p_ts, round(max(value), 6) AS purchase_value
        |           FROM events WHERE event_type = 'purchase' GROUP BY 1, 2)
        |SELECT l.event_id, l.user_id,
        |       epoch_us(l.ts) // 1000000 AS ts_s,
        |       epoch_us(r.p_ts) // 1000000 AS purchase_ts_s,
        |       epoch_us(r.p_ts) // 1000000 - epoch_us(l.ts) // 1000000 AS lag_s,
        |       r.purchase_value
        |FROM l ASOF LEFT JOIN r ON l.user_id = r.p_user AND l.ts <= r.p_ts
        |ORDER BY l.event_id""".stripMargin,
    // ranks from the integer triple (tf desc, df asc, term asc) — never
    // from the float score, so rank boundaries can't straddle a libm ulp
    "q78_tfidf" ->
      """WITH t AS (SELECT doc_id,
        |  list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0) AS tokens
        |  FROM documents),
        |u AS (SELECT doc_id, unnest(tokens) AS term FROM t WHERE len(tokens) > 0),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM u GROUP BY 1, 2),
        |df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        |n AS (SELECT count(*) AS n_docs FROM t WHERE len(tokens) > 0),
        |s AS (SELECT tf.doc_id, tf.term, tf.tf, df.df,
        |        row_number() OVER (PARTITION BY tf.doc_id
        |          ORDER BY tf.tf DESC, df.df ASC, tf.term ASC) AS rank
        |      FROM tf JOIN df USING (term))
        |SELECT doc_id, CAST(rank AS INT) AS rank, term, tf, df,
        |       round(tf * ln(CAST((SELECT n_docs FROM n) AS DOUBLE) / df), 6) AS tfidf
        |FROM s WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin,
    "q79_grouping_sets" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS flag,
        |       coalesce(l_linestatus, 'ALL') AS status,
        |       count(*) AS cnt, round(sum(l_quantity), 6) AS sum_qty
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        |ORDER BY flag, status""".stripMargin,
    "q7a_lead_lag" ->
      """SELECT user_id, event_id, ts_s,
        |       ts_s - lag(ts_s) OVER w AS prev_gap_s,
        |       lead(ts_s) OVER w - ts_s AS next_gap_s,
        |       round(value - lag(value) OVER w, 6) AS value_delta
        |FROM (SELECT user_id, event_id, ts, value,
        |        epoch_us(ts) // 1000000 AS ts_s FROM events)
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY user_id, ts_s, event_id""".stripMargin,
    // each event lands in exactly two 30-min-aligned 1h windows: the
    // offsets {0, 1800} enumerate them (size = 2 × slide)
    "q7b_sliding_window" ->
      """SELECT (epoch_us(ts) // 1000000 // 1800) * 1800 - off AS start_s,
        |       event_type, count(*) AS n, round(sum(value), 6) AS sum_value
        |FROM events CROSS JOIN (SELECT unnest([0, 1800]) AS off)
        |GROUP BY 1, 2 ORDER BY start_s, event_type""".stripMargin,
    "q7e_intersect_all" ->
      """SELECT l_partkey, count(*) AS n_common FROM (
        |  SELECT l_partkey FROM lineitem WHERE l_linestatus = 'F'
        |  INTERSECT ALL
        |  SELECT l_partkey FROM lineitem WHERE l_returnflag = 'R')
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // grams joined as strings (not hashes) precisely so this oracle exists;
    // range() is end-exclusive → i ∈ [1, len-4], toks[i:i+4] = 5 tokens
    "q80_decontaminate" ->
      """WITH t AS (SELECT doc_id,
        |  list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0) AS toks
        |  FROM documents),
        |g AS (SELECT DISTINCT doc_id, array_to_string(toks[i:i+4], ' ') AS gram
        |      FROM (SELECT doc_id, toks, unnest(range(1, len(toks) - 3)) AS i
        |            FROM t WHERE len(toks) >= 5)),
        |b AS (SELECT DISTINCT gram FROM g WHERE doc_id % 10 = 0),
        |tr AS (SELECT doc_id, count(*) AS n_grams FROM g
        |       WHERE doc_id % 10 != 0 GROUP BY 1),
        |c AS (SELECT g.doc_id, count(*) AS n_contaminated FROM g
        |      JOIN b USING (gram) WHERE g.doc_id % 10 != 0 GROUP BY 1)
        |SELECT tr.doc_id, tr.n_grams, c.n_contaminated,
        |       round(CAST(c.n_contaminated AS DOUBLE) / tr.n_grams, 6)
        |         AS contamination
        |FROM tr JOIN c ON tr.doc_id = c.doc_id ORDER BY tr.doc_id""".stripMargin,
    // keep is computed from the ROUNDED fractions on both engines, so the
    // gate can never flip on a sub-6dp float divergence
    "q81_repetition_quality" ->
      """WITH t AS (SELECT doc_id,
        |  list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0) AS toks
        |  FROM documents),
        |tc AS (SELECT doc_id, g, count(*) AS c
        |       FROM (SELECT doc_id, unnest(toks) AS g FROM t) GROUP BY 1, 2),
        |ts AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
        |         max(c) AS top_c, count(*) AS n_uniq FROM tc GROUP BY 1),
        |bc AS (SELECT doc_id, g, count(*) AS c
        |       FROM (SELECT doc_id, array_to_string(toks[i:i+1], ' ') AS g
        |             FROM (SELECT doc_id, toks, unnest(range(1, len(toks))) AS i
        |                   FROM t WHERE len(toks) >= 2)) GROUP BY 1, 2),
        |bs AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_bg,
        |         max(c) AS top_bg_c FROM bc GROUP BY 1)
        |SELECT doc_id, n_tokens,
        |       round(CAST(top_c AS DOUBLE) / n_tokens, 6) AS top_token_frac,
        |       round(1.0 - CAST(n_uniq AS DOUBLE) / n_tokens, 6) AS dup_token_frac,
        |       round(CAST(top_bg_c AS DOUBLE) / n_bg, 6) AS top_bigram_frac,
        |       (round(CAST(top_c AS DOUBLE) / n_tokens, 6) <= 0.10 AND
        |        round(CAST(top_bg_c AS DOUBLE) / n_bg, 6) <= 0.04) AS keep
        |FROM ts JOIN bs USING (doc_id) ORDER BY doc_id""".stripMargin,
    "q82_bigram_topk" ->
      """WITH bg AS (SELECT doc_id, array_to_string(toks[i:i+1], ' ') AS gram
        |  FROM (SELECT doc_id, toks, unnest(range(1, len(toks))) AS i
        |        FROM (SELECT doc_id,
        |          list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0) AS toks
        |          FROM documents) WHERE len(toks) >= 2))
        |SELECT gram, count(*) AS n, count(DISTINCT doc_id) AS docs
        |FROM bg GROUP BY 1 ORDER BY n DESC, gram LIMIT 25""".stripMargin,
    "q83_pruned_scan" ->
      """SELECT CAST(floor(epoch(date_trunc('hour', ts))) AS BIGINT) AS hour_s,
        |       event_type, count(*) AS n, round(sum(value), 6) AS sum_value
        |FROM events WHERE event_type = 'click'
        |GROUP BY 1, 2 ORDER BY hour_s""".stripMargin,
    // the oracle is the PLAIN semi-join: bloom false positives must have
    // been removed by the exact join for this to hash-match
    "q85_bloom_semi" ->
      """SELECT l_returnflag, count(*) AS cnt, round(sum(l_quantity), 6) AS sum_qty
        |FROM lineitem
        |WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_brand = 'Brand#23')
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q86_pack_offsets" ->
      """WITH t AS (SELECT doc_id,
        |  len(list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0)) AS n_tokens
        |  FROM documents),
        |s AS (SELECT doc_id, n_tokens,
        |        CAST(coalesce(sum(n_tokens) OVER (ORDER BY doc_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
        |          AS start_off
        |      FROM t)
        |SELECT doc_id, n_tokens, start_off,
        |       CAST(floor(start_off / 256.0) AS BIGINT) AS bin
        |FROM s ORDER BY doc_id""".stripMargin,
    "q87_chunk_docs" ->
      """WITH t AS (SELECT doc_id,
        |  list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0) AS toks
        |  FROM documents),
        |c AS (SELECT doc_id, CAST(s // 48 AS INT) AS chunk_id,
        |        array_to_string(toks[s+1:s+64], ' ') AS chunk
        |      FROM (SELECT doc_id, toks, unnest(range(0, len(toks), 48)) AS s
        |            FROM t WHERE len(toks) > 0))
        |SELECT doc_id, chunk_id,
        |       len(string_split(chunk, ' ')) AS n_chunk_tokens,
        |       md5(chunk) AS chunk_md5
        |FROM c ORDER BY doc_id, chunk_id""".stripMargin,
    // DuckDB plans the raw inequality join (IEJoin); the engine's binned
    // equi-join must produce identical counts
    "q68_range_join" ->
      """WITH e AS (SELECT event_id, ts, ts + INTERVAL 1 HOUR AS te
        |           FROM events WHERE event_type = 'error'),
        |     c AS (SELECT ts FROM events WHERE event_type = 'click')
        |SELECT e.event_id, epoch_us(e.ts) // 1000000 AS ts_s,
        |       count(c.ts) AS clicks_1h
        |FROM e LEFT JOIN c ON c.ts >= e.ts AND c.ts < e.te
        |GROUP BY 1, 2 ORDER BY 1""".stripMargin,
    // the engine's 10 power iterations unrolled as sequential CTEs — a full
    // cross-engine hash match of the iterative algorithm, not a spot check.
    // 8-dp rounding tolerates the engines' different double-sum orders
    // (divergence ~1e-15 « the 1e-8 rounding grid).
    "q88_pagerank" -> {
      val graph =
        """WITH cp AS (SELECT DISTINCT o_custkey AS c, l_partkey AS p
          |            FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
          |e AS (SELECT a.c AS u, b.c AS v FROM cp a JOIN cp b ON a.p = b.p AND a.c < b.c
          |      GROUP BY 1, 2 HAVING count(*) >= 3),
          |und AS (SELECT u AS src, v AS dst FROM e UNION ALL SELECT v, u FROM e),
          |deg AS (SELECT src, count(*) AS d FROM und GROUP BY 1),
          |w AS MATERIALIZED (
          |  SELECT und.src, und.dst, 1.0 / deg.d AS w FROM und JOIN deg USING (src)),
          |n AS (SELECT count(DISTINCT src) AS c FROM w),
          |p0 AS (SELECT DISTINCT src AS v, 1.0 / (SELECT c FROM n) AS r FROM w)""".stripMargin
      // every p_i MATERIALIZED (the qa7 discipline): without the hints
      // DuckDB re-inlines w and the whole prefix chain into each level of
      // the 10-step unroll and the sf0.1 replay spilled >72 GB (ENOSPC —
      // the r13 gap that left q88's sf0.1 equivalence resting on
      // engine-vs-engine bit-compare). Materialized, each level is
      // computed once; same values, same hash.
      val steps = (1 to 10).map { i =>
        s"""p$i AS MATERIALIZED (SELECT w.dst AS v,
           |  (1.0 - 0.85) / (SELECT c FROM n) + 0.85 * sum(p${i - 1}.r * w.w) AS r
           |  FROM w JOIN p${i - 1} ON w.src = p${i - 1}.v GROUP BY w.dst)""".stripMargin
      }.mkString(",\n")
      s"$graph,\n$steps\nSELECT v, round(r, 8) AS rank FROM p10 ORDER BY v"
    },
    // synchronous LPA unrolled round-by-round (the q88 technique): every
    // round is most-frequent-neighbor-label with ties to the smallest
    // label — row_number(ORDER BY cnt DESC, label) = the engine's
    // min_by(label, (-cnt, label)). Same iteration count as the engine,
    // so the oracle pins all 10 supersteps exactly.
    "q8j_lpa_communities" -> {
      val graph =
        """WITH cp AS (SELECT DISTINCT o_custkey AS c, l_partkey AS p
          |            FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
          |e AS (SELECT a.c AS u, b.c AS v FROM cp a JOIN cp b ON a.p = b.p AND a.c < b.c
          |      GROUP BY 1, 2 HAVING count(*) >= 3),
          |und AS (SELECT u, v FROM e UNION ALL SELECT v AS u, u AS v FROM e),
          |l0 AS (SELECT DISTINCT u AS vertex, u AS label FROM und)""".stripMargin
      val rounds = (1 to 10).map { i =>
        s"""l$i AS (SELECT u AS vertex, label FROM (
           |  SELECT und.u, l${i - 1}.label, count(*) AS cnt,
           |    row_number() OVER (PARTITION BY und.u
           |      ORDER BY count(*) DESC, l${i - 1}.label) AS rn
           |  FROM und JOIN l${i - 1} ON und.v = l${i - 1}.vertex
           |  GROUP BY und.u, l${i - 1}.label) WHERE rn = 1)""".stripMargin
      }.mkString(",\n")
      s"$graph,\n$rounds\nSELECT vertex, label AS community FROM l10 ORDER BY vertex"
    },
    "q9o_benford" ->
      """WITH c AS (SELECT CAST(floor(o_totalprice /
        |      pow(10.0, floor(log10(o_totalprice)))) AS INT) AS digit
        |    FROM orders WHERE o_totalprice > 0),
        |g AS (SELECT digit, count(*) AS n FROM c GROUP BY digit),
        |t AS (SELECT sum(n) AS total FROM g)
        |SELECT digit, n, round(n / total, 6) AS frac,
        |       round(log10(1.0 + 1.0 / digit), 6) AS benford
        |FROM g CROSS JOIN t ORDER BY digit""".stripMargin,
    // HITS unrolled round-by-round like q88/q8j; MATERIALIZED is again
    // load-bearing (each half-step is referenced by the norm subquery AND
    // the next half-step). 8-dp rounding clears the drift the per-step
    // L2 normalizations compound.
    "q9n_hits" -> {
      val base =
        """WITH cp AS MATERIALIZED (SELECT DISTINCT o_custkey AS c, l_partkey AS p
          |            FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
          |h0n AS MATERIALIZED (SELECT DISTINCT c, 1.0 AS h FROM cp)""".stripMargin
      val rounds = (1 to 10).map { i =>
        s"""a$i AS MATERIALIZED (SELECT p, sum(h) AS a
           |  FROM cp JOIN h${i - 1}n USING (c) GROUP BY p),
           |a${i}n AS MATERIALIZED (SELECT p,
           |  a / (SELECT sqrt(sum(a * a)) FROM a$i) AS a FROM a$i),
           |h$i AS MATERIALIZED (SELECT c, sum(a) AS h
           |  FROM cp JOIN a${i}n USING (p) GROUP BY c),
           |h${i}n AS MATERIALIZED (SELECT c,
           |  h / (SELECT sqrt(sum(h * h)) FROM h$i) AS h FROM h$i)""".stripMargin
      }.mkString(",\n")
      s"""$base,
         |$rounds
         |SELECT role, id, score FROM (
         |  SELECT 'hub' AS role, c AS id, round(h, 8) AS score FROM h10n
         |  UNION ALL
         |  SELECT 'authority', p, round(a, 8) FROM a10n)
         |ORDER BY role, id""".stripMargin
    },
    // runs collapse identically in both engines: IS DISTINCT FROM is the
    // lag-null-or-changed flag; timestamps travel as exact epoch micros
    "q9p_scd2" ->
      """WITH x AS (SELECT user_id, ts, event_id, event_type,
        |    CASE WHEN lag(event_type) OVER (PARTITION BY user_id
        |           ORDER BY ts, event_id) IS DISTINCT FROM event_type
        |         THEN 1 ELSE 0 END AS chg
        |  FROM events),
        |p AS (SELECT user_id, event_type, ts,
        |    CAST(sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS UNBOUNDED PRECEDING) AS INT) AS version
        |  FROM x),
        |g AS (SELECT user_id, version, event_type AS state, min(ts) AS vf,
        |        count(*) AS n_events FROM p GROUP BY 1, 2, 3)
        |SELECT user_id, version, state,
        |  epoch_us(vf) AS valid_from_us,
        |  epoch_us(lead(vf) OVER (PARTITION BY user_id ORDER BY version))
        |    AS valid_to_us,
        |  lead(vf) OVER (PARTITION BY user_id ORDER BY version) IS NULL
        |    AS is_current,
        |  n_events
        |FROM g ORDER BY user_id, version""".stripMargin,
    // reachable-set closure over the exact all-pairs levenshtein edges;
    // min reachable id = the engine's union-find min-id component label
    "q9q_entities" ->
      """WITH RECURSIVE e AS MATERIALIZED (
        |  SELECT a.c_custkey AS u, b.c_custkey AS v
        |  FROM customer a JOIN customer b
        |    ON a.c_custkey < b.c_custkey
        |   AND levenshtein(a.c_name, b.c_name) <= 1),
        |und AS MATERIALIZED (
        |  SELECT u, v FROM e UNION ALL SELECT v AS u, u AS v FROM e),
        |reach(id, r) AS (
        |  SELECT c_custkey, c_custkey FROM customer
        |  UNION
        |  SELECT reach.id, und.v FROM reach JOIN und ON und.u = reach.r),
        |lab AS MATERIALIZED (
        |  SELECT id, min(r) AS entity FROM reach GROUP BY id),
        |sz AS (SELECT entity, count(*) AS n_members FROM lab GROUP BY 1)
        |SELECT id, entity, n_members FROM lab JOIN sz USING (entity)
        |ORDER BY id""".stripMargin,
    // the capped tier's oracle REPLAYS the blocking itself: deletion
    // variants per distinct name (DISTINCT collapses equal-character runs
    // exactly like the engine's last-of-run filter), bucket occupancy on
    // the variant strings (the engine buckets on xxhash64(variant) — a
    // bucket-preserving relabeling while the hash is collision-free, which
    // at 500–5000 distinct names it is), hot buckets dropped, survivors
    // pair-joined, exact levenshtein verify, then the q9q closure
    "qba_entities_capped" ->
      """WITH RECURSIVE names AS (SELECT DISTINCT c_name AS name FROM customer),
        |vars AS MATERIALIZED (
        |  SELECT DISTINCT name,
        |    CASE WHEN p.p = 0 THEN name
        |      ELSE substr(name, 1, CAST(p.p AS INT) - 1) ||
        |           substr(name, CAST(p.p AS INT) + 1) END AS variant
        |  FROM names, LATERAL unnest(range(0, len(name) + 1)) p(p)),
        |occ AS (SELECT variant, count(*) AS occ FROM vars GROUP BY 1),
        |keep AS (SELECT variant FROM occ WHERE occ <= 64),
        |cand AS (
        |  SELECT DISTINCT a.name AS name_a, b.name AS name_b
        |  FROM vars a JOIN vars b
        |    ON a.variant = b.variant AND a.name < b.name
        |  WHERE a.variant IN (SELECT variant FROM keep)),
        |ne AS (SELECT name_a, name_b FROM cand
        |       WHERE levenshtein(name_a, name_b) <= 1),
        |e AS MATERIALIZED (
        |  SELECT x.c_custkey AS u, y.c_custkey AS v
        |  FROM ne JOIN customer x ON x.c_name = ne.name_a
        |          JOIN customer y ON y.c_name = ne.name_b
        |  UNION ALL
        |  SELECT a.c_custkey, b.c_custkey FROM customer a JOIN customer b
        |    ON a.c_name = b.c_name AND a.c_custkey < b.c_custkey),
        |und AS MATERIALIZED (
        |  SELECT least(u, v) AS u, greatest(u, v) AS v FROM e
        |  UNION ALL SELECT greatest(u, v), least(u, v) FROM e),
        |reach(id, r) AS (
        |  SELECT c_custkey, c_custkey FROM customer
        |  UNION
        |  SELECT reach.id, und.v FROM reach JOIN und ON und.u = reach.r),
        |lab AS MATERIALIZED (
        |  SELECT id, min(r) AS entity FROM reach GROUP BY id),
        |sz AS (SELECT entity, count(*) AS n_members FROM lab GROUP BY 1)
        |SELECT id, entity, n_members FROM lab JOIN sz USING (entity)
        |ORDER BY id""".stripMargin,
    // parallel unnests zip (the q8c idiom): pairwise products summed per
    // (i, j) replay the engine's outer-product accumulation exactly
    "q9s_gramian" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |a AS (SELECT vec_id, unnest(range(len(v))) AS i, unnest(v) AS x FROM e),
        |b AS (SELECT vec_id, unnest(range(len(v))) AS j, unnest(v) AS y FROM e)
        |SELECT CAST(a.i AS INT) AS i, CAST(b.j AS INT) AS j,
        |       round(sum(a.x * b.y), 6) AS g
        |FROM a JOIN b USING (vec_id) WHERE a.i <= b.j
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // ten unrolled matvec rounds over the same pairwise-sum Gramian;
    // v0 = 1/sqrt(64) = 0.125 exactly, normalization once at the end
    "q9t_pca_power" -> {
      val base =
        """WITH e AS MATERIALIZED (
          |  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
          |a AS (SELECT vec_id, unnest(range(len(v))) AS i, unnest(v) AS x FROM e),
          |b AS (SELECT vec_id, unnest(range(len(v))) AS j, unnest(v) AS y FROM e),
          |g AS MATERIALIZED (
          |  SELECT CAST(a.i AS INT) AS i, CAST(b.j AS INT) AS j,
          |         sum(a.x * b.y) AS g
          |  FROM a JOIN b USING (vec_id) GROUP BY 1, 2),
          |v0 AS MATERIALIZED (
          |  SELECT DISTINCT i AS dim, 0.125 AS x FROM g)""".stripMargin
      val rounds = (1 to 10).map { k =>
        s"""v$k AS MATERIALIZED (SELECT g.i AS dim, sum(g.g * v${k - 1}.x) AS x
           |  FROM g JOIN v${k - 1} ON g.j = v${k - 1}.dim GROUP BY 1)""".stripMargin
      }.mkString(",\n")
      s"""$base,
         |$rounds
         |SELECT dim, round(x / (SELECT sqrt(sum(x * x)) FROM v10), 6)
         |  AS loading
         |FROM v10 ORDER BY dim""".stripMargin
    },
    // the multiplicative-hash draw is plain BIGINT arithmetic — identical
    // in both engines, so the oracle replays every draw exactly
    "q9u_neg_pairs" ->
      """WITH n AS (SELECT count(*) AS n FROM documents),
        |s AS (SELECT doc_id, unnest(range(4)) AS k FROM documents)
        |SELECT doc_id, CAST(k AS INT) AS k,
        |  (doc_id + 1 + CAST(floor((doc_id * 4 + k) * 2654435761 % 4294967296
        |       / 4294967296.0 * (n - 1)) AS BIGINT)) % n AS neg_id
        |FROM s CROSS JOIN n ORDER BY doc_id, k""".stripMargin,
    "q9v_loo_split" ->
      """WITH r AS (SELECT user_id, event_id,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events)
        |SELECT user_id, event_id,
        |  CASE WHEN rn = 1 THEN 'eval' ELSE 'train' END AS split
        |FROM r ORDER BY user_id, event_id""".stripMargin,
    // "purchase after click" ⟺ max(purchase) > min(click): the oracle
    // replays the same reduction
    "qb0_cart_abandon" ->
      """WITH s AS (SELECT user_id,
        |    CAST(floor(epoch(date_trunc('day', ts))) AS BIGINT) AS day_s,
        |    min(CASE WHEN event_type = 'click' THEN epoch_us(ts) END)
        |      AS c_min,
        |    max(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END)
        |      AS p_max
        |  FROM events GROUP BY 1, 2 HAVING c_min IS NOT NULL)
        |SELECT day_s, count(*) AS n_click_sessions,
        |  CAST(sum(CASE WHEN p_max IS NULL OR p_max <= c_min
        |       THEN 1 ELSE 0 END) AS BIGINT) AS n_abandoned,
        |  round(CAST(sum(CASE WHEN p_max IS NULL OR p_max <= c_min
        |    THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6) AS abandon_rate
        |FROM s GROUP BY 1 ORDER BY 1""".stripMargin,
    // identical add-½ formula with coalesced zero counts; only the
    // per-doc mean of logs crosses a rounded sum
    "qb1_bigram_ppl" ->
      """WITH toks AS (SELECT doc_id,
        |    list_filter(string_split_regex(lower(text), '\s+'),
        |                x -> len(x) > 0) AS w FROM documents),
        |bg AS (SELECT doc_id, w[i] || ' ' || w[i+1] AS gram,
        |         w[i] AS w1
        |       FROM (SELECT doc_id, w, unnest(range(1, len(w))) AS i
        |             FROM toks WHERE len(w) >= 2)),
        |t2 AS (SELECT gram, count(*) AS c_ab FROM bg
        |       WHERE doc_id % 2 = 0 GROUP BY 1),
        |t1 AS (SELECT unnest(w) AS w1 FROM toks WHERE doc_id % 2 = 0),
        |t1c AS (SELECT w1, count(*) AS c_a FROM t1 GROUP BY 1),
        |v AS (SELECT count(*) AS v FROM t1c),
        |sc AS (SELECT bg.doc_id,
        |         ln((coalesce(c_ab, 0) + 0.5)
        |           / (coalesce(c_a, 0) + 0.5 * v)) AS lp
        |       FROM bg LEFT JOIN t2 USING (gram)
        |              LEFT JOIN t1c USING (w1) CROSS JOIN v
        |       WHERE bg.doc_id % 2 = 1)
        |SELECT doc_id, count(*) AS n_bigrams,
        |  round(-sum(lp) / count(*), 6) AS cross_entropy,
        |  round(exp(-sum(lp) / count(*)), 4) AS perplexity
        |FROM sc GROUP BY 1 ORDER BY 1""".stripMargin,
    // directed all-pairs containment from RAW string 3-grams (the qad
    // discipline, asymmetric denominator)
    "qb2_containment" ->
      """WITH t AS (SELECT doc_id,
        |    list_filter(string_split_regex(lower(text), '\s+'),
        |                x -> len(x) > 0) AS w FROM documents),
        |g AS (SELECT doc_id, list_distinct(list_transform(
        |        range(1, len(w) - 1),
        |        i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS sh
        |      FROM t WHERE len(w) >= 3),
        |p AS (SELECT a.doc_id AS a, b.doc_id AS b,
        |        len(list_intersect(a.sh, b.sh)) AS i, len(a.sh) AS na
        |      FROM g a JOIN g b ON a.doc_id <> b.doc_id)
        |SELECT a, b, round(CAST(i AS DOUBLE) / na, 6) AS containment
        |FROM p WHERE round(CAST(i AS DOUBLE) / na, 6) >= 0.8
        |ORDER BY a, b""".stripMargin,
    // decimal-digit binning is string-length arithmetic — exact in both
    // engines (float log bins flip at exact powers)
    "qb3_session_hist" ->
      """WITH d AS (SELECT user_id,
        |    CAST(floor(epoch(date_trunc('day', ts))) AS BIGINT) AS day_s,
        |    max(CAST(floor(epoch(ts)) AS BIGINT))
        |      - min(CAST(floor(epoch(ts)) AS BIGINT)) AS dur_s
        |  FROM events GROUP BY 1, 2),
        |t AS (SELECT count(*) AS total FROM d)
        |SELECT CAST(length(CAST(dur_s AS VARCHAR)) AS INT) AS digits,
        |  count(*) AS n_sessions, min(dur_s) AS min_dur_s,
        |  max(dur_s) AS max_dur_s,
        |  round(CAST(count(*) AS DOUBLE) / min(total), 6) AS share
        |FROM d CROSS JOIN t GROUP BY 1 ORDER BY 1""".stripMargin,
    // wedge enumeration over the q30 edge CTE; both engines order by the
    // ROUNDED score so the top-k cut is identical despite double-sum order
    "qb4_adamic_adar" ->
      """WITH cp AS (SELECT DISTINCT o_custkey AS c, l_partkey AS p
        |            FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |e AS (SELECT a.c AS u, b.c AS v FROM cp a JOIN cp b ON a.p = b.p AND a.c < b.c
        |      GROUP BY 1, 2 HAVING count(*) >= 3),
        |adj AS (SELECT u AS z, v AS x FROM e UNION ALL SELECT v, u FROM e),
        |deg AS (SELECT z, count(*) AS dz FROM adj GROUP BY 1),
        |az AS (SELECT adj.z, adj.x, deg.dz FROM adj JOIN deg USING (z)),
        |w AS (SELECT l.x AS a, r.x AS b,
        |        CAST(round(1e9 / ln(l.dz)) AS BIGINT) AS wt
        |      FROM az l JOIN az r ON l.z = r.z AND l.x < r.x),
        |s AS (SELECT a, b, count(*) AS common_nbrs,
        |        CAST(sum(wt) AS BIGINT) AS sc
        |      FROM w GROUP BY 1, 2),
        |c AS (SELECT s.* FROM s LEFT JOIN e ON s.a = e.u AND s.b = e.v
        |      WHERE e.u IS NULL)
        |SELECT a AS u, b AS v, common_nbrs, round(sc / 1e9, 6) AS aa_score
        |FROM c ORDER BY aa_score DESC, u, v LIMIT 50""".stripMargin,
    // integer-cents daily sums feed the median, so no float boundary can
    // shift either engine's frame contents; both interpolate even frames
    "qb5_rolling_median" ->
      """WITH d AS (SELECT o_orderdate AS d,
        |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |      AS rev_c
        |  FROM orders GROUP BY 1)
        |SELECT CAST(d AS VARCHAR) AS day, round(rev_c / 100.0, 2) AS revenue,
        |  round(median(rev_c) OVER (ORDER BY d
        |    ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) / 100.0, 4) AS med7,
        |  count(*) OVER (ORDER BY d
        |    ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS n_days
        |FROM d ORDER BY day""".stripMargin,
    // lag pairs replay the same polyline (ties broken by event_id);
    // area/span normalizes before the single rounding
    "qb6_time_weighted" ->
      """WITH e AS (SELECT user_id, value,
        |    CAST(floor(epoch(ts)) AS BIGINT) AS t,
        |    lag(value) OVER (PARTITION BY user_id
        |      ORDER BY floor(epoch(ts)), event_id) AS pv,
        |    lag(CAST(floor(epoch(ts)) AS BIGINT)) OVER (PARTITION BY user_id
        |      ORDER BY floor(epoch(ts)), event_id) AS pt
        |  FROM events),
        |p AS (SELECT user_id, (value + pv) / 2 * (t - pt) AS area_term,
        |        t, pt FROM e WHERE pt IS NOT NULL)
        |SELECT user_id, count(*) + 1 AS n_events,
        |  max(t) - min(pt) AS span_s,
        |  round(sum(area_term) / (max(t) - min(pt)), 6) AS twa
        |FROM p GROUP BY 1 HAVING max(t) - min(pt) > 0
        |ORDER BY user_id""".stripMargin,
    // md5_number_lower = little-endian of digest bytes 9..16 — the engine
    // reassembles the same quadword from hex-pair reversal; XOR is
    // order-independent so partitioning never matters
    "qb7_fingerprint" ->
      """WITH c AS (SELECT o_orderstatus, md5_number_lower(
        |    coalesce(CAST(o_orderkey AS VARCHAR), '\N') || '|' ||
        |    coalesce(CAST(o_custkey AS VARCHAR), '\N') || '|' ||
        |    coalesce(o_orderstatus, '\N') || '|' ||
        |    coalesce(CAST(CAST(round(o_totalprice * 100) AS BIGINT)
        |      AS VARCHAR), '\N') || '|' ||
        |    coalesce(CAST(o_orderdate AS VARCHAR), '\N') || '|' ||
        |    coalesce(o_orderpriority, '\N')) AS m
        |  FROM orders)
        |SELECT o_orderstatus, count(*) AS n_rows,
        |  bit_xor(CAST(m & 4294967295 AS BIGINT)) AS xor_lo,
        |  bit_xor(CAST(m >> 32 AS BIGINT)) AS xor_hi
        |FROM c GROUP BY 1 ORDER BY 1""".stripMargin,
    // Near-dup grouping chain: the LSH banding itself is not
    // SQL-expressible, but its exact-Jaccard verification step IS — and
    // DedupSpec pins banding recall 1.0 on the fixtures (planted dups sit
    // at J ≥ 0.9, where the 32×4 banding miss probability is ~1e-15), so
    // the engine's pair list EQUALS the exact J ≥ 0.5 pair set and the
    // q9q recursive-closure pattern replays the grouping end-to-end.
    "q56_dedup_groups" ->
      """WITH RECURSIVE t AS (SELECT doc_id,
        |  list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0) AS w
        |  FROM documents),
        |g AS MATERIALIZED (SELECT doc_id,
        |  list_distinct(list_transform(range(1, len(w) - 1),
        |    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS sh FROM t),
        |e AS MATERIALIZED (
        |  SELECT a.doc_id AS u, b.doc_id AS v
        |  FROM g a JOIN g b ON a.doc_id < b.doc_id
        |  WHERE round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
        |    (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))), 6) >= 0.5),
        |und AS MATERIALIZED (SELECT u, v FROM e UNION ALL SELECT v AS u, u AS v FROM e),
        |verts AS MATERIALIZED (SELECT DISTINCT u AS id FROM und),
        |reach(id, r) AS (
        |  SELECT id, id FROM verts
        |  UNION
        |  SELECT reach.id, und.v FROM reach JOIN und ON und.u = reach.r),
        |lab AS MATERIALIZED (SELECT id AS doc_id, min(r) AS group_id FROM reach GROUP BY id),
        |sz AS (SELECT group_id, count(*) AS group_size FROM lab GROUP BY 1)
        |SELECT doc_id, group_id, group_size, doc_id = group_id AS is_keeper
        |FROM lab JOIN sz USING (group_id) ORDER BY group_id, doc_id""".stripMargin,
    // survivorship on the same closure + the q50 quality formula; the
    // survivor pick replays min_by(doc_id, (-quality, doc_id)) as a
    // quality DESC, doc_id window
    "q8n_dedup_survivors" ->
      """WITH RECURSIVE t AS (SELECT doc_id,
        |  list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0) AS w
        |  FROM documents),
        |g AS MATERIALIZED (SELECT doc_id,
        |  list_distinct(list_transform(range(1, len(w) - 1),
        |    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS sh FROM t),
        |e AS MATERIALIZED (
        |  SELECT a.doc_id AS u, b.doc_id AS v
        |  FROM g a JOIN g b ON a.doc_id < b.doc_id
        |  WHERE round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
        |    (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))), 6) >= 0.5),
        |und AS MATERIALIZED (SELECT u, v FROM e UNION ALL SELECT v AS u, u AS v FROM e),
        |verts AS MATERIALIZED (SELECT DISTINCT u AS id FROM und),
        |reach(id, r) AS (
        |  SELECT id, id FROM verts
        |  UNION
        |  SELECT reach.id, und.v FROM reach JOIN und ON und.u = reach.r),
        |lab AS MATERIALIZED (SELECT id AS doc_id, min(r) AS group_id FROM reach GROUP BY id),
        |u2 AS (SELECT doc_id, len(w) AS n_tokens, len(list_distinct(w)) AS n_uniq,
        |  len(list_filter(w, x -> x IN ('the','a','of','to','and','in','is'))) AS n_stop
        |  FROM t WHERE len(w) > 0),
        |q AS (SELECT doc_id,
        |  round(least(CAST(n_tokens AS DOUBLE) / 100, CAST(1 AS DOUBLE)) * 0.4 +
        |        (CAST(1 AS DOUBLE) - CAST(n_stop AS DOUBLE) / n_tokens) * 0.3 +
        |        CAST(n_uniq AS DOUBLE) / n_tokens * 0.3, 6) AS quality FROM u2),
        |jq AS (SELECT lab.doc_id, lab.group_id, q.quality FROM lab JOIN q USING (doc_id)),
        |sv AS (SELECT group_id, doc_id AS survivor FROM (
        |  SELECT group_id, doc_id, row_number() OVER (PARTITION BY group_id
        |    ORDER BY quality DESC, doc_id) AS rn FROM jq) WHERE rn = 1)
        |SELECT jq.doc_id, jq.group_id, jq.quality, jq.doc_id = sv.survivor AS keep
        |FROM jq JOIN sv USING (group_id) ORDER BY group_id, doc_id""".stripMargin,
    // the oracle mirrors the cap: parts over 40 distinct buyers are
    // excluded before the pair join, then the same >= 3 shared threshold
    "qb8_copurchase_capped" ->
      """WITH cp AS (SELECT DISTINCT o_custkey AS c, l_partkey AS p
        |            FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |keep AS (SELECT p FROM cp GROUP BY p HAVING count(*) <= 40)
        |SELECT a.c AS u, b.c AS v, count(*) AS shared
        |FROM cp a JOIN cp b ON a.p = b.p AND a.c < b.c
        |WHERE a.p IN (SELECT p FROM keep)
        |GROUP BY 1, 2 HAVING count(*) >= 3 ORDER BY u, v""".stripMargin,
    // add-one smoothing on integer counts; the single ln sees identical
    // doubles; both directions replay as rank windows
    "qaw_emerging_terms" ->
      """WITH toks AS (SELECT doc_id % 2 = 1 AS is_new,
        |    unnest(list_filter(string_split_regex(lower(text), '\s+'),
        |           x -> len(x) > 0)) AS token FROM documents),
        |c AS (SELECT token,
        |        CAST(sum(CASE WHEN is_new THEN 1 ELSE 0 END) AS BIGINT)
        |          AS n_new,
        |        CAST(sum(CASE WHEN is_new THEN 0 ELSE 1 END) AS BIGINT)
        |          AS n_old
        |      FROM toks GROUP BY 1 HAVING count(*) >= 30),
        |t AS (SELECT CAST(sum(n_new) AS BIGINT) AS t_new,
        |        CAST(sum(n_old) AS BIGINT) AS t_old, count(*) AS v FROM c),
        |s AS (SELECT token, n_old, n_new,
        |        round(ln((n_new + 1.0) / (t_new + v)
        |          / ((n_old + 1.0) / (t_old + v))), 6) AS log_odds
        |      FROM c CROSS JOIN t),
        |r AS (SELECT 'rising' AS direction, row_number() OVER (
        |        ORDER BY log_odds DESC, token) AS rank, token, n_old,
        |        n_new, log_odds FROM s),
        |f AS (SELECT 'falling' AS direction, row_number() OVER (
        |        ORDER BY log_odds ASC, token) AS rank, token, n_old,
        |        n_new, log_odds FROM s)
        |SELECT direction, CAST(rank AS INT) AS rank, token, n_old, n_new,
        |       log_odds
        |FROM (SELECT * FROM r WHERE rank <= 10
        |      UNION ALL SELECT * FROM f WHERE rank <= 10)
        |ORDER BY direction, rank""".stripMargin,
    // Σ n_A(k)·n_B(k) is exact for an equi-join — the oracle recomputes
    // both sides of the engine's own invariant
    "qax_join_cardinality" ->
      """WITH o AS (SELECT o_custkey AS k, count(*) AS n_o FROM orders
        |           GROUP BY 1),
        |c AS (SELECT c_custkey AS k, count(*) AS n_c FROM customer
        |      GROUP BY 1),
        |p AS (SELECT CAST(sum(n_o * n_c) AS BIGINT) AS predicted,
        |        CAST(max(n_o * n_c) AS BIGINT) AS max_key_pairs
        |      FROM o JOIN c USING (k)),
        |a AS (SELECT count(*) AS actual FROM orders
        |      JOIN customer ON o_custkey = c_custkey)
        |SELECT predicted, actual, predicted = actual AS estimate_exact,
        |       max_key_pairs
        |FROM p CROSS JOIN a""".stripMargin,
    // md5(text-bytes) travels cross-engine (q40/q54 discipline)
    "qay_dedup_savings" ->
      """WITH d AS (SELECT doc_id, source, n_chars, md5(text) AS h
        |           FROM documents),
        |k AS (SELECT h, min(doc_id) AS keeper FROM d GROUP BY 1)
        |SELECT source, count(*) AS n_docs,
        |  CAST(sum(CASE WHEN doc_id <> keeper THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_dupes,
        |  CAST(sum(n_chars) AS BIGINT) AS chars_total,
        |  CAST(sum(CASE WHEN doc_id <> keeper THEN n_chars ELSE 0 END)
        |    AS BIGINT) AS chars_saved,
        |  round(sum(CASE WHEN doc_id <> keeper THEN n_chars ELSE 0 END)
        |    / CAST(sum(n_chars) AS DOUBLE), 6) AS savings_ratio
        |FROM d JOIN k USING (h) GROUP BY 1 ORDER BY 1""".stripMargin,
    // the q30 edge CTE → degree histogram; the CCDF window runs over the
    // degree domain
    "qaz_degree_dist" ->
      """WITH cp AS (SELECT DISTINCT o_custkey AS c, l_partkey AS p
        |            FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |e AS (SELECT a.c AS u, b.c AS v
        |      FROM cp a JOIN cp b ON a.p = b.p AND a.c < b.c
        |      GROUP BY 1, 2 HAVING count(*) >= 3),
        |deg AS (SELECT vertex, count(*) AS degree FROM (
        |          SELECT u AS vertex FROM e UNION ALL SELECT v FROM e)
        |        GROUP BY 1),
        |h AS (SELECT degree, count(*) AS n_vertices FROM deg GROUP BY 1),
        |t AS (SELECT CAST(sum(n_vertices) AS BIGINT) AS t FROM h)
        |SELECT degree, n_vertices,
        |  round(CAST(sum(n_vertices) OVER (ORDER BY degree DESC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
        |    / t, 6) AS ccdf
        |FROM h CROSS JOIN t ORDER BY degree""".stripMargin,
    // q89's triangle CTEs + the degree aggregate; integer triangle and
    // wedge sums divide once at the end
    "qas_clustering_coeff" ->
      """WITH cp AS (SELECT DISTINCT o_custkey AS c, l_partkey AS p
        |            FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |e AS (SELECT a.c AS u, b.c AS v
        |      FROM cp a JOIN cp b ON a.p = b.p AND a.c < b.c
        |      GROUP BY 1, 2 HAVING count(*) >= 3),
        |tri AS (SELECT e1.u AS a, e1.v AS b, e2.v AS c
        |        FROM e e1 JOIN e e2 ON e1.v = e2.u
        |                  JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v),
        |tv AS (SELECT vertex, count(*) AS t FROM (
        |         SELECT a AS vertex FROM tri
        |         UNION ALL SELECT b FROM tri
        |         UNION ALL SELECT c FROM tri) GROUP BY 1),
        |deg AS (SELECT vertex, count(*) AS d FROM (
        |          SELECT u AS vertex FROM e UNION ALL SELECT v FROM e)
        |        GROUP BY 1),
        |j AS (SELECT deg.d, coalesce(tv.t, 0) AS t
        |      FROM deg LEFT JOIN tv USING (vertex))
        |SELECT count(*) AS n_vertices,
        |  (SELECT count(*) FROM e) AS n_edges,
        |  CAST(sum(t) / 3 AS BIGINT) AS n_triangles,
        |  round(CAST(sum(t) AS DOUBLE) / (sum(d * (d - 1)) / 2.0), 6)
        |    AS global_cc,
        |  round(avg(CASE WHEN d >= 2
        |    THEN CAST(t AS DOUBLE) / (d * (d - 1) / 2.0) END), 6)
        |    AS avg_local_cc
        |FROM j""".stripMargin,
    // revenue rounded to cents BEFORE ranking (rank-stable across
    // engines); deciles and the cumulative window run on 10 rows
    "qat_pareto" ->
      """WITH rev AS (SELECT o_custkey, round(sum(o_totalprice), 2) AS rev
        |             FROM orders GROUP BY 1),
        |n AS (SELECT count(*) AS n_cust FROM rev),
        |r AS (SELECT rev, o_custkey,
        |        row_number() OVER (ORDER BY rev DESC, o_custkey) AS rk
        |      FROM rev),
        |d AS (SELECT CAST(ceil(rk * 10 / n_cust) AS INT) AS decile,
        |        count(*) AS n_customers, round(sum(rev), 2) AS decile_rev
        |      FROM r CROSS JOIN n GROUP BY 1),
        |t AS (SELECT sum(decile_rev) AS total_rev FROM d)
        |SELECT decile, n_customers, decile_rev,
        |  round(sum(decile_rev) OVER (ORDER BY decile
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    / total_rev, 6) AS cum_rev_share
        |FROM d CROSS JOIN t ORDER BY decile""".stripMargin,
    // day-granular epoch arithmetic; the churn band replays verbatim
    "qau_churn" ->
      """WITH ev AS (SELECT user_id, date_trunc('day', ts) AS day
        |            FROM events),
        |mx AS (SELECT max(day) AS d_max FROM ev)
        |SELECT user_id, count(*) AS n_events,
        |  CAST(floor(epoch(min(day))) AS BIGINT) AS first_day_s,
        |  CAST(floor(epoch(max(day))) AS BIGINT) AS last_day_s,
        |  CAST(date_diff('day', max(day), d_max) AS INT) AS days_inactive,
        |  date_diff('day', max(day), d_max) > 7 AS churned
        |FROM ev CROSS JOIN mx GROUP BY user_id, d_max
        |ORDER BY user_id""".stripMargin,
    // extract(dow) 0=Sunday ≡ Spark dayofweek−1; the dense 7×24 axis is
    // generated in both engines so zero cells contribute their χ² term
    "qav_dow_profile" ->
      """WITH c AS (SELECT CAST(extract(dow FROM ts) AS INT) AS dow,
        |    CAST(extract(hour FROM ts) AS INT) AS hr, count(*) AS n
        |  FROM events GROUP BY 1, 2),
        |t AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM c),
        |axis AS (SELECT dow, hr FROM
        |  (SELECT CAST(unnest(range(7)) AS INT) AS dow)
        |  CROSS JOIN (SELECT CAST(unnest(range(24)) AS INT) AS hr))
        |SELECT axis.dow, axis.hr,
        |  CAST(coalesce(n, 0) AS BIGINT) AS n,
        |  round(CAST(coalesce(n, 0) AS DOUBLE) / total, 6) AS share,
        |  round(power(coalesce(n, 0) - total / 168.0, 2)
        |    / (total / 168.0), 6) AS chi2_term
        |FROM axis LEFT JOIN c ON c.dow = axis.dow AND c.hr = axis.hr
        |CROSS JOIN t ORDER BY axis.dow, axis.hr""".stripMargin,
    // literals and operation order mirror the engine exactly (1.2 + 1,
    // not 2.2 — same doubles in, same doubles out); integer tf/df sums
    "qao_bm25" ->
      """WITH d2 AS (SELECT doc_id,
        |    list_filter(string_split_regex(lower(text), '\s+'),
        |                t -> len(t) > 0) AS tokens
        |  FROM documents
        |  WHERE len(list_filter(string_split_regex(lower(text), '\s+'),
        |                t -> len(t) > 0)) > 0),
        |lens AS (SELECT doc_id, len(tokens) AS len FROM d2),
        |tfc AS (SELECT doc_id, term, count(*) AS tf
        |        FROM (SELECT doc_id, unnest(tokens) AS term FROM d2)
        |        GROUP BY 1, 2),
        |dfc AS (SELECT term, count(*) AS df FROM tfc GROUP BY 1),
        |st AS (SELECT (SELECT count(*) FROM d2) AS n_docs,
        |              (SELECT avg(len) FROM lens) AS avg_len),
        |q AS (SELECT term, df,
        |        ln((n_docs - df + 0.5) / (df + 0.5) + 1.0) AS idf, avg_len
        |      FROM (SELECT term, df,
        |              row_number() OVER (ORDER BY df DESC, term) AS r
        |            FROM dfc) CROSS JOIN st
        |      WHERE r BETWEEN 11 AND 15)
        |SELECT tfc.doc_id, count(*) AS n_matched,
        |  round(sum(idf * tf * (1.2 + 1) / (tf + 1.2 *
        |    (1.0 - 0.75 + 0.75 * lens.len / avg_len))), 6) AS bm25
        |FROM tfc JOIN q USING (term) JOIN lens ON lens.doc_id = tfc.doc_id
        |GROUP BY 1 ORDER BY bm25 DESC, tfc.doc_id LIMIT 20""".stripMargin,
    // ties collapse per distinct value before the CDFs; the split is the
    // q57 BIGINT hash arithmetic
    "qap_ks_drift" ->
      """WITH v AS (SELECT o_totalprice AS x,
        |    (o_orderkey * 2654435761) % 4294967296 / 4294967296.0 < 0.5
        |      AS is_a FROM orders),
        |g AS (SELECT x, sum(CASE WHEN is_a THEN 1 ELSE 0 END) AS na,
        |        sum(CASE WHEN is_a THEN 0 ELSE 1 END) AS nb
        |      FROM v GROUP BY 1),
        |c AS (SELECT x,
        |        sum(na) OVER (ORDER BY x ROWS BETWEEN UNBOUNDED PRECEDING
        |          AND CURRENT ROW) AS ca,
        |        sum(nb) OVER (ORDER BY x ROWS BETWEEN UNBOUNDED PRECEDING
        |          AND CURRENT ROW) AS cb FROM g),
        |t AS (SELECT CAST(sum(na) AS BIGINT) AS ta,
        |             CAST(sum(nb) AS BIGINT) AS tb FROM g)
        |SELECT min(ta) AS n_a, min(tb) AS n_b,
        |  round(max(abs(CAST(ca AS DOUBLE) / ta - CAST(cb AS DOUBLE) / tb)),
        |    6) AS ks_stat
        |FROM c CROSS JOIN t""".stripMargin,
    // quantile_cont(0.5) ≡ Spark's interpolated percentile; the band
    // predicate replays with the same literal order
    "qaq_mad_outliers" ->
      """WITH base AS (SELECT l_returnflag, l_extendedprice AS x
        |              FROM lineitem),
        |m AS (SELECT l_returnflag, quantile_cont(x, 0.5) AS med
        |      FROM base GROUP BY 1),
        |d AS (SELECT l_returnflag, quantile_cont(abs(x - med), 0.5) AS mad
        |      FROM base JOIN m USING (l_returnflag) GROUP BY 1)
        |SELECT l_returnflag, count(*) AS n, round(min(med), 6) AS med,
        |  round(min(mad), 6) AS mad,
        |  CAST(sum(CASE WHEN abs(x - med) > 3.0 * 1.4826 * mad
        |       THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
        |FROM base JOIN m USING (l_returnflag) JOIN d USING (l_returnflag)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // the unrolled 13-term weighted sum with the ENGINE's own weight
    // doubles embedded as literals — same chain, same association order
    "qar_ewma" -> {
      val terms = (0 to 12).map { k =>
        val wt = math.pow(0.7, k).toString
        val x = if (k == 0) "n" else s"lag(n, $k) OVER w"
        (s"CASE WHEN $x IS NOT NULL THEN $wt ELSE 0.0 END",
          s"coalesce($x * $wt, 0.0)")
      }
      s"""WITH h AS (SELECT CAST(floor(epoch(date_trunc('hour', ts)))
         |    AS BIGINT) AS hour_s, event_type,
         |    CAST(count(*) AS DOUBLE) AS n FROM events GROUP BY 1, 2),
         |e AS (SELECT hour_s, event_type, n,
         |        (${terms.map(_._2).mkString(" + ")})
         |        / (${terms.map(_._1).mkString(" + ")}) AS ewma
         |      FROM h WINDOW w AS (PARTITION BY event_type ORDER BY hour_s))
         |SELECT hour_s, event_type, CAST(n AS BIGINT) AS n,
         |  round(ewma, 6) AS ewma
         |FROM e ORDER BY event_type, hour_s""".stripMargin
    },
    // the multiplicative-hash permutation is BIGINT arithmetic end-to-end
    "qak_epoch_shuffle" ->
      """WITH s AS (SELECT doc_id,
        |    (doc_id + 1) * 2654435761 % 4294967296 AS h FROM documents)
        |SELECT doc_id, CAST(h % 8 AS INT) AS shard,
        |  row_number() OVER (PARTITION BY h % 8 ORDER BY h, doc_id) - 1
        |    AS pos
        |FROM s ORDER BY shard, pos""".stripMargin,
    // q46's cosine oracle with the label inequality in the join; the
    // argmax replays as a rank-1 window
    "qal_hard_negatives" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v, label
        |           FROM embeddings),
        |s AS (SELECT q.vec_id AS query_id, q.label AS query_label,
        |        e.vec_id AS neighbor_id, e.label AS neg_label,
        |        round(list_cosine_similarity(q.v, e.v), 6) AS cosine
        |      FROM e q JOIN e ON q.vec_id < 100 AND e.label <> q.label),
        |r AS (SELECT s.*, row_number() OVER (PARTITION BY query_id
        |        ORDER BY cosine DESC, neighbor_id) AS rn FROM s)
        |SELECT query_id, query_label, neighbor_id, neg_label, cosine
        |FROM r WHERE rn = 1 ORDER BY query_id""".stripMargin,
    // centroid components rounded to 6 dp in BOTH engines before the
    // cosine → the pairwise argmax compares identical inputs
    "qam_label_centroids" ->
      """WITH e AS (SELECT label, embedding::DOUBLE[] AS v FROM embeddings),
        |x AS (SELECT label, CAST(unnest(range(len(v))) AS INT) AS dim,
        |        unnest(v) AS x FROM e),
        |c AS (SELECT label, dim, round(avg(x), 6) AS c FROM x
        |      GROUP BY 1, 2),
        |nrm AS (SELECT label, sqrt(sum(c * c)) AS nr FROM c GROUP BY 1),
        |n AS (SELECT label, count(*) AS n_vecs FROM e GROUP BY 1),
        |p AS (SELECT a.label AS label, b.label AS nearest_label,
        |        sum(a.c * b.c) AS d
        |      FROM c a JOIN c b ON a.dim = b.dim AND a.label <> b.label
        |      GROUP BY 1, 2),
        |r AS (SELECT p.label, p.nearest_label,
        |        round(p.d / (na.nr * nb.nr), 6) AS centroid_cosine,
        |        row_number() OVER (PARTITION BY p.label
        |          ORDER BY round(p.d / (na.nr * nb.nr), 6) DESC,
        |                   p.nearest_label) AS rn
        |      FROM p JOIN nrm na ON na.label = p.label
        |             JOIN nrm nb ON nb.label = p.nearest_label)
        |SELECT r.label, n.n_vecs, r.nearest_label, r.centroid_cosine
        |FROM r JOIN n ON n.label = r.label WHERE rn = 1
        |ORDER BY r.label""".stripMargin,
    // rank-weighted Gini over per-key counts: integer sums, two final
    // divisions — replays exactly
    "qan_key_skew" ->
      """WITH c AS (SELECT l_partkey, count(*) AS cnt FROM lineitem
        |           GROUP BY 1),
        |r AS (SELECT cnt, row_number() OVER (ORDER BY cnt, l_partkey)
        |        AS i FROM c),
        |t AS (SELECT CAST(sum(cnt) AS BIGINT) AS top10 FROM
        |        (SELECT cnt FROM c ORDER BY cnt DESC, l_partkey LIMIT 10))
        |SELECT count(*) AS n_keys, CAST(sum(cnt) AS BIGINT) AS total,
        |  max(cnt) AS max_cnt,
        |  round((2.0 * sum(i * cnt) - (count(*) + 1) * sum(cnt))
        |    / (count(*) * sum(cnt)), 6) AS gini,
        |  round(CAST(max(cnt) AS DOUBLE) / sum(cnt), 6) AS max_share,
        |  round(CAST(min(top10) AS DOUBLE) / sum(cnt), 6) AS top10_share
        |FROM r CROSS JOIN t""".stripMargin,
    // (day_index − row_number) is integer arithmetic — replays verbatim
    "qag_streaks" ->
      """WITH d AS (SELECT DISTINCT user_id,
        |    CAST(floor(epoch(date_trunc('day', ts))) AS BIGINT) // 86400
        |      AS day_i FROM events),
        |r AS (SELECT user_id, day_i,
        |        day_i - row_number() OVER (PARTITION BY user_id
        |          ORDER BY day_i) AS g FROM d),
        |s AS (SELECT user_id, g, count(*) AS len FROM r GROUP BY 1, 2)
        |SELECT user_id, max(len) AS longest_streak,
        |  CAST(sum(len) AS BIGINT) AS n_active_days,
        |  count(*) AS n_streaks
        |FROM s GROUP BY 1 ORDER BY 1""".stripMargin,
    // both engines use the textbook sample-corr aggregate on an integer
    // series; fp wobble is ~1e-14 against a 6-dp rounding
    "qah_autocorr" ->
      """WITH h AS (SELECT CAST(floor(epoch(date_trunc('hour', ts)))
        |      AS BIGINT) AS hour_s,
        |    CAST(count(*) AS DOUBLE) AS n FROM events GROUP BY 1),
        |l AS (SELECT n, lag(n, 1) OVER (ORDER BY hour_s) AS n1,
        |        lag(n, 24) OVER (ORDER BY hour_s) AS n24 FROM h)
        |SELECT count(*) AS n_hours, round(corr(n, n1), 6) AS lag1_corr,
        |       round(corr(n, n24), 6) AS lag24_corr FROM l""".stripMargin,
    // ordered string_agg ≡ the engine's rank-sorted collect+join
    "qai_path_topk" ->
      """WITH r AS (SELECT user_id,
        |    CAST(floor(epoch(date_trunc('day', ts))) AS BIGINT) AS day_s,
        |    event_type, row_number() OVER (PARTITION BY user_id,
        |      CAST(floor(epoch(date_trunc('day', ts))) AS BIGINT)
        |      ORDER BY ts, event_id) AS rn FROM events),
        |p AS (SELECT user_id, day_s,
        |        string_agg(event_type, '>' ORDER BY rn) AS path
        |      FROM r WHERE rn <= 3 GROUP BY 1, 2)
        |SELECT path, count(*) AS n_sessions FROM p
        |GROUP BY 1 ORDER BY n_sessions DESC, path LIMIT 10""".stripMargin,
    // q55's RE2-safe pattern → identical token counts; sum/sum and
    // avg-of-ratios both rounded once
    "qaj_fertility" ->
      """WITH d AS (SELECT lang,
        |    CAST(len(regexp_extract_all(lower(text),
        |      ' ?[a-z]+| ?[0-9]+| ?[^\sa-z0-9]+')) AS DOUBLE) AS bpe,
        |    CAST(len(list_filter(string_split_regex(lower(text), '\s+'),
        |      x -> len(x) > 0)) AS DOUBLE) AS words
        |  FROM documents)
        |SELECT lang, count(*) AS n_docs,
        |  CAST(sum(bpe) AS BIGINT) AS n_bpe_tokens,
        |  CAST(sum(words) AS BIGINT) AS n_words,
        |  round(sum(bpe) / sum(words), 6) AS corpus_fertility,
        |  round(avg(bpe / words), 6) AS avg_doc_fertility
        |FROM d WHERE words > 0 GROUP BY 1 ORDER BY 1""".stripMargin,
    // identical division sequence before the single ln() → identical
    // doubles; unigram/bigram totals are integer sums (order-free)
    "qac_bigram_pmi" ->
      """WITH toks AS (SELECT doc_id,
        |    list_filter(string_split_regex(lower(text), '\s+'),
        |                x -> len(x) > 0) AS w FROM documents),
        |u AS (SELECT unnest(w) AS gram FROM toks),
        |uc AS (SELECT gram, count(*) AS n_tok FROM u GROUP BY 1),
        |nt AS (SELECT CAST(sum(n_tok) AS BIGINT) AS total_tok FROM uc),
        |bgl AS (SELECT w[i] || ' ' || w[i+1] AS gram
        |        FROM (SELECT w, unnest(range(1, len(w))) AS i
        |              FROM toks WHERE len(w) >= 2)),
        |b AS (SELECT gram, count(*) AS n_bg FROM bgl GROUP BY 1
        |      HAVING count(*) >= 20),
        |nb AS (SELECT CAST(sum(n_bg) AS BIGINT) AS total_bg FROM b)
        |SELECT b.gram, b.n_bg, u1.n_tok AS n1, u2.n_tok AS n2,
        |  round(ln(CAST(b.n_bg AS DOUBLE) / total_bg
        |    / (CAST(u1.n_tok AS DOUBLE) / total_tok)
        |    / (CAST(u2.n_tok AS DOUBLE) / total_tok)), 6) AS pmi
        |FROM b CROSS JOIN nb CROSS JOIN nt
        |JOIN uc u1 ON u1.gram = string_split(b.gram, ' ')[1]
        |JOIN uc u2 ON u2.gram = string_split(b.gram, ' ')[2]
        |ORDER BY pmi DESC, b.gram LIMIT 50""".stripMargin,
    // raw-string all-pairs Jaccard pins the engine's hashed+prefix-
    // filtered route end to end (the q45 discipline, uncapped here)
    "qad_prefix_join" ->
      """WITH t AS (SELECT doc_id,
        |    list_filter(string_split_regex(lower(text), '\s+'),
        |                x -> len(x) > 0) AS w FROM documents),
        |g AS (SELECT doc_id, list_distinct(list_transform(
        |        range(1, len(w) - 1),
        |        i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS sh
        |      FROM t WHERE len(w) >= 3),
        |p AS (SELECT a.doc_id AS u, b.doc_id AS v,
        |        len(list_intersect(a.sh, b.sh)) AS i,
        |        len(a.sh) AS na, len(b.sh) AS nb
        |      FROM g a JOIN g b ON a.doc_id < b.doc_id)
        |SELECT u, v, round(CAST(i AS DOUBLE) / (na + nb - i), 6) AS jaccard
        |FROM p WHERE round(CAST(i AS DOUBLE) / (na + nb - i), 6) >= 0.5
        |ORDER BY u, v""".stripMargin,
    // ⌊z+0.5⌋ quantizer + list-ordered folds: every per-element double is
    // reproduced exactly; only mse crosses a (9-dp-rounded) sum
    "qae_int8_quant" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |s AS (SELECT vec_id, v, list_min(v) AS mn, list_max(v) AS mx
        |      FROM e),
        |t AS (SELECT vec_id, mn, mx,
        |        list_transform(v, x -> x - (mn +
        |          floor((x - mn) / ((mx - mn) / 255.0) + 0.5)
        |            * ((mx - mn) / 255.0))) AS err
        |      FROM s WHERE mx > mn)
        |SELECT vec_id, round(mn, 6) AS mn, round(mx, 6) AS mx,
        |  round(list_max(list_transform(err, x -> abs(x))), 8)
        |    AS max_abs_err,
        |  round(list_sum(list_transform(err, x -> x * x)) / len(err), 9)
        |    AS mse
        |FROM t ORDER BY vec_id""".stripMargin,
    // quantile_cont ≡ Spark's interpolated percentile (q1b precedent);
    // the clip flag replays as the range predicate
    "qaf_winsorize" ->
      """WITH base AS (SELECT n_name, o_totalprice AS x
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |              JOIN nation ON c_nationkey = n_nationkey),
        |b AS (SELECT n_name, quantile_cont(x, 0.05) AS lo,
        |        quantile_cont(x, 0.95) AS hi FROM base GROUP BY 1)
        |SELECT n_name, count(*) AS n, round(avg(x), 6) AS raw_avg,
        |  round(avg(least(greatest(x, lo), hi)), 6) AS wins_avg,
        |  CAST(sum(CASE WHEN x < lo OR x > hi THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_clipped,
        |  round(min(lo), 6) AS p05, round(min(hi), 6) AS p95
        |FROM base JOIN b USING (n_name)
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
    // window-pass island merge replays verbatim; HUGEINT sums cast back
    "qa8_interval_merge" ->
      """WITH iv AS (SELECT user_id, event_id, epoch_us(ts) AS lo,
        |              epoch_us(ts) + 1800000000 AS hi FROM events),
        |m AS (SELECT user_id, event_id, lo, hi,
        |        max(hi) OVER (PARTITION BY user_id ORDER BY lo, event_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS ph
        |      FROM iv),
        |isl AS (SELECT user_id, lo, hi,
        |        sum(CASE WHEN ph IS NULL OR lo > ph THEN 1 ELSE 0 END)
        |          OVER (PARTITION BY user_id ORDER BY lo, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |          AS island
        |        FROM m),
        |g AS (SELECT user_id, island, count(*) AS n_iv,
        |        min(lo) AS i_lo, max(hi) AS i_hi
        |      FROM isl GROUP BY 1, 2)
        |SELECT user_id, CAST(sum(n_iv) AS BIGINT) AS n_intervals,
        |       count(*) AS n_islands,
        |       CAST(sum(i_hi - i_lo) AS BIGINT) AS covered_us
        |FROM g GROUP BY 1 ORDER BY 1""".stripMargin,
    // the bitmap pipeline is exact, so the oracle is plain COUNT(DISTINCT)
    "qa9_bitmap_distinct" ->
      """SELECT n_name, count(DISTINCT o_custkey) AS n_buyers
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |            JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // integer ages → identical exp() terms; only the final sum is rounded
    "qaa_decay_topk" ->
      """WITH mx AS (SELECT max(date_trunc('day', o_orderdate)) AS d_max
        |            FROM orders)
        |SELECT l_partkey,
        |  round(sum(exp(-0.05 * datediff('day',
        |    date_trunc('day', o_orderdate), d_max))), 6) AS decay_score,
        |  count(*) AS n_lines
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey CROSS JOIN mx
        |GROUP BY 1 ORDER BY decay_score DESC, l_partkey LIMIT 100""".stripMargin,
    // min/max-ts reduction makes "∃ a before b" a linear aggregate in
    // both engines — the oracle replays the same reduction, not events²
    "qab_seq_pairs" ->
      """WITH s AS (SELECT user_id,
        |    CAST(floor(epoch(date_trunc('day', ts))) AS BIGINT) AS day_s,
        |    event_type, min(epoch_us(ts)) AS t_min,
        |    max(epoch_us(ts)) AS t_max
        |  FROM events GROUP BY 1, 2, 3)
        |SELECT a.event_type AS a, b.event_type AS b,
        |       count(*) AS n_sessions
        |FROM s a JOIN s b ON a.user_id = b.user_id AND a.day_s = b.day_s
        |WHERE a.event_type <> b.event_type AND a.t_min < b.t_max
        |GROUP BY 1, 2 HAVING count(*) >= 20 ORDER BY 1, 2""".stripMargin,
    // q88's graph CTEs with the restart on the min-id seed; every round
    // keeps the full vertex set (left join + coalesce) like the engine
    "qa7_ppr" -> {
      val graph =
        """WITH cp AS (SELECT DISTINCT o_custkey AS c, l_partkey AS p
          |            FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
          |e AS (SELECT a.c AS u, b.c AS v FROM cp a JOIN cp b ON a.p = b.p AND a.c < b.c
          |      GROUP BY 1, 2 HAVING count(*) >= 3),
          |und AS (SELECT u AS src, v AS dst FROM e UNION ALL SELECT v, u FROM e),
          |deg AS (SELECT src, count(*) AS d FROM und GROUP BY 1),
          |w AS MATERIALIZED (
          |  SELECT und.src, und.dst, 1.0 / deg.d AS w FROM und JOIN deg USING (src)),
          |sd AS (SELECT min(src) AS s FROM w),
          |vs AS MATERIALIZED (SELECT DISTINCT src AS v FROM w),
          |p0 AS (SELECT v, CASE WHEN v = (SELECT s FROM sd) THEN 1.0 ELSE 0.0 END AS r
          |       FROM vs)""".stripMargin
      val steps = (1 to 10).map { i =>
        s"""p$i AS MATERIALIZED (SELECT vs.v,
           |  0.15 * (CASE WHEN vs.v = (SELECT s FROM sd) THEN 1.0 ELSE 0.0 END)
           |  + 0.85 * coalesce(m.mass, 0) AS r
           |  FROM vs LEFT JOIN (SELECT w.dst AS v, sum(p${i - 1}.r * w.w) AS mass
           |    FROM w JOIN p${i - 1} ON w.src = p${i - 1}.v GROUP BY 1) m
           |    ON m.v = vs.v)""".stripMargin
      }.mkString(",\n")
      s"$graph,\n$steps\nSELECT v, round(r, 8) AS rank FROM p10 ORDER BY v"
    },
    // IS NOT DISTINCT FROM = Spark's <=>; NULLS FIRST must be explicit
    "qa6_null_safe_join" ->
      """WITH a AS (SELECT CASE WHEN o_custkey % 10 = 0 THEN NULL
        |         ELSE o_custkey % 100 END AS k, count(*) AS n_orders
        |       FROM orders GROUP BY 1),
        |b AS (SELECT CASE WHEN c_custkey % 10 = 0 THEN NULL
        |        ELSE c_custkey % 100 END AS k, count(*) AS n_customers
        |      FROM customer GROUP BY 1)
        |SELECT a.k IS NULL AS k_is_null, coalesce(a.k, -1) AS k,
        |       n_orders, n_customers
        |FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.k
        |ORDER BY k""".stripMargin,
    // the merged union-schema read replays from the epoch residue
    "qa5_schema_evolution" ->
      """SELECT lang, count(*) AS n,
        |  CAST(sum(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_legacy,
        |  round(avg(CASE WHEN doc_id % 2 = 1 THEN length(text) % 100 END), 6)
        |    AS avg_quality
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,
    // identical deterministic sample both engines → exact replay of the
    // estimate AND its confidence bounds (sum/count form, never avg())
    "qa4_sampled_estimate" ->
      """WITH s AS (SELECT l_extendedprice AS x FROM lineitem
        |  WHERE (l_orderkey * 7 + l_linenumber) * 2654435761 % 4294967296
        |        / 4294967296.0 < 0.05)
        |SELECT count(*) AS n_sample,
        |  round(sum(x) / 0.05, 2) AS est_total,
        |  round(sum(x) / count(*) - 1.96 * sqrt((sum(x * x) / count(*) -
        |    (sum(x) / count(*)) * (sum(x) / count(*))) / count(*)), 2)
        |    AS avg_lo,
        |  round(sum(x) / count(*) + 1.96 * sqrt((sum(x * x) / count(*) -
        |    (sum(x) / count(*)) * (sum(x) / count(*))) / count(*)), 2)
        |    AS avg_hi
        |FROM s""".stripMargin,
    // DuckDB's native inequality join (IEJoin) is the oracle for the
    // engine's binned-and-deduped overlap join
    "qa3_interval_overlap" ->
      """WITH e AS (SELECT event_id, ts, epoch_us(ts) AS lo,
        |             epoch_us(ts) + 3600000000 AS hi
        |           FROM events WHERE event_type = 'error'),
        |p AS (SELECT epoch_us(ts) AS lo, epoch_us(ts) + 1800000000 AS hi
        |      FROM events WHERE event_type = 'purchase')
        |SELECT e.event_id, CAST(floor(epoch(e.ts)) AS BIGINT) AS ts_s,
        |       count(p.lo) AS n_purch
        |FROM e LEFT JOIN p ON e.lo < p.hi AND p.lo < e.hi
        |GROUP BY 1, 2 ORDER BY event_id""".stripMargin,
    // same tokenizer as q51; ln + OLS aggregates replay exactly
    "qa1_zipf" ->
      """WITH toks AS (SELECT
        |    unnest(list_filter(string_split_regex(lower(text), '\s+'),
        |           x -> len(x) > 0)) AS token FROM documents),
        |c AS (SELECT token, count(*) AS freq FROM toks GROUP BY 1),
        |r AS (SELECT freq,
        |    row_number() OVER (ORDER BY freq DESC, token) AS rank FROM c)
        |SELECT round(regr_slope(ln(freq), ln(rank)), 6) AS zipf_slope,
        |       round(regr_intercept(ln(freq), ln(rank)), 6) AS zipf_intercept,
        |       count(*) AS n_terms
        |FROM r WHERE rank <= 1000""".stripMargin,
    // the as-of winner per key is arithmetic over the batch residues;
    // md5(text-bytes) travels cross-engine (the q72 discipline)
    "q9z_snapshot_asof" ->
      """SELECT doc_id,
        |  CASE WHEN doc_id % 5 = 0 THEN 2
        |       WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END AS version,
        |  md5(CASE WHEN doc_id % 5 = 0 THEN text || ' v2'
        |           WHEN doc_id % 3 = 0 THEN upper(text)
        |           ELSE text END) AS h
        |FROM documents ORDER BY doc_id""".stripMargin,
    // the q9t chain verbatim, then one unnest join projects every vector
    // onto the rounded loading vector — both engines use the identical v
    "qa0_pca_scores" -> {
      val base =
        """WITH e AS MATERIALIZED (
          |  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
          |a AS (SELECT vec_id, unnest(range(len(v))) AS i, unnest(v) AS x FROM e),
          |b AS (SELECT vec_id, unnest(range(len(v))) AS j, unnest(v) AS y FROM e),
          |g AS MATERIALIZED (
          |  SELECT CAST(a.i AS INT) AS i, CAST(b.j AS INT) AS j,
          |         sum(a.x * b.y) AS g
          |  FROM a JOIN b USING (vec_id) GROUP BY 1, 2),
          |v0 AS MATERIALIZED (
          |  SELECT DISTINCT i AS dim, 0.125 AS x FROM g)""".stripMargin
      val rounds = (1 to 10).map { k =>
        s"""v$k AS MATERIALIZED (SELECT g.i AS dim, sum(g.g * v${k - 1}.x) AS x
           |  FROM g JOIN v${k - 1} ON g.j = v${k - 1}.dim GROUP BY 1)""".stripMargin
      }.mkString(",\n")
      s"""$base,
         |$rounds,
         |vn AS MATERIALIZED (
         |  SELECT dim, round(x / (SELECT sqrt(sum(x * x)) FROM v10), 6)
         |    AS loading FROM v10),
         |u AS (SELECT vec_id, unnest(range(len(v))) AS dim, unnest(v) AS x
         |      FROM e),
         |s AS (SELECT vec_id, round(sum(x * loading), 5) AS score
         |      FROM u JOIN vn ON u.dim = vn.dim GROUP BY vec_id)
         |SELECT vec_id, score FROM s
         |ORDER BY abs(score) DESC, vec_id LIMIT 25""".stripMargin
    },
    // the merged-partials refresh must equal the from-scratch aggregate
    "q9x_incr_agg" ->
      """SELECT CAST(floor(epoch(date_trunc('hour', ts))) AS BIGINT) AS hour_s,
        |       event_type, count(*) AS n, round(sum(value), 6) AS sum_value,
        |       round(sum(value) / count(*), 6) AS avg_value
        |FROM events GROUP BY 1, 2 ORDER BY hour_s, event_type""".stripMargin,
    "q9y_cum_users" ->
      """WITH fs AS (SELECT o_custkey, min(strftime(o_orderdate, '%Y-%m'))
        |    AS month FROM orders GROUP BY 1),
        |m AS (SELECT month, count(*) AS new_customers FROM fs GROUP BY 1)
        |SELECT month, new_customers,
        |  CAST(sum(new_customers) OVER (ORDER BY month
        |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_customers
        |FROM m ORDER BY month""".stripMargin,
    // the drained stream-static join must equal the batch join+aggregate
    "q9w_stream_enrich" ->
      """SELECT c_nationkey, count(*) AS n, round(sum(value), 6) AS sum_value
        |FROM events JOIN customer ON user_id = c_custkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // the z-ordered round-trip must equal the plain filter + aggregate
    "q9r_zorder_box" ->
      """SELECT l_suppkey, count(*) AS cnt,
        |       round(sum(l_quantity), 6) AS sum_qty,
        |       round(sum(l_extendedprice), 6) AS sum_price
        |FROM lineitem
        |WHERE l_partkey BETWEEN 1 AND 50 AND l_suppkey BETWEEN 1 AND 5
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // e carries u < v, so each triangle {a<b<c} matches exactly once as
    // (a,b)(b,c)+(a,c) — the closing edge lookup is the same forward shape
    // the engine runs, minus the degree orientation it needs for skew
    "q89_triangles" ->
      """WITH cp AS (SELECT DISTINCT o_custkey AS c, l_partkey AS p
        |            FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |e AS (SELECT a.c AS u, b.c AS v FROM cp a JOIN cp b ON a.p = b.p AND a.c < b.c
        |      GROUP BY 1, 2 HAVING count(*) >= 3),
        |tri AS (SELECT e1.u AS a, e1.v AS b, e2.v AS c
        |        FROM e e1 JOIN e e2 ON e1.v = e2.u
        |                  JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v)
        |SELECT vertex, count(*) AS triangles FROM (
        |  SELECT a AS vertex FROM tri
        |  UNION ALL SELECT b FROM tri
        |  UNION ALL SELECT c FROM tri)
        |GROUP BY vertex ORDER BY vertex""".stripMargin,
    // exact all-pairs levenshtein — a hash match proves the deletion-
    // neighborhood blocking lost no pair on the fixture
    "q8a_fuzzy_join" ->
      """SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
        |       levenshtein(a.c_name, b.c_name) AS dist
        |FROM customer a JOIN customer b ON a.c_custkey < b.c_custkey
        |WHERE levenshtein(a.c_name, b.c_name) <= 1
        |ORDER BY id_a, id_b""".stripMargin,
    // CMS overestimates only, so the sketch shortlist ⊇ the true heavy
    // hitters and the exact re-count filter makes the result EQUAL the
    // plain GROUP BY HAVING — which is therefore the oracle
    "q8b_cms_heavy" ->
      """SELECT l_partkey, count(*) AS cnt FROM lineitem
        |GROUP BY 1 HAVING count(*) >= 45 ORDER BY 1""".stripMargin,
    // parallel unnests zip in DuckDB: (dim, value) rows → avg per (label,
    // dim) = the engine's vsum/n; then the same L2 normalization
    "q8c_embed_pool" ->
      """WITH e AS (SELECT label, embedding::DOUBLE[] AS v FROM embeddings),
        |u AS (SELECT label, unnest(range(len(v))) AS dim, unnest(v) AS x FROM e),
        |m AS (SELECT label, dim, avg(x) AS mean FROM u GROUP BY 1, 2),
        |n2 AS (SELECT label, sqrt(sum(mean * mean)) AS nrm FROM m GROUP BY 1)
        |SELECT m.label, CAST(m.dim AS INT) AS dim,
        |       round(m.mean / n2.nrm, 6) AS pooled
        |FROM m JOIN n2 USING (label) ORDER BY label, dim""".stripMargin,
    // the bucketed zero-shuffle join must equal the plain join+aggregate
    "q8d_bucketed_join" ->
      """SELECT p_brand, round(sum(l_quantity), 6) AS sum_qty, count(*) AS cnt
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // windows travel as xxhash64 in the engine, as plain strings here — a
    // hash match proves the 64-bit keying lost nothing on the fixture
    "q8e_repeated_ngrams" ->
      """WITH toks AS (SELECT doc_id,
        |    list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0) AS t
        |  FROM documents),
        |w AS (SELECT doc_id,
        |    unnest(list_transform(generate_series(1, len(t) - 7),
        |                          i -> array_to_string(t[i:i+7], ' '))) AS win
        |  FROM toks WHERE len(t) >= 8),
        |d AS (SELECT DISTINCT doc_id, win FROM w),
        |c AS (SELECT win, count(*) AS nd FROM d GROUP BY win)
        |SELECT doc_id, count(*) AS n_windows,
        |  CAST(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_repeated,
        |  round(avg(CASE WHEN nd > 1 THEN 1.0 ELSE 0.0 END), 6) AS repeated_frac
        |FROM d JOIN c USING (win)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // full CDC replay: the boundary scan is a recursive CTE stepping one
    // token per iteration (bounded by the longest document) carrying the
    // run length — boundary when (len >= 4 AND md5_number_lower(tok) % 8
    // = 0) OR len = 32, remainder closes at end-of-doc — and chunk
    // identity is md5_number_lower of the chunk's own text, the same
    // md5-quadword the engine computes (HUGEINT vs signed-long read-back
    // is an injective relabeling, so grouping cardinalities match)
    "q8i_cdc_chunks" ->
      """WITH RECURSIVE
        |t AS (SELECT doc_id,
        |    list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0) AS w
        |  FROM documents),
        |d AS (SELECT doc_id, w, len(w) AS n FROM t WHERE len(w) > 0),
        |h AS (SELECT doc_id, unnest(range(1, n + 1)) AS pos,
        |    unnest(list_transform(w, x -> md5_number_lower(x) % 8 = 0)) AS mark
        |  FROM d),
        |scan AS (
        |  SELECT doc_id, 0 AS pos, 0 AS len FROM d
        |  UNION ALL
        |  SELECT s.doc_id, s.pos + 1,
        |    CASE WHEN (s.len + 1 >= 4 AND h.mark) OR s.len + 1 = 32
        |         THEN 0 ELSE s.len + 1 END
        |  FROM scan s JOIN h ON h.doc_id = s.doc_id AND h.pos = s.pos + 1),
        |bnd AS (
        |  SELECT doc_id, pos AS e FROM scan WHERE pos > 0 AND len = 0
        |  UNION
        |  SELECT s.doc_id, s.pos AS e FROM scan s JOIN d ON d.doc_id = s.doc_id
        |  WHERE s.pos = d.n AND s.len > 0),
        |b AS (SELECT doc_id, e,
        |    coalesce(lag(e) OVER (PARTITION BY doc_id ORDER BY e), 0) AS sprev
        |  FROM bnd),
        |ck AS (SELECT DISTINCT b.doc_id,
        |    md5_number_lower(array_to_string(d.w[b.sprev + 1 : b.e], ' ')) AS ch
        |  FROM b JOIN d ON d.doc_id = b.doc_id),
        |df AS (SELECT ch, count(*) AS nd FROM ck GROUP BY ch)
        |SELECT ck.doc_id, count(*) AS n_chunks,
        |  CAST(sum(CASE WHEN df.nd > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared
        |FROM ck JOIN df USING (ch)
        |GROUP BY ck.doc_id ORDER BY doc_id""".stripMargin,
    "q8m_resample_gapfill" ->
      """WITH counts AS (
        |  SELECT CAST(floor(epoch(date_trunc('hour', ts)) ) AS BIGINT) AS hour_s,
        |         event_type, count(*) AS n, round(avg(value), 6) AS avg_value
        |  FROM events GROUP BY 1, 2),
        |span AS (SELECT event_type, min(hour_s) AS lo, max(hour_s) AS hi
        |         FROM counts GROUP BY 1),
        |axis AS (SELECT event_type,
        |                unnest(generate_series(lo, hi, 3600)) AS hour_s
        |         FROM span)
        |SELECT a.event_type, a.hour_s, coalesce(c.n, 0) AS n,
        |  last_value(c.avg_value IGNORE NULLS) OVER (
        |    PARTITION BY a.event_type ORDER BY a.hour_s
        |    ROWS UNBOUNDED PRECEDING) AS filled_avg
        |FROM axis a LEFT JOIN counts c
        |  ON a.event_type = c.event_type AND a.hour_s = c.hour_s
        |ORDER BY a.event_type, a.hour_s""".stripMargin,
    "q8k_weighted_sample" ->
      """SELECT doc_id, source, w,
        |       round(pow(u, 1.0 / w), 6) AS skey
        |FROM (SELECT doc_id, source,
        |        CAST(CASE source WHEN 'src0' THEN 4.0 WHEN 'src1' THEN 2.0
        |             ELSE 1.0 END AS DOUBLE) AS w,
        |        ((doc_id * 2654435761) % 4294967296) / 4294967296.0 AS u
        |      FROM documents)
        |ORDER BY skey DESC, doc_id LIMIT 100""".stripMargin,
    "q8l_full_outer" ->
      """WITH returned AS (
        |  SELECT l_partkey, count(*) AS n_returns FROM lineitem
        |  WHERE l_returnflag = 'R' GROUP BY l_partkey),
        |branded AS (
        |  SELECT p_partkey, round(p_retailprice, 6) AS price FROM part
        |  WHERE p_brand = 'Brand#11')
        |SELECT coalesce(l_partkey, p_partkey) AS partkey, n_returns, price,
        |  CASE WHEN l_partkey IS NOT NULL AND p_partkey IS NOT NULL THEN 'both'
        |       WHEN l_partkey IS NOT NULL THEN 'returned_only'
        |       ELSE 'brand_only' END AS side
        |FROM returned FULL JOIN branded ON l_partkey = p_partkey
        |ORDER BY partkey""".stripMargin,
    "q8g_unigram_logprob" ->
      """WITH toks AS (SELECT doc_id,
        |    unnest(list_filter(string_split_regex(lower(text), '\s+'),
        |                       x -> len(x) > 0)) AS tok
        |  FROM documents),
        |freq AS (SELECT tok, count(*) AS c FROM toks GROUP BY tok),
        |tot AS (SELECT sum(c) AS tot FROM freq)
        |SELECT doc_id, count(*) AS n_tokens,
        |  round(sum(log10(CAST(c AS DOUBLE) / tot)) / count(*), 6) AS avg_log10p
        |FROM toks JOIN freq USING (tok) CROSS JOIN tot
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q8o_funnel" ->
      """WITH v AS (SELECT user_id, min(ts) AS t_view FROM events
        |           WHERE event_type = 'view' GROUP BY 1),
        |c AS (SELECT e.user_id, min(e.ts) AS t_click
        |      FROM events e JOIN v ON e.user_id = v.user_id
        |      WHERE e.event_type = 'click' AND e.ts > v.t_view GROUP BY 1),
        |p AS (SELECT e.user_id, min(e.ts) AS t_purchase
        |      FROM events e JOIN c ON e.user_id = c.user_id
        |      WHERE e.event_type = 'purchase' AND e.ts > c.t_click GROUP BY 1)
        |SELECT * FROM (
        |  SELECT 1 AS stage, 'view' AS event_type, count(*) AS users FROM v
        |  UNION ALL
        |  SELECT 2, 'click', count(*) FROM c
        |  UNION ALL
        |  SELECT 3, 'purchase', count(*) FROM p)
        |ORDER BY stage""".stripMargin,
    "q8p_cohort_retention" ->
      """WITH ev AS (SELECT user_id,
        |    CAST(floor(epoch(date_trunc('day', ts))) AS BIGINT) AS day_s
        |  FROM events),
        |coh AS (SELECT user_id, min(day_s) AS cohort_s FROM ev GROUP BY 1)
        |SELECT cohort_s,
        |  CAST((ev.day_s - coh.cohort_s) / 86400 AS INT) AS offset_d,
        |  count(DISTINCT ev.user_id) AS users
        |FROM ev JOIN coh ON ev.user_id = coh.user_id
        |WHERE (ev.day_s - coh.cohort_s) / 86400 <= 7
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q8q_pii_scrub" ->
      """WITH planted AS (SELECT doc_id,
        |    CASE WHEN doc_id % 5 = 0
        |         THEN 'contact user' || doc_id || '@example.com ref ' ||
        |              (doc_id * 7919) || ' ' || text
        |         ELSE text END AS t
        |  FROM documents),
        |e AS (SELECT doc_id,
        |    CAST(len(regexp_extract_all(t, '[a-z0-9._-]+@[a-z0-9-]+\.[a-z]{2,}'))
        |         AS INT) AS n_emails,
        |    regexp_replace(t, '[a-z0-9._-]+@[a-z0-9-]+\.[a-z]{2,}',
        |                   '<EMAIL>', 'g') AS t2
        |  FROM planted)
        |SELECT doc_id, n_emails,
        |  CAST(len(regexp_extract_all(t2, '[0-9][0-9][0-9]+')) AS INT)
        |    AS n_digit_runs,
        |  regexp_replace(t2, '[0-9][0-9][0-9]+', '<NUM>', 'g') AS clean_text
        |FROM e ORDER BY doc_id""".stripMargin,
    "q8r_token_entropy" ->
      """WITH tok AS (SELECT doc_id,
        |    unnest(list_filter(string_split_regex(lower(text), '\s+'),
        |                       x -> len(x) > 0)) AS token
        |  FROM documents),
        |tf AS (SELECT doc_id, token, count(*) AS c FROM tok GROUP BY 1, 2),
        |tot AS (SELECT doc_id, sum(c) AS n, count(*) AS vocab
        |        FROM tf GROUP BY 1)
        |SELECT tf.doc_id, CAST(n AS BIGINT) AS n_tokens,
        |  CAST(vocab AS BIGINT) AS vocab,
        |  round(-sum(c / n * log2(c / n)), 6) AS entropy_bits
        |FROM tf JOIN tot ON tf.doc_id = tot.doc_id
        |GROUP BY tf.doc_id, n, vocab ORDER BY tf.doc_id""".stripMargin,
    "q8s_percent_rank" ->
      """SELECT c_custkey, c_mktsegment, c_acctbal,
        |  round(percent_rank() OVER w, 6) AS pr,
        |  round(cume_dist() OVER w, 6) AS cd
        |FROM customer
        |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
        |ORDER BY c_mktsegment, c_custkey""".stripMargin,
    "q8t_unpivot" ->
      """SELECT o_orderpriority, o_orderstatus AS status,
        |       round(sum(o_totalprice), 6) AS total
        |FROM orders GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q8u_mixture_weights" ->
      """WITH s AS (SELECT source, count(*) AS n FROM documents GROUP BY 1),
        |z AS (SELECT sum(pow(n, 0.7)) AS z FROM s)
        |SELECT source, n, round(pow(n, 0.7) / z, 6) AS weight,
        |       round(pow(n, 0.7) / z * 10000, 2) AS expected_docs
        |FROM s CROSS JOIN z ORDER BY source""".stripMargin,
    "q8v_skyline" ->
      """WITH m AS (SELECT l_partkey, round(sum(l_quantity), 6) AS qty,
        |                  round(avg(l_extendedprice), 6) AS price
        |           FROM lineitem GROUP BY 1)
        |SELECT l_partkey, CAST(qty AS DOUBLE) AS qty,
        |       CAST(price AS DOUBLE) AS price
        |FROM m a
        |WHERE NOT EXISTS (SELECT 1 FROM m b
        |  WHERE b.qty >= a.qty AND b.price <= a.price
        |    AND (b.qty > a.qty OR b.price < a.price))
        |ORDER BY l_partkey""".stripMargin,
    "q8w_jsd_drift" ->
      """WITH d AS (SELECT CASE
        |    WHEN (doc_id * 2654435761) % 4294967296 / 4294967296.0 < 0.9
        |    THEN 'train' ELSE 'val' END AS part, text FROM documents),
        |tok AS (SELECT part,
        |    unnest(list_filter(string_split_regex(lower(text), '\s+'),
        |                       x -> len(x) > 0)) AS token FROM d),
        |c AS (SELECT token,
        |        sum(CASE WHEN part = 'train' THEN 1 ELSE 0 END) AS ca,
        |        sum(CASE WHEN part = 'val' THEN 1 ELSE 0 END) AS cb
        |      FROM tok GROUP BY 1),
        |t AS (SELECT sum(ca) AS na, sum(cb) AS nb FROM c),
        |pq AS (SELECT ca / na AS p, cb / nb AS q,
        |              (ca / na + cb / nb) / 2 AS m FROM c CROSS JOIN t)
        |SELECT CAST((SELECT count(*) FROM c) AS BIGINT) AS vocab,
        |       CAST((SELECT na FROM t) AS BIGINT) AS n_train,
        |       CAST((SELECT nb FROM t) AS BIGINT) AS n_val,
        |       round((sum(CASE WHEN p > 0 THEN p * log2(p / m) ELSE 0 END) +
        |              sum(CASE WHEN q > 0 THEN q * log2(q / m) ELSE 0 END)) / 2,
        |             6) AS jsd_bits
        |FROM pq""".stripMargin,
    "q8x_median" ->
      """SELECT c_mktsegment, round(median(c_acctbal), 6) AS med_bal,
        |       round(avg(c_acctbal), 6) AS avg_bal, count(*) AS n
        |FROM customer GROUP BY 1 ORDER BY 1""".stripMargin,
    "q8y_lateral_topk" ->
      """SELECT n.n_nationkey, n.n_name, t.c_custkey, t.c_acctbal
        |FROM nation n,
        |LATERAL (SELECT c_custkey, c_acctbal FROM customer c
        |         WHERE c.c_nationkey = n.n_nationkey
        |         ORDER BY c_acctbal DESC, c_custkey LIMIT 1) t
        |ORDER BY n_nationkey""".stripMargin,
    // BFS over the q30 edge list; the d < 50 cap mirrors the engine's
    // maxIters so a deeper-than-cap graph fails the compare loudly
    "q8z_sssp" ->
      """WITH RECURSIVE cp AS (SELECT DISTINCT o_custkey AS c, l_partkey AS p
        |            FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |e AS (SELECT a.c AS u, b.c AS v FROM cp a JOIN cp b ON a.p = b.p AND a.c < b.c
        |      GROUP BY 1, 2 HAVING count(*) >= 3),
        |und AS (SELECT u, v FROM e UNION ALL SELECT v AS u, u AS v FROM e),
        |src AS (SELECT min(u) AS s FROM und),
        |walk(vertex, d) AS (
        |  SELECT s, 0 FROM src
        |  UNION
        |  SELECT und.v, walk.d + 1 FROM und JOIN walk ON und.u = walk.vertex
        |  WHERE walk.d < 50
        |)
        |SELECT vertex, CAST(min(d) AS INT) AS dist
        |FROM walk GROUP BY vertex ORDER BY vertex""".stripMargin,
    "q9a_mode" ->
      """SELECT c_mktsegment, mode_nation, n FROM (
        |  SELECT c_mktsegment, c_nationkey AS mode_nation, count(*) AS n,
        |         row_number() OVER (PARTITION BY c_mktsegment
        |           ORDER BY count(*) DESC, c_nationkey) AS rn
        |  FROM customer GROUP BY c_mktsegment, c_nationkey)
        |WHERE rn = 1 ORDER BY c_mktsegment""".stripMargin,
    // k-core peeling unrolled 30 rounds (idempotent at fixpoint — extra
    // rounds are no-ops; a deeper peel than the unroll fails loudly).
    // MATERIALIZED is load-bearing: each round's relation is referenced
    // three times, and without it DuckDB re-expands the whole chain
    // exponentially (file-handle exhaustion on the leaf scans).
    "q9e_kcore" -> {
      val base =
        """WITH cp AS MATERIALIZED (SELECT DISTINCT o_custkey AS c, l_partkey AS p
          |            FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
          |e0 AS MATERIALIZED (SELECT a.c AS u, b.c AS v
          |       FROM cp a JOIN cp b ON a.p = b.p AND a.c < b.c
          |       GROUP BY 1, 2 HAVING count(*) >= 3)""".stripMargin
      val rounds = (1 to 30).map { i =>
        s"""k$i AS MATERIALIZED (SELECT vx FROM (
           |    SELECT u AS vx FROM e${i - 1} UNION ALL SELECT v FROM e${i - 1})
           |  GROUP BY vx HAVING count(*) >= 3),
           |e$i AS MATERIALIZED (SELECT u, v FROM e${i - 1}
           |  WHERE u IN (SELECT vx FROM k$i) AND v IN (SELECT vx FROM k$i))""".stripMargin
      }.mkString(",\n")
      s"""$base,
         |$rounds
         |SELECT vertex, count(*) AS core_degree FROM (
         |  SELECT u AS vertex FROM e30 UNION ALL SELECT v FROM e30)
         |GROUP BY vertex ORDER BY vertex""".stripMargin
    },
    "q9i_dsv2_agg" ->
      """SELECT count(*) AS n, min(l_quantity) AS min_qty,
        |       max(l_extendedprice) AS max_price FROM lineitem""".stripMargin,
    "q9j_hof_stats" ->
      """WITH t AS (SELECT doc_id,
        |    list_filter(string_split_regex(lower(text), '\s+'),
        |                x -> len(x) > 0) AS tk
        |  FROM documents)
        |SELECT doc_id, CAST(len(tk) AS INT) AS n_tokens,
        |  round(CAST(list_sum(list_transform(tk, x -> len(x))) AS DOUBLE)
        |        / len(tk), 6) AS avg_len,
        |  CAST(list_max(list_transform(tk, x -> len(x))) AS INT) AS max_len,
        |  CAST(len(list_filter(tk, x -> len(x) >= 7)) AS INT) AS n_long
        |FROM t WHERE len(tk) > 0 ORDER BY doc_id""".stripMargin,
    "q9m_session_lift" ->
      """WITH x AS (SELECT user_id, ts, event_id, event_type,
        |  CASE WHEN lag(ts) OVER w IS NULL
        |         OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000 THEN 1 ELSE 0 END AS is_new
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (SELECT *, sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                                  ROWS UNBOUNDED PRECEDING) AS session_seq FROM x),
        |p AS (SELECT DISTINCT user_id, session_seq, event_type FROM s),
        |ns AS (SELECT count(*) AS n_sessions FROM
        |        (SELECT DISTINCT user_id, session_seq FROM p)),
        |sg AS (SELECT event_type, count(*) AS c FROM p GROUP BY 1),
        |pr AS (SELECT a.event_type AS ta, b.event_type AS tb, count(*) AS n_ab
        |       FROM p a JOIN p b ON a.user_id = b.user_id
        |         AND a.session_seq = b.session_seq
        |         AND a.event_type < b.event_type
        |       GROUP BY 1, 2)
        |SELECT ta, tb, n_ab,
        |  round(n_ab / n_sessions, 6) AS support,
        |  round(n_ab * n_sessions / (ca.c * cb.c), 6) AS lift
        |FROM pr JOIN sg ca ON pr.ta = ca.event_type
        |        JOIN sg cb ON pr.tb = cb.event_type
        |        CROSS JOIN ns
        |ORDER BY ta, tb""".stripMargin,
    "q9k_rfm" ->
      """WITH anchor AS (SELECT max(CAST(floor(epoch(date_trunc('day', ts)))
        |    AS BIGINT)) AS anchor_s FROM events),
        |rfm AS (SELECT user_id,
        |    max(CAST(floor(epoch(date_trunc('day', ts))) AS BIGINT))
        |      AS last_day_s,
        |    count(*) AS frequency, round(sum(value), 6) AS monetary
        |  FROM events WHERE event_type = 'purchase' GROUP BY user_id),
        |base AS (SELECT user_id,
        |    CAST((anchor_s - last_day_s) / 86400 AS INT) AS recency_d,
        |    frequency, monetary
        |  FROM rfm CROSS JOIN anchor)
        |SELECT user_id, recency_d, frequency, monetary, r, f, m,
        |       CAST(r AS VARCHAR) || CAST(f AS VARCHAR) || CAST(m AS VARCHAR)
        |         AS segment
        |FROM (SELECT *,
        |        CAST(ntile(4) OVER (ORDER BY recency_d, user_id) AS INT) AS r,
        |        CAST(ntile(4) OVER (ORDER BY frequency DESC, user_id) AS INT) AS f,
        |        CAST(ntile(4) OVER (ORDER BY monetary DESC, user_id) AS INT) AS m
        |      FROM base)
        |ORDER BY user_id""".stripMargin,
    "q9l_trend" ->
      """WITH c AS (SELECT CAST(floor(epoch(date_trunc('hour', ts))) AS BIGINT)
        |    AS hour_s, event_type, count(*) AS n
        |  FROM events GROUP BY 1, 2),
        |m AS (SELECT min(hour_s) AS lo FROM c)
        |SELECT event_type, count(*) AS n_hours,
        |  round(regr_slope(CAST(n AS DOUBLE), (hour_s - lo) / 3600.0), 6)
        |    AS slope_per_hour,
        |  round(regr_intercept(CAST(n AS DOUBLE), (hour_s - lo) / 3600.0), 6)
        |    AS intercept
        |FROM c CROSS JOIN m GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q9g_transitions" ->
      """WITH nxt AS (SELECT event_type,
        |    lead(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS next_type
        |  FROM events),
        |c AS (SELECT event_type AS from_type, next_type AS to_type,
        |        count(*) AS n
        |      FROM nxt WHERE next_type IS NOT NULL GROUP BY 1, 2)
        |SELECT from_type, to_type, n,
        |  round(n / sum(n) OVER (PARTITION BY from_type), 6) AS p
        |FROM c ORDER BY from_type, to_type""".stripMargin,
    "q9h_vocab_growth" ->
      """WITH toks AS (SELECT doc_id,
        |    unnest(list_filter(string_split_regex(lower(text), '\s+'),
        |                       x -> len(x) > 0)) AS token
        |  FROM documents),
        |fd AS (SELECT token, min(doc_id) AS first_doc FROM toks GROUP BY 1),
        |np AS (SELECT first_doc, count(*) AS new_terms FROM fd GROUP BY 1),
        |tp AS (SELECT doc_id,
        |    len(list_filter(string_split_regex(lower(text), '\s+'),
        |                    x -> len(x) > 0)) AS n_tokens
        |  FROM documents)
        |SELECT tp.doc_id,
        |  CAST(sum(n_tokens) OVER w AS BIGINT) AS cum_tokens,
        |  CAST(sum(coalesce(new_terms, 0)) OVER w AS BIGINT) AS cum_vocab
        |FROM tp LEFT JOIN np ON tp.doc_id = np.first_doc
        |WINDOW w AS (ORDER BY tp.doc_id ROWS UNBOUNDED PRECEDING)
        |ORDER BY tp.doc_id""".stripMargin,
    "q9f_hourly_anomaly" ->
      """WITH c AS (SELECT CAST(floor(epoch(date_trunc('hour', ts))) AS BIGINT)
        |    AS hour_s, event_type, count(*) AS n
        |  FROM events GROUP BY 1, 2)
        |SELECT hour_s, event_type, n, round(mu, 6) AS mu, round(sd, 6) AS sd,
        |  CASE WHEN sd > 0 THEN round((n - mu) / sd, 6) END AS z
        |FROM (SELECT hour_s, event_type, n,
        |        avg(n) OVER w AS mu, stddev_samp(n) OVER w AS sd
        |      FROM c
        |      WINDOW w AS (PARTITION BY event_type ORDER BY hour_s
        |                   ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING))
        |ORDER BY event_type, hour_s""".stripMargin,
    "q9d_item_recs" ->
      """WITH cp AS (SELECT DISTINCT o_custkey AS c, l_partkey AS p
        |            FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |nu AS (SELECT p, count(*) AS n FROM cp GROUP BY 1),
        |pairs AS (SELECT a.p AS i, b.p AS j, count(*) AS shared
        |          FROM cp a JOIN cp b ON a.c = b.c AND a.p < b.p
        |          GROUP BY 1, 2 HAVING count(*) >= 2),
        |sims AS (SELECT i, j, round(shared / sqrt(ni.n * nj.n), 6) AS sim
        |         FROM pairs JOIN nu ni ON pairs.i = ni.p
        |                    JOIN nu nj ON pairs.j = nj.p),
        |directed AS (SELECT i, j, sim FROM sims
        |             UNION ALL SELECT j, i, sim FROM sims)
        |SELECT i AS part, CAST(rn AS INT) AS rn, j AS rec, sim FROM (
        |  SELECT i, j, sim, row_number() OVER (
        |    PARTITION BY i ORDER BY sim DESC, j) AS rn FROM directed)
        |WHERE rn <= 5 ORDER BY part, rn""".stripMargin,
    "q9b_histogram" ->
      """WITH mm AS (SELECT min(o_totalprice) AS lo, max(o_totalprice) AS hi
        |            FROM orders),
        |b AS (SELECT least(CAST(floor((o_totalprice - lo) / ((hi - lo) / 20))
        |                   AS INT), 19) AS bin, lo, hi
        |      FROM orders CROSS JOIN mm)
        |SELECT CAST(bin AS INT) AS bin, count(*) AS n,
        |       round(min(lo + bin * (hi - lo) / 20), 6) AS bin_lo
        |FROM b GROUP BY bin ORDER BY bin""".stripMargin,
  )
}
