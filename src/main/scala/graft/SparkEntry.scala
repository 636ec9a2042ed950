package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory.
  *
  * Each `queries` key binds an operator from graft.operators.* to the
  * test corpus; `oracleSql` is the DuckDB-equivalent ANSI SQL the
  * driver cross-checks against. Column names/aliases match pairwise
  * (the compare sorts columns by name before hashing).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.pricingSummary(Tables.lineitem(spark, "/root/testdata/sf0.001"))

  val terminalStates: Seq[String] = Seq("purchase", "error")
  val eventStates: Seq[String] = Seq("click", "error", "purchase", "signup", "view")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_pricing_summary" -> ((s, d) =>
      Relational.pricingSummary(Tables.lineitem(s, d))),
    "q02_date_range_filter" -> ((s, d) =>
      Relational.dateRangeFilter(Tables.orders(s, d), "1995-01-01", "1996-12-31", "O")),
    "q03_star_join" -> ((s, d) =>
      Relational.starJoinRevenue(Tables.orders(s, d), Tables.customer(s, d),
        Tables.nation(s, d), Tables.region(s, d))),
    "q04_latest_per_key" -> ((s, d) =>
      Relational.latestPerKey(Tables.orders(s, d))),
    "q05_state_counts" -> ((s, d) =>
      Relational.stateCounts(Tables.events(s, d))),
    "q06_active_runs" -> ((s, d) =>
      Relational.activeRuns(Tables.events(s, d), terminalStates)),
    "q07_ci_search" -> ((s, d) =>
      Relational.ciSearch(Tables.part(s, d), "brand#13", "re")),
    "q08_merge_upsert" -> ((s, d) =>
      Relational.mergeUpsertSummary(Tables.lineitem(s, d))),
    "q09_ttm_rolling" -> ((s, d) =>
      Relational.ttmRolling(Tables.lineitem(s, d))),
    "q10_null_normalize" -> ((s, d) =>
      Relational.nullNormalizeSummary(Tables.documents(s, d))),
    "q11_top_n_page" -> ((s, d) =>
      Relational.topNPage(Tables.orders(s, d), 10, 20)),
    "q12_bulk_stats" -> ((s, d) =>
      Relational.bulkStats(Tables.orders(s, d))),
    "q13_queue_skip_antijoin" -> ((s, d) =>
      Relational.queueSkipAntiJoin(Tables.customer(s, d), Tables.orders(s, d))),
    "q14_asof_latest_done" -> ((s, d) =>
      Relational.asOfLatest(Tables.events(s, d), Tables.orders(s, d))),
    "q15_daily_pivot" -> ((s, d) =>
      Relational.dailyPivot(Tables.events(s, d), eventStates)),
    "q16_key_normalize_dedup" -> ((s, d) =>
      Relational.keyNormalizeDedup(Tables.customer(s, d))),
    "q17_json_flatten" -> ((s, d) =>
      Relational.jsonFlatten(Tables.events(s, d))),
    "q18_metadata_upsert" -> ((s, d) =>
      Relational.metadataUpsert(Tables.customer(s, d), Tables.orders(s, d))),
    "q19_ttm_record" -> ((s, d) =>
      Relational.ttmRecord(Tables.lineitem(s, d))),
    "q20_unified_records" -> ((s, d) =>
      Relational.unifiedRecords(Tables.lineitem(s, d), Tables.supplier(s, d))),
    "t01_langid" -> ((s, d) => TextOps.langId(Tables.documents(s, d))),
    "t02_quality_score" -> ((s, d) => TextOps.qualityScore(Tables.documents(s, d))),
    "t03_token_count" -> ((s, d) => TextOps.tokenCount(Tables.documents(s, d))),
    "t04_fingerprint" -> ((s, d) => TextOps.fingerprint(Tables.documents(s, d))),
    "t05_corpus_stats" -> ((s, d) => TextOps.corpusStats(Tables.documents(s, d))),
    "q23_daily_distinct" -> ((s, d) =>
      Relational.dailyDistinct(Tables.events(s, d))),
    "q21_value_outliers" -> ((s, d) =>
      Relational.valueOutliers(Tables.events(s, d))),
    "q24_cursor_page" -> ((s, d) =>
      Relational.cursorPage(Tables.orders(s, d), "1996-06-01", 100000L, 50)),
    "q22_transition_audit" -> ((s, d) =>
      Relational.transitionAudit(Tables.events(s, d))),
    "d01_dedup_exact" -> ((s, d) => Dedup.exact(Tables.documents(s, d))),
    "d06_dedup_digest" -> ((s, d) => Dedup.digest(Tables.documents(s, d))),
    "d02_dedup_minhash_lsh" -> ((s, d) => Dedup.minhashLsh(Tables.documents(s, d))),
    "d07_dedup_clusters" -> ((s, d) => Dedup.dedupClusters(Tables.documents(s, d))),
    "d08_decontaminate" -> ((s, d) => Dedup.decontaminate(Tables.documents(s, d))),
    "d09_fuzzy_keys" -> ((s, d) => Dedup.fuzzyKeys(Tables.customer(s, d))),
    "d20_er_score" -> ((s, d) => Dedup.erScore(Tables.customer(s, d))),
    "q30_share_of_total" -> ((s, d) => Relational.shareOfTotal(Tables.events(s, d))),
    "t10_tfidf_topk" -> ((s, d) => TextOps.tfidfTopK(Tables.documents(s, d))),
    "d03_dedup_simhash" -> ((s, d) => Dedup.simhash(Tables.documents(s, d))),
    "d04_dedup_ngram_jaccard" -> ((s, d) => Dedup.ngramJaccard(Tables.documents(s, d))),
    "d05_dedup_embedding" -> ((s, d) => Similarity.embeddingNearDup(Tables.embeddings(s, d))),
    "s01_ann_bruteforce_topk" -> ((s, d) => Similarity.bruteForceTopK(Tables.embeddings(s, d))),
    "s02_ann_lsh_topk" -> ((s, d) => Similarity.lshTopK(Tables.embeddings(s, d))),
    "s19_ann_lsh_multitable" -> ((s, d) =>
      Similarity.multiTableLshTopK(Tables.embeddings(s, d))),
    "s03_ann_ivf_topk" -> ((s, d) => Similarity.ivfTopK(Tables.embeddings(s, d))),
    "s04_centroid_update" -> ((s, d) => Similarity.centroidUpdate(Tables.embeddings(s, d))),
    "s05_ann_ivf_multiprobe" -> ((s, d) => Similarity.ivfMultiProbe(Tables.embeddings(s, d))),
    "s20_knn_join" -> ((s, d) => Similarity.knnJoin(Tables.embeddings(s, d))),
    "s21_kcenter_seed" -> ((s, d) => Similarity.kcenterSeed(Tables.embeddings(s, d))),
    "s22_knn_pagerank" -> ((s, d) => Similarity.knnPagerank(Tables.embeddings(s, d))),
    "m01_multimodal_meta" -> ((s, d) => Multimodal.pipeline(Tables.documents(s, d))),
    "st01_stream_windowed" -> ((s, d) =>
      graft.streaming.StreamOps.windowedCountsBatch(Tables.events(s, d))),
    "st02_stream_sessionize" -> ((s, d) =>
      graft.streaming.StreamOps.sessionizeBatch(Tables.events(s, d))),
    "st06_session_window" -> ((s, d) =>
      graft.streaming.StreamOps.sessionWindowBatch(Tables.events(s, d))),
    "q25_price_band_join" -> ((s, d) =>
      Relational.priceBandJoin(Tables.lineitem(s, d))),
    "q26_rolling_hourly" -> ((s, d) =>
      Relational.rollingHourly(Tables.events(s, d))),
    "t06_term_topk" -> ((s, d) => TextOps.termTopK(Tables.documents(s, d))),
    "m02_binary_digest" -> ((s, d) =>
      Multimodal.binaryDigest(Tables.documents(s, d))),
    "st03_stream_dedup" -> ((s, d) =>
      graft.streaming.StreamOps.dedupBatch(Tables.events(s, d))),
    "q27_rollup_counts" -> ((s, d) =>
      Relational.rollupCounts(Tables.events(s, d))),
    "q28_incremental_agg" -> ((s, d) =>
      Relational.incrementalAgg(Tables.lineitem(s, d))),
    "q29_scd2_history" -> ((s, d) =>
      Relational.scd2History(Tables.events(s, d))),
    "st04_stream_join" -> ((s, d) =>
      graft.streaming.StreamOps.intervalJoinBatch(Tables.events(s, d))),
    "st07_stream_left_join" -> ((s, d) =>
      graft.streaming.StreamOps.intervalLeftJoinBatch(Tables.events(s, d))),
    "st08_stream_update_agg" -> ((s, d) =>
      graft.streaming.StreamOps.typeTotalsBatch(Tables.events(s, d))),
    "t07_split_sample" -> ((s, d) => TextOps.splitSample(Tables.documents(s, d))),
    "t21_stratified_sample" -> ((s, d) =>
      TextOps.stratifiedSample(Tables.documents(s, d))),
    "t08_sequence_pack" -> ((s, d) => TextOps.sequencePack(Tables.documents(s, d))),
    "t09_quality_filter" -> ((s, d) => TextOps.qualityFilter(Tables.documents(s, d))),
    "q31_interval_concurrency" -> ((s, d) =>
      Relational.intervalConcurrency(Tables.orders(s, d))),
    "q32_grouping_sets" -> ((s, d) =>
      Relational.groupingSetsCounts(Tables.lineitem(s, d))),
    "q33_semi_join" -> ((s, d) =>
      Relational.semiJoinActive(Tables.customer(s, d), Tables.orders(s, d))),
    "d10_dedup_apply" -> ((s, d) => Dedup.dedupApply(Tables.documents(s, d))),
    "s06_ann_recall" -> ((s, d) => Similarity.annRecall(Tables.embeddings(s, d))),
    "m03_frame_sample" -> ((s, d) =>
      Multimodal.frameSampleSummary(Tables.documents(s, d))),
    "t11_repetition" -> ((s, d) => TextOps.repetitionScore(Tables.documents(s, d))),
    "t12_pii_scrub" -> ((s, d) => TextOps.piiScrub(Tables.customer(s, d))),
    "q34_rank_panel" -> ((s, d) => Relational.rankPanel(Tables.orders(s, d))),
    "q35_approx_distinct" -> ((s, d) =>
      Relational.approxDistinct(Tables.events(s, d))),
    "st05_stream_static_join" -> ((s, d) =>
      graft.streaming.StreamOps.streamStaticJoinBatch(
        Tables.events(s, d), Tables.customer(s, d))),
    "q36_merge_delete" -> ((s, d) =>
      Relational.mergeDeleteSummary(Tables.lineitem(s, d))),
    "q37_snapshot_diff" -> ((s, d) =>
      Relational.snapshotDiff(Tables.orders(s, d))),
    "t13_token_entropy" -> ((s, d) => TextOps.tokenEntropy(Tables.documents(s, d))),
    "t14_surprisal" -> ((s, d) => TextOps.surprisal(Tables.documents(s, d))),
    "s07_knn_classify" -> ((s, d) => Similarity.knnClassify(Tables.embeddings(s, d))),
    "s09_pq_recall" -> ((s, d) => Similarity.pqRecall(Tables.embeddings(s, d))),
    "s10_ivfpq_recall" -> ((s, d) => Similarity.ivfPqRecall(Tables.embeddings(s, d))),
    "s11_ivfpq_trained" -> ((s, d) => Similarity.ivfPqTrainedRecall(Tables.embeddings(s, d))),
    "s12_ann_ingest" -> ((s, d) => Similarity.annIncremental(Tables.embeddings(s, d))),
    "s13_range_search" -> ((s, d) => Similarity.ivfRangeSearch(Tables.embeddings(s, d))),
    "s14_mmr_diversify" -> ((s, d) => Similarity.mmrDiversify(Tables.embeddings(s, d))),
    "s15_hybrid_rrf" -> ((s, d) =>
      Similarity.hybridRrf(Tables.documents(s, d), Tables.embeddings(s, d))),
    "s16_filtered_ann" -> ((s, d) =>
      Similarity.ivfFilteredTopK(Tables.embeddings(s, d))),
    "s17_pq_rerank" -> ((s, d) => Similarity.pqRerank(Tables.embeddings(s, d))),
    "s18_hybrid_indexed" -> ((s, d) =>
      Similarity.hybridRrfIndexedAuto(Tables.documents(s, d), Tables.embeddings(s, d))),
    "s23_hybrid_bm25" -> ((s, d) =>
      Similarity.hybridBm25(Tables.documents(s, d), Tables.embeddings(s, d))),
    "s24_hybrid_lexindexed" -> ((s, d) =>
      Similarity.hybridBm25IndexedAuto(Tables.documents(s, d), Tables.embeddings(s, d))),
    "st15_stream_lex_ingest" -> ((s, d) =>
      graft.streaming.StreamOps.streamLexIngestDrain(Tables.documents(s, d))),
    "s08_quantized_recall" -> ((s, d) =>
      Similarity.quantizedRecall(Tables.embeddings(s, d))),
    "q38_value_histogram" -> ((s, d) =>
      Relational.valueHistogram(Tables.events(s, d))),
    "q39_data_profile" -> ((s, d) => Relational.dataProfile(Tables.orders(s, d))),
    "q40_funnel" -> ((s, d) => Relational.conversionFunnel(Tables.events(s, d))),
    "q41_time_weighted_avg" -> ((s, d) =>
      Relational.timeWeightedAvg(Tables.events(s, d))),
    "q42_gaps_islands" -> ((s, d) => Relational.gapsIslands(Tables.events(s, d))),
    "q43_cohort_retention" -> ((s, d) =>
      Relational.cohortRetention(Tables.events(s, d))),
    "q44_asof_enrich" -> ((s, d) =>
      Relational.asofEnrich(Tables.events(s, d))),
    "q45_group_quantiles" -> ((s, d) =>
      Relational.groupQuantiles(Tables.events(s, d))),
    "q46_sql_api" -> ((s, d) => Dedup.sqlApi(Tables.documents(s, d))),
    "d11_minhash_estimate" -> ((s, d) =>
      Dedup.minhashEstimate(Tables.documents(s, d))),
    "d12_dedup_incremental" -> ((s, d) =>
      Dedup.dedupIncremental(Tables.documents(s, d))),
    "d13_dedup_containment" -> ((s, d) =>
      Dedup.dedupContainment(Tables.documents(s, d))),
    "d14_dup_spans" -> ((s, d) => Dedup.dupSpans(Tables.documents(s, d))),
    "d21_span_scrub" -> ((s, d) => Dedup.spanScrub(Tables.documents(s, d))),
    "d15_span_incremental" -> ((s, d) =>
      Dedup.dupSpansIncremental(Tables.documents(s, d))),
    "d16_dedup_best_keep" -> ((s, d) =>
      Dedup.dedupBestKeep(Tables.documents(s, d))),
    "d17_semdedup" -> ((s, d) => Similarity.semDedup(Tables.embeddings(s, d))),
    "d18_dedup_bloom_gate" -> ((s, d) =>
      Dedup.dedupBloomGate(Tables.documents(s, d))),
    "d19_dedup_prefix" -> ((s, d) =>
      Dedup.prefixDedup(Tables.documents(s, d))),
    "t19_leakage_split" -> ((s, d) =>
      Dedup.leakSafeSplit(Tables.documents(s, d))),
    "t15_approx_percentile" -> ((s, d) =>
      TextOps.approxPercentiles(Tables.documents(s, d))),
    "t16_domain_mixture" -> ((s, d) =>
      TextOps.domainMixture(Tables.documents(s, d))),
    "t17_mixture_materialize" -> ((s, d) =>
      TextOps.mixtureMaterialize(Tables.documents(s, d))),
    "t18_bigram_surprisal" -> ((s, d) =>
      TextOps.bigramSurprisal(Tables.documents(s, d))),
    "t20_filter_battery" -> ((s, d) =>
      TextOps.filterBattery(Tables.documents(s, d))),
    "t22_perplexity_bucket" -> ((s, d) =>
      TextOps.perplexityBuckets(Tables.documents(s, d))),
    "t23_curation_pipeline" -> ((s, d) =>
      Dedup.curationPipeline(Tables.documents(s, d))),
    "t24_bpe_merges" -> ((s, d) => TextOps.bpeMerges(Tables.documents(s, d))),
    "t25_bpe_encode" -> ((s, d) => TextOps.bpeEncode(Tables.documents(s, d))),
    "t26_domain_divergence" -> ((s, d) =>
      TextOps.domainDivergence(Tables.documents(s, d))),
    "q49_kmv_distinct" -> ((s, d) => Relational.kmvDistinct(Tables.events(s, d))),
    "q52_kmv_set_ops" -> ((s, d) => Relational.kmvSetOps(Tables.events(s, d))),
    "t29_zipf_slope" -> ((s, d) => TextOps.zipfSlope(Tables.documents(s, d))),
    "t30_chunk_windows" -> ((s, d) => TextOps.chunkWindows(Tables.documents(s, d))),
    "t27_bpe_fertility" -> ((s, d) => TextOps.bpeFertility(Tables.documents(s, d))),
    "q50_cusum_changepoint" -> ((s, d) =>
      Relational.cusumChangepoint(Tables.events(s, d))),
    "q51_regional_revenue" -> ((s, d) => Relational.regionalRevenue(
      Tables.lineitem(s, d), Tables.orders(s, d), Tables.customer(s, d),
      Tables.supplier(s, d), Tables.nation(s, d), Tables.region(s, d))),
    "t28_heaps_growth" -> ((s, d) => TextOps.heapsGrowth(Tables.documents(s, d))),
    "q47_rank_corr" -> ((s, d) =>
      Relational.rankCorrelation(Tables.documents(s, d))),
    "m04_cdc_chunks" -> ((s, d) => Multimodal.cdcChunks(Tables.documents(s, d))),
    "m05_shard_pack" -> ((s, d) => Multimodal.shardPack(Tables.documents(s, d))),
    "m06_image_decode" -> ((s, d) => Multimodal.imageDecode(Tables.documents(s, d))),
    "m07_audio_decode" -> ((s, d) => Multimodal.audioDecode(Tables.documents(s, d))),
    "m08_audio_windows" -> ((s, d) => Multimodal.audioWindows(Tables.documents(s, d))),
    "m09_video_frames" -> ((s, d) => Multimodal.videoDecode(Tables.documents(s, d))),
    "m10_gop_video" -> ((s, d) => Multimodal.gopVideoDecode(Tables.documents(s, d))),
    "m11_image_resize" -> ((s, d) => Multimodal.imageResize(Tables.documents(s, d))),
    "m12_audio_resample" -> ((s, d) => Multimodal.audioResample(Tables.documents(s, d))),
    "m13_gop_extract" -> ((s, d) => Multimodal.gopFrameExtract(Tables.documents(s, d))),
    "m14_image_phash" -> ((s, d) => Multimodal.imagePhash(Tables.documents(s, d))),
    "q48_lake_scan_pruned" -> ((s, d) =>
      Relational.lakeScanPruned(Tables.lineitem(s, d))),
    "st09_lake_stream" -> ((s, d) =>
      graft.streaming.StreamOps.lakeStreamDrain(Tables.orders(s, d))),
    "st10_lake_cdc" -> ((s, d) =>
      graft.streaming.StreamOps.lakeCdcDrain(Tables.orders(s, d))),
    "st11_stream_curation" -> ((s, d) =>
      graft.streaming.StreamOps.streamCurationDrain(Tables.documents(s, d))),
    "st12_stream_ann_ingest" -> ((s, d) =>
      graft.streaming.StreamOps.streamAnnIngestDrain(Tables.embeddings(s, d))),
    "st13_stream_kmv" -> ((s, d) =>
      graft.streaming.StreamOps.streamKmvDrain(Tables.events(s, d))),
    "st14_alert_stream" -> ((s, d) =>
      graft.streaming.StreamOps.alertStreamDrain(Tables.events(s, d))),
    "e2e01_reference_flow" -> ((s, d) =>
      ReferenceE2E.pipeline(Tables.events(s, d))),
    "s25_graph_ann" -> ((s, d) =>
      GraphIndex.probeAuto(Tables.embeddings(s, d))),
    "s26_phrase_bm25" -> ((s, d) =>
      Similarity.phraseBm25Auto(Tables.documents(s, d))),
    "s27_graph_ingest" -> ((s, d) =>
      GraphIndex.ingestDemoAuto(Tables.embeddings(s, d))),
    "s28_graph_filtered" -> ((s, d) =>
      GraphIndex.probeFilteredAuto(Tables.embeddings(s, d))),
    "s29_graph_pq" -> ((s, d) =>
      GraphIndex.probePqAuto(Tables.embeddings(s, d))),
    "s30_graph_hier" -> ((s, d) =>
      GraphIndex.probeHierAuto(Tables.embeddings(s, d))),
    "st16_stream_graph_ingest" -> ((s, d) =>
      graft.streaming.StreamOps.streamGraphIngestDrain(Tables.embeddings(s, d))),
    "st17_stream_gram_ingest" -> ((s, d) =>
      graft.streaming.StreamOps.streamGramIngestDrain(Tables.documents(s, d))),
  )

  /** All oracle SQL passes through Rounding.rewriteOracle so DuckDB
    * rounds with the exact same multiply-round-divide formula as the
    * Spark side (see Rounding's scaladoc for the 1-ulp landmine).
    */
  def oracleSql: Map[String, String] =
    rawOracleSql.map { case (k, v) => k -> operators.Rounding.rewriteOracle(v) }

  private def rawOracleSql: Map[String, String] = Map(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
         round(sum(l_quantity), 2) AS sum_qty,
         round(sum(l_extendedprice), 2) AS sum_base_price,
         round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS sum_disc_price,
         round(sum(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)), 2) AS sum_charge,
         round(avg(l_quantity), 4) AS avg_qty,
         round(avg(l_extendedprice), 4) AS avg_price,
         round(avg(l_discount), 4) AS avg_disc,
         count(*) AS count_order
         FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
         GROUP BY l_returnflag, l_linestatus
         ORDER BY l_returnflag, l_linestatus""",
    "q02_date_range_filter" ->
      """SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS o_totalprice,
         o_orderdate, o_orderpriority
         FROM orders
         WHERE o_orderdate >= TIMESTAMP '1995-01-01'
           AND o_orderdate <= TIMESTAMP '1996-12-31'
           AND o_orderstatus = 'O'
         ORDER BY o_orderkey""",
    "q03_star_join" ->
      """SELECT r_name, n_name, count(*) AS n_orders,
         round(sum(o_totalprice), 2) AS total_price
         FROM orders
         JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY r_name, n_name
         ORDER BY r_name, n_name""",
    "q04_latest_per_key" ->
      """SELECT custkey, latest_orderkey, latest_orderdate, latest_totalprice FROM (
           SELECT o_custkey AS custkey, o_orderkey AS latest_orderkey,
                  o_orderdate AS latest_orderdate,
                  round(o_totalprice, 2) AS latest_totalprice,
                  row_number() OVER (PARTITION BY o_custkey
                    ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
           FROM orders) t
         WHERE rn = 1 ORDER BY custkey""",
    "q05_state_counts" ->
      """SELECT event_type, count(*) AS n FROM events
         GROUP BY event_type ORDER BY event_type""",
    "q06_active_runs" ->
      """SELECT event_id, ts, user_id, event_type, round("value", 4) AS "value"
         FROM events WHERE event_type NOT IN ('purchase', 'error')
         ORDER BY event_id""",
    "q07_ci_search" ->
      """SELECT p_partkey, p_name, p_brand, p_type FROM part
         WHERE upper(p_brand) = 'BRAND#13' AND contains(lower(p_name), 're')
         ORDER BY p_partkey""",
    "q08_merge_upsert" ->
      """WITH src AS (
           SELECT l_orderkey, l_linenumber, l_returnflag,
                  l_quantity + 100.0 AS l_quantity, 1 AS _prio
           FROM lineitem WHERE l_returnflag = 'R'),
         uni AS (
           SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity, 0 AS _prio
           FROM lineitem
           UNION ALL SELECT * FROM src),
         merged AS (
           SELECT *, row_number() OVER (PARTITION BY l_orderkey, l_linenumber
             ORDER BY _prio DESC, l_returnflag ASC, l_quantity ASC) AS rn FROM uni)
         SELECT l_returnflag, count(*) AS n, round(sum(l_quantity), 2) AS qty
         FROM merged WHERE rn = 1
         GROUP BY l_returnflag ORDER BY l_returnflag""",
    "q09_ttm_rolling" ->
      """WITH q AS (
           SELECT l_suppkey, date_trunc('quarter', l_shipdate) AS qtr,
                  sum(l_quantity) AS qty_raw
           FROM lineitem GROUP BY l_suppkey, date_trunc('quarter', l_shipdate))
         SELECT l_suppkey, qtr, round(qty_raw, 2) AS qty,
                round(sum(qty_raw) OVER (PARTITION BY l_suppkey ORDER BY qtr
                  ROWS BETWEEN 3 PRECEDING AND CURRENT ROW), 2) AS ttm_qty
         FROM q ORDER BY l_suppkey, qtr""",
    "q10_null_normalize" ->
      """SELECT coalesce(CASE WHEN upper(trim(source)) IN ('N/A','NA','NULL','NONE','-')
                    THEN NULL ELSE source END, '(null)') AS src_norm,
         count(*) AS n, round(avg(CAST(n_chars AS DOUBLE)), 4) AS avg_chars
         FROM documents GROUP BY 1 ORDER BY src_norm""",
    "q11_top_n_page" ->
      """SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS o_totalprice, o_orderdate
         FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC
         LIMIT 20 OFFSET 10""",
    "q12_bulk_stats" ->
      """SELECT o_orderpriority, count(*) AS total,
         count(*) FILTER (WHERE o_orderstatus = 'O') AS n_open,
         count(*) FILTER (WHERE o_orderstatus = 'F') AS n_done,
         count(*) FILTER (WHERE o_orderstatus = 'P') AS n_partial,
         round((count(*) FILTER (WHERE o_orderstatus = 'O')) * 1.0 / count(*), 4) AS pct_open
         FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    "q13_queue_skip_antijoin" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders
           WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
         ORDER BY c_custkey""",
    "q14_asof_latest_done" ->
      """SELECT event_id, user_id, ts, max(o_orderdate) AS asof_orderdate
         FROM events JOIN orders
           ON user_id = o_custkey AND o_orderdate <= ts
         GROUP BY event_id, user_id, ts ORDER BY event_id""",
    "q15_daily_pivot" ->
      """SELECT CAST(CAST(ts AS DATE) AS TIMESTAMP) AS day,
         count(*) FILTER (WHERE event_type = 'click') AS click,
         count(*) FILTER (WHERE event_type = 'error') AS error,
         count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
         count(*) FILTER (WHERE event_type = 'signup') AS signup,
         count(*) FILTER (WHERE event_type = 'view') AS view
         FROM events GROUP BY 1 ORDER BY day""",
    "q16_key_normalize_dedup" ->
      """SELECT upper(trim(c_mktsegment)) AS segment, count(*) AS n,
         min(c_custkey) AS first_id
         FROM customer GROUP BY 1 ORDER BY segment""",
    "q17_json_flatten" ->
      """SELECT CAST(json_extract(props, '$.k') AS BIGINT) % 10 AS kmod,
         count(*) AS n, CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k
         FROM events GROUP BY 1 ORDER BY kmod""",
    "q18_metadata_upsert" ->
      """WITH latest AS (
           SELECT custkey, latest_orderkey, latest_orderdate, latest_totalprice FROM (
             SELECT o_custkey AS custkey, o_orderkey AS latest_orderkey,
                    o_orderdate AS latest_orderdate,
                    round(o_totalprice, 2) AS latest_totalprice,
                    row_number() OVER (PARTITION BY o_custkey
                      ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
             FROM orders) t WHERE rn = 1)
         SELECT c_custkey, c_name, c_mktsegment, latest_orderdate, latest_totalprice,
                latest_orderkey IS NOT NULL AS has_orders
         FROM customer LEFT JOIN latest ON c_custkey = custkey
         ORDER BY c_custkey""",
    "q19_ttm_record" ->
      """WITH q AS (SELECT l_suppkey, date_trunc('quarter', l_shipdate) AS qtr,
             sum(l_quantity) AS qty_raw
           FROM lineitem GROUP BY 1, 2),
         r AS (SELECT l_suppkey, qtr,
             round(sum(qty_raw) OVER (PARTITION BY l_suppkey ORDER BY qtr
               ROWS BETWEEN 3 PRECEDING AND CURRENT ROW), 2) AS ttm_qty,
             row_number() OVER (PARTITION BY l_suppkey ORDER BY qtr DESC) AS rn
           FROM q)
         SELECT l_suppkey, 'ttm' AS record_type, qtr AS period_end_date, ttm_qty
         FROM r WHERE rn = 1 ORDER BY l_suppkey""",
    "q20_unified_records" ->
      """WITH q AS (SELECT l_suppkey, date_trunc('quarter', l_shipdate) AS qtr,
             sum(l_quantity) AS qty_raw
           FROM lineitem GROUP BY 1, 2),
         fin AS (SELECT l_suppkey AS suppkey, 'financials' AS record_type,
             qtr AS period_end_date, round(qty_raw, 2) AS qty,
             CAST(NULL AS VARCHAR) AS name FROM q),
         r AS (SELECT l_suppkey, qtr,
             round(sum(qty_raw) OVER (PARTITION BY l_suppkey ORDER BY qtr
               ROWS BETWEEN 3 PRECEDING AND CURRENT ROW), 2) AS ttm_qty,
             row_number() OVER (PARTITION BY l_suppkey ORDER BY qtr DESC) AS rn
           FROM q),
         ttm AS (SELECT l_suppkey AS suppkey, 'ttm' AS record_type,
             qtr AS period_end_date, ttm_qty AS qty,
             CAST(NULL AS VARCHAR) AS name FROM r WHERE rn = 1),
         meta AS (SELECT s_suppkey AS suppkey, 'metadata' AS record_type,
             CAST(NULL AS TIMESTAMP) AS period_end_date,
             CAST(NULL AS DOUBLE) AS qty, s_name AS name FROM supplier)
         SELECT suppkey, record_type, period_end_date, qty, name FROM (
           SELECT * FROM fin UNION ALL SELECT * FROM ttm UNION ALL SELECT * FROM meta) u
         ORDER BY suppkey, record_type, period_end_date NULLS FIRST""",
    "t01_langid" -> TextOps.langIdOracle,
    "t02_quality_score" -> TextOps.qualityOracle,
    "t03_token_count" -> TextOps.tokenCountOracle,
    "t04_fingerprint" -> TextOps.fingerprintOracle,
    "t05_corpus_stats" -> TextOps.corpusStatsOracle,
    "q23_daily_distinct" ->
      """SELECT CAST(CAST(ts AS DATE) AS TIMESTAMP) AS day, count(*) AS n_events,
         count(DISTINCT user_id) AS distinct_users,
         count(DISTINCT event_type) AS distinct_types
         FROM events GROUP BY 1 ORDER BY day""",
    "q24_cursor_page" ->
      """SELECT o_orderkey, o_custkey, o_orderdate, round(o_totalprice, 2) AS o_totalprice
         FROM orders
         WHERE o_orderdate < TIMESTAMP '1996-06-01'
            OR (o_orderdate = TIMESTAMP '1996-06-01' AND o_orderkey < 100000)
         ORDER BY o_orderdate DESC, o_orderkey DESC
         LIMIT 50""",
    "q21_value_outliers" ->
      """WITH stats AS (
           SELECT event_type AS et, count(*) AS n, sum("value") AS s1,
                  sum("value" * "value") AS s2
           FROM events GROUP BY event_type),
         m AS (SELECT et, n, s1 / n AS mean,
                  sqrt((s2 - s1 * s1 / n) / (n - 1)) AS sd FROM stats
               WHERE n > 1 AND sqrt((s2 - s1 * s1 / n) / (n - 1)) > 0.0)
         SELECT event_id, event_type, round("value", 4) AS "value",
                round(("value" - mean) / sd, 3) AS z
         FROM events JOIN m ON event_type = et
         WHERE abs(round(("value" - mean) / sd, 3)) >= 2.5
         ORDER BY event_id""",
    "q22_transition_audit" -> {
      val branches = Relational.allowedTransitions.map { case (from, tos) =>
        val set = tos.map(t => s"'$t'").mkString(", ")
        s"WHEN prev_type = '$from' THEN event_type IN ($set)"
      }.mkString("\n                ")
      s"""WITH g AS (SELECT user_id, event_id, ts, event_type,
             lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
           FROM events),
         v AS (SELECT prev_type, event_type,
             CASE WHEN prev_type IS NULL THEN TRUE
                $branches
                ELSE TRUE END AS is_valid
           FROM g)
         SELECT coalesce(prev_type, '(start)') AS prev_type, event_type, is_valid,
           count(*) AS n
         FROM v GROUP BY v.prev_type, event_type, is_valid
         ORDER BY coalesce(v.prev_type, '(start)'), event_type"""
    },
    "d01_dedup_exact" -> Dedup.exactOracle,
    "d06_dedup_digest" -> Dedup.digestOracle,
    "d02_dedup_minhash_lsh" -> Dedup.minhashLshOracle(),
    "d07_dedup_clusters" -> Dedup.dedupClustersOracle(),
    "d08_decontaminate" -> Dedup.decontaminateOracle(),
    "d09_fuzzy_keys" -> Dedup.fuzzyKeysOracle(),
    "d20_er_score" -> Dedup.erScoreOracle,
    "q30_share_of_total" -> Relational.shareOfTotalOracle,
    "t10_tfidf_topk" -> TextOps.tfidfTopKOracle(),
    "d03_dedup_simhash" -> Dedup.simhashOracle(),
    "d04_dedup_ngram_jaccard" -> Dedup.ngramJaccardOracle(),
    "d05_dedup_embedding" -> Similarity.embeddingNearDupOracle(),
    "s01_ann_bruteforce_topk" -> Similarity.bruteForceTopKOracle(),
    "s02_ann_lsh_topk" -> Similarity.lshTopKOracle(),
    "s19_ann_lsh_multitable" -> Similarity.multiTableLshTopKOracle(),
    "s03_ann_ivf_topk" -> Similarity.ivfTopKOracle(),
    "s04_centroid_update" -> Similarity.centroidUpdateOracle,
    "s05_ann_ivf_multiprobe" -> Similarity.ivfMultiProbeOracle(),
    "s20_knn_join" -> Similarity.knnJoinOracle(),
    "s21_kcenter_seed" -> Similarity.kcenterSeedOracle(),
    "s22_knn_pagerank" -> Similarity.knnPagerankOracle(),
    // m01_multimodal_meta: no oracle — binary/mapPartitions pipeline is
    // not SQL-expressible; driver records the rows-only check.
    "st01_stream_windowed" -> graft.streaming.StreamOps.windowedCountsOracle,
    "st02_stream_sessionize" -> graft.streaming.StreamOps.sessionizeOracle(),
    "q25_price_band_join" -> Relational.priceBandJoinOracle,
    "q26_rolling_hourly" -> Relational.rollingHourlyOracle,
    "t06_term_topk" -> TextOps.termTopKOracle(),
    "m02_binary_digest" -> Multimodal.binaryDigestOracle,
    "st03_stream_dedup" -> graft.streaming.StreamOps.dedupOracle,
    "q27_rollup_counts" -> Relational.rollupCountsOracle,
    "q28_incremental_agg" -> Relational.incrementalAggOracle,
    "q29_scd2_history" -> Relational.scd2HistoryOracle,
    "st04_stream_join" -> graft.streaming.StreamOps.intervalJoinOracle(),
    "st07_stream_left_join" -> graft.streaming.StreamOps.intervalLeftJoinOracle(),
    "st08_stream_update_agg" -> graft.streaming.StreamOps.typeTotalsOracle,
    "t07_split_sample" -> TextOps.splitSampleOracle,
    "t21_stratified_sample" -> TextOps.stratifiedSampleOracle(),
    "t08_sequence_pack" -> TextOps.sequencePackOracle(),
    "t09_quality_filter" -> TextOps.qualityFilterOracle,
    "q31_interval_concurrency" -> Relational.intervalConcurrencyOracle,
    "q32_grouping_sets" -> Relational.groupingSetsCountsOracle,
    "q33_semi_join" -> Relational.semiJoinActiveOracle,
    "d10_dedup_apply" -> Dedup.dedupApplyOracle(),
    "s06_ann_recall" -> Similarity.annRecallOracle(),
    "m03_frame_sample" -> Multimodal.frameSampleSummaryOracle(),
    "t11_repetition" -> TextOps.repetitionScoreOracle,
    "t12_pii_scrub" -> TextOps.piiScrubOracle,
    "q34_rank_panel" -> Relational.rankPanelOracle,
    // q35_approx_distinct: no oracle — HLL sketch values are
    // engine-specific by construction; accuracy (relative error vs the
    // exact count) is asserted in GraftSpec; driver records rows-only.
    "st05_stream_static_join" -> graft.streaming.StreamOps.streamStaticJoinOracle,
    "st06_session_window" -> graft.streaming.StreamOps.sessionWindowOracle(),
    "q36_merge_delete" -> Relational.mergeDeleteSummaryOracle,
    "q37_snapshot_diff" -> Relational.snapshotDiffOracle,
    "t13_token_entropy" -> TextOps.tokenEntropyOracle,
    "t14_surprisal" -> TextOps.surprisalOracle,
    "s07_knn_classify" -> Similarity.knnClassifyOracle(),
    "s08_quantized_recall" -> Similarity.quantizedRecallOracle(),
    "s09_pq_recall" -> Similarity.pqRecallOracle(),
    "s10_ivfpq_recall" -> Similarity.ivfPqRecallOracle(),
    "s11_ivfpq_trained" -> Similarity.ivfPqTrainedRecallOracle(),
    "s12_ann_ingest" -> Similarity.annIncrementalOracle(),
    "s13_range_search" -> Similarity.ivfRangeSearchOracle(),
    "s14_mmr_diversify" -> Similarity.mmrDiversifyOracle(),
    "s15_hybrid_rrf" -> Similarity.hybridRrfOracle(),
    "s16_filtered_ann" -> Similarity.ivfFilteredTopKOracle(),
    "s17_pq_rerank" -> Similarity.pqRerankOracle(),
    "s18_hybrid_indexed" -> Similarity.hybridRrfIndexedOracle(),
    "s23_hybrid_bm25" -> Similarity.hybridBm25Oracle(),
    "s24_hybrid_lexindexed" -> Similarity.hybridBm25IndexedOracle(),
    "st15_stream_lex_ingest" -> Similarity.streamLexIngestOracle(),
    "e2e01_reference_flow" -> ReferenceE2E.oracle,
    "s25_graph_ann" -> Similarity.graphAnnTopKOracle(),
    "s26_phrase_bm25" -> Similarity.phraseBm25Oracle(),
    "s27_graph_ingest" -> Similarity.graphIngestOracle(),
    "s28_graph_filtered" -> Similarity.graphFilteredTopKOracle(),
    "s29_graph_pq" -> Similarity.graphPqTopKOracle(),
    "s30_graph_hier" -> Similarity.graphHierTopKOracle(),
    "q38_value_histogram" -> Relational.valueHistogramOracle,
    "q39_data_profile" -> Relational.dataProfileOracle,
    "q40_funnel" -> Relational.conversionFunnelOracle,
    "q41_time_weighted_avg" -> Relational.timeWeightedAvgOracle,
    "q42_gaps_islands" -> Relational.gapsIslandsOracle,
    "q43_cohort_retention" -> Relational.cohortRetentionOracle,
    "q44_asof_enrich" -> Relational.asofEnrichOracle,
    "q45_group_quantiles" -> Relational.groupQuantilesOracle,
    "q46_sql_api" -> Dedup.sqlApiOracle(),
    "d11_minhash_estimate" -> Dedup.minhashEstimateOracle(),
    "d12_dedup_incremental" -> Dedup.dedupIncrementalOracle(),
    "d13_dedup_containment" -> Dedup.dedupContainmentOracle(),
    "d14_dup_spans" -> Dedup.dupSpansOracle(),
    "d21_span_scrub" -> Dedup.spanScrubOracle(),
    "d15_span_incremental" -> Dedup.dupSpansIncrementalOracle(),
    "d16_dedup_best_keep" -> Dedup.dedupBestKeepOracle(),
    "d17_semdedup" -> Similarity.semDedupOracle(),
    "d18_dedup_bloom_gate" -> Dedup.dedupBloomGateOracle(),
    "d19_dedup_prefix" -> Dedup.prefixDedupOracle(),
    "t19_leakage_split" -> Dedup.leakSafeSplitOracle(),
    "t16_domain_mixture" -> TextOps.domainMixtureOracle,
    "t17_mixture_materialize" -> TextOps.mixtureMaterializeOracle,
    "t18_bigram_surprisal" -> TextOps.bigramSurprisalOracle(),
    "t20_filter_battery" -> TextOps.filterBatteryOracle,
    "t22_perplexity_bucket" -> TextOps.perplexityBucketsOracle(),
    "t23_curation_pipeline" -> Dedup.curationPipelineOracle(),
    "t24_bpe_merges" -> TextOps.bpeMergesOracle(),
    "t25_bpe_encode" -> TextOps.bpeEncodeOracle(),
    "t26_domain_divergence" -> TextOps.domainDivergenceOracle,
    "q49_kmv_distinct" -> Relational.kmvDistinctOracle(),
    "q52_kmv_set_ops" -> Relational.kmvSetOpsOracle(),
    "t29_zipf_slope" -> TextOps.zipfSlopeOracle(),
    "t30_chunk_windows" -> TextOps.chunkWindowsOracle(),
    "t27_bpe_fertility" -> TextOps.bpeFertilityOracle(),
    "q50_cusum_changepoint" -> Relational.cusumChangepointOracle,
    "q51_regional_revenue" -> Relational.regionalRevenueOracle(),
    "t28_heaps_growth" -> TextOps.heapsGrowthOracle,
    "q47_rank_corr" -> Relational.rankCorrelationOracle,
    "m04_cdc_chunks" -> Multimodal.cdcChunksOracle,
    "m05_shard_pack" -> Multimodal.shardPackOracle(),
    "m06_image_decode" -> Multimodal.imageDecodeOracle,
    "m07_audio_decode" -> Multimodal.audioDecodeOracle,
    "m08_audio_windows" -> Multimodal.audioWindowsOracle(),
    "m09_video_frames" -> Multimodal.videoDecodeOracle,
    "m10_gop_video" -> Multimodal.gopVideoDecodeOracle,
    "m11_image_resize" -> Multimodal.imageResizeOracle,
    "m12_audio_resample" -> Multimodal.audioResampleOracle,
    "m13_gop_extract" -> Multimodal.gopExtractOracle(),
    "m14_image_phash" -> Multimodal.imagePhashOracle,
    "q48_lake_scan_pruned" -> Relational.lakeScanPrunedOracle,
    "st09_lake_stream" -> graft.streaming.StreamOps.lakeStreamOracle,
    "st10_lake_cdc" -> graft.streaming.StreamOps.lakeCdcOracle,
    "st11_stream_curation" -> Dedup.streamCurationOracle(),
    "st12_stream_ann_ingest" -> Similarity.streamAnnIngestOracle(),
    "st13_stream_kmv" -> graft.streaming.StreamOps.kmvStreamOracle(),
    "st14_alert_stream" -> graft.operators.Relational.cusumMonitorOracle(),
    "st16_stream_graph_ingest" -> Similarity.streamGraphIngestOracle(),
    "st17_stream_gram_ingest" -> Dedup.streamGramIngestOracle(),
  )
}
