package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._
import graft.imdb.{Pipeline, Queries => Imdb}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 (plus the LLM-pipeline
  * extensions) is registered here, and every entry has a DuckDB twin in
  * [[OracleSql]] — the pair is what the driver's correctness gate runs.
  * (`rel_approx_distinct` hash-compares the exact count plus a
  * within-bound verdict — each engine checks its own HLL estimate, since
  * raw sketch values are engine-specific; the tighter 3x-rsd property
  * lives in GateSemanticsSpec.)
  * Column names and types are part of the contract (the driver compares
  * by sorted column name): builders alias every computed column and the
  * SQL twins use the same aliases.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The star-join revenue rollup — the 100 TB shape this engine exists
    * for: fact⋈fact shuffle join + broadcast dims + partial aggregation. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q12StarJoinRevenue(spark, "/root/testdata/sf0.001")

  /** IMDB parity queries run on the reference CSVs regardless of sfDir
    * (the reference corpus IS their dataset; the oracle reads the same
    * CSVs). Star is rebuilt per call — 1,000-row inputs, all lazy. */
  private def imdbQ(f: graft.imdb.Star => DataFrame): (SparkSession, String) => DataFrame =
    (s, _) => f(Pipeline.build(s))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // relational operator suite (SURVEY.md §2 families)
    "rel_pricing_summary" -> (Relational.q1PricingSummary _),
    "rel_filter_project" -> (Relational.q2FilterProject _),
    "rel_distinct" -> (Relational.q3Distinct _),
    "rel_topk" -> (Relational.q4TopK _),
    "rel_left_join_agg" -> (Relational.q5LeftJoinAgg _),
    "rel_join_inner" -> (Relational.q6JoinInner _),
    "rel_semi_join" -> (Relational.q7SemiJoin _),
    "rel_anti_join" -> (Relational.q8AntiJoin _),
    "rel_window_top_per_key" -> (Relational.q9WindowTopPerKey _),
    "rel_cte_top_segments" -> (Relational.q10CteTopSegments _),
    "rel_in_list_range" -> (Relational.q11InListRange _),
    "rel_star_join_revenue" -> (Relational.q12StarJoinRevenue _),
    "rel_date_parts" -> (Relational.q13DateParts _),
    "rel_set_ops" -> (Relational.q14SetOps _),
    "rel_count_distinct" -> (Relational.q15CountDistinct _),
    "rel_having" -> (Relational.q16Having _),
    "rel_case_buckets" -> (Relational.q17CaseBuckets _),
    "rel_rollup" -> (Relational.q18Rollup _),
    "rel_intersect" -> (Relational.q19Intersect _),
    "rel_median" -> (Relational.q20Median _),
    "rel_scalar_subquery" -> (Relational.q21ScalarSubquery _),
    "rel_window_frames" -> (Relational.q22WindowFrames _),
    "rel_brand_revenue" -> (Relational.q24BrandRevenue _),
    "rel_bucketed_join_revenue" -> (Relational.q25BucketedJoinRevenue _),
    "rel_cube" -> (Relational.q26Cube _),
    "rel_pivot" -> (Relational.q27Pivot _),
    "rel_salted_agg" -> (Relational.q28SaltedAgg _),
    "rel_salted_join" -> (Relational.q29SaltedJoin _),
    "rel_grouping_sets" -> (Relational.q30GroupingSets _),
    "rel_unpivot" -> (Relational.q31Unpivot _),
    "rel_full_outer" -> (Relational.q32FullOuter _),
    "rel_bloom_prune_join" -> ((s, d) => Relational.q33BloomPrunedJoin(s, d)),
    "rel_approx_percentile" -> (Relational.q34ApproxPercentile _),
    "rel_string_funcs" -> (Relational.q35StringFuncs _),
    "rel_window_ranks" -> (Relational.q36WindowRanks _),
    "rel_array_agg" -> (Relational.q37ArrayAgg _),
    "rel_cross_join" -> (Relational.q38CrossJoin _),
    "rel_stats_agg" -> (Relational.q39StatsAgg _),
    "rel_latest_per_key" -> (Relational.q40LatestPerKey _),
    "rel_conditional_agg" -> (Relational.q41ConditionalAgg _),
    "rel_scd2_intervals" -> (Relational.q42Scd2Intervals _),
    "rel_scd2_asof" -> ((s, d) => Relational.q43Scd2Asof(s, d)),
    "rel_ntile_cume" -> (Relational.q44NtileCume _),
    "rel_merge_upsert" -> ((s, d) => Relational.q45MergeUpsert(s, d)),
    "rel_join_delta_view" -> ((s, d) => Relational.q52JoinDeltaView(s, d)),
    "rel_scd2_late_splice" -> ((s, d) => Relational.q46Scd2LateSplice(s, d)),
    "rel_scd2_snapshot_at" -> ((s, d) => Relational.q47Scd2SnapshotAt(s, d)),
    "rel_scd2_snapshot_diff" -> ((s, d) => Relational.q51SnapshotDiff(s, d)),
    "rel_skew_audit" -> ((s, d) => Relational.q48SkewAudit(s, d)),
    "rel_column_profile" -> ((s, d) => Relational.q49ColumnProfile(s, d)),
    "rel_agg_delta_apply" -> ((s, d) => Relational.q50AggDeltaApply(s, d)),
    "rel_histogram_quantiles" -> ((s, d) => Relational.q53HistogramQuantiles(s, d)),
    "sim_pq_codes" -> ((s, d) => Similarity.pqCodes(s, d)),
    "sim_pq_codebooks" -> ((s, d) => Similarity.pqCodebooks(s, d)),
    "sim_pq_recon_error" -> ((s, d) => Similarity.pqReconError(s, d)),
    "sim_pq_adc_topk" -> ((s, d) => Similarity.pqAdcTopK(s, d)),
    "sim_ivfpq_topk" -> ((s, d) => Similarity.ivfPqTopK(s, d)),
    "sim_ivfpq_rerank" -> ((s, d) => Similarity.ivfPqRerank(s, d)),
    "sim_pq_balanced" -> ((s, d) => Similarity.pqBalanced(s, d)),
    "sim_kcenter_seeds" -> ((s, d) => Similarity.kcenterSeeds(s, d)),
    "sim_ivfadc_topk" -> ((s, d) => Similarity.ivfAdcTopK(s, d)),
    "sim_ivfadc_recall" -> ((s, d) => Similarity.ivfAdcRecall(s, d)),
    "sim_pq_lloyd" -> ((s, d) => Similarity.pqLloydCodebooks(s, d)),
    "sim_pq_lloyd_shift" -> ((s, d) => Similarity.pqLloydShift(s, d)),
    "sim_pq_lloyd_chain" -> ((s, d) => Similarity.pqLloydChain(s, d)),
    "sim_pq_lloyd_trajectory" -> ((s, d) => Similarity.pqLloydTrajectory(s, d)),
    "sim_adc_trained_topk" -> ((s, d) => Similarity.adcTrainedTopK(s, d)),
    "sim_pq_trained_recall" -> ((s, d) => Similarity.pqTrainedRecall(s, d)),
    "sim_pq_recall" -> ((s, d) => Similarity.pqRecall(s, d)),
    "sim_sq8_topk" -> ((s, d) => Similarity.sq8TopK(s, d)),
    "sim_sq8_recall" -> ((s, d) => Similarity.sq8Recall(s, d)),
    // graph analytics over the near-dup pair graph
    "graph_degree_distribution" -> (Graph.degreeDistribution _),
    "graph_triangle_census" -> (Graph.triangleCensus _),
    "graph_triangle_sample" -> ((s, d) => Graph.triangleSample(s, d)),
    "graph_pagerank" -> ((s, d) => Graph.pageRank(s, d)),
    "graph_kcore" -> ((s, d) => Graph.kCore(s, d)),
    "graph_ktruss" -> ((s, d) => Graph.kTruss(s, d)),
    "graph_pagerank_trajectory" -> ((s, d) => Graph.pageRankTrajectory(s, d)),
    "graph_adamic_adar" -> ((s, d) => Graph.adamicAdar(s, d)),
    "graph_random_walks" -> ((s, d) => Graph.randomWalks(s, d)),
    "graph_ppr" -> ((s, d) => Graph.personalizedPageRank(s, d)),
    "graph_label_propagation" -> ((s, d) => Graph.labelPropagation(s, d)),
    "graph_local_clustering" -> (Graph.localClustering _),
    "graph_eigencentrality" -> ((s, d) => Graph.eigenCentrality(s, d)),
    "graph_hits" -> ((s, d) => Graph.hits(s, d)),
    "graph_modularity" -> ((s, d) => Graph.modularity(s, d)),
    "graph_assortativity" -> ((s, d) => Graph.assortativity(s, d)),
    "graph_betweenness" -> ((s, d) => Graph.betweenness(s, d)),
    "graph_bfs_distance" -> ((s, d) => Graph.bfsDistance(s, d)),
    // text analysis
    "text_token_stats" -> (TextAnalysis.tokenStats _),
    "text_heavy_hitters" -> ((s, d) => TextAnalysis.heavyHitters(s, d)),
    "text_cms_estimate" -> ((s, d) => TextAnalysis.cmsEstimate(s, d)),
    "text_zipf_fit" -> ((s, d) => TextAnalysis.zipfFit(s, d)),
    "text_char_entropy" -> (TextAnalysis.charEntropy _),
    "text_bigram_logprob" -> (TextAnalysis.bigramLogprob _),
    "text_quality_score" -> (TextAnalysis.qualityScore _),
    "text_quality_filter" -> (TextAnalysis.qualityFilter _),
    "text_gopher_rules" -> (TextAnalysis.gopherRules _),
    "text_lexical_diversity" -> (TextAnalysis.lexicalDiversity _),
    "text_ngram_counts" -> ((s, d) => TextAnalysis.ngramCounts(s, d)),
    "text_token_budget_mix" -> (TextAnalysis.tokenBudgetMix _),
    "text_lang_id" -> (TextAnalysis.langId _),
    "text_fingerprint" -> (TextAnalysis.fingerprint _),
    "text_tfidf_top_terms" -> ((s, d) => TextAnalysis.tfidfTopTerms(s, d)),
    "text_hash_split" -> (TextAnalysis.hashSplit _),
    "text_stratified_sample" -> (TextAnalysis.stratifiedSample _),
    "text_weighted_sample" -> (TextAnalysis.weightedSample _),
    "text_repetition_score" -> (TextAnalysis.repetitionScore _),
    "text_pack_sequences" -> ((s, d) => TextAnalysis.packSequences(s, d)),
    "text_curation_manifest" -> ((s, d) => TextAnalysis.curationManifest(s, d)),
    "text_redact" -> (TextAnalysis.redact _),
    "text_decontaminate" -> ((s, d) => TextAnalysis.decontaminate(s, d)),
    "text_common_spans" -> ((s, d) => TextAnalysis.commonSpans(s, d)),
    "text_unigram_logprob" -> (TextAnalysis.unigramLogprob _),
    "text_dsir_weights" -> ((s, d) => TextAnalysis.dsirWeights(s, d)),
    "text_source_kl" -> (TextAnalysis.sourceKl _),
    "text_ccnet_buckets" -> ((s, d) => TextAnalysis.ccnetBuckets(s, d)),
    "rel_approx_distinct" -> (Relational.q23ApproxDistinct _),
    "text_winnow_sketch" -> ((s, d) => TextAnalysis.winnowSketch(s, d)),
    "text_bm25_topk" -> ((s, d) => TextAnalysis.bm25TopK(s, d)),
    "text_span_dedup" -> ((s, d) => TextAnalysis.spanDedup(s, d)),
    "text_shard_plan" -> ((s, d) => TextAnalysis.shardPlan(s, d)),
    // events (batch time-series)
    "events_hourly_agg" -> (Events.hourlyAgg _),
    "events_itemset_pairs" -> ((s, d) => Events.itemsetPairs(s, d)),
    "events_changepoint" -> ((s, d) => Events.changepointCusum(s, d)),
    "events_periodicity" -> ((s, d) => Events.periodicity(s, d)),
    "events_sessionize" -> (Events.sessionize _),
    "events_top_type_per_user" -> (Events.topTypePerUser _),
    "events_props_extract" -> (Events.propsExtract _),
    "events_partitioned_daily" -> (Events.partitionedDaily _),
    "events_zorder_scan" -> (Events.zorderScan _),
    "events_asof_join" -> ((s, d) => Events.asofJoin(s, d)),
    "events_asof_tolerance" -> ((s, d) =>
      Events.asofEnriched(s, d, toleranceMs = Some(3600000L))),
    "events_asof_forward" -> ((s, d) =>
      Events.asofEnriched(s, d, direction = "forward")),
    "events_range_join" -> ((s, d) => Events.rangeJoinPriorCounts(s, d)),
    "events_funnel" -> ((s, d) => Events.funnel(s, d)),
    "events_cohort_retention" -> ((s, d) => Events.cohortRetention(s, d)),
    "events_path_transitions" -> (Events.pathTransitions _),
    "events_markov_stationary" -> ((s, d) => Events.markovStationary(s, d)),
    "events_attribution" -> ((s, d) => Events.attribution(s, d)),
    "events_top_paths" -> ((s, d) => Events.topPaths(s, d)),
    "events_anomaly_zscore" -> ((s, d) => Events.anomalyZscore(s, d)),
    "events_sliding_agg" -> (Events.slidingAgg _),
    "events_rfm" -> ((s, d) => Events.rfm(s, d)),
    // dedup
    "dedup_exact" -> (Dedup.exact _),
    "dedup_rate_by_source" -> (Dedup.rateBySource _),
    "dedup_minhash_signatures" -> (Dedup.minhashSignatures _),
    "dedup_minhash_lsh_pairs" -> ((s, d) => Dedup.minhashLshPairs(s, d)),
    "dedup_lsh_append" -> ((s, d) => Dedup.lshIndexAppend(s, d)),
    "dedup_minhash_calibration" -> ((s, d) => Dedup.minhashCalibration(s, d)),
    "dedup_simhash_signatures" -> (Dedup.simhashSignatures _),
    "dedup_simhash_pairs" -> ((s, d) => Dedup.simhashPairs(s, d)),
    "dedup_ngram_jaccard_pairs" -> ((s, d) => Dedup.ngramJaccardPairs(s, d, threshold = 0.6, n = 5)),
    "dedup_containment_pairs" -> ((s, d) => Dedup.containmentPairs(s, d)),
    "dedup_embedding_neardup" -> ((s, d) => Dedup.embeddingNearDup(s, d)),
    "dedup_clusters" -> ((s, d) => Dedup.dupClusters(s, d)),
    "dedup_cluster_sizes" -> ((s, d) => Dedup.clusterSizes(s, d)),
    "dedup_cross_source_matrix" -> ((s, d) => Dedup.crossSourceMatrix(s, d)),
    "dedup_funnel" -> (Dedup.dedupFunnel _),
    "dedup_weighted_jaccard" -> ((s, d) => Dedup.weightedJaccardPairs(s, d)),
    "dedup_editdist_pairs" -> ((s, d) => Dedup.editDistancePairs(s, d)),
    "dedup_editdist_passjoin" -> ((s, d) => Dedup.editDistancePassJoin(s, d)),
    "dedup_kmv_distinct" -> ((s, d) => Dedup.kmvDistinct(s, d)),
    "dedup_kmv_overlap" -> ((s, d) => Dedup.kmvOverlap(s, d)),
    "dedup_hll_distinct" -> ((s, d) => Dedup.hllDistinct(s, d)),
    "dedup_tfidf_cosine_pairs" -> ((s, d) => Dedup.tfidfCosinePairs(s, d)),
    "dedup_semantic_survivors" -> ((s, d) => Dedup.semanticSurvivors(s, d)),
    "corpus_jsonl_dedup" -> ((s, d) => Dedup.jsonlCorpusDedup(s, d)),
    "layout_compaction_plan" -> ((s, d) => graft.sources.Layout.compactionPlan(s, d)),
    "layout_skipping_stats" -> ((s, d) => graft.sources.Layout.skippingStats(s, d)),
    "dedup_survivors" -> ((s, d) => Dedup.dedupSurvivors(s, d)),
    // similarity search
    "sim_brute_force_topk" -> ((s, d) => Similarity.bruteForceTopK(s, d)),
    "sim_topk_agg" -> ((s, d) => Similarity.bruteForceTopKAgg(s, d)),
    "sim_ivf_topk" -> ((s, d) => Similarity.ivfTopK(s, d)),
    "sim_range_search" -> ((s, d) => Similarity.ivfRangeSearch(s, d)),
    "sim_mmr_rerank" -> ((s, d) => Similarity.mmrRerank(s, d)),
    "sim_dim_stats" -> (Similarity.dimStats _),
    "sim_pca_power" -> ((s, d) => Similarity.pcaPower(s, d)),
    "sim_srp_neardup_pairs" -> ((s, d) => Similarity.srpNearDupPairs(s, d)),
    "sim_knn_graph" -> ((s, d) => Similarity.knnGraph(s, d)),
    "sim_knn_descent" -> ((s, d) => Similarity.knnDescent(s, d)),
    "sim_bucket_centroids" -> ((s, d) => Similarity.bucketCentroids(s, d)),
    "sim_centroid_assign" -> ((s, d) => Similarity.centroidAssign(s, d)),
    "sim_lloyd_iteration" -> ((s, d) => Similarity.lloydIteration(s, d)),
    "sim_threshold_histogram" -> ((s, d) => Similarity.thresholdHistogram(s, d)),
    "sim_recall_report" -> ((s, d) => Similarity.recallReport(s, d)),
    "sim_centroid_shift" -> ((s, d) => Similarity.centroidShift(s, d)),
    "sim_silhouette" -> ((s, d) => Similarity.silhouette(s, d)),
    "sim_graph_ann_topk" -> ((s, d) => Similarity.graphAnnTopK(s, d)),
    "sim_graph_ann_descent" -> ((s, d) => Similarity.graphAnnDescentTopK(s, d)),
    "sim_hubness" -> ((s, d) => Similarity.hubnessAudit(s, d)),
    "sim_hubness_descent" -> ((s, d) => Similarity.hubnessDescent(s, d)),
    "sim_kmeanspp_seeds" -> ((s, d) => Similarity.kmeansParallelSeeds(s, d)),
    // multimodal columns
    "mm_meta_stats" -> (MultiModal.mmMetaStats _),
    "mm_features" -> (MultiModal.mmFeatures _),
    "mm_frame_sample" -> ((s, d) => MultiModal.mmFrameSample(s, d)),
    "mm_resize" -> ((s, d) => MultiModal.mmResize(s, d)),
    "mm_payload_dedup" -> (MultiModal.mmPayloadDedup _),
    "mm_phash_pairs" -> ((s, d) => MultiModal.mmPhashPairs(s, d)),
    "mm_shot_boundaries" -> ((s, d) => MultiModal.mmShotBoundaries(s, d)),
    // IMDB parity (deterministic twins for the LIMIT/rank queries —
    // SURVEY.md §1.4(5); byte-faithful builders live in graft.imdb.Queries)
    "imdb_graf1" -> imdbQ(st => Imdb.graf1(st.dimMovies)),
    "imdb_graf2" -> imdbQ(st => Imdb.graf2(st.dimGenres, st.factMovies)),
    "imdb_graf3" -> imdbQ(st => Imdb.graf3Det(st.factMovies, st.dimPeople)),
    "imdb_graf4" -> imdbQ(st => Imdb.graf4Det(st.factMovies, st.dimPeople,
      st.dimGenres, st.staging("ratings_staging"))),
    "imdb_graf5" -> imdbQ(st => Imdb.graf5Det(st.staging("role_mapping_staging"), st.dimPeople)),
    "imdb_graf6" -> imdbQ(st => Imdb.graf6Det(st.dimMovies)))

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same inputs. See [[OracleSql]]. */
  def oracleSql: Map[String, String] = OracleSql.all
}
