package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main — driver runs this at sf0.1 per round → BENCH_r{N}.json.
  *
  * Headline set: the queries whose shape dominates a 100 TB deployment —
  * the fact⋈fact star join, wide aggregation, window rank, LSH dedup
  * (minhash + simhash), set-similarity join, sessionization, ANN top-k
  * and the banded-SRP near-dup join. Each is timed via count() (full
  * pipeline execution, no collect-to-driver of result data).
  *
  * Failure honesty: a query that throws is recorded in an `errors` map
  * (exception class + message) and EXCLUDED from the totals — a crash can
  * never masquerade as a fast run. The JSON line goes to stdout AND, when
  * SPARK_GRAFT_BENCH_OUT is set, to that file verbatim (sbt log noise
  * cannot bury it).
  *
  * Scale section: after the base run, the same headline set is re-run on
  * a 10x structure-preserving scale-up of the base sf dir (see
  * [[graft.sources.ScaledCorpus]] — perturbed replicas, so pair outputs
  * scale linearly, the honest contract). Reported under `"scale"` in the
  * same JSON line; disable with SPARK_GRAFT_SCALE=0.
  */
object Bench {

  /** Headline queries (subset of SparkEntry.queries keys). */
  val headline: Seq[String] = Seq(
    "rel_pricing_summary",
    "rel_left_join_agg",
    "rel_window_top_per_key",
    "rel_cte_top_segments",
    "rel_star_join_revenue",
    "rel_salted_agg",
    "rel_bloom_prune_join", // added r8: bloom-gated shuffle join
    "events_zorder_scan", // added r8: includes one-time z-layout write
    "text_weighted_sample", // added r8: one-window priority sample
    "dedup_cross_source_matrix", // added r8: LSH pairs + 2 lookups
    "dedup_exact",
    "dedup_minhash_lsh_pairs",
    "dedup_simhash_pairs",
    "dedup_clusters", // added r7: CC iteration cost measured at 10x too
    "text_quality_score",
    "text_quality_filter",
    "text_ngram_counts",
    "text_common_spans", // added r8: corpus shingle-df boilerplate pass
    "text_unigram_logprob", // added r8: corpus LM train+apply in one plan
    "events_path_transitions", // added r8: one-window Markov transitions
    "events_sliding_agg", // added r8: 3x hop-window fan-out aggregate
    "events_sessionize",
    "events_hourly_agg",
    "events_asof_join",
    "events_funnel", // added r7 with the per-stage exchange-reuse plan
    "sim_brute_force_topk",
    "sim_topk_agg",
    "sim_ivf_topk",
    "sim_srp_neardup_pairs",
    "sim_bucket_centroids",
    "sim_pq_adc_topk", // added r9: code-only ADC scan + broadcast LUT
    "sim_ivfpq_topk", // added r10: coarse-probe-pruned ADC (the IVF-PQ layout)
    "sim_ivfadc_topk", // added r10: residual-coded IVF-PQ (IVFADC proper)
    "sim_adc_trained_topk", // added r10: Lloyd-trained codebook re-encode + ADC
    "graph_pagerank", // added r10: LSH pair graph + 3 unrolled power iterations
    "graph_triangle_sample", // added r11: DOULION p=1/2 census estimator
    "rel_scd2_intervals", // added r9: full-table window materialization
    "rel_scd2_asof", // added r10: interval point-in-time probe join
    "rel_scd2_late_splice", // added r11: affected-key interval rewrite
    "sim_pq_lloyd_chain", // added r11: 3 chained assignment+means exchanges
    "text_span_dedup", // added r11: corpus-wide dup-span excision + doc rebuild
    "graph_kcore", // added r11: 8 checkpointed peel rounds over the LSH graph
    "sim_ivfpq_rerank", // added r11: ADC shortlist + exact-cosine re-rank
    "graph_label_propagation", // added r11: 4 sync LPA rounds over the LSH graph
    "graph_adamic_adar", // added r11: hub-capped wedge join + decimal agg
    "text_heavy_hitters", // added r11: Misra-Gries candidates + pruned confirm
    "text_bigram_logprob", // added r11: bigram LM train+apply in one plan
    "text_char_entropy", // added r11: char explode + decimal entropy terms
    "dedup_containment_pairs", // added r11: asymmetric PPJoin + intersect verify
    "sim_mmr_rerank", // added r11: heap-agg shortlist + 5 greedy MMR steps
    "graph_random_walks", // added r11: 3 frontier join + struct-min steps
    "graph_ppr", // added r11: seeded restart iteration, orbit-bounded output
    "rel_scd2_snapshot_diff", // added r11: churn-bounded full-outer 1:1 diff
    "text_cms_estimate", // added r11: d*w-bounded sketch + MG probe audit
    "graph_local_clustering", // added r11: triangle list charged to 3 corners
    "graph_eigencentrality", // added r11: 3 normalized power iterations
    "sim_silhouette", // added r11: corpus x broadcast-centroid scan + a/b mins
    "rel_join_delta_view", // added r11: signed IVM delta expansion + apply
    "mm_shot_boundaries", // added r11: per-asset frame windows + lag-1 delta
    "dedup_funnel", // added r11: exact+LSH+containment layers in one audit
    "text_lexical_diversity", // added r11: two doc-keyed count exchanges
    "events_markov_stationary", // added r11: transition window + tiny matrix loop
    "sim_knn_descent", // added r12: 3 NN-descent rounds — the sub-quadratic kNN build
    "sim_knn_descent_sq8", // added r15: descent rounds over 64-B SQ8 codes, exact rescore of survivors
    "dedup_lsh_append", // added r12: batch-incremental LSH maintenance (new-vs-all only)
    "dedup_editdist_passjoin", // added r12: PassJoin segment-blocked entity resolution
    "sim_hubness_descent", // added r12: in-degree histogram over the NN-descent graph
    "sim_hubness_descent_sq8", // added r15: the same histogram over the narrow-exchange sq8 build
    "sim_kmeanspp_seeds", // added r12: 3 k-means|| Bernoulli rounds, driver-policy centers
    "rel_histogram_quantiles", // added r12: 2-scan fixed-bin percentile estimation
    "text_dsir_weights", // added r12: hashed-unigram importance weights, broadcast LM
    "text_ccnet_buckets", // added r12: per-lang perplexity tertiles via histogram cut
    "mm_phash_pairs", // added r12: banded Hamming join over 64-bit pHashes
    "events_attribution", // added r12: bucketed range join + credit window
    "dedup_hll_distinct", // added r12: deterministic 256-register HLL + union merge
    "events_itemset_pairs", // added r12: basket 2-itemset census off sorted type arrays
    "events_changepoint", // added r12: integer-exact CUSUM argmax per type series
    "graph_hits", // added r12: directed hub/authority power iterations
    "graph_modularity", // added r12: LPA partition quality, integer counts
    "graph_assortativity", // added r12: degree Pearson from integer moments
    "graph_betweenness", // added r12: 8-source hop-bounded Brandes sweep
    "text_source_kl", // added r12: per-source corpus-drift KL
    "events_periodicity", // added r12: lag-24 autocorr on the dense hour grid
    "graph_jaccard_neighbors", // added r13: hub-capped wedge join, normalized overlap
    "sim_bq_recall", // added r13: 1-bit sign codes, XOR+POPCNT shortlist + rerank
    "sim_matryoshka_recall", // added r13: 3 prefix-slice scans vs the exact top-k
    "events_ewma_anomaly", // added r13: bounded 24-hour range self-join EWMA
    "events_interarrival", // added r13: per-type gap window + nearest-rank picks
    "text_pmi_bigrams", // added r13: two counting explodes + bounded score join
    "rel_table_checksum", // added r13: 3 hash-sum scans, no data shuffle
    "rel_fk_audit", // added r13: 5 key-only left joins + conditional counts
    "text_heaps_fit", // added r13: two first-touch exchanges + bounded bucket fit
    "text_ngram_novelty", // added r13: gram min-doc first occurrence + per-doc rollup
    "events_session_stats", // added r13: one user exchange, size-grain rollup
    "graph_coreness", // added r13: 8 checkpointed h-index rounds over the LSH graph
    "text_dedup_impact", // added r13: fp dedup + two token counts + KL join
    "graph_rich_club", // added r13: 5 threshold membership-join passes
    "sim_ivf_bq_topk", // added r13: bucket-pruned Hamming scan + exact rerank
    "graph_hyperball", // added r13: 4 register-max merge rounds, 64-reg HLL balls
    "sim_ivf_probe_curve", // added r13: 3 probe-radius scans + one exact baseline
    "graph_harmonic", // added r13: 3 per-seed frontier joins + one DECIMAL agg
    "mm_phash_clusters", // added r13: banded Hamming pairs + frontier CC rollup
    "text_token_fertility", // added r13: one projection + one bounded shuffle
    "sim_ivfpq_probe_curve", // added r13: 3 code-scan radii + one exact baseline
    "events_burstiness", // added r13: one per-type window + a moment rollup
    "graph_closeness_sketch", // added r13: hyperball rounds + per-node telescoped sum
    "text_langid_ngram", // added r14: trained trigram rank profiles, broadcast-model scoring
    "text_vocab_coverage", // added r14: token-count exchange + bounded top-16k head
    "text_bpe_merges", // added r15: one corpus token exchange + 32 type-table merge rounds
    "text_source_nb", // added r15: integer micro-nat NB, broadcast model scoring
    "text_quality_nb", // added r15: the same NB head distilling the per-source quality-median gate's verdicts
    "sim_ivf_append", // added r16: batch-incremental IVF maintenance — standing index never retrained
    "sim_pq_append", // added r16: the fine-quantizer half — batch encoded against the standing PQ codebook, MSE drift vs retrain
    "sim_index_roundtrip", // added r17: write+load both standing artifacts to/from parquet, serve the batch from the LOADED tables
    "dedup_index_roundtrip", // added r17: the dedup half — standing LSH index persisted to parquet, batch probes the LOADED artifact
    "text_model_roundtrip", // added r17: the text half — all three router models persisted to parquet, holdout served from the LOADED artifacts
    "graph_clustering_approx", // added r17: DOULION p=1/2 per-node estimate — the ~4x cheaper local_cc default
    "mm_meta_stats")

  /** Registered queries deliberately NOT in the headline bench, each
    * with its reason. GateSemanticsSpec pins
    * `headline ∪ notBenched == SparkEntry.queries.keySet` (disjoint),
    * so every NEW registration must either join the bench — and with
    * it the per-round 10x and end-of-round 100x scale sweeps — or
    * record here, in code, why it does not. This is the structural fix
    * for the recurring post-rehearsal registration gap: the query set
    * the sweeps read is derived from the registry, never a hand-kept
    * side list. */
  val notBenched: Map[String, String] = {
    def family(reason: String)(qs: String*): Seq[(String, String)] =
      qs.map(_ -> reason)
    (family("imdb reference-parity golden: ms-scale display query over " +
        "the tiny reference CSVs; benching adds JVM noise, not plan signal")(
        "imdb_graf1", "imdb_graf2", "imdb_graf3", "imdb_graf4",
        "imdb_graf5", "imdb_graf6") ++
      family("quadratic-or-output-bound BY CONTRACT, with standalone " +
        "SCALING.md records; inside the shared bench JVM it would drown " +
        "(or OOM) the linear headline set — see the NOTE block above")(
        "sim_knn_graph", "sim_graph_ann_topk", "sim_graph_ann_descent",
        "sim_hubness", "graph_ktruss", "graph_triangle_census",
        "dedup_lsh_tuning", "dedup_tfidf_cosine_pairs",
        "dedup_editdist_pairs", "dedup_embedding_neardup") ++
      family("derived rollup/audit view of a benched pipeline: the " +
        "upstream kernel's cost is the benched entry; this adds one " +
        "bounded aggregate")(
        "dedup_cluster_sizes", "dedup_survivors", "dedup_semantic_survivors",
        "dedup_rate_by_source", "text_langid_mix", "text_langid_confusion",
        "text_bpe_compression", "text_bpe_fertility", "text_bpe_doc_pieces",
        "text_source_nb_confusion", "text_quality_nb_confusion",
        "sim_centroid_shift",
        "sim_pq_lloyd_shift", "sim_pq_lloyd_trajectory",
        "graph_pagerank_trajectory", "graph_degree_distribution",
        "sim_dim_stats", "sim_threshold_histogram", "rel_skew_audit",
        "rel_column_profile") ++
      family("offline recall/tuning audit: the production scan is benched " +
        "(sim_ivf/_pq probe curves, production top-k); the audit's exact " +
        "baseline join is deliberate and output-bound")(
        "sim_recall_report", "sim_ivfadc_recall", "sim_pq_recall",
        "sim_pq_trained_recall", "sim_sq8_recall", "sim_range_search",
        "sim_pq_recon_error", "sim_ivf_append_recall",
        "graph_clustering_approx_err") ++
      family("build stage of a benched end-to-end pipeline: the chained " +
        "siblings (sim_kmeanspp_seeds, sim_pq_lloyd_chain, " +
        "sim_adc_trained_topk, sim_ivfpq_topk) time these kernels " +
        "under their consumers")(
        "sim_centroid_assign", "sim_kcenter_seeds", "sim_lloyd_iteration",
        "sim_pq_lloyd", "sim_pq_codes", "sim_pq_codebooks", "sim_pq_balanced",
        "sim_pca_power", "sim_sq8_topk", "dedup_minhash_signatures",
        "dedup_simhash_signatures") ++
      family("closed-form or bounded-sketch micro-op, sub-second at every " +
        "scale; the sketch family's heavy member (dedup_hll_distinct) is " +
        "benched")(
        "dedup_minhash_calibration", "dedup_kmv_distinct", "dedup_kmv_overlap",
        "rel_approx_distinct", "rel_approx_percentile") ++
      family("single-exchange relational micro-op (TPC-H shape): the " +
        "benched relational set (pricing_summary, star_join_revenue, " +
        "window_top_per_key, cte_top_segments, salted_agg, " +
        "bloom_prune_join, scd2 family, histogram_quantiles, " +
        "table_checksum, fk_audit) covers every exchange pattern these " +
        "compose")(
        "rel_agg_delta_apply", "rel_anti_join", "rel_array_agg",
        "rel_brand_revenue", "rel_bucketed_join_revenue", "rel_case_buckets",
        "rel_conditional_agg", "rel_count_distinct", "rel_cross_join",
        "rel_cube", "rel_date_parts", "rel_distinct", "rel_filter_project",
        "rel_full_outer", "rel_grouping_sets", "rel_having",
        "rel_in_list_range", "rel_intersect", "rel_join_inner",
        "rel_latest_per_key", "rel_median", "rel_merge_upsert",
        "rel_ntile_cume", "rel_pivot", "rel_rollup", "rel_salted_join",
        "rel_scalar_subquery", "rel_scd2_snapshot_at", "rel_semi_join",
        "rel_set_ops", "rel_stats_agg", "rel_string_funcs", "rel_topk",
        "rel_unpivot", "rel_window_frames", "rel_window_ranks") ++
      family("variant of a benched events kernel (asof cover join / " +
        "session window / hourly rollup) differing only in direction, " +
        "tolerance, or the bounded final rollup")(
        "events_asof_forward", "events_asof_tolerance", "events_range_join",
        "events_anomaly_zscore", "events_rfm", "events_cohort_retention",
        "events_top_paths", "events_top_type_per_user", "events_props_extract") ++
      family("one-time layout write or parquet-footer audit: IO-bound by " +
        "design; the write-shaped representative events_zorder_scan is " +
        "benched")(
        "events_partitioned_daily", "layout_compaction_plan",
        "layout_skipping_stats") ++
      family("stub-codec plumbing: timing would measure the deterministic " +
        "fake decoder, not a plan; the real mm kernels (pHash pairs/" +
        "clusters, meta stats, shot boundaries) are benched")(
        "mm_features", "mm_frame_sample", "mm_resize", "mm_payload_dedup") ++
      family("ingestion-path variant over a spec-written fixture file: " +
        "parse-bound, not plan-bound; the dedup kernel is benched via " +
        "dedup_exact")(
        "corpus_jsonl_dedup") ++
      family("per-doc scan or bounded rollup whose kernel is benched via " +
        "text_quality_score/_quality_filter/_weighted_sample (scan + " +
        "window) or text_langid_ngram (explode→count→rank-window)")(
        "text_token_stats", "text_repetition_score", "text_gopher_rules",
        "text_hash_split", "text_lang_id", "text_zipf_fit",
        "text_curation_manifest", "text_pack_sequences", "text_redact",
        "text_stratified_sample", "text_token_budget_mix", "text_shard_plan",
        "text_tfidf_top_terms", "text_winnow_sketch", "text_fingerprint",
        "text_bm25_topk", "text_decontaminate") ++
      family("3-hop frontier sweep whose kernel is benched via " +
        "graph_harmonic (the same sweep from 8 seeds)")(
        "graph_bfs_distance") ++
      family("near-dup pair-join variant: the banded-join kernel is " +
        "benched via dedup_minhash_lsh_pairs/_simhash_pairs/" +
        "_containment_pairs; this changes only the similarity predicate")(
        "dedup_ngram_jaccard_pairs", "dedup_weighted_jaccard")).toMap
  }
  // NOTE on cross-round comparability: r12 switched the timing action to
  // toRdd.count() (see run()), so graph_local_clustering now measures
  // its REAL cost — r11's 3.5 s record for it was the count()-pruned
  // plan (the triangle pipeline never executed). The triangle operators
  // were also rewritten to the forward algorithm this round; their
  // r12-vs-r11 deltas reflect both changes.
  // sim_graph_ann_topk / sim_hubness are NOT benched for the knn_graph
  // reason: their index build is the quadratic exact graph by contract.
  // graph_ktruss is NOT benched: 2 peel rounds + final support = 3x the
  // localClustering triangle pass (~35 s at sf0.1) — real cost lives in
  // its SCALING.md rows, and benching it would drown the linear set.
  // dedup_lsh_tuning is NOT benched for the ktruss reason: its truth
  // pass exact-verifies the PERMISSIVE (8,2) banding's candidate set —
  // ~7x the production pair join's candidate volume by design (that
  // cost comparison IS the report) — and at 10x inside the shared
  // bench JVM the verify join OOMs after ~90 accumulated queries
  // (passes standalone: 15.9 s base / 93 s at 10x, REPS=2,
  // bench_r13_new6.json — the SCALING.md record of note).
  // dedup_tfidf_cosine_pairs is NOT benched for the same reason: the
  // template-heavy harness corpus makes nearly every doc pair share
  // mid-rare vocabulary, so the exact join's candidate set is ~11M pairs
  // (~70 s at sf0.1) — output/candidate-bound by contract, like the
  // other deliberately-quadratic-by-contract components.
  // sim_knn_graph is deliberately NOT benched: the exact graph is
  // quadratic by contract (the scale path is ivf_topk per node), and a
  // 2.5B-pair entry would drown the signal of every linear query here.

  private def jstr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  /** Run the headline set against one dir; returns (timings, errors).
    *
    * Each query runs `reps` times and the MINIMUM is recorded (declared
    * in the JSON as "reps" — standard best-of-N practice): a 26-query
    * sequential run in one JVM accumulates GC/JIT state, and round-7
    * measured a 0.4 s query at 22 s purely from a GC pause landing on
    * it. The min is the cost of the PLAN, which is what the cross-round
    * comparison tracks. A System.gc() between queries nudges the
    * ContextCleaner to actually free dropped broadcast / checkpoint
    * blocks instead of letting them age into someone else's timing. */
  /** Active set: `headline`, or the comma-list in SPARK_GRAFT_ONLY
    * (targeted re-measurement without paying for the full set — the
    * n_queries field keeps the resulting totals self-describing).
    * SPARK_GRAFT_ONLY may name ANY registered query, including
    * notBenched ones — that is exactly how an excused
    * quadratic-by-contract query gets its standalone scale record in
    * its own JVM. */
  private def active: Seq[String] =
    sys.env.get("SPARK_GRAFT_ONLY") match {
      case Some(csv) =>
        val want = csv.split(',').map(_.trim).filter(_.nonEmpty).toSet
        val unknown = want -- SparkEntry.queries.keySet
        require(unknown.isEmpty, s"SPARK_GRAFT_ONLY names not registered: $unknown")
        (headline ++ notBenched.keys.toSeq.sorted).filter(want)
      case None => headline
    }

  /** Mutable per-leg progress, shared with the shutdown hook: the hook
    * composes a partial-but-parseable record from whatever is in here
    * when the driver's external timeout kills the JVM (r15's rc=124
    * landed "parsed": null — that class of loss is now structurally
    * impossible). All access synchronized on the instance. */
  private final class LegProgress {
    val times = scala.collection.mutable.ArrayBuffer.empty[(String, Double)]
    val errors = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    val skipped = scala.collection.mutable.ArrayBuffer.empty[String]
    def snapshot: (Seq[(String, Double)], Seq[(String, String)], Seq[String]) =
      synchronized { (times.toSeq, errors.toSeq, skipped.toSeq) }
  }

  /** Session holder with rebuild-on-death: r15's bench loss mode was one
    * cancelled graph_hyperball job killing the shared SparkContext and
    * "failing" the 13 queries behind it with "Cannot call methods on a
    * stopped SparkContext" (target/bench_last.json). `current` now
    * detects a stopped context and rebuilds the session, so a
    * cancellation is attributed ONLY to its true victim. */
  private final class SessionHolder(build: () => SparkSession) {
    private var spark: SparkSession = build()
    def current: SparkSession = {
      if (spark.sparkContext.isStopped) {
        System.err.println("[bench] SparkContext stopped — rebuilding session")
        spark = build()
      }
      spark
    }
    def stop(): Unit = if (!spark.sparkContext.isStopped) spark.stop()
  }

  private def run(sessions: SessionHolder, sfDir: String, reps: Int,
                  deadlineNanos: Long, progress: LegProgress): Unit = {
    active.foreach { name =>
      if (System.nanoTime() > deadlineNanos) {
        // Budget guard: a query start past the wall-clock budget is
        // SKIPPED (declared, not silently dropped, never an "error") so
        // the record stays parseable and complete-by-declaration even
        // when the registry outgrows the driver window again.
        progress.synchronized { progress.skipped += name }
      } else {
        val fn = SparkEntry.queries(name)
        try {
          val best = (1 to reps).map { _ =>
            val t0 = System.nanoTime()
            // toRdd.count(), NOT Dataset.count(): a bare count() lets the
            // optimizer PRUNE work that cannot change the row count — e.g.
            // graph_local_clustering's final left join has unique right
            // keys, so count() dropped the whole triangle pipeline and
            // recorded 3.5 s for a computation whose true cost was 68 s
            // (discovered round 12). toRdd executes the plan exactly as a
            // consumer of the ROWS would pay for it; for non-prunable
            // queries (everything ending in an aggregate/join that shapes
            // the count) the timing is unchanged.
            fn(sessions.current, sfDir).queryExecution.toRdd.count()
            (System.nanoTime() - t0) / 1e9
          }.min
          progress.synchronized { progress.times += name -> best }
        } catch {
          case e: Throwable =>
            progress.synchronized {
              progress.errors += name ->
                s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(200)}"
            }
            // a dying context must fail only its victim — rebuild now so
            // the NEXT query runs on a live session; a rebuild failure
            // (e.g. disk full) must not escape the loop either, or it
            // takes the whole record down with it
            try sessions.current
            catch {
              case e2: Throwable =>
                System.err.println(s"[bench] session rebuild failed: $e2")
            }
        }
      }
      System.gc()
    }
  }

  /** 3-decimal (millisecond) rendering for the stdout line — the driver
    * keeps only a 2,000-char tail of stdout, so the printed line must stay
    * well under that; full-precision values go to the JSON file. */
  private def ms(v: Double): String = BigDecimal(v)
    .setScale(3, scala.math.BigDecimal.RoundingMode.HALF_UP).toString

  /** Centisecond rendering with trailing zeros stripped ("0.30" → "0.3",
    * "5.00" → "5") — the stdout line's format. BENCH_r11 measured the
    * 3-decimal 63-query line at ~2.1 KB: longer than the driver's
    * 2,000-char stdout tail once sbt's trailing "[success] …" line is
    * appended, so the head of the JSON got cut and "parsed" stayed null.
    * At 2dp-stripped the same map is ~1.65 KB — the whole line fits the
    * tail with ~100 chars of headroom. */
  private def cs(v: Double): String = {
    val s = BigDecimal(v).setScale(2, scala.math.BigDecimal.RoundingMode.HALF_UP)
      .bigDecimal.stripTrailingZeros.toPlainString
    if (s.isEmpty || s == "-0") "0" else s
  }

  private def section(times: Seq[(String, Double)], errors: Seq[(String, String)],
      skipped: Seq[String] = Nil, rounded: Boolean = false): String = {
    val qs = times.map { case (k, v) =>
      jstr(k) + ":" + (if (rounded) ms(v) else v.toString)
    }.mkString("{", ",", "}")
    val es = errors.map { case (k, v) => jstr(k) + ":" + jstr(v) }.mkString("{", ",", "}")
    val sk = skipped.map(jstr).mkString("[", ",", "]")
    val total = times.map(_._2).sum
    // n_queries makes cross-round total comparisons self-describing —
    // the headline SET grows across rounds, so totals are not comparable
    // without it (r6: 19 queries, r7: 23)
    s""""value":${if (rounded) ms(total) else total.toString},"n_queries":${times.size},"queries":$qs,"errors":$es,"n_failed":${errors.size},"skipped":$sk,"n_skipped":${skipped.size}"""
  }

  def main(args: Array[String]): Unit = {
    // The driver parses the benchmark record from this process's stdout;
    // anything else that lands there (Spark banners, Hadoop warnings,
    // stray library printlns) can bury or decapitate the line (r8-r10
    // all recorded "parsed": null). Make the JSON line the FIRST AND
    // ONLY stdout line: capture the real fd-1 stream up front, then
    // point System.out/Console.out at stderr for everything else.
    val realOut = new java.io.PrintStream(
      new java.io.FileOutputStream(java.io.FileDescriptor.out), true)
    System.setOut(System.err)
    scala.Console.withOut(System.err)(benchBody(realOut))
  }

  private def benchBody(realOut: java.io.PrintStream): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val scaleK = sys.env.getOrElse("SPARK_GRAFT_SCALE", "10").toInt
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "2").toInt
    // The 10x leg defaults to REPS=1 (r16): at 112 headline queries the
    // best-of-2 double leg outgrew the driver's window (BENCH_r15.json
    // rc=124). Best-of-N matters most where JIT/GC noise is large
    // relative to the timing — the sub-second base queries — and least
    // on the 10x leg's tens-of-seconds plans; one rep there halves the
    // leg's wall-clock for ~run-spread-sized noise. Override with
    // SPARK_GRAFT_SCALE_REPS for a definitive double-rep record.
    val scaleReps = sys.env.getOrElse("SPARK_GRAFT_SCALE_REPS", "1").toInt
    // Wall-clock budget (seconds, from bench-main start): queries that
    // would START past it are declared "skipped" rather than dropped by
    // an external kill. 2400 s sits well inside the driver window that
    // r14's ~2600 s run fit and r15's overran.
    val budgetSec = sys.env.getOrElse("SPARK_GRAFT_BUDGET_SEC", "2400").toInt
    val t0 = System.nanoTime()
    val deadline = t0 + budgetSec * 1000L * 1000L * 1000L
    // Shuffle partitions default to the core count (the sf0.1 posture);
    // the 100x rehearsal overrides via SPARK_GRAFT_PARTITIONS — on a real
    // cluster partition count scales with data volume, and at 100x a
    // 32-partition sort of the census adjacency traffic concentrates
    // ~100x base state per task (measured SparkOutOfMemory).
    val parts = sys.env.getOrElse("SPARK_GRAFT_PARTITIONS", cpus)
    def buildSession(): SparkSession = {
      val s = SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", parts)
        .config("spark.sql.session.timeZone", "UTC")
        // events.parquet stores TIMESTAMP(NANOS) — loader contract, see Tables.events
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        // Local-mode self-preservation: a full-GC storm on a large-heap
        // backfill leg can starve the executor heartbeat thread past
        // spark.network.timeout (120 s default), and the
        // HeartbeatReceiver then expires the in-process executor — which
        // in local mode shuts down the whole SparkContext mid-query (the
        // r16 lsh-tuning 100x posture died exactly this way: "Cannot
        // determine whether executor driver is alive", then "Job
        // cancelled because SparkContext was shut down"). Under memory
        // pressure the run should get SLOW, not DEAD — give heartbeat
        // expiry backfill-scale headroom. On a real cluster the same
        // knob covers long executor GC pauses.
        .config("spark.network.timeout",
          sys.env.getOrElse("SPARK_GRAFT_NET_TIMEOUT", "600s"))
        .getOrCreate()
      s.sparkContext.setLogLevel("WARN")
      s
    }
    val sessions = new SessionHolder(buildSession)

    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT",
      "/root/repo/target/bench_last.json")
    val base = new LegProgress
    val scaleLeg = new LegProgress
    @volatile var scalePrepSec = -1.0
    @volatile var scaleStarted = false
    @volatile var done = false

    // Record composition shared by the normal exit and the shutdown
    // hook. `partial` marks a record cut short by an external kill —
    // parseable either way (the r15 rc=124 fix).
    def compose(partial: Boolean): (String, String) = {
      val (bt, be, bs) = base.snapshot
      val (st, se, ss) = scaleLeg.snapshot
      val partialC = if (partial) ""","partial":true""" else ""
      val (fullScale, stdoutScale) =
        if (scaleK <= 1 || !scaleStarted) ("null", "null")
        else {
          val head = s""""factor":$scaleK,"reps":$scaleReps,"base":${jstr(sfDir)},"prep_sec":${ms(math.max(scalePrepSec, 0.0))}"""
          (s"""{$head,${section(st, se, ss)}$partialC}""",
            s"""{"factor":$scaleK,"reps":$scaleReps,"value":${cs(st.map(_._2).sum)},"n_queries":${st.size},"n_failed":${se.size},"n_skipped":${ss.size}}""")
        }
      val fileLine =
        s"""{"metric":"total","reps":$reps,${section(bt, be, bs)}$partialC,"unit":"sec","sf":${jstr(sfDir)},"scale":$fullScale}"""
      // Compact stdout line: SUMMARY FIELDS ONLY plus a "detail" pointer
      // to the full file record — never the per-query map. BENCH_r8/r9/
      // r13 all landed "parsed": null because a 105-query map is ~3.5 KB
      // and the driver keeps only a ~2,000-char stdout tail (r13's tail
      // visibly starts mid-JSON). The per-query map lives exclusively in
      // the file record; this line stays a few hundred bytes with an
      // explicit 1,400-char ceiling (errors truncated first) so it can
      // never be decapitated again.
      def stdoutLineOf(withErrors: Boolean): String = {
        val esC =
          if (be.isEmpty || !withErrors) ""
          else be.map { case (k, v) => jstr(k) + ":" + jstr(v.take(60)) }
            .mkString(""","errors":{""", ",", "}")
        s"""{"metric":"total","reps":$reps,"value":${cs(bt.map(_._2).sum)},"n_queries":${bt.size},"n_failed":${be.size},"n_skipped":${bs.size}$esC$partialC,"unit":"sec","sf":${jstr(new java.io.File(sfDir).getName)},"scale":$stdoutScale,"detail":${jstr(outPath)}}"""
      }
      val stdoutLine = Seq(stdoutLineOf(withErrors = true))
        .find(_.length <= 1400)
        .getOrElse(stdoutLineOf(withErrors = false))
      (fileLine, stdoutLine)
    }

    def flush(partial: Boolean): Unit = {
      val (fileLine, stdoutLine) = compose(partial)
      // stdout FIRST: the file write can fail on a full disk (the
      // r16 lsh-tuning 100x rehearsal died exactly there, and the
      // original ordering would have eaten the stdout line with it)
      realOut.println(stdoutLine)
      realOut.flush()
      try java.nio.file.Files.writeString(
        java.nio.file.Paths.get(outPath), fileLine + "\n")
      catch {
        case e: Throwable =>
          System.err.println(s"[bench] file record write failed: $e")
      }
      System.err.println(s"[bench] stdout line ${stdoutLine.length} chars; full record: $outPath")
    }

    // External timeouts deliver SIGTERM; shutdown hooks run on it. If
    // the final record was not written, flush a partial one so rc=124
    // can never again mean "parsed": null.
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      if (!done) flush(partial = true)
    }, "graft-bench-partial-flush"))

    // JVM/codegen warm-up on the smallest SF so headline timings measure
    // the plan, not first-query class loading — one representative per
    // kernel family (relational agg, vector codegen + heap agg, minhash
    // banding): cold sim_brute_force_topk measured 7x its warm time
    // purely from first-touch codegen/class loading.
    Seq("rel_pricing_summary", "sim_brute_force_topk", "dedup_minhash_lsh_pairs")
      .foreach(q => SparkEntry.queries(q)(sessions.current, "/root/testdata/sf0.001").count())

    run(sessions, sfDir, reps, deadline, base)

    if (scaleK > 1) {
      try {
        val target = "/root/repo/target/graft-scale" + scaleK + "-" +
          new java.io.File(sfDir).getName
        val tPrep0 = System.nanoTime()
        graft.sources.ScaledCorpus.ensure(sessions.current, sfDir, target, scaleK)
        scalePrepSec = (System.nanoTime() - tPrep0) / 1e9
        scaleStarted = true
        run(sessions, target, scaleReps, deadline, scaleLeg)
      } catch {
        // ensure() failure (the per-query loop catches its own): record
        // it as the first scale "error" so the leg is visibly red
        case e: Throwable =>
          scaleStarted = true
          scaleLeg.synchronized {
            scaleLeg.errors += "_scale_prep" ->
              s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(200)}"
          }
      }
    }

    // flush BEFORE setting done: if TERM lands mid-final-flush the hook
    // still emits a (parseable, partial-flagged) backup line; the
    // reverse order has a window with no line at all — r15's exact loss
    flush(partial = false)
    done = true
    sessions.stop()
  }
}
