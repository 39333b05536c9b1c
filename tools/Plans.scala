package devcheck
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode
import java.nio.file.{Files, Paths}
object Plans {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions","8").config("spark.ui.enabled","false")
      .config("spark.sql.session.timeZone","UTC").config("spark.sql.legacy.parquet.nanosAsLong","true").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val queries = Seq(
      "rel_filter_project" -> "pushdown + pruning: PushedFilters + 3-column ReadSchema at the scan",
      "rel_topk" -> "top-k: TakeOrderedAndProject, no global sort",
      "rel_star_join_revenue" -> "star join: one big-big shuffle (lineitem x orders), dims broadcast",
      "rel_pricing_summary" -> "wide agg: partial HashAggregate before the single exchange",
      "rel_window_top_per_key" -> "rank filter: WindowGroupLimit pushes the k<=3 cut below the sort",
      "dedup_minhash_lsh_pairs" -> "LSH: band-key join, leftmost-band dedup (no distinct), broadcast verify joins",
      "sim_brute_force_topk" -> "two-phase rank: window over (q_id, bkt) then tiny final window over q_id",
      "events_sessionize" -> "one exchange+sort on user_id shared by lag window and final aggregate",
      "sim_ivf_topk" -> "IVF: SRP bucket equi-join with broadcast multi-probe query side; graft_srp_band kernel (precomputed hyperplanes, no per-row hashing)",
      "events_partitioned_daily" -> "partition pruning: PartitionFilters on event_date, 7 of 30 day directories scanned",
      "corpus_jsonl_dedup" -> "partitioned JSONL ingestion: source partition pruning (3 of 20), explicit schema, fingerprint groupBy",
      "sim_topk_agg" -> "bounded-heap aggregate: partial_graft_topk map-side combine, single exchange of k-row heaps",
      "events_asof_join" -> "as-of join: union-and-carry, one exchange on user_id",
      "rel_bucketed_join_revenue" -> "bucketed co-located SMJ: zero exchanges before the join, Bucketed: true scans",
      "events_cohort_retention" -> "cohort retention: ONE events scan, window min on user_id, tiny (cohort, offset) rollup",
      "text_decontaminate" -> "decontamination: eval shingle set broadcast (BroadcastHashJoin), corpus scan-speed probe",
      "text_quality_filter" -> "quality filter: sort-based per-source median, ONE exchange shared by all three windows",
      "text_ngram_counts" -> "ngram vocab: map-side partial count on gram, TakeOrderedAndProject top-k",
      "sim_knn_graph" -> "knn graph: block-grid EQUI-join (no nested loop, no corpus broadcast), partial_graft_topk heaps",
      "sim_bucket_centroids" -> "bucket centroids: decimal-exact partial sums per (bucket,pos), bounded posexplode fan-out",
      "sim_centroid_assign" -> "Lloyd assignment: O(buckets) centroid table broadcast, k=1 heap argmax per vector",
      "text_token_budget_mix" -> "token-budget mix: per-source window cumsum in hash order, no global sort",
      "text_curation_manifest" -> "composed curation: median gate semi-join -> fp dedup -> pack, three stage-grain exchanges",
      "rel_bloom_prune_join" -> "bloom-pruned join: might_contain literal gates the fact scan below a ShuffledHashJoin (non-broadcastable-dim regime)",
      "events_zorder_scan" -> "z-order scan: 2-D predicate through the Morton-sorted layout; plain filter+agg plan, IO localization is the layout's job",
      "text_weighted_sample" -> "priority sample: one source exchange, rank window, scan-speed IEEE-exact priorities",
      "dedup_cross_source_matrix" -> "cross-source matrix: LSH pair set joins two column-pruned (doc_id,source) lookups, one pair-key agg",
      "dedup_semantic_survivors" -> "semantic dedup: within-block pair join + frontier CC labels + survivor semi-join",
      "text_common_spans" -> "boilerplate spans: ONE gram-keyed partial-agg exchange, df equi-join back, per-doc rollup",
      "events_path_transitions" -> "path transitions: one user_id exchange serves the lead() window, tiny (from,to) rollup",
      "text_unigram_logprob" -> "unigram LM: tfidf-shaped term df pass, broadcast 1-row total, per-doc aggregate",
      "events_anomaly_zscore" -> "anomaly z: hour-grain agg shuffle, then per-type window over the tiny hourly frame",
      "sim_recall_report" -> "recall report: both top-k shapes composed, left join overlap, nQueries-row output",
      "sim_pq_codes" -> "PQ codes: single codegen scan (graft_srp_band over slices), ZERO exchanges",
      "sim_pq_adc_topk" -> "PQ-ADC: code scan joins broadcast LUT, decimal partial sums, two-phase rank; no raw-vector column in the scan",
      "sim_ivfpq_topk" -> "IVF-PQ: code scan gated by broadcast probe set (coarse bucket equi-join) BEFORE the broadcast-LUT ADC join — only probed buckets are scored",
      "sim_ivfadc_topk" -> "IVFADC: residual derivation + coding + scoring ride one corpus scan; centroids, probe set and residual LUT all broadcast; decimal coarse+residual partials",
      "sim_pq_lloyd" -> "PQ-Lloyd: <=128-row codebook broadcast, codegen d2 dot composition, k=1 heap argmin, decimal mean recompute",
      "sim_adc_trained_topk" -> "trained ADC: refined codebook broadcast twice (re-encode argmin + LUT); one (vec,sub) exchange for codes, then the seed ADC shape",
      "rel_scd2_intervals" -> "SCD2: one exchange+sort per key serves the lead() window",
      "rel_scd2_asof" -> "SCD2 as-of: custkey equi SMJ with residual interval filter — no nested loop; probe side is a bounded literal-date explode",
      "rel_merge_upsert" -> "MERGE/upsert/delete: one shuffle per side on the merge key, full-outer SMJ, coalesce + tombstone-arm projection, unmatched-tombstone filter — the full CDC apply",
      "rel_scd2_late_splice" -> "SCD2 late splice: one window over base history, anti join excludes rewritten keys, semi-joined affected keys re-windowed — rewrite cost bounded by the late batch's key set",
      "sim_pq_lloyd_chain" -> "PQ-Lloyd chain: three assignment+means rounds, each a broadcast <=128-row codebook join + one (vec,sub) exchange; corpus scan shared via AQE exchange reuse",
      "graph_triangle_sample" -> "DOULION census: hash60 edge coin filters the MATERIALIZED pair set (ExistingRDD — never re-derives the LSH chain); forward algorithm per-edge sorted-adjacency intersection, adjacency broadcast under the 8M-edge bar",
      "graph_pagerank" -> "PageRank: adjacency localCheckpoint'ed once, per-iteration rank checkpoint (lineage truncated — final plan reads ExistingRDD; the 100x rehearsal measured the un-materialized unroll at 88x its 10x cost)",
      "text_span_dedup" -> "span dedup: ONE span-hash exchange carries the shingle stream (window rank picks canonicals — never a self-join); removal explode bounded by dup-span volume; per-doc rebuild aggregate after a left-anti position join",
      "graph_kcore" -> "k-core: checkpointed peel rounds — final plan reads ExistingRDD members, two membership equi joins + one partial-agged degree count; never re-derives earlier rounds or the LSH chain",
      "sim_ivfpq_rerank" -> "two-stage retrieval: the ivfpq ADC chain ranks a 50-candidate shortlist, then shortlist AND query vectors broadcast against the raw vector fetch — exact cosine only on shortlisted ids, final window over <=50 rows/query",
      "rel_skew_audit" -> "skew audit: one partial-agged count exchange on the key, per-bucket local top-k BEFORE the tiny global head rank, broadcast 1-row total",
      "rel_column_profile" -> "column profile: stack-unpivot rides the ONE lineitem scan, two-phase distinct aggregation on (col_name, val), single exchange",
      "layout_compaction_plan" -> "compaction plan: input_file_name is per-row codegen on the partitioned JSONL scan, one partial-agged exchange on source, integer-exact targets",
      "rel_scd2_snapshot_at" -> "SCD2 snapshot-at: interval build's one window exchange, then a plain residual FILTER — no join; at a stored history this is a partition-pruned read",
      "graph_adamic_adar" -> "Adamic-Adar: hub-capped (deg<=64) wedge self-join, decimal weight partials, existing-edge anti join, TakeOrderedAndProject top-50 — no global sort",
      "graph_label_propagation" -> "LPA: checkpointed rounds — final plan reads ExistingRDD labels; per round one label equi-join + self-vote union + partial-agged count + per-node window rank",
      "text_heavy_hitters" -> "heavy hitters: Misra-Gries partial_graft_misra_gries map-side combine (O(cap) exchange), broadcast candidate semi join prunes the token stream, exact confirm count",
      "text_bigram_logprob" -> "bigram LM: bigram+unigram count passes, three token-key equi joins back onto the occurrence stream, broadcast 1-row total, decimal per-doc aggregate",
      "text_char_entropy" -> "char entropy: codegen char explode, two doc_id-partial-agged exchanges, decimal entropy terms, left join totality",
      "dedup_containment_pairs" -> "containment: rarity-ranked prefix explode probes the FULL inverted index (asymmetric bound), size+positional pruning, exact array_intersect verify, post-verify dedup",
      "sim_range_search" -> "range search: the ivf probe chain with a plain tau filter — NO post-scan exchange (top-k pays two-phase rank; radius pays only the scan)",
      "sim_mmr_rerank" -> "MMR: bounded-heap shortlist pass at corpus scale; m-by-m sim matrix and greedy steps checkpointed and shortlist-local — post-shortlist cost independent of corpus size",
      "sim_dim_stats" -> "dim stats: one bounded posexplode + ONE partial-agged exchange on pos, decimal sum/sum-of-squares partials, 64-row output",
      "sim_pca_power" -> "PCA: sampled scan explodes d^2 centered products into a (i,j) partial agg; cov checkpointed once; each matvec a 4096-row join — final plan reads ExistingRDD iterates",
      "rel_scd2_snapshot_diff" -> "snapshot diff: ONE pass — single interval-build window exchange, coverage-flag filter at scan speed, per-key max-of-struct agg rides the window partitioning (no second exchange, no join), churn-bounded output",
      "text_cms_estimate" -> "CMS: d-way explode into a (j,bucket) partial agg — exchange bounded at d*w rows/partition; heavy-hitter probes join the tiny sketch (broadcast), min-over-rows rollup",
      "graph_random_walks" -> "random walks: adjacency localCheckpoint'd once; per step one frontier equi-join + partial-agged struct-min per walk, each step CHECKPOINTED (the output union reads stored frames — step plans were referenced twice and exchange-reuse dedup measured failing under a tight heap)",
      "graph_ppr" -> "PPR: pagerank's checkpointed-iterate shape with a LEFT sum join (orbit nodes only receive mass) and broadcast 1-row seed count; final plan reads ExistingRDD ranks",
      "text_zipf_fit" -> "zipf fit: one partial-agged token count, TakeOrderedAndProject 200-row head (vocabulary never sorts globally), single-partition window+agg over <=200 rows",
      "mm_phash_pairs" -> "phash pairs: codegen char-ngram simhash scan, (mime,block,value) bucket join with leftmost-block dedup — candidates unique by construction, exact bit_count verify",
      "events_top_paths" -> "top paths: ONE user_id exchange serves the sort and both lead()s (single window spec), partial-agged path count, TakeOrderedAndProject top-20",
      "graph_local_clustering" -> "local clustering: the census's forward-algorithm triangle edges (SortedIntersectExpr per oriented edge, broadcast adjacency) consumed ONCE — explode to a row per triangle, then a 3-corner explode + partial-agged count; degrees LEFT-joined for cc=0 totality",
      "graph_clustering_approx" -> "approx clustering: hash60 edge coin (p=1/2) filters the MATERIALIZED pair set, the SAME per-node charge on the kept edges (ExistingRDD — never re-derives the LSH chain), keepMod^3 scale-up, TRUE-degree left join",
      "graph_eigencentrality" -> "eigencentrality: per iteration one adjacency equi-join + decimal agg + broadcast 1-row L1 normalizer; iterates checkpointed — final plan reads ExistingRDD",
      "sim_silhouette" -> "silhouette: O(2^nBits)-row centroid table broadcast against ONE corpus scan; conditional-MIN a/b collapse in a single partial agg; decimal per-bucket means",
      "rel_join_delta_view" -> "IVM join view: all three delta terms join a BROADCAST small side (delta batch / changed dim keys); only shuffles are the signed delta agg + the full-outer apply on the view key — cost ∝ delta + view keys",
      "mm_shot_boundaries" -> "shot boundaries: ONE doc_id exchange serves the frame sort, lag window AND the per-asset aggregate (window partition key == group key); frame fan-out stride-bounded per asset",
      "dedup_funnel" -> "dedup funnel: three layer derivations (fp group-join, LSH band join, containment prefix-filter) reduced to flag sets, one unionAll + first-layer agg + 3-row cumulative window — as scalable as its layers",
      "text_lexical_diversity" -> "lexical diversity: explode -> (doc,token) partial count -> per-doc rollup riding the shared doc_id prefix partitioning; integer moments, one double division per ratio",
      "events_markov_stationary" -> "markov stationary: the ONE user_id window exchange of the transition count; everything after runs on the |types|^2 matrix — broadcast normalizers, checkpointed iterates",
      "sim_graph_ann_topk" -> "graph ANN: per hop one frontier equi-join vs the k-out-degree graph + broadcast-query scoring + per-query window rank; beams checkpointed; candidate volume nQ*beam*(k+1) however big the corpus",
      "sim_knn_descent" -> "NN-descent: two-seed bucket init, per round reverse-cap window + sym/two-hop DISTINCT equi-joins + corpus scoring joins + partial_graft_topk heaps; graph iterate checkpointed — candidate volume O(N*(k+r)^2)/round, never O(N^2)",
      "dedup_lsh_append" -> "incremental LSH: standing index REUSED (no standing x standing join) — new-batch signatures band-join the appended index, new-pair filter, exact verify only on the delta",
      "dedup_editdist_passjoin" -> "PassJoin: pigeonhole segment explode (maxDist+1 per name) equi-joins substring probes on (segment, position band) — no length-band cross join; levenshtein verify only on candidates",
      "sim_hubness_descent" -> "descent-graph hubness: the NN-descent build's bounded rounds, then ONE partial-agged in-degree count + ONE histogram agg; corpus LEFT join keeps the antihub zero bucket",
      "sim_kmeanspp_seeds" -> "k-means||: per round one DECIMAL phi aggregate + one filtered corpus scan (expected-l driver rows) + map-side dmin update vs LITERAL centers — no joins, no shuffles beyond the 1-row aggs; state checkpointed",
      "rel_histogram_quantiles" -> "histogram quantiles: two partial-agged scans (min/max, bin counts) — exchange carries <=nBins rows; cumulative window + percentile cut run on the AGGREGATED frame only",
      "text_dsir_weights" -> "DSIR: two partial-agged token scans build the <=nBuckets log-ratio table, broadcast to the occurrence stream; only data-volume exchange is the per-doc aggregate",
      "text_ccnet_buckets" -> "CCNet buckets: unigram-LM chain + per-lang min/max broadcast + INTEGER bin labels via broadcast tertile cuts — no per-lang global sort; cumulative window over the <=lang*nBins histogram",
      "graph_hits" -> "HITS: oriented edge list checkpointed once (ExistingRDD); per half-step one equi-join + partial DECIMAL agg + 1-row broadcast normalizer; final two left joins onto the degree frame keep edgeless sides at exact 0",
      "graph_modularity" -> "modularity: checkpointed LPA iterates, then one degree join + one two-sided label join on the a<b edge list + two bounded per-community aggs; m is a driver count, not a crossJoin",
      "graph_assortativity" -> "assortativity: two degree equi-joins on the symmetrized adjacency, ONE single-row integer-moments aggregate — no window, no wedge, nothing wider than the edge stream",
      "graph_betweenness" -> "betweenness: 3 forward frontier joins with partial BIGINT sigma sums + per-level anti-join, 2 backward dependency joins over checkpointed layers (ExistingRDD), final bounded DECIMAL agg + left-join totality",
      "text_source_kl" -> "source KL: two grouped explodes (source-term tf, corpus df), broadcast per-source totals + 1-row corpus total, per-term codegen contribution, partial DECIMAL agg to one row per source",
      "events_periodicity" -> "periodicity: partial-agged hourly rollup, broadcast 2-value hour range, sequence() grid explode, lag self-equi-join on (type, hour), single-row integer-moments agg per type",
      "graph_jaccard_neighbors" -> "jaccard neighbors: the adamic_adar hub-capped wedge self-join, two degree joins for the FULL-degree union denominator, existing-edge anti join, TakeOrderedAndProject top-50",
      "sim_bq_recall" -> "BQ recall: broadcast 64-double threshold row, codegen sign-pack to two 32-bit words, XOR+bit_count Hamming scan over 16 B codes, two-phase ASC shortlist rank, exact-dot rerank on <=50 rows/query",
      "sim_matryoshka_recall" -> "matryoshka recall: one broadcast-query corpus scan per prefix width (slice + sequential dot), two-phase rank each, per-(q,dim) bounded agg — shorter prefixes read proportionally fewer bytes in a chunked layout",
      "events_ewma_anomaly" -> "EWMA: hour-grain agg exchange, checkpointed tiny hourly frame self-joined with BOUNDED <=24-predecessor fan-out, DECIMAL weight partials, top-20 TakeOrderedAndProject",
      "events_interarrival" -> "interarrival: ONE user-free per-type exchange serves the lag window, rank window at (type, gap) grain, bounded rollup with nearest-rank conditional picks",
      "text_pmi_bigrams" -> "PMI: bigram+unigram partial-agged count passes, min-count floor BEFORE the score joins (bounded pair set), broadcast 1-row totals, TakeOrderedAndProject top-50",
      "rel_table_checksum" -> "table checksum: three independent scans, per-row codegen hash, single-row DECIMAL partial-agg sums — ZERO data-row shuffles; row order/partitioning invisible by commutativity",
      "rel_fk_audit" -> "fk audit: five key-only projections left-join broadcast DISTINCT parent key sets, single-row conditional aggs — no fact data column ever moves",
      "text_heaps_fit" -> "heaps fit: two partial-agged first-touch exchanges (per-doc tokens, min-doc types) reduce to <=65 range buckets; cumulative window + LS fit run on the bounded bucket frame only",
      "text_ngram_novelty" -> "ngram novelty: doc-distinct gram explode, gram-keyed min(doc_id) partial agg, equi-join back, per-doc rollup + left-join totality — nothing wider than the gram stream",
      "events_session_stats" -> "session stats: ONE user_id exchange serves the lag flag window, the running-sid window AND the per-session rollup; size-grain final agg bounded by max session length",
      "graph_coreness" -> "coreness: checkpointed h-index rounds (ExistingRDD iterates) — per round one adjacency equi-join + map-side-combined (node, value) counts + cumulative window over the collapsed value frame (r17: replaced the per-row rank window, 2.2x at 10x); exact integers end to end",
      "text_dedup_impact" -> "dedup impact: fingerprint exchange + semi join, two partial-agged token counts, broadcast 1-row totals, DECIMAL KL partials to a single row",
      "graph_rich_club" -> "rich club: degrees checkpointed once; per threshold two filtered membership joins on the edge list + two single-row counts — |ks| bounded passes",
      "sim_ivf_bq_topk" -> "IVF-BQ: broadcast threshold row + probe set + query codes against ONE bucket-pruned code scan; XOR+bit_count in codegen; two-phase ASC shortlist; exact dot only on <=50 rows/query",
      "graph_hyperball" -> "hyperball: adjacency checkpointed once; per hop ONE PACKED-register equi-join + map-side-combinable graft_reg_max over the 64-byte blob (one row per node — r16: 64x fewer exchange rows than the logical (node,reg,mj) frame), iterates checkpointed (ExistingRDD); per-hop estimates read the blob via graft_reg_summary into the same bounded DECIMAL aggs; curve windows run on 5 rows",
      "graph_harmonic" -> "harmonic: 3 per-seed frontier DISTINCT equi-joins + per-level anti-joins over checkpointed layers (the betweenness forward sweep minus sigma); per-layer literal 1/h partials in DECIMAL, one bounded agg, left-join totality",
      "sim_ivf_probe_curve" -> "probe curve: corpus bucketed + checkpointed ONCE; per radius one probe-pruned scan (checkpointed) feeds BOTH the candidate count and the two-phase rank; exact baseline = one partial_graft_topk heap pass, run once",
      "mm_phash_clusters" -> "phash clusters: the banded phash pair join (leftmost-block dedup) + frontier min-propagation CC over checkpointed labels, then two bounded rollup aggregates — nothing wider than the pair set",
      "text_token_fertility" -> "token fertility: one codegen projection + ONE partial-agged source exchange (<=|sources| rows); exact BIGINT totals, three rounded divisions",
      "dedup_lsh_tuning" -> "LSH tuning: 16-perm signature table checkpointed ONCE; per banding one leftmost-band-deduped equi-join (candidates unique by construction); exact jaccard verify ONLY on the finest (8,2) truth pass — size-band prefiltered (lossless: J <= min/max sizes) and chunked into sequential hash-disjoint passes above 150M pairs; coarser configs probe the checkpointed truth with left-semi joins",
      "sim_ivfpq_probe_curve" -> "IVF-PQ probe curve: codes/buckets/LUT built once (checkpointed, LUT broadcast); per radius ONE code-only scan pruned by the broadcast probe set + a (q,vec) DECIMAL partial agg (checkpointed — count and rank share it); exact float baseline runs once",
      "events_burstiness" -> "burstiness: ONE event_type window exchange serves the lag; partial-agged integer/decimal moment rollup to |types| rows; mu/sigma/ratios computed once per row at the output",
      "graph_closeness_sketch" -> "closeness sketch: the hyperball PACKED-register rounds (checkpointed, ExistingRDD iterates — one 64-byte blob per node through every hop exchange); per hop one bounded per-node estimate agg off graft_reg_summary; a |V|-row 5-way node equi-join closes the telescoped sum — no per-pair state anywhere",
      "text_langid_ngram" -> "langid: trained rank-profile model is an ExistingRDD (checkpointed O(langs*300) rows) BROADCAST into the langs cross join and the rank lookup; doc profiles via the tfidf explode->partial-count->rank-window shape; one (doc_id,lang) partial agg + one bounded sort_array argmin agg — every exchange doc_id-keyed, constant rows per doc",
      "text_langid_mix" -> "langid mix: the full langid scoring plan rolled to <= sources*langs rows in ONE partial-agged exchange + a window over the tiny rollup",
      "text_langid_confusion" -> "langid confusion: the scoring plan rolled to <= langs^2 cells + two windows over the tiny rollup (row share = recall, column share = precision on the diagonal)",
      "text_vocab_coverage" -> "vocab coverage: ONE token-keyed partial-agged count exchange, TakeOrderedAndProject bounds the global ranking at the 16k head, per-budget sums over the checkpointed head",
      "text_bpe_merges" -> "bpe trainer: final merge table is a local relation built from 32 driver-policy argmax collects (one TakeOrderedAndProject row per round over the checkpointed word-TYPE frame); the corpus is touched once (token-count exchange), every round is type-table-sized",
      "text_source_nb" -> "source NB: integer micro-nat model (priors + per-(class,token) counts) checkpointed and BROADCAST into the scoring fan-out; one (doc,token) partial-agged exchange, one (doc,class) partial-agged integer sum, bounded sort_array argmax — no doubles cross an exchange",
      "sim_ivf_append" -> "ivf append: standing-only centroid table (bounded posexplode agg) BROADCAST into the batch assignment (BuildRight nested-loop over 256 centroids, k=1 heap argmax); merged post-append means are one more bounded agg; standing x standing never joined",
      "sim_pq_append" -> "pq append: both trained codebooks are <=128-row bounded aggs, BROADCAST (BuildRight) into the two batch encodes (k=1 heap argmin per (vector, subspace)); the report is a join of four <=8-row aggregates; standing x standing never joined",
      "sim_index_roundtrip" -> "index roundtrip: both LOADED artifacts are parquet Scans of KB-sized single files, BROADCAST (BuildRight) into the batch serve — the append plans' shape with storage in place of the in-plan trainer; vec_id-keyed join unifies coarse+fine rows",
      "dedup_index_roundtrip" -> "lsh index roundtrip: the standing probe side is a parquet Scan of the persisted feature frame (no text re-read, no signature re-derivation) band-key equi-joined by the arriving batch; first-shared-band filter rides the join, exact verify on candidates only",
      "text_model_roundtrip" -> "text model roundtrip: three LOADED bounded models ride as plan constants inside the router kernels (LangIdScoreExpr/NbScoreExpr/BpeCountExpr) — the holdout serve is ONE stateless projection over the doc scan, zero joins, zero shuffles",
      "sim_knn_descent_sq8" -> "sq8 descent: rounds join candidates against the checkpointed (vec_id, array<tinyint>) CODE frame (~6x narrower exchange than the raw vectors), graft_sq8_cosine fuses decode+cosine in one whole-stage-codegen loop, exact rescore only touches the final O(N*k) survivors")
    val sb = new StringBuilder
    sb.append("# PLANS — physical-plan audit of the headline queries\n\n")
    sb.append("Generated from `queryExecution.explainString(FormattedMode)` at sf0.001\n")
    sb.append("(plan SHAPE is scale-invariant; AQE may further coalesce at runtime).\n")
    sb.append("Regenerate: see tools/ (devcheck.Plans in the verify-skill dev loop).\n")
    for ((name, note) <- queries) {
      val df = graft.SparkEntry.queries(name)(spark, "/root/testdata/sf0.001")
      sb.append(s"\n## $name\n\n$note\n\n```\n")
      sb.append(df.queryExecution.explainString(ExplainMode.fromString("formatted")).take(6000))
      sb.append("\n```\n")
    }
    // funnel: FormattedMode cannot show AQE stage reuse, so record the
    // post-execution plan (final section only)
    val fdf = graft.SparkEntry.queries("events_funnel")(spark, "/root/testdata/sf0.001")
    fdf.collect()
    val fplan = fdf.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0).trim
    sb.append("\n## events_funnel\n\neach stage computed EXACTLY once: branch k's count rides the same\nsubtree stage k+1 joins against (count(stage_ms) keeps min() un-pruned\nso the subtrees canonicalize equal); 3 FileScans for 3 stages, 2\nReusedExchanges (executed AQE plan — FormattedMode can't show stage\nreuse, so this section records the post-execution plan)\n\n```\n")
    sb.append(fplan)
    sb.append("\n```\n")
    Files.writeString(Paths.get("/root/repo/docs/PLANS.md"), sb.toString)
    println("WROTE docs/PLANS.md chars=" + sb.length)
    spark.stop()
  }
}
