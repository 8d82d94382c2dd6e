package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession

/** Writes PLANS.md: formatted physical plans of representative
  * queries — the evidence behind SURVEY.md §5's scale claims.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    val picks = Seq(
      "q1_agg" -> "partial aggregation (map-side combine) + pruned scan",
      "q5_multijoin" -> "star join: all dimensions broadcast",
      "q6_filter_agg" -> "all predicates pushed to the parquet scan",
      "w6_utci" -> "thermal chain: one scan, zero pre-sort shuffles",
      "q12_range_join" -> "band join via bucketed equality join",
      "q13_asof_custom" -> "custom as-of operator: exchanges/sorts inserted by EnsureRequirements",
      "q36_asof_nearest" -> "nearest as-of: one union, one key exchange shared by the backward and forward window passes",
      "q14_range_custom" -> "custom interval operator: co-partitioned sliding merge",
      "d2_minhash_lsh" -> "MinHash/LSH: bucket joins + inverted-index verification",
      "v1_knn_brute" -> "broadcast-codebook scoring + bounded rank",
      "q19_scalar_subquery" -> "correlated scalar subquery decorrelated to one window shuffle",
      "q21_range_frame" -> "RANGE-frame window: single shuffle on the partition key",
      "q22_grouping_sets" -> "grouping sets: one Expand + partial/final hash aggregate",
      "t10_decontam" -> "decontamination: gram-equality join, no doc-pair blowup",
      "t11_lm_score" -> "bigram LM: distributed count tables joined back by gram",
      "t30_perplexity_bins" -> "perplexity bins: distributed LM joins + one doc-grain aggregate + 256-row histogram + 1-row threshold broadcasts",
      "v5_pq_adc" -> "PQ: codes-only corpus scan + broadcast ADC tables",
      "e6_anomaly" -> "z-score: window moments, one shuffle, no self-join",
      "v6_sq_int8" -> "SQ: integer-dot scoring over the quantized corpus stream",
      "e8_ewma" -> "recursive per-key scan: one key shuffle + typed fold",
      "w17_heat_wind" -> "heat index / wind chill: pure narrow map on the chain",
      "t12_source_cap" -> "per-source quota: one shuffle, bounded rank",
      "t9_pack" -> "three-level prefix sum: bounded windows only, no single-partition exchange",
      "d8_embed_lsh" -> "LSH near-dup: id-only bucket joins + candidate-only verify",
      "d9_semantic_dedup" -> "semantic dedup: broadcast-codebook assignment + bounded survivor window",
      "w18_chart_raster" -> "chart raster: w12's one (cell, lday) shuffle + narrow band map + wrap union",
      "t14_tfidf" -> "TF-IDF: tf + pruned df aggregates, term join back, WindowGroupLimit bounds the rank",
      "v7_range_search" -> "range search: broadcast queries, one corpus pass, filter — no window, no shuffle",
      "v8_mmr_rerank" -> "MMR: top-pool window prune, then bounded per-query greedy (no cross-query state)",
      "t15_mixture" -> "mixture resampling: narrow map + bounded explode, zero shuffles",
      "p2_zorder" -> "z-order audit: narrow morton map + one aggregate shuffle",
      "q24_gap_islands" -> "gaps-and-islands: window and aggregate share one user_id shuffle",
      "d10_cross_decontam" -> "fuzzy decontam: broadcast eval bands, train side never shuffles for candidates",
      "w19_grid_smooth" -> "3x3 stencil as key arithmetic: bounded explode + one cell-key shuffle",
      "q25_rolling_distinct" -> "rolling distinct: bounded window-end explode + one distinct-count aggregate",
      "p3_incremental_stats" -> "incremental maintenance: two partials merge in one outer join, no history rescan",
      "t16_bm25" -> "BM25: tf and df from one index subtree, broadcast query terms, bounded top-k",
      "q26_interval_overlap" -> "interval sweep: (day, hour-bucket) local scans + tiny day-keyed offset carry — no day-global point window",
      "d11_line_dedup" -> "line dedup: dup aggregate and join keyed on fnv64 digests; strings shuffle only for reassembly",
      "d22_cdc_chunks" -> "CDC chunks: narrow window-hash chunker, (digest, length) distinct-mass aggregate, two 1-row stats crossed",
      "d12_substr_dedup" -> "substring dedup: gram digests through the dup aggregate, per-doc bounded span merge",
      "m6_phash_neardup" -> "pHash near-dup: 5-block pigeonhole bucket join, id-only payloads, bit_count verify",
      "p4_snapshot_diff" -> "snapshot diff: one full-outer pk join, row-local change classification",
      "w21_heat_episodes" -> "heat episodes: gaps-and-islands window and aggregate share one cell-key shuffle",
      "p5_corpus_funnel" -> "corpus funnel: gate flags on one narrow map, conditional-min dedup window, gram join, single-row report",
      "q27_hierarchy" -> "recursive-CTE semantics by pointer jumping: log2(depth) equality self-join rounds (final round's plan shown)",
      "v9_ivf_pq" -> "IVF-PQ: one narrow assign+encode pass, broadcast probe/ADC tables, bounded two-level rank",
      "q28_unpivot" -> "unpivot: Expand fan-out is row-local — no shuffle beyond the wide aggregate",
      "q29_analytic_funcs" -> "four analytic functions share one window shuffle and one sort",
      "p6_merge_upsert" -> "MERGE: one full-outer pk join, clause arithmetic row-local",
      "d13_neardup_apply" -> "composed near-dup apply: capped band buckets feed components; labels plan shown (final round)",
      "v10_hybrid_rrf" -> "hybrid RRF: both arms' bounded top-20 fused by one tiny full-outer join — fusion cost independent of corpus size",
      "t17_bpe_learn" -> "batched BPE: vocab-sized pair aggregate per round, bounded candidate collect, merges applied in one narrow map (final round's plan)",
      "m8_scene_split" -> "scene split: one doc-key shuffle shared by the lag/scene windows and the per-scene aggregate",
      "v11_ann_recall" -> "ANN recall: two k-bounded arm outputs joined — evaluation cost independent of corpus size",
      "e11_pattern_runs" -> "row-pattern runs: lag + break-sum islands + per-run aggregate on one user-key shuffle",
      "w22_regrid_bilinear" -> "bilinear regrid: corner-key explode + one equality join on the cell key, integer-weight blend",
      "g1_pagerank" -> "integer PageRank: per-round edges-rank equality join + dst partial aggregate (final round's plan)",
      "v12_silhouette" -> "silhouette: broadcast centroids, one narrow corpus scan, one cid aggregate of pre-quantized integers",
      "d14_incremental_dedup" -> "incremental dedup: broadcast-bloom narrow prefilter, exact verify semi-join probes candidates only",
      "g2_hits" -> "integer HITS: per-half-step edges-state equality join + partial aggregate, 1-row norm broadcast (final round's plan)",
      "p7_compaction" -> "compaction plan: one inventory shuffle on the partition key, in-partition window prefix sum + manifest aggregate",
      "t20_importance_weights" -> "DSIR weights: fixed-size hashed-feature tables broadcast, per-doc aggregate, 1-row threshold broadcast",
      "v13_centroid_drift" -> "drift monitor: broadcast centroids, one narrow both-halves assignment pass, (cid,half) aggregate + k-row stitch",
      "d15_soft_dedup" -> "soft dedup: d13's component labels left-join the corpus id set, one root-key mass aggregate",
      "q30_exact_median" -> "exact median/mode: value-histogram aggregate below the window — order statistics over distinct values, not raw rows",
      "g3_triangles" -> "triangles: degree-ordered orientation, two equality wedge joins, positional corner union",
      "t21_quality_filters" -> "Gopher/C4 gates: pure narrow map, integerized rules, zero shuffles",
      "v14_pq_refine" -> "PQ refine: ADC shortlist via two-level rank, vector fetch by equality join, exact re-rank bounded",
      "p8_table_stats" -> "column stats: one scan, (col,value) explode, count-only codegen level 1, tiny typed-recovery level 2",
      "e12_attribution" -> "last-touch attribution: forward-fill groups + equality join sharing the user-key hash — no inequality as-of pair blow-up",
      "q31_hll_distinct" -> "HLL sketch: narrow hash+rank map, 1024-row register aggregate (map-side partial max), 1-row estimate",
      "q32_cms_heavy" -> "CMS sketch: 4-way posexplode, 2048-cell aggregate (map-side partial sum), broadcast probe of the top-10 audit",
      "t22_stratified_sample" -> "stratified sample: two-level salted rank with WindowGroupLimit pushdown, one scan",
      "t23_weighted_sample" -> "A-ES weighted sample: narrow integerized-key map, TakeOrderedAndProject bounded top-k",
      "q33_skyline" -> "2-D skyline: price-grain aggregate + hierarchical strict prefix-min — single-partition work on aggregate grain only",
      "q34_quantile_hist" -> "histogram quantile sketch: one scan, 256-row aggregate, struct-argmin location (no join-back rescan)",
      "e13_conversion_lag" -> "conversion lag: two conditional-min windows + aggregate on one shared user-key exchange",
      "g4_components" -> "connected components: stars contraction round (two groupBy-min shuffles + distinct), labels joined back by id (final round's plan)",
      "v15_binary_hamming" -> "binary ANN: codegen bit_count hamming over broadcast query signatures, salted shortlist, equality-join vector fetch for rerank",
      "t24_hash_embed" -> "hashing trick: explode + codegen FNV narrow map, one (doc,dim) map-side-combined shuffle",
      "t31_nfc_normalize" -> "NFC canonicalization: native codegen expression, one scan, zero data exchanges",
      "q37_twap" -> "TWAP: one user-key exchange shared by lead window and aggregate",
      "dq4_control_chart" -> "p-chart: day-grain map-side-combined aggregate + 1-row total broadcast",
      "p14_bloom_skipping" -> "bloom sidecar: (file,lane) bit_or aggregate + probe-lane joins",
      "g15_stress" -> "stress centrality: id-keyed per-round joins, (pivot,node)-grain state",
      "e19_markov" -> "markov: one window pass builds the metadata matrix; 12 micro-round joins",
      "d16_url_dedup" -> "URL dedup: narrow canonicalization, dedup exchange keyed on the fnv64 digest",
      "p9_optout_purge" -> "opt-out purge: broadcast registry flag join + type-bounded audit aggregate, one corpus scan",
      "m9_audio_fingerprint" -> "audio landmarks: frame/peak/landmark windows on one doc-key shuffle, capped fp equality self-join",
      "d17_containment" -> "containment: inverted-index intersection counts — shingle arrays never shuffle, division-only delta vs Jaccard",
      "w23_degree_days" -> "degree days: one cell-grain quantized-sum aggregate over w12's daily shuffle",
      "p10_ivm_join" -> "IVM join: stored view streams into the union; only the delta joins the dimension",
      "w24_wind_rose" -> "wind rose: narrow quantized-atan2 map + one 16-row map-side-combined aggregate",
      "d18_containment_dedup" -> "containment dedup: rarest-first prefix probe joins the capped inverted index; verification touches candidate pairs only",
      "m10_jpeg_roundtrip" -> "JPEG roundtrip: one narrow codec stage, zero shuffles — bounded-error contract over real lossy decode",
      "v16_knn_graph" -> "kNN graph: id-only capped bucket self-join, vectors attach by pk at scoring, two-level per-source rank",
      "g6_label_communities" -> "LPA communities: per-round edges-labels equality join + map-side vote count + struct-min argmax (final round's plan)",
      "v17_semdedup" -> "SemDeDup pruning: capped bucket self-join edges, components over dup-pair nodes only, one id join back (final round's plan)",
      "g7_kcore" -> "k-core peel: per-sweep degree aggregate + survivor left-join + two id-only semi-joins over checkpointed state (final sweep's plan)",
      "g8_ppr" -> "personalized PageRank: g1's edges-rank equality join + dst partial aggregate, seed teleport as pure key arithmetic (final round's plan)",
      "t25_cooc_lift" -> "co-occurrence lift: narrow in-window pair transform (no positional self-join), one pair aggregate, vocab-sized unigram joins, 1-row N broadcast",
      "v18_filtered_knn" -> "filtered kNN: label predicate pre-filters scoring against the broadcast query codebook, corpus streams once, two-level bounded rank",
      "g9_bfs_depth" -> "BFS depth: per-round frontier equality join + dst min-aggregate + least-fold on the node key (final round's plan)",
      "d19_boilerplate" -> "boilerplate removal: digest-led (source,line) frequency aggregate, source-grain ratio join, one doc-key reassembly shuffle",
      "m11_patch_extract" -> "patch extraction: one narrow codec stage, row-local 16-patch fan-out, zero shuffles",
      "g10_hyperball" -> "HyperBall: per-round edges-registers equality join + (node,reg) max-merge aggregate, n-row estimate tables joined by node key",
      "g14_anf" -> "ANF: one 1-row aggregate over the HyperBall ball table + row-local 4-row unpivot",
      "v19_recall_sweep" -> "IVF sweep: candidates scored once with their min probe level, 4-row grid expansion, one (nprobe,qid) two-level rank",
      "e15_rfm" -> "RFM: user-grain aggregate + sketch-threshold quintiles (axis-partitioned histogram windows, 1-row threshold broadcast) — no unpartitioned window",
      "d20_threshold_sweep" -> "dedup sweep: pairs scored once via inverted-index joins, 5-row tau grid expands row-local, one (tau,grade) aggregate",
      "g11_assortativity" -> "assortativity: distinct edges + degree joins, one 4-sum global aggregate — exact integers, single final division",
      "g12_link_prediction" -> "link prediction: capped-adjacency wedge self-join, anti-join on edges, degree joins on candidate grain, bounded top-100 take",
      "w25_heat_blobs" -> "heat blobs: w12's daily shuffle + hot-cell aggregate, arithmetic neighbor-key self-join, stars-contraction labels joined back (final round's plan)",
      "d21_dedup_audit" -> "dedup audit: cluster aggregate over d13's checkpointed labels, size-grain histogram, 1-row singleton stitch (final labels plan)",
      "t26_readability" -> "readability: pure narrow map — regex counts + fixed formulas in one codegen stage, zero shuffles",
      "e16_burstiness" -> "burstiness: lag window and moment aggregate share one user-key exchange, single final division",
      "p12_data_skipping" -> "data skipping: one scan per audited layout, file-grain map-side-combined aggregate, bounded report",
      "q35_hll_setops" -> "HLL set ops: one tagged scan feeds both register tables, union by max-merge (no rescan), one distinct for the exact audit",
      "m12_audio_vad" -> "audio VAD: batched decode fan-out, islands window and segment aggregate share one doc-key shuffle",
      "m13_mjpeg_scenes" -> "MJPEG scenes: two narrow codec stages (container build / parse + real per-frame JPEG decode), one doc-key shuffle for windows + aggregate",
      "m14_png_meta" -> "PNG meta: one narrow chunk-walk mapPartitions stage, zero shuffles",
      "dq2_psi_drift" -> "PSI drift: one scan, row-local struct explode, 60-row histogram aggregate, decimal term algebra",
      "dq3_benford" -> "Benford audit: per-table scans, (column, digit) map-side aggregate, metadata totals join",
      "t27_zipf_audit" -> "Zipf audit: one explode + term aggregate, vocab-grain rank window, 1-row fit + broadcast totals",
      "v20_mips" -> "MIPS: broadcast query codebook over the weighted corpus stream, quantized raw dot, two-level bounded rank",
      "v21_graph_ann" -> "graph ANN: best-first beam over the undirected kNN graph — frontier-graph equality joins on node ids, bounded visited set, vectors attach by pk",
      "v22_beam_profile" -> "beam profile: one search, per-hop checkpointed states read as 1-row stat aggregates, 7-row curve",
      "e17_seasonality" -> "seasonality: epoch-arithmetic hour key, one 24-row map-side-combined aggregate, 1-row broadcast totals",
      "g13_reciprocity" -> "reciprocity: distinct directed edges, id-only swapped-key semi-join, 1-row report",
      "p13_quarantine" -> "quarantine: narrow corruption/flag maps, one equality FK join, 4-row routing audit",
      "w26_temp_anomaly" -> "temperature anomaly: normals window rides w12's cell-key shuffle — no extra exchange",
      "w27_blob_tracks" -> "blob tracks: (box, day)-grain arithmetic-key graph (spatial wrap + temporal successor), stars-contraction labels, track aggregate",
      "t28_langid_confusion" -> "lang-ID confusion: t3's narrow scoring map, one (true, predicted) aggregate, totals join",
      "t29_trigram_langid" -> "trigram NB lang-ID: broadcast profile join over a narrow trigram explode, one doc-grain aggregate, langs^2 matrix",
    )
    val sb = new StringBuilder
    sb.append("# PLANS — formatted physical plans (generated by graft.PlanDump at sf0.001)\n")
    picks.foreach { case (name, why) =>
      val df = SparkEntry.queries(name)(spark, dir)
      df.collect()
      val p = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        .split("== Initial Plan ==")(0)
      sb.append(s"\n## $name — $why\n\n```\n$p```\n")
    }
    Files.write(Paths.get("/root/repo/PLANS.md"), sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println("PLANS.md written")
    spark.stop()
  }
}
