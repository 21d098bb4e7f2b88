package graft

import org.apache.spark.sql.SparkSession

/** Plan-quality audit: prints formatted physical plans for representative
  * queries so pushdown (PushedFilters/ReadSchema), broadcast choices, and
  * WholeStageCodegen spans can be inspected. Run:
  *   sbt "runMain graft.ExplainAudit [queryName ...]"
  */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq else defaultNames
    names.foreach { n =>
      println(s"\n########## $n ##########")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }

  /** The audited set — every re-planned or plan-sensitive query accumulated
    * across rounds. PlanGuardSpec asserts forbidden fragments over this SAME
    * list, so additions here are automatically guarded in CI. */
  val defaultNames: Seq[String] =
    Seq("q01_pricing_summary", "q02_revenue_by_nation",
        "q06_forecast_revenue", "q11_top3_orders_per_customer",
        "fz01_fuzzy_part_lookup", "fz02_fuzzy_subspan_titles",
        "dd03_minhash_pairs", "dd04_simhash_pairs",
        "dd05_ngram_jaccard_pairs", "ann02_knn_lsh", "en01_entity_mentions",
        "dd06_dedup_clusters", "dc01_decontaminate", "pp02_temperature_mix",
        "ck01_chunk_documents", "pk01_sequence_packing",
        // round-7 additions: portable IVF, LSH near-dup, sharded packing,
        // DSL pipeline (broadcast + shaped join), video demux explode
        "ann04_knn_ivf", "ann05_neardup_lsh",
        "pk02_sequence_packing_sharded", "md01_model_pipeline",
        "mm04_video_frames", "dd07_incremental_dedup",
        "dd08_incremental_dedup_bloom", "lb01_length_batches",
        // late-round-7 additions: broadcast anti-join boilerplate removal,
        // digest-only substring dedup, z-bucket agg, broadcast centroid
        // cross + windowed argmin
        "bl01_boilerplate_lines", "sd01_substring_dedup",
        "zo01_zorder_layout", "em01_centroid_confusion",
        // round-7 temporal/graph/quantization tier: bucketed range join,
        // integer PageRank (join+agg per round), int8 ANN, SQL rollup
        "rj01_range_join", "gr01_pagerank", "ann06_knn_int8",
        "cu01_rollup_revenue",
        // analytics/retrieval tier: chained user-key funnel aggregates,
        // three-shuffle retention matrix, broadcast-query BM25 join
        "fu01_funnel_steps", "rt01_retention_cohorts", "bm01_bm25_topk",
        // round-8 tier: cluster-bucketed SemDeDup pair join, DSIR
        // model-broadcast scoring + k-bounded Gumbel top-k, domain-cap
        // window, host-equi broadcast robots match
        "dd11_semantic_dedup", "ds02_dsir_weights", "ds03_dsir_resample",
        "dm01_domain_cap", "cr02_robots_filter", "ts08_char_entropy",
        "bp03_tokenize_ids", "dd12_incremental_neardup",
        "pp06_anneal_schedule", "hx01_html_strip",
        "dc02_exact_contamination", "pp07_curation_v2",
        // round-9 tier: degree-ordered wedge join, wrong-label ANN,
        // double-window MAD, zone-map block aggregate, memoized WordPiece
        // join, bounded-frame EWMA
        "gr03_triangle_stats", "hn01_hard_negatives", "az02_mad_outliers",
        "zm01_zonemap_skipping", "wp01_wordpiece_segment",
        "ew01_ewma_values",
        // round-9 second wave: full-outer diff, moment regression,
        // gram-count window, pigeonhole media pairs, incremental CC
        "df01_snapshot_diff", "lr02_linear_fit2", "kw01_rake_keywords",
        "mr01_memorization_risk", "mm07_image_neardup",
        "dd14_incremental_components",
        // round-10 tier: vote-argmax LPA round, bucketed
        // sorted-neighborhood pair join, CUSUM single-sort window stack,
        // lag-7 self-join backtest, reverse-cumulative KM risk set
        "lp01_label_propagation", "rl01_sorted_neighborhood",
        "cs01_cusum_drift", "fc01_seasonal_backtest", "km01_survival",
        "ab01_welch_ttest", "ka01_k_anonymity", "pk03_packing_bfd",
        "er01_entity_resolution", "tl01_timetravel_labels",
        "bd01_benford_digits", "sr01_orc_roundtrip",
        "mv02_incremental_join", "mv03_incremental_join_deletes",
        "ks01_ks_statistic", "wd01_window_distinct",
        "ca01_contribution_analysis", "bm02_boolean_and",
        "ab02_randomization_test",
        // driver-round-9 tier: JSON-model compiled report + legend pivot,
        // archive-parallel zip extract readback, signed agg-view fold,
        // bisect group quantiles with its type-preserving join-back
        "bi01_workspace_report", "bi02_workspace_legend",
        "cr03_zip_ingest", "mv04_incremental_agg_deletes",
        "qd02_group_quantiles_bisect",
        // memoized-lookup tier: distinct-query pipeline + value stitch,
        // weighted predict window; the linear-attribution range join
        "fz04_fuzzy_multi_lookup", "fz06_fuzzy_predict_lookup",
        "at02_linear_attribution",
        // driver-round-10 tier: HLL register fold + merge series, tiled
        // two-sided overlap join, sharded quantile-normalize index,
        // prefix-sharded neighborhood rank, staged hilbert walk,
        // compaction rewrite readback, merged-schema read, rank-weighted
        // gini, lag-join ACF, U-shaped attribution
        "hl01_hll_distinct", "hl02_hll_users_to_date",
        "io01_interval_overlap", "qn01_quantile_normalize",
        "zo02_hilbert_layout", "cmp01_compact_small_files",
        "sr02_schema_evolution", "gn01_gini_concentration",
        "ac01_autocorrelation", "at03_position_attribution",
        "ab03_mann_whitney", "ka02_recursive_ldiversity",
        // second wave: journey-chain counting (the solve is driver-side
        // by design), pair-slope median, four-cell panel, CUPED pooled
        // moments, copy-on-write surgery readbacks, streamed agg view
        "at04_markov_attribution", "th01_theilsen_trend",
        "did01_diff_in_diff", "ab04_cuped", "cow01_delete_rewrite",
        "cow02_merge_upsert", "sm13_stream_agg_view",
        // round-11 tier (conversation round 10): sharded-ntile RFM,
        // basket pair rules, as-of-shaped matched pairs, sign-sum AMS,
        // quantized-TVD privacy, window-only RRF, frontier BFS +
        // min-plus Bellman-Ford rounds, all-pairs vote triage, priority
        // sample, native unpivot/grouping-sets, Bloom-pruned join,
        // Hive-partition-pruned scan, regex-count readability
        "rfm01_rfm_segments", "ar01_association_rules",
        "psm01_matched_att", "am01_ams_f2", "ka03_t_closeness",
        "rrf01_rank_fusion", "gr06_bfs_distances", "gr07_bellman_ford",
        "ln01_knn_disagreement", "wsp01_weighted_sample", "up01_unpivot",
        "cu04_grouping_sets", "bj01_bloom_join", "pt01_partition_pruning",
        "ts09_readability",
        // round-12 tier: sharded-ntile gains table with triangular
        // cumulative rollup, per-feature prefix-sum split search,
        // delta-local top-k view maintenance (broadcast semi/anti on the
        // touched-group set), window-bounded funnel joins, capped wedge
        // self-join link prediction, HITS join+agg rounds,
        // calibration bucket rollup
        "lift01_cumulative_gains", "dt01_best_split",
        "mv05_incremental_topk", "fu02_window_funnel",
        "jp01_jaccard_linkpred", "hits01_hubs_authorities",
        "cal01_calibration_report",
        // mergeable decimal quantile sketch: one bucket aggregate, the
        // post-agg bucket-table window, broadcast rank theta-join
        "qs01_quantile_sketch", "qs02_sketch_merge",
        "qs03_group_quantile_sketch",
        // round-13 tier: sharded global rank/ntile (the last data-sized
        // global windows removed), one-pass multi-lookup via the array
        // machinery, delta-peeled kCore, integer-DP unigram serving,
        // pigeonhole audio near-dup
        "q13_supplier_balance_rank", "q14_order_quartiles",
        "gr05_kcore", "ug02_unigram_segment", "mm08_audio_neardup",
        // round-14 tier: Mann-Whitney per-value prefix count resharded
        // (the last data-sized unpartitioned window removed)
        "ab03_mann_whitney",
        // round-15 tier: the four re-planned global windows (sharded
        // ntile with nulls-last, sharded packer, sharded prefix-min
        // skyline), the run-log sink readback, the structural tree gate
        "cq01_quality_buckets", "tr03_rank_split",
        "pp03_preprocess_pipeline", "sl01_skyline_orders",
        "md02_run_log", "tp03_tree_roundtrip")
}
