"""Result invariance under physical re-configuration — SURVEY.md §5's
generalization of the reference's combiner-on/off A/B test: the partition
count is a pure performance knob, so results must be bit-identical at any
``spark.sql.shuffle.partitions`` (decimal float aggregates make this true
even for sums — see functions/numeric.py).
"""

from __future__ import annotations

import pytest

from cooler_mapreduce_spark.registry import load_all

SPECS = load_all()

#: Representative wide-plan queries: shuffle agg, multi-join, LSH dedup
#: pipeline, salted two-stage agg, window rank.
CASES = [
    "pricing_summary",
    "revenue_by_nation",
    "word_count",
    "dedup_minhash_lsh",
    "skew_salted_event_stats",
    "window_top_orders_per_customer",
    "stat_corr_qty_price",
    "market_share_q8",
    # iterative: 5 chained join+agg rounds — quantized contribution sums
    # must hold bit-identical through every round's shuffle
    "pagerank_supplier_customer",
    # retrieval: floor-quantized cross-term score sums
    "bm25_topk",
    # window-threshold equality filters: the kept row set depends on a
    # per-group extreme (window MIN cost / window decimal-sum dominance)
    # — exactly the comparisons that would drift if aggregation order
    # leaked into the values
    "min_cost_supplier_q2",
    "potential_promotion_q20",
    # sketch build+probe: every cell count and min must be identical at
    # any partition count; out-of-fold encoding: subtraction of two
    # decimal-staged sums
    "cms_heavy_hitters",
    "kfold_target_encoding",
    # iterative argmax sequence: every learned rule must be identical at
    # any partition count (total-order tie-break)
    "bpe_train_merges",
    # iterative argmin/re-mean: literal centroids + decimal-staged means
    "kmeans_embedding_clusters",
    # round-6: co-moment sums from decimal components (not corr()), the
    # floor-quantized running CUSUM, the 2^-20-quantized TWA terms, the
    # power-iteration matrix-vector products, and the A-ES top-k whose
    # selection order must not depend on partitioning
    "autocorr_daily_revenue",
    "cusum_changepoint_revenue",
    "time_weighted_avg_value",
    "pca_power_embeddings",
    "weighted_sample_wor_orders",
    # round-6 second half: the sequential Holt fold (one HOF pass whose
    # input array order comes from array_sort, never from partitioning),
    # the prefix-filter candidate set (df-ordering ties broken by
    # shingle text — candidates must not depend on partition layout),
    # and the synchronous LPA argmax (count DESC, label ASC total order)
    "holt_linear_smoothing",
    "dedup_prefix_filter_jaccard",
    "label_propagation_communities",
    # the islands window must merge the same spans at any partition
    # count; the corr matrix's 15 decimal sums must be arrival-order
    # free; the audio tier's Arrow batch boundaries must not leak into
    # the per-asset integers
    "dedup_substring_spans",
    "correlation_matrix_lineitem",
    "multimodal_audio_stats",
    # round-6 fourth wave: the salted pair join must find the same
    # prune/admission sets at any partition count (pinned partitioning
    # only sets parallelism, never membership); the tile stream's
    # batch-delta sums are exact integers; the fused rank lists and PQ
    # codes come from rounded scores with total-order tie-breaks; the
    # DP release's seeded draw is a pure key function; the decomposition
    # stages per-weekday means through decimals
    "semdedup_prune_cells",
    "semdedup_incremental_new_batch",
    "stream_quantile_tiles",
    "rrf_hybrid_search",
    "embedding_pq_fidelity",
    "quantile_bin_rollup_regions",
    "dp_noisy_segment_counts",
    "seasonal_decompose_weekly",
    # round-7: every driver-window entry runs here before its first
    # CORRECTNESS row — the driver's session may size shuffles
    # differently than local tests, so partition-count sensitivity is
    # exactly the failure mode that turns locally-green into
    # driver-red. Order/float-sensitive shapes (Theil-Sen's pairwise
    # slope median, the as-of carries' tie rules, the CDF terciles,
    # cosine top-k ties, the verdict-set joins) plus the cheap
    # remainder of the window (SQL faces, sinks/sources, MR tier):
    "join_asof_last_click",
    "ann_topk_bruteforce",
    "multimodal_catalog",
    "mr_word_count",
    "stream_tumbling_counts",
    "corpus_dedup_apply",
    "join_asof_nearest",
    "linreg_trend_by_priority",
    "interpolate_hourly_purchase_value",
    "theilsen_trend_revenue",
    "weighted_median_price_by_flag",
    "multiple_ols_price_by_flag",
    "dedup_incremental_new_batch",
    "embedding_quantize_fidelity",
    "ann_recall_pq",
    "semdedup_apply",
    "ccnet_perplexity_buckets",
    "hard_negative_mining",
    "multimodal_frame_dedup",
    "kanonymity_census",
    "udtf_table_arg_sessionize",
    "sql_pipe_syntax_revenue",
    "sql_group_by_all",
    "sql_named_parameters",
    "sql_collated_grouping",
    "sql_create_function_udfs",
    "stream_stream_left_outer_clicks",
    "sink_schema_evolution_roundtrip",
    "sink_cow_upsert_partitioned",
    "source_binaryfile_roundtrip",
    "read_json_permissive_corrupt",
    "bucketed_join_colocated",
    # round-7 second half: the ROUND-8 QUEUE (registry.py docstring)
    # gets the same pre-driver-row protection as this round's window —
    # notably the LTTB bucket argmax, the rolling-corr co-moments, the
    # HLL register merge, the ANN bucket probes, and the LSH pair
    # membership, all of whose tie/fold rules must not see partition
    # layout:
    "weekday_profile_anomalies",
    "rolling_corr_revenue_orders",
    "downsample_lttb_daily",
    "sql_session_variables",
    "sql_execute_immediate",
    "sql_identifier_clause",
    "embedding_jl_projection_fidelity",
    "ann_recall_jl",
    "mixing_weights_temperature",
    "incremental_join_view_delta",
    "hll_sketch_rollup_users",
    "approx_quantiles_price",
    "ann_topk_lsh",
    "ann_topk_ivf",
    "embedding_cosine_dups_lsh",
    # round-8: the seeded frame-dedup twin variant enters the driver
    # window this round — its bucket collect_set + pair explode and the
    # min_shared filter must not see partition layout (same rule as
    # multimodal_frame_dedup above)
    "multimodal_frame_dedup_seeded",
    # round-7: the basket-array pair derivations (census + market
    # basket) replaced intra-key self-joins — the collect_set order and
    # the nested-TRANSFORM pair emission must not see partition layout
    "triangle_count_copurchase",
    "clustering_coefficient_topk",
    "event_cooccurrence_lift",
    "basket_association_rules",
    # mid-r8 growth entries, pre-driver-row protection (the r7 rule —
    # every window entry runs here before its first CORRECTNESS row):
    # the Kalman HOF fold's array_sort input, the SSSP integer-min
    # relaxation, the DP noisy-CDF's ordered running sum, TakeOrdered's
    # top-k + the md5 gate, the ER best-match total order, the observe
    # counters' exact decimal fold, and the t-digest merge (a pure
    # function of the centroid multiset after the lexsort fix —
    # shuffle layout must not reach the merge order; the SCAN-split
    # sensitivity documented in its docstring is a different axis)
    "kalman_smooth_weekly_revenue",
    "sssp_weighted_from_hub",
    "dp_noisy_quantiles_price",
    "sql_tablesample_faces",
    "entity_resolution_customers",
    "stream_observed_metrics",
    "tdigest_quantiles_price",
    # round-9 growth entries, pre-driver-row protection (same rule):
    # the weighted-PageRank floor-quantized decimal sums, the composed
    # ER clustering's CC fixpoint + min-id labels, the full-spine DP
    # grid's seeded draws, the per-type observe decimal folds, and the
    # bucket twin's md5 gate + IN-list over the bucketed layout
    "weighted_pagerank_trade",
    "entity_clusters_customers",
    "dp_noisy_qi_grid_release",
    "stream_observed_metrics_by_type",
    "sql_tablesample_bucket_twin",
    # mid-r9 growth wave (same pre-driver-row rule): the containment
    # posting-list collect + pair explode, the two-level generalization
    # ladder's class rollups, and the seed-gated rank loop's quantized
    # decimal sums
    "dedup_containment_pairs",
    "kanonymity_generalize_release",
    "personalized_pagerank_suppliers",
    # the KMV sketch is a pure function of the distinct hash set (rank
    # window over a dedup), so partition layout must not reach the
    # retained minima or any set estimate
    "kmv_repeat_buyers_by_nation",
    # round-10 growth entries, pre-driver-row protection (same rule):
    # the lattice's single GROUPING SETS pass + per-node rollup, and the
    # windowed RWR's lead-window transition derivation + per-week
    # quantized decimal rank sums
    "kanonymity_lattice_customers",
    "rwr_weekly_event_types",
    # mid-r10 growth wave (same rule): the FS m/u estimation's blocked
    # pair set + single-row parameter broadcast, the multi-source BFS
    # level unions + integer-sixths harmonic sum, and the bloom build's
    # OR-merge (one filter regardless of which partition saw which key)
    "fellegi_sunter_weights",
    "harmonic_centrality_hubs",
    "bloom_prefilter_hot_orders",
    # round-11 growth entries, pre-driver-row protection (same rule):
    # the takedown audit's anti/semi count chains over externally-shaped
    # snapshots, the EM loop's floor-quantized posterior sums, the drift
    # face's node-keyed lag over the quantized rank rows, and the
    # bloom-gated twin's order-free bit_or bloom + windowed decimal sums
    "takedown_cascade_manifest",
    "fellegi_sunter_em_customers",
    "rwr_weekly_deltas",
    "stream_bloom_gated_segments",
    # mid-r11 growth (same rule): the SCD2 erasure's version-window
    # derivation + per-class anti/semi count rollups, and the DQ gate's
    # per-batch conditional-count rollup + threshold decision
    "takedown_scd2_versions",
    "dq_gate_event_batches",
    # late-r11 growth (same rule): the propagation audit's per-artifact
    # anti/semi count chains (incl. the pruned fingerprint derivation),
    # the gated upsert twin's anti-join + argmax compaction, and the
    # quarantine replay's two-pass gate + version-argmax merge + keyed
    # audit joins
    "erasure_propagation_docs",
    "stream_erasure_gated_upsert",
    "dq_quarantine_replay",
    # the retention audit's pushed cutoff filter + hold anti join +
    # per-year anti/semi count rollups (same rule)
    "retention_expiry_orders",
]


def _rows(df):
    # None-safe total order: rollup total rows carry NULL keys (e.g.
    # the HLL rollup's day=NULL row) and Python refuses None < date.
    def key(t):
        return tuple((v is None, () if v is None else (v,)) for v in t)

    def norm(v):
        return tuple(v) if isinstance(v, list) else v

    return sorted((tuple(norm(v) for v in r) for r in df.collect()), key=key)


@pytest.mark.parametrize("name", CASES)
def test_result_invariant_under_shuffle_partitions(spark, sf_dir, name):
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "1")
        low = _rows(SPECS[name].fn(spark, sf_dir))
        spark.conf.set("spark.sql.shuffle.partitions", "17")
        high = _rows(SPECS[name].fn(spark, sf_dir))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert low == high


#: Queries whose results would shift if timestamp handling leaked the
#: session timezone: cutoff filters at midnight boundaries, date windows,
#: SCD2 sentinel coalesce, lag-gap sessionization, tumbling windows.
_TZ_CASES = [
    "pricing_summary",
    "forecast_revenue_change",
    "scd2_customer_history",
    "date_functions",
    "sessionize_events",
    "stream_tumbling_counts",
    "dedup_keep_latest",
    "yoy_revenue_by_month",
    "gapfill_hourly_events",
    "rolling_7d_distinct_users",
    "join_full_outer_hourly",
    # hour-boundary candle buckets; 3-day lookback window edges
    "ohlc_hourly_by_type",
    "attribution_linear_touch",
    # midnight AS-OF cut over [valid_from, valid_to) ranges
    "scd2_snapshot_asof",
    # round-7 window entries over events.ts: as-of carries, the hourly
    # interpolation spine's bucket edges, UDTF sessionization gaps, and
    # the stream-stream outer join's event-time band
    "join_asof_last_click",
    "join_asof_nearest",
    "interpolate_hourly_purchase_value",
    "udtf_table_arg_sessionize",
    "stream_stream_left_outer_clicks",
    # round-8 queue: weekday buckets / calendar windows over
    # o_orderdate, the LTTB day buckets over events.ts, and the
    # incremental view's midnight cutoff filter
    "weekday_profile_anomalies",
    "rolling_corr_revenue_orders",
    "downsample_lttb_daily",
    "incremental_join_view_delta",
    # mid-r8 growth: weekly NTZ buckets over o_orderdate (holt's shape)
    "kalman_smooth_weekly_revenue",
    # r10 growth: Monday week truncation over events.ts must not see the
    # session timezone (wall_trunc convention — to_date then NTZ)
    "rwr_weekly_event_types",
    # late-r11: midnight retention cutoff + year extraction over
    # o_orderdate must not see the session timezone
    "retention_expiry_orders",
]


#: Event-time queries that must survive the lake flipping its parquet
#: timestamp annotation (isAdjustedToUTC true/false → Spark TIMESTAMP vs
#: TIMESTAMP_NTZ). The driver's generator has already flipped encodings
#: between rounds (int96 → nanos → NTZ), so this is a live hazard, not a
#: hypothetical: gap/duration arithmetic, hour buckets, windows, as-of
#: joins all read events.ts.
_FLAVOR_CASES = [
    "sessionize_events",
    "gapfill_hourly_events",
    "rolling_7d_distinct_users",
    "stream_tumbling_counts",
    "join_asof_last_click",
    "session_conversion_rate",
    "ohlc_hourly_by_type",
    "attribution_linear_touch",
    # nearest-direction carry + |delta-t| microsecond arithmetic must not
    # depend on the lake's timestamp annotation, like its siblings above
    "join_asof_nearest",
    # round-7 window entries whose event-time arithmetic reads events.ts:
    # hourly interpolation buckets, UDTF sessionization gap splits, the
    # stream-stream outer join's band + watermark expiry
    "interpolate_hourly_purchase_value",
    "udtf_table_arg_sessionize",
    "stream_stream_left_outer_clicks",
    # round-8 queue: LTTB's day buckets + triangle arithmetic read
    # events.ts microseconds directly
    "downsample_lttb_daily",
    # r10 growth: the week buckets + lead-window transition order read
    # events.ts; results must not depend on the lake's annotation
    "rwr_weekly_event_types",
]


@pytest.fixture(scope="module")
def flavor_dirs(sf_dir, tmp_path_factory):
    """Two copies of the sf dir differing ONLY in events.ts annotation:
    naive micros (TIMESTAMP_NTZ) vs UTC-adjusted micros (TIMESTAMP)."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from cooler_mapreduce_spark.sources.catalog import TABLES

    base = tmp_path_factory.mktemp("tsflavor")
    tbl = pq.read_table(f"{sf_dir}/events.parquet")
    i = tbl.schema.get_field_index("ts")
    ts_ntz = tbl.column("ts").cast(pa.timestamp("us"))
    dirs = {}
    for flavor, typ in (
        ("ntz", pa.timestamp("us")),
        ("ltz", pa.timestamp("us", tz="UTC")),
    ):
        d = base / flavor
        d.mkdir()
        for t in TABLES:
            if t != "events":
                os.symlink(f"{sf_dir}/{t}.parquet", d / f"{t}.parquet")
        pq.write_table(tbl.set_column(i, "ts", ts_ntz.cast(typ)), d / "events.parquet")
        dirs[flavor] = str(d)
    return dirs


def _norm(v):
    """tz-aware datetimes → naive UTC so LTZ/NTZ result rows compare."""
    import datetime as dt

    if isinstance(v, dt.datetime) and v.tzinfo is not None:
        return v.astimezone(dt.timezone.utc).replace(tzinfo=None)
    if isinstance(v, (tuple, list)):
        return tuple(_norm(x) for x in v)
    if hasattr(v, "asDict"):  # nested Row (window structs)
        return tuple((k, _norm(x)) for k, x in v.asDict().items())
    return v


@pytest.mark.parametrize("name", _FLAVOR_CASES)
def test_result_invariant_under_timestamp_flavor(spark, flavor_dirs, name):
    """Identical event instants, both parquet annotations, bit-identical
    results — proves the timeutil helpers (and every filter literal on
    event time) never route values through the session timezone."""
    prev = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        ntz = [_norm(t) for t in _rows(SPECS[name].fn(spark, flavor_dirs["ntz"]))]
        ltz = [_norm(t) for t in _rows(SPECS[name].fn(spark, flavor_dirs["ltz"]))]
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)
    assert ntz == ltz


#: Queries whose PHYSICAL plan interacts with AQE the most — runtime
#: broadcast promotion/demotion (corpus_dedup_apply's stat-less label
#: side, the size-based q15/q18 chains), skew-join splitting, pinned
#: parallelism that must survive coalescing (the semdedup pair joins),
#: partition pruning, bucketed layouts, and the shuffle_hash-hinted
#: iterative tier. A cluster flips spark.sql.adaptive.* freely, so
#: results must be bit-identical either way (the full 50-query driver
#: window swept clean under this A/B in round 7; these keep the net).
_AQE_CASES = [
    "skew_salted_event_stats",
    "corpus_dedup_apply",
    "semdedup_prune_cells",
    "semdedup_apply",
    "dedup_minhash_lsh",
    "dpp_partitioned_join",
    "bucketed_join_colocated",
    "large_orders_q18",
    "min_cost_supplier_q2",
    "market_share_q8",
    "pagerank_supplier_customer",
    "triangle_count_copurchase",
    # r8 growth: the SSSP loop's per-round join planning and the ER
    # block join must not let AQE coalescing/promotion move results
    "sssp_weighted_from_hub",
    "entity_resolution_customers",
    # r9 growth: the weighted/personalized rank loops' shuffle_hash
    # hints + checkpointed edge joins, the composed ER clustering's CC
    # rounds, and the KMV build's dedup+window pair must all survive
    # AQE re-planning bit-identically
    "weighted_pagerank_trade",
    "personalized_pagerank_suppliers",
    "entity_clusters_customers",
    "kmv_repeat_buyers_by_nation",
    # r10 growth: the grouped RWR's per-week shuffle_hash rank loop and
    # checkpointed edge joins must survive AQE re-planning bit-identically
    "rwr_weekly_event_types",
    # mid-r10 growth: AQE coalescing/broadcast-promotion must not move
    # the FS blocked pair set or the bloom prefilter + verify join
    "fellegi_sunter_weights",
    "bloom_prefilter_hot_orders",
    "harmonic_centrality_hubs",
    # r11 growth: AQE promotion/coalescing must not move the takedown
    # audit's semi/anti count joins, the EM face's blocked pair build +
    # checkpointed iteration aggregates, the drift face's rank loop, or
    # the bloom-gated twin's probe + verify join
    "takedown_cascade_manifest",
    "fellegi_sunter_em_customers",
    "rwr_weekly_deltas",
    "stream_bloom_gated_segments",
    "takedown_scd2_versions",
    "dq_gate_event_batches",
    # late-r11 growth: AQE broadcast-promotion of the request set must
    # not move the propagation audit's anti/semi legs, the gated
    # upsert twin's anti join + partial-aggregable argmax, or the
    # replay face's manifest semi joins + version-argmax merge
    "erasure_propagation_docs",
    "stream_erasure_gated_upsert",
    "dq_quarantine_replay",
    "retention_expiry_orders",
]


#: Whole-stage codegen compiles expression trees to Java; off, the same
#: trees run interpreted. Both paths must emit identical bits — the
#: probe targets the numeric-heaviest shapes (decimal staging, HOF
#: folds, rounded doubles, the minhash fold). The full 50-query driver
#: window swept clean under this A/B in round 7; these keep the net
#: (codegen also silently falls back per-stage on huge generated
#: methods, so the off-path runs in production whether asked or not).
_CODEGEN_CASES = [
    "pricing_summary",
    "stat_corr_qty_price",
    "multiple_ols_price_by_flag",
    "holt_linear_smoothing",
    "weighted_median_price_by_flag",
    "doc_unigram_nll",
    "embedding_pq_fidelity",
    "autocorr_daily_revenue",
    "dedup_minhash_lsh",
    "theilsen_trend_revenue",
    # r8 growth: the Kalman HOF fold (holt's interpreted-path sibling)
    # and the DP release's ln()/division noise math
    "kalman_smooth_weekly_revenue",
    "dp_noisy_quantiles_price",
    # r9 growth: the DP grid's ln() noise + the KMV estimator's
    # division chain and the containment ratio run interpreted when
    # codegen falls back — both paths must emit identical bits
    "dp_noisy_qi_grid_release",
    "kmv_repeat_buyers_by_nation",
    "dedup_containment_pairs",
    # r10 growth: the RWR's floor-quantized decimal contributions and
    # teleport/damping double chain run interpreted on codegen fallback
    "rwr_weekly_event_types",
    # mid-r10 growth: the FS ln-quotient weight chain must emit the
    # same bits compiled and interpreted (the DP noise's ln discipline)
    "fellegi_sunter_weights",
    # r11 growth: the EM posterior's likelihood-product/division chain
    # and the drift face's rank subtraction run interpreted on codegen
    # fallback — both paths must emit identical bits
    "fellegi_sunter_em_customers",
    "rwr_weekly_deltas",
]


#: Two more engine-config axes a cluster flips without asking, swept
#: clean over the full 50-query driver window in round 7 and kept as a
#: compact net here: the parquet VECTORIZED reader vs the row-based
#: fallback (production falls back per-file on nested/unsupported
#: schemas — the multimodal/embedding scans read nested and binary
#: columns), and ANSI mode off (Spark 4 defaults it on; results for
#: well-formed queries must not depend on it — a DIFF here means a
#: query leans on ANSI-only cast/overflow semantics).
_ENGINE_CONF_CASES = [
    ("spark.sql.parquet.enableVectorizedReader", "multimodal_catalog"),
    ("spark.sql.parquet.enableVectorizedReader", "ann_topk_bruteforce"),
    ("spark.sql.parquet.enableVectorizedReader", "pricing_summary"),
    ("spark.sql.parquet.enableVectorizedReader", "read_json_permissive_corrupt"),
    ("spark.sql.ansi.enabled", "pricing_summary"),
    ("spark.sql.ansi.enabled", "multiple_ols_price_by_flag"),
    ("spark.sql.ansi.enabled", "string_functions"),
    ("spark.sql.ansi.enabled", "ccnet_perplexity_buckets"),
    # r8 growth: the TABLESAMPLE SQL text must not lean on ANSI-only
    # semantics; the digest's parquet feed must not depend on the reader
    ("spark.sql.ansi.enabled", "sql_tablesample_faces"),
    ("spark.sql.parquet.enableVectorizedReader", "tdigest_quantiles_price"),
    # r9 growth: the bucket twin's TABLESAMPLE-twin SQL text and the
    # generalization ladder's integer arithmetic must not lean on
    # ANSI-only semantics
    ("spark.sql.ansi.enabled", "sql_tablesample_bucket_twin"),
    ("spark.sql.ansi.enabled", "kanonymity_generalize_release"),
    # r10 growth: the lattice's GROUPING_ID bit arithmetic and the
    # grouping-sets expansion must not lean on ANSI-only semantics
    ("spark.sql.ansi.enabled", "kanonymity_lattice_customers"),
]


#: Input-SPLIT invariance — orthogonal to shuffle partitioning: the
#: scan planner's split boundaries move with
#: spark.sql.files.maxPartitionBytes (cluster-tuned freely), and
#: byte-range splits are the classic breakage for custom sources and
#: line readers. The 50-query window + the text/MR/source shapes swept
#: clean at 64 KB vs 128 MB splits (a 2048x change) in round 7; these
#: keep the net over the split-sensitive readers.
_SPLIT_CASES = [
    "word_count",            # textFile line splits
    "mr_word_count",         # RDD-compat tier over the same splits
    "pysource_event_mix",    # custom Python DataSource byte-range splits
    "pricing_summary",       # parquet row-group splits
    "multimodal_catalog",    # binary-column parquet scan
]


#: Arrow BATCH-SIZE invariance for the mapInPandas tier: the kernel
#: sees the data in arbitrary-sized pandas batches, so any cross-row
#: state inside one batch (a groupby that assumes batch == asset, a
#: running reduction) leaks batch boundaries into the output. Swept
#: clean at maxRecordsPerBatch 10000 vs 7 over the whole multimodal/
#: audio tier in round 7; the two heaviest kernels keep the net.
_ARROW_BATCH_CASES = [
    "multimodal_resize_stats",
    "multimodal_audio_stats",
    # r8 growth: the t-digest partial concatenates a partition's batches
    # BEFORE compressing, so Arrow batch boundaries must not leak into
    # the centroids (the scan-SPLIT axis, by contrast, legitimately
    # moves them — the GK taxonomy, documented in its docstring)
    "tdigest_quantiles_price",
]


@pytest.mark.parametrize("name", _ARROW_BATCH_CASES)
def test_result_invariant_under_arrow_batch_size(spark, sf_dir, name):
    prev = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    try:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        big = _rows(SPECS[name].fn(spark, sf_dir))
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "7")
        small = _rows(SPECS[name].fn(spark, sf_dir))
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", prev)
    assert big == small


@pytest.mark.parametrize("name", _SPLIT_CASES)
def test_result_invariant_under_input_splits(spark, sf_dir, name):
    prev = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try:
        spark.conf.set("spark.sql.files.maxPartitionBytes", "134217728")
        big = _rows(SPECS[name].fn(spark, sf_dir))
        spark.conf.set("spark.sql.files.maxPartitionBytes", "65536")
        small = _rows(SPECS[name].fn(spark, sf_dir))
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", prev)
    assert big == small


@pytest.mark.parametrize("conf,name", _ENGINE_CONF_CASES)
def test_result_invariant_under_engine_conf(spark, sf_dir, conf, name):
    prev = spark.conf.get(conf)
    try:
        spark.conf.set(conf, "true")
        on = _rows(SPECS[name].fn(spark, sf_dir))
        spark.conf.set(conf, "false")
        off = _rows(SPECS[name].fn(spark, sf_dir))
    finally:
        spark.conf.set(conf, prev)
    assert on == off


@pytest.mark.parametrize("name", _CODEGEN_CASES)
def test_result_invariant_under_codegen(spark, sf_dir, name):
    prev = spark.conf.get("spark.sql.codegen.wholeStage")
    try:
        spark.conf.set("spark.sql.codegen.wholeStage", "true")
        on = _rows(SPECS[name].fn(spark, sf_dir))
        spark.conf.set("spark.sql.codegen.wholeStage", "false")
        off = _rows(SPECS[name].fn(spark, sf_dir))
    finally:
        spark.conf.set("spark.sql.codegen.wholeStage", prev)
    assert on == off


@pytest.mark.parametrize("name", _AQE_CASES)
def test_result_invariant_under_aqe(spark, sf_dir, name):
    prev = spark.conf.get("spark.sql.adaptive.enabled")
    try:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        on = _rows(SPECS[name].fn(spark, sf_dir))
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        off = _rows(SPECS[name].fn(spark, sf_dir))
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev)
    assert on == off


@pytest.mark.parametrize("name", _TZ_CASES)
def test_result_invariant_under_session_timezone(spark, sf_dir, name):
    """The driver runs queries in ITS session, whose timezone we don't
    control — event time is TIMESTAMP_NTZ-native and filter literals
    coerce to the column's own type, so results must be bit-identical
    under any spark.sql.session.timeZone (a leaked LTZ cast would shift
    midnight-boundary cutoffs by the UTC offset)."""
    prev = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        utc = _rows(SPECS[name].fn(spark, sf_dir))
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        ny = _rows(SPECS[name].fn(spark, sf_dir))
        spark.conf.set("spark.sql.session.timeZone", "Asia/Kathmandu")  # +05:45
        ktm = _rows(SPECS[name].fn(spark, sf_dir))
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)
    assert utc == ny == ktm
