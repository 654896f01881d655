"""Determinism tests (SURVEY §5.2.6): FP-reorder-sensitive queries must
produce identical canonical output under different shuffle partitionings
(spark.sql.shuffle.partitions is a runtime conf, so one session covers
both settings — same property the driver's repeated runs rely on).
"""

from __future__ import annotations

import pytest

from flexcalc_spark import registry
from tests.conftest import SF_DIR

# The keys where nondeterminism historically hides: float aggs, windows,
# limits, hash-sketch candidates, top-k ties.
RISKY = [
    "q_agg_groupby",
    "q_agg_global",
    "q_agg_stats",
    "q_agg_weighted_centroid",
    "q_join_multiway",
    "q_win_running",
    "q_topk",
    "q_limit_offset",
    "q_dedup_minhash",
    "q_knn_cosine",
    "q_centroids",
    "q_window_tumbling",
    "q_ct_moments",
    "q_join_salted",
    "q_dedup_clusters",
    "q_subquery_scalar",
    "q_subquery_correlated",
    "q_vocab",
    "q_corpus_filter",
    # round-2 reworked/new plans
    "q_dedup_neardup",      # prefix-filter candidates + exact re-score
    "q_dedup_ngram",
    "q_dedup_embed",        # blocked-GEMM candidates + JVM re-score
    "q_sink_csv",           # csv round-trip aggregate
    "q_pack_sequences",     # running-sum window packing
    # curation family (round 2)
    "q_decontaminate",      # broadcast shingle join + left-join counts
    "q_mix_sample",         # data-dependent integer thresholds
    "q_dedup_incremental",  # prefix filter with flipped pair predicate
    "q_split_dedup_safe",   # cluster roots + integer hash split (round 9)
    "q_kmeans",             # integer-grid Lloyd assignment + codebook collect
    "q_tfidf",              # floor-quantized score ranking
    "q_agg_regression",     # one-pass moment aggregates, rounded
    "q_join_bucketed",      # bucketed write + co-located SMJ
    "q_sketch_cms",         # md5-bucket counters, top-20 tiebreaks
    # round-4 additions
    "q_sketch_hll",         # sketch merge across day partials
    "q_bm25",               # floor-quantized score ranking + ties
    "q_quality_entropy",    # integer-grid entropy term sums
    "q_anomaly_zscore",     # grid-sum stats broadcast, floor-grid z
    "q_embed_project",      # sequential HOF folds per row
    "q_cdc_upsert",         # broadcast merge decomposition
    "q_time_rollup",        # grid-sum cascade minute->hour->day
    "q_grouped_sample",     # md5-order window sample
    "q_join_bloom",         # bloom prefilter + exact semi join
    "q_funnel",             # chained per-user min-ts aggregates
    "q_agg_skew_distinct",  # composite-key two-phase distinct
    "q_retention",          # distinct-day collapse + broadcast cohort join
    "q_table_checksum",     # order-independent folded-hash sums
    "q_cooccur",            # bounded basket self-join + global top-k ties
    "q_concurrency",        # two-phase distributed prefix sum
    "q_histogram_equidepth",  # broadcast decile boundaries + scan-side tag
    "q_sql_tpch3",          # SQL-text entry, grid revenue + LIMIT ties
    "q_sliding_distinct",   # windowed sketch union over day partials
    "q_rfm",                # percentile-boundary segmentation
    "q_transitions",        # lag-window transition counts + ratios
    "q_session_stats",      # session-level percentile aggregate
    # round-5 additions
    "q_dedup_embed_lsh",    # hyperplane-band candidates + HOF re-score
    "q_histogram_equidepth_approx",  # sketch boundaries + scan-side tag
    "q_rfm_approx",         # sketch segment boundaries
    "q_ngram_lm",           # floor-quantized ln sums over pair stream
    "q_data_audit",         # fused conditional-sum counters
    "q_data_profile",       # 24-cell single-pass aggregate + stack
    "q_zorder_layout",      # Morton rewrite + box-query read-back
    "q_inverted_index",     # struct-sorted postings fold
    "q_sql_tpch10",         # SQL-text 4-way join, grid sums + LIMIT ties
    "q_session_paths",      # struct-sorted path fold + top-20 ties
    "q_skyline",            # two-phase prefix max dominance
    "q_corr_matrix",        # integer-grid moments, double formula
    "q_global_rank",        # two-phase block rank + offset broadcast
    "q_multimodal_frames",  # Arrow frame split + columnar reduce
    "q_incr_mv",            # mergeable partials union + re-aggregate
    "q_ab_test",            # grid moments -> shared-text Welch formula
    "q_regression_multi",   # 9 grid cross-moments -> Cramer doubles
    "q_pagerank",           # all-integer fixed-point power iterations
    "q_dedup_chunks",       # md5-digest chunk frequency join
    "q_anonymize",          # broadcast k-anonymity cell filter
    "q_sql_tpch5",          # SQL-text 6-way join, grid revenue sums
    "q_sql_recursive",      # recursive-CTE BFS, integer hops
    "q_source_csv_dirty",   # PERMISSIVE parse census + grid price sum
    "q_join_interval_outer",  # equi-key interval join, null preservation
    "q_multimodal_audio",   # sequential-fold energy, exact zero-cross
    "q_ewma",               # integer shift-decay terms, one division
    "q_debounce",           # lag-window integer gap filter
    "q_seq_pattern",        # chained interval joins + distinct collapse
    "q_sample_weighted",    # quantized exponential keys + rank ties
    "q_ct_fbp",             # all-integer Radon/filter/backproject chain
    "q_source_xml",         # XML escaping round-trip aggregate
    "q_scd2_pit",           # version-interval window + PIT residual join
    "q_bpe_tokenize",       # iterative merge training, lexicographic ties
    "q_percentile_select",  # two-phase selection, order-stat exactness
    "q_join_fuzzy",         # deletion-key candidates + levenshtein verify
    "q_triangle_count",     # oriented wedge-close joins on cached edges
    "q_anomaly_rolling",    # grid-integer window sums, clamped z
    "q_feature_hash",       # md5-fold buckets, ordered sparse strings
    "q_logistic_train",     # grid-quantized gradient sums per iteration
    "q_interval_coalesce",  # cumulative-max break flags, integer spans
    "q_allocate",           # all-integer largest-remainder rounding
    "q_locf",               # spine join + ignore-nulls carry-forward
    "q_mad_outliers",       # two-phase robust percentiles + broadcast
    "q_dedup_phash",        # integer aHash bands + XOR-popcount verify
    "q_pipeline_e2e",       # four-stage composition, content-pure rules
    "q_source_evolving",    # mergeSchema unified census
    "q_source_nested",      # struct round-trip, integer k sums
    "q_trajectory_sim",     # SAX words, positional-gram candidates
    "q_sql_tpch18",         # HAVING-subquery semi join, grid threshold
    "q_join_spatial",       # cell-blocked candidates, mm-quantized verify
    "q_knn_incremental",    # semilattice top-k merge, rank tiebreaks
    # round-6 additions
    "q_dedup_substring",    # shingle census left join, integer permille
    "q_topic_terms",        # floor-quantized PMI + per-lang rank ties
    "q_win_distribution",   # integer rank/cume quantization, RANK ties
    "q_autocorr",           # integer-moment corr over the daily series
    "q_changepoint",        # CUSUM argmax with day tiebreak, LIMIT 1
    "q_kcore",              # 6-round peel on checkpointed edge tables
    "q_mad_outliers_approx",  # sketch medians; output must be partition-stable
    "q_sql_tpch14",         # grid-sum ratio — identical doubles everywhere
    "q_naive_bayes",        # grid log-likelihood sums + argmax lang ties
    "q_seasonal_decompose",  # offset integer means, signed det_q
    "q_label_prop",         # majority-vote ties on (count, label)
    "q_stream_upsert",      # replayed sink state must be input-pure
    # round-7 additions
    "q_sql_tpch1",          # grid sums + exact-int average divisions
    "q_sql_tpch2",          # derived-cost min equality + LIMIT ties
    "q_sql_tpch11",         # integer cross-multiplied share threshold
    "q_sql_tpch15",         # argmax-by-equality on grid revenue
    "q_sql_tpch17",         # two decorrelated per-part aggregates
    "q_sql_tpch20",         # correlated count/sum cross-multiplication
    "q_sql_tpch21",         # EXISTS + NOT EXISTS lateness census
    "q_sql_tpch22",         # null-aware NOT IN + scalar cutoffs
    "q_market_basket",      # a-priori prefilter + lift top-20 ties
    "q_survival",           # histogram + reverse cumsum over 32 rows
    "q_pca_embed",          # fsum Gram partials -> literal eigvec
    "q_debounce_anchor",    # chunk-carry mapInPandas greedy fold
    "q_attribution",        # interval join + per-purchase MAX collapse
    "q_period_over_period", # constant-size lag window on grid sums
    "q_cohort_ltv",         # cohort equi join + bounded cumsum grid
    "q_dedup_containment",  # integer ppm grid, exact re-score census
    "q_bfs_hops",           # integer hop distances, frontier loop
    "q_sssp_cost",          # min-plus relaxation, integer-grid weights
    "q_cuped",              # shared-text double formulas on exact moments
    "q_srm_check",          # chi2 from exact counts, integer flag
    "q_rolling_corr",       # BIGINT window moments, shared-text corr
    "q_qte",                # interpolated percentiles on BIGINT inputs
    "q_diff_in_diff",       # 2x2 integer cells, shared-text estimate
    # round-8 additions (probed 2-vs-37 shuffle partitions at add time)
    "q_dedup_embed_lsh_wide",  # XOR probe ball + floor-quantized cos
    "q_dpp_prune",          # partitioned round-trip, grid qty sums
    "q_target_encode",      # cleared-denominator BIGINT ppm encoding
    "q_link_predict",       # integer RA scores, total-order top-k ties
    "q_holt_forecast",      # sequential tdiv fold on daily aggregates
    "q_snapshot_diff",      # full-outer key diff, integer cent grid
    "q_join_nullsafe",      # null-coalesced equi key, integer sums
    "q_agg_weighted_median",  # tie-invariant weighted crossing, BIGINT
    # round-10 additions (all probed 2-vs-37 shuffle at add time)
    "q_dedup_containment_2stage",  # exact two-stage census, integer ppm
    "q_source_avro",        # container round-trip, BIGINT fidelity sums
    "q_source_warc",        # html->text census, ASCII-ws normalization
    "q_source_archive",     # tar member round-trip, BIGINT sums
    "q_trajectory_dtw",     # integer elastic DPs on grid PAA profiles
    # round-11 additions (probed 2-vs-37 shuffle at add time)
    "q_trajectory_dtw_radius",  # integer LB buckets + exact DP
    "q_source_jsonl_zst",   # zstd shard round-trip, BIGINT fidelity sums
]


def _canon(df):
    pdf = df.toPandas()
    cols = sorted(pdf.columns)
    return sorted(
        tuple(repr(v) for v in row)
        for row in pdf[cols].itertuples(index=False, name=None)
    )


@pytest.mark.parametrize("key", RISKY)
def test_stable_under_repartitioning(key, spark):
    orig = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        a = _canon(registry.QUERIES[key](spark, SF_DIR))
        spark.conf.set("spark.sql.shuffle.partitions", "37")
        b = _canon(registry.QUERIES[key](spark, SF_DIR))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", orig)
    assert a == b, f"{key} output depends on partitioning"


# --- HLL sparse-mode exactness guards (ADVICE round 4) -----------------
#
# q_sketch_hll and q_sliding_distinct grade an HLL estimate against an
# EXACT COUNT(DISTINCT) oracle; that only holds while the Datasketches
# sketch stays in its exact sparse mode at fixture cardinality. Fixtures
# are regenerated between rounds — if a generation raises user
# cardinality past the sparse threshold, these fail loudly at round
# start instead of silently breaking the driver hash.


def test_hll_estimate_exact_at_fixture_cardinality(spark):
    from pyspark.sql import functions as F
    from flexcalc_spark.tables import events_with_time

    e = events_with_time(spark, SF_DIR)
    got = (
        e.groupBy("event_type")
        .agg(
            F.expr("hll_sketch_estimate(hll_sketch_agg(user_id, 14))")
            .cast("bigint")
            .alias("est"),
            F.countDistinct("user_id").cast("bigint").alias("exact"),
        )
        .collect()
    )
    for r in got:
        assert r.est == r.exact, (
            f"HLL left exact sparse mode for {r.event_type}: "
            f"est {r.est} != exact {r.exact} — fixture cardinality "
            "crossed the sketch threshold; raise lgConfigK"
        )


def test_sliding_distinct_range_frame_on_gapped_days(spark):
    """The d7 window must be CALENDAR-based (RANGE), not row-based.

    Synthetic day table with a hole: days [0,1,2,3, 10,11]. A ROWS
    BETWEEN 6 PRECEDING frame would pull days 0..3 into day 10/11's
    trailing week; the RANGE frame must not.
    """
    from pyspark.sql import functions as F  # noqa: F401

    rows = []
    for day, users in [
        (0, [1, 2]), (1, [2, 3]), (2, [4]), (3, [1]),
        (10, [5, 6]), (11, [1, 7]),
    ]:
        rows += [(day, u) for u in users]
    df = spark.createDataFrame(rows, "day long, user_id long")
    daily = df.groupBy("day").agg(
        F.expr("hll_sketch_agg(user_id, 14)").alias("sk")
    )
    got = {
        r.day: r.d7
        for r in daily.selectExpr(
            "day",
            "CAST(hll_sketch_estimate(hll_union_agg(sk) OVER ("
            "ORDER BY day RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)) "
            "AS BIGINT) AS d7",
        ).collect()
    }
    # exact trailing-7-calendar-day distincts
    expect = {}
    data = dict(
        [(0, {1, 2}), (1, {2, 3}), (2, {4}), (3, {1}),
         (10, {5, 6}), (11, {1, 7})]
    )
    for d in data:
        acc = set()
        for d2, us in data.items():
            if d - 6 <= d2 <= d:
                acc |= us
        expect[d] = len(acc)
    assert got == expect, f"window frame is not calendar-based: {got}"


def test_anomaly_zscore_constant_group_no_divergence(spark, duck):
    """Degenerate variance (constant-valued group) must score z=0 in
    BOTH engines — Spark's non-ANSI divide returns NULL on /0 while
    DuckDB follows IEEE, so an unclamped expr diverges exactly here."""
    from pyspark.sql import functions as F
    from flexcalc_spark.operators.anomaly import _Z_EXPR

    df = spark.createDataFrame(
        [("const", 5.0)] * 4 + [("vary", 1.0), ("vary", 3.0)],
        "event_type string, value double",
    )
    st = df.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.expr("CAST(floor(value * 1000000.0 + 0.5) AS BIGINT)"))
        .cast("bigint").alias("sum_g"),
        F.sum(F.expr("CAST(floor(value * value * 1000000.0 + 0.5) AS BIGINT)"))
        .cast("bigint").alias("ssq_g"),
    )
    got = (
        df.join(F.broadcast(st), "event_type")
        .select("event_type", F.expr(_Z_EXPR).cast("bigint").alias("z_q"))
        .collect()
    )
    zs = {(r.event_type, r.z_q) for r in got}
    assert all(z == 0 for t, z in zs if t == "const"), zs
    assert all(z is not None for _, z in zs), zs
    # same literal structure in DuckDB agrees
    o = duck.execute(f"""
        WITH ev(event_type, value) AS (
            VALUES ('const', 5.0), ('const', 5.0), ('const', 5.0),
                   ('const', 5.0), ('vary', 1.0), ('vary', 3.0)
        ),
        st AS (
            SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(CAST(floor(value * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS sum_g,
                   CAST(SUM(CAST(floor(value * value * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS ssq_g
            FROM ev GROUP BY event_type
        )
        SELECT e.event_type, CAST({_Z_EXPR} AS BIGINT) AS z_q
        FROM ev e JOIN st USING (event_type)
    """).fetchall()
    assert sorted(zs) == sorted({(t, z) for t, z in o}), (zs, o)
