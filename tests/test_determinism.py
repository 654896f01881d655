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
