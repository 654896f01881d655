"""Round-5 session-2 scaling probe: 10x-data wall-clock ratios for the
operators added in the second round-5 session (SURVEY §11 "Later
round-5 additions").

Same protocol as scripts/scale_probe_r4.py: best of 3 noop-sink runs
per key at sf0.01 and sf0.1 on local[8]; ratio ~<=10x on 10x rows means
the plan is scan/shuffle-bound with no superlinear term. Prints the
lines recorded in SCALE.md "Round-5 measurements".

Run: python scripts/scale_probe_r5.py   (~3 min, idle box)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

from flexcalc_spark import registry

R5B_KEYS = [
    "q_incr_mv",
    "q_ab_test",
    "q_regression_multi",
    "q_pagerank",
    "q_dedup_chunks",
    "q_anonymize",
    "q_sql_tpch5",
    "q_sql_recursive",
    "q_source_csv_dirty",
    "q_join_interval_outer",
    "q_multimodal_audio",
    "q_ewma",
    "q_debounce",
    "q_seq_pattern",
    "q_sample_weighted",
    "q_source_xml",
    "q_scd2_pit",
    "q_bpe_tokenize",
    "q_ct_fbp",
    "q_percentile_select",
    "q_join_fuzzy",
    "q_triangle_count",
    "q_anomaly_rolling",
    "q_feature_hash",
    "q_logistic_train",
    "q_interval_coalesce",
    "q_allocate",
    "q_locf",
    "q_mad_outliers",
    "q_dedup_phash",
    "q_pipeline_e2e",
    "q_source_evolving",
    "q_source_nested",
    "q_trajectory_sim",
    "q_sql_tpch18",
    "q_join_spatial",
    "q_knn_incremental",
]


def main() -> None:
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    registry.load_all()
    for key in R5B_KEYS:
        ts = {}
        for sf in ["/root/testdata/sf0.01", "/root/testdata/sf0.1"]:
            best = None
            for _ in range(3):
                spark.catalog.clearCache()
                # time END-TO-END (construction + noop save): keys that
                # run eager work at plan construction — iterative
                # checkpoint loops (the round-7 lesson) and the r13
                # materialize_local sink/source keys — would otherwise
                # report only the final local scan
                t0 = time.perf_counter()
                df = registry.QUERIES[key](spark, sf)
                df.write.format("noop").mode("overwrite").save()
                dt = time.perf_counter() - t0
                best = dt if best is None or dt < best else best
            ts[os.path.basename(sf)] = best
        print(
            f"PROBE scale {key}: sf0.01={ts['sf0.01']:.3f}s "
            f"sf0.1={ts['sf0.1']:.3f}s "
            f"ratio={ts['sf0.1'] / ts['sf0.01']:.2f}x",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
