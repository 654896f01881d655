"""Round-8 scaling probe: 10x-data wall-clock ratios for the round-8
additions. Same protocol as scripts/scale_probe_r7.py (best of 3
noop-sink runs at sf0.01 and sf0.1, local[8]).

Caveats, same class as the r7 probe's: q_dpp_prune WRITES the
partitioned fact inside the query, so its number includes the sink
write (it is a layout key — that is the honest cost); the wide-LSH
key's signature-bank plan construction happens before the timed sink,
so this probe isolates EXECUTION scaling (pretime_window.py carries
its end-to-end driver-style cost).

Run: python scripts/scale_probe_r8.py   (~3 min, idle box)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

from flexcalc_spark import registry

R8_KEYS = [
    "q_dedup_embed_lsh_wide",
    "q_dpp_prune",
    "q_target_encode",
    "q_link_predict",
    "q_holt_forecast",
    # re-planned this round (cache layout / oracle unchanged on the
    # Spark side except the repartition-before-cache)
    "q_dedup_neardup",
    "q_dedup_incremental",
    "q_sketch_cms",
    "q_trajectory_sim",
]


def main() -> None:
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    registry.load_all()
    for key in R8_KEYS:
        ts = {}
        for sf in ["/root/testdata/sf0.01", "/root/testdata/sf0.1"]:
            best = None
            for _ in range(3):
                spark.catalog.clearCache()
                df = registry.QUERIES[key](spark, sf)
                t0 = time.perf_counter()
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
