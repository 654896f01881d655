"""Round-7 scaling probe: 10x-data wall-clock ratios for the round-7
additions (the TPC-H completion set + anchor debounce) and the two
re-planned keys (q_sql_tpch4 aggregate-reduction, q_degree_dist
map-side pair dedup, q_survival histogram swap, q_market_basket
a-priori pruning).

Same protocol as scripts/scale_probe_r5.py: best of 3 noop-sink runs
per key at sf0.01 and sf0.1 on local[8]; ratio ~<=10x on 10x rows
means the plan is scan/shuffle-bound with no superlinear term.
Prints the lines recorded in SCALE.md "Round-7 measurements".

Run: python scripts/scale_probe_r7.py   (~4 min, idle box)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

from flexcalc_spark import registry

R7_KEYS = [
    "q_sql_tpch1",
    "q_sql_tpch2",
    "q_sql_tpch6",
    "q_sql_tpch9",
    "q_sql_tpch11",
    "q_sql_tpch12",
    "q_sql_tpch13",
    "q_sql_tpch15",
    "q_sql_tpch16",
    "q_sql_tpch17",
    "q_sql_tpch20",
    "q_sql_tpch21",
    "q_sql_tpch22",
    "q_debounce_anchor",
    # re-planned this round
    "q_sql_tpch4",
    "q_degree_dist",
    "q_survival",
    "q_market_basket",
    # session-3 additions. Caveat: q_bfs_hops / q_sssp_cost run their
    # frontier loops eagerly (localCheckpoint per level) during plan
    # construction, so the noop-sink timing below captures only the
    # final checkpoint scan — use scripts/pretime_window.py for their
    # end-to-end wall-clock. q_dedup_containment's census is quadratic
    # on this fixture (bounded gram vocabulary — see SCALE.md).
    "q_dedup_containment",
    "q_bfs_hops",
    "q_sssp_cost",
    "q_cuped",
    "q_srm_check",
]


def main() -> None:
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    registry.load_all()
    for key in R7_KEYS:
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
