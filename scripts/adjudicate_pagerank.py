"""q_pagerank driver-bench adjudication (VERDICT r8 item 3).

Driver bench series on UNCHANGED graph.py code: 1.258 s (r6) -> 1.457 s
(r7) -> 2.482 s (r8). This script reproduces the bench's exact timing
protocol (get_session shuffle=8, plan constructed outside the timer,
noop sink, clearCache between runs, best of N) on an idle box, and adds
the two diagnostics the verdict asked for:

  - per-run wall clocks (not just the min), so the variance is visible;
  - an Exchange census of the executed plan: if the 32-partition cached
    edge layout does NOT satisfy the per-iteration join's required
    distribution under the bench's 8 shuffle partitions, every
    iteration re-shuffles the full edge table and the regression is
    REAL with a plan-level cause; if the exchanges reuse the cached
    layout, the series is box drift.

Run: cd /tmp && python /root/repo/scripts/adjudicate_pagerank.py [runs]
"""
from __future__ import annotations

import re
import sys
import time

sys.path.insert(0, "/root/repo")

from flexcalc_spark import registry  # noqa: E402
from flexcalc_spark.session import get_session  # noqa: E402


def main() -> None:
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    sf_dir = "/root/testdata/sf0.1"
    registry.load_all()
    spark = get_session(app="pagerank-adjudicate", shuffle_partitions=8)
    try:
        # same warm-up as bench.py
        registry.QUERIES["q_agg_groupby"](spark, sf_dir).count()

        times = []
        for _ in range(runs):
            spark.catalog.clearCache()
            df = registry.QUERIES["q_pagerank"](spark, sf_dir)
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            times.append(round(time.perf_counter() - t0, 3))
        print(f"pagerank runs: {times}  min={min(times)}  max={max(times)}")

        # plan census AFTER execution (AQE final plan)
        spark.catalog.clearCache()
        df = registry.QUERIES["q_pagerank"](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        plan = df._jdf.queryExecution().executedPlan().toString()
        n_ex = len(re.findall(r"Exchange hashpartitioning", plan))
        n_imts = len(re.findall(r"InMemoryTableScan", plan))
        n_aqe_shuf = len(re.findall(r"AQEShuffleRead", plan))
        parts = re.findall(r"Exchange hashpartitioning\(([^)]*), (\d+)\)", plan)
        print(
            f"executed plan: {n_ex} hash exchanges, {n_imts} "
            f"InMemoryTableScans, {n_aqe_shuf} AQEShuffleReads"
        )
        print("exchange targets:", [(c.split(
            "#")[0], n) for c, n in parts])
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
