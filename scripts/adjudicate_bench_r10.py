"""BENCH_r09 near-doubling adjudication (VERDICT r9 item 1).

BENCH_r09 read 12.955 s vs 6.88 s in r8 with q_knn_cosine 4.75x,
q_knn_lsh 2.86x, q_dedup_minhash 2.45x on code untouched by the r9 diff.
The one global change r9 made was setting
``spark.sql.optimizer.canChangeCachedPlanOutputPartitioning=true`` in
tables.table() (applied to EVERY key's session). This script runs the
round-8/9 adjudication protocol:

  - subprocess-isolated arms (one SparkSession per measurement, so JVM
    state never leaks between arms);
  - INTERLEAVED rounds (arm order cycles within each round — same-box
    drift hits all arms equally);
  - per-key MIN across rounds compared, per-run times printed;
  - a variant matrix at BOTH shuffle=8 (bench session) and shuffle=200
    (the driver's vanilla session) — r9 measured the two can rank
    variants oppositely;
  - one HEAD arm with the r9 conf explicitly set back to ``false`` to
    rule the conf in or out.

Arms: head8, r8w8, headoff8 (shuffle=8), head200, r8w200 (shuffle=200).
The r8 worktree must exist first:
    git -C /root/repo worktree add /tmp/flexcalc_r8_worktree 58abe4f
Run:  cd /tmp && python /root/repo/scripts/adjudicate_bench_r10.py
Child: python adjudicate_bench_r10.py --child <repo> <shuffle> <conf>
Cleanup: git -C /root/repo worktree remove --force /tmp/flexcalc_r8_worktree
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

KEYS = ["q_knn_cosine", "q_knn_lsh", "q_dedup_minhash"]
R8_WORKTREE = "/tmp/flexcalc_r8_worktree"
RUNS_PER_ARM = 3
ROUNDS = 3


def child(repo: str, shuffle: int, conf: str) -> None:
    sys.path.insert(0, repo)
    from flexcalc_spark import registry
    from flexcalc_spark.session import get_session

    registry.load_all()
    spark = get_session(app="adjudicate-r10", shuffle_partitions=shuffle)
    try:
        if conf == "off":
            # pre-seed the set-once guard (present on HEAD only), then
            # force the r9 conf off for the whole arm
            try:
                from flexcalc_spark import tables

                tables._AQE_CACHED_PLAN_SET.add(
                    spark.sparkContext.applicationId
                )
            except Exception:
                pass
            spark.conf.set(
                "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
                "false",
            )
        sf_dir = "/root/testdata/sf0.1"
        # bench.py warm-up: codegen/listing + the Python worker pool
        registry.QUERIES["q_agg_groupby"](spark, sf_dir).count()
        registry.QUERIES["q_udaf_grouped"](
            spark, "/root/testdata/sf0.001"
        ).write.format("noop").mode("overwrite").save()
        out: dict[str, list[float]] = {}
        for key in KEYS:
            times = []
            for _ in range(RUNS_PER_ARM):
                spark.catalog.clearCache()
                df = registry.QUERIES[key](spark, sf_dir)
                t0 = time.perf_counter()
                df.write.format("noop").mode("overwrite").save()
                times.append(round(time.perf_counter() - t0, 3))
            out[key] = times
        print("CHILD_JSON:" + json.dumps(out))
    finally:
        spark.stop()


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        child(sys.argv[2], int(sys.argv[3]), sys.argv[4])
        return
    if not os.path.isdir(R8_WORKTREE):
        sys.exit(
            f"missing {R8_WORKTREE}: git -C /root/repo worktree add "
            f"{R8_WORKTREE} 58abe4f"
        )
    arms = [
        ("head8", "/root/repo", 8, "on"),
        ("r8w8", R8_WORKTREE, 8, "on"),
        ("headoff8", "/root/repo", 8, "off"),
        ("head200", "/root/repo", 200, "on"),
        ("r8w200", R8_WORKTREE, 200, "on"),
    ]
    results: dict[str, dict[str, list[float]]] = {
        name: {k: [] for k in KEYS} for name, *_ in arms
    }
    for rnd in range(ROUNDS):
        # rotate arm order each round so slot-in-round effects cancel
        order = arms[rnd % len(arms):] + arms[: rnd % len(arms)]
        for name, repo, shuffle, conf in order:
            p = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--child",
                 repo, str(shuffle), conf],
                capture_output=True, text=True, cwd="/tmp",
            )
            line = next(
                (l for l in p.stdout.splitlines()
                 if l.startswith("CHILD_JSON:")), None,
            )
            if line is None:
                print(f"round {rnd} arm {name} FAILED:\n{p.stderr[-2000:]}")
                continue
            got = json.loads(line[len("CHILD_JSON:"):])
            for k, ts in got.items():
                results[name][k].extend(ts)
            print(f"round {rnd} {name}: "
                  + " ".join(f"{k}={min(ts)}" for k, ts in got.items()))
    print("\n=== per-key MIN across all rounds ===")
    header = ["key"] + [name for name, *_ in arms]
    print("  ".join(f"{h:>12}" for h in header))
    for k in KEYS:
        row = [k] + [
            f"{min(results[name][k]):.3f}" if results[name][k] else "-"
            for name, *_ in arms
        ]
        print("  ".join(f"{c:>12}" for c in row))
    print("\nraw:", json.dumps(results))


if __name__ == "__main__":
    main()
