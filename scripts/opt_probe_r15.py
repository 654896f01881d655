"""Round-15 optimization probe: time EVERY registered key end-to-end at
sf0.1 (construction + noop sink, best-of-N) and capture its formatted
plan + plan-shape stats (Exchange count, join strategies, Python-eval
nodes, PushedFilters) — guide §1 "measure first" applied to the whole
registry, not just the 23 bench keys.

Chunked: run one slice per process (the r12/r13 one-JVM sweep-OOM
lesson) —

    cd /tmp && python /root/repo/scripts/opt_probe_r15.py <start> <end> \
        [--runs N] [--out /root/repo/plans/r15/probe_<start>_<end>.json]

Eager keys (materialize_local / driver-loop keys) do all work during
construction; their "plan" is the local-relation tail — the timing is
still honest end-to-end (same convention as bench.py r15).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, "/root/repo")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def plan_stats(txt: str) -> dict:
    """Shape stats from an explain('formatted') string. Node names are
    counted from the numbered tree lines '(n) NodeName' (each node
    prints twice otherwise — CLAUDE.md formatted-plan rule)."""
    nodes = re.findall(r"\(\d+\) ([A-Za-z0-9_]+)", txt)
    from collections import Counter

    c = Counter(nodes)
    return {
        "exchanges": sum(v for k, v in c.items() if k.startswith("Exchange")),
        "smj": c.get("SortMergeJoin", 0),
        "bhj": c.get("BroadcastHashJoin", 0),
        "shj": c.get("ShuffledHashJoin", 0),
        "bnlj": c.get("BroadcastNestedLoopJoin", 0),
        "cartesian": c.get("CartesianProduct", 0),
        "py_eval": sum(
            c.get(k, 0)
            for k in (
                "BatchEvalPython",
                "ArrowEvalPython",
                "MapInPandas",
                "MapInArrow",
                "FlatMapGroupsInPandas",
                "AggregateInPandas",
            )
        ),
        "sorts": c.get("Sort", 0),
        "window": c.get("Window", 0) + c.get("WindowGroupLimit", 0),
        "pushed_filters": len(
            re.findall(r"PushedFilters: \[(?!\])", txt)
        ),
        "scans": c.get("Scan", 0) + c.get("ColumnarToRow", 0),
        "n_nodes": len(nodes),
    }


def main() -> int:
    named: list[str] | None = None
    if len(sys.argv) > 1 and sys.argv[1] == "--keys":
        named = sys.argv[2].split(",")
        start, end = 0, 0
        args = sys.argv[3:]
    else:
        start = int(sys.argv[1]) if len(sys.argv) > 1 else 0
        end = int(sys.argv[2]) if len(sys.argv) > 2 else 10**9
        args = sys.argv[3:]
    runs = 1
    out_path = None
    i = 0
    while i < len(args):
        if args[i] == "--runs":
            runs = int(args[i + 1])
            i += 2
        elif args[i] == "--out":
            out_path = args[i + 1]
            i += 2
        else:
            i += 1

    from flexcalc_spark import registry
    from flexcalc_spark.session import get_session

    registry.load_all()
    keys = named if named is not None else list(registry.QUERIES)[start:end]

    spark = get_session(app="opt-probe-r15", shuffle_partitions=int(
        os.environ.get("SPARK_GRAFT_SHUFFLE", "8")))
    results: dict[str, dict] = {}
    # warm-up: JVM + python worker pool
    registry.QUERIES["q_agg_groupby"](spark, SF_DIR).count()
    try:
        for k in keys:
            best = None
            err = None
            plan_txt = ""
            for _ in range(runs):
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                try:
                    df = registry.QUERIES[k](spark, SF_DIR)
                    df.write.format("noop").mode("overwrite").save()
                except Exception as e:  # noqa: BLE001 — probe must survive
                    err = f"{type(e).__name__}: {e}"[:300]
                    best = None   # an erroring key must not also rank by
                    break         # a timing from an earlier run (r15 review)
                dt = time.perf_counter() - t0
                best = dt if best is None or dt < best else best
            if err is None:
                try:
                    plan_txt = df._sc._jvm.PythonSQLUtils.explainString(
                        df._jdf.queryExecution(), "formatted"
                    )
                except Exception:
                    try:
                        import io
                        from contextlib import redirect_stdout

                        buf = io.StringIO()
                        with redirect_stdout(buf):
                            df.explain("formatted")
                        plan_txt = buf.getvalue()
                    except Exception as e:  # noqa: BLE001
                        plan_txt = f"<explain failed: {e}>"
            results[k] = {
                "sec": round(best, 3) if best is not None else None,
                "err": err,
                **(plan_stats(plan_txt) if plan_txt else {}),
            }
            pd = os.path.join("/root/repo/plans/r15/full")
            os.makedirs(pd, exist_ok=True)
            if plan_txt:
                with open(os.path.join(pd, f"{k}.txt"), "w") as f:
                    f.write(plan_txt)
            print(f"{k}: {results[k].get('sec')}s "
                  f"exch={results[k].get('exchanges')} err={err}",
                  flush=True)
    finally:
        spark.stop()

    if out_path:
        os.makedirs(os.path.dirname(out_path), exist_ok=True)
        with open(out_path, "w") as f:
            json.dump(results, f, indent=1, sort_keys=True)
    slow = sorted(
        ((v["sec"], k) for k, v in results.items() if v["sec"] is not None),
        reverse=True,
    )[:15]
    print("SLOWEST:", [(k, s) for s, k in slow])
    errs = {k: v["err"] for k, v in results.items() if v["err"]}
    print("ERRORS:", errs if errs else "none")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
