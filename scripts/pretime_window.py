"""Pre-time the driver's grading window: run the FIRST 50 keys of
queries() order at sf0.01 exactly as the driver would (vanilla
session, toPandas + DuckDB oracle execution + canonical compare) and
print per-key and total wall-clock. Keeps the graded window inside the
driver's per-round budget before committing a GRADE_ORDER rotation.

Run: cd /tmp && python /root/repo/scripts/pretime_window.py
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from scripts.verify_keys import canon  # noqa: E402  (same canonicalizer)


def main() -> int:
    import duckdb
    from pyspark.sql import SparkSession

    spark = SparkSession.builder.master("local[8]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as ent

    con = duckdb.connect()
    sf = "/root/testdata/sf0.01"
    for t in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )
    qs, os_ = ent.queries(), ent.oracle_sql()
    window = list(qs)[:50]
    total = 0.0
    fails = []
    timings = []
    for k in window:
        t0 = time.monotonic()
        sdf = qs[k](spark, sf).toPandas()
        ok = True
        if k in os_:
            odf = con.execute(os_[k]).fetchdf()
            sc, oc = sorted(sdf.columns), sorted(odf.columns)
            srows = sorted(
                tuple(canon(v) for v in r)
                for r in sdf[sc].itertuples(index=False, name=None)
            )
            orows = sorted(
                tuple(canon(v) for v in r)
                for r in odf[oc].itertuples(index=False, name=None)
            )
            ok = sc == oc and srows == orows
        dt = time.monotonic() - t0
        total += dt
        timings.append((dt, k))
        if not ok:
            fails.append(k)
        print(f"  {k}: {dt:.2f}s {'OK' if ok else 'MISMATCH'}")
    print(f"TOTAL window wall-clock: {total:.1f}s over {len(window)} keys")
    print("slowest 5:", sorted(timings, reverse=True)[:5])
    print("RESULT:", "ALL MATCH" if not fails else f"FAILS: {fails}")
    spark.stop()
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
