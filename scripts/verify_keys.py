"""Verify specific graded keys against the DuckDB oracle at sf0.01.

Usage: cd /tmp && python /root/repo/scripts/verify_keys.py q_ngram_lm ...
(no args = every oracle-backed key). Mirrors the driver's compare:
vanilla SparkSession, column sort by name, canonicalized value rows.
"""

from __future__ import annotations

import datetime
import decimal
import math
import sys

sys.path.insert(0, "/root/repo")


def canon(v):
    import numpy as _np

    if isinstance(v, (list, tuple, _np.ndarray)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    if v is None:
        return "∅"
    if isinstance(v, float):
        return "∅" if math.isnan(v) else repr(v)
    if isinstance(v, decimal.Decimal):
        return "DECIMAL!" + str(v)
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    return str(v)


def main() -> int:
    import duckdb
    from pyspark.sql import SparkSession

    spark = SparkSession.builder.master("local[8]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as ent

    import os

    con = duckdb.connect()
    # SPARK_GRAFT_VERIFY_SF overrides for the sf0.1 spot-check gate
    sf = os.environ.get("SPARK_GRAFT_VERIFY_SF", "/root/testdata/sf0.01")
    for t in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )
    qs, os_ = ent.queries(), ent.oracle_sql()
    keys = sys.argv[1:] or [k for k in qs if k in os_]
    fails = []
    for k in keys:
        sdf = qs[k](spark, sf).toPandas()
        # drop cached relations between keys: a full-registry sweep at
        # sf0.1 accumulates enough driver state in one JVM that key
        # ~205 died broadcasting (r12) — caches are per-key scratch,
        # never shared across keys, so clearing them is free
        spark.catalog.clearCache()
        if k not in os_:
            print(f"  {k}: rows-only, {len(sdf)} rows")
            continue
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
        if not ok:
            fails.append(k)
            if sc != oc:
                print(f"  {k}: SCHEMA spark={sc} oracle={oc}")
            else:
                diff = [
                    (a, b) for a, b in zip(srows, orows) if a != b
                ][:3]
                print(f"  {k}: first diffs {diff}")
        print(f"  {k}: {'MATCH' if ok else 'MISMATCH'} ({len(srows)} rows)")
    print("RESULT:", "ALL MATCH" if not fails else f"FAILS: {fails}")
    spark.stop()
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
