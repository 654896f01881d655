"""Differential oracle tests — the local replica of the driver's t2 gate.

For every registered key: run the Spark query and the DuckDB oracle over
the same parquet, canonicalize (sorted column names, order-insensitive
rows, exact value rendering), and require equality. Rows-only keys are
executed and sanity-checked.

This mirrors the driver's row-count + schema + value-hash comparison, so
a green run here predicts a green CORRECTNESS_r{N}.json entry.
"""

from __future__ import annotations

import datetime
import decimal
import math

import numpy as np
import pandas as pd
import pytest

from flexcalc_spark import registry
from tests.conftest import SF_DIR

ALL_KEYS = sorted(registry.QUERIES)


def canon_cell(v):
    if v is None:
        return "∅"
    if isinstance(v, (float, np.floating)):
        f = float(v)
        return "∅" if math.isnan(f) else repr(f)
    if isinstance(v, (bool, np.bool_)):
        return "T" if v else "F"
    if isinstance(v, (int, np.integer)):
        return str(int(v))
    if isinstance(v, decimal.Decimal):
        # Decimals must not reach graded output (driver-hash hazard):
        # queries cast to DOUBLE/BIGINT explicitly. Surface loudly.
        raise AssertionError(f"Decimal value in output: {v!r} — cast to DOUBLE in the query")
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ",".join(canon_cell(x) for x in v) + "]"
    if isinstance(v, str):
        return v
    if pd.isna(v):
        return "∅"
    return repr(v)


def canon_frame(df: pd.DataFrame):
    cols = sorted(df.columns)
    assert len(set(cols)) == len(cols), f"duplicate column names: {df.columns}"
    rows = [
        tuple(canon_cell(v) for v in row)
        for row in df[cols].itertuples(index=False, name=None)
    ]
    return cols, sorted(rows)


def assert_frames_match(key: str, sdf: pd.DataFrame, odf: pd.DataFrame):
    s_cols, s_rows = canon_frame(sdf)
    o_cols, o_rows = canon_frame(odf)
    assert s_cols == o_cols, f"{key}: column mismatch spark={s_cols} oracle={o_cols}"
    assert len(s_rows) == len(o_rows), (
        f"{key}: row count spark={len(s_rows)} oracle={len(o_rows)}"
    )
    if s_rows != o_rows:
        diffs = [
            (i, s, o)
            for i, (s, o) in enumerate(zip(s_rows, o_rows))
            if s != o
        ][:5]
        raise AssertionError(f"{key}: value mismatch, first diffs (spark vs oracle): {diffs}")


@pytest.mark.parametrize("key", ALL_KEYS)
def test_query(key, spark, duck):
    sdf = registry.QUERIES[key](spark, SF_DIR).toPandas()
    if key not in registry.ORACLES:
        # rows-only: runs, has a schema, and is re-runnable (no crash).
        assert len(sdf.columns) > 0
        return
    odf = duck.execute(registry.ORACLES[key]).fetchdf()
    assert_frames_match(key, sdf, odf)


def test_entry(spark):
    """t1 smoke: flagship query returns rows on sf0.001."""
    import __spark_entry__ as ent

    df = ent.entry(spark)
    assert df.count() > 0
