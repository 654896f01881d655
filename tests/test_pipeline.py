"""Pipeline scheduler tests (R24) + parquet/csv sink roundtrips
(SURVEY §2.2 "(sinks)" row).
"""

from __future__ import annotations

import numpy as np
import pytest

from flexcalc_spark import ct
from flexcalc_spark.pipeline import Pipeline


def _phantom(seed):
    rng = np.random.RandomState(seed)
    vol = rng.uniform(0, 0.01, size=(4, 8, 8)).astype(np.float32)
    vol[1:3, 2:6, 2:6] += 1.0
    return vol


def test_pipeline_end_to_end(spark, tmp_path):
    """read -> preprocess -> dering -> write parquet, two datasets."""
    flat = np.full((8, 8), 2.0, dtype=np.float32)
    dark = np.zeros((8, 8), dtype=np.float32)
    out = str(tmp_path / "out")

    p = (
        Pipeline(spark)
        .read_data(lambda s, ds: ct.slices_from_array(s, ds, _phantom(len(ds))))
        .node(lambda df: ct.preprocess(df, flat, dark))
        .node(ct.residual_rings)
        .write_data(lambda df, ds: df.write.mode("overwrite").parquet(f"{out}/{ds}"))
    )
    statuses = p.run(["scan_a", "scan_bb"])
    assert all(s.ok for s in statuses)
    assert all(s.rows_written == 4 for s in statuses)
    # sink roundtrip: parquet preserves the slice table
    back = spark.read.parquet(f"{out}/scan_a")
    assert back.count() == 4
    vol = ct.array_from_slices(back)
    assert vol.shape == (4, 8, 8) and np.isfinite(vol).all()


def test_pipeline_failure_isolation(spark):
    """One failing dataset doesn't abort the batch (batch.py per-block
    status semantics)."""

    def reader(s, ds):
        if ds == "bad":
            raise IOError("corrupt scan")
        return ct.slices_from_array(s, ds, _phantom(1))

    p = Pipeline(spark).read_data(reader)
    statuses = {s.dataset_id: s for s in p.run(["good", "bad", "also_good"])}
    assert statuses["good"].ok and statuses["also_good"].ok
    assert not statuses["bad"].ok
    assert "corrupt scan" in statuses["bad"].error
    sf = p.status_frame(list(statuses.values()))
    assert sf.filter("ok").count() == 2


def test_csv_sink_roundtrip(spark, tmp_path):
    """CSV sink for small relational outputs."""
    from flexcalc_spark import registry
    from tests.conftest import SF_DIR

    df = registry.QUERIES["q_agg_groupby"](spark, SF_DIR)
    path = str(tmp_path / "q1_csv")
    df.write.mode("overwrite").option("header", True).csv(path)
    back = spark.read.option("header", True).csv(path)
    assert back.count() == df.count()
    assert set(back.columns) == set(df.columns)
