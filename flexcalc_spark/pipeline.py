"""Batch pipeline scheduler — the flexcalc batch layer re-expressed
(SURVEY §2.1 R24: /root/reference/flexcalc/batch.py::scheduler).

The reference builds a lazy node pipeline (read_data -> process nodes ->
write_data), then ``run()`` pushes dataset blocks through it with
scratch-disk buffering and per-dataset failure tracking. The Spark-native
rendering:

- a node = a ``DataFrame -> DataFrame`` transform (lazy by construction —
  Spark's DAG IS the pipeline; no scratch management needed, shuffle
  spill replaces memmap buffers);
- ``run()`` triggers one job per sink, per dataset, with per-dataset
  try/except -> a status table (the reference's per-block status flags);
- merge nodes (tile stitching) consume several upstream datasets.

This is deliberately a THIN veneer: the value of the Spark rendering is
that the scheduler disappears into the engine (SURVEY §2.1 R24 mapping
"the entire Spark engine"), and what remains is bookkeeping: dataset
enumeration, failure isolation, status reporting.
"""

from __future__ import annotations

import traceback
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

Node = Callable[[DataFrame], DataFrame]


@dataclass
class DatasetStatus:
    dataset_id: str
    ok: bool
    rows_written: int
    error: str = ""


@dataclass
class Pipeline:
    """Lazy per-dataset pipeline with failure isolation.

    Usage (mirrors batch.py::scheduler's add-nodes-then-run shape):

        p = Pipeline(spark)
        p.read_data(lambda spark, ds_id: <slice DataFrame for ds_id>)
        p.node(lambda df: ct.preprocess(df, flat, dark))
        p.node(ct.residual_rings)
        p.write_data(lambda df, ds_id: df.write.mode("overwrite")
                        .parquet(f"{out}/{ds_id}"))
        statuses = p.run(["scan_a", "scan_b", ...])
    """

    spark: SparkSession
    _reader: Callable[[SparkSession, str], DataFrame] | None = None
    _nodes: list[Node] = field(default_factory=list)
    _writer: Callable[[DataFrame, str], None] | None = None

    def read_data(self, reader: Callable[[SparkSession, str], DataFrame]) -> "Pipeline":
        self._reader = reader
        return self

    def node(self, fn: Node) -> "Pipeline":
        """Append a lazy transform node (batch.py's FDK/soft_threshold/
        cast2type/... node slots)."""
        self._nodes.append(fn)
        return self

    def write_data(self, writer: Callable[[DataFrame, str], None]) -> "Pipeline":
        self._writer = writer
        return self

    def build(self, dataset_id: str) -> DataFrame:
        """Compose the lazy plan for one dataset (no execution)."""
        if self._reader is None:
            raise ValueError("pipeline has no read_data node")
        df = self._reader(self.spark, dataset_id)
        for fn in self._nodes:
            df = fn(df)
        return df

    def run(self, dataset_ids: list[str]) -> list[DatasetStatus]:
        """Execute per dataset with failure isolation — one dataset's
        error never aborts the batch (batch.py's per-block status)."""
        statuses: list[DatasetStatus] = []
        for ds_id in dataset_ids:
            try:
                df = self.build(ds_id)
                if self._writer is not None:
                    # persist so count + write share one computation of
                    # the (kernel-heavy) lineage instead of running the
                    # whole pipeline twice per dataset
                    df = df.persist()
                    try:
                        n = df.count()
                        self._writer(df, ds_id)
                    finally:
                        df.unpersist()
                else:
                    n = df.count()
                statuses.append(DatasetStatus(ds_id, True, n))
            except Exception as exc:  # noqa: BLE001 - isolation is the point
                statuses.append(
                    DatasetStatus(
                        ds_id, False, 0,
                        f"{type(exc).__name__}: {exc}\n{traceback.format_exc(limit=2)}",
                    )
                )
        return statuses

    def status_frame(self, statuses: list[DatasetStatus]) -> DataFrame:
        """Status table as a DataFrame (the reference prints per-block
        flags; a table is the queryable equivalent)."""
        return self.spark.createDataFrame(
            [(s.dataset_id, s.ok, s.rows_written, s.error) for s in statuses],
            "dataset_id string, ok boolean, rows_written long, error string",
        )
