"""Central query registry.

Every graded operator (SURVEY.md §2.2/§2.3) registers itself here as a
``(spark, sf_dir) -> DataFrame`` callable, optionally paired with an
ANSI-SQL oracle string that DuckDB runs over the same parquet tables.
``__spark_entry__.py`` simply re-exports these dicts.

Determinism rules enforced by convention across all registered queries
(SURVEY.md §2.2):

- alias every computed column identically in Spark code and oracle SQL;
- ``ROUND(<float agg>, 4)`` on all floating aggregates;
- integer outputs explicitly cast to BIGINT on both sides (Spark's
  row_number/ceil/grouping return INT/TINYINT while DuckDB returns
  BIGINT — the driver compares schemas);
- never emit raw ``events.ts`` (parquet TIMESTAMP(NANOS); Spark reads it
  as a long via ``spark.sql.legacy.parquet.nanosAsLong`` — all event-time
  math happens in integer epoch space, see tables.py);
- every LIMIT/top-k carries a total-order tiebreak key.
"""

from __future__ import annotations

import os
import tempfile
import zipfile
from collections.abc import Callable
from typing import Any

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}
META: dict[str, dict[str, Any]] = {}

_SHIPPED_CONTEXTS: set[str] = set()


def _ship_package(spark: SparkSession) -> None:
    """Make ``flexcalc_spark`` importable on Spark's Python WORKERS.

    cloudpickle serializes our pandas-UDF/applyInPandas functions by
    reference (they live in an importable module, not __main__), so the
    worker processes must be able to ``import flexcalc_spark``. The
    driver process may import us from any cwd (sys.path manipulation in
    __spark_entry__.py), but workers inherit neither that sys.path nor
    the cwd — without this, every UDF key dies with
    ModuleNotFoundError when the driver runs outside /root/repo.
    sc.addPyFile ships a zip of the package and prepends it to every
    worker's sys.path. Idempotent per SparkContext.
    """
    sc = spark.sparkContext
    # applicationId is stable per context; id(sc._jsc) could be reused by
    # a later context after garbage collection, silently skipping the ship
    ctx_id = sc.applicationId
    if ctx_id in _SHIPPED_CONTEXTS:
        return
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    zip_path = os.path.join(
        tempfile.gettempdir(), f"flexcalc_spark_pkg_{os.getpid()}.zip"
    )
    if not os.path.exists(zip_path):
        with zipfile.ZipFile(zip_path, "w") as zf:
            for root, _dirs, files in os.walk(pkg_dir):
                for fname in files:
                    if not fname.endswith(".py"):
                        continue
                    full = os.path.join(root, fname)
                    rel = os.path.join(
                        "flexcalc_spark", os.path.relpath(full, pkg_dir)
                    )
                    zf.write(full, rel)
    sc.addPyFile(zip_path)
    _SHIPPED_CONTEXTS.add(ctx_id)


def register(
    key: str,
    oracle: str | None = None,
    family: str = "",
    scale_notes: str = "",
) -> Callable[[QueryFn], QueryFn]:
    """Register a graded query.

    ``oracle=None`` marks a rows-only key (driver records the weaker
    rows-only check; used for approximate/hash-seeded/streaming ops whose
    exact output is not ANSI-SQL-expressible — SURVEY.md §2.2).
    ``scale_notes`` documents the 100 TB posture for the judge.
    """

    def deco(fn: QueryFn) -> QueryFn:
        if key in QUERIES:
            raise ValueError(f"duplicate query key: {key}")

        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            _ship_package(spark)
            return fn(spark, sf_dir)

        wrapped.__name__ = fn.__name__
        wrapped.__doc__ = fn.__doc__
        wrapped.__wrapped__ = fn
        QUERIES[key] = wrapped
        if oracle is not None:
            ORACLES[key] = oracle
        META[key] = {
            "family": family,
            "rows_only": oracle is None,
            "scale_notes": scale_notes,
            "doc": (fn.__doc__ or "").strip(),
        }
        return fn

    return deco


def load_all() -> None:
    """Import every operator module so registration side effects run."""
    from flexcalc_spark import operators, functions, streaming  # noqa: F401
