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

from collections.abc import Callable
from typing import Any

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}
META: dict[str, dict[str, Any]] = {}


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
        QUERIES[key] = fn
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
