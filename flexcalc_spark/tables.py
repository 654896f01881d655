"""Fixture-table access (SURVEY.md §1.2, FIXTURES.md).

``table(spark, sf_dir, name)`` is the single scan entry point for every
query. It owns two cross-cutting concerns:

1. ``events.ts`` is parquet TIMESTAMP(NANOS), which Spark 4's reader
   rejects outright (PARQUET_TYPE_ILLEGAL). We set
   ``spark.sql.legacy.parquet.nanosAsLong`` at runtime (it is a session
   conf, so this works on the driver's session too) and expose ``ts`` as
   a BIGINT of epoch nanoseconds. Derived integer columns (``ts_us``,
   ``ts_sec``) are what queries consume — integer epoch math is exact and
   engine-portable, unlike ns->us timestamp truncation (SURVEY §2.2
   determinism rules).

2. Explicit scans per table, so Catalyst sees a plain parquet relation
   and pushdown/pruning work untouched. At 100 TB the same call site is
   where partitioned layouts (lineitem by ship-month, events by day)
   would be mounted — the query code is layout-agnostic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

# events.ts integer epoch derivations, shared by every event-time query.
NS_PER_US = 1_000
NS_PER_SEC = 1_000_000_000


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one fixture table as a plain parquet DataFrame."""
    if name == "events":
        # Session conf; safe to set repeatedly. Required because the file
        # stores TIMESTAMP(NANOS,false) which Spark cannot read natively.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def table_parallel(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan + repartition to the session's default parallelism.

    The fixture tables are single parquet files well under one 128 MB
    split, so Spark reads them as ONE partition — and every downstream
    per-row computation (minhash signatures, LSH projections, n-gram
    shingling) would run single-threaded. A cheap narrow-payload shuffle
    buys full-core parallelism for the compute-heavy stage. At 100 TB the
    input has thousands of row-group splits and this repartition becomes
    a no-op decision to revisit per layout — the call site marks exactly
    where compute parallelism matters.
    """
    df = table(spark, sf_dir, name)
    return df.repartition(spark.sparkContext.defaultParallelism)


def events_with_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events plus exact integer time columns.

    ts (ns, BIGINT) -> ts_us (µs) and ts_sec (s) via integer division:
    exact, monotone, and identical to DuckDB's epoch_us()/epoch() on the
    original TIMESTAMP_NS values.
    """
    e = table(spark, sf_dir, "events")
    return (
        e.withColumn("ts_us", F.expr(f"ts div {NS_PER_US}"))
        .withColumn("ts_sec", F.expr(f"ts div {NS_PER_SEC}"))
    )


def register_views(spark: SparkSession, sf_dir: str, prefix: str = "") -> None:
    """Register temp views for spark.sql-based queries (grouping sets &c)."""
    for name in TABLES:
        table(spark, sf_dir, name).createOrReplaceTempView(prefix + name)
