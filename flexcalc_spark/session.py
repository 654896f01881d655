"""SparkSession factory with the engine's pinned configuration.

Only used by our own tests/bench — the driver brings its own session, so
every per-session requirement that queries depend on (nanosAsLong for the
events table) is ALSO set at runtime in tables.py.

Scale posture: these configs are the local[32] rendering of the 100 TB
design (SURVEY.md §4.3): AQE on (runtime re-planning, skew-join split,
partition coalescing), broadcast threshold left at default 10 MB so the
dimension tables broadcast, Arrow enabled for every Python<->JVM crossing.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_session(app: str = "flexcalc-spark", cpus: int | None = None,
                shuffle_partitions: int | None = None) -> SparkSession:
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_SHUFFLE", "32"))
    builder = (
        SparkSession.builder.appName(app)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    return spark
