"""Scan-family operators (SURVEY.md §2.2 "Scans / sources / sinks").

Reference parity: flexcalc reads whole TIFF stacks eagerly
(/root/reference/flexdata/data.py::read_stack — mount empty, symbol cite
per SURVEY §0); the Spark-native analogue is a columnar parquet scan with
column pruning and predicate pushdown, which Catalyst drives all the way
into the reader (verified in tests/test_plans.py: ReadSchema contains
only the selected columns).

Scale: at 100 TB these scans hit partitioned parquet; because the queries
only ever select what they need, partition pruning + row-group min/max
skipping apply unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flexcalc_spark.registry import register
from flexcalc_spark.tables import table


@register(
    "q_scan_project",
    oracle="SELECT l_orderkey, l_quantity FROM lineitem",
    family="scans",
    scale_notes="column pruning reaches the parquet reader (ReadSchema)",
)
def q_scan_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection-only scan: reads exactly two of lineitem's 11 columns."""
    return table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")


@register(
    "q_scan_count",
    oracle="SELECT COUNT(*) AS n FROM lineitem",
    family="scans",
    scale_notes="count(*) over parquet uses row-group metadata, no column IO",
)
def q_scan_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-scan count as a 1-row DataFrame."""
    return table(spark, sf_dir, "lineitem").agg(F.count(F.lit(1)).alias("n"))
