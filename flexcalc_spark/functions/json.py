"""JSON extraction (SURVEY.md §2.2) — events.props is a JSON string
column of shape {"k": <int>} (FIXTURES.md).

Reference parity: flexcalc's geometry metadata is TOML parsed into dicts
(/root/reference/flexdata/data.py::read_flexray); the engine's analogue
for semi-structured sidecar data is JSON columns decoded declaratively
(get_json_object / from_json -> typed struct), never in Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

from flexcalc_spark.registry import register
from flexcalc_spark.tables import table

PROPS_SCHEMA = StructType([StructField("k", LongType())])


@register(
    "q_map_json",
    oracle="""
        SELECT event_id,
               CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
               CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_mod
        FROM events
    """,
    family="json",
    scale_notes="from_json with an explicit schema parses once into a struct (single pass); repeated get_json_object would re-parse per path",
)
def q_map_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON path extraction into typed columns via from_json + schema."""
    e = table(spark, sf_dir, "events")
    parsed = F.from_json(F.col("props"), PROPS_SCHEMA)
    return e.select(
        "event_id",
        parsed["k"].alias("k"),
        (parsed["k"] % 10).alias("k_mod"),
    )
