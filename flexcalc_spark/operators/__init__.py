"""Operator modules — importing this package registers every graded query."""

from flexcalc_spark.operators import (  # noqa: F401
    scans,
    filters,
    aggregates,
    joins,
    windows,
    sorts,
    setops,
    textstats,
    dedup,
    sampling,
    vectors,
    udfs,
    ct_queries,
    multimodal,
    subqueries,
    quality,
    curation,
    bucketing,
    sketches,
    sinks,
)
