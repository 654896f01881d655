"""Source connectors: binary-file ingest + multimodal media tables."""

from flexcalc_spark.sources import binaryfiles  # noqa: F401
