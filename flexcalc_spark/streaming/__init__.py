"""Structured Streaming modules — importing registers the streaming keys."""

from flexcalc_spark.streaming import (  # noqa: F401
    windows,
    stateful,
)
