"""Scalar-function modules — importing registers the graded function keys."""

from flexcalc_spark.functions import (  # noqa: F401
    strings,
    datetime,
    math,
    arrays,
    json,
)
