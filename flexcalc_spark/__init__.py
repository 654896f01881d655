"""flexcalc_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of cicwi/flexcalc (SURVEY.md), extended with
LLM-data-pipeline operators, designed for 100 TB scale.

Public surface:
    from flexcalc_spark import registry
    registry.load_all()
    registry.QUERIES  # key -> (spark, sf_dir) -> DataFrame
    registry.ORACLES  # key -> equivalent DuckDB SQL
"""

from flexcalc_spark import registry  # noqa: F401

__version__ = "0.1.0"
