"""UDF / UDAF / UDTF surface (SURVEY.md §2.2 "UDF surface").

Reference parity: flexcalc's CT kernels (process.py::preprocess et al.)
are numpy functions over arrays — in this engine that role is played by
Arrow-vectorized pandas UDFs. The three keys here deliberately compute
SQL-expressible results so the DuckDB oracle validates the UDF plumbing
(Arrow batches, grouped aggregation, lateral table functions) itself.

Scale: pandas UDFs move Arrow record batches (zero-copy columnar), never
per-row pickling. The JVM<->Python crossing is still ~10x a native
expression — production queries stay JVM-side; UDFs are for logic Spark
genuinely cannot express (SURVEY §3.2 boundary rule).

Note: UDF objects are built lazily inside the query functions — a
module-level @pandas_udf decorator needs an active SparkSession to parse
its DDL return type, which would break import before session creation.
"""

from __future__ import annotations

from functools import cache

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf, udtf

from flexcalc_spark.registry import register
from flexcalc_spark.tables import table, events_with_time

US_PER_DAY = 86_400_000_000.0


@cache
def _token_count_udf():
    @pandas_udf("bigint")
    def token_count(text: pd.Series) -> pd.Series:
        """Vectorized whitespace token count (Arrow-batched)."""
        return text.str.split(" ").str.len().astype("int64")

    return token_count


@register(
    "q_udf_scalar",
    oracle="""
        SELECT doc_id,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
        FROM documents
    """,
    family="udf",
    scale_notes="scalar pandas UDF: Arrow batch in, Arrow batch out; ~vectorized-numpy throughput per core",
)
def q_udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar vectorized UDF, oracle-checked against native split+len."""
    d = table(spark, sf_dir, "documents")
    return d.select("doc_id", _token_count_udf()(F.col("text")).alias("n_tok"))


@cache
def _ols_slope_udf():
    @pandas_udf("double")
    def ols_slope(x: pd.Series, y: pd.Series) -> float:
        """OLS slope via centered covariance sums (the regr_slope formula,
        float64 — matches the oracle's arithmetic to ulps)."""
        xv = x.to_numpy(dtype=np.float64)
        yv = y.to_numpy(dtype=np.float64)
        xc = xv - xv.mean()
        denom = float(np.dot(xc, xc))
        if denom == 0.0:
            return float("nan")
        return float(np.dot(xc, yv - yv.mean()) / denom)

    return ols_slope


@register(
    "q_udaf_grouped",
    oracle="""
        SELECT user_id,
               ROUND(regr_slope(value, epoch_us(ts) / 86400000000.0), 4) + 0.0 AS slope
        FROM events
        GROUP BY user_id
    """,
    family="udf",
    scale_notes="grouped-agg pandas UDF: one Arrow batch per group; groups (users) are numerous and small — ideal partitioning",
)
def q_udaf_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user OLS slope of value over time (days) as a grouped-agg
    pandas UDF, oracle-checked against DuckDB regr_slope."""
    e = events_with_time(spark, sf_dir)
    x_days = (F.col("ts_us") / F.lit(US_PER_DAY)).alias("x_days")
    slope = _ols_slope_udf()
    return (
        e.select("user_id", x_days, "value")
        .groupBy("user_id")
        .agg((F.round(slope(F.col("x_days"), F.col("value")), 4) + 0.0).alias("slope"))
    )


@cache
def _tokenize_udtf():
    @udtf(returnType="tok: string, pos: bigint")
    class TokenizeUDTF:
        """Python UDTF (Spark 4): one document -> one row per token."""

        def eval(self, text: str):
            if text is None:
                return
            for i, tok in enumerate(text.split(" "), start=1):
                yield tok, i

    return TokenizeUDTF


@register(
    "q_udtf_expand",
    oracle="""
        SELECT doc_id,
               unnest(string_split(text, ' ')) AS tok,
               unnest(range(1, len(string_split(text, ' ')) + 1)) AS pos
        FROM documents
    """,
    family="udf",
    scale_notes="UDTF via LATERAL: row expansion happens executor-side in the Python worker, streamed as Arrow batches",
)
def q_udtf_expand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lateral table-function expansion: document -> (token, position)."""
    table(spark, sf_dir, "documents").createOrReplaceTempView("documents_udtf")
    spark.udtf.register("tokenize_udtf", _tokenize_udtf())
    return spark.sql(
        """
        SELECT d.doc_id, t.tok, t.pos
        FROM documents_udtf d, LATERAL tokenize_udtf(d.text) t
        """
    )
