"""Sort / limit / top-k operators (SURVEY.md §2.2 "Sorts / limits").

Every LIMIT carries a total-order tiebreak key — without one the row set
itself is nondeterministic and no hashing discipline can save it.

Scale: global ORDER BY ... LIMIT k compiles to TakeOrderedAndProject —
each partition keeps only its local top-k, the driver merges k*partitions
rows. No global sort is ever materialized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flexcalc_spark.registry import register
from flexcalc_spark.tables import table


@register(
    "q_sort_multi",
    oracle="""
        SELECT c_custkey, bal
        FROM (SELECT c_custkey,
                     CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END AS bal
              FROM customer)
        ORDER BY bal DESC NULLS LAST, c_custkey
        LIMIT 100
    """,
    family="sorts",
    scale_notes="multi-key sort + nulls ordering, bounded by LIMIT -> TakeOrderedAndProject",
)
def q_sort_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key sort with explicit NULLS LAST over a derived nullable
    column (fixtures are null-free; negatives become NULL)."""
    c = table(spark, sf_dir, "customer")
    bal = F.when(F.col("c_acctbal") < 0, F.lit(None).cast("double")).otherwise(
        F.col("c_acctbal")
    )
    return (
        c.select("c_custkey", bal.alias("bal"))
        .orderBy(F.col("bal").desc_nulls_last(), "c_custkey")
        .limit(100)
    )


@register(
    "q_topk",
    oracle="""
        SELECT o_orderkey, o_totalprice
        FROM orders
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 10
    """,
    family="sorts",
    scale_notes="TakeOrderedAndProject: per-partition top-10 heap, driver merge — O(n) not O(n log n)",
)
def q_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-10 with tiebreak."""
    o = table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .select("o_orderkey", "o_totalprice")
        .limit(10)
    )


@register(
    "q_limit_offset",
    oracle="""
        SELECT o_orderkey, o_totalprice
        FROM orders
        ORDER BY o_orderkey
        LIMIT 10 OFFSET 10
    """,
    family="sorts",
    scale_notes="offset requires a total order; deep pagination at scale should be keyset-based (WHERE key > last) instead",
)
def q_limit_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIMIT/OFFSET pagination over a total order (Spark 4 offset())."""
    o = table(spark, sf_dir, "orders")
    return (
        o.orderBy("o_orderkey")
        .select("o_orderkey", "o_totalprice")
        .offset(10)
        .limit(10)
    )
