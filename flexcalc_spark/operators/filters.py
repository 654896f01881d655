"""Projection / filter / predicate operators (SURVEY.md §2.2).

Reference parity: flexcalc's subsampling (`sample=`/`skip=` params of
/root/reference/flexcalc/process.py::process_flex) and thresholding
(process.py::soft_threshold, analyze.py::binary_threshold) are,
relationally, filters and CASE WHEN projections — expressed here
declaratively so Catalyst pushes them into the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flexcalc_spark.registry import register
from flexcalc_spark.tables import table


@register(
    "q_project_expr",
    oracle="""
        SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS linenum,
               l_extendedprice * (1 - l_discount) * (1 + l_tax) AS net_price,
               l_extendedprice * l_discount AS disc_amount
        FROM lineitem
    """,
    family="filters",
    scale_notes="pure narrow projection; whole-stage codegen, no shuffle",
)
def q_project_expr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arithmetic expression projection (TPC-H net-price expression).

    Per-row FP outputs are emitted UNROUNDED: the same expression tree on
    the same input doubles is bit-identical IEEE on both engines, whereas
    ROUND diverges (Spark rounds the shortest-decimal repr HALF_UP, DuckDB
    rounds the binary value — money products tie at the 4th decimal)."""
    li = table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        F.col("l_linenumber").cast("bigint").alias("linenum"),
        (F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))).alias("net_price"),
        (F.col("l_extendedprice") * F.col("l_discount")).alias("disc_amount"),
    )


@register(
    "q_filter_pred",
    oracle="""
        SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS linenum,
               l_quantity, l_discount
        FROM lineitem
        WHERE l_quantity > 30 AND l_discount BETWEEN 0.05 AND 0.07
    """,
    family="filters",
    scale_notes="both predicates push into the parquet scan (PushedFilters)",
)
def q_filter_pred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Comparison + AND + BETWEEN predicates."""
    li = table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_quantity") > 30) & F.col("l_discount").between(0.05, 0.07)
    ).select(
        "l_orderkey",
        F.col("l_linenumber").cast("bigint").alias("linenum"),
        "l_quantity",
        "l_discount",
    )


@register(
    "q_filter_in_like",
    oracle="""
        SELECT p_partkey, p_name, p_type
        FROM part
        WHERE p_type IN ('ECONOMY', 'PROMO') AND p_name LIKE '%r%'
    """,
    family="filters",
    scale_notes="IN-list becomes parquet dictionary filter; LIKE '%r%' stays post-scan",
)
def q_filter_in_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-list and LIKE predicates."""
    p = table(spark, sf_dir, "part")
    return p.filter(
        F.col("p_type").isin("ECONOMY", "PROMO") & F.col("p_name").like("%r%")
    ).select("p_partkey", "p_name", "p_type")


@register(
    "q_filter_null",
    oracle="""
        SELECT o_orderkey,
               NULLIF(o_orderstatus, 'P') AS status_np,
               COALESCE(NULLIF(o_orderstatus, 'P'), 'PENDING') AS status_filled,
               CAST(NULLIF(o_orderstatus, 'P') IS NOT DISTINCT FROM NULL AS INT) AS is_p
        FROM orders
    """,
    family="filters",
    scale_notes="null handling is row-local; no shuffle",
)
def q_filter_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL semantics on a derived nullable column (fixtures are null-free:
    FIXTURES.md), exercising NULLIF / COALESCE / null-safe equality."""
    o = table(spark, sf_dir, "orders")
    status_np = F.nullif(F.col("o_orderstatus"), F.lit("P"))
    return o.select(
        "o_orderkey",
        status_np.alias("status_np"),
        F.coalesce(status_np, F.lit("PENDING")).alias("status_filled"),
        status_np.eqNullSafe(F.lit(None).cast("string")).cast("int").alias("is_p"),
    )


@register(
    "q_case_when",
    oracle="""
        SELECT CASE WHEN l_quantity < 10 THEN 'low'
                    WHEN l_quantity < 30 THEN 'mid'
                    ELSE 'high' END AS qty_band,
               COUNT(*) AS cnt,
               ROUND(CAST(SUM(CAST(floor(l_extendedprice * 1000000.0 + 0.5) AS BIGINT))
                          AS DOUBLE) / 1000000.0, 4) AS sum_price
        FROM lineitem
        GROUP BY 1
    """,
    family="filters",
    scale_notes="3-bucket band then partial+final hash agg; tiny shuffle",
)
def q_case_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional projection — the relational twin of flexcalc's
    threshold/segmentation (process.py::soft_threshold, R11)."""
    li = table(spark, sf_dir, "lineitem")
    band = (
        F.when(F.col("l_quantity") < 10, "low")
        .when(F.col("l_quantity") < 30, "mid")
        .otherwise("high")
        .alias("qty_band")
    )
    return (
        li.groupBy(band)
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            # integer-grid grouped money sum (the repo-wide determinism rule)
            F.round(
                F.sum(F.floor(F.col("l_extendedprice") * 1000000.0 + 0.5).cast("bigint"))
                .cast("double") / 1000000.0,
                4,
            ).alias("sum_price"),
        )
    )
