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
from pyspark.sql.window import Window

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


# --- q_global_rank -------------------------------------------------------
# price-grid block width for the two-phase global rank: fixture grid
# spans ~[9.0e8, 1.05e11] so 4e9-wide blocks give O(26) of them; block
# boundaries align with the grid so ties can never straddle blocks (the
# RANK offset proof needs earlier blocks strictly smaller).
_RANK_BLOCK_GRID = 4_000_000_000


@register(
    "q_global_rank",
    oracle="""
        WITH g AS (
            SELECT l_orderkey, l_linenumber,
                   CAST(floor(l_extendedprice * 1000000.0 + 0.5) AS BIGINT)
                       AS price_grid
            FROM lineitem
        )
        SELECT l_orderkey, l_linenumber, price_grid,
               CAST(RANK() OVER (ORDER BY price_grid) AS BIGINT) AS rnk
        FROM g
    """,
    family="sorts",
    scale_notes=(
        "GLOBAL rank without a global-order window: the single-task "
        "sort every naive RANK() OVER (ORDER BY x) plan serializes into "
        "is replaced by the two-phase block decomposition (the "
        "q_concurrency/q_skyline machinery) — value-range blocks rank "
        "locally in parallel, the per-block row-count table (one row "
        "per block) prefix-sums into offsets, and global rank = local "
        "rank + offset via a broadcast join. Grid-aligned block "
        "boundaries keep ties inside one block so RANK tie semantics "
        "survive the split; the oracle is the serializing global "
        "window, so the driver hash certifies the decomposition. At "
        "100 TB derive block edges from approx_percentile so value "
        "skew cannot overload a block — this is exactly how "
        "repartitionByRange samples its ranges"
    ),
)
def q_global_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global RANK of every lineitem by price grid — two-phase block
    decomposition, no single-task global sort."""
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        F.floor(F.col("l_extendedprice") * 1000000.0 + 0.5)
        .cast("bigint")
        .alias("price_grid"),
    )
    li = li.withColumn(
        "block", F.expr(f"price_grid div {_RANK_BLOCK_GRID}")
    )
    w_local = Window.partitionBy("block").orderBy("price_grid")
    local = li.withColumn("local_rank", F.rank().over(w_local))
    counts = li.groupBy("block").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    w_prev = Window.orderBy("block").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = counts.withColumn(
        "offset", F.coalesce(F.sum("n").over(w_prev), F.lit(0))
    ).select("block", "offset")
    return local.join(F.broadcast(offsets), "block").select(
        "l_orderkey",
        "l_linenumber",
        "price_grid",
        (F.col("local_rank") + F.col("offset")).cast("bigint").alias("rnk"),
    )
