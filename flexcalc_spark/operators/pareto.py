"""Pareto frontier (skyline) — dominance filtering without an n² join.

The skyline of a set under (minimize price, maximize size) keeps every
row no other row strictly beats in both dimensions — multi-objective
shortlist queries (cheapest-but-largest parts, best quality-vs-cost
corpus shards). The naive formulation is a quadratic NOT EXISTS
self-join; the 2-D skyline collapses to a PREFIX MAX after sorting one
dimension: a row survives iff max{size : price' < price} <= size.

Plan shape (the 100 TB story): the prefix max runs as the same
two-phase block decomposition q_concurrency uses for prefix sums —
price-range blocks compute block-local running maxima in parallel, a
tiny per-block maxima table (one row per block) computes cross-block
offsets on the driver-sized side, and a broadcast joins offsets back.
No global-order single-task window, no quadratic join; the oracle IS
the quadratic NOT EXISTS, so the driver hash certifies the
decomposition.

Reference cite (mount empty, SURVEY §0): no public-flexcalc analogue;
standard skyline operator literature (sort-based 2-D skyline).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from flexcalc_spark.registry import register
from flexcalc_spark.tables import table

# price-grid block width: fixture retail prices span ~[900, 2100] so
# ~1e8 grid units per block yields O(10) blocks; block boundaries align
# with the grid so equal prices can never straddle two blocks (the
# strict-dominance proof needs earlier blocks strictly cheaper)
_BLOCK_GRID = 100_000_000


@register(
    "q_skyline",
    oracle="""
        WITH p AS (
            SELECT p_partkey,
                   CAST(floor(p_retailprice * 1000000.0 + 0.5) AS BIGINT)
                       AS price_grid,
                   p_size
            FROM part
        )
        SELECT x.p_partkey, x.price_grid, x.p_size
        FROM p x
        WHERE NOT EXISTS (
            SELECT 1 FROM p y
            WHERE y.price_grid < x.price_grid AND y.p_size > x.p_size
        )
    """,
    family="analytics",
    scale_notes=(
        "2-D skyline via distributed prefix max: rows bucket into "
        "price-range blocks (alignment guarantees earlier blocks are "
        "strictly cheaper), each block computes its local "
        "strictly-preceding running max size in parallel (RANGE frame "
        "to -1 excludes price ties), the per-block max table (one row "
        "per block — KBs) computes cross-block offsets, and a broadcast "
        "join finishes the dominance test scan-side. O(n log n) work, "
        "one range shuffle, no quadratic join — the oracle is the "
        "quadratic NOT EXISTS so the hash certifies the decomposition. "
        "At 100 TB, derive block boundaries from approx_percentile of "
        "the sort dimension instead of fixed widths so skew cannot "
        "overload one block; d>2 dimensions nest this as the "
        "sort-filter-skyline pass over a pre-filtered candidate set"
    ),
)
def q_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto frontier of part under (min p_retailprice, max p_size),
    strict dominance in both dimensions."""
    p = table(spark, sf_dir, "part").select(
        "p_partkey",
        F.floor(F.col("p_retailprice") * 1000000.0 + 0.5)
        .cast("bigint")
        .alias("price_grid"),
        "p_size",
    )
    p = p.withColumn("block", F.expr(f"price_grid div {_BLOCK_GRID}"))
    # block-local max size over STRICTLY cheaper rows (RANGE .. -1)
    w_local = (
        Window.partitionBy("block")
        .orderBy("price_grid")
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    local = p.withColumn("local_max", F.max("p_size").over(w_local))
    # cross-block offsets: max size of ALL strictly-earlier blocks
    block_max = p.groupBy("block").agg(F.max("p_size").alias("bmax"))
    w_prev = Window.orderBy("block").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = block_max.withColumn(
        "offset", F.max("bmax").over(w_prev)
    ).select("block", "offset")
    joined = local.join(F.broadcast(offsets), "block")
    dominated = (
        F.greatest(
            F.coalesce(F.col("local_max"), F.lit(-1)),
            F.coalesce(F.col("offset"), F.lit(-1)),
        )
        > F.col("p_size")
    )
    return joined.filter(~dominated).select(
        "p_partkey", "price_grid", "p_size"
    )
