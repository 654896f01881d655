"""Incremental materialized-view maintenance (the warehouse/streaming
"incremental refresh" shape).

A materialized per-(event_type, day) aggregate is kept as MERGEABLE
partials: COUNT and the exact 1e-6 integer-grid value sum. Refresh
splits the input into the already-materialized base (all days up to
max_day - 7) and a fresh delta (the trailing week), aggregates each
INDEPENDENTLY, and merges by re-aggregating the unioned partials —
never re-scanning the base raw rows conceptually (here both sides scan
the fixture because nothing is persisted between graded runs; in
production the base branch reads the stored partial table).

This is the algebraic core of incremental view maintenance: an
aggregate is incrementally refreshable iff its state is a commutative
monoid — (count, grid-sum) is, which is precisely why the repo's
determinism discipline (BIGINT grid sums, aggregates.py) doubles as an
IVM-ready state representation. AVG materializes as sum+count, never
as the average itself.

Scale: at 100 TB the base partial table is |event_type| x |days| rows
(KBs-MBs) and the daily refresh cost is one scan of the DELTA plus a
merge shuffle bounded by the partial-table cardinality — independent
of corpus size. The same shape backs q_time_rollup's cascade and a
Structured Streaming aggregation's state store.

Reference cite (mount empty, SURVEY §0): public flexcalc has no
materialized-view surface; the partial-merge formulation is the
standard IVM-for-distributive-aggregates construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flexcalc_spark.registry import register
from flexcalc_spark.tables import events_with_time

US_PER_DAY = 86_400_000_000
DELTA_DAYS = 7  # trailing week is the "new data" being merged in


@register(
    "q_incr_mv",
    oracle=f"""
        WITH base AS (
            SELECT event_type, epoch_us(ts) // {US_PER_DAY} AS day,
                   CAST(floor(value * 1000000.0 + 0.5) AS BIGINT) AS vg
            FROM events
        ),
        split AS (SELECT MAX(day) - {DELTA_DAYS} AS cut FROM base),
        old_part AS (
            SELECT event_type, day, CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(vg) AS BIGINT) AS sg
            FROM base, split WHERE day <= cut GROUP BY event_type, day
        ),
        new_part AS (
            SELECT event_type, day, CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(vg) AS BIGINT) AS sg
            FROM base, split WHERE day > cut GROUP BY event_type, day
        ),
        merged AS (
            SELECT event_type, day, SUM(n) AS n, SUM(sg) AS sg
            FROM (SELECT * FROM old_part UNION ALL SELECT * FROM new_part)
            GROUP BY event_type, day
        )
        SELECT event_type, CAST(day AS BIGINT) AS day,
               CAST(n AS BIGINT) AS n_events,
               ROUND(CAST(sg AS DOUBLE) / 1000000.0, 4) AS sum_value
        FROM merged
    """,
    family="matview",
    scale_notes=(
        "incremental view maintenance via mergeable partials: the "
        "materialized state per (event_type, day) is (COUNT, exact "
        "BIGINT grid-sum) — a commutative monoid, so refresh = "
        "aggregate the DELTA alone and re-aggregate unioned partials. "
        "Daily refresh cost at 100 TB is one delta scan + a merge "
        "shuffle bounded by the partial table's cardinality (|types| x "
        "|days| rows, KBs), independent of corpus size; the oracle's "
        "full recompute certifies partial-merge == direct aggregate"
    ),
)
def q_incr_mv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Refresh a per-(event_type, day) materialized aggregate by merging
    base partials (days <= max-7) with a trailing-week delta aggregate;
    output must equal the direct full aggregate (the oracle)."""
    e = events_with_time(spark, sf_dir).select(
        "event_type",
        F.expr(f"ts_us div {US_PER_DAY}").alias("day"),
        F.floor(F.col("value") * 1_000_000.0 + 0.5).cast("bigint").alias("vg"),
    )
    cut = e.agg((F.max("day") - DELTA_DAYS).alias("cut"))
    tagged = e.crossJoin(F.broadcast(cut))

    # r14 optimization: compute BOTH partial relations in ONE aggregate
    # pass. A (event_type, day) group is wholly old or wholly new (the
    # split predicate depends only on day), so grouping by
    # (event_type, day, is_old) partitions the groups exactly as the
    # two filtered aggregates did — one events scan + one shuffle
    # instead of two of each (the old form also paid the 1-row cut
    # attach twice). The tiny partial table is cached — it IS the
    # materialized-view state this key simulates — and the
    # old-partials union delta-partials merge below is unchanged.
    part = (
        tagged.groupBy(
            "event_type", "day", (F.col("day") <= F.col("cut")).alias("is_old")
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("vg").cast("bigint").alias("sg"),
        )
        .cache()
    )
    old_part = part.filter(F.col("is_old")).select("event_type", "day", "n", "sg")
    new_part = part.filter(~F.col("is_old")).select("event_type", "day", "n", "sg")
    merged = (
        old_part.unionAll(new_part)
        .groupBy("event_type", "day")
        .agg(F.sum("n").alias("n"), F.sum("sg").alias("sg"))
    )
    return merged.select(
        "event_type",
        F.col("day").cast("bigint").alias("day"),
        F.col("n").cast("bigint").alias("n_events"),
        F.round(F.col("sg").cast("double") / 1_000_000.0, 4).alias("sum_value"),
    )
