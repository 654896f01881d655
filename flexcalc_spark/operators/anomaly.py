"""Anomaly detection over the event stream: per-type z-score outliers.

The monitoring shape of a training-data pipeline: per-group population
statistics (mean/std of ``value`` per event_type) computed in ONE
aggregate pass, broadcast back onto the scan, each event scored
``z = (value - mean) / std`` and flagged at |z| >= 2.

Determinism: the per-type mean and variance are derived from 1e-6
integer-grid BIGINT sums (order-independent, exact — aggregates.py
discipline), so the doubles that reach the per-row z computation are
bit-identical across engines and partitionings; z is floor-quantized to
a 1e-4 grid before the threshold compare so the flag itself can never
sit on an engine-divergent boundary.

Reference cite (mount empty, SURVEY §0): public flexcalc has no events/
anomaly surface; z-score gating is the standard population-statistics
outlier rule.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flexcalc_spark.registry import register
from flexcalc_spark.tables import table_parallel

# mean/std from integer-grid sums, z on the resulting exact doubles.
# Identical literal structure both engines (registry determinism rules).
_STATS_SQL = {
    "mean": "(CAST(sum_g AS DOUBLE) / 1000000.0) / n",
    "var": "(CAST(ssq_g AS DOUBLE) / 1000000.0) / n - "
    "((CAST(sum_g AS DOUBLE) / 1000000.0) / n) * "
    "((CAST(sum_g AS DOUBLE) / 1000000.0) / n)",
}
# Degenerate-variance guard: a constant-valued event_type makes var 0 —
# or tiny-negative, since sum and sum-of-squares are grid-rounded
# independently. Spark's non-ANSI Divide would return NULL there while
# DuckDB follows IEEE (inf/NaN, and CAST(inf AS BIGINT) errors), so the
# engines diverge exactly when the data degenerates. Clamp var <= 0 to
# z = 0 with the SAME literal structure on both sides.
_Z_EXPR = (
    f"CASE WHEN ({_STATS_SQL['var']}) <= 0.0 THEN 0 ELSE "
    f"floor( (value - ({_STATS_SQL['mean']})) / sqrt({_STATS_SQL['var']})"
    " * 10000.0 ) END"
)


@register(
    "q_anomaly_zscore",
    oracle=f"""
        WITH st AS (
            SELECT event_type,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(CAST(floor(value * 1000000.0 + 0.5) AS BIGINT))
                        AS BIGINT) AS sum_g,
                   CAST(SUM(CAST(floor(value * value * 1000000.0 + 0.5)
                        AS BIGINT)) AS BIGINT) AS ssq_g
            FROM events
            GROUP BY event_type
        )
        SELECT event_id, e.event_type,
               CAST({_Z_EXPR} AS BIGINT) AS z_q,
               CAST(CASE WHEN abs(CAST({_Z_EXPR} AS BIGINT)) >= 20000
                    THEN 1 ELSE 0 END AS BIGINT) AS is_anomaly
        FROM events e JOIN st ON e.event_type = st.event_type
    """,
    family="anomaly",
    scale_notes=(
        "per-type z-score outlier flag: the stats aggregate collapses "
        "100 TB of events to one row per event_type (grid-BIGINT partial "
        "sums merge map-side), the 5-row stats table broadcasts back "
        "onto the scan, and scoring is pure per-row codegen — two scans "
        "of events, zero wide shuffles. The same shape serves drift "
        "monitors and value-range gates; windowed variants reuse "
        "q_win_moving's frame machinery"
    ),
)
def q_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flag events whose value is >= 2 population standard deviations
    from their event_type's mean (z floor-quantized to 1e-4)."""
    e = table_parallel(spark, sf_dir, "events")
    st = e.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.expr("CAST(floor(value * 1000000.0 + 0.5) AS BIGINT)"))
        .cast("bigint")
        .alias("sum_g"),
        F.sum(
            F.expr("CAST(floor(value * value * 1000000.0 + 0.5) AS BIGINT)")
        )
        .cast("bigint")
        .alias("ssq_g"),
    )
    z_q = F.expr(_Z_EXPR).cast("bigint")
    return (
        e.join(F.broadcast(st), "event_type")
        .select(
            "event_id",
            "event_type",
            z_q.alias("z_q"),
            F.when(F.abs(z_q) >= 20000, F.lit(1))
            .otherwise(F.lit(0))
            .cast("bigint")
            .alias("is_anomaly"),
        )
    )


# --- rolling-window variant ------------------------------------------
ROLL_N = 20  # trailing window size (current row + 19 predecessors)

# Rolling stats from integer-grid window sums: n/s/q are exact BIGINTs
# per row, so the mean/var doubles (and the guarded z) are bit-identical
# across engines — same clamp discipline as the global key.
_RMEAN = "(CAST(s AS DOUBLE) / 1000000.0) / n"
_RVAR = (
    "(CAST(q AS DOUBLE) / 1000000.0) / n - "
    f"({_RMEAN}) * ({_RMEAN})"
)
_RZ = (
    f"CASE WHEN n < 2 OR ({_RVAR}) <= 0.0 THEN 0 ELSE "
    f"floor((value - ({_RMEAN})) / sqrt({_RVAR}) * 10000.0) END"
)


@register(
    "q_anomaly_rolling",
    oracle=f"""
        WITH base AS (
            SELECT event_id, event_type, value, epoch_us(ts) AS ts_us,
                   CAST(floor(value * 1000000.0 + 0.5) AS BIGINT) AS vg,
                   CAST(floor(value * value * 1000000.0 + 0.5) AS BIGINT)
                       AS qg
            FROM events
        ),
        win AS (
            SELECT event_id, event_type, value,
                   CAST(COUNT(*) OVER w AS BIGINT) AS n,
                   CAST(SUM(vg) OVER w AS BIGINT) AS s,
                   CAST(SUM(qg) OVER w AS BIGINT) AS q
            FROM base
            WINDOW w AS (PARTITION BY event_type ORDER BY ts_us, event_id
                         ROWS BETWEEN {ROLL_N - 1} PRECEDING AND CURRENT ROW)
        )
        SELECT event_id,
               CAST({_RZ} AS BIGINT) AS z_q,
               CAST(CASE WHEN ({_RZ}) >= 20000 OR ({_RZ}) <= -20000
                    THEN 1 ELSE 0 END AS BIGINT) AS flagged
        FROM win
    """,
    family="anomaly",
    scale_notes=(
        "rolling-window z-score (the drift/spike monitor over a moving "
        "baseline, where the global key's population stats would wash "
        "out regime changes): one event_type-partitioned window "
        "carries three exact BIGINT accumulators (count, grid sum, "
        "grid sum-of-squares) over the trailing 20 events — no "
        "per-engine stddev implementation is ever invoked, the "
        "variance formula runs on exact integers per row. Same "
        "degenerate-variance clamp as the global key. One shuffle on "
        "event_type; at 100 TB partition additionally by coarse time "
        "range so a hot type's window work spreads (the frame only "
        "ever looks 20 rows back, so range-block boundaries need a "
        "20-row halo — the q_concurrency block decomposition)"
    ),
)
def q_anomaly_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """z-score of each event against its type's trailing-20-event
    window (grid-integer window sums); flag at |z| >= 2."""
    from pyspark.sql.window import Window

    from flexcalc_spark.tables import events_with_time

    e = events_with_time(spark, sf_dir).select(
        "event_id",
        "event_type",
        "value",
        "ts_us",
        F.floor(F.col("value") * 1_000_000.0 + 0.5).cast("bigint").alias("vg"),
        F.floor(F.col("value") * F.col("value") * 1_000_000.0 + 0.5)
        .cast("bigint")
        .alias("qg"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("ts_us", "event_id")
        .rowsBetween(-(ROLL_N - 1), 0)
    )
    win = e.select(
        "event_id",
        "event_type",
        "value",
        F.count(F.lit(1)).over(w).cast("bigint").alias("n"),
        F.sum("vg").over(w).cast("bigint").alias("s"),
        F.sum("qg").over(w).cast("bigint").alias("q"),
    )
    return win.selectExpr(
        "event_id",
        f"CAST({_RZ} AS BIGINT) AS z_q",
        f"CAST(CASE WHEN ({_RZ}) >= 20000 OR ({_RZ}) <= -20000 "
        "THEN 1 ELSE 0 END AS BIGINT) AS flagged",
    )
