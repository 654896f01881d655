"""Date/time functions (SURVEY.md §2.2 "Scalar functions").

Dialect traps handled here:
- Spark ``dayofweek`` is 1=Sunday..7, DuckDB ``dow`` is 0=Sunday..6 —
  normalized to the 0-based convention;
- Spark ``months_between`` uses a 31-day fractional convention with no
  DuckDB twin — the portable month delta is (year*12+month) arithmetic;
- o_orderdate/l_shipdate are ms-precision TIMESTAMP_NTZ (FIXTURES.md):
  calendar math is timezone-free on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flexcalc_spark.registry import register
from flexcalc_spark.tables import events_with_time, table


@register(
    "q_date_parts",
    oracle="""
        SELECT o_orderkey,
               CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS y,
               CAST(EXTRACT(month FROM o_orderdate) AS BIGINT) AS m,
               CAST(EXTRACT(day FROM o_orderdate) AS BIGINT) AS d,
               CAST(EXTRACT(dow FROM o_orderdate) AS BIGINT) AS dow,
               CAST(EXTRACT(quarter FROM o_orderdate) AS BIGINT) AS q,
               strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start
        FROM orders
    """,
    family="datetime",
)
def q_date_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """extract year/month/day/dow/quarter + date_trunc."""
    o = table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("bigint").alias("y"),
        F.month("o_orderdate").cast("bigint").alias("m"),
        F.dayofmonth("o_orderdate").cast("bigint").alias("d"),
        (F.dayofweek("o_orderdate") - 1).cast("bigint").alias("dow"),
        F.quarter("o_orderdate").cast("bigint").alias("q"),
        F.date_format(F.date_trunc("month", F.col("o_orderdate")), "yyyy-MM-dd").alias("month_start"),
    )


@register(
    "q_date_arith",
    oracle="""
        SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS linenum,
               CAST(date_diff('day', o_orderdate, l_shipdate) AS BIGINT) AS ship_delay_days,
               strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d') AS due_date,
               (EXTRACT(year FROM l_shipdate) * 12 + EXTRACT(month FROM l_shipdate))
                 - (EXTRACT(year FROM o_orderdate) * 12 + EXTRACT(month FROM o_orderdate))
                 AS month_delta
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    """,
    family="datetime",
    scale_notes="date math rides the lineitem-orders join (one shuffle on orderkey)",
)
def q_date_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """datediff / interval add / portable month delta."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    month_num = lambda c: F.year(c) * 12 + F.month(c)  # noqa: E731
    return li.join(o, li.l_orderkey == o.o_orderkey).select(
        "l_orderkey",
        F.col("l_linenumber").cast("bigint").alias("linenum"),
        F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
        .cast("bigint")
        .alias("ship_delay_days"),
        F.date_format(F.date_add(F.col("o_orderdate").cast("date"), 30), "yyyy-MM-dd").alias("due_date"),
        (month_num(F.col("l_shipdate")) - month_num(F.col("o_orderdate")))
        .cast("bigint")
        .alias("month_delta"),
    )


@register(
    "q_gapfill",
    oracle="""
        WITH h AS (
            SELECT epoch_us(ts) // 3600000000 AS hour_idx FROM events
        ), b AS (
            SELECT MIN(hour_idx) AS lo, MAX(hour_idx) AS hi FROM h
        ), spine AS (
            SELECT unnest(range(lo, hi + 1)) AS hour_idx FROM b
        ), c AS (
            SELECT hour_idx, COUNT(*) AS n_events FROM h GROUP BY hour_idx
        )
        SELECT s.hour_idx, COALESCE(c.n_events, 0) AS n_events
        FROM spine s LEFT JOIN c USING (hour_idx)
    """,
    family="datetime",
    scale_notes="time-series gap fill: the dense hour spine is generated (sequence+explode) from a 1-row min/max aggregate, so it is spine-sized, not event-sized; the left join broadcasts the tiny spine against the aggregated counts — at 100 TB the counts side is already collapsed to O(hours) rows by partial agg before the join. Integer epoch-hour indices keep the bucketing exact on both engines (ns div vs us // compose to the same floor)",
)
def q_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly event counts over a DENSE hour spine — missing hours
    appear with n_events = 0 (calendar gap filling, the batch twin of a
    streaming tumbling window that must emit empty windows)."""
    e = events_with_time(spark, sf_dir)
    # integer epoch-µs -> hour index; same floor as the oracle's us//.
    h = e.select(F.expr("ts_us div 3600000000").alias("hour_idx"))
    b = h.agg(F.min("hour_idx").alias("lo"), F.max("hour_idx").alias("hi"))
    spine = b.select(F.explode(F.expr("sequence(lo, hi)")).alias("hour_idx"))
    c = h.groupBy("hour_idx").agg(F.count(F.lit(1)).alias("n_events"))
    return spine.join(c, "hour_idx", "left").select(
        "hour_idx",
        F.coalesce("n_events", F.lit(0)).cast("bigint").alias("n_events"),
    )


@register(
    "q_locf",
    oracle="""
        WITH h AS (
            SELECT event_type, epoch_us(ts) // 3600000000 AS hour_idx,
                   CAST(floor(value * 1000000.0 + 0.5) AS BIGINT) AS vg
            FROM events
        ),
        b AS (SELECT MIN(hour_idx) AS lo, MAX(hour_idx) AS hi FROM h),
        types AS (SELECT DISTINCT event_type FROM h),
        spine AS (
            SELECT event_type, s.hour_idx
            FROM types, (SELECT unnest(range(lo, hi + 1)) AS hour_idx
                         FROM b) s
        ),
        obs AS (
            -- round-half-up to 4 decimals in pure integer math: avg_e4 =
            -- round(sum_vg / (cnt*100)); double ROUND(x,4) half-ties
            -- diverge between engines (4 rows at sf0.1). vg >= 0 so
            -- floor-div == trunc-div.
            SELECT event_type, hour_idx,
                   CAST((2 * SUM(vg) + 100 * COUNT(*))
                        // (200 * COUNT(*)) AS DOUBLE) / 10000.0 AS vavg
            FROM h GROUP BY event_type, hour_idx
        ),
        joined AS (
            SELECT s.event_type, s.hour_idx, obs.vavg
            FROM spine s LEFT JOIN obs USING (event_type, hour_idx)
        )
        SELECT event_type, CAST(hour_idx AS BIGINT) AS hour_idx,
               last_value(vavg IGNORE NULLS) OVER (
                   PARTITION BY event_type ORDER BY hour_idx
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS v_filled,
               CAST(CASE WHEN vavg IS NULL THEN 0 ELSE 1 END AS BIGINT)
                   AS observed
        FROM joined
    """,
    family="datetime",
    scale_notes=(
        "last-observation-carried-forward gap fill (the sensor/metrics "
        "companion to q_gapfill's zero fill): the dense (type x hour) "
        "spine is generated from a 1-row bounds aggregate (spine-sized, "
        "never event-sized), observed hours collapse by partial agg "
        "BEFORE the spine join, and the carry-forward is one "
        "last_value(IGNORE NULLS) window per type over the spine — "
        "O(types x hours) rows regardless of corpus size. Grid-avg "
        "observations keep the carried values engine-identical"
    ),
)
def q_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly per-type average value over a dense spine with missing
    hours filled by the last observed value (LOCF)."""
    from pyspark.sql.window import Window

    e = events_with_time(spark, sf_dir)
    h = e.select(
        "event_type",
        F.expr("ts_us div 3600000000").alias("hour_idx"),
        F.floor(F.col("value") * 1_000_000.0 + 0.5).cast("bigint").alias("vg"),
    )
    b = h.agg(F.min("hour_idx").alias("lo"), F.max("hour_idx").alias("hi"))
    types = h.select("event_type").distinct()
    spine = types.crossJoin(
        F.broadcast(
            b.select(F.explode(F.expr("sequence(lo, hi)")).alias("hour_idx"))
        )
    )
    # Integer-grid round-half-up (vg >= 0): avg_e4 = round(sum/(cnt*100)),
    # then one exact IEEE division — double ROUND(x,4) half-ties diverged
    # between Spark (BigDecimal HALF_UP) and DuckDB (scaled std::round).
    obs = h.groupBy("event_type", "hour_idx").agg(
        (
            F.expr(
                "(2 * sum(vg) + 100 * count(1)) div (200 * count(1))"
            ).cast("double")
            / 10000.0
        ).alias("vavg")
    )
    joined = spine.join(obs, ["event_type", "hour_idx"], "left")
    w = (
        Window.partitionBy("event_type")
        .orderBy("hour_idx")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return joined.select(
        "event_type",
        F.col("hour_idx").cast("bigint").alias("hour_idx"),
        F.last("vavg", ignorenulls=True).over(w).alias("v_filled"),
        F.when(F.col("vavg").isNull(), 0)
        .otherwise(1)
        .cast("bigint")
        .alias("observed"),
    )
