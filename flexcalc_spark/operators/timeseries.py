"""Hierarchical time-series rollup (the "hypertable continuous
aggregate" shape): minute partials -> hour rollup -> day rollup, where
each coarser level is computed FROM the finer level's partials, never
from the raw scan.

This is the materialized-rollup pattern of every time-series store: at
100 TB the raw events are scanned ONCE to build minute partials; hours
aggregate 60 minute-rows each, days aggregate 24 hour-rows — the
cascade's cost after the first level is proportional to the number of
buckets, not the number of events, and each level is independently
persistable as a continuous aggregate that incremental ingest appends
to.

Determinism: bucket indices are exact integer division of epoch-µs
(schema-dispatched via tables.epoch_us_col); value sums ride the 1e-6
integer grid from the minute level upward so every level's sum is
partitioning/order-independent, rounded only at emit (aggregates.py
discipline).

Reference cite (mount empty, SURVEY §0): public flexcalc has no
time-series surface; the cascade follows the continuous-aggregate
design of time-series databases (rollups-from-rollups).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from flexcalc_spark.registry import register
from flexcalc_spark.tables import events_with_time

US_PER_MIN = 60_000_000


@register(
    "q_time_rollup",
    oracle="""
        WITH base AS (
            SELECT event_type,
                   epoch_us(ts) // 60000000 AS m,
                   CAST(floor(value * 1000000.0 + 0.5) AS BIGINT) AS vg
            FROM events
        ),
        mi AS MATERIALIZED (
            SELECT event_type, m, CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(vg) AS BIGINT) AS sg
            FROM base GROUP BY event_type, m
        ),
        h AS MATERIALIZED (
            SELECT event_type, m // 60 AS b, CAST(SUM(n) AS BIGINT) AS n,
                   CAST(SUM(sg) AS BIGINT) AS sg
            FROM mi GROUP BY event_type, m // 60
        ),
        d AS (
            SELECT event_type, b // 24 AS b, CAST(SUM(n) AS BIGINT) AS n,
                   CAST(SUM(sg) AS BIGINT) AS sg
            FROM h GROUP BY event_type, b // 24
        )
        SELECT 'hour' AS level, b AS bucket, event_type,
               n AS n_events,
               ROUND(CAST(sg AS DOUBLE) / 1000000.0, 4) AS sum_value
        FROM h
        UNION ALL
        SELECT 'day' AS level, b AS bucket, event_type,
               n AS n_events,
               ROUND(CAST(sg AS DOUBLE) / 1000000.0, 4) AS sum_value
        FROM d
    """,
    family="timeseries",
    scale_notes=(
        "continuous-aggregate cascade: raw events scanned ONCE into "
        "minute partials (integer-grid BIGINT state), hour = sum of 60 "
        "minute rows, day = sum of 24 hour rows — after the first level "
        "the cost is bucket-count-proportional, and every level is a "
        "persistable rollup that incremental ingest appends to. The "
        "shuffle narrows at each level (minute keys -> hour keys -> day "
        "keys); grid sums make every level's result "
        "partitioning-independent"
    ),
)
def q_time_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minute->hour->day rollup cascade over events: hour and day
    levels computed from the finer level's partials (one raw scan
    total), emitted as a stacked (level, bucket) table."""
    e = events_with_time(spark, sf_dir)
    minute = (
        e.select(
            "event_type",
            F.expr(f"ts_us div {US_PER_MIN}").alias("m"),
            F.floor(F.col("value") * 1_000_000.0 + 0.5)
            .cast("bigint")
            .alias("vg"),
        )
        .groupBy("event_type", "m")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("vg").cast("bigint").alias("sg"),
        )
    )
    hour = (
        minute.groupBy("event_type", F.expr("m div 60").alias("b"))
        .agg(
            F.sum("n").cast("bigint").alias("n"),
            F.sum("sg").cast("bigint").alias("sg"),
        )
        # cache: the hour level feeds BOTH the emitted hour rows and the
        # day rollup — without it each union branch re-scans raw events
        # (at scale each level would persist as a continuous aggregate).
        # Core-count layout first: caching the groupBy's 200-partition
        # vanilla layout would pin hundreds of near-empty tasks per
        # consumer (the q_market_basket round-7 lesson).
        .repartition(spark.sparkContext.defaultParallelism, "event_type")
        .cache()
    )
    day = (
        hour.groupBy("event_type", F.expr("b div 24").alias("b"))
        .agg(
            F.sum("n").cast("bigint").alias("n"),
            F.sum("sg").cast("bigint").alias("sg"),
        )
    )

    def emit(df: DataFrame, level: str) -> DataFrame:
        return df.select(
            F.lit(level).alias("level"),
            F.col("b").alias("bucket"),
            "event_type",
            F.col("n").alias("n_events"),
            F.round(F.col("sg").cast("double") / 1_000_000.0, 4).alias(
                "sum_value"
            ),
        )

    return emit(hour, "hour").unionAll(emit(day, "day"))


@register(
    "q_funnel",
    oracle="""
        WITH v AS MATERIALIZED (
            SELECT user_id, MIN(epoch_us(ts)) AS t1
            FROM events WHERE event_type = 'view' GROUP BY user_id
        ),
        c AS MATERIALIZED (
            SELECT e.user_id, MIN(epoch_us(e.ts)) AS t2
            FROM events e JOIN v ON e.user_id = v.user_id
            WHERE e.event_type = 'click' AND epoch_us(e.ts) > v.t1
            GROUP BY e.user_id
        ),
        p AS (
            SELECT e.user_id, MIN(epoch_us(e.ts)) AS t3
            FROM events e JOIN c ON e.user_id = c.user_id
            WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > c.t2
            GROUP BY e.user_id
        )
        SELECT 'view' AS step, CAST(COUNT(*) AS BIGINT) AS n_users FROM v
        UNION ALL
        SELECT 'click_after_view', CAST(COUNT(*) AS BIGINT) FROM c
        UNION ALL
        SELECT 'purchase_after_click', CAST(COUNT(*) AS BIGINT) FROM p
    """,
    family="timeseries",
    scale_notes=(
        "ordered conversion funnel (view -> click -> purchase): each "
        "stage is a type-filtered scan (predicate pushdown) joined to "
        "the previous stage's per-user first-timestamp table — stage "
        "tables shrink monotonically (users, not events), so the joins "
        "after stage 1 are small-against-small while the event scans "
        "stay pruned by the type filter. Event-time compares in exact "
        "integer µs; step counts BIGINT"
    ),
)
def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-step ordered funnel over events: users who viewed, then
    clicked after the first view, then purchased after the first
    qualifying click."""
    e = events_with_time(spark, sf_dir)
    v = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("t1"))
    )
    c = (
        e.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts_us") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("t2"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts_us") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("t3"))
    )

    def cnt(df: DataFrame, step: str) -> DataFrame:
        return df.agg(
            F.lit(step).alias("step"),
            F.count(F.lit(1)).cast("bigint").alias("n_users"),
        )

    return (
        cnt(v, "view")
        .unionAll(cnt(c, "click_after_view"))
        .unionAll(cnt(p, "purchase_after_click"))
    )


RETENTION_HORIZON = 7
US_PER_DAY = 86_400_000_000


@register(
    "q_retention",
    oracle=f"""
        WITH f AS (
            SELECT user_id, MIN(epoch_us(ts) // 86400000000) AS d0
            FROM events GROUP BY user_id
        ),
        a AS (
            SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS d
            FROM events
        )
        SELECT f.d0 AS cohort_day, (a.d - f.d0) AS day_offset,
               CAST(COUNT(*) AS BIGINT) AS n_active
        FROM a JOIN f ON a.user_id = f.user_id
        WHERE a.d - f.d0 <= {RETENTION_HORIZON}
        GROUP BY f.d0, (a.d - f.d0)
    """,
    family="timeseries",
    scale_notes=(
        "cohort retention matrix: the (user, active-day) DISTINCT "
        "collapses map-side before any join; the first-seen table is "
        "one row per user (broadcast here; at billions of users it "
        "becomes a co-partitioned user_id join, still narrow); the "
        "matrix itself is |cohorts| x horizon rows. Day indices are "
        "exact integer division of epoch-µs"
    ),
)
def q_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-grain cohort retention out to a 7-day horizon: users active
    on day d0+k of their first-seen cohort day d0."""
    e = events_with_time(spark, sf_dir)
    days = e.select(
        "user_id", F.expr(f"ts_us div {US_PER_DAY}").alias("d")
    )
    first = days.groupBy("user_id").agg(F.min("d").alias("d0"))
    active = days.distinct()
    return (
        active.join(F.broadcast(first), "user_id")
        .filter(F.col("d") - F.col("d0") <= RETENTION_HORIZON)
        .groupBy(
            F.col("d0").alias("cohort_day"),
            (F.col("d") - F.col("d0")).alias("day_offset"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_active"))
    )


ORDER_SPAN_DAYS = 30


@register(
    "q_concurrency",
    oracle=f"""
        WITH delta AS (
            SELECT epoch_us(o_orderdate) // 86400000000 AS day,
                   CAST(COUNT(*) AS BIGINT) AS net
            FROM orders GROUP BY 1
            UNION ALL
            SELECT epoch_us(o_orderdate) // 86400000000
                       + {ORDER_SPAN_DAYS} AS day,
                   CAST(-COUNT(*) AS BIGINT) AS net
            FROM orders GROUP BY 1
        ),
        byday AS (
            SELECT day, CAST(SUM(net) AS BIGINT) AS net
            FROM delta GROUP BY day
        )
        SELECT day, net,
               CAST(SUM(net) OVER (ORDER BY day
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS open_orders
        FROM byday
    """,
    family="timeseries",
    scale_notes=(
        "interval sweepline (orders open concurrently, 30-day spans) "
        "via a DISTRIBUTED two-phase prefix sum: per-day +1/-1 deltas "
        "collapse map-side; days partition into ~month blocks whose "
        "within-block cumulative sums run in parallel windows; block "
        "offsets come from one tiny block-totals window (one row per "
        "block) broadcast back. The oracle's single global cumulative "
        "window — which would serialize 100 TB onto one task — is "
        "exactly what this plan avoids while producing identical "
        "output"
    ),
)
def q_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Open-order concurrency by day (30-day order lifetime): +1/-1
    sweepline deltas with a two-phase (block-local + block-offset)
    prefix sum instead of one serializing global window."""
    from flexcalc_spark.tables import epoch_us_of, table_parallel

    o = table_parallel(spark, sf_dir, "orders")
    # o_orderdate reads as TIMESTAMP_NTZ in the current fixture
    # generation — epoch math dispatches on the schema (tables.py)
    day = F.expr("ous div 86400000000")
    o = o.withColumn("ous", epoch_us_of(o, "o_orderdate"))
    starts = o.groupBy(day.alias("day")).agg(
        F.count(F.lit(1)).cast("bigint").alias("net")
    )
    ends = o.groupBy((day + ORDER_SPAN_DAYS).alias("day")).agg(
        (-F.count(F.lit(1))).cast("bigint").alias("net")
    )
    byday = (
        starts.unionAll(ends)
        .groupBy("day")
        .agg(F.sum("net").cast("bigint").alias("net"))
        .withColumn("block", F.expr("day div 32"))
    )
    win_block = (
        Window.partitionBy("block")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = byday.withColumn("local_sum", F.sum("net").over(win_block))
    totals = byday.groupBy("block").agg(
        F.sum("net").cast("bigint").alias("block_total")
    )
    win_prev = Window.orderBy("block").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = totals.withColumn(
        "offset", F.coalesce(F.sum("block_total").over(win_prev), F.lit(0))
    ).select("block", "offset")
    return (
        local.join(F.broadcast(offsets), "block")
        .select(
            "day",
            "net",
            (F.col("local_sum") + F.col("offset"))
            .cast("bigint")
            .alias("open_orders"),
        )
    )


@register(
    "q_rfm",
    oracle="""
        -- boundary = the 0.66 linear-interpolated quantile, computed
        -- as the EXACT RATIONAL 66/100 over integer order statistics:
        -- v >= a + (r/100)*(b-a)  <=>  100*v >= 100*a + r*(b-a), all
        -- BIGINT. quantile_cont's a+frac*(b-a) is FP whose last ulp
        -- can differ between engines and flip a boundary customer's
        -- segment (r13 review) — no FP touches the comparison now.
        WITH cust AS MATERIALIZED (
            SELECT o_custkey,
                   MAX(epoch_us(o_orderdate) // 86400000000) AS lastd,
                   CAST(COUNT(*) AS BIGINT) AS frequency,
                   CAST(SUM(CAST(floor(o_totalprice * 1000000.0 + 0.5)
                        AS BIGINT)) AS BIGINT) AS mg
            FROM orders GROUP BY o_custkey
        ),
        ref AS (SELECT MAX(lastd) AS refd FROM cust),
        nn AS (SELECT COUNT(*) AS n FROM cust),
        fr AS (SELECT frequency AS v,
                      ROW_NUMBER() OVER (ORDER BY frequency) AS rk
               FROM cust),
        mr AS (SELECT mg AS v, ROW_NUMBER() OVER (ORDER BY mg) AS rk
               FROM cust),
        fbnd AS (
            SELECT MAX(CASE WHEN rk = (66*(n-1)) // 100 + 1
                            THEN v END) AS fa,
                   MAX(CASE WHEN rk = LEAST((66*(n-1)) // 100 + 2, n)
                            THEN v END) AS fv2,
                   CAST((66*(n-1)) % 100 AS BIGINT) AS fr100
            FROM fr, nn GROUP BY n
        ),
        mbnd AS (
            SELECT MAX(CASE WHEN rk = (66*(n-1)) // 100 + 1
                            THEN v END) AS ma,
                   MAX(CASE WHEN rk = LEAST((66*(n-1)) // 100 + 2, n)
                            THEN v END) AS mv2,
                   CAST((66*(n-1)) % 100 AS BIGINT) AS mr100
            FROM mr, nn GROUP BY n
        )
        SELECT o_custkey, CAST(refd - lastd AS BIGINT) AS recency_days,
               frequency,
               ROUND(CAST(mg AS DOUBLE) / 1000000.0, 4) AS monetary,
               CASE WHEN 100*frequency >= 100*fa + fr100*(fv2 - fa)
                         AND 100*mg >= 100*ma + mr100*(mv2 - ma)
                    THEN 'core'
                    WHEN 100*frequency >= 100*fa + fr100*(fv2 - fa)
                         OR 100*mg >= 100*ma + mr100*(mv2 - ma)
                    THEN 'growth'
                    ELSE 'tail' END AS segment
        FROM cust, ref, fbnd, mbnd
    """,
    family="analytics",
    scale_notes=(
        "RFM customer segmentation: one per-customer aggregate pass "
        "(recency/frequency/grid-monetary), then the boundary row and "
        "the 1-value reference day broadcast back onto the customer "
        "table. The EXACT tier computes its 0.66 boundary from integer "
        "order statistics via two unpartitioned rank windows — a "
        "global single-partition sort of the customer aggregate, the "
        "documented non-scaling piece of this tier (it buys an "
        "all-BIGINT comparison no FP interpolation ulp can flip, r13) "
        "— so segmentation at a billion customers uses q_rfm_approx "
        "(approx_percentile sketch boundaries, same downstream plan, "
        "no sort)"
    ),
)
def q_rfm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recency / frequency / monetary segmentation of customers from
    their orders, with percentile-boundary segments (core/growth/tail)."""
    return _rfm(spark, sf_dir, approx=False)


@register(
    "q_rfm_approx",
    oracle=None,  # sketch boundaries have no ANSI twin (rows-only);
    # segment-assignment equivalence vs the exact tier asserted in
    # tests/test_properties.py, plan freedom from exact percentile in
    # tests/test_plans.py
    family="analytics",
    scale_notes=(
        "q_rfm's 100 TB path: the two segment boundaries come from "
        "approx_percentile (mergeable sketch, fixed-size state) instead "
        "of exact percentile's buffer-every-value single reduce — on a "
        "billion customers the boundary agg is the only piece of the "
        "exact plan that doesn't scale, and it is the only piece that "
        "changes. Boundary rank error n/10000 moves only customers "
        "sitting exactly on a decile edge between segments"
    ),
)
def q_rfm_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation with sketch-based percentile boundaries — the
    at-scale variant of q_rfm."""
    return _rfm(spark, sf_dir, approx=True)


def _rfm(spark: SparkSession, sf_dir: str, approx: bool) -> DataFrame:
    """Shared RFM plan; ``approx`` selects the boundary source (exact
    percentile = oracle twin / approx_percentile = mergeable scale
    path — q_histogram_equidepth precedent)."""
    from flexcalc_spark.tables import epoch_us_of, table_parallel

    o = table_parallel(spark, sf_dir, "orders")
    o = o.withColumn("od", epoch_us_of(o, "o_orderdate"))
    cust = o.groupBy("o_custkey").agg(
        F.max(F.expr("od div 86400000000")).alias("lastd"),
        F.count(F.lit(1)).cast("bigint").alias("frequency"),
        F.sum(F.expr("CAST(floor(o_totalprice * 1000000.0 + 0.5) AS BIGINT)"))
        .cast("bigint")
        .alias("mg"),
    )
    # cust feeds 3 (approx) / 4 (exact) subtrees — cache the shuffle-
    # derived aggregate once for BOTH tiers (safe under the r9
    # AQE-cached-layout conf); hoisted above ref so every consumer
    # reads the cached object, not a plan-matched twin (r13 review)
    cust = cust.cache()
    ref = cust.agg(F.max("lastd").alias("refd"))
    if approx:
        b = cust.agg(
            F.expr("approx_percentile(CAST(frequency AS DOUBLE),"
                   " 0.66, 10000)").alias("fq"),
            F.expr("approx_percentile(CAST(mg AS DOUBLE),"
                   " 0.66, 10000)").alias("mq"),
        )
        fpass = F.expr("CAST(frequency AS DOUBLE)") >= F.col("fq")
        mpass = F.expr("CAST(mg AS DOUBLE)") >= F.col("mq")
    else:
        # exact tier: the 0.66 interpolated quantile as the EXACT
        # rational 66/100 over integer order statistics — comparison is
        # 100*v >= 100*a + r*(b-a), all BIGINT, so no FP interpolation
        # ulp can flip a boundary customer cross-engine (r13 review;
        # oracle computes the identical integers). The rank window is
        # single-partition over |customers| — fine for the exact tier,
        # whose boundary agg was already the documented non-scaling
        # piece (q_rfm_approx is the 100 TB path).
        # one pass over the cached customer aggregate: both rank
        # columns ride the same scan
        nn = cust.agg(F.count(F.lit(1)).alias("n"))
        ranked = (
            cust.select("frequency", "mg")
            .withColumn(
                "frk", F.row_number().over(Window.orderBy("frequency"))
            )
            .withColumn("mrk", F.row_number().over(Window.orderBy("mg")))
            .crossJoin(F.broadcast(nn))
        )
        lo = "(66*(n-1)) div 100 + 1"
        hi = "least((66*(n-1)) div 100 + 2, n)"
        b = ranked.agg(
            F.max(F.when(F.expr(f"frk = {lo}"), F.col("frequency")))
            .alias("fa"),
            F.max(F.when(F.expr(f"frk = {hi}"), F.col("frequency")))
            .alias("fv2"),
            F.max(F.when(F.expr(f"mrk = {lo}"), F.col("mg"))).alias("ma"),
            F.max(F.when(F.expr(f"mrk = {hi}"), F.col("mg"))).alias("mv2"),
            F.max(F.expr("(66*(n-1)) % 100")).cast("bigint").alias(
                "r100"
            ),
        )
        fpass = F.expr("100*frequency >= 100*fa + r100*(fv2 - fa)")
        mpass = F.expr("100*mg >= 100*ma + r100*(mv2 - ma)")
    seg = (
        F.when(fpass & mpass, "core")
        .when(fpass | mpass, "growth")
        .otherwise("tail")
    )
    return (
        cust.crossJoin(F.broadcast(ref))
        .crossJoin(F.broadcast(b))
        .select(
            "o_custkey",
            (F.col("refd") - F.col("lastd")).cast("bigint").alias(
                "recency_days"
            ),
            "frequency",
            F.round(F.col("mg").cast("double") / 1_000_000.0, 4).alias(
                "monetary"
            ),
            seg.alias("segment"),
        )
    )


@register(
    "q_transitions",
    oracle="""
        WITH t AS (
            SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id
            FROM events
        ),
        seq AS (
            SELECT user_id, event_type,
                   LAG(event_type) OVER (PARTITION BY user_id
                       ORDER BY ts_us, event_id) AS prev_type
            FROM t
        ),
        c AS (
            SELECT prev_type, event_type, CAST(COUNT(*) AS BIGINT) AS cnt
            FROM seq WHERE prev_type IS NOT NULL
            GROUP BY prev_type, event_type
        ),
        tot AS (
            SELECT prev_type, CAST(SUM(cnt) AS BIGINT) AS total
            FROM c GROUP BY prev_type
        )
        SELECT c.prev_type, c.event_type, c.cnt,
               CAST(c.cnt AS DOUBLE) / total AS p
        FROM c JOIN tot ON c.prev_type = tot.prev_type
    """,
    family="analytics",
    scale_notes=(
        "event-flow Markov transitions: one per-user lag window (the "
        "same user_id shuffle every sessionization key pays), then the "
        "transition matrix collapses to |types|^2 rows map-side; "
        "probabilities are single divisions of exact BIGINT counts "
        "joined from the 5-row per-prev totals (broadcast). The "
        "transition matrix is the input to funnel discovery and "
        "next-event prediction features"
    ),
)
def q_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-type transition counts and probabilities per preceding
    type (first-order Markov chain over each user's event sequence)."""

    e = events_with_time(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    seq = e.select(
        "event_type", F.lag("event_type").over(w).alias("prev_type")
    ).filter(F.col("prev_type").isNotNull())
    c = seq.groupBy("prev_type", "event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    tot = c.groupBy("prev_type").agg(
        F.sum("cnt").cast("bigint").alias("total")
    )
    return (
        c.join(F.broadcast(tot), "prev_type")
        .select(
            "prev_type",
            "event_type",
            "cnt",
            (F.col("cnt").cast("double") / F.col("total")).alias("p"),
        )
    )


# --- EWMA smoothing ---------------------------------------------------
EWMA_TERMS = 8          # truncated exponential window (alpha = 1/2)
DEBOUNCE_US = 60_000_000  # 60 s suppression window


def _ewma_terms(div_op: str) -> tuple[str, str]:
    """Numerator/denominator SQL for the truncated 1/2-decay EWMA.

    Weights are 2^-j, applied as INTEGER floor-division of the 1e-6
    grid value — no FP accumulates, so the num/den BIGINTs are exact
    and the final single division is bit-identical on both engines.
    ``div_op`` bridges the dialects ('div' Spark, '//' DuckDB).
    """
    num = " + ".join(
        f"(CASE WHEN l{j} IS NULL THEN 0 ELSE l{j} {div_op} {1 << j} END)"
        for j in range(EWMA_TERMS)
    )
    den = " + ".join(
        f"(CASE WHEN l{j} IS NULL THEN 0 ELSE 1000000 {div_op} {1 << j} END)"
        for j in range(EWMA_TERMS)
    )
    return num, den


_EWMA_ORACLE_NUM, _EWMA_ORACLE_DEN = _ewma_terms("//")
_EWMA_SPARK_NUM, _EWMA_SPARK_DEN = _ewma_terms("div")
_EWMA_LAGS = ", ".join(
    f"LAG(vg, {j}) OVER w AS l{j}" for j in range(EWMA_TERMS)
)


@register(
    "q_ewma",
    oracle=f"""
        WITH base AS (
            SELECT event_id, user_id, epoch_us(ts) AS ts_us,
                   CAST(floor(value * 1000000.0 + 0.5) AS BIGINT) AS vg
            FROM events
        ),
        lagged AS (
            SELECT event_id, user_id, ts_us, {_EWMA_LAGS}
            FROM base
            WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
        )
        SELECT event_id, user_id, ts_us,
               CAST({_EWMA_ORACLE_NUM} AS DOUBLE)
                   / ({_EWMA_ORACLE_DEN}) AS ewma
        FROM lagged
    """,
    family="timeseries",
    scale_notes=(
        "exponentially-weighted moving average (the telemetry/metrics "
        "smoothing primitive) as a TRUNCATED 8-term half-decay: weights "
        "2^-j apply as integer floor-division of the grid value, so the "
        "window carries exact BIGINTs and the one final division is "
        "bit-identical across engines — no sequential FP recurrence, "
        "which is what makes the textbook recursive EWMA "
        "non-distributable. One user_id shuffle (the shared "
        "sessionization partitioning); truncation error is 2^-8 of the "
        "oldest mass, below the 1e-6 grid for this value range"
    ),
)
def q_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user truncated EWMA (alpha=1/2, 8 terms) of event values in
    exact integer arithmetic; one row per event."""
    e = events_with_time(spark, sf_dir).select(
        "event_id",
        "user_id",
        "ts_us",
        F.floor(F.col("value") * 1_000_000.0 + 0.5).cast("bigint").alias("vg"),
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    lagged = e.select(
        "event_id",
        "user_id",
        "ts_us",
        *[F.lag("vg", j).over(w).alias(f"l{j}") for j in range(EWMA_TERMS)],
    )
    return lagged.selectExpr(
        "event_id",
        "user_id",
        "ts_us",
        f"CAST({_EWMA_SPARK_NUM} AS DOUBLE) / ({_EWMA_SPARK_DEN}) AS ewma",
    )


@register(
    "q_debounce",
    oracle=f"""
        WITH base AS (
            SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us
            FROM events
        ),
        lagged AS (
            SELECT *, LAG(ts_us) OVER (PARTITION BY user_id, event_type
                                       ORDER BY ts_us, event_id) AS prev_us
            FROM base
        )
        SELECT event_id, user_id, event_type, ts_us
        FROM lagged
        WHERE prev_us IS NULL OR ts_us - prev_us > {DEBOUNCE_US}
    """,
    family="timeseries",
    scale_notes=(
        "event debouncing (telemetry throttling: drop repeats of the "
        "same (user, type) within 60 s of the kept-or-not previous "
        "event): one lag window on the shared (user_id) shuffle, pure "
        "integer-µs compare, then a scan-side filter — the standard "
        "duplicate-burst suppressor in front of sessionization and "
        "funnel analysis. Note the semantics are lag-based (gap from "
        "the PREVIOUS event, kept or not), which is one window pass; "
        "anchor-based debounce (gap from the last KEPT event) is the "
        "sequential variant served by q_stateful_sessions' "
        "applyInPandasWithState machinery"
    ),
)
def q_debounce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppress events arriving within 60 s of the previous same
    (user, type) event; emit the surviving rows."""
    e = events_with_time(spark, sf_dir).select(
        "event_id", "user_id", "event_type", "ts_us"
    )
    w = Window.partitionBy("user_id", "event_type").orderBy(
        "ts_us", "event_id"
    )
    lagged = e.withColumn("prev_us", F.lag("ts_us").over(w))
    return lagged.filter(
        F.col("prev_us").isNull()
        | (F.col("ts_us") - F.col("prev_us") > DEBOUNCE_US)
    ).select("event_id", "user_id", "event_type", "ts_us")


# --- ordered sequence-pattern detection ------------------------------
SEQ_STEP_US = 1_800_000_000  # 30 min per-step bound


@register(
    "q_seq_pattern",
    oracle=f"""
        WITH e AS (
            SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us
            FROM events
        ),
        v AS (SELECT * FROM e WHERE event_type = 'view'),
        c AS (SELECT * FROM e WHERE event_type = 'click'),
        p AS (SELECT * FROM e WHERE event_type = 'purchase'),
        completed AS (
            SELECT DISTINCT v.user_id, v.event_id
            FROM v
            JOIN c ON c.user_id = v.user_id
                  AND c.ts_us > v.ts_us
                  AND c.ts_us <= v.ts_us + {SEQ_STEP_US}
            JOIN p ON p.user_id = c.user_id
                  AND p.ts_us > c.ts_us
                  AND p.ts_us <= c.ts_us + {SEQ_STEP_US}
        )
        SELECT v.user_id,
               CAST(COUNT(*) AS BIGINT) AS n_views,
               CAST(COUNT(completed.event_id) AS BIGINT) AS n_completed
        FROM v
        LEFT JOIN completed ON completed.user_id = v.user_id
                           AND completed.event_id = v.event_id
        GROUP BY v.user_id
    """,
    family="analytics",
    scale_notes=(
        "ordered sequence-pattern detection (the MATCH_RECOGNIZE / "
        "per-anchor funnel shape, stricter than q_funnel's global "
        "first-timestamp chain): each step is an equi join on user_id "
        "with the 30-min step bound as a residual, so the pattern "
        "chain is two hash joins — never a per-user scan loop; the "
        "DISTINCT collapses multi-witness completions before the "
        "per-user rollup. At 100 TB all three event streams "
        "co-partition on user_id, so steps 2..k reuse the first "
        "shuffle's layout; step fan-out is bounded by events per user "
        "per 30 min, not corpus size"
    ),
)
def q_seq_pattern(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user count of view events that complete the ordered pattern
    view -> click (<=30 min) -> purchase (<=30 min after the click)."""
    e = events_with_time(spark, sf_dir).select(
        "event_id", "user_id", "event_type", "ts_us"
    )
    v = e.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("vu"),
        F.col("event_id").alias("vid"),
        F.col("ts_us").alias("vts"),
    )
    c = e.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("cu"), F.col("ts_us").alias("cts")
    )
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("pu"), F.col("ts_us").alias("pts")
    )
    completed = (
        v.join(
            c,
            (F.col("cu") == F.col("vu"))
            & (F.col("cts") > F.col("vts"))
            & (F.col("cts") <= F.col("vts") + SEQ_STEP_US),
        )
        .join(
            p,
            (F.col("pu") == F.col("cu"))
            & (F.col("pts") > F.col("cts"))
            & (F.col("pts") <= F.col("cts") + SEQ_STEP_US),
        )
        .select(F.col("vu").alias("user_id"), F.col("vid").alias("event_id"))
        .distinct()
    )
    return (
        v.join(
            completed,
            (completed.user_id == v.vu) & (completed.event_id == v.vid),
            "left",
        )
        .groupBy(F.col("vu").alias("user_id"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_views"),
            F.count(completed.event_id).cast("bigint").alias("n_completed"),
        )
    )


# --- interval coalescing ---------------------------------------------
SPAN_US = 600_000_000  # each event opens a 10-min activity interval


@register(
    "q_interval_coalesce",
    oracle=f"""
        WITH iv AS (
            SELECT user_id, epoch_us(ts) AS s, epoch_us(ts) + {SPAN_US} AS e,
                   event_id
            FROM events
        ),
        flagged AS (
            SELECT *,
                   CASE WHEN s > COALESCE(MAX(e) OVER (
                            PARTITION BY user_id ORDER BY s, event_id
                            ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND 1 PRECEDING), -1)
                        THEN 1 ELSE 0 END AS new_iv
            FROM iv
        ),
        grouped AS (
            SELECT *,
                   SUM(new_iv) OVER (PARTITION BY user_id
                                     ORDER BY s, event_id
                                     ROWS BETWEEN UNBOUNDED PRECEDING
                                              AND CURRENT ROW) AS gid
            FROM flagged
        ),
        merged AS (
            SELECT user_id, gid, MIN(s) AS ms, MAX(e) AS me
            FROM grouped GROUP BY user_id, gid
        )
        SELECT user_id,
               CAST(COUNT(*) AS BIGINT) AS n_intervals,
               CAST(SUM(me - ms) AS BIGINT) AS covered_us,
               CAST(MIN(ms) AS BIGINT) AS first_start_us,
               CAST(MAX(me) AS BIGINT) AS last_end_us
        FROM merged GROUP BY user_id
    """,
    family="timeseries",
    scale_notes=(
        "interval coalescing (merge overlapping activity windows — the "
        "uptime/visit/maintenance-window primitive): the overlap test "
        "is a cumulative MAX(end) over strictly-preceding rows and the "
        "interval id a running sum of break flags — both ride the ONE "
        "user_id shuffle, all integer-µs exact. Per-user frames never "
        "serialize globally; an unpartitioned variant (global machine "
        "uptime) uses the q_concurrency/q_skyline block prefix "
        "decomposition for the cumulative max. The merged table feeds "
        "SLA/coverage reporting at any scale"
    ),
)
def q_interval_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Coalesce each user's overlapping 10-min activity intervals into
    maximal runs; per user: run count, covered µs, first/last bounds."""
    e = events_with_time(spark, sf_dir).select(
        "user_id",
        "event_id",
        F.col("ts_us").alias("s"),
        (F.col("ts_us") + SPAN_US).alias("e"),
    )
    order = Window.partitionBy("user_id").orderBy("s", "event_id")
    prev_max_e = (
        F.max("e")
        .over(order.rowsBetween(Window.unboundedPreceding, -1))
    )
    flagged = e.withColumn(
        "new_iv",
        F.when(F.col("s") > F.coalesce(prev_max_e, F.lit(-1)), 1).otherwise(
            0
        ),
    )
    grouped = flagged.withColumn(
        "gid",
        F.sum("new_iv").over(
            order.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    merged = grouped.groupBy("user_id", "gid").agg(
        F.min("s").alias("ms"), F.max("e").alias("me")
    )
    return merged.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_intervals"),
        F.sum(F.col("me") - F.col("ms")).cast("bigint").alias("covered_us"),
        F.min("ms").cast("bigint").alias("first_start_us"),
        F.max("me").cast("bigint").alias("last_end_us"),
    )


# ---------------------------------------------------------- autocorrelation
AUTOCORR_LAGS = 3
# Pearson corr from exact integer moments, floor-quantized to 1e-4 —
# identical literal structure on both engines (the q_corr_matrix shape).
_AC_CORR = (
    "CASE WHEN (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) <= 0.0"
    " OR (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy) <= 0.0"
    " THEN CAST(0 AS BIGINT)"
    " ELSE CAST(floor((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)"
    " / sqrt((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)"
    " * (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy))"
    " * 10000.0) AS BIGINT) END"
)


@register(
    "q_autocorr",
    oracle=f"""
        WITH daily AS MATERIALIZED (
            SELECT epoch_us(ts) // 86400000000 AS d,
                   CAST(SUM(CAST(floor(value + 0.5) AS BIGINT))
                        AS BIGINT) AS x
            FROM events GROUP BY d
        ),
        lags AS (SELECT unnest(range(1, {AUTOCORR_LAGS + 1})) AS lag),
        pairs AS (
            SELECT lags.lag, a.x AS xv, b.x AS yv
            FROM lags
            JOIN daily a ON TRUE
            JOIN daily b ON b.d = a.d - lags.lag
        ),
        m AS (
            SELECT lag,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(xv) AS BIGINT) AS sx,
                   CAST(SUM(yv) AS BIGINT) AS sy,
                   CAST(SUM(xv * xv) AS BIGINT) AS sxx,
                   CAST(SUM(yv * yv) AS BIGINT) AS syy,
                   CAST(SUM(xv * yv) AS BIGINT) AS sxy
            FROM pairs GROUP BY lag
        )
        SELECT CAST(lag AS BIGINT) AS lag, n, {_AC_CORR} AS corr_q
        FROM m
    """,
    family="timeseries",
    scale_notes=(
        "lag-k autocorrelation of the daily event-volume series from "
        "exact integer moments: the corpus collapses to one row per "
        "day FIRST (the only corpus-scale shuffle), then the lag "
        "self-join and Pearson moments run on |days| rows — a "
        "three-year 100 TB stream is still ~1000 rows here. Unit-grid "
        "daily sums keep every squared moment far inside BIGINT "
        "(~1e18 at 100x grading scale; past that the moment "
        "accumulators swap to DECIMAL(38,0) like q_corr_matrix "
        "documents); the corr formula runs in double on exact integer "
        "inputs, bit-identical across engines, floor-quantized to 1e-4"
    ),
)
def q_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation of daily total event value at lags 1..3:
    (lag, n, corr_q)."""
    e = events_with_time(spark, sf_dir)
    daily = (
        e.selectExpr(
            "ts_us div 86400000000 AS d",
            "CAST(floor(value + 0.5) AS BIGINT) AS v",
        )
        .groupBy("d")
        .agg(F.sum("v").cast("bigint").alias("x"))
    )
    lags = spark.range(1, AUTOCORR_LAGS + 1).select(
        F.col("id").alias("lag")
    )
    a = daily.alias("a")
    b = daily.alias("b")
    pairs = (
        lags.crossJoin(a)
        .join(
            b,
            F.col("b.d") == F.col("a.d") - F.col("lag"),
        )
        .select("lag", F.col("a.x").alias("xv"), F.col("b.x").alias("yv"))
    )
    m = pairs.groupBy("lag").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("xv").cast("bigint").alias("sx"),
        F.sum("yv").cast("bigint").alias("sy"),
        F.sum(F.col("xv") * F.col("xv")).cast("bigint").alias("sxx"),
        F.sum(F.col("yv") * F.col("yv")).cast("bigint").alias("syy"),
        F.sum(F.col("xv") * F.col("yv")).cast("bigint").alias("sxy"),
    )
    return m.select(
        F.col("lag").cast("bigint").alias("lag"),
        "n",
        F.expr(_AC_CORR).alias("corr_q"),
    )


# --------------------------------------------------- changepoint (CUSUM)
@register(
    "q_changepoint",
    oracle="""
        WITH daily AS (
            SELECT epoch_us(ts) // 86400000000 AS d,
                   CAST(SUM(CAST(floor(value + 0.5) AS BIGINT))
                        AS BIGINT) AS x
            FROM events GROUP BY d
        ),
        idx AS (
            SELECT d, x,
                   ROW_NUMBER() OVER (ORDER BY d) AS i,
                   SUM(x) OVER (ORDER BY d) AS c,
                   COUNT(*) OVER () AS n,
                   SUM(x) OVER () AS s
            FROM daily
        )
        SELECT CAST(d AS BIGINT) AS split_day,
               CAST(abs(n * c - i * s) AS BIGINT) AS score,
               CAST((c * 1000) // i AS BIGINT) AS mean_before_q,
               CAST(((s - c) * 1000) // (n - i) AS BIGINT) AS mean_after_q
        FROM idx
        WHERE i < n
        ORDER BY abs(n * c - i * s) DESC, d
        LIMIT 1
    """,
    family="timeseries",
    scale_notes=(
        "single change-point detection as the CUSUM max-deviation "
        "statistic: argmax_i |n*C_i - i*S| over prefix sums of the "
        "daily series — the exact integer rendering of max |C_i - "
        "(i/n)S|, the classic binary-segmentation step. The corpus "
        "collapses to |days| rows before any window; prefix sums are "
        "one ordered window over that tiny series, and the argmax is "
        "a LIMIT 1 with a day tiebreak (total order). Recursing into "
        "the two halves (full binary segmentation) repeats this plan "
        "on day-range filters — each level is another |days|-row "
        "window, never a corpus rescan"
    ),
)
def q_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Most likely mean-shift day in the daily event-value series via
    the integer CUSUM statistic: (split_day, score, mean_before_q,
    mean_after_q)."""

    e = events_with_time(spark, sf_dir)
    daily = (
        e.selectExpr(
            "ts_us div 86400000000 AS d",
            "CAST(floor(value + 0.5) AS BIGINT) AS v",
        )
        .groupBy("d")
        .agg(F.sum("v").cast("bigint").alias("x"))
    )
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.partitionBy()
    idx = daily.select(
        "d",
        "x",
        F.row_number().over(Window.orderBy("d")).alias("i"),
        F.sum("x").over(w).alias("c"),
        F.count(F.lit(1)).over(wall).alias("n"),
        F.sum("x").over(wall).alias("s"),
    )
    return (
        idx.filter(F.col("i") < F.col("n"))
        .select(
            F.col("d").cast("bigint").alias("split_day"),
            F.abs(F.col("n") * F.col("c") - F.col("i") * F.col("s"))
            .cast("bigint")
            .alias("score"),
            F.expr("(c * 1000) div i").cast("bigint").alias("mean_before_q"),
            F.expr("((s - c) * 1000) div (n - i)")
            .cast("bigint")
            .alias("mean_after_q"),
        )
        .orderBy(F.col("score").desc(), "split_day")
        .limit(1)
    )


# --------------------------------------------- seasonal decomposition
@register(
    "q_seasonal_decompose",
    oracle="""
        WITH daily AS (
            SELECT epoch_us(ts) // 86400000000 AS d,
                   CAST(SUM(CAST(floor(value + 0.5) AS BIGINT))
                        AS BIGINT) AS x
            FROM events GROUP BY d
        ),
        tr AS (
            SELECT d, x,
                   CAST((SUM(x * 1000) OVER w) // (COUNT(*) OVER w)
                        AS BIGINT) AS trend_q
            FROM daily
            WINDOW w AS (ORDER BY d ROWS BETWEEN 3 PRECEDING
                         AND 3 FOLLOWING)
        ),
        det AS MATERIALIZED (
            SELECT d, x, trend_q, x * 1000 - trend_q AS det_q,
                   d % 7 AS dow
            FROM tr
        ),
        -- det_q is signed. MEASURED round 8: Spark div and DuckDB
        -- integer // BOTH truncate toward zero, so they already agree;
        -- the positivity offset ((a + OFF*n) div n - OFF) pins the
        -- mean to FLOOR semantics under EVERY division convention —
        -- engine-version-proof, not a present-day divergence fix.
        seas AS (
            SELECT dow,
                   CAST((CAST(SUM(det_q) AS BIGINT)
                         + 1000000000000 * CAST(COUNT(*) AS BIGINT))
                        // CAST(COUNT(*) AS BIGINT)
                        - 1000000000000 AS BIGINT) AS seasonal_q
            FROM det GROUP BY dow
        )
        SELECT det.d AS day, det.x, det.trend_q, seas.seasonal_q,
               CAST(det.det_q - seas.seasonal_q AS BIGINT) AS resid_q
        FROM det JOIN seas USING (dow)
    """,
    family="timeseries",
    scale_notes=(
        "classical decomposition (trend / weekly seasonal / residual) "
        "in EXACT integer arithmetic: the corpus collapses to the "
        "daily series first, the trend is a centered 7-day ROWS-frame "
        "average on the x1000 grid (integer div — no FP drift across "
        "engines or partitions), the seasonal component is the "
        "day-of-week mean of detrended values (a 7-row table that "
        "joins back as a broadcast), and the residual is a "
        "subtraction. Every stage after the first aggregation touches "
        "|days| rows; STL's loess refinement swaps into the trend "
        "slot, same plan. Forecast-anomaly pipelines alert on the "
        "residual column"
    ),
)
def q_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trend (centered 7-day mean), weekly seasonal, and residual for
    the daily event-value series: (day, x, trend_q, seasonal_q,
    resid_q) on the x1000 integer grid."""

    e = events_with_time(spark, sf_dir)
    daily = (
        e.selectExpr(
            "ts_us div 86400000000 AS d",
            "CAST(floor(value + 0.5) AS BIGINT) AS v",
        )
        .groupBy("d")
        .agg(F.sum("v").cast("bigint").alias("x"))
    )
    w = Window.orderBy("d").rowsBetween(-3, 3)
    tr = (
        daily.withColumn("wsum", F.sum(F.col("x") * 1000).over(w))
        .withColumn("wcnt", F.count(F.lit(1)).over(w))
        .selectExpr("d", "x", "CAST(wsum div wcnt AS BIGINT) AS trend_q")
    )
    det = tr.selectExpr(
        "d", "x", "trend_q", "x * 1000 - trend_q AS det_q", "d % 7 AS dow"
    )
    # positivity offset before the integer mean: pins floor semantics
    # for signed det_q under every division convention (both engines
    # MEASURED truncating today — oracle comment, round-8 note)
    seas = det.groupBy("dow").agg(
        F.expr(
            "CAST((CAST(SUM(det_q) AS BIGINT)"
            " + 1000000000000 * CAST(COUNT(*) AS BIGINT))"
            " div CAST(COUNT(*) AS BIGINT)"
            " - 1000000000000 AS BIGINT)"
        ).alias("seasonal_q")
    )
    return det.join(F.broadcast(seas), "dow").selectExpr(
        "d AS day",
        "x",
        "trend_q",
        "seasonal_q",
        "CAST(det_q - seasonal_q AS BIGINT) AS resid_q",
    )


# ------------------------------------------- rolling correlation
# 7-day rolling Pearson correlation between the even-user and odd-user
# daily metric series (metric-health monitoring: a split whose halves
# decorrelate flags an instrumentation or assignment change). Daily
# sums ride the cents grid (max daily ~1.8e7 cents at sf0.1 -> squared
# 7-day moments ~2.2e15, >=4000x headroom; canary below in
# tests/test_fixture_assumptions.py). The correlation is a double
# formula over exact BIGINT window moments with text shared verbatim
# with the oracle — bit-identical (q_ab_test rule); zero-variance
# windows clamp to 0 identically.
_RCORR_DEN = (
    "(CAST(n AS DOUBLE) * CAST(saa AS DOUBLE)"
    " - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE))"
    " * (CAST(n AS DOUBLE) * CAST(sbb AS DOUBLE)"
    "    - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE))"
)
_RCORR_FORMULAS = [
    "CAST(day AS BIGINT) AS day",
    "CAST(n AS BIGINT) AS n_days",
    f"""CASE WHEN {_RCORR_DEN} <= 0.0 THEN 0.0
        ELSE (CAST(n AS DOUBLE) * CAST(sab AS DOUBLE)
              - CAST(sa AS DOUBLE) * CAST(sb AS DOUBLE))
             / sqrt({_RCORR_DEN}) END + 0.0 AS corr7""",
]


@register(
    "q_rolling_corr",
    oracle=f"""
        WITH daily AS (
            SELECT epoch_us(ts) // 86400000000 AS day,
                   SUM(CASE WHEN user_id % 2 = 0
                       THEN CAST(floor(value * 100.0 + 0.5) AS BIGINT)
                       ELSE 0 END) AS xa,
                   SUM(CASE WHEN user_id % 2 = 1
                       THEN CAST(floor(value * 100.0 + 0.5) AS BIGINT)
                       ELSE 0 END) AS xb
            FROM events GROUP BY 1
        ),
        w AS (
            SELECT day,
                   COUNT(*) OVER win AS n,
                   CAST(SUM(xa) OVER win AS BIGINT) AS sa,
                   CAST(SUM(xb) OVER win AS BIGINT) AS sb,
                   CAST(SUM(xa * xa) OVER win AS BIGINT) AS saa,
                   CAST(SUM(xb * xb) OVER win AS BIGINT) AS sbb,
                   CAST(SUM(xa * xb) OVER win AS BIGINT) AS sab
            FROM daily
            WINDOW win AS (ORDER BY day
                           RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
        )
        SELECT {', '.join(_RCORR_FORMULAS)} FROM w
    """,
    family="timeseries",
    scale_notes=(
        "7-day rolling Pearson correlation of the even/odd-user daily "
        "metric series from exact integer window moments: one events "
        "scan collapses to |days| narrow rows (map-side cents-grid "
        "partials), then six BIGINT sums over a RANGE 6-PRECEDING "
        "window on the integer day axis and a shared-text double "
        "formula per day — bit-identical across engines, zero-variance "
        "clamp. The window runs on the DAY table (tens of rows per "
        "month regardless of sf): at 100 TB the scan is the entire "
        "cost and the rolling statistics are free; per-metric slicing "
        "adds partition keys to the window, not scan passes. Moment "
        "headroom ~4000x at sf0.1 (canary-guarded); past that, drop "
        "the grid to 1e1 (the q_cuped rule)"
    ),
)
def q_rolling_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-day rolling correlation between even- and odd-user daily
    value sums; exact integer window moments, shared-text formula."""
    e = events_with_time(spark, sf_dir)
    cents = F.floor(F.col("value") * 100.0 + 0.5).cast("bigint")
    is_a = F.col("user_id") % 2 == 0
    daily = e.groupBy(
        F.expr("ts_us div 86400000000").alias("day")
    ).agg(
        F.sum(F.when(is_a, cents).otherwise(0)).alias("xa"),
        F.sum(F.when(~is_a, cents).otherwise(0)).alias("xb"),
    )
    win = Window.orderBy("day").rangeBetween(-6, 0)
    w = daily.select(
        "day",
        F.count(F.lit(1)).over(win).alias("n"),
        F.sum("xa").over(win).alias("sa"),
        F.sum("xb").over(win).alias("sb"),
        F.sum(F.col("xa") * F.col("xa")).over(win).alias("saa"),
        F.sum(F.col("xb") * F.col("xb")).over(win).alias("sbb"),
        F.sum(F.col("xa") * F.col("xb")).over(win).alias("sab"),
    )
    return w.selectExpr(*_RCORR_FORMULAS)


# ------------------------------------------------ Holt forecasting
HOLT_A_NUM, HOLT_DEN = 3, 10   # alpha = 0.3 as an exact ratio
HOLT_B_NUM = 2                 # beta = 0.2 (same denominator)
HOLT_H = 7                     # forecast horizon (days)
HOLT_U = 1_000_000             # 1e-6 fixed-point grid


@register(
    "q_holt_forecast",
    oracle=f"""
        -- Holt's linear exponential smoothing per event_type over the
        -- daily count series, ENTIRELY in 1e-6 fixed-point BIGINT
        -- arithmetic (the q_pagerank discipline). Negative trends make
        -- division sign matter: DuckDB v1.0 integer // TRUNCATES
        -- toward zero (measured: -7 // 2 = -3 — matching Spark's div,
        -- NOT Python's flooring //), so the Spark-side Python fold
        -- uses an explicit truncating tdiv. The sequential recurrence
        -- is a recursive CTE here and a per-group pandas fold there;
        -- identical integer ops => the driver hash certifies the
        -- distributed fold relationally.
        WITH RECURSIVE daily AS MATERIALIZED (
            SELECT event_type,
                   epoch_us(ts) // 86400000000 AS day,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM events GROUP BY 1, 2
        ),
        seq AS MATERIALIZED (
            SELECT event_type, n,
                   ROW_NUMBER() OVER (PARTITION BY event_type
                                      ORDER BY day) - 1 AS i
            FROM daily
        ),
        ks AS MATERIALIZED (
            SELECT event_type, CAST(COUNT(*) AS BIGINT) AS k
            FROM daily GROUP BY 1 HAVING COUNT(*) >= 2
        ),
        init AS (
            SELECT a.event_type,
                   a.n * {HOLT_U} AS level,
                   (b.n - a.n) * {HOLT_U} AS trend
            FROM seq a
            JOIN seq b ON a.event_type = b.event_type AND b.i = 1
            JOIN ks ON ks.event_type = a.event_type
            WHERE a.i = 0
        ),
        fold AS (
            SELECT event_type, CAST(0 AS BIGINT) AS i, level, trend
            FROM init
            UNION ALL
            SELECT f.event_type, f.i + 1,
                   ({HOLT_A_NUM} * s.n * {HOLT_U}
                    + {HOLT_DEN - HOLT_A_NUM} * (f.level + f.trend))
                       // {HOLT_DEN},
                   ({HOLT_B_NUM} * ((({HOLT_A_NUM} * s.n * {HOLT_U}
                        + {HOLT_DEN - HOLT_A_NUM} * (f.level + f.trend))
                        // {HOLT_DEN}) - f.level)
                    + {HOLT_DEN - HOLT_B_NUM} * f.trend) // {HOLT_DEN}
            FROM fold f
            JOIN seq s ON s.event_type = f.event_type AND s.i = f.i + 1
        )
        SELECT f.event_type, ks.k AS n_days,
               CAST(f.level AS BIGINT) AS level_ppm,
               CAST(f.trend AS BIGINT) AS trend_ppm,
               CAST(f.level + {HOLT_H} * f.trend AS BIGINT) AS fc7_ppm
        FROM fold f JOIN ks USING (event_type)
        WHERE f.i = ks.k - 1
    """,
    family="timeseries",
    scale_notes=(
        "Holt linear forecasting as an exact fixed-point per-entity "
        "state fold: the fact collapses to |entities| x days narrow "
        "daily aggregates FIRST (one partial+final shuffle — at 100 TB "
        "that is the only big data movement), then a sequential "
        "level/trend recurrence per entity in an Arrow-grouped fold. "
        "All arithmetic is BIGINT on the 1e-6 grid with floor "
        "division (alpha=3/10, beta=2/10 as exact ratios), so the "
        "result is partition-independent and engine-identical; the "
        "oracle replays the identical integers as a recursive CTE. "
        "Five entities here ride per-group applyInPandas; at MANY "
        "entities the fold moves to the secondary-sort mapInPandas "
        "template (q_debounce_anchor) — same integer kernel, "
        "~1.5ms/group pandas overhead amortized away"
    ),
)
def q_holt_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type Holt linear smoothing over daily counts:
    (event_type, n_days, level_ppm, trend_ppm, fc7_ppm) with
    l0 = x0, b0 = x1 - x0, then l = (3x + 7(l+b)) div 10,
    b = (2(l' - l) + 8b) div 10 — all exact 1e-6-grid integers."""
    import pandas as pd

    ev = events_with_time(spark, sf_dir)
    daily = (
        ev.withColumn("day", F.expr("ts_us div 86400000000"))
        .groupBy("event_type", "day")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )

    def fold(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values("day")
        ns = [int(x) for x in pdf["n"].tolist()]
        if len(ns) < 2:
            return pd.DataFrame(
                columns=[
                    "event_type", "n_days", "level_ppm", "trend_ppm",
                    "fc7_ppm",
                ]
            )
        def tdiv(a: int, b: int) -> int:
            # truncate toward zero: DuckDB integer // and Spark div
            # semantics (Python's // floors — measured divergence on
            # the negative trend terms)
            return a // b if a >= 0 else -((-a) // b)

        level = ns[0] * HOLT_U
        trend = (ns[1] - ns[0]) * HOLT_U
        for x in ns[1:]:
            nl = tdiv(
                HOLT_A_NUM * x * HOLT_U
                + (HOLT_DEN - HOLT_A_NUM) * (level + trend),
                HOLT_DEN,
            )
            trend = tdiv(
                HOLT_B_NUM * (nl - level) + (HOLT_DEN - HOLT_B_NUM) * trend,
                HOLT_DEN,
            )
            level = nl
        return pd.DataFrame(
            [
                {
                    "event_type": pdf["event_type"].iloc[0],
                    "n_days": len(ns),
                    "level_ppm": level,
                    "trend_ppm": trend,
                    "fc7_ppm": level + HOLT_H * trend,
                }
            ]
        )

    return daily.groupBy("event_type").applyInPandas(
        fold,
        schema=(
            "event_type string, n_days long, level_ppm long,"
            " trend_ppm long, fc7_ppm long"
        ),
    )
