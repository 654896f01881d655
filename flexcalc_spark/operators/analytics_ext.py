"""Round-6 analytics extensions: association rules and survival curves.

Two classic warehouse analytics the reference's query surface implies
(SURVEY §2.3 analytics rows) that compose entirely from relational
primitives: market-basket rule mining (support / confidence / lift
over order baskets) and a discrete survival curve over user lifetimes.

Reference cite (mount empty, SURVEY §0): Agrawal & Srikant 1994 for
the support/confidence framing; Kaplan-Meier for the survival shape
(rendered discrete/integer here).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flexcalc_spark.registry import register
from flexcalc_spark.tables import table

BASKET_MIN_SUPPORT = 3   # pair must appear in >= 3 orders
RULE_TOP = 20


@register(
    "q_market_basket",
    oracle=f"""
        WITH basket AS MATERIALIZED (
            SELECT DISTINCT l_orderkey AS oid, l_partkey AS item
            FROM lineitem
        ),
        n_orders AS (SELECT CAST(COUNT(DISTINCT oid) AS BIGINT) AS n
                     FROM basket),
        item_n AS (SELECT item, CAST(COUNT(*) AS BIGINT) AS c
                   FROM basket GROUP BY item),
        pair_n AS (
            SELECT a.item AS x, b.item AS y,
                   CAST(COUNT(*) AS BIGINT) AS cxy
            FROM basket a JOIN basket b
              ON a.oid = b.oid AND a.item < b.item
            GROUP BY a.item, b.item
            HAVING COUNT(*) >= {BASKET_MIN_SUPPORT}
        ),
        rules AS (
            SELECT x, y, cxy, ix.c AS cx, iy.c AS cy,
                   CAST((cxy * 1000000) // ix.c AS BIGINT) AS conf_q,
                   CAST((cxy * n.n * 10000) // (ix.c * iy.c) AS BIGINT)
                       AS lift_q
            FROM pair_n
            JOIN item_n ix ON ix.item = x
            JOIN item_n iy ON iy.item = y
            CROSS JOIN n_orders n
        )
        SELECT x, y, cxy, conf_q, lift_q
        FROM (
            SELECT *, ROW_NUMBER() OVER (
                       ORDER BY lift_q DESC, cxy DESC, x, y) AS rk
            FROM rules
        ) WHERE rk <= {RULE_TOP}
    """,
    family="analytics",
    scale_notes=(
        "market-basket rules (support/confidence/lift) from the order "
        "baskets: the pair census is a self-equi-join on the order key "
        "with u<v orientation — candidate volume is sum(basket^2)/2, "
        "bounded by basket size, never corpus^2 — and the support "
        "HAVING prunes before the rule math, which runs on "
        "|frequent pairs| rows against a broadcast item census. "
        "Confidence and lift ride integer ppm/1e4 div grids (the lift "
        "numerator cxy*n*1e4 stays under 2^63 to ~1e9 orders at this "
        "grid). A-priori pruning: items below min-support are "
        "broadcast-semi-filtered out of the basket BEFORE the pair "
        "self-join (a pair can only be frequent if both items are), "
        "so the quadratic census runs on the frequent-item basket "
        "only. Top-k by lift is orderBy+limit with full tiebreaks — "
        "TakeOrderedAndProject (per-partition heaps + driver merge), "
        "never a global row_number window"
    ),
)
def q_market_basket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 part-pair association rules by lift over order baskets:
    (x, y, cxy, conf_q, lift_q)."""
    li = table(spark, sf_dir, "lineitem")
    basket = li.select(
        F.col("l_orderkey").alias("oid"), F.col("l_partkey").alias("item")
    ).distinct()
    # NOT cached: caching pins the distinct's 200-partition layout as
    # an InMemoryRelation that AQE can no longer coalesce — measured
    # 12-30s vs 0.7s uncached in a vanilla session (task overhead on
    # hundreds of near-empty self-join partitions). Exchange reuse
    # already dedups the repeated distinct subtree; the CLAUDE.md
    # caching rule is for recomputed HOF arrays, not cheap shuffles.
    n_orders = basket.agg(
        F.countDistinct("oid").cast("bigint").alias("n")
    )
    item_n = basket.groupBy("item").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    # a-priori: a pair reaching min-support needs both items frequent
    freq_items = item_n.filter(
        F.col("c") >= BASKET_MIN_SUPPORT
    ).select("item")
    fbasket = basket.join(F.broadcast(freq_items), "item", "leftsemi")
    a = fbasket.alias("a")
    b = fbasket.alias("b")
    pair_n = (
        a.join(
            b,
            (F.col("a.oid") == F.col("b.oid"))
            & (F.col("a.item") < F.col("b.item")),
        )
        .groupBy(F.col("a.item").alias("x"), F.col("b.item").alias("y"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("cxy"))
        .filter(F.col("cxy") >= BASKET_MIN_SUPPORT)
    )
    rules = (
        pair_n.join(
            F.broadcast(
                item_n.select(
                    F.col("item").alias("x"), F.col("c").alias("cx")
                )
            ),
            "x",
        )
        .join(
            F.broadcast(
                item_n.select(
                    F.col("item").alias("y"), F.col("c").alias("cy")
                )
            ),
            "y",
        )
        .crossJoin(F.broadcast(n_orders))
        .selectExpr(
            "x",
            "y",
            "cxy",
            "CAST((cxy * 1000000) div cx AS BIGINT) AS conf_q",
            "CAST((cxy * n * 10000) div (cx * cy) AS BIGINT) AS lift_q",
        )
    )
    return (
        rules.orderBy(
            F.col("lift_q").desc(), F.col("cxy").desc(), "x", "y"
        )
        .limit(RULE_TOP)
        .select("x", "y", "cxy", "conf_q", "lift_q")
    )


SURVIVAL_MAX_DAYS = 30


@register(
    "q_survival",
    oracle=f"""
        WITH life AS (
            SELECT user_id,
                   (MAX(epoch_us(ts)) - MIN(epoch_us(ts)))
                       // 86400000000 AS days
            FROM events GROUP BY user_id
        ),
        n_users AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM life),
        t AS (SELECT unnest(range(0, {SURVIVAL_MAX_DAYS + 1})) AS day)
        SELECT CAST(t.day AS BIGINT) AS day,
               CAST(SUM(CASE WHEN life.days >= t.day THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_surviving,
               CAST((SUM(CASE WHEN life.days >= t.day THEN 1 ELSE 0 END)
                     * 1000000) // n.n AS BIGINT) AS surv_ppm
        FROM t CROSS JOIN life CROSS JOIN n_users n
        GROUP BY t.day, n.n
    """,
    family="analytics",
    scale_notes=(
        "discrete survival curve over user lifetimes (first-to-last "
        "activity span): the corpus collapses to one row per user "
        "FIRST (integer epoch-µs min/max — one shuffle), then the "
        "per-user table collapses AGAIN to a lifetime-day histogram "
        "(<= |days|+1 buckets, days past the horizon clamp into one "
        "overflow bucket) and the curve is a reverse cumulative-sum "
        "window over those <= 32 rows — constant-size tail work, no "
        "|days|x|users| expansion anywhere, so a billion users costs "
        "two aggregations and 32 rows of window arithmetic. The "
        "churn/retention signal product teams track. Integer ppm "
        "survival fractions, engine-exact"
    ),
)
def q_survival(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survival curve S(t): users whose activity span >= t days, for
    t in 0..30 (day, n_surviving, surv_ppm).

    Plan: per-user lifetime agg -> histogram over clamped day buckets
    (users with days > horizon land in one overflow bucket, counted by
    every t) -> reverse running sum over the <= 32-row bucket axis.
    The only unpartitioned window runs on a constant-size table and the
    only BroadcastNestedLoopJoin is the 1-row n_users attach.
    """
    from pyspark.sql.window import Window

    from flexcalc_spark.tables import events_with_time

    horizon = SURVIVAL_MAX_DAYS + 1  # overflow bucket for days > max
    e = events_with_time(spark, sf_dir)
    life = e.groupBy("user_id").agg(
        F.expr(
            "CAST((MAX(ts_us) - MIN(ts_us)) div 86400000000 AS BIGINT)"
        ).alias("days")
    )
    hist = life.groupBy(
        F.least(F.col("days"), F.lit(horizon)).alias("bucket")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    n_users = life.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    t = spark.range(0, horizon + 1).select(F.col("id").alias("day"))
    full = t.join(
        F.broadcast(hist), t["day"] == hist["bucket"], "left"
    ).select("day", F.coalesce(F.col("cnt"), F.lit(0)).alias("cnt"))
    # reverse cumulative sum: n_surviving(t) = sum of cnt over day >= t
    w = (
        Window.orderBy(F.col("day").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        full.withColumn(
            "n_surviving", F.sum("cnt").over(w).cast("bigint")
        )
        .filter(F.col("day") <= SURVIVAL_MAX_DAYS)
        .crossJoin(F.broadcast(n_users))
        .selectExpr(
            "CAST(day AS BIGINT) AS day",
            "n_surviving",
            "CAST((n_surviving * 1000000) div n AS BIGINT) AS surv_ppm",
        )
    )


# ------------------------------------------------------- attribution
ATTR_LOOKBACK_US = 7 * 86_400_000_000  # 7-day last-touch window


@register(
    "q_attribution",
    oracle=f"""
        WITH p AS (
            SELECT event_id, user_id, epoch_us(ts) AS us,
                   CAST(FLOOR(value * 1000000.0 + 0.5) AS BIGINT) AS vg
            FROM events WHERE event_type = 'purchase'
        ),
        c AS (
            SELECT user_id, epoch_us(ts) AS us
            FROM events WHERE event_type = 'click'
        ),
        attr AS (
            SELECT p.event_id, p.us, p.vg,
                   MAX(c.us) AS click_us
            FROM p LEFT JOIN c
              ON c.user_id = p.user_id
             AND c.us < p.us
             AND c.us >= p.us - {ATTR_LOOKBACK_US}
            GROUP BY p.event_id, p.us, p.vg
        )
        SELECT us // 86400000000 AS day,
               CAST(COUNT(*) AS BIGINT) AS n_purchases,
               CAST(SUM(CASE WHEN click_us IS NOT NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_attributed,
               ROUND(CAST(SUM(CASE WHEN click_us IS NOT NULL THEN vg
                                   ELSE CAST(0 AS BIGINT) END) AS DOUBLE)
                     / 1000000.0, 4) AS attr_value
        FROM attr
        GROUP BY day
    """,
    family="analytics",
    scale_notes=(
        "last-touch marketing attribution (every purchase credited to "
        "the latest click by the same user within a 7-day lookback): "
        "an interval join — equi on user_id with the time bounds as "
        "residuals inside the hash partition (the q_join_range "
        "discipline), then a per-purchase MAX collapse and a daily "
        "census. Pair volume is sum over users of clicks x purchases "
        "within the lookback, never corpus^2; at 100 TB both event "
        "streams partition by user and the lookback bound keeps the "
        "per-user window finite. The TRUE streaming rendering exists "
        "beside it (streaming/windows.py stream_attribution_pairs — "
        "watermarked stream-stream interval join, "
        "batch-equivalence-tested). Strict "
        "c.us < p.us on integer epoch-µs on both engines — no "
        "window-frame tie ambiguity"
    ),
)
def q_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily last-touch attribution census: purchases, attributed
    purchases, and attributed grid revenue (day, n_purchases,
    n_attributed, attr_value)."""
    from flexcalc_spark.tables import events_with_time

    e = events_with_time(spark, sf_dir)
    p = e.filter(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        F.col("ts_us").alias("p_us"),
        F.floor(F.col("value") * 1_000_000.0 + 0.5)
        .cast("bigint")
        .alias("vg"),
    )
    c = e.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"), F.col("ts_us").alias("c_us")
    )
    attr = (
        p.join(
            c,
            (F.col("c_user") == F.col("user_id"))
            & (F.col("c_us") < F.col("p_us"))
            & (F.col("c_us") >= F.col("p_us") - ATTR_LOOKBACK_US),
            "left",
        )
        .groupBy("event_id", "p_us", "vg")
        .agg(F.max("c_us").alias("click_us"))
    )
    return (
        attr.groupBy(
            F.expr("p_us div 86400000000").alias("day")
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_purchases"),
            F.sum(
                F.when(F.col("click_us").isNotNull(), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_attributed"),
            F.round(
                F.sum(
                    F.when(
                        F.col("click_us").isNotNull(), F.col("vg")
                    ).otherwise(F.lit(0).cast("bigint"))
                ).cast("double")
                / 1_000_000.0,
                4,
            ).alias("attr_value"),
        )
    )


# ----------------------------------------------- period over period
@register(
    "q_period_over_period",
    oracle="""
        WITH m AS (
            SELECT CAST(year(o_orderdate) AS BIGINT) AS y,
                   CAST(month(o_orderdate) AS BIGINT) AS m,
                   CAST(SUM(CAST(FLOOR(o_totalprice * 1000000.0 + 0.5)
                       AS BIGINT)) AS BIGINT) AS rev_q
            FROM orders GROUP BY y, m
        )
        SELECT y, m, rev_q,
               CAST(rev_q - LAG(rev_q, 1) OVER w AS BIGINT) AS mom_q,
               CAST(rev_q - LAG(rev_q, 12) OVER w AS BIGINT) AS yoy_q
        FROM m
        WINDOW w AS (ORDER BY y, m)
    """,
    family="analytics",
    scale_notes=(
        "period-over-period revenue deltas (MoM via lag-1, YoY via "
        "lag-12): the corpus collapses to one grid BIGINT per month "
        "FIRST (map-side combined), and the lag windows run over the "
        "|months| rows that remain — the only unpartitioned window in "
        "the plan is over a calendar-bounded constant-size table (the "
        "q_survival discipline). Deltas are exact BIGINT differences; "
        "missing lags emit NULL identically on both engines"
    ),
)
def q_period_over_period(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly revenue with month-over-month and year-over-year grid
    deltas (y, m, rev_q, mom_q, yoy_q)."""
    from pyspark.sql.window import Window

    o = table(spark, sf_dir, "orders")
    m = o.groupBy(
        F.year("o_orderdate").cast("bigint").alias("y"),
        F.month("o_orderdate").cast("bigint").alias("m"),
    ).agg(
        F.sum(
            F.floor(F.col("o_totalprice") * 1_000_000.0 + 0.5).cast(
                "bigint"
            )
        ).alias("rev_q")
    )
    w = Window.orderBy("y", "m")
    return m.select(
        "y",
        "m",
        "rev_q",
        (F.col("rev_q") - F.lag("rev_q", 1).over(w)).alias("mom_q"),
        (F.col("rev_q") - F.lag("rev_q", 12).over(w)).alias("yoy_q"),
    )


# ------------------------------------------------------- cohort LTV
COHORT_BUCKET_US = 7 * 86_400_000_000  # weekly cohorts / ages


@register(
    "q_cohort_ltv",
    oracle=f"""
        WITH e AS (
            SELECT user_id, epoch_us(ts) AS us,
                   CAST(FLOOR(value * 1000000.0 + 0.5) AS BIGINT) AS vg,
                   event_type
            FROM events
        ),
        cohort AS (
            SELECT user_id, MIN(us // {COHORT_BUCKET_US}) AS cw
            FROM e GROUP BY user_id
        ),
        cell AS (
            SELECT cw AS cohort_week,
                   e.us // {COHORT_BUCKET_US} - cw AS age_weeks,
                   CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS n_users,
                   SUM(e.vg) AS val_q
            FROM e JOIN cohort USING (user_id)
            WHERE e.event_type = 'purchase'
            GROUP BY cohort_week, age_weeks
        )
        SELECT CAST(cohort_week AS BIGINT) AS cohort_week,
               CAST(age_weeks AS BIGINT) AS age_weeks,
               n_users,
               CAST(SUM(val_q) OVER (PARTITION BY cohort_week
                    ORDER BY age_weeks ROWS UNBOUNDED PRECEDING)
                    AS BIGINT) AS cum_value_q
        FROM cell
    """,
    family="analytics",
    scale_notes=(
        "cohort lifetime-value curves (cumulative purchase value per "
        "signup-week cohort by age): per-user first-activity week is "
        "one aggregation, the cohort attach is an unhinted equi join "
        "on user_id (per-user build side grows with the corpus — AQE "
        "broadcasts it at fixture scale, shuffles it at 100 TB), the "
        "cell census collapses the corpus to "
        "|cohorts| x |ages| rows, and the cumulative sum runs over "
        "that calendar-bounded grid — corpus-scale work is two "
        "aggregations and one user-keyed join. Epoch-week buckets "
        "(integer µs div) keep the bucketing calendar-free and "
        "engine-exact; the LTV running sum is BIGINT over grid values"
    ),
)
def q_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly-cohort LTV curve: distinct purchasers and cumulative grid
    purchase value per (cohort_week, age_weeks)."""
    from pyspark.sql.window import Window

    from flexcalc_spark.tables import events_with_time

    e = events_with_time(spark, sf_dir).select(
        "user_id",
        "ts_us",
        "event_type",
        F.floor(F.col("value") * 1_000_000.0 + 0.5)
        .cast("bigint")
        .alias("vg"),
        F.expr(f"ts_us div {COHORT_BUCKET_US}").alias("week"),
    )
    cohort = e.groupBy("user_id").agg(F.min("week").alias("cw"))
    cell = (
        e.filter(F.col("event_type") == "purchase")
        # No broadcast hint (ADVICE r7): the cohort table is per-user —
        # it grows with the corpus, so at 100 TB this must stay a
        # user-keyed shuffle equi join (both sides partition on
        # user_id). At fixture scale AQE sees the ~150-row aggregate
        # and broadcasts it at runtime anyway; pinning the hint would
        # force an executor-memory build side at scale.
        .join(cohort, "user_id")
        .groupBy(
            F.col("cw").alias("cohort_week"),
            (F.col("week") - F.col("cw")).alias("age_weeks"),
        )
        .agg(
            F.countDistinct("user_id").cast("bigint").alias("n_users"),
            F.sum("vg").alias("val_q"),
        )
    )
    w = (
        Window.partitionBy("cohort_week")
        .orderBy("age_weeks")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return cell.select(
        F.col("cohort_week").cast("bigint").alias("cohort_week"),
        F.col("age_weeks").cast("bigint").alias("age_weeks"),
        "n_users",
        F.sum("val_q").over(w).cast("bigint").alias("cum_value_q"),
    )
