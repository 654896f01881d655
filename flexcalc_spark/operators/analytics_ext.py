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
    basket = basket.cache()  # 4 consumers: n_orders, item_n, self-join x2
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
