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
        WITH basket AS (
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
        "grid). Top-k by lift with full tiebreaks. At 100 TB the "
        "standard refinement filters items below min-support BEFORE "
        "the pair join (a-priori pruning) — one extra broadcast "
        "semi-join, same shape"
    ),
)
def q_market_basket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 part-pair association rules by lift over order baskets:
    (x, y, cxy, conf_q, lift_q)."""
    from pyspark.sql.window import Window

    li = table(spark, sf_dir, "lineitem")
    basket = li.select(
        F.col("l_orderkey").alias("oid"), F.col("l_partkey").alias("item")
    ).distinct()
    n_orders = basket.agg(
        F.countDistinct("oid").cast("bigint").alias("n")
    )
    item_n = basket.groupBy("item").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    a = basket.alias("a")
    b = basket.alias("b")
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
    rk = F.row_number().over(
        Window.orderBy(
            F.col("lift_q").desc(), F.col("cxy").desc(), "x", "y"
        )
    )
    return (
        rules.withColumn("rk", rk)
        .filter(F.col("rk") <= RULE_TOP)
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
        "curve is a |days|x|users| conditional census — at 100 TB "
        "replace the cross join with a lifetime-day histogram + "
        "reverse cumulative sum window (|days| rows; same output, "
        "documented swap) — the churn/retention signal product teams "
        "track. Integer ppm survival fractions, engine-exact"
    ),
)
def q_survival(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survival curve S(t): users whose activity span >= t days, for
    t in 0..30 (day, n_surviving, surv_ppm)."""
    from flexcalc_spark.tables import events_with_time

    e = events_with_time(spark, sf_dir)
    life = e.groupBy("user_id").agg(
        F.expr(
            "CAST((MAX(ts_us) - MIN(ts_us)) div 86400000000 AS BIGINT)"
        ).alias("days")
    )
    n_users = life.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    t = spark.range(0, SURVIVAL_MAX_DAYS + 1).select(
        F.col("id").alias("day")
    )
    return (
        t.crossJoin(life)
        .crossJoin(F.broadcast(n_users))
        .groupBy("day", "n")
        .agg(
            F.sum(
                F.when(F.col("days") >= F.col("day"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_surviving")
        )
        .selectExpr(
            "CAST(day AS BIGINT) AS day",
            "n_surviving",
            "CAST((n_surviving * 1000000) div n AS BIGINT) AS surv_ppm",
        )
    )
