"""Window-function operators (SURVEY.md §2.2 "Window functions").

Every window here carries a total order (explicit tiebreak keys) so
running/moving aggregates accumulate in one deterministic sequence — the
FP accumulation order is then identical across engines and partitionings.

Scale: a window = one shuffle on partitionBy keys + an in-partition sort.
user_id/custkey partitions are small and numerous (good parallelism); a
single global-order window (no partitionBy) would serialize and is
deliberately absent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from flexcalc_spark.registry import register
from flexcalc_spark.tables import table, events_with_time


@register(
    "q_win_rank",
    oracle="""
        SELECT o_custkey, o_orderkey,
               CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
                    ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rn,
               CAST(RANK() OVER (PARTITION BY o_custkey
                    ORDER BY o_orderpriority) AS BIGINT) AS rnk,
               CAST(DENSE_RANK() OVER (PARTITION BY o_custkey
                    ORDER BY o_orderpriority) AS BIGINT) AS drnk
        FROM orders
    """,
    family="windows",
    scale_notes="one shuffle on o_custkey serves all three rank functions",
)
def q_win_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """row_number (total-order tiebreak) + rank/dense_rank (deterministic
    under ties because tied rows share the rank)."""
    o = table(spark, sf_dir, "orders")
    w_rn = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), "o_orderkey"
    )
    w_pri = Window.partitionBy("o_custkey").orderBy("o_orderpriority")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.row_number().over(w_rn).cast("bigint").alias("rn"),
        F.rank().over(w_pri).cast("bigint").alias("rnk"),
        F.dense_rank().over(w_pri).cast("bigint").alias("drnk"),
    )


@register(
    "q_win_topk_group",
    oracle="""
        SELECT o_custkey, o_orderkey, o_totalprice
        FROM (
            SELECT o_custkey, o_orderkey, o_totalprice,
                   ROW_NUMBER() OVER (PARTITION BY o_custkey
                        ORDER BY o_totalprice DESC, o_orderkey) AS rn
            FROM orders
        ) WHERE rn <= 3
    """,
    family="windows",
    scale_notes="rank-filter top-k per group; Spark pushes a per-partition limit into the window sort (WindowGroupLimit)",
)
def q_win_topk_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer by price."""
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), "o_orderkey"
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice")
    )


@register(
    "q_win_lag_lead",
    oracle="""
        SELECT event_id, user_id, value,
               LAG(value) OVER w AS prev_value,
               LEAD(value) OVER w AS next_value,
               value - LAG(value) OVER w AS delta
        FROM (SELECT event_id, user_id, value, epoch_us(ts) AS ts_us FROM events)
        WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
    """,
    family="windows",
    scale_notes="lag/lead share one sorted pass; delta is per-row FP (unrounded, bit-identical)",
)
def q_win_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead and per-user delta ordered by event time."""
    e = events_with_time(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    prev = F.lag("value").over(w)
    return e.select(
        "event_id",
        "user_id",
        "value",
        prev.alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
        (F.col("value") - prev).alias("delta"),
    )


@register(
    "q_win_running",
    oracle="""
        SELECT o_custkey, o_orderkey,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) OVER w AS DOUBLE) AS running_total,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) OVER w AS DOUBLE)
                   / (COUNT(*) OVER w) AS running_avg
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                     ROWS UNBOUNDED PRECEDING)
    """,
    family="windows",
    scale_notes="running sums in DECIMAL: DuckDB evaluates window aggs via segment trees (different FP combine order than Spark's sequential frame), so double sums are not reproducible — decimal is exact on both",
)
def q_win_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative sum/avg per customer in order-date order.

    Decimal-cast running sum (exact, engine-independent); avg emitted as
    one unrounded double division of identical operands (bit-identical).
    money/2^k divisions land exactly on ROUND ties, so rounding here is
    the hazard, not FP noise."""
    o = table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    dec_sum = F.sum(F.col("o_totalprice").cast("decimal(18,6)")).over(w).cast("double")
    return o.select(
        "o_custkey",
        "o_orderkey",
        dec_sum.alias("running_total"),
        (dec_sum / F.count(F.lit(1)).over(w)).alias("running_avg"),
    )


@register(
    "q_win_moving",
    oracle="""
        SELECT event_id, user_id,
               ROUND(AVG(value) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                     ROWS BETWEEN 3 PRECEDING AND CURRENT ROW), 4) AS mov_avg,
               ROUND(MIN(value) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                     ROWS BETWEEN 3 PRECEDING AND CURRENT ROW), 4) AS mov_min
        FROM (SELECT event_id, user_id, value, epoch_us(ts) AS ts_us FROM events)
    """,
    family="windows",
    scale_notes="bounded sliding frame: O(1) state per row",
)
def q_win_moving(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Moving average/min over a 4-row trailing frame."""
    e = events_with_time(spark, sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(-3, 0)
    )
    return e.select(
        "event_id",
        "user_id",
        F.round(F.avg("value").over(w), 4).alias("mov_avg"),
        F.round(F.min("value").over(w), 4).alias("mov_min"),
    )


@register(
    "q_win_range_time",
    oracle="""
        SELECT event_id, user_id, ts_sec,
               ROUND(SUM(value) OVER (PARTITION BY user_id ORDER BY ts_sec
                     RANGE BETWEEN 600 PRECEDING AND CURRENT ROW), 4) AS trailing_10m,
               COUNT(*) OVER (PARTITION BY user_id ORDER BY ts_sec
                     RANGE BETWEEN 600 PRECEDING AND CURRENT ROW) AS n_10m
        FROM (SELECT event_id, user_id, value, epoch_ns(ts) // 1000000000 AS ts_sec
              FROM events)
    """,
    family="windows",
    scale_notes="numeric RANGE frame on epoch seconds — portable (no interval-frame dialect drift) and exact",
)
def q_win_range_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10-minute trailing sum per user via a numeric range frame.

    RANGE frames include all peers of the current ts_sec value, so ties
    contribute the same row set on both engines (deterministic)."""
    e = events_with_time(spark, sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_sec")
        .rangeBetween(-600, 0)
    )
    return e.select(
        "event_id",
        "user_id",
        "ts_sec",
        F.round(F.sum("value").over(w), 4).alias("trailing_10m"),
        F.count(F.lit(1)).over(w).alias("n_10m"),
    )


@register(
    "q_win_ntile",
    oracle="""
        SELECT c_custkey,
               CAST(NTILE(4) OVER w AS BIGINT) AS quartile,
               ROUND(PERCENT_RANK() OVER w, 4) + 0.0 AS pct_rank,
               ROUND(CUME_DIST() OVER w, 4) AS cume
        FROM customer
        WINDOW w AS (ORDER BY c_acctbal, c_custkey)
    """,
    family="windows",
    scale_notes="global-order window over the small customer dim only; at 100 TB use approx quantiles instead of a global sort",
)
def q_win_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile/percent_rank/cume_dist with a total order."""
    c = table(spark, sf_dir, "customer")
    w = Window.orderBy("c_acctbal", "c_custkey")
    return c.select(
        "c_custkey",
        F.ntile(4).over(w).cast("bigint").alias("quartile"),
        (F.round(F.percent_rank().over(w), 4) + 0.0).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 4).alias("cume"),
    )


@register(
    "q_win_firstlast",
    oracle="""
        SELECT event_id, user_id,
               FIRST_VALUE(event_id) OVER w AS first_ev,
               LAST_VALUE(event_id) OVER w AS last_ev,
               NTH_VALUE(event_id, 2) OVER w AS second_ev
        FROM (SELECT event_id, user_id, epoch_us(ts) AS ts_us FROM events)
        WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
    family="windows",
    scale_notes="explicit unbounded frame (default frame would truncate last_value at current row)",
)
def q_win_firstlast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first/last/nth value over an explicit full-partition frame."""
    e = events_with_time(spark, sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return e.select(
        "event_id",
        "user_id",
        F.first("event_id").over(w).alias("first_ev"),
        F.last("event_id").over(w).alias("last_ev"),
        F.nth_value("event_id", 2).over(w).alias("second_ev"),
    )


@register(
    "q_win_distribution",
    oracle="""
        SELECT event_id, event_type, value,
               CAST(((rk - 1) * 1000000) // (n - 1) AS BIGINT) AS pr_q,
               CAST((cum * 1000000) // n AS BIGINT) AS cume_q
        FROM (
            SELECT event_id, event_type, value,
                   RANK() OVER (PARTITION BY event_type
                                ORDER BY value) AS rk,
                   COUNT(*) OVER (PARTITION BY event_type
                                  ORDER BY value) AS cum,
                   COUNT(*) OVER (PARTITION BY event_type) AS n
            FROM events
        )
    """,
    family="windows",
    scale_notes=(
        "percent_rank / cume_dist as EXACT integer window math: the "
        "built-ins return doubles whose (rank-1)/(n-1) division can "
        "differ in the last ulp across engines, so the quantized "
        "((rank-1)*1e6) div (n-1) and (cume*1e6) div n forms compute "
        "the same statistic with zero FP — RANK ties and the "
        "RANGE-framed running count handle duplicates identically "
        "everywhere. One partition-sort per event_type, the same "
        "shuffle any ranked window pays; at 100 TB a skewed type "
        "partitions by (type, value-range) with a two-pass global "
        "rank (the q_global_rank construction)"
    ),
)
def q_win_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type distribution position of every event: exact quantized
    percent_rank (pr_q) and cume_dist (cume_q) per event_id."""
    e = events_with_time(spark, sf_dir)
    # RANK() returns INT on Spark (BIGINT on DuckDB): the (rk-1)*1e6
    # product must be computed in BIGINT — as INT x INT it sits only
    # 7% under the INT32 cliff at sf0.01 and overflows at sf0.1
    # (caught by the 10x scale probe, round 6).
    return e.selectExpr(
        "event_id",
        "event_type",
        "value",
        "CAST(RANK() OVER (PARTITION BY event_type ORDER BY value)"
        " AS BIGINT) AS rk",
        "COUNT(*) OVER (PARTITION BY event_type ORDER BY value) AS cum",
        "COUNT(*) OVER (PARTITION BY event_type) AS n",
    ).selectExpr(
        "event_id",
        "event_type",
        "value",
        "CAST(((rk - 1) * 1000000) div (n - 1) AS BIGINT) AS pr_q",
        "CAST((cum * 1000000) div n AS BIGINT) AS cume_q",
    )
