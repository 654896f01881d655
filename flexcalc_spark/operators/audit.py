"""Data-quality gates — constraint audit + single-pass column profiling.

A 100 TB training-data ingest needs machine-checkable quality gates
between pipeline stages (the Deequ / dbt-test shape): primary-key
uniqueness, referential integrity, null rates, domain/range membership
— each producing a (check, n_checked, n_violations) row a scheduler can
assert on. And before writing any transform, a per-column profile
(null count, distinct count, min/max) is the cheapest drift detector
between corpus generations.

Plan shape:

- q_data_audit: all same-table predicates FUSE into one aggregate scan
  per table (conditional-sum counters, map-side partial); the one
  cross-table check (FK orphans) is a key-shuffle anti join. The output
  is a handful of rows — the union of 1-row aggregates is driver-free.
- q_data_profile: ONE pass over the fact table computes every
  (null, distinct, min, max) cell as 20 aggregate expressions on one
  row, then ``stack`` unpivots to the long (col_name, metrics) shape —
  no per-column rescan loop.

Reference cite (mount empty, SURVEY §0): no public-flexcalc analogue;
north-star pipeline operator (SURVEY §2.3 — corpus curation gates).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flexcalc_spark.registry import register
from flexcalc_spark.tables import epoch_us_col, table

# Audit window for event timestamps (fixture generations have stayed in
# 2024; the check exists to catch epoch-unit regressions — a ns/µs mixup
# moves timestamps by x1000 and trips this immediately).
_TS_LO_US = 1_577_836_800_000_000  # 2020-01-01
_TS_HI_US = 1_893_456_000_000_000  # 2030-01-01


@register(
    "q_data_audit",
    oracle=f"""
        SELECT 'orders_pk_unique' AS check_name,
               CAST(COUNT(*) AS BIGINT) AS n_checked,
               CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT)
                   AS n_violations
        FROM orders
        UNION ALL
        SELECT 'lineitem_fk_orders',
               CAST(COUNT(*) AS BIGINT),
               CAST(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT)
        FROM lineitem LEFT JOIN orders ON l_orderkey = o_orderkey
        UNION ALL
        SELECT 'lineitem_discount_range',
               CAST(COUNT(*) AS BIGINT),
               CAST(SUM(CASE WHEN l_discount < 0.0 OR l_discount > 1.0
                             THEN 1 ELSE 0 END) AS BIGINT)
        FROM lineitem
        UNION ALL
        SELECT 'customer_acctbal_nonnull',
               CAST(COUNT(*) AS BIGINT),
               CAST(SUM(CASE WHEN c_acctbal IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT)
        FROM customer
        UNION ALL
        SELECT 'orders_status_domain',
               CAST(COUNT(*) AS BIGINT),
               CAST(SUM(CASE WHEN o_orderstatus NOT IN ('F', 'O', 'P')
                             THEN 1 ELSE 0 END) AS BIGINT)
        FROM orders
        UNION ALL
        SELECT 'events_ts_bounds',
               CAST(COUNT(*) AS BIGINT),
               CAST(SUM(CASE WHEN epoch_us(ts) < {_TS_LO_US}
                               OR epoch_us(ts) >= {_TS_HI_US}
                             THEN 1 ELSE 0 END) AS BIGINT)
        FROM events
    """,
    family="audit",
    scale_notes=(
        "constraint audit (the Deequ/dbt-test gate between pipeline "
        "stages): every same-table predicate is a conditional-sum "
        "counter FUSED into one aggregate scan per table (orders "
        "carries pk-uniqueness + domain in a single pass; the pk check "
        "is COUNT-COUNT DISTINCT, two-phase and skew-free), so auditing "
        "a 100 TB table costs one scan regardless of how many checks it "
        "carries. The FK-orphan check is the only cross-table piece: a "
        "key-shuffle LEFT join counting null probes — at scale, run it "
        "on the FK column projection only (two narrow column scans) and "
        "let AQE pick broadcast when the parent's key set fits. Output "
        "is one row per check: the scheduler asserts n_violations = 0 "
        "before promoting the corpus generation"
    ),
)
def q_data_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Constraint audit over the fixture warehouse: six checks, one row
    each — (check_name, n_checked, n_violations)."""
    orders = table(spark, sf_dir, "orders")
    lineitem = table(spark, sf_dir, "lineitem")
    customer = table(spark, sf_dir, "customer")
    events = table(spark, sf_dir, "events")

    def one(name: str, df: DataFrame, viol: F.Column) -> DataFrame:
        return df.agg(
            F.lit(name).alias("check_name"),
            F.count(F.lit(1)).cast("bigint").alias("n_checked"),
            viol.cast("bigint").alias("n_violations"),
        )

    # orders: pk uniqueness + status domain fuse into ONE scan via a
    # single agg producing both rows post-stack
    o_agg = orders.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        (F.count(F.lit(1)) - F.countDistinct("o_orderkey"))
        .cast("bigint")
        .alias("dup_pk"),
        F.sum(
            F.when(~F.col("o_orderstatus").isin("F", "O", "P"), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("bad_status"),
    )
    o_checks = o_agg.selectExpr(
        "stack(2, 'orders_pk_unique', n, dup_pk,"
        " 'orders_status_domain', n, bad_status)"
        " AS (check_name, n_checked, n_violations)"
    )

    fk = one(
        "lineitem_fk_orders",
        lineitem.join(
            orders.select("o_orderkey"),
            lineitem.l_orderkey == F.col("o_orderkey"),
            "left",
        ),
        F.sum(F.when(F.col("o_orderkey").isNull(), 1).otherwise(0)),
    )
    disc = one(
        "lineitem_discount_range",
        lineitem,
        F.sum(
            F.when(
                (F.col("l_discount") < 0.0) | (F.col("l_discount") > 1.0), 1
            ).otherwise(0)
        ),
    )
    cust = one(
        "customer_acctbal_nonnull",
        customer,
        F.sum(F.when(F.col("c_acctbal").isNull(), 1).otherwise(0)),
    )
    ev = events.withColumn("ts_us", epoch_us_col(events))
    ts_check = one(
        "events_ts_bounds",
        ev,
        F.sum(
            F.when(
                (F.col("ts_us") < _TS_LO_US) | (F.col("ts_us") >= _TS_HI_US),
                1,
            ).otherwise(0)
        ),
    )
    return o_checks.unionByName(fk).unionByName(disc).unionByName(
        cust
    ).unionByName(ts_check)


# Profile grid: doubles ride the 1e-6 integer grid before MIN/MAX (grid
# of min == min of grid — monotone), dates collapse to ISO strings —
# both engine-identical representations.
_PROFILE_COLS = [
    ("l_quantity", "num"),
    ("l_extendedprice", "num"),
    ("l_discount", "num"),
    ("l_returnflag", "str"),
    ("l_linestatus", "str"),
    ("l_shipdate", "date"),
]


def _oracle_profile_select(col: str, kind: str) -> str:
    if kind == "num":
        g = f"CAST(floor({col} * 1000000.0 + 0.5) AS BIGINT)"
        mn, mx = f"CAST(MIN({g}) AS VARCHAR)", f"CAST(MAX({g}) AS VARCHAR)"
    elif kind == "date":
        mn = f"CAST(MIN(CAST({col} AS DATE)) AS VARCHAR)"
        mx = f"CAST(MAX(CAST({col} AS DATE)) AS VARCHAR)"
    else:
        mn, mx = f"MIN({col})", f"MAX({col})"
    return f"""
        SELECT '{col}' AS col_name,
               CAST(SUM(CASE WHEN {col} IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_nulls,
               CAST(COUNT(DISTINCT {col}) AS BIGINT) AS n_distinct,
               {mn} AS min_val, {mx} AS max_val
        FROM lineitem"""


@register(
    "q_data_profile",
    oracle=" UNION ALL ".join(
        _oracle_profile_select(c, k) for c, k in _PROFILE_COLS
    ),
    family="audit",
    scale_notes=(
        "column profile (the corpus-generation drift detector) in TWO "
        "column-pruned scans, never a per-column rescan loop: the "
        "nulls/distinct/numeric-min-max cells compute as one aggregate "
        "over the full scan (Catalyst's multi-count-distinct Expand "
        "pass stays a HASH aggregate because every buffer is mutable "
        "BIGINT/date — r14: min(string) cells in the same aggregate "
        "demoted the whole 7x-expanded pass to Sort+SortAggregate, "
        "5x slower, and a Sort of 7n rows is the real 100 TB killer), "
        "while the two string min/max cells run as a sort-free global "
        "aggregate over a scan pruned to just those columns and attach "
        "as a 1-row broadcast. Partial aggs merge map-side; the "
        "shuffle carries one row per partition; stack() unpivots "
        "driver-free. At scale swap the "
        "exact COUNT DISTINCT cells for approx_count_distinct (each "
        "exact distinct adds an expand pass) — the profile is a "
        "monitoring artifact, not an accounting one; min/max/null "
        "counters are already one-pass mergeable"
    ),
)
def q_data_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column profile of lineitem — (col_name, n_nulls, n_distinct,
    min_val, max_val) — computed in one aggregate pass + stack unpivot."""
    li = table(spark, sf_dir, "lineitem")
    # r14 optimization: keep the STRING min/max aggregates OUT of the
    # multi-count-distinct aggregate. Catalyst rewrites the 6 distinct
    # counts into one Expand(x7) pass whose phase-1 aggregate groups on
    # the distinct values — and a min(string) buffer is immutable, so
    # its presence demotes that whole 42M-expanded-row pass to
    # Sort + SortAggregate. With only BIGINT/date/sum buffers the pass
    # is a HashAggregate (no Sort); the two string columns' min/max run
    # as a separate sort-free global aggregate over the same scan and
    # attach as a 1-row broadcast. Measured at sf0.1: 10.9 s -> 2.1 s,
    # output identical (plan: SortAggregate+Sort over Expand ->
    # HashAggregate over Expand; the 1-row BroadcastNestedLoopJoin is
    # the usual scalar attach).
    aggs = []
    str_aggs = []
    for col, kind in _PROFILE_COLS:
        safe = col.replace(".", "_")
        aggs.append(
            F.sum(F.when(F.col(col).isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias(f"{safe}__nulls")
        )
        aggs.append(
            F.countDistinct(col).cast("bigint").alias(f"{safe}__dist")
        )
        if kind == "num":
            g = F.floor(F.col(col) * 1000000.0 + 0.5).cast("bigint")
            mn, mx = F.min(g).cast("string"), F.max(g).cast("string")
        elif kind == "date":
            d = F.col(col).cast("date")
            mn, mx = F.min(d).cast("string"), F.max(d).cast("string")
        else:
            str_aggs.append(F.min(col).alias(f"{safe}__min"))
            str_aggs.append(F.max(col).alias(f"{safe}__max"))
            continue
        aggs.append(mn.alias(f"{safe}__min"))
        aggs.append(mx.alias(f"{safe}__max"))
    one_row = li.agg(*aggs).crossJoin(F.broadcast(li.agg(*str_aggs)))
    stack_args = ", ".join(
        f"'{c}', {c}__nulls, {c}__dist, {c}__min, {c}__max"
        for c, _ in _PROFILE_COLS
    )
    return one_row.selectExpr(
        f"stack({len(_PROFILE_COLS)}, {stack_args})"
        " AS (col_name, n_nulls, n_distinct, min_val, max_val)"
    )


# ------------------------------------------------------- Benford audit
# Expected first-digit share floor-quantized to ppm: computed from the
# same ln literals on both engines (constant per digit — ulp-identical).
_BENFORD_EXP = "CAST(floor(ln(1.0 + 1.0 / d) / ln(10.0) * 1000000.0) AS BIGINT)"


@register(
    "q_benford",
    oracle=f"""
        WITH digits AS (
            SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT)
                               AS VARCHAR(20)), 1, 1) AS BIGINT) AS d
            FROM orders
        ),
        obs AS (
            SELECT d, CAST(COUNT(*) AS BIGINT) AS cnt FROM digits GROUP BY d
        ),
        tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n FROM obs)
        SELECT d AS digit, cnt,
               CAST((cnt * 1000000) // n AS BIGINT) AS obs_ppm,
               {_BENFORD_EXP} AS exp_ppm
        FROM obs, tot
    """,
    family="audit",
    scale_notes=(
        "Benford first-digit conformance — the classic fraud/"
        "synthetic-data screen: digit extraction is a scan-side string "
        "head (no log10 near power-of-ten boundaries — the substr of "
        "the integer rendering is exact where floor(log10) can be off "
        "by an ulp), the census is a 9-cell aggregation, and the "
        "expected shares are per-digit ln constants quantized "
        "identically on both engines. One corpus scan, 9 output rows, "
        "at any scale; per-column batteries just stack more digit "
        "extractions into the same scan"
    ),
)
def q_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-significant-digit distribution of o_totalprice vs the
    Benford expectation: (digit, cnt, obs_ppm, exp_ppm)."""
    o = table(spark, sf_dir, "orders")
    digits = o.selectExpr(
        "CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT)"
        " AS VARCHAR(20)), 1, 1) AS BIGINT) AS d"
    )
    obs = digits.groupBy("d").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    tot = obs.agg(F.sum("cnt").cast("bigint").alias("n"))
    return obs.crossJoin(F.broadcast(tot)).selectExpr(
        "d AS digit",
        "cnt",
        "CAST((cnt * 1000000) div n AS BIGINT) AS obs_ppm",
        f"{_BENFORD_EXP} AS exp_ppm",
    )
