"""Experimentation / modeling aggregates: two-sample A/B z-test and
one-pass multi-feature OLS via normal equations.

Both queries collapse the full scan into a handful of EXACT integer
moments (per-column grids sized so every BIGINT sum is overflow-safe at
fixture scale — see each constant), then evaluate the statistical
formula in double math on the tiny aggregate row. Because the formula
inputs are exact integers and the formula TEXT is shared verbatim
between the Spark plan and the DuckDB oracle, the resulting doubles are
bit-identical across engines (the q_corr_matrix construction).

- **q_ab_test**: the experimentation-platform primitive. Users split
  into arms by user-id parity (a stand-in for the assignment hash);
  per event_type the Welch z statistic compares arm means. At 100 TB
  this is ONE scan collapsing to |event_type| x 6 integer cells —
  map-side partial merge does almost all the work; thousands of
  concurrent experiments are just more group keys.
- **q_regression_multi**: OLS of extendedprice on (quantity, discount)
  with intercept, solved by Cramer's rule on the 3x3 normal equations.
  X^T X accumulation is the one-pass distributed-GEMM shape feature
  stores use for linear probes/leakage checks: 9 integer moments, one
  shuffle of one row per partition, no iteration. Degenerate
  (singular) systems clamp to 0 identically on both engines.

Reference cite (mount empty, SURVEY §0): public flexcalc has no
statistics surface; the formulations are the standard Welch unpooled
z and textbook normal-equations OLS.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flexcalc_spark.registry import register
from flexcalc_spark.tables import table

# events.value <= ~330, 1e-6 grid => |vg| <= 3.3e8; vg sums safe to ~2^63/3.3e8
# rows. Squares use their OWN 1e-6 grid on value^2 (<= ~1.1e5) so the
# squared-sum stays ~1e11 * rows — overflow-safe past sf100.
_AB_FORMULAS = [
    "event_type",
    "CAST(n_a AS BIGINT) AS n_a",
    "CAST(n_b AS BIGINT) AS n_b",
    "ROUND(CAST(sa AS DOUBLE) / 1000000.0 / n_a, 4) + 0.0 AS mean_a",
    "ROUND(CAST(sb AS DOUBLE) / 1000000.0 / n_b, 4) + 0.0 AS mean_b",
    # Welch z on population variances from exact integer moments; the
    # variance clamp keeps degenerate (constant) arms engine-identical
    # (Spark div-by-0 -> NULL vs DuckDB IEEE inf — the ADVICE r4 lesson).
    """CASE WHEN n_a < 2 OR n_b < 2 OR
              (CAST(qa AS DOUBLE) / 1000000.0 / n_a
                 - (CAST(sa AS DOUBLE) / 1000000.0 / n_a)
                   * (CAST(sa AS DOUBLE) / 1000000.0 / n_a)) / n_a
            + (CAST(qb AS DOUBLE) / 1000000.0 / n_b
                 - (CAST(sb AS DOUBLE) / 1000000.0 / n_b)
                   * (CAST(sb AS DOUBLE) / 1000000.0 / n_b)) / n_b <= 0.0
       THEN 0.0
       ELSE (CAST(sa AS DOUBLE) / 1000000.0 / n_a
               - CAST(sb AS DOUBLE) / 1000000.0 / n_b)
            / sqrt((CAST(qa AS DOUBLE) / 1000000.0 / n_a
                      - (CAST(sa AS DOUBLE) / 1000000.0 / n_a)
                        * (CAST(sa AS DOUBLE) / 1000000.0 / n_a)) / n_a
                   + (CAST(qb AS DOUBLE) / 1000000.0 / n_b
                        - (CAST(sb AS DOUBLE) / 1000000.0 / n_b)
                          * (CAST(sb AS DOUBLE) / 1000000.0 / n_b)) / n_b)
       END AS z_welch""",
]


@register(
    "q_ab_test",
    oracle=f"""
        WITH m AS (
            SELECT event_type,
                   SUM(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS n_a,
                   SUM(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END) AS n_b,
                   SUM(CASE WHEN user_id % 2 = 0
                       THEN CAST(floor(value * 1000000.0 + 0.5) AS BIGINT)
                       ELSE 0 END) AS sa,
                   SUM(CASE WHEN user_id % 2 = 1
                       THEN CAST(floor(value * 1000000.0 + 0.5) AS BIGINT)
                       ELSE 0 END) AS sb,
                   SUM(CASE WHEN user_id % 2 = 0
                       THEN CAST(floor(value * value * 1000000.0 + 0.5) AS BIGINT)
                       ELSE 0 END) AS qa,
                   SUM(CASE WHEN user_id % 2 = 1
                       THEN CAST(floor(value * value * 1000000.0 + 0.5) AS BIGINT)
                       ELSE 0 END) AS qb
            FROM events GROUP BY event_type
        )
        SELECT {', '.join(_AB_FORMULAS)} FROM m
    """,
    family="experiment",
    scale_notes=(
        "two-sample Welch z per experiment metric in ONE scan: six exact "
        "integer moments per (event_type) accumulate map-side and "
        "shuffle as one narrow row per partition; the z formula runs on "
        "the tiny aggregate in double math that is bit-identical across "
        "engines because its inputs are exact BIGINTs and the formula "
        "text is shared verbatim with the oracle. Degenerate variance "
        "clamps to z=0 identically. A platform running 10k concurrent "
        "experiments adds group-key cardinality, not scan cost"
    ),
)
def q_ab_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch z-test of events.value between user-parity arms, per
    event_type: arm sizes, arm means, z statistic."""
    e = table(spark, sf_dir, "events")
    is_a = F.col("user_id") % 2 == 0
    vg = F.floor(F.col("value") * 1_000_000.0 + 0.5).cast("bigint")
    qg = F.floor(F.col("value") * F.col("value") * 1_000_000.0 + 0.5).cast(
        "bigint"
    )
    m = e.groupBy("event_type").agg(
        F.sum(F.when(is_a, 1).otherwise(0)).alias("n_a"),
        F.sum(F.when(~is_a, 1).otherwise(0)).alias("n_b"),
        F.sum(F.when(is_a, vg).otherwise(0)).alias("sa"),
        F.sum(F.when(~is_a, vg).otherwise(0)).alias("sb"),
        F.sum(F.when(is_a, qg).otherwise(0)).alias("qa"),
        F.sum(F.when(~is_a, qg).otherwise(0)).alias("qb"),
    )
    return m.selectExpr(*_AB_FORMULAS)


# Per-column grids: quantity and discount carry exactly 2 decimals in the
# fixture (verified: frac(x*100) == 0 up to FP residue), extendedprice is
# cents — so *100 + 0.5-floor is EXACT for all three. Cross-moment bound:
# qg <= 5e3, pg <= 1e7 -> qg*pg <= 5e10; 6e5 rows (sf0.1) -> 3e16 < 2^63.
_REG_REALS = (
    "CAST(n AS DOUBLE) AS rn",
    "CAST(s1 AS DOUBLE) / 100.0 AS a1",
    "CAST(s2 AS DOUBLE) / 100.0 AS a2",
    "CAST(sy AS DOUBLE) / 100.0 AS ay",
    "CAST(s11 AS DOUBLE) / 10000.0 AS a11",
    "CAST(s12 AS DOUBLE) / 10000.0 AS a12",
    "CAST(s22 AS DOUBLE) / 10000.0 AS a22",
    "CAST(s1y AS DOUBLE) / 10000.0 AS a1y",
    "CAST(s2y AS DOUBLE) / 10000.0 AS a2y",
)
_REG_DET = (
    "(rn * (a11 * a22 - a12 * a12) - a1 * (a1 * a22 - a12 * a2)"
    " + a2 * (a1 * a12 - a11 * a2))"
)
_REG_BETAS = [
    "CAST(n AS BIGINT) AS n",
    f"""CASE WHEN {_REG_DET} = 0.0 THEN 0.0 ELSE
        (ay * (a11 * a22 - a12 * a12) - a1 * (a1y * a22 - a12 * a2y)
         + a2 * (a1y * a12 - a11 * a2y)) / {_REG_DET} END AS beta0""",
    f"""CASE WHEN {_REG_DET} = 0.0 THEN 0.0 ELSE
        (rn * (a1y * a22 - a12 * a2y) - ay * (a1 * a22 - a12 * a2)
         + a2 * (a1 * a2y - a1y * a2)) / {_REG_DET} END AS beta1""",
    f"""CASE WHEN {_REG_DET} = 0.0 THEN 0.0 ELSE
        (rn * (a11 * a2y - a1y * a12) - a1 * (a1 * a2y - a1y * a2)
         + ay * (a1 * a12 - a11 * a2)) / {_REG_DET} END AS beta2""",
]


@register(
    "q_regression_multi",
    oracle=f"""
        WITH m AS (
            SELECT COUNT(*) AS n,
                   SUM(CAST(floor(l_quantity * 100.0 + 0.5) AS BIGINT)) AS s1,
                   SUM(CAST(floor(l_discount * 100.0 + 0.5) AS BIGINT)) AS s2,
                   SUM(CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT)) AS sy,
                   SUM(CAST(floor(l_quantity * 100.0 + 0.5) AS BIGINT)
                       * CAST(floor(l_quantity * 100.0 + 0.5) AS BIGINT)) AS s11,
                   SUM(CAST(floor(l_quantity * 100.0 + 0.5) AS BIGINT)
                       * CAST(floor(l_discount * 100.0 + 0.5) AS BIGINT)) AS s12,
                   SUM(CAST(floor(l_discount * 100.0 + 0.5) AS BIGINT)
                       * CAST(floor(l_discount * 100.0 + 0.5) AS BIGINT)) AS s22,
                   SUM(CAST(floor(l_quantity * 100.0 + 0.5) AS BIGINT)
                       * CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT)) AS s1y,
                   SUM(CAST(floor(l_discount * 100.0 + 0.5) AS BIGINT)
                       * CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT)) AS s2y
            FROM lineitem
        ),
        r AS (SELECT *, {', '.join(_REG_REALS)} FROM m)
        SELECT {', '.join(_REG_BETAS)} FROM r
    """,
    family="experiment",
    scale_notes=(
        "one-pass OLS via normal equations: X^T X and X^T y accumulate "
        "as 9 exact BIGINT cross-moments on per-column integer grids "
        "(the distributed-GEMM shape — map-side partials, one narrow "
        "row per partition shuffled), then Cramer's rule solves the 3x3 "
        "system on the driver-free one-row aggregate. No iteration, no "
        "collect; d features cost d^2 counters, still one scan. Grid "
        "products bounded ~3e16 at sf0.1; past ~sf30 swap the moment "
        "accumulators to DECIMAL(38,0) (the corr_matrix rule)"
    ),
)
def q_regression_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OLS extendedprice ~ quantity + discount (+ intercept) from
    one-scan exact integer moments, solved by Cramer's rule."""
    li = table(spark, sf_dir, "lineitem")
    qg = F.floor(F.col("l_quantity") * 100.0 + 0.5).cast("bigint")
    dg = F.floor(F.col("l_discount") * 100.0 + 0.5).cast("bigint")
    pg = F.floor(F.col("l_extendedprice") * 100.0 + 0.5).cast("bigint")
    m = li.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(qg).alias("s1"),
        F.sum(dg).alias("s2"),
        F.sum(pg).alias("sy"),
        F.sum(qg * qg).alias("s11"),
        F.sum(qg * dg).alias("s12"),
        F.sum(dg * dg).alias("s22"),
        F.sum(qg * pg).alias("s1y"),
        F.sum(dg * pg).alias("s2y"),
    )
    return m.selectExpr("*", *_REG_REALS).selectExpr(*_REG_BETAS)


# CUPED per-user metric grid: value carries 2 decimals (cents grid is
# exact); per-user sums <= ~5.4e5 cents at sf0.1, so ux*uy <= ~2.9e11
# per user and sxy <= ~4.4e14 over 1500 users — >=2e4x headroom under
# 2^63 (canary: tests/test_fixture_assumptions.py::
# test_cuped_cross_moment_headroom). theta and the adjusted means are
# evaluated in double math over these exact integers with formula text
# shared verbatim with the oracle (bit-identical, the q_ab_test rule).
_CUPED_THETA = """CASE WHEN CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
         - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) <= 0.0 THEN 0.0
    ELSE (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
          - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
         / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
            - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) END"""
_CUPED_FORMULAS = [
    "CAST(arm AS BIGINT) AS arm",
    "CAST(na AS BIGINT) AS n_users",
    "CAST(sya AS DOUBLE) / 100.0 / na + 0.0 AS mean_y",
    f"""CAST(sya AS DOUBLE) / 100.0 / na
        - {_CUPED_THETA} * (CAST(sxa AS DOUBLE) / 100.0 / na
                            - CAST(sx AS DOUBLE) / 100.0 / n)
        + 0.0 AS mean_y_cuped""",
    f"{_CUPED_THETA} + 0.0 AS theta",
]


@register(
    "q_cuped",
    oracle=f"""
        WITH c AS (
            SELECT (MIN(epoch_us(ts)) + MAX(epoch_us(ts))) // 2 AS cut
            FROM events
        ),
        u AS MATERIALIZED (
            SELECT user_id % 2 AS arm,
                   SUM(CASE WHEN epoch_us(ts) < c.cut
                       THEN CAST(floor(value * 100.0 + 0.5) AS BIGINT)
                       ELSE 0 END) AS ux,
                   SUM(CASE WHEN epoch_us(ts) >= c.cut
                       THEN CAST(floor(value * 100.0 + 0.5) AS BIGINT)
                       ELSE 0 END) AS uy
            FROM events CROSS JOIN c
            GROUP BY user_id
        ),
        g AS (
            SELECT COUNT(*) AS n,
                   CAST(SUM(ux) AS BIGINT) AS sx,
                   CAST(SUM(uy) AS BIGINT) AS sy,
                   CAST(SUM(ux * ux) AS BIGINT) AS sxx,
                   CAST(SUM(ux * uy) AS BIGINT) AS sxy
            FROM u
        ),
        a AS (
            SELECT arm, COUNT(*) AS na,
                   CAST(SUM(ux) AS BIGINT) AS sxa,
                   CAST(SUM(uy) AS BIGINT) AS sya
            FROM u GROUP BY arm
        )
        SELECT {', '.join(_CUPED_FORMULAS)} FROM a CROSS JOIN g
    """,
    family="experiment",
    scale_notes=(
        "CUPED variance reduction (Deng et al. 2013): per-user "
        "pre-period metric x (events before the corpus-midpoint cut) "
        "adjusts the in-period metric y via theta = cov(x,y)/var(x); "
        "per-arm adjusted means shrink the A/B confidence interval "
        "using only pre-experiment data. One full events scan (plus a "
        "ts-only column-pruned scan for the midpoint cutoff — in "
        "production the experiment start date is a literal, not a "
        "derived scalar) -> per-user "
        "exact cents-grid sums (map-side combine), then 5 global + 3 "
        "per-arm BIGINT moments; theta and the adjusted means are "
        "double formulas over exact integers with text shared verbatim "
        "with the oracle (bit-identical — the q_ab_test construction). "
        "The 2x1-row arm x global crossJoin is the one sanctioned "
        "BroadcastNestedLoopJoin. Degenerate var(x)<=0 clamps theta=0 "
        "identically. At 100 TB: scan cost only — moments are a "
        "per-user groupBy that any assignment-hash arm count shares; "
        "cross-moment headroom ~2e4x at sf0.1 (canary-guarded), drop "
        "to a 1e1 grid or DECIMAL(38) accumulators past ~sf50"
    ),
)
def q_cuped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED-adjusted arm means of per-user event value: pre-period
    covariate theta-adjustment, user-parity arms, exact integer
    moments, shared-text double formulas."""
    from flexcalc_spark.tables import events_with_time

    e = events_with_time(spark, sf_dir)
    cut = e.agg(F.expr("(MIN(ts_us) + MAX(ts_us)) div 2").alias("cut"))
    cents = F.floor(F.col("value") * 100.0 + 0.5).cast("bigint")
    u = (
        e.crossJoin(F.broadcast(cut))
        .groupBy("user_id")
        .agg(
            F.sum(F.when(F.col("ts_us") < F.col("cut"), cents).otherwise(0)).alias("ux"),
            F.sum(F.when(F.col("ts_us") >= F.col("cut"), cents).otherwise(0)).alias("uy"),
        )
        .select((F.col("user_id") % 2).alias("arm"), "ux", "uy")
    )
    g = u.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("ux").alias("sx"),
        F.sum("uy").alias("sy"),
        F.sum(F.col("ux") * F.col("ux")).alias("sxx"),
        F.sum(F.col("ux") * F.col("uy")).alias("sxy"),
    )
    a = u.groupBy("arm").agg(
        F.count(F.lit(1)).alias("na"),
        F.sum("ux").alias("sxa"),
        F.sum("uy").alias("sya"),
    )
    return a.crossJoin(F.broadcast(g)).selectExpr(*_CUPED_FORMULAS)


# SRM chi-square over the 50/50 design expectation. Exact integer
# counts; the statistic is a double formula over them with text shared
# verbatim with the oracle (bit-identical). 3.841 = chi2(1df, p=0.05).
_SRM_FORMULAS = [
    "event_type",
    "CAST(n_a AS BIGINT) AS n_a",
    "CAST(n_b AS BIGINT) AS n_b",
    """(CAST(n_a AS DOUBLE) - (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE)) / 2.0)
       * (CAST(n_a AS DOUBLE) - (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE)) / 2.0)
       / ((CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE)) / 2.0)
     + (CAST(n_b AS DOUBLE) - (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE)) / 2.0)
       * (CAST(n_b AS DOUBLE) - (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE)) / 2.0)
       / ((CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE)) / 2.0)
     + 0.0 AS chi2""",
    """CAST(CASE WHEN
       (CAST(n_a AS DOUBLE) - (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE)) / 2.0)
       * (CAST(n_a AS DOUBLE) - (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE)) / 2.0)
       / ((CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE)) / 2.0)
     + (CAST(n_b AS DOUBLE) - (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE)) / 2.0)
       * (CAST(n_b AS DOUBLE) - (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE)) / 2.0)
       / ((CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE)) / 2.0)
       > 3.841 THEN 1 ELSE 0 END AS BIGINT) AS srm_flag""",
]


@register(
    "q_srm_check",
    oracle=f"""
        WITH m AS (
            SELECT event_type,
                   SUM(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS n_a,
                   SUM(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END) AS n_b
            FROM events GROUP BY event_type
        )
        SELECT {', '.join(_SRM_FORMULAS)} FROM m
    """,
    family="experiment",
    scale_notes=(
        "sample-ratio-mismatch gate (the assignment-integrity check "
        "every experiment readout runs first): chi-square of observed "
        "arm event counts against the 50/50 design per event_type. Two "
        "exact integer counters per group accumulate map-side; the "
        "statistic and the 3.841-threshold flag (chi2 1df, p=0.05) are "
        "double formulas over exact BIGINTs with text shared verbatim "
        "with the oracle — bit-identical across engines, srm_flag is "
        "BIGINT 0/1. At 100 TB: one scan, |event_type| rows, the "
        "cheapest possible shuffle; per-assignment-hash slicing is "
        "just more group keys"
    ),
)
def q_srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square sample-ratio-mismatch check of user-parity arm
    counts against the 50/50 design, per event_type."""
    e = table(spark, sf_dir, "events")
    is_a = F.col("user_id") % 2 == 0
    m = e.groupBy("event_type").agg(
        F.sum(F.when(is_a, 1).otherwise(0)).alias("n_a"),
        F.sum(F.when(~is_a, 1).otherwise(0)).alias("n_b"),
    )
    return m.selectExpr(*_SRM_FORMULAS)


@register(
    "q_qte",
    oracle="""
        WITH u AS (
            SELECT event_type, user_id, user_id % 2 AS arm,
                   SUM(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS xc
            FROM events GROUP BY 1, 2, 3
        )
        SELECT event_type,
               CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
               CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
               ROUND(quantile_cont(CASE WHEN arm = 1 THEN xc END, 0.25)
                     - quantile_cont(CASE WHEN arm = 0 THEN xc END, 0.25), 4)
                     + 0.0 AS qte25,
               ROUND(quantile_cont(CASE WHEN arm = 1 THEN xc END, 0.5)
                     - quantile_cont(CASE WHEN arm = 0 THEN xc END, 0.5), 4)
                     + 0.0 AS qte50,
               ROUND(quantile_cont(CASE WHEN arm = 1 THEN xc END, 0.75)
                     - quantile_cont(CASE WHEN arm = 0 THEN xc END, 0.75), 4)
                     + 0.0 AS qte75
        FROM u GROUP BY event_type
    """,
    family="experiment",
    scale_notes=(
        "quantile treatment effects (distributional A/B readout — mean "
        "deltas hide tail movement; QTE compares arm quantiles at "
        "p25/p50/p75 of the per-user metric). Two-level aggregation: "
        "events collapse map-side to (event_type, user) exact cents "
        "sums, then per-group conditional percentiles over the user "
        "table. Exact interpolated percentile on BIGINT inputs is "
        "engine-identical (Spark percentile == DuckDB quantile_cont, "
        "the q_agg_percentile rule); deltas round at emit with the "
        "-0.0 guard. At 100 TB the user-level table is the only "
        "shuffle; swap the exact percentile for approx_percentile's "
        "mergeable sketch (the q_agg_approx_percentile twin) when the "
        "per-group user count outgrows a sort"
    ),
)
def q_qte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type quantile treatment effects (p25/p50/p75 arm
    deltas) of per-user total value, user-parity arms."""
    e = table(spark, sf_dir, "events")
    cents = F.floor(F.col("value") * 100.0 + 0.5).cast("bigint")
    u = e.groupBy(
        "event_type", "user_id", (F.col("user_id") % 2).alias("arm")
    ).agg(F.sum(cents).alias("xc"))
    # ONE percentile(…, array(p)) buffer per arm instead of six scalar
    # aggregates: Spark's exact Percentile holds a full value buffer per
    # aggregate instance, so the scalar form buffered and sorted each
    # arm's values three times. The arrays stay intermediates (never
    # output cells — driver canonicalizer rule); per-p values are
    # identical to the scalar calls.
    xa = "CASE WHEN arm = 0 THEN xc END"
    xb = "CASE WHEN arm = 1 THEN xc END"
    agg = u.groupBy("event_type").agg(
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0)).cast("bigint").alias("n_a"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0)).cast("bigint").alias("n_b"),
        F.expr(f"percentile({xa}, array(0.25, 0.5, 0.75))").alias("pa"),
        F.expr(f"percentile({xb}, array(0.25, 0.5, 0.75))").alias("pb"),
    )
    return agg.select(
        "event_type",
        "n_a",
        "n_b",
        (F.round(F.expr("pb[0] - pa[0]"), 4) + 0.0).alias("qte25"),
        (F.round(F.expr("pb[1] - pa[1]"), 4) + 0.0).alias("qte50"),
        (F.round(F.expr("pb[2] - pa[2]"), 4) + 0.0).alias("qte75"),
    )


# DiD cell means are double divisions of exact integer (sum, count)
# cells; the estimate subtracts four such means — formula text shared
# verbatim with the oracle (bit-identical). Empty cells cannot occur
# (the parity arms and the midpoint split each cover every event_type
# at fixture scale; a production run would gate on cell counts).
_DID_FORMULAS = [
    "event_type",
    "CAST(n_a0 AS BIGINT) AS n_pre_a",
    "CAST(n_a1 AS BIGINT) AS n_post_a",
    "CAST(n_b0 AS BIGINT) AS n_pre_b",
    "CAST(n_b1 AS BIGINT) AS n_post_b",
    """(CAST(s_b1 AS DOUBLE) / 100.0 / n_b1
        - CAST(s_b0 AS DOUBLE) / 100.0 / n_b0)
       - (CAST(s_a1 AS DOUBLE) / 100.0 / n_a1
          - CAST(s_a0 AS DOUBLE) / 100.0 / n_a0)
       + 0.0 AS did""",
]


@register(
    "q_diff_in_diff",
    oracle=f"""
        WITH c AS (
            SELECT (MIN(epoch_us(ts)) + MAX(epoch_us(ts))) // 2 AS cut
            FROM events
        ),
        m AS (
            SELECT event_type,
                   SUM(CASE WHEN user_id % 2 = 0 AND epoch_us(ts) < c.cut
                       THEN 1 ELSE 0 END) AS n_a0,
                   SUM(CASE WHEN user_id % 2 = 0 AND epoch_us(ts) >= c.cut
                       THEN 1 ELSE 0 END) AS n_a1,
                   SUM(CASE WHEN user_id % 2 = 1 AND epoch_us(ts) < c.cut
                       THEN 1 ELSE 0 END) AS n_b0,
                   SUM(CASE WHEN user_id % 2 = 1 AND epoch_us(ts) >= c.cut
                       THEN 1 ELSE 0 END) AS n_b1,
                   SUM(CASE WHEN user_id % 2 = 0 AND epoch_us(ts) < c.cut
                       THEN CAST(floor(value * 100.0 + 0.5) AS BIGINT)
                       ELSE 0 END) AS s_a0,
                   SUM(CASE WHEN user_id % 2 = 0 AND epoch_us(ts) >= c.cut
                       THEN CAST(floor(value * 100.0 + 0.5) AS BIGINT)
                       ELSE 0 END) AS s_a1,
                   SUM(CASE WHEN user_id % 2 = 1 AND epoch_us(ts) < c.cut
                       THEN CAST(floor(value * 100.0 + 0.5) AS BIGINT)
                       ELSE 0 END) AS s_b0,
                   SUM(CASE WHEN user_id % 2 = 1 AND epoch_us(ts) >= c.cut
                       THEN CAST(floor(value * 100.0 + 0.5) AS BIGINT)
                       ELSE 0 END) AS s_b1
            FROM events CROSS JOIN c
            GROUP BY event_type
        )
        SELECT {', '.join(_DID_FORMULAS)} FROM m
    """,
    family="experiment",
    scale_notes=(
        "difference-in-differences per event_type: the 2x2 (arm x "
        "pre/post-midpoint) cell means from eight exact integer "
        "moments, DiD = (B_post - B_pre) - (A_post - A_pre) as a "
        "shared-text double formula — the parallel-trends causal "
        "readout beside q_cuped's covariate adjustment. One full scan "
        "+ a ts-only pruned scan for the midpoint cutoff (a literal "
        "experiment date in production — the q_cuped caveat), map-side "
        "combine into |event_type| narrow rows. At 100 TB: scan cost "
        "only; any (cohort, region) slicing is more group keys"
    ),
)
def q_diff_in_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DiD estimate of events.value between user-parity arms across
    the corpus-midpoint time split, per event_type."""
    from flexcalc_spark.tables import events_with_time

    e = events_with_time(spark, sf_dir)
    cut = e.agg(F.expr("(MIN(ts_us) + MAX(ts_us)) div 2").alias("cut"))
    cents = F.floor(F.col("value") * 100.0 + 0.5).cast("bigint")
    is_a = F.col("user_id") % 2 == 0
    pre = F.col("ts_us") < F.col("cut")
    m = (
        e.crossJoin(F.broadcast(cut))
        .groupBy("event_type")
        .agg(
            F.sum(F.when(is_a & pre, 1).otherwise(0)).alias("n_a0"),
            F.sum(F.when(is_a & ~pre, 1).otherwise(0)).alias("n_a1"),
            F.sum(F.when(~is_a & pre, 1).otherwise(0)).alias("n_b0"),
            F.sum(F.when(~is_a & ~pre, 1).otherwise(0)).alias("n_b1"),
            F.sum(F.when(is_a & pre, cents).otherwise(0)).alias("s_a0"),
            F.sum(F.when(is_a & ~pre, cents).otherwise(0)).alias("s_a1"),
            F.sum(F.when(~is_a & pre, cents).otherwise(0)).alias("s_b0"),
            F.sum(F.when(~is_a & ~pre, cents).otherwise(0)).alias("s_b1"),
        )
    )
    return m.selectExpr(*_DID_FORMULAS)
