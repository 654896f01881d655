"""q_trajectory_dtw: exact integer-grid DTW + discrete-Fréchet scoring.

Three independent checks beyond the driver's hash oracle:
1. known-answer tests of the DP expression itself on literal arrays
   (hand-computed warping paths / couplings, including unequal lengths);
2. every emitted distance equals an INDEPENDENTLY written Python
   reference DP over independently reconstructed PAA series;
3. the scoring contract: the output pair set is exactly the SAX
   gram-candidate relation (each candidate scored once — regen-safe,
   unlike pinning fixture-dependent coupling fractions).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from flexcalc_spark import registry
from flexcalc_spark.operators.trajectory import (
    DTW_INF,
    SEGMENTS,
    elastic_dp_sql,
)
from tests.conftest import SF_DIR


def _ref_dp(a: list[int], b: list[int], measure: str) -> int:
    """Textbook O(nm) elastic DP with |.| cost — written independently
    of the HOF expression (full matrix, float inf boundary). DTW sums
    the path; discrete Fréchet takes the max over the best coupling."""
    n, m = len(a), len(b)
    D = [[float("inf")] * (m + 1) for _ in range(n + 1)]
    D[0][0] = 0.0
    for i in range(1, n + 1):
        for j in range(1, m + 1):
            cost = abs(a[i - 1] - b[j - 1])
            best = min(D[i - 1][j], D[i][j - 1], D[i - 1][j - 1])
            D[i][j] = cost + best if measure == "dtw" else max(cost, best)
    return int(D[n][m])


def _ref_series() -> dict[int, list[int]]:
    """PAA grid-mean profiles reconstructed straight from the parquet
    with pandas/numpy — independent of both engines' SQL."""
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet").sort_values(
        ["user_id", "ts", "event_id"]
    )
    out: dict[int, list[int]] = {}
    for uid, g in ev.groupby("user_id"):
        vg = np.floor(g["value"].to_numpy() * 1e6 + 0.5).astype(np.int64)
        n = len(vg)
        s = (np.arange(n) * SEGMENTS) // n
        mg = []
        for seg in np.unique(s):
            sel = vg[s == seg]
            sg = int(sel.sum())
            c = int(len(sel))
            q = abs(sg) // c  # truncating div, sign-safe
            mg.append(q if sg >= 0 else -q)
        out[int(uid)] = mg
    return out


@pytest.mark.parametrize(
    "a,b,dtw,frechet",
    [
        ([5], [5], 0, 0),
        ([1, 3], [2], 2, 1),  # both cells align to the single element
        ([3], [1, 1], 4, 2),
        ([0, 10, 0], [0, 0, 10, 10, 0], 0, 0),  # pure warping, zero cost
        ([1, 2, 3], [1, 2, 3], 0, 0),
        ([0, 0, 0], [7, 7], 21, 7),  # 3 diagonal/down path cells x 7
        ([-5, 5], [0], 10, 5),  # negative values
    ],
)
def test_elastic_expression_known_answers(spark, a, b, dtw, frechet):
    """Drive the exact SQL expressions the key uses over literal arrays
    and compare to hand-computed values AND the reference DP."""
    la = ", ".join(f"CAST({v} AS BIGINT)" for v in a)
    lb = ", ".join(f"CAST({v} AS BIGINT)" for v in b)
    row = spark.sql(
        f"SELECT {elastic_dp_sql('dtw')} AS d,"
        f" {elastic_dp_sql('frechet')} AS f"
        f" FROM (SELECT array({la}) AS ma, array({lb}) AS mb)"
    ).collect()[0]
    assert row.d == dtw == _ref_dp(a, b, "dtw")
    assert row.f == frechet == _ref_dp(a, b, "frechet")


def test_elastic_matches_independent_reference(spark):
    rows = registry.QUERIES["q_trajectory_dtw"](spark, SF_DIR).collect()
    assert len(rows) > 0
    ser = _ref_series()
    for r in rows:
        a, b = ser[r.user_a], ser[r.user_b]
        assert r.dtw_grid == _ref_dp(a, b, "dtw"), (r.user_a, r.user_b)
        assert r.frechet_grid == _ref_dp(a, b, "frechet"), (r.user_a, r.user_b)
        assert r.frechet_grid <= r.dtw_grid  # max over path <= sum over path
        assert r.dtw_grid < DTW_INF  # the DP boundary never leaks out


def test_elastic_scores_exactly_the_candidate_relation(spark):
    """Scoring contract: one output row per SAX gram-candidate pair —
    no more (no uncandidated pair sneaks in), no fewer (every candidate
    is scored), each exactly once."""
    out = registry.QUERIES["q_trajectory_dtw"](spark, SF_DIR).collect()
    pairs = [(r.user_a, r.user_b) for r in out]
    assert len(pairs) == len(set(pairs))
    sim_cand = {
        (r.user_a, r.user_b)
        for r in registry.QUERIES["q_trajectory_sim"](spark, SF_DIR)
        .collect()
    }
    # q_trajectory_sim post-filters Hamming <= 2, so its pairs are a
    # subset of the candidate relation this key scores
    assert sim_cand <= set(pairs)
    for ua, ub in pairs:
        assert ua < ub


def test_elastic_reference_properties():
    """Property sweep of the reference DP on adversarial small arrays:
    symmetry, identity, Fréchet <= DTW, and path-length cost bounds
    (DTW violates the triangle inequality in general, so no triangle
    assertion)."""
    rng = np.random.default_rng(7)
    for _ in range(50):
        la, lb = rng.integers(1, 9), rng.integers(1, 9)
        a = [int(v) for v in rng.integers(-(10**10), 10**10, la)]
        b = [int(v) for v in rng.integers(-(10**10), 10**10, lb)]
        for measure in ("dtw", "frechet"):
            assert _ref_dp(a, b, measure) == _ref_dp(b, a, measure)
            assert _ref_dp(a, a, measure) == 0
        dtw, fre = _ref_dp(a, b, "dtw"), _ref_dp(a, b, "frechet")
        assert fre <= dtw
        # max path cells = la + lb - 1; each cost <= 2 * 10^10
        assert dtw <= (la + lb - 1) * 2 * 10**10
        assert fre <= 2 * 10**10
