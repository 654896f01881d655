"""Clustered-corpus DTW retrieval probe (VERDICT r10 what's-missing #3).

Round-10 measured that on the AMBIENT events fixture no sound lower
bound prunes anything for q_trajectory_dtw (distances concentrate), so
the key ships under a SCORING contract. The documented recipe for a
real retrieval tier is a CLUSTERED corpus — this probe measures whether
sound LB pruning actually bites there, which VERDICT r10 item 4 sets as
the precondition for adding the tier.

The candidate machinery probed is the sound 4-component LB_Kim bound
for unconstrained DTW with |.|-cost over equal-length integer series
(every component provably <= DTW):

    LB(A,B) = max(|a_1-b_1|, |a_n-b_n|, |min A - min B|, |max A - max B|)

(first/last: the (1,1) and (n,n) cells sit on every warping path;
min/max: the extreme element of one series must align to SOME element
of the other, whose value is bounded by that series' own extreme.)
A pair survives iff LB <= tau; DTW <= tau implies LB <= tau, so recall
is 1.0 by construction. Distributed realization: bucket equi-join on
floor(a_1 / tau) with +-1 probes (|a_1-b_1| <= tau forces adjacent
buckets), post-filtering the remaining three components — the
q_join_range shape, never all-pairs.

Corpora:
- fixture: the real events table's PAA-8 integer series (the graded
  key's exact unit, via the same SQL the DuckDB oracle uses);
- ambient: uniform-random length-8 integer series (the concentration
  regime);
- clustered(K): K archetype series + per-segment noise at 1% of the
  value range — the corpus shape the retrieval recipe assumes.

Run: python /root/repo/scripts/scale_probe_dtw_cluster.py
"""
from __future__ import annotations

import sys

import numpy as np

SEGMENTS = 8


def dtw_matrix(X: np.ndarray, Y: np.ndarray) -> np.ndarray:
    """Exact unconstrained DTW (|.| cost) for every row-pair, vectorized
    over pairs: DP over the 8x8 grid with numpy broadcasting."""
    n, m = X.shape[0], Y.shape[0]
    INF = np.int64(4_000_000_000_000_000)
    # cost[i, j, a, b] built lazily per DP cell to bound memory
    prev = np.full((n, m, SEGMENTS + 1), INF, dtype=np.int64)
    prev[:, :, 0] = 0
    for i in range(1, SEGMENTS + 1):
        cur = np.full((n, m, SEGMENTS + 1), INF, dtype=np.int64)
        for j in range(1, SEGMENTS + 1):
            cost = np.abs(X[:, None, i - 1] - Y[None, :, j - 1])
            best = np.minimum(
                np.minimum(prev[:, :, j], prev[:, :, j - 1]), cur[:, :, j - 1]
            )
            cur[:, :, j] = cost + best
        prev = cur
    return prev[:, :, SEGMENTS]


def lb_kim(X: np.ndarray, Y: np.ndarray) -> np.ndarray:
    first = np.abs(X[:, None, 0] - Y[None, :, 0])
    last = np.abs(X[:, None, -1] - Y[None, :, -1])
    mn = np.abs(X.min(axis=1)[:, None] - Y.min(axis=1)[None, :])
    mx = np.abs(X.max(axis=1)[:, None] - Y.max(axis=1)[None, :])
    return np.maximum(np.maximum(first, last), np.maximum(mn, mx))


def census(name: str, S: np.ndarray, taus: list[int]) -> None:
    n = S.shape[0]
    d = dtw_matrix(S, S)
    lb = lb_kim(S, S)
    iu = np.triu_indices(n, 1)
    d, lb = d[iu], lb[iu]
    allp = len(d)
    assert (lb <= d).all(), "LB soundness violated"
    for tau in taus:
        true = int((d <= tau).sum())
        surv = int((lb <= tau).sum())
        print(
            f"{name} n={n} tau={tau}: true_pairs={true} "
            f"lb_survivors={surv} ({surv / allp:.3%} of all-pairs; "
            f"prune={1 - surv / allp:.3%})"
        )


def fixture_series(sf_dir: str) -> np.ndarray:
    """The graded key's exact PAA unit: integer grid means via the same
    SQL shape the q_trajectory_dtw oracle uses."""
    import duckdb

    con = duckdb.connect()
    rows = con.execute(
        f"""
        WITH ordered AS (
            SELECT user_id,
                   ROW_NUMBER() OVER (PARTITION BY user_id
                                      ORDER BY epoch_us(ts), event_id) - 1
                       AS i,
                   COUNT(*) OVER (PARTITION BY user_id) AS n,
                   CAST(floor(value * 1000000.0 + 0.5) AS BIGINT) AS vg
            FROM read_parquet('{sf_dir}/events.parquet')
        ),
        seg AS (
            SELECT user_id, (i * {SEGMENTS}) // n AS s,
                   CAST(SUM(vg) AS BIGINT) // CAST(COUNT(*) AS BIGINT) AS m
            FROM ordered GROUP BY user_id, (i * {SEGMENTS}) // n
        )
        SELECT user_id, list_transform(list_sort(list([s, m])), p -> p[2])
        FROM seg GROUP BY user_id ORDER BY user_id
        """
    ).fetchall()
    return np.array(
        [r[1] for r in rows if len(r[1]) == SEGMENTS], dtype=np.int64
    )


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    fx = fixture_series(sf)
    rng_range = int(fx.max() - fx.min())
    print(f"fixture users={fx.shape[0]} grid_range={rng_range}")
    census("fixture", fx, [rng_range // 20, rng_range // 8, rng_range // 4])

    rs = np.random.RandomState(42)
    n = 2000
    R = 100_000_000  # ~ value in [0, 100] on the 1e-6 grid
    ambient = rs.randint(0, R, size=(n, SEGMENTS)).astype(np.int64)
    census("ambient", ambient, [R // 20, R // 8])

    for k in (20, 100):
        arche = rs.randint(0, R, size=(k, SEGMENTS)).astype(np.int64)
        noise = rs.randint(-R // 100, R // 100, size=(n, SEGMENTS))
        S = arche[rs.randint(0, k, size=n)] + noise
        census(f"clustered_k{k}", S, [R // 20, R // 8])


if __name__ == "__main__":
    main()
