"""Recall/structure checks for the approximate (rows-only) operators
against their exact oracle-checked baselines.

Measured at sf0.01: minhash recall = 1.0, knn-lsh recall ≈ 0.46,
knn-ivf recall ≈ 0.42 (isotropic random embeddings have no cluster
structure, so bucket pruning is maximally adversarial here — real
embedding corpora cluster and recall rises accordingly). Bounds below
sit under the measured values to be seed-robust but catch regressions.
"""

from __future__ import annotations

from flexcalc_spark import registry
from tests.conftest import SF_DIR

Q = registry.QUERIES


def test_minhash_recall_vs_exact(spark):
    """LSH(64 perms, 8 bands of 8) must catch every jac>=0.95 pair."""
    exact = {(r.id_a, r.id_b) for r in Q["q_dedup_neardup"](spark, SF_DIR).collect()}
    mh = {(r.id_a, r.id_b) for r in Q["q_dedup_minhash"](spark, SF_DIR).collect()}
    assert exact, "exact near-dup set unexpectedly empty"
    recall = len(exact & mh) / len(exact)
    assert recall >= 0.98, f"minhash recall {recall:.3f} < 0.98"
    # every minhash pair is exact-verified at the same tau => jac >= tau holds
    jacs = [r.jac for r in Q["q_dedup_minhash"](spark, SF_DIR).collect()]
    assert min(jacs) >= 0.95


def test_knn_lsh_recall(spark):
    knn = {(r.probe_id, r.neighbor_id) for r in Q["q_knn_cosine"](spark, SF_DIR).collect()}
    lsh = {(r.probe_id, r.neighbor_id) for r in Q["q_knn_lsh"](spark, SF_DIR).collect()}
    assert knn
    recall = len(knn & lsh) / len(knn)
    assert recall >= 0.25, f"knn-lsh recall {recall:.3f} < 0.25"


def test_knn_ivf_recall(spark):
    knn = {(r.probe_id, r.neighbor_id) for r in Q["q_knn_cosine"](spark, SF_DIR).collect()}
    ivf = {(r.probe_id, r.neighbor_id) for r in Q["q_knn_ivf"](spark, SF_DIR).collect()}
    recall = len(knn & ivf) / len(knn)
    assert recall >= 0.25, f"knn-ivf recall {recall:.3f} < 0.25"


def test_knn_structure(spark):
    """Per-probe: exactly k neighbors, ranks 1..k, cos within [-1, 1]."""
    rows = Q["q_knn_cosine"](spark, SF_DIR).collect()
    by_probe: dict[int, list] = {}
    for r in rows:
        by_probe.setdefault(r.probe_id, []).append(r)
    for probe, rs in by_probe.items():
        assert sorted(x.rank for x in rs) == list(range(1, len(rs) + 1))
        for x in rs:
            assert -1.0001 <= x.cos <= 1.0001
            assert x.neighbor_id != probe


def test_simhash_structure(spark):
    rows = Q["q_dedup_simhash"](spark, SF_DIR).collect()
    assert rows, "simhash found no pairs on the word-salad fixture (expected many)"
    assert max(r.hamming for r in rows) <= 6
    assert all(r.id_a < r.id_b for r in rows)
    # deterministic across re-runs (fixed hash seeds)
    again = {(r.id_a, r.id_b) for r in Q["q_dedup_simhash"](spark, SF_DIR).collect()}
    assert {(r.id_a, r.id_b) for r in rows} == again


def test_connected_components_log_rounds(spark):
    """Large-star/small-star must converge in ~log n rounds on a long
    chain — the worst case for plain min-label propagation (O(n) rounds
    on a 200-node path)."""
    from flexcalc_spark.operators.dedup import connected_components

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(200)], "u long, v long"
    )
    labels, rounds = connected_components(chain)
    rows = labels.collect()
    assert len(rows) == 201
    assert all(r.label == 0 for r in rows)
    assert rounds <= 20, f"chain took {rounds} rounds (expected ~2 log n)"


def test_embed_lsh_full_recall_on_planted_pairs(spark):
    """q_dedup_embed_lsh's oracle is EXACT all-pairs, so the LSH
    candidate stage must recall every planted pair (cos ~0.999 — misses
    all 8 bands with p ~ 2.6e-8; deterministic under the fixed seed).
    Verified structurally: exactly one pair per planted id, each
    pairing an original with its perturbed copy at cos_q >= 9900."""
    from flexcalc_spark.operators.dedup import (
        EMBED_PLANT_N,
        EMBED_PLANT_OFFSET,
    )

    rows = Q["q_dedup_embed_lsh"](spark, SF_DIR).collect()
    pairs = {(r.id_a, r.id_b) for r in rows}
    expect = {
        (i, i + EMBED_PLANT_OFFSET) for i in range(EMBED_PLANT_N)
    }
    assert pairs == expect, (
        f"planted-pair recall broke: missing {expect - pairs}, "
        f"extra {pairs - expect}"
    )
    assert all(r.cos_q >= 9900 for r in rows)
