"""BPE driver-side training equivalence (r14 optimization).

q_bpe_tokenize's merge training moved from 8 relational
explode+groupBy+limit(1) rounds to one vocab collect + an exact
driver-side fold (tokenizer.train_bpe_merges). These tests pin the fold
against a MECHANISM-DISTINCT reference: symbol-LIST BPE (no string-repr
packing, no str.replace) with the same (count DESC, pair-string ASC)
total order — so the double-space repr encoding and its
leftmost-non-overlapping rewrite are verified, not assumed.
"""

from __future__ import annotations

from collections import Counter

import pytest

from flexcalc_spark.operators.tokenizer import N_MERGES, train_bpe_merges


def _repr_of(word: str) -> str:
    """The operator's double-space repr of a word (chars + </w>)."""
    syms = list(word) + ["</w>"]
    return " " + "  ".join(syms) + " "


def _ref_bpe_symbolic(
    words: list[tuple[int, list[str]]], n_merges: int
) -> list[tuple[str, str]]:
    """Reference BPE over symbol LISTS: count freq-weighted adjacent
    pairs, winner = max by (count DESC, 'a b' string ASC), merge
    leftmost-non-overlapping by index scan."""
    merges = []
    for _ in range(n_merges):
        counts: Counter = Counter()
        for freq, syms in words:
            for i in range(len(syms) - 1):
                counts[(syms[i], syms[i + 1])] += freq
        if not counts:
            break
        a, b = min(counts, key=lambda k: (-counts[k], k[0] + " " + k[1]))
        merges.append((" " + a + "  " + b + " ", " " + a + b + " "))
        out = []
        for freq, syms in words:
            merged, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    merged.append(a + b)
                    i += 2
                else:
                    merged.append(syms[i])
                    i += 1
            out.append((freq, merged))
        words = out
    return merges


CORPORA = [
    # classic BPE example: 'ab' merges, then chains
    {"abab": 10, "abc": 5, "bc": 3},
    # tie on count: lexicographic pair string decides
    {"xy": 2, "ab": 2},
    # fully-merging words (repr collapses to one symbol mid-training)
    {"aa": 50, "a": 7},
    # digits + longer words (fixture charset is [a-z0-9 ])
    {"w0rd": 4, "w0w": 6, "rd": 2, "word": 1},
]


@pytest.mark.parametrize("corpus", CORPORA)
def test_train_bpe_merges_matches_symbolic_reference(corpus):
    vocab = [(f, _repr_of(w)) for w, f in corpus.items()]
    sym = [(f, list(w) + ["</w>"]) for w, f in corpus.items()]
    assert train_bpe_merges(vocab, N_MERGES) == _ref_bpe_symbolic(
        sym, N_MERGES
    )


def test_train_bpe_merges_on_fixture_vocab(spark):
    """Same equivalence over the real sf vocabulary (the corpus the
    graded key trains on), via the operator's own vocab derivation."""
    from pyspark.sql import functions as F

    from flexcalc_spark.tables import table
    from tests.conftest import SF_DIR

    d = table(spark, SF_DIR, "documents")
    rows = (
        d.select(F.explode(F.split(F.lower("text"), " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("bigint").alias("freq"))
        .collect()
    )
    vocab = [(r["freq"], _repr_of(r["word"])) for r in rows]
    sym = [(r["freq"], list(r["word"]) + ["</w>"]) for r in rows]
    got = train_bpe_merges(vocab, N_MERGES)
    assert got == _ref_bpe_symbolic(sym, N_MERGES)
    assert len(got) == N_MERGES
