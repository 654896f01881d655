"""Exact duplicated-substring census — the Lee et al. 2022 dedup tier.

"Deduplicating Training Data Makes Language Models Better" (Lee et al.
2022) removes EXACT repeated spans (50-token substrings occurring more
than once in the corpus), complementing document-level near-dup: long
verbatim boilerplate (licenses, headers, templated text) recurs inside
otherwise-distinct documents and inflates memorization. The reference
implementation builds a corpus-wide suffix array; relationally, the
same census falls out of fixed-width shingling — every W-word window
is a key, a window is duplicated iff its key occurs >= 2 times
globally, and a per-document aggregation reports how much of each doc
is covered by duplicated spans.

Plan shape (the 100 TB story):

- ONE tokenize scan explodes positional W-gram shingles (array HOFs in
  codegen — no Python, no window shuffle: adjacency comes from the
  token array).
- The shingle census is a single hash aggregation keyed by the shingle
  string; only keys with count >= 2 survive into the duplicate table,
  which is orders of magnitude smaller than the shingle stream (most
  shingles are unique) — it is the ONLY state carried across docs.
- The per-occurrence flag is a LEFT join of the shingle stream against
  that filtered duplicate table on the shingle key: at 100 TB both
  sides partition by shingle hash, and the dup table is often small
  enough to broadcast outright.
- A W-word window is the hashed stand-in for the suffix-array span
  seed: suffix arrays find maximal repeats, shingles find all repeats
  of length >= W — the census (which docs, how much) is the same
  signal the pipeline gates on.

Reference cite: mount empty (SURVEY §0); public flexcalc has no text
surface. Algorithm: Lee et al. 2022 (arXiv:2107.06499), shingle
rendering per the standard winnowing/fingerprinting literature.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flexcalc_spark.registry import register
from flexcalc_spark.tables import table_parallel

SPAN_W = 5  # words per window (fixture docs are 10-100 words; the
# published 50-token width maps to the same plan at corpus scale)


@register(
    "q_dedup_substring",
    oracle=f"""
        WITH tok AS (
            SELECT doc_id, string_split(lower(text), ' ') AS arr
            FROM documents
        ),
        sh AS (
            SELECT doc_id,
                   unnest(list_transform(range(1, len(arr) - {SPAN_W - 2}),
                          i -> array_to_string(arr[i:i + {SPAN_W - 1}], ' ')))
                       AS s
            FROM tok WHERE len(arr) >= {SPAN_W}
        ),
        dup AS (
            SELECT s FROM sh GROUP BY s HAVING COUNT(*) >= 2
        )
        SELECT doc_id,
               n_windows,
               n_dup,
               CAST((n_dup * 1000) // n_windows AS BIGINT) AS dup_permille
        FROM (
            SELECT sh.doc_id,
                   CAST(COUNT(*) AS BIGINT) AS n_windows,
                   CAST(SUM(CASE WHEN dup.s IS NULL THEN 0 ELSE 1 END)
                        AS BIGINT) AS n_dup
            FROM sh LEFT JOIN dup ON sh.s = dup.s
            GROUP BY sh.doc_id
        )
    """,
    family="dedup",
    scale_notes=(
        "exact duplicated-substring census (Lee et al. 2022): one "
        "tokenize scan explodes positional W-word shingles in codegen, "
        "one hash aggregation keeps only shingles with global count "
        ">= 2 (the duplicate table — tiny vs the stream, since most "
        "shingles are unique), and a LEFT join flags each occurrence. "
        "At 100 TB both join sides partition by shingle hash and the "
        "dup table usually broadcasts; the shingle stream is never "
        "collected or sorted globally — the suffix-array formulation's "
        "global sort is exactly what this plan avoids. Cross-doc AND "
        "within-doc repeats both count, matching the published "
        "semantics. Integer permille via div keeps the coverage ratio "
        "engine-exact"
    ),
)
def q_dedup_substring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document duplicated-span census: how many W-word windows of
    each doc occur >= 2 times anywhere in the corpus (doc_id,
    n_windows, n_dup, dup_permille)."""
    d = table_parallel(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.split(F.lower("text"), " ").alias("t")
    ).filter(F.expr(f"size(t) >= {SPAN_W}"))
    # cache: the exploded shingle stream feeds both the census agg and
    # the flagging join (CLAUDE.md HOF-array caching rule)
    # shingles hashed to 64-bit longs AT THE EXPLODE: the census and
    # the flag join then shuffle narrow integers instead of W-word
    # strings (~5x fewer shuffle bytes; 64-bit collisions are absent at
    # corpus scale — the q_dedup_neardup verifier's documented trade)
    sh = toks.select(
        "doc_id",
        F.explode(
            F.expr(
                f"transform(sequence(1, size(t) - {SPAN_W - 1}),"
                f" i -> xxhash64(array_join(slice(t, i, {SPAN_W}), ' ')))"
            )
        ).alias("s"),
    ).cache()
    dup = (
        sh.groupBy("s")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") >= 2)
        .select("s", F.lit(1).alias("is_dup"))
    )
    flagged = sh.join(dup, "s", "left")
    return (
        flagged.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_windows"),
            F.sum(F.coalesce(F.col("is_dup"), F.lit(0)))
            .cast("bigint")
            .alias("n_dup"),
        )
        .select(
            "doc_id",
            "n_windows",
            "n_dup",
            F.expr("(n_dup * 1000) div n_windows")
            .cast("bigint")
            .alias("dup_permille"),
        )
    )
