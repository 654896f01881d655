"""N-gram language-model scoring — perplexity-style quality filtering.

The CCNet / Gopher-era pipelines score every document against a cheap
n-gram LM and drop the high-perplexity tail (boilerplate, gibberish,
OCR noise) before training. This module trains an add-one-smoothed
bigram model ON the corpus itself in one pass and scores every document
with it — the self-scoring shape (a held-out LM is just a different
count table joined in, same plan).

Plan shape (the 100 TB story):

- ONE tokenize scan produces the (doc_id, w1, w2) bigram stream via
  ``zip_with(slice, slice)`` inside codegen — no per-row Python, no
  window shuffle for adjacency (the array already encodes order).
- The model is two collapsed count tables: c12 (bigram counts) and c1
  (context counts) — vocabulary-sized, i.e. MBs even for TB corpora —
  joined back as BROADCASTs, so scoring is map-side only.
- Per-pair log-probs are floor-quantized to the 1e-6 integer grid
  BEFORE summation (registry rules: ln differs in the last ulp across
  engines; floor of a transcendental never sits on a grid boundary),
  so the per-doc negative log-likelihood is an exact BIGINT sum.

Reference cite (mount empty, SURVEY §0): the public flexcalc toolbox
has no text surface; this operator exists for the north-star LLM-data
pipeline (SURVEY §2.3 quality-scoring row, perplexity variant).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flexcalc_spark.registry import register
from flexcalc_spark.tables import table_parallel

# Per-pair smoothed log-prob, floor-quantized: identical literal
# structure on both engines. p(w2|w1) = (c12 + 1) / (c1 + V).
_LP_Q = "floor(ln((c12 + 1.0) / (c1 + v)) * 1000000.0)"


@register(
    "q_ngram_lm",
    oracle="""
        WITH tok AS (
            SELECT doc_id, generate_subscripts(arr, 1) AS pos,
                   unnest(arr) AS w
            FROM (SELECT doc_id, string_split(lower(text), ' ') AS arr
                  FROM documents)
        ),
        big AS (
            SELECT doc_id, w1, w2 FROM (
                SELECT doc_id,
                       lag(w) OVER (PARTITION BY doc_id ORDER BY pos) AS w1,
                       w AS w2
                FROM tok
            ) WHERE w1 IS NOT NULL
        ),
        c12 AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c12
                FROM big GROUP BY w1, w2),
        c1  AS (SELECT w1, CAST(COUNT(*) AS BIGINT) AS c1
                FROM big GROUP BY w1),
        vv  AS (SELECT CAST(COUNT(DISTINCT w) AS BIGINT) AS v FROM tok)
        SELECT doc_id, n_bigrams, nll_q,
               CAST(nll_q // n_bigrams AS BIGINT) AS avg_nll_q
        FROM (
            SELECT big.doc_id,
                   CAST(COUNT(*) AS BIGINT) AS n_bigrams,
                   CAST(-SUM(CAST(floor(ln((c12 + 1.0) / (c1 + v))
                                        * 1000000.0) AS BIGINT))
                        AS BIGINT) AS nll_q
            FROM big JOIN c12 USING (w1, w2) JOIN c1 USING (w1), vv
            GROUP BY big.doc_id
        )
    """,
    family="text",
    scale_notes=(
        "bigram-LM perplexity scoring (CCNet-style quality filter): one "
        "tokenize scan emits the bigram stream via zip_with(slice,slice) "
        "in codegen (adjacency comes from the array — no window shuffle); "
        "the MODEL is two vocabulary-sized count tables (c12, c1) that "
        "join back as BROADCASTs, so scoring 100 TB is map-side after "
        "two small aggregations. Per-pair ln is floor-quantized to the "
        "1e-6 grid before the BIGINT sum (ulp-safe across engines). "
        "Scoring against a HELD-OUT LM is the same plan with the count "
        "tables read from a model store instead of aggregated in-query. "
        "At web scale, prune the bigram table to counts >= k before the "
        "broadcast (rare bigrams all share the +1-smoothed floor score): "
        "the table shrinks 10-100x and the dropped entries can be "
        "re-scored via the c1-only fallback join"
    ),
)
def q_ngram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document negative log-likelihood under an add-one-smoothed
    corpus bigram model: (doc_id, n_bigrams, nll_q, avg_nll_q) with
    nll_q = -sum(floor(ln(p)*1e6)) — the perplexity-filter signal."""
    d = table_parallel(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.split(F.lower("text"), " ").alias("t"))
    # cache: the HOF-derived pair stream feeds three consumers (c12, c1,
    # scoring join) and would otherwise re-tokenize per subtree
    pairs = (
        toks.select(
            "doc_id",
            F.explode(
                F.expr(
                    "zip_with(slice(t, 1, size(t) - 1),"
                    " slice(t, 2, size(t) - 1),"
                    " (a, b) -> struct(a AS w1, b AS w2))"
                )
            ).alias("p"),
        )
        .select("doc_id", "p.w1", "p.w2")
        .cache()
    )
    c12 = pairs.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).cast("bigint").alias("c12")
    )
    c1 = pairs.groupBy("w1").agg(
        F.count(F.lit(1)).cast("bigint").alias("c1")
    )
    vv = toks.select(F.explode("t").alias("w")).agg(
        F.countDistinct("w").cast("bigint").alias("v")
    )
    scored = (
        pairs.join(F.broadcast(c12), ["w1", "w2"])
        .join(F.broadcast(c1), ["w1"])
        .crossJoin(F.broadcast(vv))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
            (-F.sum(F.expr(_LP_Q).cast("bigint"))).cast("bigint").alias("nll_q"),
        )
    )
    return scored.select(
        "doc_id",
        "n_bigrams",
        "nll_q",
        F.expr("nll_q div n_bigrams").cast("bigint").alias("avg_nll_q"),
    )
