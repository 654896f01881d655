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


# ------------------------------------------- naive Bayes lang classifier
@register(
    "q_naive_bayes",
    oracle="""
        WITH tok AS (
            SELECT doc_id, lang,
                   unnest(string_split(lower(text), ' ')) AS w
            FROM documents
        ),
        c_wl AS (SELECT lang, w, CAST(COUNT(*) AS BIGINT) AS c
                 FROM tok GROUP BY lang, w),
        c_l  AS (SELECT lang, CAST(SUM(c) AS BIGINT) AS tot
                 FROM c_wl GROUP BY lang),
        vv   AS (SELECT CAST(COUNT(DISTINCT w) AS BIGINT) AS v FROM tok),
        prior AS (
            SELECT lang, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS nd
            FROM tok GROUP BY lang
        ),
        nall AS (SELECT CAST(SUM(nd) AS BIGINT) AS n FROM prior),
        scored AS (
            SELECT tok.doc_id, tok.lang AS true_lang, c_l.lang AS cand,
                   CAST(SUM(CAST(floor(ln(
                       (COALESCE(c_wl.c, 0) + 1.0)
                       / (c_l.tot + vv.v)) * 1000000.0) AS BIGINT))
                     AS BIGINT) AS like_q
            FROM tok
            CROSS JOIN c_l
            CROSS JOIN vv
            LEFT JOIN c_wl ON c_wl.w = tok.w AND c_wl.lang = c_l.lang
            GROUP BY tok.doc_id, tok.lang, c_l.lang
        ),
        posterior AS (
            SELECT s.doc_id, s.true_lang, s.cand,
                   s.like_q + CAST(floor(ln(CAST(p.nd AS DOUBLE) / na.n)
                                         * 1000000.0) AS BIGINT) AS score_q
            FROM scored s
            JOIN prior p ON p.lang = s.cand
            CROSS JOIN nall na
        ),
        pred AS (
            SELECT doc_id, true_lang, cand AS pred_lang
            FROM (
                SELECT *, ROW_NUMBER() OVER (
                           PARTITION BY doc_id
                           ORDER BY score_q DESC, cand) AS rk
                FROM posterior
            ) WHERE rk = 1
        )
        SELECT true_lang, pred_lang, CAST(COUNT(*) AS BIGINT) AS n_docs
        FROM pred GROUP BY true_lang, pred_lang
    """,
    family="text",
    scale_notes=(
        "multinomial naive Bayes trained AND applied in-engine (the "
        "supervised upgrade of q_lang_id): the MODEL is the "
        "(lang, word) count table + language totals + priors — all "
        "vocabulary-/|langs|-sized, so they broadcast; scoring fans "
        "each token occurrence out |langs|x (the standard NB scoring "
        "join) with add-one smoothing via LEFT-join COALESCE, and "
        "per-token log-likelihoods ride the 1e-6 floor grid so the "
        "per-(doc, lang) sums are exact BIGINTs — argmax ties break "
        "on the language (total order). One corpus scan builds the "
        "model, one scores; at 100 TB both are scan-bound and the "
        "|langs| fan-out stays map-side. The confusion census output "
        "is the training-accuracy gate pipelines alert on"
    ),
)
def q_naive_bayes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train add-one multinomial NB (lang ~ words) on the corpus and
    classify every document; confusion census (true_lang, pred_lang,
    n_docs)."""
    from pyspark.sql.window import Window

    d = table_parallel(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id",
        "lang",
        F.explode(F.split(F.lower("text"), " ")).alias("w"),
    ).cache()
    c_wl = tok.groupBy("lang", "w").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    c_l = c_wl.groupBy("lang").agg(
        F.sum("c").cast("bigint").alias("tot")
    )
    vv = tok.agg(F.countDistinct("w").cast("bigint").alias("v"))
    prior = tok.groupBy("lang").agg(
        F.countDistinct("doc_id").cast("bigint").alias("nd")
    )
    nall = prior.agg(F.sum("nd").cast("bigint").alias("n"))
    cand = c_l.withColumnRenamed("lang", "cand")
    scored = (
        tok.crossJoin(F.broadcast(cand))
        .crossJoin(F.broadcast(vv))
        .join(
            F.broadcast(
                c_wl.select(
                    F.col("lang").alias("cand2"),
                    F.col("w").alias("w2"),
                    "c",
                )
            ),
            (F.col("w2") == F.col("w")) & (F.col("cand2") == F.col("cand")),
            "left",
        )
        .groupBy(
            "doc_id", F.col("lang").alias("true_lang"), "cand"
        )
        .agg(
            F.sum(
                F.expr(
                    "CAST(floor(ln((COALESCE(c, 0) + 1.0) / (tot + v))"
                    " * 1000000.0) AS BIGINT)"
                )
            )
            .cast("bigint")
            .alias("like_q")
        )
    )
    posterior = (
        scored.join(
            F.broadcast(prior.withColumnRenamed("lang", "cand")), "cand"
        )
        .crossJoin(F.broadcast(nall))
        .select(
            "doc_id",
            "true_lang",
            "cand",
            (
                F.col("like_q")
                + F.expr(
                    "CAST(floor(ln(CAST(nd AS DOUBLE) / n) * 1000000.0)"
                    " AS BIGINT)"
                )
            ).alias("score_q"),
        )
    )
    rk = F.row_number().over(
        Window.partitionBy("doc_id").orderBy(
            F.col("score_q").desc(), F.col("cand")
        )
    )
    pred = (
        posterior.withColumn("rk", rk)
        .filter(F.col("rk") == 1)
        .select("true_lang", F.col("cand").alias("pred_lang"))
    )
    return pred.groupBy("true_lang", "pred_lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs")
    )
