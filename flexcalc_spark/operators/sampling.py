"""Deterministic sampling / dataset-split operators (training-data
pipeline; SURVEY.md §2.3 extension family).

A training pipeline needs SPLITS THAT NEVER MOVE: the same document must
land in the same train/test shard on every run, every engine, every
cluster size. Seeded ``df.sample`` cannot give that (Spark's sampler is
partition-dependent and has no DuckDB twin), so these operators sample on
a content-derived hash: ``md5(doc_id)`` is uniform, engine-portable, and
a pure per-row function — no shuffle, no state, identical at any scale.

Hex-prefix comparison trick: the first two md5 hex chars are uniform over
256 buckets, and lexicographic order on fixed-width hex strings equals
numeric order ('0'<'9'<'a'<'f' in ASCII), so ``substr(md5(x),1,2) <
'1a'`` selects exactly 26/256 = 10.16% — as a plain string compare that
both engines evaluate identically.

Reference cites (mount empty, module::symbol per SURVEY §0): flexcalc has
no sampling surface; this family comes from the north-star LLM-pipeline
requirements (SURVEY §2.3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flexcalc_spark.registry import register
from flexcalc_spark.tables import table

# 26/256 ~ 10.2% held out for test.
SPLIT_THRESHOLD = "1a"
# Stratified rates by language: en is down-sampled harder (it dominates
# real corpora); hex thresholds, rate = int(hex, 16) / 256.
STRAT_EN = "40"       # 64/256 = 25%
STRAT_OTHER = "80"    # 128/256 = 50%


def _hash_bucket(col, salt: str):
    """First two md5 hex chars of (salt || col-as-string) — 256 uniform,
    engine-portable buckets."""
    return F.substring(
        F.md5(F.concat(F.lit(salt), col.cast("string")).cast("binary")), 1, 2
    )


@register(
    "q_sample_split",
    oracle=f"""
        SELECT doc_id,
               CASE WHEN substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 2)
                         < '{SPLIT_THRESHOLD}'
                    THEN 'test' ELSE 'train' END AS split
        FROM documents
    """,
    family="sampling",
    scale_notes="hash split is a per-row narrow map — no shuffle, no state, stable under any partitioning/backfill; THE way to cut train/test at 100 TB (seeded sample() is partition-dependent and unreproducible across engines)",
)
def q_sample_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~10% train/test split keyed on md5(doc_id)."""
    d = table(spark, sf_dir, "documents")
    bucket = _hash_bucket(F.col("doc_id"), "split:")
    return d.select(
        "doc_id",
        F.when(bucket < SPLIT_THRESHOLD, "test").otherwise("train").alias("split"),
    )


@register(
    "q_sample_stratified",
    oracle=f"""
        SELECT doc_id, lang
        FROM documents
        WHERE substr(md5('strat:' || CAST(doc_id AS VARCHAR)), 1, 2)
              < CASE WHEN lang = 'en' THEN '{STRAT_EN}' ELSE '{STRAT_OTHER}' END
    """,
    family="sampling",
    scale_notes="per-stratum rates as a CASE over the same hash — still a pure per-row filter (pushdown-friendly), so rebalancing a 100 TB corpus by language/source costs one scan and zero shuffles",
)
def q_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sample: 25% of en docs, 50% of the rest.

    The salt prefix ('strat:' vs 'split:') makes this draw independent of
    q_sample_split's — a doc's split membership says nothing about its
    sample membership."""
    d = table(spark, sf_dir, "documents")
    bucket = _hash_bucket(F.col("doc_id"), "strat:")
    threshold = F.when(F.col("lang") == "en", STRAT_EN).otherwise(STRAT_OTHER)
    return d.filter(bucket < threshold).select("doc_id", "lang")


PACK_BUDGET = 2048      # tokens per packed training sequence


@register(
    "q_pack_sequences",
    oracle=f"""
        WITH t AS (
            SELECT doc_id, source,
                   CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks
            FROM documents
        )
        SELECT doc_id, source, n_toks,
               CAST((cum - n_toks) // {PACK_BUDGET} AS BIGINT) AS bin_id,
               CAST((cum - n_toks) % {PACK_BUDGET} AS BIGINT) AS bin_offset
        FROM (
            SELECT doc_id, source, n_toks,
                   SUM(n_toks) OVER (
                       PARTITION BY source ORDER BY doc_id
                       ROWS UNBOUNDED PRECEDING) AS cum
            FROM t
        )
    """,
    family="sampling",
    scale_notes="training-batch sequence packing: greedy sequential packing of docs into fixed token-budget bins via ONE running-sum window per source shard — the op that turns a curated corpus into fixed-length training sequences. Shard key (source) bounds window state and parallelizes packing; all math integer (token counts, div/mod) so bin assignments are engine- and partitioning-independent. At 100 TB: one shuffle on the shard key, no state beyond the running sum",
)
def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy sequential sequence packing: each doc gets the bin and
    offset where it starts when documents are laid end-to-end (by
    doc_id) into PACK_BUDGET-token sequences, packed per source shard."""
    from pyspark.sql.window import Window

    d = table(spark, sf_dir, "documents")
    t = d.select(
        "doc_id",
        "source",
        F.size(F.split("text", " ")).cast("bigint").alias("n_toks"),
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    start = (F.sum("n_toks").over(w) - F.col("n_toks")).alias("start_tok")
    return (
        t.select("doc_id", "source", "n_toks", start)
        .select(
            "doc_id",
            "source",
            "n_toks",
            F.expr(f"start_tok div {PACK_BUDGET}").cast("bigint").alias("bin_id"),
            (F.col("start_tok") % PACK_BUDGET).cast("bigint").alias("bin_offset"),
        )
    )


GROUPED_K = 5


@register(
    "q_grouped_sample",
    oracle=f"""
        SELECT source, doc_id, CAST(rank AS BIGINT) AS rank
        FROM (
            SELECT source, doc_id,
                   row_number() OVER (
                       PARTITION BY source
                       ORDER BY md5('gs:' || CAST(doc_id AS VARCHAR)),
                                doc_id) AS rank
            FROM documents
        )
        WHERE rank <= {GROUPED_K}
    """,
    family="sampling",
    scale_notes=(
        "deterministic per-group subsample (k docs per source, ordered "
        "by content hash): the per-domain cap of a mixture recipe. One "
        "shuffle on the group key + WindowGroupLimit pruning (top-k "
        "rows survive per partition BEFORE the sort materializes); the "
        "md5 order makes the sample stable across engines, re-runs and "
        "backfills — seeded sample() is none of those"
    ),
)
def q_grouped_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k=5 documents per source, chosen by md5 hash order (stable,
    engine-portable) with doc_id tiebreak."""
    from pyspark.sql.window import Window

    d = table(spark, sf_dir, "documents")
    h = F.md5(
        F.concat(F.lit("gs:"), F.col("doc_id").cast("string")).cast("binary")
    )
    w = Window.partitionBy("source").orderBy(h, "doc_id")
    return (
        d.select(
            "source",
            "doc_id",
            F.row_number().over(w).cast("bigint").alias("rank"),
        )
        .filter(F.col("rank") <= GROUPED_K)
    )


# --- weighted sampling (A-ES / exponential-keys reservoir) -----------
WSAMP_K = 20


@register(
    "q_sample_weighted",
    oracle=f"""
        WITH h AS (
            SELECT doc_id, source, n_chars,
                   substr(md5('wsamp:' || CAST(doc_id AS VARCHAR)), 1, 8) AS hx
            FROM documents
        ),
        u AS (
            SELECT doc_id, source,
                   CAST(list_reduce(
                       list_prepend(CAST(0 AS BIGINT),
                           list_transform(range(1, 9),
                               k -> CAST(strpos('0123456789abcdef',
                                                substr(hx, k, 1)) - 1
                                    AS BIGINT))),
                       (acc, x) -> acc * 16 + x) AS BIGINT) AS hv,
                   n_chars
            FROM h
        ),
        keyed AS (
            SELECT doc_id, source,
                   CAST(floor(ln((hv + 1) / 4294967296.0) / n_chars
                              * 1000000.0) AS BIGINT) AS kq
            FROM u
        )
        SELECT source, doc_id, kq
        FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY source
                                         ORDER BY kq DESC, doc_id) AS rn
            FROM keyed
        ) WHERE rn <= {WSAMP_K}
    """,
    family="sampling",
    scale_notes=(
        "weighted reservoir sampling (Efraimidis-Spirakis exponential "
        "keys): each row's key ln(u)/w is a pure function of content "
        "hash and weight — no RNG state, so the same k winners emerge "
        "under ANY partitioning and the sample is reproducible across "
        "engines and reruns. Top-k per group runs as the "
        "WindowGroupLimit rank (k rows per partition retained before "
        "the final merge), one shuffle on the group key. The ln is "
        "floor-quantized to a 1e-6 grid (result magnitude <=0.5, "
        "cross-engine ulp ~1e-16 — boundary flips negligible), "
        "doc_id breaks residual ties totally"
    ),
)
def q_sample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 docs per source by Efraimidis-Spirakis weighted-sampling
    keys (weight = n_chars, uniform from content md5)."""
    from pyspark.sql.window import Window

    d = table(spark, sf_dir, "documents")
    hx = F.substring(
        F.md5(
            F.concat(F.lit("wsamp:"), F.col("doc_id").cast("string")).cast(
                "binary"
            )
        ),
        1,
        8,
    )
    hv = F.expr(
        "aggregate(sequence(1, 8), CAST(0 AS BIGINT),"
        " (acc, k) -> acc * 16 + CAST(instr('0123456789abcdef',"
        " substring(hx, k, 1)) - 1 AS BIGINT))"
    )
    keyed = (
        d.select("doc_id", "source", "n_chars", hx.alias("hx"))
        .select("doc_id", "source", "n_chars", hv.alias("hv"))
        .select(
            "doc_id",
            "source",
            F.floor(
                F.expr("ln((hv + 1) / 4294967296.0) / n_chars * 1000000.0")
            )
            .cast("bigint")
            .alias("kq"),
        )
    )
    w = Window.partitionBy("source").orderBy(
        F.col("kq").desc(), F.col("doc_id")
    )
    return (
        keyed.select(
            "source", "doc_id", "kq", F.row_number().over(w).alias("rn")
        )
        .filter(F.col("rn") <= WSAMP_K)
        .select("source", "doc_id", "kq")
    )
