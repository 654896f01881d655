"""Corpus-quality operators for training-data curation.

Two filters every large-scale LLM data pipeline runs before dedup and
training (SURVEY.md §2.3 north-star surface; complements
``textstats.q_quality_score``):

- **repetition detection** (``q_repetition``): the fraction of repeated
  word trigrams per document — the Gopher/C4-style "repetition" quality
  signal. High-duplication documents (boilerplate, keyword stuffing,
  degenerate generations) are filtered scan-side before any expensive
  pairwise dedup.
- **vocabulary construction** (``q_vocab``): global token counts ranked
  with cumulative coverage share — the first step of tokenizer/vocab
  building and a direct corpus-health readout (how many token types
  cover 95% of the stream).

Both are built from codegen-friendly primitives: trigrams are a
``sequence``/``transform`` higher-order function over the token array
(no explode, no shuffle for the per-document signal); vocab is one
explode + partial-aggregated count. Ratios divide exact integers, so
the doubles are bit-identical across engines (IEEE division is
correctly rounded — registry determinism rules).

Reference cites (mount empty, module::symbol per SURVEY §0): flexcalc
has no text surface; this family comes from the north-star LLM-pipeline
requirements (SURVEY §2.3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from flexcalc_spark.operators.sampling import SPLIT_THRESHOLD
from flexcalc_spark.registry import register
from flexcalc_spark.tables import table, table_parallel

# Vocab keys ranked by count desc; ties broken lexicographically.
VOCAB_TOP = 100


@register(
    "q_repetition",
    oracle="""
        WITH t AS (
            SELECT doc_id, string_split(text, ' ') AS toks FROM documents
        ), g AS (
            SELECT doc_id,
                   list_transform(range(1, len(toks) - 1),
                       i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
                       AS tris
            FROM t
        )
        SELECT doc_id,
               CAST(len(tris) AS BIGINT) AS n_tri,
               CAST(len(list_distinct(tris)) AS BIGINT) AS n_uniq,
               CASE WHEN len(tris) > 0
                    THEN CAST(len(tris) - len(list_distinct(tris)) AS DOUBLE)
                         / CAST(len(tris) AS DOUBLE)
                    ELSE 0.0 END AS rep_ratio
        FROM g
    """,
    family="text",
    scale_notes="duplicate-trigram fraction per doc: trigrams via a sequence/transform HOF over the token array — pure per-row codegen, no explode, no shuffle; at 100 TB this quality gate runs inside the first scan so junk never reaches the (much costlier) pairwise dedup stages",
)
def q_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document repeated word-trigram fraction (Gopher-style
    repetition quality signal)."""
    d = table_parallel(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    d = d.select("doc_id", toks.alias("toks"))
    # Guard: sequence(1, n-2) DESCENDS when n < 3 and would fabricate
    # trigram slots the oracle's empty range() never produces.
    tris = F.when(
        F.size("toks") >= 3,
        F.expr(
            "transform(sequence(1, size(toks) - 2),"
            " i -> concat_ws(' ', element_at(toks, i),"
            " element_at(toks, i + 1), element_at(toks, i + 2)))"
        ),
    ).otherwise(F.expr("array()"))
    g = d.select("doc_id", tris.alias("tris"))
    n_tri = F.size("tris").cast("bigint")
    n_uniq = F.size(F.array_distinct("tris")).cast("bigint")
    return g.select(
        "doc_id",
        n_tri.alias("n_tri"),
        n_uniq.alias("n_uniq"),
        F.when(
            n_tri > 0,
            (n_tri - n_uniq).cast("double") / n_tri.cast("double"),
        )
        .otherwise(F.lit(0.0))
        .alias("rep_ratio"),
    )


@register(
    "q_vocab",
    oracle=f"""
        WITH tok AS (
            SELECT unnest(string_split(text, ' ')) AS token FROM documents
        ), cnts AS (
            SELECT token, COUNT(*) AS cnt FROM tok GROUP BY token
        ), ranked AS (
            SELECT token, cnt,
                   ROW_NUMBER() OVER (ORDER BY cnt DESC, token) AS rnk,
                   SUM(cnt) OVER (ORDER BY cnt DESC, token
                                  ROWS UNBOUNDED PRECEDING) AS cum,
                   SUM(cnt) OVER () AS total
            FROM cnts
        )
        SELECT CAST(rnk AS BIGINT) AS rnk, token, cnt,
               CAST(cum AS DOUBLE) / CAST(total AS DOUBLE) AS cum_share
        FROM ranked
        WHERE rnk <= {VOCAB_TOP}
    """,
    family="text",
    scale_notes=f"vocab building: explode + partial-aggregated count (map-side combine collapses the token stream to O(vocab) rows per partition), then rank/cumulative windows run over the tiny aggregated vocab — the single-partition global window is fine because its input is vocab-sized, not corpus-sized; cum_share divides exact integer sums so the doubles match across engines",
)
def q_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{VOCAB_TOP} token vocabulary with cumulative coverage share
    (tokenizer vocab construction)."""
    d = table(spark, sf_dir, "documents")
    cnts = (
        d.select(F.explode(F.split(F.col("text"), " ")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w_rank = Window.orderBy(F.col("cnt").desc(), F.col("token"))
    w_cum = w_rank.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_total = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return (
        cnts.select(
            F.row_number().over(w_rank).cast("bigint").alias("rnk"),
            "token",
            "cnt",
            (
                F.sum("cnt").over(w_cum).cast("double")
                / F.sum("cnt").over(w_total).cast("double")
            ).alias("cum_share"),
        )
        .filter(F.col("rnk") <= VOCAB_TOP)
    )


# Curation-pipeline gates (q_corpus_filter).
MIN_CHARS = 100
REP_MAX = 0.015


@register(
    "q_corpus_filter",
    oracle=f"""
        WITH t AS (
            SELECT doc_id, lang, source, n_chars, text,
                   string_split(text, ' ') AS toks
            FROM documents
        ), g AS (
            SELECT doc_id, lang, source, n_chars, text,
                   list_transform(range(1, len(toks) - 1),
                       i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
                       AS tris
            FROM t
        ), r AS (
            SELECT doc_id, lang, source, n_chars,
                   MIN(doc_id) OVER (PARTITION BY md5(text)) AS keep_id,
                   CASE WHEN len(tris) > 0
                        THEN CAST(len(tris) - len(list_distinct(tris))
                                  AS DOUBLE) / CAST(len(tris) AS DOUBLE)
                        ELSE 0.0 END AS rep_ratio
            FROM g
        )
        SELECT doc_id, lang, source, n_chars
        FROM r
        WHERE doc_id = keep_id
          AND substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 2)
              >= '{SPLIT_THRESHOLD}'
          AND n_chars >= {MIN_CHARS}
          AND rep_ratio <= {REP_MAX}
    """,
    family="text",
    scale_notes="the assembled curation pipeline as ONE plan: per-row gates (train-split hash, length, trigram repetition) are narrow and run inside the scan stage; the only shuffle is the content-hash dedup-keeper window (same key as q_dedup_exact). Gate order is the 100 TB cost model — cheap scan-side filters first, so the expensive pairwise dedup/similarity stages downstream only ever see survivors",
)
def q_corpus_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end corpus curation filter: exact-dup keeper (min doc_id
    per md5(text)) AND train-split membership AND minimum length AND
    low trigram repetition — the composed version of q_dedup_exact /
    q_sample_split / q_quality_score / q_repetition."""
    d = table_parallel(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    tris = F.when(
        F.size(toks) >= 3,
        F.expr(
            "transform(sequence(1, size(split(text, ' ')) - 2),"
            " i -> concat_ws(' ', element_at(split(text, ' '), i),"
            " element_at(split(text, ' '), i + 1),"
            " element_at(split(text, ' '), i + 2)))"
        ),
    ).otherwise(F.expr("array()"))
    n_tri = F.size("tris").cast("bigint")
    n_uniq = F.size(F.array_distinct("tris")).cast("bigint")
    r = (
        d.select("doc_id", "lang", "source", "n_chars", "text",
                 tris.alias("tris"))
        .select(
            "doc_id", "lang", "source", "n_chars", "text",
            F.when(
                n_tri > 0, (n_tri - n_uniq).cast("double") / n_tri.cast("double")
            ).otherwise(F.lit(0.0)).alias("rep_ratio"),
        )
        .withColumn(
            "keep_id",
            F.min("doc_id").over(
                Window.partitionBy(F.md5(F.col("text").cast("binary")))
            ),
        )
    )
    split_bucket = F.substring(
        F.md5(
            F.concat(F.lit("split:"), F.col("doc_id").cast("string")).cast(
                "binary"
            )
        ),
        1, 2,
    )
    return (
        r.filter(
            (F.col("doc_id") == F.col("keep_id"))
            & (split_bucket >= SPLIT_THRESHOLD)
            & (F.col("n_chars") >= MIN_CHARS)
            & (F.col("rep_ratio") <= REP_MAX)
        )
        .select("doc_id", "lang", "source", "n_chars")
    )


# Per-token entropy term, floor-quantized to a 1e-8 integer grid BEFORE
# the per-doc sum: -(p ln p) terms are doubles whose sum order differs
# across engines/partitionings, so each term is snapped to an integer
# first and the BIGINT sum is order-independent (same discipline as the
# aggregate grid sums in aggregates.py). Identical literal structure on
# both engines; ln ulp drift is absorbed by the floor.
_ENTROPY_TERM = (
    "floor( (CAST(tf AS DOUBLE) / dl) * ln(CAST(tf AS DOUBLE) / dl)"
    " * -100000000.0 )"
)


@register(
    "q_quality_entropy",
    oracle=f"""
        WITH tok AS (
            SELECT doc_id, unnest(string_split(lower(text), ' ')) AS token
            FROM documents
        ),
        tf AS (
            SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf
            FROM tok GROUP BY doc_id, token
        ),
        dl AS (
            SELECT doc_id,
                   CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS dl
            FROM documents
        )
        SELECT tf.doc_id,
               CAST(SUM(CAST({_ENTROPY_TERM} AS BIGINT)) AS BIGINT)
                   AS entropy_q,
               CAST(COUNT(*) AS BIGINT) AS n_distinct_tokens
        FROM tf JOIN dl USING (doc_id)
        GROUP BY tf.doc_id
    """,
    family="quality",
    scale_notes=(
        "token-distribution Shannon entropy per document (nats, 1e-8 "
        "integer grid): the low-entropy tail is boilerplate/degenerate "
        "text — a standard corpus-quality gate alongside the Gopher "
        "rules. Plan is explode -> per-(doc,token) map-side collapse -> "
        "per-doc BIGINT sum: one narrow shuffle keyed on doc_id, "
        "integer-grid terms make the sum partitioning-independent"
    ),
)
def q_quality_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy (nats, 1e-8 floor grid) of each document's token
    distribution plus its distinct-token count — the low-entropy tail is
    the repetitive-text removal candidate set."""
    d = table_parallel(spark, sf_dir, "documents")
    toks = F.split(F.lower("text"), " ")
    tf = (
        d.select("doc_id", F.explode(toks).alias("token"))
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dl = d.select("doc_id", F.size(toks).cast("bigint").alias("dl"))
    return (
        tf.join(dl, "doc_id")
        .groupBy("doc_id")
        .agg(
            F.sum(F.expr(_ENTROPY_TERM).cast("bigint"))
            .cast("bigint")
            .alias("entropy_q"),
            F.count(F.lit(1)).cast("bigint").alias("n_distinct_tokens"),
        )
    )
