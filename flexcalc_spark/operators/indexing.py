"""Inverted-index build — the search/retrieval index shape.

RAG and dedup-adjacent pipelines keep a token -> postings index next to
the corpus (BM25 retrieval, decontamination lookups, targeted deletion
under right-to-be-forgotten). Building one is a pure data-parallel
aggregation: tokenize once, collapse to (token, doc, tf), then fold
each token's postings into a single ordered list.

Plan shape: one tokenize scan -> (token, doc_id) shuffle with map-side
combine (tf collapse) -> one token-keyed shuffle where each token's
postings assemble via collect_list over the ALREADY-COLLAPSED rows
(state per token is its document frequency, not its raw occurrences).
Postings serialize as a comma-joined "doc:tf" string sorted by doc_id
— deterministic under any partitioning, and the driver-safe scalar
encoding of a list cell (registry rules: no array-typed outputs).

Reference cite (mount empty, SURVEY §0): no public-flexcalc analogue;
north-star retrieval-support operator (SURVEY §2.3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flexcalc_spark.registry import register
from flexcalc_spark.tables import table_parallel


@register(
    "q_inverted_index",
    oracle="""
        WITH tok AS (
            SELECT doc_id, unnest(string_split(lower(text), ' ')) AS token
            FROM documents
        ),
        tf AS (
            SELECT token, doc_id, CAST(COUNT(*) AS BIGINT) AS tf
            FROM tok GROUP BY token, doc_id
        )
        SELECT token,
               CAST(COUNT(*) AS BIGINT) AS df,
               CAST(SUM(tf) AS BIGINT) AS cf,
               string_agg(doc_id || ':' || tf, ',' ORDER BY doc_id)
                   AS postings
        FROM tf GROUP BY token
    """,
    family="text",
    scale_notes=(
        "inverted-index build: tokenize scan -> (token, doc) tf "
        "collapse with map-side combine -> token-keyed postings fold. "
        "The second shuffle's state per token is df collapsed rows, not "
        "raw occurrences. At 100 TB: postings for head tokens (df ~ "
        "corpus size) must NOT materialize as one in-memory list — "
        "shard the fold by (token, doc_id div S) first, emit postings "
        "SEGMENTS per shard, and store segments as rows in the index "
        "table (Lucene's block-postings layout, and queries union the "
        "segments); stopword-class tokens are usually dropped by a df "
        "ceiling before the fold. The fixture vocabulary is small so "
        "the single-fold plan is exact here, with the sharded variant "
        "the documented swap"
    ),
)
def q_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token -> (df, cf, postings) inverted index over documents;
    postings is 'doc:tf' comma-joined in doc_id order."""
    d = table_parallel(spark, sf_dir, "documents")
    tf = (
        d.select(
            "doc_id", F.explode(F.split(F.lower("text"), " ")).alias("token")
        )
        .groupBy("token", "doc_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("tf"))
    )
    return tf.groupBy("token").agg(
        F.count(F.lit(1)).cast("bigint").alias("df"),
        F.sum("tf").cast("bigint").alias("cf"),
        F.expr(
            "array_join(transform(array_sort(collect_list(struct(doc_id, tf)))"
            ", x -> concat(cast(x.doc_id AS string), ':',"
            " cast(x.tf AS string))), ',')"
        ).alias("postings"),
    )
