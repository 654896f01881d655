"""Feature engineering for model training: the hashing-trick
vectorizer (per-doc sparse bag-of-words into a fixed 256-dim space).

The hashing trick is what makes text featurization embarrassingly
parallel at corpus scale: no vocabulary pass, no dictionary broadcast,
no OOV handling — each token maps to ``portable_hash(token) mod D``
scan-side, and a doc's sparse vector is one local groupBy. Collisions
are the accepted trade (two tokens sharing a bucket add their counts),
which is exactly how Vowpal Wabbit / scikit's HashingVectorizer ship.

Portability: the hash must match the oracle BIT-FOR-BIT, so it is the
md5-hex fold already proven by q_sample_weighted / q_table_checksum
(first 8 hex digits as a base-16 integer) — never engine-private hash
functions (xxhash64 exists only on the Spark side).

Output is one row per doc with the sparse vector rendered
``idx:cnt`` comma-joined in index order — indices zero-padded to 3
digits so lexicographic list_sort equals numeric order on both engines
(DuckDB 1.0 has no ORDER BY inside string_agg). The driver
canonicalizer rejects array cells; the string is deterministic because
both the fold and the ordering are exact.

Reference cite (mount empty, SURVEY §0): public flexcalc has no text
surface; the construction is the standard hashing-trick featurizer
(Weinberger et al. 2009).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flexcalc_spark.registry import register
from flexcalc_spark.tables import table_parallel

HASH_DIM = 256


@register(
    "q_feature_hash",
    oracle=f"""
        WITH tok AS (
            SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w
            FROM documents
        ),
        hashed AS (
            SELECT doc_id,
                   CAST(list_reduce(
                       list_prepend(CAST(0 AS BIGINT),
                           list_transform(range(1, 9),
                               k -> CAST(strpos('0123456789abcdef',
                                        substr(md5('fh:' || w), k, 1)) - 1
                                    AS BIGINT))),
                       (acc, x) -> acc * 16 + x) AS BIGINT) % {HASH_DIM}
                       AS idx
            FROM tok WHERE w <> ''
        ),
        cell AS (
            SELECT doc_id, idx, COUNT(*) AS cnt
            FROM hashed GROUP BY doc_id, idx
        )
        SELECT doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_features,
               array_to_string(list_sort(list(
                   lpad(CAST(idx AS VARCHAR), 3, '0') || ':' ||
                   CAST(cnt AS VARCHAR))), ',') AS features
        FROM cell GROUP BY doc_id
    """,
    family="features",
    scale_notes=(
        "hashing-trick vectorizer: tokens map to hash(token) mod 256 "
        "scan-side (no vocabulary pass, no dictionary broadcast, no "
        "OOV path — the property that makes featurizing 100 TB one "
        "linear scan), per-doc sparse vectors collapse in a local "
        "groupBy whose shuffle is bounded by docs x distinct buckets. "
        "The hash is the engine-portable md5 fold, and the sparse "
        "rendering is index-ordered so the output string is exact. "
        "Dimension D trades collision rate for width exactly as in "
        "production hashing vectorizers"
    ),
)
def q_feature_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc 256-dim hashing-trick sparse vectors ('idx:cnt' comma
    string, index-ordered) over whitespace tokens."""
    d = table_parallel(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", F.explode(F.split(F.lower("text"), " ")).alias("w")
    ).filter(F.col("w") != "")
    idx = F.expr(
        "aggregate(sequence(1, 8), CAST(0 AS BIGINT),"
        " (acc, k) -> acc * 16 + CAST(instr('0123456789abcdef',"
        " substring(md5(CAST('fh:' || w AS BINARY)), k, 1)) - 1 AS BIGINT))"
        f" % {HASH_DIM}"
    )
    cell = (
        tok.select("doc_id", idx.alias("idx"))
        .groupBy("doc_id", "idx")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return cell.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_features"),
        F.array_join(
            F.array_sort(
                F.collect_list(
                    F.concat_ws(
                        ":",
                        F.lpad(F.col("idx").cast("string"), 3, "0"),
                        F.col("cnt").cast("string"),
                    )
                )
            ),
            ",",
        ).alias("features"),
    )
