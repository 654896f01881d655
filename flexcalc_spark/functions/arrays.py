"""Array operations and higher-order functions (SURVEY.md §2.2).

These are the building blocks of the vector/text pipeline (§2.3):
zip_with + aggregate is the JVM-native dot product used by q_knn_cosine,
and split/explode is the tokenizer under every dedup operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flexcalc_spark.registry import register
from flexcalc_spark.tables import table


@register(
    "q_array_ops",
    oracle="""
        SELECT doc_id,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks,
               string_split(text, ' ')[1] AS first_tok,
               string_split(text, ' ')[-1] AS last_tok,
               list_sort(string_split(text, ' '))[1] AS sorted_first,
               CAST(list_contains(string_split(text, ' '), 'join') AS INT) AS has_join,
               array_to_string(list_slice(string_split(text, ' '), 1, 3), ' ') AS head3
        FROM documents
    """,
    family="arrays",
)
def q_array_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """size/element_at/negative-index/sort/contains/slice over token arrays."""
    d = table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    return d.select(
        "doc_id",
        F.size(toks).cast("bigint").alias("n_toks"),
        F.element_at(toks, 1).alias("first_tok"),
        F.element_at(toks, -1).alias("last_tok"),
        F.element_at(F.array_sort(toks), 1).alias("sorted_first"),
        F.array_contains(toks, "join").cast("int").alias("has_join"),
        F.array_join(F.slice(toks, 1, 3), " ").alias("head3"),
    )


@register(
    "q_array_hof",
    oracle="""
        SELECT vec_id,
               ROUND(list_sum(list_transform(embedding, x -> x * x)), 4) AS norm_sq,
               CAST(len(list_filter(embedding, x -> x > 0)) AS BIGINT) AS n_pos,
               CAST(list_max(list_transform(embedding, x -> abs(x))) AS DOUBLE) AS max_abs
        FROM embeddings
    """,
    family="arrays",
    scale_notes="higher-order fns run inside codegen over the array — no explode, no shuffle, no Python",
)
def q_array_hof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """transform/filter/aggregate (fold) over embedding vectors.

    norm_sq: per-element float32 squares summed left-to-right into a
    double accumulator on both engines; rounded to absorb any
    float-vs-double promotion drift."""
    e = table(spark, sf_dir, "embeddings")
    return e.select(
        "vec_id",
        F.round(
            F.expr(
                "aggregate(zip_with(embedding, embedding, (x, y) -> x * y),"
                " CAST(0.0 AS DOUBLE), (s, x) -> s + x)"
            ),
            4,
        ).alias("norm_sq"),
        F.expr("size(filter(embedding, x -> x > 0))").cast("bigint").alias("n_pos"),
        F.expr("array_max(transform(embedding, x -> abs(x)))")
        .cast("double")
        .alias("max_abs"),
    )


@register(
    "q_explode",
    oracle="""
        SELECT tok, COUNT(*) AS cnt
        FROM (SELECT unnest(string_split(lower(text), ' ')) AS tok FROM documents)
        GROUP BY tok
    """,
    family="arrays",
    scale_notes="explode multiplies rows pre-shuffle but partial agg collapses them map-side; token-count shuffle is O(vocab x partitions)",
)
def q_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenize + explode + word count (the flatMap archetype)."""
    d = table(spark, sf_dir, "documents")
    return (
        d.select(F.explode(F.split(F.lower(F.col("text")), " ")).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
