"""String functions (SURVEY.md §2.2 "Scalar functions").

All JVM-native (whole-stage codegen) — no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flexcalc_spark.registry import register
from flexcalc_spark.tables import table


@register(
    "q_str_funcs",
    oracle="""
        SELECT p_partkey,
               UPPER(p_name) AS up,
               LOWER(p_brand) AS lo,
               CAST(LENGTH(p_name) AS BIGINT) AS len,
               SUBSTR(p_name, 1, 5) AS sub,
               CONCAT(p_brand, ':', p_type) AS cat,
               REPLACE(p_name, ' ', '_') AS rep,
               LPAD(CAST(p_size AS VARCHAR), 5, '0') AS padded,
               SPLIT_PART(p_name, ' ', 1) AS first_word,
               TRIM(CONCAT('  ', p_name, '  ')) AS trimmed
        FROM part
    """,
    family="strings",
)
def q_str_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """upper/lower/length/substr/concat/replace/lpad/split_part/trim."""
    p = table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("up"),
        F.lower("p_brand").alias("lo"),
        F.length("p_name").cast("bigint").alias("len"),
        F.substring("p_name", 1, 5).alias("sub"),
        F.concat_ws(":", "p_brand", "p_type").alias("cat"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("rep"),
        F.lpad(F.col("p_size").cast("string"), 5, "0").alias("padded"),
        F.split_part(F.col("p_name"), F.lit(" "), F.lit(1)).alias("first_word"),
        F.trim(F.concat(F.lit("  "), F.col("p_name"), F.lit("  "))).alias("trimmed"),
    )


@register(
    "q_str_regexp",
    oracle="""
        SELECT p_partkey,
               CAST(regexp_extract(p_brand, '#(\\d+)', 1) AS BIGINT) AS brand_num,
               regexp_replace(p_name, '[aeiou]', '', 'g') AS no_vowels
        FROM part
        WHERE regexp_matches(p_name, '^[a-m]')
    """,
    family="strings",
    scale_notes="regex stays in codegen; anchored patterns avoid catastrophic backtracking",
)
def q_str_regexp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """regexp_extract / regexp_replace / rlike.

    Note: DuckDB regexp_replace is first-match unless the 'g' flag is
    given; Spark's replaces all — oracle passes 'g' explicitly."""
    p = table(spark, sf_dir, "part")
    return (
        p.filter(F.col("p_name").rlike("^[a-m]"))
        .select(
            "p_partkey",
            F.regexp_extract("p_brand", r"#(\d+)", 1).cast("bigint").alias("brand_num"),
            F.regexp_replace("p_name", "[aeiou]", "").alias("no_vowels"),
        )
    )


@register(
    "q_str_distance",
    oracle="""
        SELECT p_partkey,
               CAST(levenshtein(SPLIT_PART(p_name, ' ', 1),
                                SPLIT_PART(p_name, ' ', 2)) AS BIGINT) AS word_dist,
               CAST(levenshtein(LOWER(p_type), SPLIT_PART(p_name, ' ', 2)) AS BIGINT) AS type_dist
        FROM part
    """,
    family="strings",
    scale_notes="edit distance is the exact near-dup primitive; at scale it only runs on LSH candidate pairs, never all pairs",
)
def q_str_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Levenshtein distance between part-name words."""
    p = table(spark, sf_dir, "part")
    w1 = F.split_part(F.col("p_name"), F.lit(" "), F.lit(1))
    w2 = F.split_part(F.col("p_name"), F.lit(" "), F.lit(2))
    return p.select(
        "p_partkey",
        F.levenshtein(w1, w2).cast("bigint").alias("word_dist"),
        F.levenshtein(F.lower("p_type"), w2).cast("bigint").alias("type_dist"),
    )
