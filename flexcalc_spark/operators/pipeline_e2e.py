"""End-to-end curation pipeline as ONE composed query — the
"switch your whole pipeline to this engine" demonstration.

Every stage below exists as an individually-graded operator; this key
chains four of them exactly the way a production corpus build runs,
and the single DuckDB oracle certifies the COMPOSITION (stage
boundaries are where subtle bugs live: a dedup keyed on pre-filter
ids, a sampler seeing post-pack order, ...):

  1. quality gate  — cheap scan-side length/token bounds
     (q_corpus_filter's family);
  2. exact dedup   — md5 text-hash groupBy keeping the min doc_id
     (q_dedup_exact's shape);
  3. hash sampling — deterministic 50% keep by content md5
     (q_sample_split's rule);
  4. sequence pack — greedy running-sum binning into 512-token
     sequences per lang shard (q_pack_sequences' machinery);

emitting per (lang, bin) sequence occupancy. Because every stage is
deterministic under partitioning (integer bounds, hash keepers, hash
thresholds, integer running sums), the composed result is too.

Scale: stages 1-3 are scan-side or one narrow shuffle each; the
surviving corpus enters packing already reduced. At 100 TB the whole
chain is THREE shuffles (dedup hash, pack shard window, final rollup)
over a monotonically shrinking row stream — the composition adds no
join or state beyond its stages, which is the point of running it in
one engine instead of four glued systems.

Reference cite (mount empty, SURVEY §0): the stage list mirrors the
standard corpus-build recipe (quality -> dedup -> sample -> pack) of
public LLM-data pipelines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flexcalc_spark.registry import register
from flexcalc_spark.tables import table_parallel

E2E_MIN_CHARS, E2E_MAX_CHARS = 100, 2000
E2E_MIN_TOKS = 20
E2E_KEEP_HEX = "8"      # keep md5 first hex < '8'  (deterministic ~50%)
E2E_BUDGET = 512        # tokens per packed sequence


@register(
    "q_pipeline_e2e",
    oracle=f"""
        WITH gated AS (
            SELECT doc_id, lang, text,
                   CAST(len(string_split(lower(text), ' ')) AS BIGINT)
                       AS n_toks
            FROM documents
            WHERE n_chars >= {E2E_MIN_CHARS} AND n_chars <= {E2E_MAX_CHARS}
              AND len(string_split(lower(text), ' ')) >= {E2E_MIN_TOKS}
        ),
        deduped AS (
            SELECT MIN(doc_id) AS doc_id,
                   MIN(lang) AS lang,
                   MIN(n_toks) AS n_toks
            FROM gated GROUP BY md5(lower(text))
        ),
        sampled AS (
            SELECT * FROM deduped
            WHERE substr(md5('e2e:' || CAST(doc_id AS VARCHAR)), 1, 1)
                  < '{E2E_KEEP_HEX}'
        ),
        packed AS (
            SELECT lang, n_toks,
                   SUM(n_toks) OVER (PARTITION BY lang ORDER BY doc_id
                                     ROWS UNBOUNDED PRECEDING) AS cum
            FROM sampled
        )
        SELECT lang,
               CAST((cum - n_toks) // {E2E_BUDGET} AS BIGINT) AS bin_id,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_toks) AS BIGINT) AS total_tokens
        FROM packed
        GROUP BY lang, (cum - n_toks) // {E2E_BUDGET}
    """,
    family="pipeline",
    scale_notes=(
        "four individually-graded stages (quality gate -> exact dedup "
        "-> hash sample -> sequence pack) composed into ONE plan, "
        "certified end-to-end by a single oracle — the composition is "
        "where stage-boundary bugs live, and it costs exactly three "
        "shuffles at any scale (dedup hash groupBy, per-shard packing "
        "window, final rollup) over a monotonically shrinking stream. "
        "Every stage decision is a pure function of content (integer "
        "bounds, md5 keepers/thresholds, integer running sums), so the "
        "composed output is partitioning-independent too"
    ),
)
def q_pipeline_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-gate, dedup, subsample, and sequence-pack the corpus in
    one composed plan; per (lang, bin) packed-sequence occupancy."""
    from pyspark.sql.window import Window

    d = table_parallel(spark, sf_dir, "documents")
    n_toks = F.size(F.split(F.lower("text"), " ")).cast("bigint")
    gated = d.filter(
        (F.col("n_chars") >= E2E_MIN_CHARS)
        & (F.col("n_chars") <= E2E_MAX_CHARS)
    ).select("doc_id", "lang", "text", n_toks.alias("n_toks")).filter(
        F.col("n_toks") >= E2E_MIN_TOKS
    )
    deduped = (
        gated.groupBy(F.md5(F.lower("text").cast("binary")).alias("h"))
        .agg(
            F.min("doc_id").alias("doc_id"),
            F.min("lang").alias("lang"),
            F.min("n_toks").alias("n_toks"),
        )
        .drop("h")
    )
    sampled = deduped.filter(
        F.substring(
            F.md5(
                F.concat(
                    F.lit("e2e:"), F.col("doc_id").cast("string")
                ).cast("binary")
            ),
            1,
            1,
        )
        < E2E_KEEP_HEX
    )
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    packed = sampled.withColumn("cum", F.sum("n_toks").over(w))
    return (
        packed.withColumn(
            "bin_id",
            F.expr(f"(cum - n_toks) div {E2E_BUDGET}").cast("bigint"),
        )
        .groupBy("lang", "bin_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_toks").cast("bigint").alias("total_tokens"),
        )
    )
