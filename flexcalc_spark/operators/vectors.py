"""Similarity search over embeddings (north-star §2.3).

Three tiers, mirroring a production ANN stack:
- q_knn_cosine — brute-force exact top-k (the correctness baseline,
  oracle-checked);
- q_knn_lsh — random-hyperplane LSH bucketing (candidates via band
  equi-join; the horizontal-scale path);
- q_knn_ivf — inverted-file style: coarse centroids, probe the nearest
  nprobe cells only (the partition-pruning path).
Recall of the approximate tiers vs the exact tier is asserted in
tests/test_recall.py.

Dot products are JVM-native HOF folds in double precision — no Python,
no explode, no shuffle beyond the candidate join.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from flexcalc_spark.registry import register
from flexcalc_spark.tables import table, table_parallel

K_NEIGHBORS = 5
N_PROBES = 10           # probe set = vec_id < 10
LSH_PLANES = 16         # hyperplanes -> 4 bands of 4 bits
LSH_BANDS = 4
IVF_NPROBE = 3
EMB_DIM = 64


def _dot(a: str, b: str) -> Column:
    return F.expr(
        f"aggregate(zip_with(transform({a}, x -> CAST(x AS DOUBLE)),"
        f" transform({b}, x -> CAST(x AS DOUBLE)), (x, y) -> x * y),"
        " CAST(0.0 AS DOUBLE), (s, x) -> s + x)"
    )


def _cosine(a: str, b: str) -> Column:
    return _dot(a, b) / (F.sqrt(_dot(a, a)) * F.sqrt(_dot(b, b)))


_KNN_ORACLE_COS = """
    list_dot_product(CAST(p.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[]))
    / (sqrt(list_dot_product(CAST(p.embedding AS DOUBLE[]), CAST(p.embedding AS DOUBLE[])))
       * sqrt(list_dot_product(CAST(c.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[]))))
"""


@register(
    "q_knn_cosine",
    oracle=f"""
        SELECT probe_id, neighbor_id, ROUND(cos, 4) AS cos, rank
        FROM (
            SELECT p.vec_id AS probe_id, c.vec_id AS neighbor_id,
                   {_KNN_ORACLE_COS} AS cos,
                   CAST(ROW_NUMBER() OVER (
                       PARTITION BY p.vec_id
                       ORDER BY {_KNN_ORACLE_COS} DESC, c.vec_id) AS BIGINT) AS rank
            FROM embeddings p JOIN embeddings c ON p.vec_id < {N_PROBES}
                                               AND c.vec_id != p.vec_id
        ) WHERE rank <= {K_NEIGHBORS}
    """,
    family="vectors",
    scale_notes="brute-force exact top-k: probe side broadcast (tiny), corpus scanned once, per-probe heap via WindowGroupLimit — the correctness baseline every ANN tier is measured against",
)
def q_knn_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-5 neighbors for 10 probe vectors."""
    e = table_parallel(spark, sf_dir, "embeddings")
    p = e.filter(F.col("vec_id") < N_PROBES).select(
        F.col("vec_id").alias("probe_id"), F.col("embedding").alias("p_emb")
    )
    c = e.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("c_emb"))
    cos = _cosine("p_emb", "c_emb")
    w = Window.partitionBy("probe_id").orderBy(F.col("cos").desc(), "neighbor_id")
    return (
        F.broadcast(p)
        .join(c, F.col("probe_id") != F.col("neighbor_id"))
        .select("probe_id", "neighbor_id", cos.alias("cos"))
        .withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= K_NEIGHBORS)
        .select("probe_id", "neighbor_id", F.round("cos", 4).alias("cos"), "rank")
    )


def _hyperplanes() -> list[list[float]]:
    """Deterministic random hyperplanes (fixed seed — stable across runs,
    sessions, and the driver's grading)."""
    rng = np.random.RandomState(20260813)
    return rng.standard_normal((LSH_PLANES, EMB_DIM)).tolist()


def lsh_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, embedding, band, band_key): sign-bit signature over fixed
    hyperplanes, split into bands; equal band_key => candidate bucket."""
    e = table_parallel(spark, sf_dir, "embeddings")
    planes = _hyperplanes()
    bits = [
        F.when(
            _dot("embedding", f"array({', '.join(repr(v) + 'D' for v in plane)})") > 0, 1
        ).otherwise(0)
        for plane in planes
    ]
    bits_per_band = LSH_PLANES // LSH_BANDS
    band_keys = []
    for bnd in range(LSH_BANDS):
        key = F.lit(0)
        for i in range(bits_per_band):
            key = key * 2 + bits[bnd * bits_per_band + i]
        band_keys.append(key)
    return e.select(
        "vec_id",
        "embedding",
        F.posexplode(F.array(*band_keys)).alias("band", "band_key"),
    )


@register(
    "q_knn_lsh",
    oracle=None,  # seeded-hyperplane buckets: no SQL twin (rows-only);
    # recall vs q_knn_cosine asserted in tests/test_recall.py
    family="vectors",
    scale_notes="random-hyperplane LSH: candidates = equi join on (band, band_key) — shuffle O(n*bands); exact re-score only inside buckets. Buckets ARE the partition key at 100 TB",
)
def q_knn_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed approximate top-5: exact cosine, but only within
    shared hyperplane-sign buckets."""
    b = lsh_bucketed(spark, sf_dir)
    p = b.filter(F.col("vec_id") < N_PROBES).select(
        F.col("vec_id").alias("probe_id"),
        F.col("embedding").alias("p_emb"),
        "band",
        "band_key",
    )
    c = b.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("c_emb"),
        "band",
        "band_key",
    )
    # Dedup candidates on the ID PAIR only (narrow shuffle), then attach
    # embeddings — shipping 2x64-float arrays through the distinct would
    # inflate candidate shuffle volume ~64x (same rule as q_dedup_minhash).
    cand_ids = (
        p.select("probe_id", "band", "band_key")
        .join(c.select("neighbor_id", "band", "band_key"), ["band", "band_key"])
        .filter(F.col("probe_id") != F.col("neighbor_id"))
        .select("probe_id", "neighbor_id")
        .distinct()
    )
    emb = table_parallel(spark, sf_dir, "embeddings")
    cand = (
        cand_ids.join(
            F.broadcast(emb.select(F.col("vec_id").alias("probe_id"),
                                   F.col("embedding").alias("p_emb"))),
            "probe_id",
        )
        .join(
            emb.select(F.col("vec_id").alias("neighbor_id"),
                       F.col("embedding").alias("c_emb")),
            "neighbor_id",
        )
    )
    cos = _cosine("p_emb", "c_emb")
    w = Window.partitionBy("probe_id").orderBy(F.col("cos").desc(), "neighbor_id")
    return (
        cand.select("probe_id", "neighbor_id", cos.alias("cos"))
        .withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= K_NEIGHBORS)
        .select("probe_id", "neighbor_id", F.round("cos", 4).alias("cos"), "rank")
    )


@register(
    "q_centroids",
    oracle="""
        SELECT label, pos, ROUND(AVG(v), 4) + 0.0 AS centroid_val
        FROM (
            SELECT label,
                   unnest(range(1, len(embedding) + 1)) AS pos,
                   unnest(CAST(embedding AS DOUBLE[])) AS v
            FROM embeddings
        )
        GROUP BY label, pos
    """,
    family="vectors",
    scale_notes="posexplode -> (label, dim) agg: shuffle keyed on label x 64 dims, perfectly balanced",
)
def q_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding centroid, one row per (label, dimension).

    Emitted exploded (not re-collected) so the oracle hash is over
    scalars, and rounded against float-sum accumulation-order drift."""
    e = table(spark, sf_dir, "embeddings")
    return (
        e.select(
            "label",
            F.posexplode(F.expr("transform(embedding, x -> CAST(x AS DOUBLE))")).alias(
                "pos0", "v"
            ),
        )
        .select("label", (F.col("pos0") + 1).cast("bigint").alias("pos"), "v")
        .groupBy("label", "pos")
        .agg((F.round(F.avg("v"), 4) + 0.0).alias("centroid_val"))
    )


@register(
    "q_knn_ivf",
    oracle=None,  # depends on q_centroids-derived cell assignment (rows-only);
    # recall vs q_knn_cosine asserted in tests/test_recall.py
    family="vectors",
    scale_notes="IVF: coarse quantize to label-centroid cells, probe nprobe=3 nearest cells — at 100 TB the corpus is PARTITIONED BY cell so probing prunes file reads (partition pruning), not just comparisons",
)
def q_knn_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN: search only the nprobe nearest centroid cells.

    Uses the per-label centroids as the coarse codebook (stand-in for a
    k-means codebook; same plan shape)."""
    e = table(spark, sf_dir, "embeddings")
    cents = (
        e.select(
            "label",
            F.posexplode(F.expr("transform(embedding, x -> CAST(x AS DOUBLE))")).alias(
                "pos", "v"
            ),
        )
        .groupBy("label", "pos")
        .agg(F.avg("v").alias("v"))
        .groupBy("label")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "v"))).alias("pairs"))
        .select("label", F.expr("transform(pairs, p -> p.v)").alias("centroid"))
    )
    p = e.filter(F.col("vec_id") < N_PROBES).select(
        F.col("vec_id").alias("probe_id"), F.col("embedding").alias("p_emb")
    )
    # nearest nprobe cells per probe (25-cell codebook -> broadcast)
    cell_cos = _cosine("p_emb", "centroid")
    wc = Window.partitionBy("probe_id").orderBy(F.col("cell_cos").desc(), "label")
    probe_cells = (
        p.crossJoin(F.broadcast(cents))
        .select("probe_id", "p_emb", "label", cell_cos.alias("cell_cos"))
        .withColumn("cr", F.row_number().over(wc))
        .filter(F.col("cr") <= IVF_NPROBE)
        .select("probe_id", "p_emb", "label")
    )
    c = e.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("c_emb"), "label")
    cos = _cosine("p_emb", "c_emb")
    w = Window.partitionBy("probe_id").orderBy(F.col("cos").desc(), "neighbor_id")
    return (
        probe_cells.join(c, "label")
        .filter(F.col("probe_id") != F.col("neighbor_id"))
        .select("probe_id", "neighbor_id", cos.alias("cos"))
        .withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= K_NEIGHBORS)
        .select("probe_id", "neighbor_id", F.round("cos", 4).alias("cos"), "rank")
    )


@register(
    "q_vector_quantize",
    oracle="""
        WITH b AS (
            SELECT vec_id, embedding,
                   CAST(list_min(embedding) AS DOUBLE) AS vmin,
                   CAST(list_max(embedding) AS DOUBLE) AS vmax
            FROM embeddings
        )
        SELECT vec_id, vmin, vmax,
               CASE WHEN vmax > vmin
                    THEN list_transform(embedding,
                         x -> LEAST(CAST(floor((CAST(x AS DOUBLE) - vmin)
                                  * 255.0 / (vmax - vmin)) AS BIGINT),
                              CAST(255 AS BIGINT)))
                    ELSE list_transform(embedding, x -> CAST(0 AS BIGINT))
               END AS codes
        FROM b
    """,
    family="vectors",
    scale_notes="per-vector uint8 scalar quantization (4x smaller than float32, the standard ANN memory/IO trade): pure per-row HOF in codegen, no shuffle — at 100 TB the quantized corpus is what the LSH/IVF tiers scan, with exact float re-score only on the final candidates; floor-based bucketing (not round) keeps codes engine-deterministic (round() dialect drift, registry rules)",
)
def q_vector_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-quantize each embedding to 0..255 integer codes over the
    vector's own [min, max] range (uint8 compression for ANN serving)."""
    e = table_parallel(spark, sf_dir, "embeddings")
    b = e.select(
        "vec_id",
        "embedding",
        F.expr("CAST(array_min(embedding) AS DOUBLE)").alias("vmin"),
        F.expr("CAST(array_max(embedding) AS DOUBLE)").alias("vmax"),
    )
    codes = F.when(
        F.col("vmax") > F.col("vmin"),
        F.expr(
            "transform(embedding, x -> LEAST(CAST(floor((CAST(x AS DOUBLE)"
            " - vmin) * 255.0 / (vmax - vmin)) AS BIGINT),"
            " CAST(255 AS BIGINT)))"
        ),
    ).otherwise(F.expr("transform(embedding, x -> CAST(0 AS BIGINT))"))
    return b.select("vec_id", "vmin", "vmax", codes.alias("codes"))
