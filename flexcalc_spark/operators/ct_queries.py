"""Oracle-graded CT analysis queries (SURVEY.md §2.1 R-table, relational
renderings).

flexcalc's analysis layer operates on dense volumes; its operators are,
relationally, aggregations over a long-form voxel table (SURVEY §1.2).
These keys build a deterministic voxel table from the ``embeddings``
fixture (z = vec_id, (y, x) = dimension index unpacked 8x8, v = value) —
so the DuckDB oracle sees the identical "volume" and every CT analysis
op is hash-checked like any relational key. The binary slice-blob
pipeline (mapInPandas kernels) lives in flexcalc_spark/ct.py with
property tests; these queries check the ANALYSIS semantics.

Reference cites (mount empty, module::symbol per SURVEY §0):
R2 process.py::preprocess, R9 ::bounding_box, R11 ::soft_threshold,
R18 analyze.py::histogram, R20 ::centre, R21 ::moment2.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from flexcalc_spark.registry import register
from flexcalc_spark.tables import table_parallel

# DuckDB-side voxel-table constructor (zipped unnests align element/index)
_VOXELS_SQL = """
    SELECT vec_id AS z,
           unnest(range(0, 64)) // 8 AS y,
           unnest(range(0, 64)) % 8 AS x,
           unnest(CAST(embedding AS DOUBLE[])) AS v
    FROM embeddings
"""


def voxels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark-side voxel table, identical to _VOXELS_SQL.

    table_parallel: the single-file fixture scan would otherwise run the
    64x explode + decimal aggregations downstream on ONE core (measured
    3x on q_ct_moments). Decimal sums keep every consumer's result
    partitioning-independent, so the repartition is safe for all ct
    keys."""
    e = table_parallel(spark, sf_dir, "embeddings")
    return e.select(
        F.col("vec_id").alias("z"),
        F.posexplode(F.expr("transform(embedding, x -> CAST(x AS DOUBLE))")).alias(
            "pos0", "v"
        ),
    ).select(
        "z",
        (F.col("pos0") / 8).cast("bigint").alias("y"),
        (F.col("pos0") % 8).cast("bigint").alias("x"),
        "v",
    )


_DSUM = "CAST(SUM(CAST({expr} AS DECIMAL(18,6))) AS DOUBLE)"


def _dsum_sql(expr: str) -> str:
    return _DSUM.format(expr=expr)


def _dsum_col(col):
    return F.sum(col.cast("decimal(18,6)")).cast("double")


@register(
    "q_ct_centre",
    oracle=f"""
        SELECT ROUND({_dsum_sql('ABS(v) * z')} / {_dsum_sql('ABS(v)')}, 4) AS cz,
               ROUND({_dsum_sql('ABS(v) * y')} / {_dsum_sql('ABS(v)')}, 4) AS cy,
               ROUND({_dsum_sql('ABS(v) * x')} / {_dsum_sql('ABS(v)')}, 4) AS cx
        FROM ({_VOXELS_SQL})
    """,
    family="ct",
    scale_notes="centre of mass (R20) = three weighted-centroid aggs in one pass over the voxel scan; decimal-cast sums per the repo determinism rule",
)
def q_ct_centre(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intensity-weighted centroid — flexcalc analyze.py::centre (R20)."""
    vx = voxels(spark, sf_dir)
    w = F.abs(F.col("v"))
    return vx.agg(
        F.round(_dsum_col(w * F.col("z")) / _dsum_col(w), 4).alias("cz"),
        F.round(_dsum_col(w * F.col("y")) / _dsum_col(w), 4).alias("cy"),
        F.round(_dsum_col(w * F.col("x")) / _dsum_col(w), 4).alias("cx"),
    )


@register(
    "q_ct_histogram",
    oracle=f"""
        SELECT CAST(FLOOR(v / 0.05) AS BIGINT) AS bucket, COUNT(*) AS cnt
        FROM ({_VOXELS_SQL})
        GROUP BY 1
    """,
    family="ct",
    scale_notes="volume histogram (R18): width-bucket groupBy, map-side combine makes it scan-bound",
)
def q_ct_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume histogram — flexcalc analyze.py::histogram (R18)."""
    vx = voxels(spark, sf_dir)
    return vx.groupBy(
        F.floor(F.col("v") / 0.05).cast("bigint").alias("bucket")
    ).agg(F.count(F.lit(1)).alias("cnt"))


@register(
    "q_ct_bbox",
    oracle=f"""
        SELECT CAST(MIN(z) AS BIGINT) AS z0, CAST(MAX(z) AS BIGINT) AS z1,
               CAST(MIN(y) AS BIGINT) AS y0, CAST(MAX(y) AS BIGINT) AS y1,
               CAST(MIN(x) AS BIGINT) AS x0, CAST(MAX(x) AS BIGINT) AS x1,
               COUNT(*) AS n_content
        FROM ({_VOXELS_SQL})
        WHERE ABS(v) > 0.2
    """,
    family="ct",
    scale_notes="autocrop bbox (R9): filtered min/max aggs; the filter pushes into the scan",
)
def q_ct_bbox(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content bounding box — flexcalc process.py::bounding_box (R9)."""
    vx = voxels(spark, sf_dir).filter(F.abs(F.col("v")) > 0.2)
    return vx.agg(
        F.min("z").cast("bigint").alias("z0"),
        F.max("z").cast("bigint").alias("z1"),
        F.min("y").cast("bigint").alias("y0"),
        F.max("y").cast("bigint").alias("y1"),
        F.min("x").cast("bigint").alias("x0"),
        F.max("x").cast("bigint").alias("x1"),
        F.count(F.lit(1)).alias("n_content"),
    )


@register(
    "q_ct_threshold",
    oracle=f"""
        SELECT CASE WHEN v > 0.1 THEN 'material'
                    WHEN v > -0.1 THEN 'soft' ELSE 'air' END AS segment,
               COUNT(*) AS cnt,
               ROUND(CAST(SUM(CAST(v AS DECIMAL(18,6))) AS DOUBLE), 4) AS sum_v
        FROM ({_VOXELS_SQL})
        GROUP BY 1
    """,
    family="ct",
    scale_notes="soft threshold segmentation (R11): CASE WHEN bands + hash agg",
)
def q_ct_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Threshold segmentation — flexcalc process.py::soft_threshold (R11)."""
    vx = voxels(spark, sf_dir)
    seg = (
        F.when(F.col("v") > 0.1, "material")
        .when(F.col("v") > -0.1, "soft")
        .otherwise("air")
        .alias("segment")
    )
    return vx.groupBy(seg).agg(
        F.count(F.lit(1)).alias("cnt"),
        F.round(F.sum(F.col("v").cast("decimal(18,6)")).cast("double"), 4).alias("sum_v"),
    )


@register(
    "q_ct_moments",
    oracle=f"""
        WITH s AS (
            SELECT {_dsum_sql('ABS(v)')} AS sw,
                   {_dsum_sql('ABS(v) * z')} AS swz,
                   {_dsum_sql('ABS(v) * y')} AS swy,
                   {_dsum_sql('ABS(v) * x')} AS swx,
                   {_dsum_sql('ABS(v) * z * z')} AS swzz,
                   {_dsum_sql('ABS(v) * y * y')} AS swyy,
                   {_dsum_sql('ABS(v) * x * x')} AS swxx,
                   {_dsum_sql('ABS(v) * y * x')} AS swyx
            FROM ({_VOXELS_SQL})
        )
        SELECT ROUND(swzz / sw - (swz / sw) * (swz / sw), 4) AS m2_zz,
               ROUND(swyy / sw - (swy / sw) * (swy / sw), 4) AS m2_yy,
               ROUND(swxx / sw - (swx / sw) * (swx / sw), 4) AS m2_xx,
               ROUND(swyx / sw - (swy / sw) * (swx / sw), 4) + 0.0 AS m2_yx
        FROM s
    """,
    family="ct",
    scale_notes="2nd moments (R21): ONE pass of raw decimal moments (sw, swa, swab), centrals derived on the 8-value aggregate — no second scan, no broadcast of the mean; eigendecomposition for principal axes happens driver-side on the 3x3 result",
)
def q_ct_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted second central moments — flexcalc analyze.py::moment2
    (R21). The 3x3 moment matrix's eigenvectors (orientation) are a
    driver-side numpy call on this query's output.

    Raw-moment identity m2_ab = S_wab/S_w - (S_wa/S_w)(S_wb/S_w): the
    eight decimal sums are exact and order-independent, and the central
    derivation is scalar double arithmetic written identically in the
    oracle, so results are bit-equal on both engines. No cancellation
    hazard here: coordinates are bounded (z = vec_id, x/y in 0..7) and
    variances are far from zero."""
    vx = voxels(spark, sf_dir)
    w = F.abs(F.col("v"))
    s = vx.agg(
        _dsum_col(w).alias("sw"),
        _dsum_col(w * F.col("z")).alias("swz"),
        _dsum_col(w * F.col("y")).alias("swy"),
        _dsum_col(w * F.col("x")).alias("swx"),
        _dsum_col(w * F.col("z") * F.col("z")).alias("swzz"),
        _dsum_col(w * F.col("y") * F.col("y")).alias("swyy"),
        _dsum_col(w * F.col("x") * F.col("x")).alias("swxx"),
        _dsum_col(w * F.col("y") * F.col("x")).alias("swyx"),
    )

    def m2(sab: str, sa: str, sb: str):
        return (
            F.col(sab) / F.col("sw")
            - (F.col(sa) / F.col("sw")) * (F.col(sb) / F.col("sw"))
        )

    return s.select(
        F.round(m2("swzz", "swz", "swz"), 4).alias("m2_zz"),
        F.round(m2("swyy", "swy", "swy"), 4).alias("m2_yy"),
        F.round(m2("swxx", "swx", "swx"), 4).alias("m2_xx"),
        (F.round(m2("swyx", "swy", "swx"), 4) + 0.0).alias("m2_yx"),
    )


@register(
    "q_ct_preprocess",
    oracle=f"""
        WITH vx AS ({_VOXELS_SQL}),
        ref AS (
            SELECT z, MIN(v) AS dark, MAX(v) AS flat FROM vx GROUP BY z
        )
        SELECT vx.z, vx.y, vx.x,
               ROUND(-LN((vx.v - ref.dark + 1e-6) / (ref.flat - ref.dark + 1e-6)), 4) + 0.0 AS v_log
        FROM vx JOIN ref ON vx.z = ref.z
    """,
    family="ct",
    scale_notes="flat/dark normalize + -log (R2) as per-slice window aggs + per-row math; the blob-pipeline twin is ct.preprocess (mapInPandas)",
)
def q_ct_preprocess(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flat-field + log transform — flexcalc process.py::preprocess (R2),
    with per-slice min/max standing in for dark/flat frames."""
    vx = voxels(spark, sf_dir)
    wz = Window.partitionBy("z")
    dark = F.min("v").over(wz)
    flat = F.max("v").over(wz)
    v_log = -F.log((F.col("v") - dark + 1e-6) / (flat - dark + 1e-6))
    return vx.select("z", "y", "x", (F.round(v_log, 4) + 0.0).alias("v_log"))
