"""Distributed 2-D filtered backprojection (recon-lite tier of the
reference's R25 reconstruction hook).

flexcalc's R25 delegates cone-beam FDK to ASTRA (GPU, unavailable
offline — ct.py keeps that documented stub). This module implements the
parallel-beam little sibling END TO END as RELATIONAL algebra, so the
reconstruction arithmetic itself is DuckDB-hash-graded like any other
key — no other engine we know renders FBP as an oracle-checkable SQL
plan:

1. phantom  : 32x32 deterministic image (disc + offset square), a pure
              expression over a pixel range — no fixture dependency;
2. forward  : nearest-bin Radon transform = (pixels x 24 angles)
              broadcast join, det-bin index in exact integer math,
              grid-sum groupBy (angle, det) -> the sinogram;
3. filter   : Ram-Lak spatial convolution = sinogram equi-joined with a
              95-row broadcast kernel table, integer products summed
              per (angle, out-bin) — the FFT-free exact form;
4. backproj : (pixels x angles) again, equi join on (angle, det),
              grid-sum groupBy pixel -> the reconstruction.

Determinism: cos/sin and kernel taps are quantized to 1e-9 integers
ONCE at import and embedded as literals in BOTH the Spark plan and the
oracle text, so every arithmetic step is exact BIGINT; detector
indexing offsets all operands positive before floor-division (Spark
`div` truncates toward zero, DuckDB `//` floors — they agree only on
non-negatives).

Scale: real volumes make this the canonical distributed-recon shape —
sinogram partitions by angle, the pixel/voxel grid tiles, and each
(tile, angle-block) pair accumulates locally before one grid-sum
shuffle keyed on the tile; work is the inherent O(|pixels| x |angles|)
of backprojection with no quadratic surprises. The convolution join is
|sinogram| x |kernel| with the kernel always broadcast.

Reference cite (mount empty, SURVEY §0): flexcalc R25
(process.py::fdk) per SURVEY §2.1; the Ram-Lak spatial taps are the
standard h(0)=1/4, h(odd k)=-1/(pi^2 k^2), h(even k)=0 discretization.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flexcalc_spark.registry import register

N = 32                 # image is N x N
C = N // 2             # rotation centre (pixel units)
N_ANGLES = 24          # projections over [0, pi)
DET = 96               # detector bins (covers the N*sqrt(2) diagonal)
DET_C = DET // 2
TRIG_GRID = 1_000_000_000        # 1e-9 quantization for cos/sin + kernel
OFF = 64 * TRIG_GRID             # positivity offset: |t_scaled| < 46e9
KHALF = 47                       # kernel taps k = -47..47

# (angle_idx, cos*1e9, sin*1e9) — embedded in BOTH engines' texts.
ANGLES: list[tuple[int, int, int]] = [
    (
        a,
        int(round(math.cos(math.pi * a / N_ANGLES) * TRIG_GRID)),
        int(round(math.sin(math.pi * a / N_ANGLES) * TRIG_GRID)),
    )
    for a in range(N_ANGLES)
]

# Ram-Lak spatial taps quantized to 1e-9.
KERNEL: list[tuple[int, int]] = [
    (
        k,
        int(round(0.25 * TRIG_GRID))
        if k == 0
        else (
            int(round(-1.0 / (math.pi * math.pi * k * k) * TRIG_GRID))
            if k % 2 != 0
            else 0
        ),
    )
    for k in range(-KHALF, KHALF + 1)
]
KERNEL = [(k, hq) for k, hq in KERNEL if hq != 0]  # evens carry nothing

_ANGLE_VALUES = ", ".join(f"({a}, {cq}, {sq})" for a, cq, sq in ANGLES)
_KERNEL_VALUES = ", ".join(f"({k}, {hq})" for k, hq in KERNEL)

# phantom: unit disc (r<=8) plus a 0.5 block, on the 1e-6 value grid
_PHANTOM = (
    "(CASE WHEN (x - 16) * (x - 16) + (y - 16) * (y - 16) <= 64 "
    "THEN 1000000 ELSE 0 END) + "
    "(CASE WHEN x >= 4 AND x < 10 AND y >= 20 AND y < 26 "
    "THEN 500000 ELSE 0 END)"
)

# detector bin for pixel (x, y) at angle (cq, sq): all-integer floor
# math, offset positive so div/floor agree across engines
_DET = (
    f"(((x - {C}) * cq + (y - {C}) * sq + {OFF} + {TRIG_GRID // 2}) "
    f"{{div}} {TRIG_GRID}) - {OFF // TRIG_GRID} + {DET_C}"
)


def _fbp_sql(div: str, range_rows: str) -> str:
    """The full FBP as one SQL text; ``div`` bridges div vs //."""
    det = _DET.format(div=div)
    return f"""
        WITH px AS (
            SELECT i {div} {N} AS y, i % {N} AS x FROM ({range_rows})
        ),
        ph AS (SELECT y, x, {_PHANTOM} AS pg FROM px),
        ang(a, cq, sq) AS (VALUES {_ANGLE_VALUES}),
        kern(k, hq) AS (VALUES {_KERNEL_VALUES}),
        sino AS (
            SELECT a, {det} AS d, CAST(SUM(pg) AS BIGINT) AS sg
            FROM ph CROSS JOIN ang GROUP BY a, {det}
        ),
        filt AS (
            SELECT a, d + k AS d_out,
                   CAST(SUM(sg * hq) AS BIGINT) AS fvi
            FROM sino CROSS JOIN kern GROUP BY a, d + k
        ),
        bp AS (
            SELECT ph.y, ph.x, CAST(SUM(filt.fvi) AS BIGINT) AS ri
            FROM ph CROSS JOIN ang
            JOIN filt ON filt.a = ang.a AND filt.d_out = {det}
            GROUP BY ph.y, ph.x
        )
        SELECT CAST(y AS BIGINT) AS y, CAST(x AS BIGINT) AS x,
               ROUND(CAST(ri AS DOUBLE) / 1000000000000000.0, 4) + 0.0
                   AS recon
        FROM bp
    """


@register(
    "q_ct_fbp",
    oracle=_fbp_sql("//", f"SELECT unnest(range(0, {N * N})) AS i"),
    family="ct",
    scale_notes=(
        "parallel-beam filtered backprojection as pure relational "
        "algebra — forward Radon, Ram-Lak convolution, and "
        "backprojection are three grid-sum aggregations over broadcast "
        "joins, every intermediate an exact BIGINT (trig and kernel "
        "taps quantized 1e-9 at import, shared verbatim with the "
        "oracle). At scale: sinogram partitions by angle, the voxel "
        "grid tiles, per-(tile, angle-block) partial sums merge in one "
        "shuffle keyed on tile — O(pixels x angles) inherent work, "
        "kernel always broadcast. The cone-beam FDK production path "
        "stays the documented ASTRA hook (ct.py R25); this key grades "
        "the recon arithmetic end-to-end"
    ),
)
def q_ct_fbp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reconstruct the 32x32 phantom from its 24-angle sinogram by
    filtered backprojection, entirely as grid-integer relational ops;
    returns (y, x, recon)."""
    # one SQL text drives Spark too: identical literal structure to the
    # oracle, dialect bridged by div vs // and range() syntax
    return spark.sql(
        _fbp_sql("div", f"SELECT id AS i FROM range({N * N})")
    )
