"""Math functions (SURVEY.md §2.2 "Scalar functions").

Transcendentals (exp/ln/log10/power) are rounded to 4 decimals: JVM
StrictMath and DuckDB's libm can disagree in the last ulp, and the
results are non-terminating decimals so the rounded values never tie.
sqrt/abs/sign/mod are IEEE-exact and emitted raw.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flexcalc_spark.registry import register
from flexcalc_spark.tables import table


@register(
    "q_math_funcs",
    oracle="""
        SELECT s_suppkey,
               ABS(s_acctbal) AS ab,
               CAST(CEIL(s_acctbal) AS BIGINT) AS ce,
               CAST(FLOOR(s_acctbal) AS BIGINT) AS fl,
               SQRT(ABS(s_acctbal)) AS sq,
               ROUND(LN(ABS(s_acctbal) + 1), 4) AS lg,
               ROUND(LOG10(ABS(s_acctbal) + 1), 4) AS l10,
               ROUND(EXP(s_acctbal / 10000), 4) AS ex,
               ROUND(POWER(ABS(s_acctbal), 0.5) * POWER(ABS(s_acctbal), 0.25), 4) AS pw,
               s_suppkey % 7 AS md,
               CAST(SIGN(s_acctbal) AS BIGINT) AS sg
        FROM supplier
    """,
    family="math",
)
def q_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """abs/ceil/floor/sqrt/ln/log10/exp/power/mod/sign."""
    s = table(spark, sf_dir, "supplier")
    bal = F.col("s_acctbal")
    abal = F.abs(bal)
    return s.select(
        "s_suppkey",
        abal.alias("ab"),
        F.ceil(bal).cast("bigint").alias("ce"),
        F.floor(bal).cast("bigint").alias("fl"),
        F.sqrt(abal).alias("sq"),
        F.round(F.log(abal + 1), 4).alias("lg"),
        F.round(F.log10(abal + 1), 4).alias("l10"),
        F.round(F.exp(bal / 10000), 4).alias("ex"),
        F.round(F.pow(abal, 0.5) * F.pow(abal, 0.25), 4).alias("pw"),
        (F.col("s_suppkey") % 7).alias("md"),
        F.signum(bal).cast("bigint").alias("sg"),
    )
