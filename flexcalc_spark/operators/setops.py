"""Set operators (SURVEY.md §2.2 "Set operations").

Reference parity: the batch scheduler's merge nodes
(/root/reference/flexcalc/batch.py::scheduler, R24) combine block streams
from multiple datasets — relationally a UNION. INTERSECT/EXCEPT compile
to left-semi/left-anti joins in Catalyst (free decorrelation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flexcalc_spark.registry import register
from flexcalc_spark.tables import table


@register(
    "q_set_union",
    oracle="""
        SELECT nk, COUNT(*) AS cnt
        FROM (SELECT c_nationkey AS nk FROM customer
              UNION ALL
              SELECT s_nationkey AS nk FROM supplier)
        GROUP BY nk
    """,
    family="setops",
    scale_notes="UNION ALL is a free concat (no shuffle); the groupBy shuffles once",
)
def q_set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL + aggregation (merge-node analogue, R24)."""
    c = table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nk"))
    s = table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nk"))
    return c.unionByName(s).groupBy("nk").agg(F.count(F.lit(1)).alias("cnt"))


@register(
    "q_set_intersect",
    oracle="""
        SELECT c_nationkey AS nk FROM customer
        INTERSECT
        SELECT s_nationkey AS nk FROM supplier
    """,
    family="setops",
    scale_notes="INTERSECT -> left-semi join on distinct inputs",
)
def q_set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct semantics)."""
    c = table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nk"))
    s = table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nk"))
    return c.intersect(s)


@register(
    "q_set_except",
    oracle="""
        SELECT c_nationkey AS nk FROM customer
        EXCEPT
        SELECT s_nationkey AS nk FROM supplier
    """,
    family="setops",
    scale_notes="EXCEPT -> left-anti join",
)
def q_set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct semantics) — nations with customers but no suppliers."""
    c = table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nk"))
    s = table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nk"))
    return c.subtract(s)


@register(
    "q_distinct",
    oracle="SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
    family="setops",
    scale_notes="distinct = hash agg on the full projection; partial agg collapses duplicates map-side",
)
def q_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT projection."""
    li = table(spark, sf_dir, "lineitem")
    return li.select("l_returnflag", "l_linestatus").dropDuplicates()
