"""Pure-SQL API surface: the engine's spark.sql entry point.

Every other graded key drives the DataFrame API; this key proves the
SQL-first path a migrating user actually types — register the fixture
scans as temp views, run one ANSI query text through ``spark.sql`` —
lands on the same Catalyst plan (broadcast dims, partial aggregates,
TakeOrderedAndProject) as its DataFrame twin would. Shape is TPC-H
Q3-like: top-10 urgent orders by discounted revenue.

Determinism: revenue rides the 1e-6 integer-grid sum (registry rules)
written directly in the SQL text; LIMIT carries the full tiebreak.

Reference cite (mount empty, SURVEY §0): the public flexcalc toolbox
has no SQL surface — this key exists because a Spark-native engine
exposes one for free and users expect it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from flexcalc_spark.registry import register
from flexcalc_spark.tables import table

_REVENUE = (
    "ROUND(CAST(SUM(CAST(FLOOR((l_extendedprice * (1 - l_discount))"
    " * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0, 4)"
)


@register(
    "q_sql_tpch3",
    oracle=f"""
        SELECT l_orderkey,
               {_REVENUE} AS revenue,
               o_orderpriority
        FROM orders JOIN lineitem ON l_orderkey = o_orderkey
        WHERE o_orderpriority = '1-URGENT'
        GROUP BY l_orderkey, o_orderpriority
        ORDER BY revenue DESC, l_orderkey
        LIMIT 10
    """,
    family="sql",
    scale_notes=(
        "the SQL entry point: temp views over the same scans, one ANSI "
        "text through spark.sql — Catalyst produces the identical "
        "physical plan the DataFrame twin gets (filter pushdown on the "
        "dimension predicate, partial+final aggregation, "
        "TakeOrderedAndProject for the LIMIT), so SQL users pay zero "
        "penalty. The revenue sum is the 1e-6 integer grid written "
        "directly in SQL — the determinism rules are dialect-portable"
    ),
)
def q_sql_tpch3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-like top-10 urgent-order revenue, expressed purely as
    SQL text over registered temp views."""
    table(spark, sf_dir, "orders").createOrReplaceTempView("v_orders")
    table(spark, sf_dir, "lineitem").createOrReplaceTempView("v_lineitem")
    return spark.sql(
        f"""
        SELECT l_orderkey,
               {_REVENUE} AS revenue,
               o_orderpriority
        FROM v_orders JOIN v_lineitem ON l_orderkey = o_orderkey
        WHERE o_orderpriority = '1-URGENT'
        GROUP BY l_orderkey, o_orderpriority
        ORDER BY revenue DESC, l_orderkey
        LIMIT 10
        """
    )


_Q10_BODY = f"""
    SELECT c_custkey, c_name, n_name,
           {_REVENUE} AS revenue
    FROM {{c}} JOIN {{o}} ON c_custkey = o_custkey
         JOIN {{l}} ON l_orderkey = o_orderkey
         JOIN {{n}} ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
"""


@register(
    "q_sql_tpch10",
    oracle=_Q10_BODY.format(
        c="customer", o="orders", l="lineitem", n="nation"
    ),
    family="sql",
    scale_notes=(
        "TPC-H Q10 shape through the SQL surface: a 4-table join where "
        "Catalyst's join ordering + AQE pick the physical strategy — "
        "nation broadcasts (25 rows), the returnflag filter pushes into "
        "the lineitem scan cutting the fact side ~3x before the "
        "orderkey shuffle join, and the customer attach rides a "
        "custkey shuffle that AQE can flip to broadcast at small "
        "scale. TakeOrderedAndProject caps the result at 20 rows per "
        "partition before the driver merge — no global sort. The "
        "revenue grid-sum and the LIMIT tiebreak are written directly "
        "in the SQL text (dialect-portable determinism)"
    ),
)
def q_sql_tpch10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10-like: top-20 customers by returned-item revenue with
    nation attached, expressed purely as SQL text."""
    for t in ("customer", "orders", "lineitem", "nation"):
        table(spark, sf_dir, t).createOrReplaceTempView(f"v_{t}")
    return spark.sql(
        _Q10_BODY.format(
            c="v_customer", o="v_orders", l="v_lineitem", n="v_nation"
        )
    )
