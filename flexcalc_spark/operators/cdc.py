"""Change-data-capture / MERGE semantics: apply an upsert batch to a
snapshot.

The engine-completeness shape every warehouse user expects (``MERGE
INTO target USING changes``): a snapshot table plus a change batch of
inserts / updates / deletes keyed by primary key, producing the next
snapshot. Spark SQL has no built-in MERGE against plain parquet, so the
operator expresses the standard relational decomposition:

    next = (snapshot ⟕ changes) keeping unmatched + updated rows,
           minus deletes, union inserts

which is exactly what table formats (copy-on-write) execute underneath.

The change batch here is DERIVED deterministically from the snapshot
itself (keys mod 10: 3 -> update price +10%, 7 -> delete; inserts are
key-shifted clones) so the operator needs no extra fixture and the
oracle can rebuild the identical batch in SQL.

Determinism: update price is a single FP product (bit-identical both
engines, emitted raw per registry rules); all keys/op counts BIGINT.

Reference cite (mount empty, SURVEY §0): public flexcalc has no table
maintenance surface; MERGE decomposition follows the standard
warehouse/lakehouse copy-on-write formulation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flexcalc_spark.registry import register
from flexcalc_spark.tables import table, table_parallel


@register(
    "q_cdc_upsert",
    oracle="""
        WITH upd AS (
            SELECT o_orderkey, o_totalprice * 1.1 AS price
            FROM orders WHERE o_orderkey % 10 = 3
        ),
        del AS (
            SELECT o_orderkey FROM orders WHERE o_orderkey % 10 = 7
        ),
        ins AS (
            SELECT o_orderkey + (SELECT MAX(o_orderkey) FROM orders)
                       AS o_orderkey,
                   o_totalprice AS price
            FROM orders WHERE o_orderkey % 10 = 5
        ),
        kept AS (
            SELECT s.o_orderkey,
                   CASE WHEN u.o_orderkey IS NOT NULL THEN u.price
                        ELSE s.o_totalprice END AS price
            FROM orders s
            LEFT JOIN upd u USING (o_orderkey)
            WHERE s.o_orderkey NOT IN (SELECT o_orderkey FROM del)
        )
        SELECT o_orderkey, price FROM kept
        UNION ALL
        SELECT o_orderkey, price FROM ins
    """,
    family="cdc",
    scale_notes=(
        "MERGE INTO decomposition against a plain-parquet snapshot: the "
        "change batch (daily CDC feed, MBs-GBs) BROADCASTS onto the "
        "snapshot scan for both the update join and the delete "
        "anti-join, so the 100 TB snapshot is rewritten in one pass "
        "with zero wide shuffles — the same physical plan a "
        "copy-on-write lakehouse MERGE produces. At petabyte scale the "
        "win is partition-pruned rewrites: partition the snapshot so "
        "the touched-partition set, not the table, is what re-writes"
    ),
)
def q_cdc_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply a derived insert/update/delete batch to the orders
    snapshot (MERGE semantics) and return the next snapshot's
    (key, price) state."""
    s = table_parallel(spark, sf_dir, "orders")
    upd = s.filter(F.col("o_orderkey") % 10 == 3).select(
        "o_orderkey", (F.col("o_totalprice") * 1.1).alias("uprice")
    )
    dele = s.filter(F.col("o_orderkey") % 10 == 7).select("o_orderkey")
    maxk = s.agg(F.max("o_orderkey").alias("mk"))
    ins = (
        s.filter(F.col("o_orderkey") % 10 == 5)
        .crossJoin(F.broadcast(maxk))
        .select(
            (F.col("o_orderkey") + F.col("mk")).alias("o_orderkey"),
            F.col("o_totalprice").alias("price"),
        )
    )
    kept = (
        s.join(F.broadcast(upd), "o_orderkey", "left")
        .join(F.broadcast(dele), "o_orderkey", "left_anti")
        .select(
            "o_orderkey",
            F.coalesce("uprice", "o_totalprice").alias("price"),
        )
    )
    return kept.unionAll(ins)
