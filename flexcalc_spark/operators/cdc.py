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


@register(
    "q_scd2_pit",
    oracle="""
        WITH versions AS (
            SELECT o_custkey AS custkey,
                   o_orderpriority AS prio,
                   epoch_us(o_orderdate) AS vfrom,
                   o_orderkey AS vkey,
                   LEAD(epoch_us(o_orderdate)) OVER (
                       PARTITION BY o_custkey
                       ORDER BY epoch_us(o_orderdate), o_orderkey
                   ) AS vto
            FROM orders
        ),
        fact AS (
            SELECT l.l_orderkey, l.l_extendedprice,
                   epoch_us(l.l_shipdate) AS ship_us,
                   o.o_custkey AS custkey
            FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        ),
        pit AS (
            SELECT f.l_orderkey, f.l_extendedprice,
                   COALESCE(v.prio, 'NONE') AS prio_at_ship
            FROM fact f
            LEFT JOIN versions v
              ON v.custkey = f.custkey
             AND f.ship_us >= v.vfrom
             AND (v.vto IS NULL OR f.ship_us < v.vto)
        )
        SELECT prio_at_ship,
               CAST(COUNT(*) AS BIGINT) AS n_items,
               ROUND(CAST(SUM(CAST(floor(l_extendedprice * 1000000.0 + 0.5)
                                   AS BIGINT)) AS DOUBLE) / 1000000.0, 4)
                   AS revenue
        FROM pit GROUP BY prio_at_ship
    """,
    family="cdc",
    scale_notes=(
        "SCD type-2 dimension + point-in-time join — the feature-store "
        "primitive that prevents training-serving skew (an attribute "
        "read AS OF the fact's event time, never the current value): "
        "version intervals come from one LEAD window over the change "
        "feed (valid_from exclusive-end chaining, deterministic "
        "tiebreak on the change key), and the PIT join is an equi join "
        "on the entity key with the interval containment as a "
        "residual — the q_join_asof/q_join_range machinery, never a "
        "cross product. At 100 TB the dimension history is orders of "
        "magnitude smaller than facts and usually broadcasts; "
        "unmatched facts surface as an explicit 'NONE' cohort instead "
        "of silently dropping"
    ),
)
def q_scd2_pit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue by the customer's order-priority AS OF each item's ship
    time: SCD-2 validity intervals from the order feed, point-in-time
    joined to lineitem."""
    from pyspark.sql.window import Window
    from flexcalc_spark.tables import epoch_us_of

    o = table_parallel(spark, sf_dir, "orders")
    odate = epoch_us_of(o, "o_orderdate")
    w = Window.partitionBy("custkey").orderBy("vfrom", "vkey")
    versions = (
        o.select(
            F.col("o_custkey").alias("custkey"),
            F.col("o_orderpriority").alias("prio"),
            odate.alias("vfrom"),
            F.col("o_orderkey").alias("vkey"),
        )
        .withColumn("vto", F.lead("vfrom").over(w))
    )
    li = table_parallel(spark, sf_dir, "lineitem")
    ship = epoch_us_of(li, "l_shipdate")
    fact = li.select(
        "l_orderkey", "l_extendedprice", ship.alias("ship_us")
    ).join(
        o.select(
            F.col("o_orderkey").alias("l_orderkey"),
            F.col("o_custkey").alias("custkey"),
        ),
        "l_orderkey",
    )
    pit = fact.join(
        versions,
        (versions.custkey == fact.custkey)
        & (F.col("ship_us") >= F.col("vfrom"))
        & (F.col("vto").isNull() | (F.col("ship_us") < F.col("vto"))),
        "left",
    )
    return (
        pit.select(
            F.coalesce("prio", F.lit("NONE")).alias("prio_at_ship"),
            "l_extendedprice",
        )
        .groupBy("prio_at_ship")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_items"),
            F.round(
                F.sum(
                    F.floor(
                        F.col("l_extendedprice") * 1_000_000.0 + 0.5
                    ).cast("bigint")
                ).cast("double")
                / 1_000_000.0,
                4,
            ).alias("revenue"),
        )
    )


@register(
    "q_snapshot_diff",
    oracle="""
        -- the INVERSE of q_cdc_upsert: given two snapshot versions,
        -- emit the change feed (insert/update/delete rows) that turns
        -- old into new — what a lakehouse change-data-feed reader
        -- produces. Both versions derive deterministically from
        -- orders: new drops key%13=4 (-> deletes), old lacks key%11=3
        -- (-> inserts) and carries a stale price (+100 cents) on
        -- key%5=0 (-> updates). Prices on the exact integer cent grid.
        WITH snap AS MATERIALIZED (
            SELECT o_orderkey AS k,
                   CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
                       AS cents
            FROM orders
        ),
        old AS (
            SELECT k,
                   cents + CASE WHEN k % 5 = 0 THEN 100 ELSE 0 END
                       AS cents
            FROM snap WHERE k % 11 <> 3
        ),
        new AS (
            SELECT k, cents FROM snap WHERE k % 13 <> 4
        )
        SELECT COALESCE(o.k, n.k) AS o_orderkey,
               CASE WHEN o.k IS NULL THEN 'insert'
                    WHEN n.k IS NULL THEN 'delete'
                    ELSE 'update' END AS change_type,
               o.cents AS old_cents,
               n.cents AS new_cents
        FROM old o FULL OUTER JOIN new n ON o.k = n.k
        WHERE o.k IS NULL OR n.k IS NULL OR o.cents <> n.cents
    """,
    family="cdc",
    scale_notes=(
        "snapshot diff -> change feed (the q_cdc_upsert inverse, i.e. "
        "what a change-data-feed reader emits between two table "
        "versions): ONE full outer join on the primary key with "
        "insert/update/delete classification and an unchanged-row "
        "filter — no window, no state. At 100 TB both versions are "
        "bucketed by the key (the q_join_bucketed posture), so the "
        "diff is a zero-exchange sort-merge join and the output "
        "volume is the delta, not the table; with column-level change "
        "detection, compare a content hash instead of each column. "
        "Values ride the exact integer cent grid so update detection "
        "has no FP-equality hazard"
    ),
)
def q_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change feed between two derived snapshot versions of orders:
    (o_orderkey, change_type in {insert,update,delete}, old_cents,
    new_cents) — unchanged rows excluded."""
    snap = table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"),
        F.floor(F.col("o_totalprice") * 100 + 0.5)
        .cast("bigint")
        .alias("cents"),
    )
    old = snap.filter(F.col("k") % 11 != 3).select(
        "k",
        (
            F.col("cents")
            + F.when(F.col("k") % 5 == 0, 100).otherwise(0)
        ).alias("cents"),
    )
    new = snap.filter(F.col("k") % 13 != 4)
    o = old.alias("o")
    n = new.alias("n")
    joined = o.join(n, F.col("o.k") == F.col("n.k"), "full_outer")
    return joined.filter(
        F.col("o.k").isNull()
        | F.col("n.k").isNull()
        | (F.col("o.cents") != F.col("n.cents"))
    ).select(
        F.coalesce(F.col("o.k"), F.col("n.k")).alias("o_orderkey"),
        F.when(F.col("o.k").isNull(), F.lit("insert"))
        .when(F.col("n.k").isNull(), F.lit("delete"))
        .otherwise(F.lit("update"))
        .alias("change_type"),
        F.col("o.cents").alias("old_cents"),
        F.col("n.cents").alias("new_cents"),
    )
