"""Join operators (SURVEY.md §2.2 "Joins").

Reference parity: flexcalc's tile stitching (process.py::append_tile,
R15) is a coordinate-keyed join + weighted merge; spectrum calibration
(analyze.py::calibrate_spectrum, R23) pairs measured and synthetic
projections — a join. The relational surface here makes every join shape
explicit and lets Catalyst/AQE pick physical strategies.

Scale notes:
- dimension joins carry explicit ``broadcast()`` hints (region/nation/
  customer dims stay < 10 MB even at sf100) — no shuffle on the fact side;
- big-big joins (orders x customer at 100 TB) shuffle on the equi key;
  AQE's skew-join splitting handles hot keys; bucketing both tables on the
  key would remove the shuffle entirely for repeated joins;
- the range/as-of joins stay equi-keyed on user_id so the theta condition
  evaluates inside a hash-join partition rather than a cross product.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from flexcalc_spark.registry import register
from flexcalc_spark.tables import table, events_with_time

@register(
    "q_join_broadcast",
    oracle="""
        SELECT n_nationkey, n_name, r_name
        FROM nation JOIN region ON n_regionkey = r_regionkey
    """,
    family="joins",
    scale_notes="explicit broadcast hint: 5-row dim ships to every executor, zero shuffle",
)
def q_join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast hash join against a tiny dimension."""
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    return (
        n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey, "inner")
        .select("n_nationkey", "n_name", "r_name")
    )


@register(
    "q_join_inner",
    oracle="""
        SELECT o_orderkey, c_custkey, c_mktsegment, o_totalprice
        FROM orders JOIN customer ON o_custkey = c_custkey
    """,
    family="joins",
    scale_notes="shuffled equi join; AQE may demote to broadcast when customer is small",
)
def q_join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffled equi join (Spark picks hash vs sort-merge; AQE re-plans)."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    return o.join(c, o.o_custkey == c.c_custkey, "inner").select(
        "o_orderkey", "c_custkey", "c_mktsegment", "o_totalprice"
    )


@register(
    "q_join_multiway",
    oracle="""
        SELECT n_name,
               ROUND(CAST(SUM(CAST(floor(l_extendedprice * (1 - l_discount)
                                        * 1000000.0 + 0.5) AS BIGINT))
                          AS DOUBLE) / 1000000.0, 4) AS revenue,
               COUNT(*) AS cnt
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        GROUP BY n_name
    """,
    family="joins",
    scale_notes="TPC-H Q5 star shape: fact joins dims smallest-last; nation/region broadcast, lineitem-orders shuffles once on orderkey",
)
def q_join_multiway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-way star join + revenue aggregation (TPC-H Q5 shape)."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    # 1e-6 integer-grid sum (exact, partition-order independent, and on
    # the BIGINT codegen fast path — see aggregates.py module doc)
    rev = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 1000000.0 + 0.5
    ).cast("bigint")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.round(F.sum(rev).cast("double") / 1000000.0, 4).alias("revenue"),
            F.count(F.lit(1)).alias("cnt"),
        )
    )


@register(
    "q_join_left",
    oracle="""
        SELECT c_custkey, COUNT(o_orderkey) AS order_cnt
        FROM customer LEFT JOIN orders ON o_custkey = c_custkey
        GROUP BY c_custkey
    """,
    family="joins",
    scale_notes="left outer preserves the build side's unmatched rows; COUNT(col) skips the null-extended rows",
)
def q_join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join + unmatched handling (customers without orders -> 0)."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("order_cnt"))
    )


@register(
    "q_join_full",
    oracle="""
        SELECT a.k AS a_k, b.k AS b_k
        FROM (SELECT c_custkey AS k FROM customer WHERE c_custkey % 3 = 0) a
        FULL JOIN (SELECT DISTINCT o_custkey AS k FROM orders WHERE o_custkey % 2 = 0) b
        ON a.k = b.k
    """,
    family="joins",
    scale_notes="full outer forces sort-merge (no broadcast possible); both sides pre-filtered",
)
def q_join_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join over two partially-overlapping key sets."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    a = c.filter(F.col("c_custkey") % 3 == 0).select(F.col("c_custkey").alias("a_k"))
    b = (
        o.filter(F.col("o_custkey") % 2 == 0)
        .select(F.col("o_custkey").alias("b_k"))
        .distinct()
    )
    return a.join(b, a.a_k == b.b_k, "full").select("a_k", "b_k")


@register(
    "q_join_semi",
    oracle="""
        SELECT c_custkey, c_name FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c.c_custkey)
    """,
    family="joins",
    scale_notes="left-semi: probe side streams, no row multiplication, output bounded by left side",
)
def q_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi join (EXISTS rewrite)."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@register(
    "q_join_anti",
    oracle="""
        SELECT c_custkey, c_name FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c.c_custkey)
    """,
    family="joins",
    scale_notes="left-anti is the scalable NOT IN: null-safe, no distinct materialization",
)
def q_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti join (NOT EXISTS rewrite) — customers with no orders."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@register(
    "q_join_cross",
    oracle="SELECT r_name, n_name FROM region CROSS JOIN nation",
    family="joins",
    scale_notes="bounded 5x25 cross product; unbounded cross joins are rejected by design review, not by the engine",
)
def q_join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cartesian product of two tiny dims."""
    r = table(spark, sf_dir, "region")
    n = table(spark, sf_dir, "nation")
    return r.crossJoin(n).select("r_name", "n_name")


@register(
    "q_join_range",
    oracle="""
        WITH t AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us FROM events)
        SELECT e1.event_id AS id1, e2.event_id AS id2, e1.user_id AS user_id,
               e2.ts_us - e1.ts_us AS gap_us
        FROM t e1 JOIN t e2
          ON e1.user_id = e2.user_id
         AND e2.ts_us > e1.ts_us
         AND e2.ts_us <= e1.ts_us + 300000000
    """,
    family="joins",
    scale_notes="equi key (user_id) carries the hash join; the interval theta evaluates per-partition — never a cross product. At 100 TB: pre-bucket events by user_id",
)
def q_join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval self-join: event pairs per user within 5 minutes.

    Time math entirely in integer MICROseconds on both sides: DuckDB 1.0
    truncates TIMESTAMP_NS to µs on read, so ns-precision comparisons
    would see different boundary pairs than the oracle."""
    e = events_with_time(spark, sf_dir).select("event_id", "user_id", "ts_us")
    e1, e2 = e.alias("e1"), e.alias("e2")
    five_min_us = 300 * 1_000_000
    return (
        e1.join(
            e2,
            (F.col("e1.user_id") == F.col("e2.user_id"))
            & (F.col("e2.ts_us") > F.col("e1.ts_us"))
            & (F.col("e2.ts_us") <= F.col("e1.ts_us") + five_min_us),
        )
        .select(
            F.col("e1.event_id").alias("id1"),
            F.col("e2.event_id").alias("id2"),
            F.col("e1.user_id").alias("user_id"),
            (F.col("e2.ts_us") - F.col("e1.ts_us")).alias("gap_us"),
        )
    )


@register(
    "q_join_asof",
    oracle="""
        WITH t AS (
            SELECT user_id, event_id, epoch_us(ts) AS ts_us, event_type
            FROM events WHERE event_type IN ('view', 'purchase')
        ), w AS (
            SELECT user_id, event_id, ts_us, event_type,
                   MAX(CASE WHEN event_type = 'view' THEN ts_us END) OVER (
                       PARTITION BY user_id ORDER BY ts_us, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ) AS prev_view_us
            FROM t
        )
        SELECT event_id, user_id, ts_us, prev_view_us
        FROM w WHERE event_type = 'purchase'
    """,
    family="joins",
    scale_notes="as-of join as union-tag + running MAX window: one shuffle on user_id, O(n log n) sort per partition — no native Spark ASOF needed (SURVEY §4.3.1)",
)
def q_join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: latest prior 'view' for each 'purchase' of the same user.

    Spark has no native ASOF join; the scalable pattern is a single
    windowed pass over the union of both event streams (SURVEY §4.3.1)."""
    e = events_with_time(spark, sf_dir)
    t = e.filter(F.col("event_type").isin("view", "purchase")).select(
        "user_id", "event_id", "ts_us", "event_type"
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prev_view = F.max(
        F.when(F.col("event_type") == "view", F.col("ts_us"))
    ).over(w)
    return (
        t.withColumn("prev_view_us", prev_view)
        .filter(F.col("event_type") == "purchase")
        .select("event_id", "user_id", "ts_us", "prev_view_us")
    )


N_SALT = 8


@register(
    "q_join_salted",
    oracle="""
        SELECT c_mktsegment,
               COUNT(*) AS cnt,
               ROUND(CAST(SUM(CAST(floor(value * 1000000.0 + 0.5) AS BIGINT))
                          AS DOUBLE) / 1000000.0, 4) AS sum_value
        FROM events JOIN customer ON user_id = c_custkey
        GROUP BY c_mktsegment
    """,
    family="joins",
    scale_notes="skew-mitigated join: salt the fact side pmod(hash, 8), replicate the dim side 8x, join on (key, salt) — hot keys spread over 8 reducers instead of melting one. The manual twin of AQE skew-join splitting, for when the dim is too big to broadcast; the oracle is the UNSALTED join (salting is execution-only)",
)
def q_join_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-mitigated fact-dim join via key salting.

    events.user_id is a pathologically low-cardinality key (150 distinct
    users under 10k+ events at sf0.01): a plain shuffle join lands each
    hot key on one reducer. Salting splits every key 8 ways at the cost
    of replicating the dim rows 8x. The shuffle_hash hint forces a real
    shuffle join — broadcast would make the salt decorative here, and the
    pattern targets dims too big to broadcast."""
    e = table(spark, sf_dir, "events").withColumn(
        "salt", F.pmod(F.hash("event_id"), F.lit(N_SALT))
    )
    c = (
        table(spark, sf_dir, "customer")
        .select("c_custkey", "c_mktsegment")
        .withColumn("salt", F.explode(F.lit(list(range(N_SALT)))))
    )
    joined = e.join(
        c.hint("shuffle_hash"),
        (e["user_id"] == c["c_custkey"]) & (e["salt"] == c["salt"]),
    )
    return joined.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.round(
            F.sum(F.floor(F.col("value") * 1000000.0 + 0.5).cast("bigint"))
            .cast("double") / 1000000.0,
            4,
        ).alias("sum_value"),
    )


# ------------------------------------------------------ bloom prefilter
BLOOM_BITS = 1 << 19       # 524288 bits: ~17 bits/key at sf0.1 build side
BLOOM_HASHES = 2           # fp = (1 - e^(-kn/m))^k ~ 1.2% at sf0.1


@register(
    "q_join_bloom",
    oracle="""
        SELECT l_returnflag, COUNT(*) AS cnt,
               ROUND((CAST(SUM(CAST(floor((l_extendedprice) * 1000000.0
                    + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0), 4)
                   AS sum_price
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE o_orderpriority = '1-URGENT'
        GROUP BY l_returnflag
    """,
    family="joins",
    scale_notes=(
        "manual bloom runtime filter (the pattern Spark's runtime-filter "
        "rule injects for DPP-ineligible joins): build-side keys fold "
        "into a (word, 64-bit mask) bit_or aggregate — <= 8192 rows for "
        "2^19 bits, sized ~17 bits/key so fp stays ~1% instead of "
        "saturating — broadcast-hash-joined onto the probe by word "
        "index, so non-matching probe rows drop BEFORE the join "
        "shuffle. False positives are removed by the exact semi join "
        "that follows, so the result is exact (oracle = plain join) "
        "while the shuffle carries ~selectivity x probe rows. Resize m "
        "with the build side at 100 TB; the bloom build is a map-side "
        "mergeable aggregate and the probe word-lookup joins stay "
        "broadcast (the probe table never shuffles; measured in "
        "SCALE.md)"
    ),
)
def q_join_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact fact⋈dim join with a hand-built 2^19-bit bloom prefilter:
    build keys fold into a (word, mask) table, broadcast, and prune the
    probe scan before the exact semi join."""
    from flexcalc_spark.tables import table_parallel

    l = table_parallel(spark, sf_dir, "lineitem")
    urgent = table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    pos = urgent.select(
        F.explode(
            F.array(
                *[
                    F.pmod(
                        F.xxhash64(F.lit(h), F.col("o_orderkey")),
                        F.lit(BLOOM_BITS),
                    )
                    for h in range(BLOOM_HASHES)
                ]
            )
        ).alias("pos")
    )
    bloom = (
        pos.select(
            F.expr("pos div 64").alias("word"),
            F.expr(
                "shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))"
            ).alias("m"),
        )
        .groupBy("word")
        .agg(F.bit_or("m").alias("mask"))
    )
    probe = l
    for h in range(BLOOM_HASHES):
        p = f"pmod(xxhash64({h}, l_orderkey), {BLOOM_BITS})"
        probe = (
            probe.withColumn(f"w{h}", F.expr(f"({p}) div 64"))
            .join(
                F.broadcast(
                    bloom.select(
                        F.col("word").alias(f"bw{h}"),
                        F.col("mask").alias(f"bm{h}"),
                    )
                ),
                F.col(f"w{h}") == F.col(f"bw{h}"),
                "inner",            # word absent => no key hashed there
            )
            .filter(
                F.expr(f"((bm{h} >> CAST(({p}) % 64 AS INT)) & 1) = 1")
            )
            .drop(f"w{h}", f"bw{h}", f"bm{h}")
        )
    joined = probe.join(
        F.broadcast(urgent.select("o_orderkey")),
        F.col("l_orderkey") == F.col("o_orderkey"),
        "left_semi",
    )
    from flexcalc_spark.operators.aggregates import dsum

    return joined.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("cnt"),
        dsum("l_extendedprice", "sum_price"),
    )


COOCCUR_TOP = 20


@register(
    "q_cooccur",
    oracle=f"""
        SELECT pa, pb, cnt, CAST(rank AS BIGINT) AS rank
        FROM (
            SELECT pa, pb, cnt,
                   row_number() OVER (ORDER BY cnt DESC, pa, pb) AS rank
            FROM (
                SELECT a.l_partkey AS pa, b.l_partkey AS pb,
                       CAST(COUNT(*) AS BIGINT) AS cnt
                FROM lineitem a
                JOIN lineitem b
                  ON a.l_orderkey = b.l_orderkey
                 AND a.l_partkey < b.l_partkey
                GROUP BY a.l_partkey, b.l_partkey
            )
        )
        WHERE rank <= {COOCCUR_TOP}
    """,
    family="joins",
    scale_notes=(
        "market-basket co-occurrence: the self-join is keyed on "
        "l_orderkey, so pair expansion is BOUNDED by basket size "
        "(~k^2/2 per order, k~7) — O(n k) total, never O(n^2); both "
        "sides share the l_orderkey shuffle partitioning so the join "
        "is co-partitioned. The pair-count aggregate collapses "
        "map-side; global top-20 is TakeOrderedAndProject with a full "
        "tiebreak. The canonical counters-not-candidates contrast to "
        "the dedup family's all-pairs hazards"
    ),
)
def q_cooccur(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 part pairs co-occurring in the same order (bounded
    basket-size self-join, full tiebreak order)."""
    from flexcalc_spark.tables import table_parallel

    l = table_parallel(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    a = l.alias("a")
    b = l.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("pa"),
            F.col("b.l_partkey").alias("pb"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    # TakeOrderedAndProject prunes to 20 rows BEFORE the rank window runs
    # (a global row_number over the full pair table would serialize it)
    top = pairs.orderBy(F.col("cnt").desc(), "pa", "pb").limit(COOCCUR_TOP)
    w = Window.orderBy(F.col("cnt").desc(), "pa", "pb")
    return top.withColumn("rank", F.row_number().over(w).cast("bigint"))


@register(
    "q_join_interval_outer",
    oracle="""
        WITH v AS (
            SELECT event_id AS id1, user_id AS u1, epoch_us(ts) AS ts1_us
            FROM events WHERE event_type = 'view'
        ),
        p AS (
            SELECT event_id AS id2, user_id AS u2, epoch_us(ts) AS ts2_us
            FROM events WHERE event_type = 'purchase'
        )
        SELECT v.id1, v.u1 AS user_id, v.ts1_us,
               p.id2, p.ts2_us - v.ts1_us AS gap_us
        FROM v LEFT JOIN p
          ON v.u1 = p.u2
         AND p.ts2_us > v.ts1_us
         AND p.ts2_us <= v.ts1_us + 600000000
    """,
    family="joins",
    scale_notes=(
        "LEFT OUTER interval join (view -> purchase within 10 min, or "
        "NULLs): the equi key user_id carries the hash join and the "
        "interval theta rides as a residual — never a cross product; "
        "unmatched preservation costs nothing extra. This is the batch "
        "twin of the watermarked stream-stream leftOuter join "
        "(streaming/windows.py::stream_interval_join_left), whose "
        "null-emission-after-watermark contract is asserted in "
        "tests/test_streaming.py — at 100 TB the streaming state per "
        "side is bounded by (watermark delay + interval) of events per "
        "user because the interval bound lets the store evict"
    ),
)
def q_join_interval_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each view event left-joined to same-user purchases within the
    next 10 minutes (NULL-extended when none) — the batch twin of the
    stream-stream leftOuter interval join."""
    ten_min_us = 600 * 1_000_000
    e = events_with_time(spark, sf_dir)
    v = e.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("id1"),
        F.col("user_id").alias("u1"),
        F.col("ts_us").alias("ts1_us"),
    )
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("id2"),
        F.col("user_id").alias("u2"),
        F.col("ts_us").alias("ts2_us"),
    )
    j = v.join(
        p,
        (F.col("u1") == F.col("u2"))
        & (F.col("ts2_us") > F.col("ts1_us"))
        & (F.col("ts2_us") <= F.col("ts1_us") + ten_min_us),
        "left",
    )
    return j.select(
        "id1",
        F.col("u1").alias("user_id"),
        "ts1_us",
        "id2",
        (F.col("ts2_us") - F.col("ts1_us")).alias("gap_us"),
    )


@register(
    "q_join_nullsafe",
    oracle="""
        -- null-safe equality JOIN (Spark <=> / SQL IS NOT DISTINCT
        -- FROM): the one join-key semantics the other 15 join keys
        -- never exercise — NULL matches NULL instead of dropping.
        -- Both sides aggregate FIRST (bounded |segments| rows), so the
        -- null bucket joins 1 x 1, never null-group cross-products.
        WITH c AS (
            SELECT NULLIF(c_nationkey % 7, 3) AS seg,
                   CAST(COUNT(*) AS BIGINT) AS n_cust,
                   CAST(SUM(CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT))
                        AS BIGINT) AS bal_cents
            FROM customer GROUP BY 1
        ),
        s AS (
            SELECT NULLIF(s_nationkey % 7, 3) AS seg,
                   CAST(COUNT(*) AS BIGINT) AS n_supp
            FROM supplier GROUP BY 1
        )
        SELECT c.seg AS seg, c.n_cust, c.bal_cents, s.n_supp
        FROM c JOIN s ON c.seg IS NOT DISTINCT FROM s.seg
    """,
    family="joins",
    scale_notes=(
        "null-safe equi join (eqNullSafe / IS NOT DISTINCT FROM): "
        "Catalyst plans EqualNullSafe join keys as a regular hash/"
        "sort-merge join on a null-coalesced key (plan-asserted: real "
        "equi join, no nested loop), so the semantics cost nothing at "
        "scale. The REAL 100 TB hazard is cardinality, not the plan: "
        "NULL matches NULL, so two fact-sized sides each with millions "
        "of null keys would cross-product the null bucket — aggregate "
        "or bucket-dedup the null group FIRST (both sides here "
        "collapse to |segments| rows before the join), or fall back "
        "to plain equality plus an explicit null-bucket union when "
        "nulls are hot"
    ),
)
def q_join_nullsafe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join of per-segment customer and supplier
    aggregates, where segment = NULLIF(nationkey % 7, 3) — the NULL
    segment must pair up instead of dropping: (seg, n_cust, bal_cents,
    n_supp)."""
    c = (
        table(spark, sf_dir, "customer")
        .select(
            F.expr("NULLIF(c_nationkey % 7, 3)").alias("seg"),
            F.floor(F.col("c_acctbal") * 100 + 0.5)
            .cast("bigint")
            .alias("cents"),
        )
        .groupBy("seg")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_cust"),
            F.sum("cents").cast("bigint").alias("bal_cents"),
        )
    )
    s = (
        table(spark, sf_dir, "supplier")
        .select(F.expr("NULLIF(s_nationkey % 7, 3)").alias("seg2"))
        .groupBy("seg2")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_supp"))
    )
    return c.join(s, F.col("seg").eqNullSafe(F.col("seg2"))).select(
        "seg", "n_cust", "bal_cents", "n_supp"
    )
