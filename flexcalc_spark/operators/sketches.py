"""Mergeable sketches (north-star §2.3): Count-Min frequency sketch.

A Count-Min sketch is the canonical mergeable frequency structure for
streaming/distributed counting: d independent hash rows of w counters;
update = +1 at (i, h_i(x)) for each row; estimate = min_i counter[i,
h_i(x)] (always >= the true count). Counters are associative sums, so
partitions build partial sketches independently and merge by addition —
exactly Spark's partial+final aggregation model, which is what makes
the sketch the right answer when exact per-key counts don't fit
(heavy-hitter tracking over a 100 TB token stream: the sketch is d x w
integers regardless of vocabulary size).

Graded key ``q_sketch_cms``: build a d=4, w=256 CMS over the document
token stream, then report (true count, CMS estimate) for the 20 most
frequent tokens — the estimate >= truth invariant and the collision
error are both visible in the graded output.

Engine determinism: bucket keys are md5 hex prefixes (md5 is available
and byte-identical in Spark and DuckDB — same trick as sampling.py);
all counts are BIGINT.

Reference cite (mount empty, SURVEY §0): public flexcalc has no sketch
layer; CMS follows Cormode & Muthukrishnan (J. Algorithms 2005).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from flexcalc_spark.registry import register
from flexcalc_spark.tables import table_parallel

CMS_D = 4        # hash rows
CMS_TOP = 20     # report the 20 most frequent tokens
# width w = 256: bucket key is the first 2 hex chars of md5 -> uniform
# over 256 values as strings ('00'..'ff'); ASCII order == value order.


def _cms_col(i: int) -> Column:
    """Row-i bucket key of the current ``token`` column."""
    return F.substring(
        F.md5(F.concat(F.lit(f"cms{i}:"), F.col("token")).cast("binary")), 1, 2
    )


@register(
    "q_sketch_cms",
    oracle=f"""
        WITH tok AS (
            SELECT unnest(string_split(lower(text), ' ')) AS token
            FROM documents
        ),
        tf AS (
            SELECT token, CAST(COUNT(*) AS BIGINT) AS cnt
            FROM tok GROUP BY token
        ),
        h AS (
            SELECT token, cnt, i,
                   substr(md5('cms' || CAST(i AS VARCHAR) || ':' || token),
                          1, 2) AS col
            FROM tf, (SELECT unnest(range(0, {CMS_D})) AS i)
        ),
        sketch AS (
            SELECT i, col, CAST(SUM(cnt) AS BIGINT) AS counter
            FROM h GROUP BY i, col
        ),
        top AS (
            SELECT token, cnt FROM tf
            ORDER BY cnt DESC, token LIMIT {CMS_TOP}
        ),
        est AS (
            SELECT h.token, CAST(MIN(s.counter) AS BIGINT) AS est_cnt
            FROM h JOIN top USING (token)
            JOIN sketch s ON h.i = s.i AND h.col = s.col
            GROUP BY h.token
        )
        SELECT t.token, t.cnt AS true_cnt, e.est_cnt
        FROM top t JOIN est e ON t.token = e.token
    """,
    family="sketches",
    scale_notes=(
        "Count-Min sketch: counters are associative integer sums, so "
        "every partition builds a partial d x w sketch map-side and the "
        "shuffle merges d x w = 1024 rows TOTAL no matter the corpus "
        "size — the sketch replaces an exact vocabulary-sized count "
        "when heavy-hitter tracking is all that's needed. Built here "
        "from the tf collapse (equivalent to per-instance updates, "
        "cheaper); estimates join a 20x4 probe table against the "
        "1024-row sketch, both broadcast. md5-hex bucket keys are "
        "engine-identical; estimate >= truth by construction"
    ),
)
def q_sketch_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """d=4 x w=256 Count-Min sketch over the token stream; outputs
    (token, true_cnt, est_cnt) for the top-20 tokens — est_cnt >=
    true_cnt always, with collision overestimates visible."""
    d = table_parallel(spark, sf_dir, "documents")
    # three consumers (sketch build, top-20, probe keys) -> cache; but
    # repartition the groupBy-derived table to core count FIRST (the
    # cache-layout rule: caching a shuffle-derived frame as-is pins the
    # vanilla session's 200-partition layout, 3 x 200 near-empty tasks)
    tf = (
        d.select(F.explode(F.split(F.lower("text"), " ")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .repartition(spark.sparkContext.defaultParallelism)
        .cache()
    )
    hashed = tf.select(
        "token",
        "cnt",
        F.posexplode(F.array(*[_cms_col(i) for i in range(CMS_D)])).alias(
            "i", "col"
        ),
    )
    sketch = hashed.groupBy("i", "col").agg(F.sum("cnt").alias("counter"))
    top = tf.orderBy(F.col("cnt").desc(), "token").limit(CMS_TOP)
    est = (
        hashed.join(F.broadcast(top.select("token")), "token")
        .join(F.broadcast(sketch), ["i", "col"])
        .groupBy("token")
        .agg(F.min("counter").alias("est_cnt"))
    )
    return top.join(est, "token").select(
        "token", F.col("cnt").alias("true_cnt"), "est_cnt"
    )


@register(
    "q_sketch_hll",
    oracle="""
        SELECT event_type,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS est_users,
               CAST(COUNT(DISTINCT (epoch_us(ts) // 86400000000)) AS BIGINT)
                   AS n_days
        FROM events
        GROUP BY event_type
    """,
    family="sketches",
    scale_notes=(
        "HyperLogLog distinct via Datasketches (hll_sketch_agg): "
        "per-(event_type, day) PARTIAL sketches are built map-side, then "
        "hll_union_agg merges the fixed-size sketches per event_type — "
        "the mergeable-state shape that makes 100 TB distinct counting a "
        "narrow shuffle of lgK=14 sketch bytes instead of a distinct "
        "expansion. At fixture cardinality (150 users) the sparse-mode "
        "sketch is EXACT, so the key is oracle-checked against exact "
        "COUNT DISTINCT; at real cardinality the same plan degrades "
        "gracefully to ~1.6%/sqrt(2^lgK) error. The daily partials are "
        "also the incremental-ingest story: yesterday's sketches never "
        "recompute"
    ),
)
def q_sketch_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users per event_type via per-day HLL partial sketches
    merged with hll_union_agg — estimate is exact at fixture cardinality
    (sparse mode), so the oracle is exact COUNT DISTINCT."""
    from flexcalc_spark.tables import events_with_time

    e = events_with_time(spark, sf_dir)
    # lgConfigK=14 (default 12): the oracle is exact COUNT DISTINCT, so
    # the sketch must stay in its exact sparse mode — 14 buys 4x
    # cardinality headroom over fixture regenerations (the exactness is
    # also property-tested per sf in tests/test_determinism.py so a
    # crossing fails loudly at round start, not in the driver hash).
    daily = (
        e.withColumn("day", F.expr("ts_us div 86400000000"))
        .groupBy("event_type", "day")
        .agg(F.expr("hll_sketch_agg(user_id, 14)").alias("sk"))
    )
    return daily.groupBy("event_type").agg(
        F.expr("hll_sketch_estimate(hll_union_agg(sk))")
        .cast("bigint")
        .alias("est_users"),
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
    )


@register(
    "q_sliding_distinct",
    oracle="""
        WITH e AS (
            SELECT user_id, epoch_us(ts) // 86400000000 AS day FROM events
        ),
        days AS (SELECT DISTINCT day FROM e)
        SELECT d.day, CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS d7_users
        FROM days d
        JOIN e ON e.day BETWEEN d.day - 6 AND d.day
        GROUP BY d.day
    """,
    family="sketches",
    scale_notes=(
        "trailing-7-day distinct users per day WITHOUT the exact "
        "formulation's 7x row re-expansion: one day-grain "
        "hll_sketch_agg pass over the events (fixed-size partial "
        "state), then hll_union_agg as a WINDOW function over the tiny "
        "day-level sketch table — the sliding union costs 7 sketch "
        "merges per day-row instead of re-scanning a week of raw "
        "events per day. Exact at fixture cardinality (sparse mode) so "
        "oracle-checked against exact COUNT DISTINCT; the day-level "
        "window is post-aggregate (one row per day) so its global "
        "order is not a scale hazard"
    ),
)
def q_sliding_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day distinct-user count per day: daily HLL sketches
    union-merged by a sliding window over the day-level table."""
    from flexcalc_spark.tables import events_with_time

    e = events_with_time(spark, sf_dir)
    # lgConfigK=14 for sparse-mode exactness headroom (see q_sketch_hll).
    daily = (
        e.withColumn("day", F.expr("ts_us div 86400000000"))
        .groupBy("day")
        .agg(F.expr("hll_sketch_agg(user_id, 14)").alias("sk"))
    )
    # RANGE (not ROWS) frame: the oracle joins on the CALENDAR interval
    # [day-6, day]. A ROWS frame over the previous 6 present day-rows
    # agrees only while every day has events; a fixture generation with a
    # gapped day would silently widen the ROWS span past 7 calendar days.
    # day is BIGINT, so the numeric RANGE frame is calendar-exact.
    return daily.selectExpr(
        "day",
        "CAST(hll_sketch_estimate(hll_union_agg(sk) OVER ("
        "ORDER BY day RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)) "
        "AS BIGINT) AS d7_users",
    )
