"""Trajectory similarity via symbolic approximation (SAX-style).

Users' event-value series are time-ordered trajectories; finding users
with similar VALUE SHAPE is the trajectory-similarity workload of the
retrieved literature (PAPERS.md: REPOSE distributed trajectory
similarity; incremental top-k similarity search). Elastic measures
(DTW/Fréchet) are sequential dynamic programs that do not decompose
relationally — the scalable construction, and the one used here, is
symbolic approximation (SAX: Lin et al. 2003): piecewise-aggregate
segments, a quantile alphabet, and similarity on the symbol words,
where candidate generation becomes the SAME banded equi-join shape as
every dedup key in this engine:

  1. PAA     — each user's ordered series folds into 8 segments whose
               means ride the exact 1e-6 integer grid;
  2. alphabet— global quartile boundaries of all segment means (one
               percentile aggregate over the users x 8 table, which is
               user-bounded, never event-bounded);
  3. symbols — count-of-boundaries-below per segment (0..3), an 8-char
               word per user;
  4. pairs   — candidates share a 3-gram of the word at the same
               position (equi join on (pos, gram)); verify = exact
               symbol Hamming distance <= 2 on candidates only.

Determinism: segment assignment is pure integer math (i * 8 div n);
segment means come from BIGINT grid sums; quartile boundaries are
DISCRETE (lower/type-1) order statistics — rank-SELECTED mean values,
no interpolation arithmetic at all, so both engines extract the
identical double by construction (r14: the previous interpolated
percentile rested on both engines sharing the a + frac*(b-a) formula,
the one residual cross-engine assumption of the exact-rational sweep,
since means are heterogeneous-denominator rationals with no common
BIGINT grid); symbol compares and Hamming are integers.

Scale: every stage is user-bounded after the one event scan (the PAA
collapse). Candidate volume is |users| x shared-gram collisions — the
SAX alphabet tunes collision density exactly like minhash bands; at
100 TB the (pos, gram) join key distributes uniformly by construction.

Reference cite (mount empty, SURVEY §0): SAX per Lin et al. 2003;
banded candidate generation per the distributed-similarity literature
in PAPERS.md.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flexcalc_spark.registry import register
from flexcalc_spark.tables import events_with_time

SEGMENTS = 8
GRAM = 3
MAX_HAMMING = 2

# BIGINT "infinity" for the DTW DP boundary: large enough to never win a
# least(), small enough that INF + 15 path costs cannot overflow
# (tests/test_fixture_assumptions.py asserts the headroom).
DTW_INF = 4_000_000_000_000_000

# Shared DuckDB text of the SAX alphabet-boundary CTEs (consumed by
# BOTH trajectory oracles and the recall test's brute-force word
# construction — one definition so a boundary change cannot silently
# diverge an oracle from the plan it grades, the round-11 extraction
# lesson). Discrete (lower/type-1) quartiles, r14: rank-SELECTED mean
# values, no interpolation arithmetic — deterministic across engines
# by construction (see _sax_core); NULL means are excluded from the
# ranking (engines order NULLs oppositely).
SAX_BOUNDS_CTES_SQL = """
        rankedm AS (
            SELECT m, ROW_NUMBER() OVER (ORDER BY m) AS rn,
                   COUNT(*) OVER () AS n
            FROM means WHERE m IS NOT NULL
        ),
        bounds AS (
            SELECT MAX(CASE WHEN rn = (1*(n-1))//4 + 1 THEN m END) AS b1,
                   MAX(CASE WHEN rn = (2*(n-1))//4 + 1 THEN m END) AS b2,
                   MAX(CASE WHEN rn = (3*(n-1))//4 + 1 THEN m END) AS b3
            FROM rankedm
        )"""


def _sax_core(spark: SparkSession, sf_dir: str):
    """Shared SAX pipeline: events -> (seg, words).

    ``seg`` is the user-bounded PAA table (user_id, s, sg, c) on the
    exact 1e-6 BIGINT grid; ``words`` the cached 8-symbol word per user.
    Extracted verbatim from q_trajectory_sim so q_trajectory_dtw shares
    the identical candidate machinery (values are what the driver
    hashes, and every step here is grid-exact/deterministic).
    """
    from pyspark.sql.window import Window

    e = events_with_time(spark, sf_dir)
    worder = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    wcount = Window.partitionBy("user_id")
    ordered = e.select(
        "user_id",
        (F.row_number().over(worder) - 1).alias("i"),
        F.count(F.lit(1)).over(wcount).alias("n"),
        F.floor(F.col("value") * 1_000_000.0 + 0.5).cast("bigint").alias("vg"),
    )
    seg = (
        ordered.groupBy(
            "user_id", F.expr(f"(i * {SEGMENTS}) div n").alias("s")
        )
        .agg(
            F.sum("vg").cast("bigint").alias("sg"),
            F.count(F.lit(1)).cast("bigint").alias("c"),
        )
    )
    means = seg.select(
        "user_id",
        "s",
        (F.col("sg").cast("double") / 1_000_000.0 / F.col("c")).alias("m"),
    )
    # Alphabet boundaries as DISCRETE order statistics (lower/type-1
    # quartiles: the mean at rank (k*(n-1)) div 4 + 1), r14: the old
    # interpolated percentile() emitted a + frac*(b-a) doubles whose
    # cross-engine bit-identity rested on both engines sharing the
    # interpolation formula — the one hazard the exact-rational sweep
    # could not cover with integers, because means are heterogeneous-
    # denominator rationals (sg / (c * 1e6)) with no common BIGINT
    # grid. Rank-SELECTED values involve no arithmetic at all: both
    # engines order the identically-computed doubles and extract the
    # same element, so symbol compares are deterministic by
    # construction. The rank window runs over the users x 8 table
    # (user-bounded, never event-bounded — same domain the percentile
    # buffer covered); swap to approx_percentile at 100 TB as before.
    from pyspark.sql.window import Window as _W

    # one single-partition window pass yields (rn, n) together (r14
    # review: the separate count aggregate added a BroadcastNestedLoop
    # attach and a third means consumer for nothing). NULL means are
    # excluded from the RANKING explicitly — Spark orders NULLS FIRST,
    # DuckDB NULLS LAST, so an unfiltered row_number would shift every
    # boundary rank differently per engine the day a regen makes
    # value nullable (they still symbolize: NULL > b is NULL -> ELSE 0
    # identically on both engines).
    wall = _W.partitionBy().rowsBetween(
        _W.unboundedPreceding, _W.unboundedFollowing
    )
    rankedm = means.where(F.col("m").isNotNull()).select(
        "m",
        F.row_number().over(_W.orderBy("m")).alias("rn"),
        F.count(F.lit(1)).over(wall).alias("n"),
    )
    bounds = rankedm.agg(
        *[
            F.max(
                F.when(
                    F.expr(f"rn = ({k}*(n-1)) div 4 + 1"), F.col("m")
                )
            ).alias(f"b{k}")
            for k in (1, 2, 3)
        ]
    )
    sym = means.crossJoin(F.broadcast(bounds)).select(
        "user_id",
        "s",
        F.expr(
            "CAST(CASE WHEN m > b3 THEN 3 WHEN m > b2 THEN 2"
            " WHEN m > b1 THEN 1 ELSE 0 END AS BIGINT)"
        ).alias("y"),
    )
    words = (
        sym.groupBy("user_id")
        .agg(
            F.expr(
                "array_join(transform(array_sort(collect_list("
                "concat(lpad(CAST(s AS STRING), 2, '0'),"
                " CAST(y AS STRING)))),"
                " p -> substring(p, 3, 1)), '')"
            ).alias("w")
        )
        # feeds the gram explode AND both verify re-attachments; core-
        # count layout before cache (groupBy-derived — the cache-layout
        # rule)
        .repartition(sym.sparkSession.sparkContext.defaultParallelism)
        .cache()
    )
    return seg, words


def _sax_gram_candidates(words: DataFrame) -> DataFrame:
    """Candidate user pairs sharing a positional word 3-gram."""
    grams = words.select(
        "user_id",
        "w",
        F.explode(
            F.expr(
                f"transform(sequence(0, {SEGMENTS - GRAM}),"
                f" g -> struct(g AS pos, substring(w, g + 1, {GRAM}) AS gram))"
            )
        ).alias("pg"),
    ).select(
        "user_id", "w", F.col("pg.pos").alias("pos"), F.col("pg.gram").alias("gram")
    )
    a = grams.alias("a")
    b = grams.alias("b")
    return (
        a.join(
            b,
            (F.col("a.pos") == F.col("b.pos"))
            & (F.col("a.gram") == F.col("b.gram"))
            & (F.col("a.user_id") < F.col("b.user_id")),
        )
        .select(
            F.col("a.user_id").alias("ua"),
            F.col("b.user_id").alias("ub"),
            F.col("a.w").alias("wa"),
            F.col("b.w").alias("wb"),
        )
        .distinct()
    )


@register(
    "q_trajectory_sim",
    oracle=f"""
        WITH ordered AS (
            SELECT user_id,
                   ROW_NUMBER() OVER (PARTITION BY user_id
                                      ORDER BY epoch_us(ts), event_id) - 1
                       AS i,
                   COUNT(*) OVER (PARTITION BY user_id) AS n,
                   CAST(floor(value * 1000000.0 + 0.5) AS BIGINT) AS vg
            FROM events
        ),
        seg AS (
            SELECT user_id, (i * {SEGMENTS}) // n AS s,
                   CAST(SUM(vg) AS BIGINT) AS sg,
                   CAST(COUNT(*) AS BIGINT) AS c
            FROM ordered GROUP BY user_id, (i * {SEGMENTS}) // n
        ),
        means AS MATERIALIZED (
            SELECT user_id, s,
                   CAST(sg AS DOUBLE) / 1000000.0 / c AS m
            FROM seg
        ),
        {SAX_BOUNDS_CTES_SQL},
        sym AS (
            SELECT user_id, s,
                   CAST(CASE WHEN m > b3 THEN 3 WHEN m > b2 THEN 2
                             WHEN m > b1 THEN 1 ELSE 0 END AS BIGINT) AS y
            FROM means, bounds
        ),
        words AS (
            SELECT user_id,
                   list_reduce(
                       list_prepend('',
                           list_transform(list_sort(list(
                               lpad(CAST(s AS VARCHAR), 2, '0') ||
                               CAST(y AS VARCHAR))),
                               p -> substr(p, 3, 1))),
                       (acc, ch) -> acc || ch) AS w
            FROM sym GROUP BY user_id
        ),
        grams AS (
            SELECT user_id, g.g AS pos, substr(w, g.g + 1, {GRAM}) AS gram, w
            FROM words, (SELECT unnest(range(0, {SEGMENTS - GRAM + 1})) AS g) g
        ),
        cand AS (
            SELECT DISTINCT a.user_id AS ua, b.user_id AS ub, a.w AS wa,
                   b.w AS wb
            FROM grams a JOIN grams b
              ON a.pos = b.pos AND a.gram = b.gram
             AND a.user_id < b.user_id
        ),
        scored AS (
            SELECT ua, ub,
                   CAST(list_reduce(
                       list_prepend(CAST(0 AS BIGINT),
                           list_transform(range(1, {SEGMENTS + 1}),
                               k -> CAST(CASE WHEN substr(wa, k, 1)
                                              <> substr(wb, k, 1)
                                         THEN 1 ELSE 0 END AS BIGINT))),
                       (acc, d) -> acc + d) AS BIGINT) AS hamming
            FROM cand
        )
        SELECT ua AS user_a, ub AS user_b, hamming
        FROM scored WHERE hamming <= {MAX_HAMMING}
    """,
    family="trajectory",
    scale_notes=(
        "SAX trajectory similarity: the event scan collapses to "
        "user-bounded PAA segments (grid-exact means), a 4-letter "
        "quantile alphabet renders each user an 8-symbol word, and "
        "similar-shape candidates come from the (position, 3-gram) "
        "equi join — the minhash-band construction pointed at time "
        "series, LSH-style: NOT pigeonhole-complete (two symbol edits "
        "can touch all six grams); measured recall 39/42 = 0.93 at "
        "sf0.01 vs brute force, floor-asserted in tests/test_recall.py "
        "— with exact symbol-Hamming verify on candidates only. "
        "Elastic DTW/Fréchet are sequential DPs that don't decompose; "
        "SAX is the distributed-literature answer and everything here "
        "after the scan is |users|-bounded. Alphabet boundaries are "
        "discrete order statistics (rank-selected means, zero "
        "interpolation arithmetic — cross-engine-deterministic by "
        "construction, r14); the rank window covers the same users x 8 "
        "domain the old percentile buffer did, and swaps to "
        "approx_percentile at 100 TB (users x 8 rows may still be "
        "large), same plan"
    ),
)
def q_trajectory_sim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairs of users whose value trajectories share SAX shape
    (symbol-Hamming <= 2 over 8 quartile symbols), candidates from a
    positional 3-gram equi join."""
    _seg, words = _sax_core(spark, sf_dir)
    cand = _sax_gram_candidates(words)
    scored = cand.select(
        "ua",
        "ub",
        F.expr(
            f"CAST(aggregate(sequence(1, {SEGMENTS}), CAST(0 AS BIGINT),"
            " (acc, k) -> acc + CAST(CASE WHEN substring(wa, k, 1)"
            " <> substring(wb, k, 1) THEN 1 ELSE 0 END AS BIGINT))"
            " AS BIGINT)"
        ).alias("hamming"),
    )
    return scored.filter(F.col("hamming") <= MAX_HAMMING).select(
        F.col("ua").alias("user_a"),
        F.col("ub").alias("user_b"),
        "hamming",
    )


@register(
    "q_trajectory_dtw",
    oracle=f"""
        WITH ordered AS (
            SELECT user_id,
                   ROW_NUMBER() OVER (PARTITION BY user_id
                                      ORDER BY epoch_us(ts), event_id) - 1
                       AS i,
                   COUNT(*) OVER (PARTITION BY user_id) AS n,
                   CAST(floor(value * 1000000.0 + 0.5) AS BIGINT) AS vg
            FROM events
        ),
        seg AS MATERIALIZED (
            SELECT user_id, (i * {SEGMENTS}) // n AS s,
                   CAST(SUM(vg) AS BIGINT) AS sg,
                   CAST(COUNT(*) AS BIGINT) AS c
            FROM ordered GROUP BY user_id, (i * {SEGMENTS}) // n
        ),
        means AS MATERIALIZED (
            SELECT user_id, s,
                   CAST(sg AS DOUBLE) / 1000000.0 / c AS m
            FROM seg
        ),
        {SAX_BOUNDS_CTES_SQL},
        sym AS (
            SELECT user_id, s,
                   CAST(CASE WHEN m > b3 THEN 3 WHEN m > b2 THEN 2
                             WHEN m > b1 THEN 1 ELSE 0 END AS BIGINT) AS y
            FROM means, bounds
        ),
        words AS (
            SELECT user_id,
                   list_reduce(
                       list_prepend('',
                           list_transform(list_sort(list(
                               lpad(CAST(s AS VARCHAR), 2, '0') ||
                               CAST(y AS VARCHAR))),
                               p -> substr(p, 3, 1))),
                       (acc, ch) -> acc || ch) AS w
            FROM sym GROUP BY user_id
        ),
        grams AS MATERIALIZED (
            SELECT user_id, g.g AS pos, substr(w, g.g + 1, {GRAM}) AS gram
            FROM words, (SELECT unnest(range(0, {SEGMENTS - GRAM + 1})) AS g) g
        ),
        cand AS (
            SELECT DISTINCT a.user_id AS ua, b.user_id AS ub
            FROM grams a JOIN grams b
              ON a.pos = b.pos AND a.gram = b.gram
             AND a.user_id < b.user_id
        ),
        series AS MATERIALIZED (
            SELECT user_id,
                   list_transform(list_sort(list([s, sg // c])),
                                  p -> p[2]) AS m
            FROM seg GROUP BY user_id
        ),
        pairs AS (
            SELECT c.ua, c.ub, sa.m AS ma, sb.m AS mb
            FROM cand c
            JOIN series sa ON sa.user_id = c.ua
            JOIN series sb ON sb.user_id = c.ub
        )
        SELECT ua AS user_a, ub AS user_b,
               list_reduce(
                   list_prepend(
                       list_transform(range(0, len(mb) + 1),
                           j -> CASE WHEN j = 0 THEN CAST(0 AS BIGINT)
                                     ELSE CAST({DTW_INF} AS BIGINT) END),
                       list_transform(range(1, len(ma) + 1), i -> [i])),
                   (prev, it) -> list_reduce(
                       list_prepend(CAST([{DTW_INF}] AS BIGINT[]),
                           list_transform(range(1, len(mb) + 1), j -> [j])),
                       (acc, jt) -> list_append(acc,
                           abs(ma[CAST(it[1] AS INT)]
                               - mb[CAST(jt[1] AS INT)])
                           + least(prev[CAST(jt[1] AS INT)],
                                   prev[CAST(jt[1] AS INT) + 1],
                                   acc[-1])))
               )[len(mb) + 1] AS dtw_grid,
               list_reduce(
                   list_prepend(
                       list_transform(range(0, len(mb) + 1),
                           j -> CASE WHEN j = 0 THEN CAST(0 AS BIGINT)
                                     ELSE CAST({DTW_INF} AS BIGINT) END),
                       list_transform(range(1, len(ma) + 1), i -> [i])),
                   (prev, it) -> list_reduce(
                       list_prepend(CAST([{DTW_INF}] AS BIGINT[]),
                           list_transform(range(1, len(mb) + 1), j -> [j])),
                       (acc, jt) -> list_append(acc,
                           greatest(
                               abs(ma[CAST(it[1] AS INT)]
                                   - mb[CAST(jt[1] AS INT)]),
                               least(prev[CAST(jt[1] AS INT)],
                                     prev[CAST(jt[1] AS INT) + 1],
                                     acc[-1]))))
               )[len(mb) + 1] AS frechet_grid
        FROM pairs
    """,
    family="trajectory",
    scale_notes=(
        "EXACT elastic distances — dynamic time warping AND discrete "
        "Fréchet (Eiter-Mannila), the measures q_trajectory_sim's "
        "notes documented as 'do not decompose relationally' — as a "
        "distributed SCORING operator: every pair of the SAX "
        "gram-candidate relation gets both full DPs over its "
        "user-bounded 8-segment PAA profiles (same recurrence; "
        "Fréchet swaps + for max). The DP is a nested "
        "JVM-side HOF aggregate (sequence/least — no Python), and "
        "because inputs are BIGINT 1e-6-grid segment means (truncating "
        "div == DuckDB // on integers, round-8 lesson) the cost is "
        "EXACT integer math — so this 'non-SQL-expressible' sequential "
        "DP carries a FULL HASH ORACLE (DuckDB runs the identical DP "
        "as nested list_reduce); every emitted value also equals an "
        "independently-written Python reference DP "
        "(tests/test_dtw.py). CONTRACT IS SCORING, NOT RETRIEVAL — "
        "measured on this ambient fixture, SAX gram candidates cover "
        "only 2/10 (magnitude) and 4/10 (z-normalized) of the top-10 "
        "true-DTW pairs: a candidate unit (quartile symbols) vs "
        "scored unit (grid magnitudes) mismatch, the round-9 "
        "two-stage-coupling class, stated rather than claimed away. "
        "For thresholded RETRIEVAL (all pairs with DTW <= tau) the "
        "sound route is now GRADED as the sibling "
        "q_trajectory_dtw_radius: the 1-component |a1-b1| bound "
        "measured here prunes nothing on this fixture (distances "
        "concentrate), but the 4-component LB_Kim max "
        "(first/last/min/max) prunes 99.6% at tau=range/20 on the "
        "same fixture and 95-99% on clustered corpora "
        "(scripts/scale_probe_dtw_cluster.py, round 11) — see that "
        "key's notes. O(81) integer cells per pair, "
        "|users|-bounded; INF + 15 path costs << 2^63 "
        "(headroom canary, tests/test_fixture_assumptions.py)"
    ),
)
def q_trajectory_dtw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact integer-grid DTW and discrete-Fréchet distances for every
    SAX gram-candidate user pair — elastic scoring over the
    q_trajectory_sim candidate machinery (scoring contract; see
    scale_notes for the measured candidate/metric coupling and the
    sound thresholded-retrieval recipe)."""
    seg, words = _sax_core(spark, sf_dir)
    # seg feeds BOTH the words subtree (via _sax_core's means) and the
    # series branch below — cache it so the events window+groupBy runs
    # once (the DuckDB oracle materializes seg for the same reason).
    # Shuffle-derived cache layout is AQE-sized via the global
    # canChangeCachedPlanOutputPartitioning conf (tables.py, round 9).
    seg = seg.cache()
    # Repartition the narrow candidate pair stream to core count before
    # the series attach: the nested-HOF DP stage otherwise runs in the
    # candidate distinct's byte-sized output layout (8 tasks under the
    # bench conf; AQE coalesces a vanilla session's layout to ~1-3
    # partitions for this KB-scale stream) while the per-pair DP is
    # compute-bound. Measured at sf0.1: DP tail 14.1 s -> 3.1 s
    # (82k pairs, 32 cores). Core-count-adaptive (guide §2.5); values
    # are exact integers, partition-independent. HASH by the pair key,
    # not round-robin (r15, ADVICE r14): RoundRobinPartitioning locally
    # sorts its entire input first (sortBeforeRepartition) while hash
    # partitioning skips that sort and is natively retry-deterministic
    # — the same fix the dedup pair streams got in r14 (cacf3f9);
    # distinct (ua, ub) pairs hash-spread uniformly by construction.
    cand = (
        _sax_gram_candidates(words)
        .select("ua", "ub")
        .repartition(spark.sparkContext.defaultParallelism, "ua", "ub")
    )
    series = _paa_series(seg)
    sa = series.select(
        F.col("user_id").alias("ua"), F.col("m").alias("ma")
    )
    sb = series.select(
        F.col("user_id").alias("ub"), F.col("m").alias("mb")
    )
    pairs = cand.join(sa, "ua").join(sb, "ub")
    return pairs.select(
        F.col("ua").alias("user_a"),
        F.col("ub").alias("user_b"),
        F.expr(elastic_dp_sql("dtw")).cast("bigint").alias("dtw_grid"),
        F.expr(elastic_dp_sql("frechet")).cast("bigint").alias(
            "frechet_grid"
        ),
    )


def _paa_series(seg: DataFrame) -> DataFrame:
    """(user_id, m): the ordered BIGINT PAA series per user — segment
    means via truncating div (Spark div == DuckDB // on integers,
    round-8 lesson). Shared by the DTW scoring and radius keys."""
    return seg.groupBy("user_id").agg(
        F.expr(
            "transform(array_sort(collect_list(array(s, sg div c))),"
            " x -> element_at(x, 2))"
        ).alias("m")
    )


_RADIUS_DIV = 20  # tau = (global grid range) div 20 (probe-calibrated)

_LB_KIM_SQL = (
    "greatest(abs(fa - fb), abs(la - lb_), abs(mna - mnb),"
    " abs(mxa - mxb))"
)


@register(
    "q_trajectory_dtw_radius",
    oracle=f"""
        WITH ordered AS (
            SELECT user_id,
                   ROW_NUMBER() OVER (PARTITION BY user_id
                                      ORDER BY epoch_us(ts), event_id) - 1
                       AS i,
                   COUNT(*) OVER (PARTITION BY user_id) AS n,
                   CAST(floor(value * 1000000.0 + 0.5) AS BIGINT) AS vg
            FROM events
        ),
        seg AS MATERIALIZED (
            SELECT user_id, (i * {SEGMENTS}) // n AS s,
                   CAST(SUM(vg) AS BIGINT) AS sg,
                   CAST(COUNT(*) AS BIGINT) AS c
            FROM ordered GROUP BY user_id, (i * {SEGMENTS}) // n
        ),
        feat AS MATERIALIZED (
            SELECT user_id, m, m[1] AS f, m[-1] AS l,
                   list_min(m) AS mn, list_max(m) AS mx
            FROM (
                SELECT user_id,
                       list_transform(list_sort(list([s, sg // c])),
                                      p -> p[2]) AS m
                FROM seg GROUP BY user_id
            )
        ),
        tau AS (
            SELECT greatest((MAX(mx) - MIN(mn)) // {_RADIUS_DIV},
                            CAST(1 AS BIGINT)) AS tau
            FROM feat
        ),
        pairs AS (
            SELECT a.user_id AS ua, b.user_id AS ub, a.m AS ma, b.m AS mb,
                   greatest(abs(a.f - b.f), abs(a.l - b.l),
                            abs(a.mn - b.mn), abs(a.mx - b.mx)) AS lb
            FROM feat a JOIN feat b ON a.user_id < b.user_id, tau
            WHERE greatest(abs(a.f - b.f), abs(a.l - b.l),
                           abs(a.mn - b.mn), abs(a.mx - b.mx)) <= tau.tau
        )
        SELECT ua AS user_a, ub AS user_b,
               CAST(lb AS BIGINT) AS lb_grid,
               list_reduce(
                   list_prepend(
                       list_transform(range(0, len(mb) + 1),
                           j -> CASE WHEN j = 0 THEN CAST(0 AS BIGINT)
                                     ELSE CAST({DTW_INF} AS BIGINT) END),
                       list_transform(range(1, len(ma) + 1), i -> [i])),
                   (prev, it) -> list_reduce(
                       list_prepend(CAST([{DTW_INF}] AS BIGINT[]),
                           list_transform(range(1, len(mb) + 1), j -> [j])),
                       (acc, jt) -> list_append(acc,
                           abs(ma[CAST(it[1] AS INT)]
                               - mb[CAST(jt[1] AS INT)])
                           + least(prev[CAST(jt[1] AS INT)],
                                   prev[CAST(jt[1] AS INT) + 1],
                                   acc[-1])))
               )[len(mb) + 1] AS dtw_grid
        FROM pairs
    """,
    family="trajectory",
    scale_notes=(
        "thresholded DTW RETRIEVAL with a SOUND candidate stage — the "
        "tier q_trajectory_dtw's scoring contract pointed at (VERDICT "
        "r10 what's-missing #3). Radius tau = (global grid range) div "
        "20, data-derived so fixture regens rescale it. Candidates: "
        "4-component LB_Kim bound for unconstrained |.|-cost DTW — "
        "max(|a1-b1|, |an-bn|, |min A - min B|, |max A - max B|) — "
        "every component provably <= DTW (the (1,1)/(na,nb) cells sit "
        "on every warping path; an extreme of one series aligns to "
        "SOME element of the other, bounded by that series' extreme), "
        "so DTW <= tau implies LB <= tau and RECALL IS 1.0 BY "
        "CONSTRUCTION, asserted vs brute force in tests/test_dtw.py. "
        "Distributed realization: equi join on floor((a1 - gmin)/tau) "
        "buckets with +-1 probes (|a1-b1| <= tau forces adjacent "
        "buckets — the q_join_range shape, never all-pairs), exact LB "
        "post-filter, exact integer DP re-score on survivors only. "
        "Pruning MEASURED (scripts/scale_probe_dtw_cluster.py): 99.6% "
        "of all-pairs on this fixture at tau=range/20, 95-99% on "
        "K=20/100 clustered corpora (the regime the recipe assumes), "
        "99.8% ambient-random — the same bound that prunes NOTHING in "
        "its 1-component |a1-b1| form (round-10 measurement, still "
        "true). Per-relation census of THIS plan on clustered Spark "
        "fixtures (SCALE.md round-13, via _radius_pairs, adjudicated "
        "graded==survivors): RAW bucket-join candidates are a "
        "constant-fraction quadratic — measured flat 14.7-14.9% of "
        "all-pairs in every regime, the closed form ~3*tau/range of "
        "the +-1 probe over ~range/tau buckets (tau is the density "
        "dial; the bucket stage guarantees recall, never sparsity — "
        "the LSH-band census lesson class). LB SURVIVORS: ~n^2.02 "
        "under fixed K=100 — quadratic because the ANSWER set "
        "(within-cluster pairs ~n^2/K) is — and ~n^1.41 falling "
        "toward the true-pair floor when archetype diversity grows "
        "with n (K=n/20); no sound filter can emit fewer rows than "
        "the answer; survivors are 2-7% of raw. "
        "Emits (pair, lb_grid, dtw_grid) for every LB survivor "
        "— the sound superset of any DTW <= tau' answer for tau' <= "
        "tau, with exact distances attached; all-integer, full hash "
        "oracle despite the sequential DP (nested list_reduce twin)"
    ),
)
def q_trajectory_dtw_radius(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All user pairs within LB_Kim radius tau = range/20 of each
    other, with exact integer-grid DTW on the survivors — sound
    (recall-1.0) thresholded retrieval via a bucketed equi join."""
    _raw, pairs = _radius_pairs(spark, sf_dir)
    return pairs.select(
        F.col("ua").alias("user_a"),
        F.col("ub").alias("user_b"),
        F.expr(_LB_KIM_SQL).cast("bigint").alias("lb_grid"),
        F.expr(elastic_dp_sql("dtw")).cast("bigint").alias("dtw_grid"),
    )


def _radius_pairs(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame]:
    """The radius key's two candidate relations, for the key itself and
    for the per-relation scale census (SCALE.md round-13; the round-11
    lesson: census claims must name the exact relation, and an
    extracted relation must be adjudicated against prior measurements
    of the same corpus — the probe asserts the survivor count equals
    the graded key's own output count on every corpus it measures).

    Returns (raw, survivors): ``raw`` = the bucket equi join's output
    with the ua < ub dedup but BEFORE the LB post-filter (what the
    shuffle pays for); ``survivors`` = after ``LB_Kim <= tau`` (what
    the exact DP re-score pays for — the sound answer superset)."""
    seg, _words = _sax_core(spark, sf_dir)
    # cache the small per-user feature table: the scalars aggregate and
    # the probe/index sides would otherwise each recompute the events
    # window + double groupBy subtree (the q_trajectory_dtw seg-cache
    # rationale; AQE sizes the cached layout via the round-9 conf)
    feat = _paa_series(seg).select(
        "user_id",
        "m",
        F.expr("element_at(m, 1)").alias("f"),
        F.expr("element_at(m, -1)").alias("l"),
        F.array_min("m").alias("mn"),
        F.array_max("m").alias("mx"),
    ).cache()
    scalars = feat.agg(
        F.expr(
            f"greatest((max(mx) - min(mn)) div {_RADIUS_DIV},"
            " CAST(1 AS BIGINT))"
        ).alias("tau"),
        F.min("mn").alias("gmin"),
    )
    fs = feat.crossJoin(F.broadcast(scalars)).withColumn(
        "bkt", F.expr("(f - gmin) div tau")
    )
    probe = fs.select(
        F.col("user_id").alias("ua"),
        F.col("m").alias("ma"),
        F.col("f").alias("fa"),
        F.col("l").alias("la"),
        F.col("mn").alias("mna"),
        F.col("mx").alias("mxa"),
        "tau",
        F.explode(
            F.array(F.col("bkt") - 1, F.col("bkt"), F.col("bkt") + 1)
        ).alias("jb"),
    )
    index = fs.select(
        F.col("user_id").alias("ub"),
        F.col("m").alias("mb"),
        F.col("f").alias("fb"),
        F.col("l").alias("lb_"),
        F.col("mn").alias("mnb"),
        F.col("mx").alias("mxb"),
        F.col("bkt").alias("jb"),
    )
    raw = probe.join(index, "jb").filter(F.col("ua") < F.col("ub"))
    return raw, raw.filter(F.expr(_LB_KIM_SQL) <= F.col("tau"))


def elastic_dp_sql(measure: str, a: str = "ma", b: str = "mb") -> str:
    """SQL text for the elastic DP over two BIGINT array columns.

    ``measure='dtw'`` accumulates path cost (cell = cost + min of the
    three predecessors); ``measure='frechet'`` is the discrete Fréchet
    coupling distance — the IDENTICAL recurrence with max in place of
    plus (cell = max(cost, min of predecessors)), per Eiter & Mannila
    1994. Shared here so tests can drive the exact expression the key
    uses on literal arrays.
    """
    inf = f"CAST({DTW_INF} AS BIGINT)"
    cost = f"abs(element_at({a}, i) - element_at({b}, j))"
    best = (
        "least(element_at(prev, j), element_at(prev, j + 1),"
        " element_at(acc, -1))"
    )
    cell = (
        f"{cost} + {best}"
        if measure == "dtw"
        else f"greatest({cost}, {best})"
    )
    return (
        "element_at("
        "  aggregate("
        f"   sequence(1, size({a})),"
        f"   transform(sequence(0, size({b})),"
        f"             j -> IF(j = 0, CAST(0 AS BIGINT), {inf})),"
        "    (prev, i) -> aggregate("
        f"       sequence(1, size({b})),"
        f"       array({inf}),"
        f"       (acc, j) -> concat(acc, array({cell}))),"
        "    row -> row),"
        f"  size({b}) + 1)"
    )
