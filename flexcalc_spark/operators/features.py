"""Feature engineering for model training: the hashing-trick
vectorizer (per-doc sparse bag-of-words into a fixed 256-dim space).

The hashing trick is what makes text featurization embarrassingly
parallel at corpus scale: no vocabulary pass, no dictionary broadcast,
no OOV handling — each token maps to ``portable_hash(token) mod D``
scan-side, and a doc's sparse vector is one local groupBy. Collisions
are the accepted trade (two tokens sharing a bucket add their counts),
which is exactly how Vowpal Wabbit / scikit's HashingVectorizer ship.

Portability: the hash must match the oracle BIT-FOR-BIT, so it is the
md5-hex fold already proven by q_sample_weighted / q_table_checksum
(first 8 hex digits as a base-16 integer) — never engine-private hash
functions (xxhash64 exists only on the Spark side).

Output is one row per doc with the sparse vector rendered
``idx:cnt`` comma-joined in index order — indices zero-padded to 3
digits so lexicographic list_sort equals numeric order on both engines
(DuckDB 1.0 has no ORDER BY inside string_agg). The driver
canonicalizer rejects array cells; the string is deterministic because
both the fold and the ordering are exact.

Reference cite (mount empty, SURVEY §0): public flexcalc has no text
surface; the construction is the standard hashing-trick featurizer
(Weinberger et al. 2009).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flexcalc_spark.registry import register
from flexcalc_spark.tables import table_parallel

HASH_DIM = 256


@register(
    "q_feature_hash",
    oracle=f"""
        WITH tok AS (
            SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w
            FROM documents
        ),
        hashed AS (
            SELECT doc_id,
                   CAST(list_reduce(
                       list_prepend(CAST(0 AS BIGINT),
                           list_transform(range(1, 9),
                               k -> CAST(strpos('0123456789abcdef',
                                        substr(md5('fh:' || w), k, 1)) - 1
                                    AS BIGINT))),
                       (acc, x) -> acc * 16 + x) AS BIGINT) % {HASH_DIM}
                       AS idx
            FROM tok WHERE w <> ''
        ),
        cell AS (
            SELECT doc_id, idx, COUNT(*) AS cnt
            FROM hashed GROUP BY doc_id, idx
        )
        SELECT doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_features,
               array_to_string(list_sort(list(
                   lpad(CAST(idx AS VARCHAR), 3, '0') || ':' ||
                   CAST(cnt AS VARCHAR))), ',') AS features
        FROM cell GROUP BY doc_id
    """,
    family="features",
    scale_notes=(
        "hashing-trick vectorizer: tokens map to hash(token) mod 256 "
        "scan-side (no vocabulary pass, no dictionary broadcast, no "
        "OOV path — the property that makes featurizing 100 TB one "
        "linear scan), per-doc sparse vectors collapse in a local "
        "groupBy whose shuffle is bounded by docs x distinct buckets. "
        "The hash is the engine-portable md5 fold, and the sparse "
        "rendering is index-ordered so the output string is exact. "
        "Dimension D trades collision rate for width exactly as in "
        "production hashing vectorizers"
    ),
)
def q_feature_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc 256-dim hashing-trick sparse vectors ('idx:cnt' comma
    string, index-ordered) over whitespace tokens."""
    d = table_parallel(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", F.explode(F.split(F.lower("text"), " ")).alias("w")
    ).filter(F.col("w") != "")
    idx = F.expr(
        "aggregate(sequence(1, 8), CAST(0 AS BIGINT),"
        " (acc, k) -> acc * 16 + CAST(instr('0123456789abcdef',"
        " substring(md5(CAST('fh:' || w AS BINARY)), k, 1)) - 1 AS BIGINT))"
        f" % {HASH_DIM}"
    )
    cell = (
        tok.select("doc_id", idx.alias("idx"))
        .groupBy("doc_id", "idx")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return cell.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_features"),
        F.array_join(
            F.array_sort(
                F.collect_list(
                    F.concat_ws(
                        ":",
                        F.lpad(F.col("idx").cast("string"), 3, "0"),
                        F.col("cnt").cast("string"),
                    )
                )
            ),
            ",",
        ).alias("features"),
    )


# --- in-engine supervised training (logistic regression) -------------
LOGIT_ITERS = 5
LOGIT_LR = 0.5
# per-row gradient terms ride the 1e-6 grid; sigmoid's cross-engine exp
# ulp (~1e-16 absolute) sits ~1e-10 grid-widths from any boundary
_GRID = "1000000.0"


def _logit_terms(w0: str, w1: str) -> tuple[str, str]:
    """Grid-quantized per-row gradient terms at weights (w0, w1); the
    text is shared verbatim between the Spark plan and the oracle."""
    sig = f"(1.0 / (1.0 + exp(-(({w0}) * x + ({w1})))))"
    g0 = f"CAST(floor(({sig} - y) * x * {_GRID} + 0.5) AS BIGINT)"
    g1 = f"CAST(floor(({sig} - y) * {_GRID} + 0.5) AS BIGINT)"
    return g0, g1


def _logit_oracle() -> str:
    feat = """feat AS MATERIALIZED (
        SELECT o_totalprice / 100000.0 AS x,
               CASE WHEN o_orderpriority = '1-URGENT' THEN 1.0 ELSE 0.0 END
                   AS y
        FROM orders
    ),
    n AS MATERIALIZED (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM feat)"""
    ctes = [feat, "w0 AS MATERIALIZED (SELECT 0.0 AS a, 0.0 AS b)"]
    for k in range(1, LOGIT_ITERS + 1):
        g0, g1 = _logit_terms(
            f"(SELECT a FROM w{k-1})", f"(SELECT b FROM w{k-1})"
        )
        ctes.append(
            f"""g{k} AS MATERIALIZED (
                SELECT SUM({g0}) AS s0, SUM({g1}) AS s1 FROM feat
            )"""
        )
        ctes.append(
            f"""w{k} AS MATERIALIZED (
                SELECT (SELECT a FROM w{k-1})
                       - {LOGIT_LR} * (CAST(s0 AS DOUBLE) / {_GRID}
                                       / (SELECT n FROM n)) AS a,
                       (SELECT b FROM w{k-1})
                       - {LOGIT_LR} * (CAST(s1 AS DOUBLE) / {_GRID}
                                       / (SELECT n FROM n)) AS b
                FROM g{k}
            )"""
        )
    wf = f"w{LOGIT_ITERS}"
    sig = (
        f"(1.0 / (1.0 + exp(-((SELECT a FROM {wf}) * x"
        f" + (SELECT b FROM {wf})))))"
    )
    return (
        "WITH "
        + ", ".join(ctes)
        + f"""
        SELECT (SELECT a FROM {wf}) AS w_price,
               (SELECT b FROM {wf}) AS w_bias,
               (SELECT n FROM n) AS n,
               CAST(SUM(CASE WHEN ({sig} >= 0.5 AND y = 1.0)
                              OR ({sig} < 0.5 AND y = 0.0)
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_correct
        FROM feat
        """
    )


@register(
    "q_logistic_train",
    oracle=_logit_oracle(),
    family="features",
    scale_notes=(
        "supervised training in-engine: 5 full-batch gradient-descent "
        "iterations of logistic regression (urgency ~ price), each "
        "iteration ONE scan producing two exact BIGINT gradient sums "
        "(per-row terms grid-quantized BEFORE summing, so the "
        "partial-merge order cannot perturb the weights — the same "
        "discipline that makes every aggregate here "
        "partitioning-independent), weights updated from the 2-cell "
        "aggregate. Spark runs the loop with a 1-row collect per round "
        "(q_kmeans codebook pattern); the oracle unrolls identical "
        "iterations as MATERIALIZED CTEs, so learned weights AND "
        "training accuracy hash-match. At 100 TB: gradient scans "
        "dominate, the update is O(d); minibatch = add the "
        "q_sample_split hash filter per round"
    ),
)
def q_logistic_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train logistic regression (is-urgent ~ scaled price + bias) with
    5 exact-gradient iterations; output weights, n, training correct
    count."""
    from flexcalc_spark.tables import table

    o = table(spark, sf_dir, "orders")
    feat = o.selectExpr(
        "o_totalprice / 100000.0 AS x",
        "CASE WHEN o_orderpriority = '1-URGENT' THEN 1.0 ELSE 0.0 END AS y",
    ).cache()
    n = feat.count()
    w0, w1 = 0.0, 0.0
    for _ in range(LOGIT_ITERS):
        g0, g1 = _logit_terms(repr(w0), repr(w1))
        row = feat.selectExpr(
            f"{g0} AS t0", f"{g1} AS t1"
        ).agg({"t0": "sum", "t1": "sum"}).collect()[0]
        s0, s1 = row["sum(t0)"], row["sum(t1)"]
        w0 = w0 - LOGIT_LR * (s0 / 1000000.0 / n)
        w1 = w1 - LOGIT_LR * (s1 / 1000000.0 / n)
    sig = f"(1.0 / (1.0 + exp(-(({w0!r}) * x + ({w1!r})))))"
    return feat.selectExpr(
        "x",
        "y",
        f"CASE WHEN ({sig} >= 0.5 AND y = 1.0)"
        f" OR ({sig} < 0.5 AND y = 0.0) THEN 1 ELSE 0 END AS ok",
    ).agg(
        F.lit(w0).alias("w_price"),
        F.lit(w1).alias("w_bias"),
        F.lit(n).cast("bigint").alias("n"),
        F.sum("ok").cast("bigint").alias("n_correct"),
    )


# ------------------------------------------------ target encoding
TENC_SMOOTH = 20  # pseudo-count toward the global mean (standard m)


@register(
    "q_target_encode",
    oracle=f"""
        -- smoothed (m-estimate) target encoding of the customer-nation
        -- category against the is-urgent order target; exact-integer
        -- rational arithmetic throughout (enc = (s + m*gm)/(n + m) with
        -- gm = ts/tn, cleared of denominators), floor division on
        -- non-negative operands so Spark div == DuckDB //
        WITH cell AS MATERIALIZED (
            SELECT c.c_nationkey AS nationkey,
                   CAST(COUNT(*) AS BIGINT) AS n_orders,
                   CAST(SUM(CASE WHEN o.o_orderpriority = '1-URGENT'
                            THEN 1 ELSE 0 END) AS BIGINT) AS n_urgent
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
            GROUP BY 1
        ),
        tot AS (
            SELECT SUM(n_orders) AS tn, SUM(n_urgent) AS ts FROM cell
        )
        SELECT nationkey, n_orders, n_urgent,
               CAST((n_urgent * tn + {TENC_SMOOTH} * ts) * 1000000
                    // ((n_orders + {TENC_SMOOTH}) * tn) AS BIGINT)
                   AS enc_ppm
        FROM cell, tot
    """,
    family="features",
    scale_notes=(
        "smoothed target encoding (the m-estimate categorical encoder "
        "every tabular training pipeline ships): ONE fact scan with an "
        "UNHINTED per-customer attach (the map grows with the corpus — "
        "AQE broadcasts at fixture scale, shuffles at 100 TB; the "
        "q_cohort_ltv rule), partial+final count/sum into "
        "|categories| narrow rows, global totals via an empty-frame "
        "window over those rows (zero extra scans), per-category "
        "encoding as exact BIGINT rational arithmetic — "
        "(s + m*ts/tn)/(n + m) cleared of denominators and floor-"
        "quantized to ppm, so the result is partition-order-independent "
        "and engine-identical. Overflow bound (n_urgent*tn*1e6 < 2^63) "
        "holds to ~2M total orders per the fixture canary; past that, "
        "compute the encoding per shard and merge exact partials, or "
        "coarsen the grid. At 100 TB this is scan-bound: the category "
        "table is KB-sized and broadcasts back onto the training scan "
        "for the actual feature attach"
    ),
)
def q_target_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-category smoothed target encoding: nation of the ordering
    customer vs the is-urgent target — (nationkey, n_orders, n_urgent,
    enc_ppm) with enc = (s + m*global_mean) / (n + m) on an exact
    integer ppm grid."""
    from pyspark.sql.window import Window

    from flexcalc_spark.tables import table

    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"),
        F.col("c_nationkey").alias("nationkey"),
    )
    # UNHINTED dim attach: the customer map is per-user and grows with
    # the corpus (the q_cohort_ltv ADVICE-r7 rule) — AQE broadcasts it
    # at fixture scale and shuffles past the threshold
    cell = (
        o.select("o_custkey", "o_orderpriority")
        .join(c, "o_custkey")
        .groupBy("nationkey")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.sum(
                F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_urgent"),
        )
    )
    # global totals as an empty-partition window over the |categories|
    # grouped rows: one pass, no second fact scan, no self-join
    w = Window.partitionBy()
    with_tot = cell.withColumn(
        "tn", F.sum("n_orders").over(w)
    ).withColumn("ts", F.sum("n_urgent").over(w))
    return with_tot.select(
        "nationkey",
        "n_orders",
        "n_urgent",
        F.expr(
            f"CAST((n_urgent * tn + {TENC_SMOOTH} * ts) * 1000000"
            f" div ((n_orders + {TENC_SMOOTH}) * tn) AS BIGINT)"
        ).alias("enc_ppm"),
    )
