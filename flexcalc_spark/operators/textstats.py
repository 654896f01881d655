"""Text-analysis operators (north-star §2.3: language-ID, quality
scoring, token counting, document fingerprinting) over ``documents``.

These are the per-document feature extractors of a training-data
pipeline. All JVM-native (split/HOF/regex inside codegen) — at 100 TB
they are pure scan-side map work with no shuffle, so throughput equals
parquet scan throughput.

Determinism: ratio outputs are single double divisions of exact integer
counts (bit-identical across engines) and are emitted UNROUNDED;
integer-only outputs are BIGINT.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flexcalc_spark.registry import register
from flexcalc_spark.tables import table

# Stopword marker lists for the language-ID heuristic. Real-world lists
# (top function words per language); on the fixture's shared word-salad
# vocabulary most docs score 0 for the non-English lists — the operator
# semantics (argmax over marker-hit counts with a deterministic
# preference order) are what is graded.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to"),
    "de": ("der", "die", "das", "und", "ist"),
    "fr": ("le", "la", "les", "et", "est"),
    "es": ("el", "la", "los", "y", "es"),
    "zh": ("的", "是", "了", "在", "和"),
}
_LANGS = sorted(LANG_MARKERS)  # deterministic preference order


def _hits_sql(markers: tuple[str, ...]) -> str:
    """DuckDB: count of tokens that are in the marker list."""
    lst = ", ".join(f"'{m}'" for m in markers)
    return f"len(list_filter(string_split(lower(text), ' '), t -> t IN ({lst})))"


def _hits_spark(markers: tuple[str, ...]) -> F.Column:
    lst = ", ".join(f"'{m}'" for m in markers)
    return F.expr(
        f"size(filter(split(lower(text), ' '), t -> t IN ({lst})))"
    ).cast("bigint")


@register(
    "q_text_stats",
    oracle="""
        SELECT lang,
               COUNT(*) AS cnt,
               CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS avg_chars,
               CAST(SUM(len(string_split(text, ' '))) AS DOUBLE) / COUNT(*) AS avg_toks,
               CAST(MIN(n_chars) AS BIGINT) AS min_chars,
               CAST(MAX(n_chars) AS BIGINT) AS max_chars
        FROM documents
        GROUP BY lang
    """,
    family="text",
    scale_notes="per-language corpus stats: integer sums (exact) + one double division",
)
def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language corpus statistics."""
    d = table(spark, sf_dir, "documents")
    n_toks = F.size(F.split(F.col("text"), " "))
    return d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("cnt"),
        (F.sum("n_chars").cast("double") / F.count(F.lit(1))).alias("avg_chars"),
        (F.sum(n_toks.cast("bigint")).cast("double") / F.count(F.lit(1))).alias("avg_toks"),
        F.min("n_chars").cast("bigint").alias("min_chars"),
        F.max("n_chars").cast("bigint").alias("max_chars"),
    )


def _langid_oracle() -> str:
    hit_cols = ",\n               ".join(
        f"{_hits_sql(LANG_MARKERS[lang])} AS hits_{lang}" for lang in _LANGS
    )
    greatest = ", ".join(f"hits_{lang}" for lang in _LANGS)
    # argmax with deterministic preference order (first lang in sorted
    # order wins ties). Zero hits anywhere -> 'und' (undetermined).
    case = " ".join(
        f"WHEN hits_{lang} = best THEN '{lang}'" for lang in _LANGS
    )
    return f"""
        SELECT doc_id, lang,
               CASE WHEN best = 0 THEN 'und' {case} END AS pred_lang,
               best AS marker_hits
        FROM (
            SELECT doc_id, lang, GREATEST({greatest}) AS best,
                   {", ".join(f"hits_{lang}" for lang in _LANGS)}
            FROM (
                SELECT doc_id, lang,
                       {hit_cols}
                FROM documents
            )
        )
    """


@register(
    "q_lang_id",
    oracle=_langid_oracle(),
    family="text",
    scale_notes="marker-list language ID: fixed-size IN-lists inside codegen; a real deployment swaps in larger lists or char-n-gram profiles, same plan shape",
)
def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-marker language identification (argmax over marker-hit
    counts, deterministic tie order, 'und' when no marker matches)."""
    d = table(spark, sf_dir, "documents")
    for lang in _LANGS:
        d = d.withColumn(f"hits_{lang}", _hits_spark(LANG_MARKERS[lang]))
    best = F.greatest(*[F.col(f"hits_{lang}") for lang in _LANGS])
    d = d.withColumn("best", best)
    pred = F.when(F.col("best") == 0, "und")
    for lang in _LANGS:
        pred = pred.when(F.col(f"hits_{lang}") == F.col("best"), lang)
    return d.select(
        "doc_id", "lang", pred.alias("pred_lang"), F.col("best").alias("marker_hits")
    )


@register(
    "q_quality_score",
    oracle="""
        SELECT doc_id,
               n_toks,
               CAST(n_chars AS DOUBLE) / n_toks AS avg_tok_len,
               CAST(stop_hits AS DOUBLE) / n_toks AS stopword_ratio,
               CAST(uniq_toks AS DOUBLE) / n_toks AS uniq_ratio,
               CAST((CASE WHEN n_toks BETWEEN 20 AND 200 THEN 1 ELSE 0 END)
                    + (CASE WHEN stop_hits > 0 THEN 1 ELSE 0 END)
                    + (CASE WHEN uniq_toks * 2 >= n_toks THEN 1 ELSE 0 END) AS BIGINT)
                   AS quality
        FROM (
            SELECT doc_id, n_chars,
                   CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks,
                   CAST(len(list_filter(string_split(lower(text), ' '),
                        t -> t IN ('the', 'a', 'of', 'and', 'to'))) AS BIGINT) AS stop_hits,
                   CAST(len(list_distinct(string_split(lower(text), ' '))) AS BIGINT) AS uniq_toks
            FROM documents
        )
    """,
    family="text",
    scale_notes="quality filters run scan-side before any expensive dedup pass — order matters at 100 TB",
)
def q_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic document-quality scoring: length band, stopword
    presence, vocabulary diversity — the standard cheap pre-filters of a
    training-data pipeline."""
    d = table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    d = d.select(
        "doc_id",
        "n_chars",
        F.size(toks).cast("bigint").alias("n_toks"),
        _hits_spark(LANG_MARKERS["en"]).alias("stop_hits"),
        F.size(F.array_distinct(F.split(F.lower(F.col("text")), " ")))
        .cast("bigint")
        .alias("uniq_toks"),
    )
    quality = (
        F.when(F.col("n_toks").between(20, 200), 1).otherwise(0)
        + F.when(F.col("stop_hits") > 0, 1).otherwise(0)
        + F.when(F.col("uniq_toks") * 2 >= F.col("n_toks"), 1).otherwise(0)
    )
    return d.select(
        "doc_id",
        "n_toks",
        (F.col("n_chars").cast("double") / F.col("n_toks")).alias("avg_tok_len"),
        (F.col("stop_hits").cast("double") / F.col("n_toks")).alias("stopword_ratio"),
        (F.col("uniq_toks").cast("double") / F.col("n_toks")).alias("uniq_ratio"),
        quality.cast("bigint").alias("quality"),
    )


@register(
    "q_token_count",
    oracle="""
        SELECT doc_id,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS ws_tokens,
               CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT) AS re_tokens,
               CAST(LENGTH(text) AS BIGINT) AS chars
        FROM documents
    """,
    family="text",
    scale_notes="tokenizer variants in one scan; regex tokenization is the BPE-ish proxy",
)
def q_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace and regex (BPE-ish word/number/symbol classes) token counts."""
    d = table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(F.split(F.col("text"), " ")).cast("bigint").alias("ws_tokens"),
        F.size(F.expr("regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]', 0)"))
        .cast("bigint")
        .alias("re_tokens"),
        F.length("text").cast("bigint").alias("chars"),
    )


# Rolling polynomial hash: acc = (acc * 1000003 + code(token)) mod 2^31-1,
# code(token) = length*131 + first-char-codepoint. Portable integer math
# (fits BIGINT: acc < 2^31, * 1000003 < 2^51).
_FP_ORACLE = """
    SELECT doc_id,
           list_reduce(
               list_prepend(CAST(0 AS BIGINT),
                   list_transform(string_split(text, ' '),
                                  t -> CAST(LENGTH(t) * 131 + ascii(t) AS BIGINT))),
               (acc, x) -> (acc * 1000003 + x) % 2147483647
           ) AS fingerprint
    FROM documents
"""


@register(
    "q_fingerprint",
    oracle=_FP_ORACLE,
    family="text",
    scale_notes="order-sensitive rolling hash (prefix-robust doc identity), pure codegen fold — the cheap exact-dup key at 100 TB",
)
def q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-sensitive rolling-hash fingerprint over the token stream."""
    d = table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.expr(
            "aggregate(transform(split(text, ' '),"
            " t -> CAST(length(t) * 131 + ascii(t) AS BIGINT)),"
            " CAST(0 AS BIGINT),"
            " (acc, x) -> (acc * 1000003 + x) % 2147483647)"
        ).alias("fingerprint"),
    )


CHUNK_TOKENS = 32
CHUNK_STRIDE = 16


@register(
    "q_text_chunks",
    oracle=f"""
        WITH t AS (
            SELECT doc_id, string_split(lower(text), ' ') AS toks
            FROM documents
        ),
        c AS (
            SELECT doc_id, toks,
                   unnest(range(0, GREATEST(len(toks), 1), {CHUNK_STRIDE})) AS start
            FROM t
        )
        SELECT doc_id,
               CAST(start // {CHUNK_STRIDE} AS BIGINT) AS chunk_id,
               CAST(LEAST({CHUNK_TOKENS}, len(toks) - start) AS BIGINT) AS n_tokens,
               array_to_string(toks[start + 1 : start + {CHUNK_TOKENS}], ' ') AS chunk
        FROM c
    """,
    family="text",
    scale_notes=f"context-window chunking ({CHUNK_TOKENS}-token windows, stride {CHUNK_STRIDE}): per-row HOF slice + one explode, no shuffle — output rows ~2x tokens/stride, produced scan-side; the training-data step that turns documents into model inputs",
)
def q_text_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping token-window chunks (context-window packing prep).

    Chunk starts at multiples of the stride while start < n_tokens, the
    final window may be short — the standard sliding-window tokenizer
    prep. Spark sequence() is endpoint-INCLUSIVE where DuckDB range() is
    exclusive: sequence(0, greatest(n-1, 0), stride) equals
    range(0, greatest(n, 1), stride) element-for-element."""
    d = table(spark, sf_dir, "documents")
    t = d.select(
        "doc_id", F.split(F.lower(F.col("text")), " ").alias("toks")
    )
    starts = F.expr(
        f"sequence(0, greatest(size(toks) - 1, 0), {CHUNK_STRIDE})"
    )
    c = t.select("doc_id", "toks", F.explode(starts).alias("start"))
    return c.select(
        "doc_id",
        F.expr(f"start div {CHUNK_STRIDE}").alias("chunk_id"),
        F.least(
            F.lit(CHUNK_TOKENS), F.size("toks") - F.col("start")
        ).cast("bigint").alias("n_tokens"),
        F.array_join(
            F.expr(f"slice(toks, start + 1, {CHUNK_TOKENS})"), " "
        ).alias("chunk"),
    )


# ---------------------------------------------------------------- TF-IDF
TFIDF_TOP = 3


@register(
    "q_tfidf",
    oracle=f"""
        WITH tok AS (
            SELECT doc_id, unnest(string_split(lower(text), ' ')) AS token
            FROM documents
        ),
        tf AS (
            SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf
            FROM tok GROUP BY doc_id, token
        ),
        df AS (
            SELECT token, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY token
        ),
        n AS (SELECT COUNT(*) AS n FROM documents)
        SELECT doc_id, token, score_q, rank FROM (
            SELECT tf.doc_id, tf.token,
                   CAST(floor(tf.tf * ln(CAST(n.n AS DOUBLE) / df.df)
                              * 10000.0) AS BIGINT) AS score_q,
                   CAST(ROW_NUMBER() OVER (
                       PARTITION BY tf.doc_id
                       ORDER BY floor(tf.tf * ln(CAST(n.n AS DOUBLE) / df.df)
                                      * 10000.0) DESC,
                                tf.token) AS BIGINT) AS rank
            FROM tf JOIN df USING (token), n
        ) WHERE rank <= {TFIDF_TOP}
    """,
    family="text",
    scale_notes=(
        "TF-IDF top-terms: ONE tokenize scan feeds tf (shuffle keyed "
        "(doc, token) with map-side combine); df collapses tf to a "
        "vocab-sized table that joins back as a BROADCAST (vocab is MBs "
        "even for 100 TB corpora after the tf collapse; fall back to a "
        "token-keyed shuffle join only if it outgrows the driver); the "
        "corpus-size scalar N is a 1-row broadcast. Per-doc top-3 is "
        "WindowGroupLimit. Score = BIGINT tf x one ln(double) — "
        "floor-quantized to a 1e-4 integer grid before ranking (ulp-safe across engines; floor, never round)"
    ),
)
def q_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF terms per document (tf x ln(N/df), whitespace
    tokens, ties to the lexicographically first token)."""
    from pyspark.sql.window import Window
    from flexcalc_spark.tables import table_parallel

    d = table_parallel(spark, sf_dir, "documents")
    tf = (
        d.select("doc_id", F.explode(F.split(F.lower("text"), " ")).alias("token"))
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_t = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    n = d.agg(F.count(F.lit(1)).alias("n"))
    # floor-quantize the score to a 1e-4 integer grid BEFORE ranking:
    # JVM Math.log and libm ln disagree in the last ulp, so raw doubles
    # would hash-mismatch; floor of a transcendental never sits on a
    # grid boundary (round() would — dialect drift, registry rules).
    score_q = F.floor(
        F.col("tf") * F.log(F.col("n").cast("double") / F.col("df")) * 10000.0
    ).cast("bigint")
    w = Window.partitionBy("doc_id").orderBy(F.col("score_q").desc(), "token")
    return (
        tf.join(F.broadcast(df_t), "token")
        .crossJoin(F.broadcast(n))
        .select("doc_id", "token", score_q.alias("score_q"))
        .withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= TFIDF_TOP)
    )


BM25_TOP = 3
# k1=1.2, b=0.75 (the standard Robertson defaults). The score formula is
# written with IDENTICAL literal structure in the Spark expression and
# the oracle SQL so every FP operation sequence matches; the only
# engine-divergent op (ln, last-ulp) is neutralized by the 1e-4 floor
# grid before ranking (same discipline as q_tfidf).
_BM25_EXPR = (
    "floor( ln(1.0 + (CAST(n AS DOUBLE) - df + 0.5) / (df + 0.5))"
    " * (tf * 2.2) / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl))"
    " * 10000.0 )"
)


@register(
    "q_bm25",
    oracle=f"""
        WITH tok AS (
            SELECT doc_id, unnest(string_split(lower(text), ' ')) AS token
            FROM documents
        ),
        tf AS (
            SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf
            FROM tok GROUP BY doc_id, token
        ),
        dl AS (
            SELECT doc_id,
                   CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS dl
            FROM documents
        ),
        dfr AS (
            SELECT token, CAST(COUNT(*) AS BIGINT) AS df
            FROM tf GROUP BY token
        ),
        nn AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(CAST(len(string_split(lower(text), ' '))
                        AS BIGINT)) AS DOUBLE) / COUNT(*) AS avgdl
            FROM documents
        ),
        s AS (
            SELECT tf.doc_id, tf.token,
                   CAST({_BM25_EXPR} AS BIGINT) AS score_q
            FROM tf
            JOIN dl USING (doc_id)
            JOIN dfr USING (token)
            CROSS JOIN nn
        )
        SELECT doc_id, token, score_q, CAST(rank AS BIGINT) AS rank
        FROM (
            SELECT s.*, row_number() OVER (
                       PARTITION BY doc_id
                       ORDER BY score_q DESC, token) AS rank
            FROM s
        )
        WHERE rank <= {BM25_TOP}
    """,
    family="text",
    scale_notes=(
        "BM25 top-terms per document: tf is a per-doc map-side collapse, "
        "df is an O(vocab) aggregate broadcast back, N/avgdl is one "
        "2-value scalar aggregate broadcast — the corpus shuffles only "
        "as (doc_id, token, tf), never as text. Ranking is a per-doc "
        "window (WindowGroupLimit prunes to top-3 before the sort "
        "materializes). Floor-quantized score grid neutralizes ln ulp "
        "drift (registry determinism rules)"
    ),
)
def q_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 BM25-scored terms per document (k1=1.2, b=0.75, ties to
    the lexicographically first token)."""
    from pyspark.sql.window import Window
    from flexcalc_spark.tables import table_parallel

    d = table_parallel(spark, sf_dir, "documents")
    toks = F.split(F.lower("text"), " ")
    tf = (
        d.select("doc_id", F.explode(toks).alias("token"))
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    # r14 optimization (guide §2.3/§2.4): everything derives from ONE
    # tokenize pass. dl (doc length) = SUM(tf) over the doc's tokens as
    # an unordered window on the already-doc_id-clustered score path
    # (no dl scan, no tf x dl shuffle join); N/avgdl fold out of the
    # per-doc dl relation instead of a third documents scan. Exact
    # equivalences: split() never returns an empty array, so every doc
    # has >= 1 token row and COUNT(docs via tf) == COUNT(docs); the
    # per-doc BIGINT dl sums equal size(toks); avgdl stays the same
    # single BIGINT-cast-DOUBLE division. Depends on documents.text
    # being non-null (true at every fixture sf; canary-pinned in
    # tests/test_fixture_assumptions.py — a NULL-text doc would be
    # absent from tf but counted by the oracle's nn).
    # cache the narrow (doc_id, token, tf) relation: THREE consumers
    # (dfr, nn, the scored path) would otherwise each re-run the
    # explode+aggregate subtree — no ReusedExchange fires across the
    # differing downstream shapes (CLAUDE.md multi-consumer rule; the
    # r9 engine conf lets AQE size the cached layout).
    tf = tf.cache()
    dfr = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    per_doc = tf.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    nn = per_doc.agg(
        F.count(F.lit(1)).alias("n"),
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl"),
    )
    wdl = Window.partitionBy("doc_id")
    w = Window.partitionBy("doc_id").orderBy(F.col("score_q").desc(), "token")
    return (
        tf.withColumn("dl", F.sum("tf").over(wdl))
        .join(F.broadcast(dfr), "token")
        .crossJoin(F.broadcast(nn))
        .select(
            "doc_id",
            "token",
            F.expr(_BM25_EXPR).cast("bigint").alias("score_q"),
        )
        .withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= BM25_TOP)
    )


# ------------------------------------------------- PMI topic terms
TOPIC_TOP = 5       # distinctive terms reported per language
TOPIC_MIN_WL = 5    # minimum in-language occurrences (PMI support gate)


@register(
    "q_topic_terms",
    oracle=f"""
        WITH tok AS (
            SELECT lang, unnest(string_split(lower(text), ' ')) AS w
            FROM documents
        ),
        n_wl AS (SELECT lang, w, CAST(COUNT(*) AS BIGINT) AS c_wl
                 FROM tok GROUP BY lang, w),
        n_w  AS (SELECT w, CAST(SUM(c_wl) AS BIGINT) AS c_w
                 FROM n_wl GROUP BY w),
        n_l  AS (SELECT lang, CAST(SUM(c_wl) AS BIGINT) AS c_l
                 FROM n_wl GROUP BY lang),
        tot  AS (SELECT CAST(SUM(c_w) AS BIGINT) AS n FROM n_w),
        pmi AS (
            SELECT n_wl.lang, n_wl.w, c_wl,
                   CAST(floor(ln((CAST(c_wl AS DOUBLE) * n)
                                 / (CAST(c_w AS DOUBLE) * c_l))
                              * 1000000.0) AS BIGINT) AS pmi_q
            FROM n_wl JOIN n_w USING (w) JOIN n_l USING (lang), tot
            WHERE c_wl >= {TOPIC_MIN_WL}
        )
        SELECT lang, w AS term, c_wl, pmi_q, CAST(rk AS BIGINT) AS rk
        FROM (
            SELECT *, ROW_NUMBER() OVER (
                       PARTITION BY lang
                       ORDER BY pmi_q DESC, w) AS rk
            FROM pmi
        ) WHERE rk <= {TOPIC_TOP}
    """,
    family="text",
    scale_notes=(
        "per-language distinctive terms by pointwise mutual information "
        "— the corpus-exploration primitive behind domain tagging and "
        "contamination triage: ONE tokenize scan collapses to the "
        "(lang, word) count table, the word and language marginals are "
        "vocabulary-/|langs|-sized re-aggregations of THAT table (never "
        "a second corpus scan), and PMI + per-lang top-k run on "
        "vocabulary-scale rows (WindowGroupLimit prunes the rank "
        "window). ln rides the 1e-6 floor grid (integer-ratio "
        "arguments, registry transcendental rule); ties break on the "
        "term for a total order. At 100 TB the only corpus-sized "
        "operation is the first tokenize+count shuffle — everything "
        "downstream is MB-scale"
    ),
)
def q_topic_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 PMI-distinctive terms per language with support >= 5:
    (lang, term, c_wl, pmi_q, rk)."""
    from pyspark.sql.window import Window

    d = table(spark, sf_dir, "documents")
    tok = d.select(
        "lang", F.explode(F.split(F.lower("text"), " ")).alias("w")
    )
    n_wl = tok.groupBy("lang", "w").agg(
        F.count(F.lit(1)).cast("bigint").alias("c_wl")
    )
    # marginals re-aggregate the (lang, word) table — no second scan
    n_w = n_wl.groupBy("w").agg(F.sum("c_wl").cast("bigint").alias("c_w"))
    n_l = n_wl.groupBy("lang").agg(
        F.sum("c_wl").cast("bigint").alias("c_l")
    )
    tot = n_w.agg(F.sum("c_w").cast("bigint").alias("n"))
    pmi = (
        n_wl.filter(F.col("c_wl") >= TOPIC_MIN_WL)
        .join(F.broadcast(n_w), "w")
        .join(F.broadcast(n_l), "lang")
        .crossJoin(F.broadcast(tot))
        .select(
            "lang",
            "w",
            "c_wl",
            F.expr(
                "CAST(floor(ln((CAST(c_wl AS DOUBLE) * n)"
                " / (CAST(c_w AS DOUBLE) * c_l)) * 1000000.0) AS BIGINT)"
            ).alias("pmi_q"),
        )
    )
    rk = F.row_number().over(
        Window.partitionBy("lang").orderBy(
            F.col("pmi_q").desc(), F.col("w")
        )
    )
    return (
        pmi.withColumn("rk", rk.cast("bigint"))
        .filter(F.col("rk") <= TOPIC_TOP)
        .select("lang", F.col("w").alias("term"), "c_wl", "pmi_q", "rk")
    )
