"""Deduplication operators (north-star §2.3 + training-data pipeline):
exact, token-Jaccard, character-n-gram Jaccard, MinHash-LSH, SimHash,
embedding-cosine — each a ``queries()`` entry over ``documents``.

Scale design (SURVEY §4.3.2): NO graded plan is all-pairs.
- The exact Jaccard operators (neardup/ngram) generate candidates with a
  PPJoin-style prefix filter (Chaudhuri et al., ICDE'06; Xiao et al.,
  WWW'08): tokens ordered rarest-first by document frequency, each set
  indexes only its first |A| - ceil(tau*|A|) + 1 tokens, and any pair
  with jaccard >= tau provably shares an indexed token — candidates come
  from an EQUI join on (group, token) with exact-recall guarantee, then
  an exact re-score. O(n * prefix) shuffle, never O(n²).
- The hash-sketch operators (MinHash/SimHash) equi-join on band keys —
  probabilistic recall, measured in tests/test_recall.py.
- The embedding operator at tau=0.4 targets similarity at the ambient
  level of random vectors, where NO sublinear filter has exact recall
  (LSH at that tau prunes nothing); the honest scale form of the exact
  join is a blocked GEMM — see q_dedup_embed.
At fixture scale the exact operators are oracle-checked; the sketch
operators are rows-only (their hash functions have no DuckDB twin) and
their recall is asserted against the exact pair set in
tests/test_recall.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from flexcalc_spark.registry import register
from flexcalc_spark.tables import session_plan_memo, table, table_parallel

JACCARD_TAU = 0.95
JACCARD_NUM, JACCARD_DEN = 19, 20      # == JACCARD_TAU as an exact ratio
NGRAM_TAU = 0.98
NGRAM_NUM, NGRAM_DEN = 49, 50          # == NGRAM_TAU as an exact ratio
COSINE_TAU = 0.4
assert JACCARD_NUM / JACCARD_DEN == JACCARD_TAU
assert NGRAM_NUM / NGRAM_DEN == NGRAM_TAU

# 64 permutations in 8 bands of 8 rows. The fixture corpus is drawn from
# a 31-token shared vocabulary, so typical inter-doc Jaccard is ~0.7 —
# short bands (4 rows) would make nearly ALL pairs candidates (measured:
# ~100 s at sf0.1). 8-row bands: P(collide | jac=0.7) = 0.7^8 = 0.057
# per band, while recall at the tau=0.95 output threshold stays
# 1-(1-0.95^8)^8 = 0.9998.
N_MINHASH = 64          # permutations
N_BANDS = 8             # bands of 8 rows each -> s-curve threshold ~0.85
ROWS_PER_BAND = N_MINHASH // N_BANDS
SIMHASH_BITS = 64
SIMHASH_CHUNKS = 4      # 16-bit chunks; candidates share >=1 chunk
SIMHASH_MAX_HAMMING = 6


def _tok_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table_parallel(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        "lang",
        "source",
        F.array_distinct(F.split(F.lower(F.col("text")), " ")).alias("toks"),
    )


def _jaccard(a: Column, b: Column) -> Column:
    return F.size(F.array_intersect(a, b)).cast("double") / F.size(F.array_union(a, b))


@register(
    "q_dedup_exact",
    oracle="""
        SELECT h, COUNT(*) AS cnt, MIN(doc_id) AS keeper
        FROM (SELECT doc_id, md5(text) AS h FROM documents)
        GROUP BY h
    """,
    family="dedup",
    scale_notes="content-hash groupBy: one shuffle on a 128-bit key, keeper=min(id) is the canonical survivor rule",
)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup by content hash; emits per-hash group size + keeper."""
    d = table(spark, sf_dir, "documents")
    return (
        d.select("doc_id", F.md5(F.col("text").cast("binary")).alias("h"))
        .groupBy("h")
        .agg(F.count(F.lit(1)).alias("cnt"), F.min("doc_id").alias("keeper"))
    )


def _prefix_candidates(items: DataFrame, num: int, den: int) -> DataFrame:
    """PPJoin-style candidate pairs for jaccard >= num/den within group.

    ``items``: (doc_id, grp, items: array<string>). Tokens are hashed
    (xxhash64 — order-consistent across docs; a collision can only ADD
    candidates) and ordered rarest-first by document frequency; each doc
    indexes only its prefix of length |A| - ceil(tau*|A|) + 1. Theorem
    (Chaudhuri et al.): jac(A,B) >= tau implies |A∩B| >= ceil(tau*|A|),
    which forces a shared element inside both prefixes — so the equi
    join on (grp, token) below has GUARANTEED recall; the exact
    re-score keeps output identical to the all-pairs formulation.

    All threshold arithmetic is integer (ceil(num*s/den) via div): the
    FP form `least >= 0.95d * greatest` silently over-prunes exact
    boundary pairs because 0.95d * 20 = 19.000000000000004 > 19.

    Scale: one O(total tokens) narrow shuffle to rank tokens, one equi
    join on (grp, token) whose bucket sizes follow the token-frequency
    tail (rare tokens first keeps buckets small on Zipfian corpora),
    one distinct on integer id pairs. Never O(n²)."""
    ranked = _ranked_token_arrays(items)
    return _prefix_candidates_from_ranked(ranked, num, den)


SIG_WORDS = 16                    # 64-bit words per doc gram bitmap
SIG_BITS = SIG_WORDS * 64         # 1024-bit signature


def _ranked_token_arrays(items: DataFrame, with_sig: bool = False) -> DataFrame:
    """(doc_id, grp, hitems: array<long>): each doc's tokens hashed and
    sorted rarest-first by (document frequency, hash) — the shared input
    of prefix extraction AND the exact hashed re-score (hashed long
    intersects are ~5x faster than string intersects and produce the
    same jaccard — 64-bit collisions are absent at corpus scale; same
    trade q_dedup_minhash's verifier makes).

    ``with_sig`` adds a ``sig`` column: a SIG_BITS-bit bitmap of the
    doc's hashed items (bit index = pmod(hash, SIG_BITS)), OR-folded as
    SIG_WORDS bit_or aggregate columns inside the SAME groupBy — no
    extra shuffle. The high-tau containment re-score uses it as a
    provably recall-safe pre-filter (r15, guide §2.3: decide with small
    rows — 128-byte bitmaps — before attaching the ~2.8 KB gram
    arrays)."""
    tok = items.select(
        "doc_id", "grp", F.explode("items").alias("tk")
    ).select("doc_id", "grp", F.xxhash64("tk").alias("it"))
    dfreq = tok.groupBy("it").agg(F.count(F.lit(1)).alias("dfreq"))
    aggs = [F.array_sort(F.collect_list(F.struct("dfreq", "it"))).alias("ps")]
    if with_sig:
        # bit position = pmod(it, SIG_BITS); word = div 64, bit = mod 64
        # (64 | SIG_BITS, so pmod(it, 64) IS the in-word bit). All
        # codegen scalar ops riding the existing ObjectHashAggregate.
        bit = F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pmod(it, 64) AS INT))")
        word = F.expr(f"CAST(pmod(it, {SIG_BITS}) div 64 AS INT)")
        for k in range(SIG_WORDS):
            aggs.append(
                F.bit_or(
                    F.when(word == k, bit).otherwise(F.lit(0).cast("bigint"))
                ).alias(f"_sg{k}")
            )
    out_cols = [
        F.col("doc_id"), F.col("grp"),
        F.expr("transform(ps, p -> p.it)").alias("hitems"),
    ]
    if with_sig:
        out_cols.append(
            F.array(*[F.col(f"_sg{k}") for k in range(SIG_WORDS)]).alias("sig")
        )
    # rarest-first order = ascending (dfreq, hash); vocabulary is tiny
    # relative to the corpus -> broadcast the frequency dictionary
    return (
        tok.join(F.broadcast(dfreq), "it")
        .groupBy("doc_id", "grp")
        .agg(*aggs)
        .select(*out_cols)
    )


def _prefix_candidates_from_ranked(
    ranked: DataFrame, num: int, den: int, pair_pred: Column | None = None
) -> DataFrame:
    """``pair_pred`` (over aliases ``a``/``b``) replaces the default
    ``a.doc_id < b.doc_id`` pair orientation — used by the incremental
    variant to emit only corpus-vs-incoming pairs. The prefix theorem is
    orientation-agnostic (it bounds which TOKENS a qualifying pair must
    share, not which side is which), so recall stays guaranteed."""
    prefix_len = F.expr(
        f"size(hitems) - (({num} * size(hitems) + {den - 1}) div {den}) + 1"
    )
    pref = ranked.select(
        "doc_id",
        "grp",
        F.size("hitems").alias("sz"),
        F.posexplode(F.slice(F.col("hitems"), F.lit(1), prefix_len)).alias(
            "pos0", "it"
        ),
    ).select(
        "doc_id", "grp", "sz", (F.col("pos0") + 1).alias("pos"), "it"
    )
    a = pref.alias("a")
    b = pref.alias("b")
    if pair_pred is None:
        pair_pred = F.col("a.doc_id") < F.col("b.doc_id")
    # exact integer size-ratio prune: jac >= num/den forces
    # den * min(|A|,|B|) >= num * max(|A|,|B|)
    size_ok = F.least(F.col("a.sz"), F.col("b.sz")) * den >= F.greatest(
        F.col("a.sz"), F.col("b.sz")
    ) * num
    # PPJoin positional filter (Xiao et al.): a shared prefix token at
    # sorted positions (pa, pb) bounds the overlap by
    # 1 + min(|A| - pa, |B| - pb); jac >= tau needs overlap >=
    # alpha = ceil(num * (|A|+|B|) / (num+den)). For a TRUE pair the
    # instance at the FIRST shared token always satisfies this, so
    # pruning later instances never loses a pair (the pair groupBy only
    # needs one surviving instance) — big cut when hot tokens collide
    # deep in both prefixes. Integer arithmetic throughout.
    alpha = F.expr(
        f"((a.sz + b.sz) * {num} + {num + den - 1}) div {num + den}"
    )
    pos_ok = (
        F.lit(1)
        + F.least(
            F.col("a.sz") - F.col("a.pos"), F.col("b.sz") - F.col("b.pos")
        )
    ) >= alpha
    return (
        a.join(
            b,
            (F.col("a.grp") == F.col("b.grp"))
            & (F.col("a.it") == F.col("b.it"))
            & pair_pred
            & size_ok
            & pos_ok,
        )
        .groupBy(
            F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b")
        )
        .agg(F.lit(1))
        .select("id_a", "id_b")
    )


def _prefix_filter_pairs(
    items: DataFrame,
    num: int,
    den: int,
    tau: float,
    out_name: str,
    pair_pred: Column | None = None,
) -> DataFrame:
    """Integrated prefix-filter dedup plan: ranked hashed arrays (cached,
    ONE tokenize+hash scan) -> guaranteed-recall prefix candidates ->
    exact jaccard re-score on the hashed arrays. |U| = |A|+|B|-|I| uses
    one array_intersect; identical integers, identical division, so the
    rounded jac equals the original string-array formulation.

    Both the item arrays AND the ranked arrays are cached: the item
    expression (tokenize / 3-gram HOF) otherwise re-evaluates inside
    every consumer of the explode pipeline (measured 5x slower at
    sf0.1), and both tables are narrow (one array row per doc).
    `ranked` is groupBy-derived, so it is repartitioned to core count
    BEFORE caching (the q_pagerank / q_dedup_containment rule: caching
    a shuffle-derived frame as-is pins the vanilla session's
    200-partition layout as an InMemoryRelation AQE cannot coalesce —
    hundreds of near-empty tasks in every downstream stage)."""
    items = items.cache()
    ranked = (
        _ranked_token_arrays(items)
        .repartition(items.sparkSession.sparkContext.defaultParallelism)
        .cache()
    )
    # Re-score parallelism (r14 optimization): the exact-intersect stage
    # runs in the candidate distinct's OUTPUT partitions — 8 under the
    # bench conf, and ~3 under a vanilla 200-partition session after AQE
    # coalesces the narrow pair stream to its BYTE target — while the
    # per-pair array_intersect work is compute-bound, not byte-bound.
    # One cheap narrow exchange of (id_a, id_b) pairs buys full-core
    # parallelism for the intersect stage in ANY session (measured on
    # q_dedup_containment at sf0.1: re-score tail 34.4 s -> ~9 s).
    # Core-count-adaptive, never a tuned constant (guide §2.5). HASH
    # by the pair key, not round-robin: RoundRobinPartitioning first
    # locally sorts its whole input (sortBeforeRepartition, on by
    # default so retries re-deal identically — guide §2.5) while hash
    # partitioning is natively retry-deterministic and skips that sort;
    # distinct (id_a, id_b) pairs hash-spread uniformly by construction.
    cand = _prefix_candidates_from_ranked(ranked, num, den, pair_pred).repartition(
        items.sparkSession.sparkContext.defaultParallelism, "id_a", "id_b"
    )
    ta = ranked.select(F.col("doc_id").alias("id_a"), F.col("hitems").alias("items_a"))
    tb = ranked.select(F.col("doc_id").alias("id_b"), F.col("hitems").alias("items_b"))
    isz = F.size(F.array_intersect(F.col("items_a"), F.col("items_b")))
    jac = isz.cast("double") / (
        F.size("items_a") + F.size("items_b") - isz
    )
    return (
        cand.join(ta, "id_a")
        .join(tb, "id_b")
        .filter(jac >= tau)
        .select("id_a", "id_b", F.round(jac, 4).alias(out_name))
    )


def _neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(id_a, id_b, jac): exact token-Jaccard pairs >= tau within lang.

    Shared by q_dedup_neardup (emits the pairs) and q_dedup_clusters
    (uses them as edges). Candidates via the guaranteed-recall prefix
    filter, then exact re-score — output identical to all-pairs, plan
    is equi-join-only. One cached scan feeds both stages."""
    t = _tok_sets(spark, sf_dir).select(
        "doc_id", F.col("lang").alias("grp"), F.col("toks").alias("items")
    )
    return _prefix_filter_pairs(t, JACCARD_NUM, JACCARD_DEN, JACCARD_TAU, "jac")


@register(
    "q_dedup_neardup",
    oracle=f"""
        -- inverted-index form (round-7 lesson: the all-pairs
        -- list_intersect join is O(n^2) list intersections and hangs
        -- DuckDB as `documents` grows): unnest distinct tokens, equi
        -- self-join on (lang, token), COUNT(*) per pair == |A∩B|;
        -- |A∪B| = sz_a + sz_b - isz. Integer cross-multiply threshold
        -- is exact (IEEE-division boundary analysis: equivalence holds
        -- while 20*|U| < 2^53).
        WITH t AS MATERIALIZED (
            SELECT doc_id, lang, list_distinct(string_split(lower(text), ' ')) AS toks
            FROM documents
        ),
        e AS MATERIALIZED (
            SELECT doc_id, lang, len(toks) AS sz, unnest(toks) AS tok FROM t
        ),
        p AS (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS isz,
                   ANY_VALUE(a.sz) AS sz_a, ANY_VALUE(b.sz) AS sz_b
            FROM e a JOIN e b
              ON a.lang = b.lang AND a.tok = b.tok AND a.doc_id < b.doc_id
            GROUP BY 1, 2
        )
        SELECT id_a, id_b,
               ROUND(CAST(isz AS DOUBLE) / (sz_a + sz_b - isz), 4) AS jac
        FROM p
        WHERE isz * {JACCARD_DEN} >= {JACCARD_NUM} * (sz_a + sz_b - isz)
    """,
    family="dedup",
    scale_notes="exact token-set Jaccard with GUARANTEED-recall prefix-filter candidates (PPJoin): equi join on (lang, rare-prefix token), integer size-ratio prune, exact re-score on the candidate ids only. The ~n*prefix census is MEASURED on a Zipf(1) corpus (scripts/scale_probe_zipf.py: 4 orders of magnitude below all-pairs at n=2k-32k, qualifying-planted recall 100% at every n; SCALE.md round-8), and the round-9 Heaps-law runs pin the vocabulary dependence: census ~n exactly under V ∝ n (candidates 1.4x the true-pair count at n=32k), ~n^1.6 at V ∝ sqrt(n), ~n^2 only with a FIXED vocabulary — real corpora sit between, so budget the candidate-join shuffle by the corpus's measured Heaps beta (SCALE.md round-9). tau=0.95 word-token prefixes land in the rare tail, unlike the char-gram containment key's. q_dedup_minhash is the probabilistic-recall alternative at lower tau",
)
def q_dedup_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate pairs by token-set Jaccard >= 0.95 within language."""
    return _neardup_pairs(spark, sf_dir)


@register(
    "q_dedup_ngram",
    oracle=f"""
        -- inverted-index form (see q_dedup_neardup's oracle note)
        WITH g AS MATERIALIZED (
            SELECT doc_id, source,
                   list_distinct(list_transform(range(1, LENGTH(text) - 1),
                                 i -> substring(text, CAST(i AS INT), 3))) AS grams
            FROM documents
        ),
        e AS MATERIALIZED (
            SELECT doc_id, source, len(grams) AS sz, unnest(grams) AS gram
            FROM g
        ),
        p AS (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS isz,
                   ANY_VALUE(a.sz) AS sz_a, ANY_VALUE(b.sz) AS sz_b
            FROM e a JOIN e b
              ON a.source = b.source AND a.gram = b.gram
             AND a.doc_id < b.doc_id
            GROUP BY 1, 2
        )
        SELECT id_a, id_b,
               ROUND(CAST(isz AS DOUBLE) / (sz_a + sz_b - isz), 4) AS jac3
        FROM p
        WHERE isz * {NGRAM_DEN} >= {NGRAM_NUM} * (sz_a + sz_b - isz)
    """,
    family="dedup",
    scale_notes="char-3-gram shingles via a sequence/transform HOF; candidates from the guaranteed-recall prefix filter (equi join on (source, rare gram)), exact re-score on candidate ids — no all-pairs stage",
)
def q_dedup_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate pairs by character-3-gram Jaccard within source.

    Same prefix-filter + exact-re-score shape as q_dedup_neardup, over
    3-gram shingles (tau = 0.98 -> prefix ~ 2% of each gram set)."""
    d = table_parallel(spark, sf_dir, "documents")
    # Guard texts shorter than 3 chars: sequence(1, 0) would DESCEND
    # ([1, 0]) and fabricate grams the oracle's empty range() never sees.
    grams_expr = F.when(
        F.length("text") >= 3,
        F.expr("transform(sequence(1, length(text) - 2), i -> substring(text, i, 3))"),
    ).otherwise(F.expr("array()"))
    g = d.select(
        "doc_id",
        F.col("source").alias("grp"),
        F.array_distinct(grams_expr).alias("items"),
    )
    return _prefix_filter_pairs(g, NGRAM_NUM, NGRAM_DEN, NGRAM_TAU, "jac3")


def _hashed_tok_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, htoks: array<long>): token sets hashed ONCE per token.

    Both the minhash permutations and the exact-Jaccard verifier consume
    these longs (64-bit hashes are collision-free at corpus scale, so
    set intersections over htoks equal those over the token strings)."""
    return _tok_sets(spark, sf_dir).select(
        "doc_id", F.expr("transform(toks, t -> xxhash64(t))").alias("htoks")
    )


# Permutation i re-hashes each token hash with seed i; the whole
# 64-slot signature is one nested HOF over the pre-hashed tokens.
_SIG_EXPR = f"""
    transform(sequence(0, {N_MINHASH - 1}),
              i -> array_min(transform(htoks, h -> xxhash64(i, h))))
"""


def _sig_from_htoks(df: DataFrame) -> DataFrame:
    """(doc_id, htoks) -> (doc_id, sig: array<long>[64]).

    Permutation i re-hashes each token hash with seed i (ANSI-safe —
    Spark 4's default ANSI mode forbids the wrapping-multiply permutation
    trick). One nested higher-order expression: no explode, no shuffle.
    Token hashing is hoisted OUT of the permutation lambda (htoks), so
    each token is hashed 1 + 64 times, not 2 x 64 — and the generated
    method stays small (a 64-column min-aggregate version of this spent
    ~7 s per run just compiling its codegen)."""
    return df.select("doc_id", F.expr(_SIG_EXPR).alias("sig"))


def minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, sig: array<long>[64]): per-doc minima of 64 hash
    permutations, computed entirely per-row."""
    return _sig_from_htoks(_hashed_tok_sets(spark, sf_dir))


@register(
    "q_dedup_minhash",
    oracle=None,  # xxhash64-seeded sketch has no DuckDB twin (rows-only);
    # recall vs the exact pair set is asserted in tests/test_recall.py
    family="dedup",
    scale_notes="MinHash-LSH: shingle->minhash->band->bucket-join. Candidate generation is an equi join on (band, key) — O(n*bands) shuffle, never O(n²); size-ratio + band-multiplicity prefilters cut the pair stream before the exact Jaccard re-score. THE 100 TB dedup path",
)
def q_dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dup detection, exact-verified.

    64 permutations in 8 bands of 8 rows (see the module-header comment
    for the s-curve math): recall at jac>=0.95 is 1-(1-0.95^8)^8 ~ 0.9998
    before the >=2-band multiplicity prefilter (0.997 after)."""
    # ONE cached hashed-token table feeds BOTH the signature pass and the
    # exact verifier — one documents scan + tokenize + hash total.
    t = _hashed_tok_sets(spark, sf_dir).cache()
    sigd = t.select(
        "doc_id", F.size("htoks").alias("sz"), F.expr(_SIG_EXPR).alias("sig")
    )
    # Band key = xxhash64-fold over the band's 8 signature rows (one
    # HOF expression; ANSI-safe).
    band_keys = F.expr(
        f"""
        transform(sequence(0, {N_BANDS - 1}),
                  b -> aggregate(slice(sig, b * {ROWS_PER_BAND} + 1, {ROWS_PER_BAND}),
                                 xxhash64(b), (acc, x) -> xxhash64(acc, x)))
        """
    )
    # Bucket rows carry only (doc_id, sz, band, key): the candidate join
    # and the multiplicity count stay integer-narrow; arrays attach after.
    # cache(): the self-join's two sides and Catalyst's lack of
    # ReuseExchange here would otherwise recompute the signature scan
    # 2x (measured: 4 scans of documents in the uncached plan). The
    # cached set is n_docs x bands narrow rows — trivial memory.
    buckets = sigd.select(
        "doc_id", "sz", F.posexplode(band_keys).alias("band", "key")
    ).cache()
    a = buckets.alias("a")
    b = buckets.alias("b")
    # Size-ratio prefilter INSIDE the band join: jac >= tau forces
    # |I| <= min(|A|,|B|) and |U| >= max(|A|,|B|), so min >= tau * max —
    # size-mismatched collisions can never pass the exact verifier and
    # are dropped before the multiplicity groupBy (measured at sf0.1:
    # raw collisions 10.4M -> 4.8M, candidates 2.5M -> 1.1M, zero
    # recall loss by construction). Integer arithmetic: the FP form
    # (0.95d * greatest) over-prunes exact boundary ratios.
    size_ok = F.least(F.col("a.sz"), F.col("b.sz")) * JACCARD_DEN >= F.greatest(
        F.col("a.sz"), F.col("b.sz")
    ) * JACCARD_NUM
    # Multiplicity prefilter: keep pairs colliding in >= 2 of 8 bands.
    # Binomial(8, jac^8): at jac=0.95 P(m>=2) = 0.997 (recall intact); at
    # the corpus-typical jac~0.7 P(m>=2) = 0.07 — a ~15x cut in pairs
    # reaching the exact verifier. (groupBy doubles as the distinct.)
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.doc_id") < F.col("b.doc_id"))
            & size_ok,
        )
        .groupBy(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
        )
        .agg(F.count(F.lit(1)).alias("m"))
        .filter(F.col("m") >= 2)
        .select("id_a", "id_b")
        # Re-score parallelism (r14, guide §2.5): the exact-Jaccard
        # stage otherwise runs in the multiplicity groupBy's OUTPUT
        # layout (8 tasks under the bench conf; ~byte-coalesced under
        # AQE) while array_intersect over ~350-long arrays is
        # compute-bound — one narrow (id_a, id_b) exchange buys
        # full-core parallelism in any session (the
        # _prefix_filter_pairs precedent, same measured shape; hash by
        # the pair key, not round-robin — skips sortBeforeRepartition).
        .repartition(spark.sparkContext.defaultParallelism, "id_a", "id_b")
    )
    # Exact verify on HASHED token sets (long arrays intersect ~5x faster
    # than string arrays; 64-bit hashes are collision-free here, so the
    # Jaccard value is identical to the token-set value).
    ta = t.select(F.col("doc_id").alias("id_a"), F.col("htoks").alias("toks_a"))
    tb = t.select(F.col("doc_id").alias("id_b"), F.col("htoks").alias("toks_b"))
    # jac = |I| / (|A| + |B| - |I|): one array_intersect instead of
    # intersect + union (mathematically identical, same ints, same division).
    isz = F.size(F.array_intersect(F.col("toks_a"), F.col("toks_b")))
    jac = isz.cast("double") / (
        F.size("toks_a") + F.size("toks_b") - isz
    )
    return (
        cand.join(ta, "id_a")
        .join(tb, "id_b")
        .filter(jac >= JACCARD_TAU)
        .select("id_a", "id_b", F.round(jac, 4).alias("jac"))
    )


def simhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, simhash BIGINT): 64-bit SimHash over token xxhash64s.

    bit i of the signature = sign of sum over tokens of ±1 per bit —
    computed entirely PER ROW as one nested higher-order expression over
    the doc's token array (the same shape as the minhash signature):
    no explode, no shuffle, and no 64-column aggregate (the previous
    64-wide HashAggregate formulation spent seconds per run compiling
    its generated code — same lesson as _sig_from_htoks)."""
    t = _hashed_tok_sets(spark, sf_dir)
    # sign(sum of ±1) > 0  <=>  2 * popcount_of_bit > n_tokens: counting
    # raw bits keeps the inner lambda to 2 ops per (token, bit) — these
    # HOFs evaluate interpreted, so per-element op count is the cost.
    sig = F.expr(
        f"""
        aggregate(sequence(0, {SIMHASH_BITS - 1}), CAST(0 AS BIGINT),
          (acc, i) -> acc | IF(
             2 * aggregate(htoks, CAST(0 AS BIGINT),
                           (s, h) -> s + ((h >> i) & 1)) > size(htoks),
             shiftleft(CAST(1 AS BIGINT), i), CAST(0 AS BIGINT)))
        """
    )
    return t.select("doc_id", sig.alias("simhash"))


@register(
    "q_dedup_simhash",
    oracle=None,  # hash-seeded sketch, rows-only (see q_dedup_minhash)
    family="dedup",
    scale_notes="SimHash 64-bit per-row HOF signature (no shuffle, no wide aggregate) + 16-bit-chunk banding: pigeonhole GUARANTEES a shared chunk only for hamming<=3; at hamming 4-6 a 2+2+1+1 bit spread across all four chunks can escape (near-guarantee in practice, measured in tests/test_recall.py); candidates via chunk equi join, bit_count(xor) re-score",
)
def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs: hamming(sig_a, sig_b) <= 6, candidates via
    shared 16-bit chunk (pigeonhole guarantees recall for hamming <= 3;
    near-guarantee at 6)."""
    sig = simhash_signatures(spark, sf_dir)
    chunks = sig.select(
        "doc_id",
        "simhash",
        F.posexplode(
            F.array(
                *[
                    F.shiftright(F.col("simhash"), 16 * c)
                    .bitwiseAND(F.lit(0xFFFF))
                    .alias(f"c{c}")
                    for c in range(SIMHASH_CHUNKS)
                ]
            )
        ).alias("chunk_idx", "chunk_val"),
    ).cache()  # both join sides consume this HOF-computed subtree: without
    # the cache each side re-evaluates the 64-bit signature fold per doc
    # (measured 6.1 s -> 1.2 s at sf0.1; CLAUDE.md caching rule)
    a = chunks.alias("a")
    b = chunks.alias("b")
    ham = F.bit_count(
        F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
    ).cast("bigint")
    return (
        a.join(
            b,
            (F.col("a.chunk_idx") == F.col("b.chunk_idx"))
            & (F.col("a.chunk_val") == F.col("b.chunk_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .filter(ham <= SIMHASH_MAX_HAMMING)
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            ham.alias("hamming"),
        )
        .distinct()
    )


# single source of truth for the HOF dot-product template
from flexcalc_spark.operators.vectors import _dot as _dot_spark  # noqa: E402

EMBED_BLOCK = 256          # vectors per GEMM block
GEMM_MARGIN = 1e-9         # candidate slack >> BLAS-vs-fold summation drift


def _gemm_candidates(e: DataFrame, tau: float) -> DataFrame:
    """(id_a, id_b) candidate pairs with cosine >= tau - GEMM_MARGIN,
    via blocked matrix multiplication.

    Exact cosine join at tau near the ambient similarity of the corpus
    is inherently Ω(n²) comparisons (no LSH/metric filter can prune
    with exact recall when target pairs sit in the bulk of the cosine
    distribution). The scale question is only HOW the n² gets done:
    row-pair theta-join evaluates one scalar expression per pair, while
    grouping vectors into blocks and multiplying block pairs runs the
    same arithmetic as BLAS GEMM — orders of magnitude higher FLOP
    throughput, O(n * n_blocks) shuffle, bounded executor memory
    (block_size² floats per task). The margin guarantees every pair the
    exact JVM re-score would keep survives candidate generation
    (float64 GEMM and the fold differ only by summation order,
    ~1e-15 relative — far inside 1e-9)."""
    import numpy as np
    import pandas as pd

    v = e.select(
        F.col("vec_id"),
        F.col("embedding"),
        F.expr(f"vec_id div {EMBED_BLOCK}").alias("bid"),
    )
    blocks = v.groupBy("bid").agg(
        F.collect_list("vec_id").alias("ids"),
        F.collect_list("embedding").alias("embs"),
    )
    a = blocks.select(
        F.col("bid").alias("bid_a"),
        F.col("ids").alias("ids_a"),
        F.col("embs").alias("embs_a"),
    )
    b = blocks.select(
        F.col("bid").alias("bid_b"),
        F.col("ids").alias("ids_b"),
        F.col("embs").alias("embs_b"),
    )
    bp = a.join(b, F.col("bid_a") <= F.col("bid_b"))
    out_schema = "id_a long, id_b long"
    thr = tau - GEMM_MARGIN

    def gemm(batches):
        for pdf in batches:
            outs = []
            for ia, ea, ib, eb in zip(
                pdf["ids_a"], pdf["embs_a"], pdf["ids_b"], pdf["embs_b"]
            ):
                ida = np.asarray(ia, dtype=np.int64)
                idb = np.asarray(ib, dtype=np.int64)
                ma = np.stack([np.asarray(x, dtype=np.float64) for x in ea])
                mb = np.stack([np.asarray(x, dtype=np.float64) for x in eb])
                ma /= np.linalg.norm(ma, axis=1, keepdims=True)
                mb /= np.linalg.norm(mb, axis=1, keepdims=True)
                g = ma @ mb.T
                ii, jj = np.where(g >= thr)
                if len(ii):
                    pa, pb = ida[ii], idb[jj]
                    keep = pa < pb          # same-block pairs: strict order
                    outs.append(
                        pd.DataFrame({"id_a": pa[keep], "id_b": pb[keep]})
                    )
            yield (
                pd.concat(outs)
                if outs
                else pd.DataFrame({"id_a": [], "id_b": []}).astype("int64")
            )

    return bp.mapInPandas(gemm, out_schema)


@register(
    "q_dedup_embed",
    oracle=f"""
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               ROUND(list_dot_product(CAST(a.embedding AS DOUBLE[]),
                                      CAST(b.embedding AS DOUBLE[]))
                     / (sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]),
                                              CAST(a.embedding AS DOUBLE[])))
                        * sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]),
                                                CAST(b.embedding AS DOUBLE[])))), 4) AS cos
        FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        WHERE list_dot_product(CAST(a.embedding AS DOUBLE[]),
                               CAST(b.embedding AS DOUBLE[]))
              / (sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]),
                                       CAST(a.embedding AS DOUBLE[])))
                 * sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]),
                                         CAST(b.embedding AS DOUBLE[])))) >= {COSINE_TAU}
    """,
    family="dedup",
    scale_notes="exact embedding near-dup via blocked GEMM: vectors grouped into blocks, block pairs multiplied with BLAS (mapInPandas — the sanctioned Python exception: dense O(n²) numerics), candidates re-scored by the deterministic JVM fold. tau=0.4 sits at the ambient similarity of the corpus, where LSH pruning has no exact-recall power — at a near-dup tau (>=0.9) swap candidates to q_knn_lsh buckets and keep the same re-score",
)
def q_dedup_embed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (cos >= 0.4).

    Candidates from the blocked-GEMM pass (guaranteed superset, see
    _gemm_candidates), re-scored with the SAME JVM HOF fold as the
    oracle comparison has always used — output values bit-identical to
    the former all-pairs theta-join plan."""
    e = table_parallel(spark, sf_dir, "embeddings")
    cand = _gemm_candidates(e, COSINE_TAU)
    # norms once per vector, not twice per pair (interpreted-HOF cost;
    # bit-identical value — same fold text — so round(cos, 4) and the
    # oracle hash cannot move)
    en = e.withColumn("nrm", F.sqrt(_dot_spark("embedding", "embedding")))
    ea = en.select(
        F.col("vec_id").alias("id_a"),
        F.col("embedding").alias("emb_a"),
        F.col("nrm").alias("nrm_a"),
    )
    eb = en.select(
        F.col("vec_id").alias("id_b"),
        F.col("embedding").alias("emb_b"),
        F.col("nrm").alias("nrm_b"),
    )
    dot = _dot_spark("emb_a", "emb_b")
    cos = dot / (F.col("nrm_a") * F.col("nrm_b"))
    return (
        cand.join(ea, "id_a")
        .join(eb, "id_b")
        .filter(cos >= COSINE_TAU)
        .select("id_a", "id_b", F.round(cos, 4).alias("cos"))
    )


CC_MAX_ITERS = 50


def connected_components(
    edges: DataFrame, max_iters: int = CC_MAX_ITERS
) -> tuple[DataFrame, int]:
    """(node, label=component min) for every node in ``edges``, via
    alternating large-star / small-star contraction (Kiveris et al.,
    "Connected Components in MapReduce and Beyond", SoCC'14).

    Each round is two equi-join + min-aggregate passes over the edge
    list; the edge set converges to stars rooted at component minima in
    O(log n) rounds — vs O(component diameter) for plain min-label
    propagation (a 1M-doc duplicate chain would need 1M propagation
    rounds but ~20 star rounds). localCheckpoint truncates lineage per
    round; convergence is detected by an exact integer (count, hash-sum)
    signature of the edge set. Returns (labels, rounds_run)."""
    # the star rounds run under a core-count shuffle conf: each round's
    # localCheckpoint materializes the current shuffle layout verbatim
    # (the round-7 checkpoint-layout rule, tables.scoped_shuffle_partitions)
    from flexcalc_spark.tables import scoped_shuffle_partitions

    _scope = scoped_shuffle_partitions(edges.sparkSession)
    _scope.__enter__()
    e = edges.select(
        F.col(edges.columns[0]).cast("bigint").alias("u"),
        F.col(edges.columns[1]).cast("bigint").alias("v"),
    ).filter(F.col("u") != F.col("v")).distinct().localCheckpoint()

    def signature(df: DataFrame) -> tuple:
        r = df.agg(
            F.count(F.lit(1)).alias("cnt"),
            # decimal accumulator: a long sum of 64-bit hashes overflows
            # under ANSI arithmetic
            F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")).alias("hs"),
        ).collect()[0]
        return (r["cnt"], r["hs"])

    def large_star(df: DataFrame) -> DataFrame:
        sym = df.union(df.select(F.col("v").alias("u"), F.col("u").alias("v")))
        m = sym.groupBy("u").agg(
            F.least(F.min("v"), F.first("u")).alias("m")
        )
        return (
            sym.filter(F.col("v") > F.col("u"))
            .join(m, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            # no distinct here (r14): each round's OUTPUT is produced
            # by small_star, which ends with its own distinct — the
            # intermediate multiset is bounded by |E| rows (m is
            # unique per u, so the join cannot duplicate), small_star's
            # MIN aggregate is duplicate-invariant, and the round
            # signature reads the small_star output only. Dropping the
            # shuffle cuts a round from 4 exchanges to 3.
        )

    def small_star(df: DataFrame) -> DataFrame:
        ori = df.select(
            F.greatest("u", "v").alias("b"), F.least("u", "v").alias("s")
        )
        m = ori.groupBy("b").agg(F.min("s").alias("m"))
        links = (
            ori.join(m, "b")
            .filter(F.col("s") != F.col("m"))
            .select(F.col("s").alias("u"), F.col("m").alias("v"))
        )
        return links.union(
            m.select(F.col("b").alias("u"), F.col("m").alias("v"))
        ).distinct()

    try:
        sig = signature(e)
        # NEGATIVE RESULT (r15): sizing the loop's shuffle partitions
        # from sig[0] (edge count / 64k, the stream-drain pattern)
        # measured FLAT at sf0.1 over 5 interleaved A/B rounds
        # (clusters MIN 6.51 vs 6.64, split 5.65 vs 5.49) — the star
        # loop is bound by its ~2 driver jobs per round (checkpoint +
        # signature collect), not by the 32-vs-1 near-empty task
        # count. Reverted; do not re-derive.
        rounds = 0
        for _ in range(max_iters):
            e2 = small_star(large_star(e)).localCheckpoint()
            rounds += 1
            sig2 = signature(e2)
            e = e2
            if sig2 == sig:
                break
            sig = sig2
    finally:
        _scope.__exit__(None, None, None)
    # fixed point: (child, root) stars; roots label themselves
    roots = e.select(F.col("v").alias("u"), F.col("v")).distinct()
    labels = e.union(roots).groupBy("u").agg(F.min("v").alias("label"))
    return labels.select(F.col("u").alias("node"), "label"), rounds


@register(
    "q_dedup_clusters",
    oracle=f"""
        WITH RECURSIVE t AS MATERIALIZED (
            SELECT doc_id, lang, list_distinct(string_split(lower(text), ' ')) AS toks
            FROM documents
        ),
        e AS MATERIALIZED (
            SELECT doc_id, lang, len(toks) AS sz, unnest(toks) AS tok FROM t
        ),
        -- inverted-index edge derivation (see q_dedup_neardup's oracle)
        edges AS MATERIALIZED (
            SELECT id_a AS src, id_b AS dst FROM (
                SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS isz,
                       ANY_VALUE(a.sz) AS sz_a, ANY_VALUE(b.sz) AS sz_b
                FROM e a JOIN e b
                  ON a.lang = b.lang AND a.tok = b.tok
                 AND a.doc_id < b.doc_id
                GROUP BY 1, 2
            )
            WHERE isz * {JACCARD_DEN} >= {JACCARD_NUM} * (sz_a + sz_b - isz)
        ),
        und AS MATERIALIZED (
            SELECT src, dst FROM edges
            UNION SELECT dst AS src, src AS dst FROM edges
        ),
        reach AS (
            SELECT src AS id, src AS r FROM und
            UNION
            SELECT reach.id, und.dst AS r
            FROM reach JOIN und ON und.src = reach.r
        )
        SELECT id AS doc_id, MIN(r) AS cluster_id FROM reach GROUP BY id
    """,
    family="dedup",
    scale_notes="dedup clusters = connected components via large-star/small-star alternation (Kiveris et al.): two equi-join + min-agg passes per round, O(log n) rounds (a long duplicate chain converges in ~2 log n rounds, not diameter), localCheckpoint truncates lineage, integer (count, hash-sum) signature detects convergence exactly; the oracle walks the same edges with a recursive CTE",
)
def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected-component cluster ids over the near-dup pair graph.

    The operator a training pipeline actually dedups with: pairs say
    "a~b"; clusters say "keep min(doc_id) of each component, drop the
    rest". Pure DataFrame ops in a driver-coordinated loop (the Spark
    idiom for iterative graph algorithms); the loop is large-star /
    small-star alternation — O(log n) rounds, see
    connected_components."""
    edges = _neardup_pairs(spark, sf_dir).select("id_a", "id_b")
    labels, _rounds = connected_components(edges)
    return labels.select(
        F.col("node").alias("doc_id"), F.col("label").alias("cluster_id")
    )


# --- Scale-safe embedding dedup: LSH-bucket candidates at near-dup tau ---
#
# q_dedup_embed (above) is the EXACT low-tau tier: at tau=0.4 — the
# ambient similarity of the corpus — no metric filter can prune with
# exact recall, so blocked GEMM over all block pairs is the right Ω(n²).
# A real pipeline deduplicating 100 TB of embeddings runs at a NEAR-DUP
# threshold (tau >= 0.9), where true pairs are angularly tiny and
# hyperplane-sign LSH buckets prune almost everything. This key grades
# that tier. The fixture corpus has no natural pairs above cos 0.61
# (measured at every sf), so the query PLANTS deterministic near-dups:
# for vec_id < EMBED_PLANT_N, a copy at vec_id + EMBED_PLANT_OFFSET
# perturbed per-dimension by integer-arithmetic noise (engine-portable:
# exact BIGINT ops + one IEEE divide — the md5-free analogue of
# sampling.py's hash discipline). At amplitude 0.02 over unit-norm
# vectors the planted pairs sit at cos ~0.999 while ambient stays below
# 0.61 — the separation a near-dup corpus actually has.
#
# Candidate recall is deterministic given the fixed seed: 64 planes in
# 8 bands of 8 bits recall all planted pairs at every sf (asserted in
# tests/test_recall.py); analytically a cos=0.999 pair misses all 8
# bands with p ~ 2.6e-8.

EMBED_LSH_TAU = 0.9
EMBED_LSH_PLANES = 64
EMBED_LSH_BANDS = 8            # 8 bands x 8 bits
EMBED_PLANT_N = 200
EMBED_PLANT_OFFSET = 1_000_000
EMBED_PLANT_AMP = "CAST(0.02 AS DOUBLE)"
_PLANT_NOISE = (
    "(CAST((vec_id * 48271 + i * 104729) % 1009 AS DOUBLE)"
    " / 1009.0 - 0.5)"
)


def _planted_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """embeddings ∪ perturbed copies of the first EMBED_PLANT_N vectors,
    all as DOUBLE arrays (bit-identical to the oracle's corpus CTE)."""
    e = table_parallel(spark, sf_dir, "embeddings")
    base = e.select(
        "vec_id",
        F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias(
            "embedding"
        ),
    )
    plant = e.filter(F.col("vec_id") < EMBED_PLANT_N).select(
        (F.col("vec_id") + EMBED_PLANT_OFFSET).alias("vec_id"),
        F.expr(
            "transform(embedding, (x, i) -> CAST(x AS DOUBLE) + "
            f"{EMBED_PLANT_AMP} * {_PLANT_NOISE})"
        ).alias("embedding"),
    )
    return base.unionByName(plant)


def _embed_band_keys() -> list:
    """8 band keys (8 sign bits each) under fixed seeded hyperplanes.

    Each key is ONE F.expr over generated SQL text rather than 64
    py4j-built when/fold Columns: building Column trees call-by-call
    costs a py4j round trip per node and the giant tree re-analyzes at
    every later DataFrame step (measured 1.2s -> 0.4s bucket build,
    identical values — each plane's fold text is unchanged, so the
    sign bits are bit-identical)."""
    import numpy as np

    rng = np.random.RandomState(20260814)
    planes = rng.standard_normal((EMBED_LSH_PLANES, 64)).tolist()

    def bit(plane: list) -> str:
        arr = ", ".join(repr(v) + "D" for v in plane)
        return (
            "(CASE WHEN aggregate(zip_with(embedding, array(" + arr
            + "), (x, y) -> x * y), CAST(0.0 AS DOUBLE),"
            " (acc, t) -> acc + t) > 0 THEN 1 ELSE 0 END)"
        )

    per_band = EMBED_LSH_PLANES // EMBED_LSH_BANDS
    keys = []
    for bnd in range(EMBED_LSH_BANDS):
        txt = "0"
        for i in range(per_band):
            txt = f"({txt} * 2 + {bit(planes[bnd * per_band + i])})"
        keys.append(F.expr(txt))
    return keys


# Exact all-pairs oracle over the planted corpus — shared by BOTH
# LSH tiers (8x8 and 4x16+multiprobe): a driver hash match against
# it certifies 100% candidate recall for whichever plan produced
# the pairs.
_EMBED_LSH_EXACT_ORACLE = f"""
        WITH corpus0 AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS embedding
            FROM embeddings
            UNION ALL
            SELECT orig_id + {EMBED_PLANT_OFFSET} AS vec_id,
                   list(x + {EMBED_PLANT_AMP} *
                        (CAST((orig_id * 48271 + i * 104729) % 1009
                              AS DOUBLE) / 1009.0 - 0.5)
                        ORDER BY i) AS embedding
            FROM (
                SELECT vec_id AS orig_id,
                       unnest(range(0, len(embedding))) AS i,
                       unnest(CAST(embedding AS DOUBLE[])) AS x
                FROM embeddings WHERE vec_id < {EMBED_PLANT_N}
            )
            GROUP BY orig_id
        ),
        -- MATERIALIZED: consumed by both join sides; per-vector norms
        -- hoisted so each of the O(n^2) pairs costs ONE list dot, not
        -- three. sqrt(aa)*sqrt(bb) is the identical FP op sequence as
        -- the inline form, and cos is computed once (pairs subquery)
        -- then reused by filter and floor-quantize — bit-identical.
        corpus AS MATERIALIZED (
            SELECT vec_id, embedding,
                   sqrt(list_dot_product(embedding, embedding)) AS nrm
            FROM corpus0
        ),
        pairs AS (
            SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                   list_dot_product(a.embedding, b.embedding)
                       / (a.nrm * b.nrm) AS c
            FROM corpus a JOIN corpus b ON a.vec_id < b.vec_id
        )
        SELECT id_a, id_b,
               CAST(floor(c * 10000.0) AS BIGINT) AS cos_q
        FROM pairs WHERE c >= {EMBED_LSH_TAU}
    """


@register(
    "q_dedup_embed_lsh",
    oracle=_EMBED_LSH_EXACT_ORACLE,
    family="dedup",
    scale_notes=(
        "the 100 TB embedding-dedup tier: near-dup tau (0.9) makes true "
        "pairs angularly tiny, so hyperplane-sign LSH buckets prune the "
        "pair space — candidates are an equi join on (band, band_key) "
        "(measured ~4% of all-pairs on the fixture corpus), deduped on "
        "the NARROW id pair before re-attaching 64-double vectors, then "
        "exact-re-scored by the JVM HOF fold and floor-quantized. The "
        "oracle is the EXACT all-pairs join over the identically "
        "constructed corpus, so the driver hash also certifies 100% "
        "candidate recall at this tau. Complements q_dedup_embed "
        "(exact blocked-GEMM tier for tau at ambient similarity); at "
        "rest the band keys are the partition/bucket columns, so "
        "candidate generation is shuffle-free. Measured at 20k-100k "
        "synthetic vectors (SCALE.md round-7 probe): the in-bucket "
        "pair census is quadratic with constant bands/2^bits (flat "
        "3.6% of all-pairs for this 8x8 config), so the 100 TB sweep "
        "moves to 16+ bits per band (256x sparser, 99.8% measured "
        "near-exact recall) with more bands/multi-probe to buy back "
        "boundary recall"
    ),
)
def q_dedup_embed_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-duplicate pairs (cos >= 0.9) via LSH-bucket
    candidates + exact JVM re-score, over the fixture corpus with
    deterministic planted near-dups (the fixture has no natural pairs
    above cos 0.61 — measured)."""
    # Per-vector norms ride the cache: HOF lambdas are interpreted (not
    # codegen'd), so computing sqrt(dot(e,e)) once per VECTOR instead of
    # twice per candidate PAIR cuts the re-score fold work ~3x. The
    # value is bit-identical — same expression text over the same
    # doubles — so the floor-quantized cos (and the oracle hash) cannot
    # move.
    # Construction memo (r15, VERDICT item 7): analyzing the 64-fold x
    # 64-literal band bank costs ~0.5-0.7 s of Catalyst work per call —
    # session_plan_memo returns the already-analyzed LAZY frames on
    # repeat calls (plan-only; execution still computes fresh per run).
    # cache() is re-applied per call: clearCache() between bench runs
    # unpersists, and persist on an already-cached frame is a no-op.
    def _build():
        c = _planted_corpus(spark, sf_dir).withColumn(
            "nrm", F.sqrt(_dot_spark("embedding", "embedding"))
        )
        b = c.select(
            "vec_id",
            F.posexplode(F.array(*_embed_band_keys())).alias(
                "band", "band_key"
            ),
        )
        return c, b

    corpus, buckets = session_plan_memo(
        spark, f"{sf_dir}/embeddings.parquet", "embed_lsh_8x8", _build
    )
    corpus = corpus.cache()  # 3 consumers: bucket build + both re-score
    # sides (HOF arrays re-evaluate per consumer subtree otherwise)
    cand = (
        buckets.select(F.col("vec_id").alias("id_a"), "band", "band_key")
        .join(
            buckets.select(F.col("vec_id").alias("id_b"), "band", "band_key"),
            ["band", "band_key"],
        )
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
        # Re-score parallelism (r14, guide §2.5): the exact-cosine fold
        # (64-double zip_with/aggregate per pair, interpreted) is
        # compute-bound but ran in the distinct's byte-sized output
        # layout — repartition the narrow id-pair stream to core count
        # before the vector re-attach (the _prefix_filter_pairs rule;
        # hash by the pair key — skips sortBeforeRepartition).
        .repartition(spark.sparkContext.defaultParallelism, "id_a", "id_b")
    )
    ea = corpus.select(
        F.col("vec_id").alias("id_a"),
        F.col("embedding").alias("emb_a"),
        F.col("nrm").alias("nrm_a"),
    )
    eb = corpus.select(
        F.col("vec_id").alias("id_b"),
        F.col("embedding").alias("emb_b"),
        F.col("nrm").alias("nrm_b"),
    )
    dot = _dot_spark("emb_a", "emb_b")
    cos = dot / (F.col("nrm_a") * F.col("nrm_b"))
    return (
        cand.join(ea, "id_a")
        .join(eb, "id_b")
        .filter(cos >= EMBED_LSH_TAU)
        .select(
            "id_a",
            "id_b",
            F.floor(cos * 10000.0).cast("bigint").alias("cos_q"),
        )
    )



# --- Scale tier: 4 bands x 16 bits + Hamming-1 multi-probe ----------
#
# The round-7 probe (scripts/scale_probe_embed.py, SCALE.md) showed the
# 8x8 config's in-bucket pair census is QUADRATIC with constant
# bands/2^bits (flat ~3.6% of all-pairs), while 16-bit bands are 256x
# sparser per band. But wider bands trade recall: at cos ~0.999 a
# 16-bit band agrees with p ~ (1 - theta/pi)^16 ~ 0.80, and 4
# independent bands miss with p ~ 1.7e-3 — MEASURED: plain 4x16 missed
# 1 of 200 planted pairs at sf0.01 (the grading scale). The standard
# fix is multi-probe LSH (Lv et al., VLDB 2007): probe each band's
# Hamming-1 ball (the 16 single-bit flips) so a pair is a candidate
# when any band differs by <= 1 bit — per-band miss drops to
# P(>=2 flipped bits) and the 4-band miss to ~2.3e-7 per pair.
# Measured on the fixture corpus (all three sf): 0 missed true pairs;
# candidate fraction 0.26% (sf0.01) / 0.19% (sf0.1) of all-pairs —
# ~15x sparser than the 8x8 config — so this is the config the 100 TB
# sweep actually runs, and here it is graded against the exact oracle.
EMBED_WIDE_BANDS = 4           # 4 bands x 16 bits over the same planes
EMBED_WIDE_BITS = 16


def _embed_band_keys_wide() -> list:
    """4 band keys (16 sign bits each) over the SAME seeded hyperplanes
    as the 8x8 tier (regrouped), as generated-SQL-text F.exprs (the
    py4j/plan-construction rule — see _embed_band_keys)."""
    import numpy as np

    rng = np.random.RandomState(20260814)
    planes = rng.standard_normal((EMBED_LSH_PLANES, 64)).tolist()

    def bit(plane: list) -> str:
        arr = ", ".join(repr(v) + "D" for v in plane)
        return (
            "(CASE WHEN aggregate(zip_with(embedding, array(" + arr
            + "), (x, y) -> x * y), CAST(0.0 AS DOUBLE),"
            " (acc, t) -> acc + t) > 0 THEN 1 ELSE 0 END)"
        )

    keys = []
    for bnd in range(EMBED_WIDE_BANDS):
        txt = "0L"
        for i in range(EMBED_WIDE_BITS):
            txt = f"({txt} * 2 + {bit(planes[bnd * EMBED_WIDE_BITS + i])})"
        keys.append(F.expr(txt))
    return keys


@register(
    "q_dedup_embed_lsh_wide",
    oracle=_EMBED_LSH_EXACT_ORACLE,
    family="dedup",
    scale_notes=(
        "the GRADED 100 TB embedding-dedup configuration: 4 bands x "
        "16 sign bits with Hamming-1 multi-probe, against the same "
        "exact all-pairs oracle as q_dedup_embed_lsh — the driver hash "
        "certifies 100% candidate recall of this sparse config, not "
        "just the dense 8x8 one. Signatures are 4 BIGINT columns "
        "computed once per vector (64 JVM HOF dot folds); the probe "
        "side expands each key to its 17-element Hamming-1 ball with "
        "pure integer XORs (no re-hashing), so candidates are an equi "
        "join on (band, key) at 0.19-0.26% of all-pairs (measured, "
        "~15x sparser than 8x8; per-pair miss ~2.3e-7 at cos 0.999). "
        "At rest the 4 band keys are the table's partition/bucket "
        "columns: candidate generation reads only same-key buckets "
        "and the ball probe turns into 17 bucket lookups — no "
        "all-pairs shuffle at any scale. Wider corpora lower the "
        "census further by adding bits per band and buying recall "
        "back with more probes (the measured bits-vs-probes tradeoff "
        "in SCALE.md)"
    ),
)
def q_dedup_embed_lsh_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-duplicate pairs (cos >= 0.9) via sparse 4x16
    sign-LSH with Hamming-1 multi-probe + exact JVM re-score; same
    planted corpus and output as q_dedup_embed_lsh."""
    # Construction memo (r15, VERDICT item 7): the profiled per-call
    # construction cost was 0.03 s expression PARSE (the r7 generated-
    # text fix already handled that) + ~0.66 s Catalyst ANALYSIS of the
    # 4x16x64-literal sign-fold trees + ~0.27 s corpus plan build —
    # session_plan_memo returns the analyzed LAZY frames on repeat
    # calls in the same session. Plan-only: the localCheckpoint below
    # runs per call, so every bench/oracle run still executes the fold
    # bank fresh from parquet. cache() re-applied per call (no-op when
    # already cached; re-registers after clearCache).
    def _build():
        c = _planted_corpus(spark, sf_dir).withColumn(
            "nrm", F.sqrt(_dot_spark("embedding", "embedding"))
        )
        s = c.select(
            "vec_id",
            F.posexplode(F.array(*_embed_band_keys_wide())).alias(
                "band", "bkey"
            ),
        )
        return c, s

    corpus, sig_plan = session_plan_memo(
        spark, f"{sf_dir}/embeddings.parquet", "embed_lsh_wide", _build
    )
    corpus = corpus.cache()  # consumers: signature build + both re-score sides
    # narrow (id, band, key); consumed by probe AND index. NOT cache():
    # localCheckpoint truncates the 4 wide band-key expressions (16
    # nested sign folds x 64 literal doubles each) out of every
    # downstream plan and guarantees the folds run exactly once even
    # under cache eviction. MEASURED honestly: this does NOT move the
    # key's driver-style wall-clock (~10-12 s at sf0.01 either way) —
    # the dominant cost is the one-time codegen/interpretation of the
    # 64-fold bank itself (the round-7 '7 s compiling codegen' class),
    # which any first execution pays. Values identical; n x 4 rows.
    sig = sig_plan.localCheckpoint()
    ball = F.array(
        F.col("bkey"),
        *[
            F.expr(f"bkey ^ {1 << j}L")
            for j in range(EMBED_WIDE_BITS)
        ],
    )
    probe = sig.select(
        F.col("vec_id").alias("id_p"),
        "band",
        F.explode(ball).alias("bkey"),
    )
    index = sig.select(F.col("vec_id").alias("id_i"), "band", "bkey")
    cand = (
        probe.join(index, ["band", "bkey"])
        .filter(F.col("id_p") != F.col("id_i"))
        .select(
            F.least("id_p", "id_i").alias("id_a"),
            F.greatest("id_p", "id_i").alias("id_b"),
        )
        .distinct()
        # NOT repartitioned before re-score (unlike q_dedup_embed_lsh):
        # the Hamming-1 multi-probe candidate set is small enough that
        # the extra exchange measured 1.15x SLOWER in the r14
        # interleaved A/B — the unstarve rule applies to pair streams
        # that are large AND compute-bound, not to answer-sized ones.
    )
    ea = corpus.select(
        F.col("vec_id").alias("id_a"),
        F.col("embedding").alias("emb_a"),
        F.col("nrm").alias("nrm_a"),
    )
    eb = corpus.select(
        F.col("vec_id").alias("id_b"),
        F.col("embedding").alias("emb_b"),
        F.col("nrm").alias("nrm_b"),
    )
    cos = _dot_spark("emb_a", "emb_b") / (F.col("nrm_a") * F.col("nrm_b"))
    return (
        cand.join(ea, "id_a")
        .join(eb, "id_b")
        .filter(cos >= EMBED_LSH_TAU)
        .select(
            "id_a",
            "id_b",
            F.floor(cos * 10000.0).cast("bigint").alias("cos_q"),
        )
    )


# ------------------------------------------------- containment dedup
CONTAIN_TAU = 0.8
CONTAIN_NUM, CONTAIN_DEN = 4, 5        # == CONTAIN_TAU as an exact ratio
CONTAIN_GRAM = 5


@register(
    "q_dedup_containment",
    oracle=f"""
        WITH g AS MATERIALIZED (
            SELECT doc_id,
                   list_distinct(list_transform(
                       range(1, LENGTH(text) - {CONTAIN_GRAM - 2}),
                       i -> substring(text, CAST(i AS INT), {CONTAIN_GRAM})))
                       AS grams
            FROM documents WHERE LENGTH(text) >= {CONTAIN_GRAM}
        ),
        e AS MATERIALIZED (
            SELECT doc_id, len(grams) AS sz, unnest(grams) AS gram FROM g
        ),
        p AS MATERIALIZED (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   COUNT(*) AS isz, ANY_VALUE(a.sz) AS sz_a
            FROM e a JOIN e b ON a.gram = b.gram AND a.doc_id <> b.doc_id
            GROUP BY 1, 2
        )
        SELECT id_a, id_b,
               CAST((isz * 1000000) // sz_a AS BIGINT) AS cont_ppm
        FROM p WHERE isz * {CONTAIN_DEN} >= {CONTAIN_NUM} * sz_a
    """,
    family="dedup",
    scale_notes=(
        "ASYMMETRIC containment dedup |A∩B|/|A| >= 0.8 over char-5-gram "
        "shingles — the sub-document-overlap complement to the symmetric "
        "Jaccard keys (a short doc duplicated inside a long one scores "
        "containment ~1 but Jaccard ~|A|/|B|, invisible to them). "
        "Candidates: containment >= tau forces overlap >= ceil(tau*|A|), "
        "so by pigeonhole A's rarest-first prefix of |A|-ceil(tau*|A|)+1 "
        "grams must hit the intersection — the probe side explodes only "
        "that prefix (~20% of grams at tau=0.8) while the indexed side "
        "carries all grams (containment bounds nothing about |B|, so no "
        "symmetric prefix or size-ratio prune exists); the equi join on "
        "the gram hash has GUARANTEED recall and the exact hashed-array "
        "re-score keeps output identical to all-pairs. PPJoin positional "
        "filter (suffix bound vs ceil(tau*|A|)) prunes instances before "
        "the pair distinct; size prune |B| >= ceil(tau*|A|). HONEST "
        "census (same caveat as the LSH keys): candidates measure ~47% "
        "of all-pairs on this fixture AND a flat ~15% on a synthetic "
        "Zipf(1) corpus (scripts/scale_probe_zipf.py, n=2k-32k) — "
        "char-5-gram containment at tau=0.8 is QUADRATIC regardless of "
        "corpus shape, because the ~20% probe prefix still carries "
        "grams of hot words whose df grows with n. Density is a DATA+"
        "UNIT property; the filters only guarantee recall. The MEASURED "
        "scale lever is the gram unit: word-2-gram shingles through the "
        "identical machinery census ~n (fraction falls ~1/n on the Zipf "
        "corpus; SCALE.md round-8) — at 100 TB shingle on words for the "
        "candidate stage, keep char-grams for the exact re-score, and "
        "hash-partition the inverted gram index. The word-shingle tier "
        "is GRADED as q_dedup_containment_shingle (round 9)"
    ),
)
def q_dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed containment pairs (A mostly inside B) by 5-gram overlap
    >= 0.8 of A's gram set; prefix-filtered probe side vs full-token
    index side, exact re-score on hashed gram arrays."""
    d = table_parallel(spark, sf_dir, "documents")
    grams_expr = F.expr(
        f"transform(sequence(1, length(text) - {CONTAIN_GRAM - 1}),"
        f" i -> substring(text, i, {CONTAIN_GRAM}))"
    )
    items = d.filter(F.length("text") >= CONTAIN_GRAM).select(
        "doc_id",
        F.lit("all").alias("grp"),
        F.array_distinct(grams_expr).alias("items"),
    )
    return _containment_pairs(items, CONTAIN_NUM, CONTAIN_DEN)


def _containment_pairs(items: DataFrame, num: int, den: int) -> DataFrame:
    """Directed containment pairs |A∩B| >= (num/den)·|A| over per-doc
    item sets — the machinery shared by the char-gram and word-shingle
    containment keys (the gram UNIT is the caller's choice and, per the
    round-8 Zipf census, the scale lever). Guaranteed-recall prefix
    probe vs full index, PPJoin positional filter, exact hashed
    re-score; emits (id_a, id_b, cont_ppm)."""
    spark = items.sparkSession
    # cache the narrow per-doc item-array table: _ranked_token_arrays
    # consumes its subtree twice (token-frequency aggregate + re-join)
    # and the gram HOF otherwise re-evaluates per consumer (the
    # _prefix_filter_pairs rule; scan-derived, so caching as-is is fine)
    items = items.cache()
    # Bitmap pre-filter (r15, guide §2.3/§4.2): only at HIGH tau — the
    # bound below is popcount(sig_a & ~sig_b) <= sz_a - ceil(tau*sz_a),
    # and at low tau the slack exceeds any real popcount, so the filter
    # would prune nothing and the sig would be pure cost. Both current
    # callers (containment 4/5, shingle 4/5) take the use_sig branch;
    # the low-tau branch is kept for the regime-dependent form choice
    # the 2stage scale_notes document (its stage 1 now runs the count
    # form and bypasses this function entirely).
    use_sig = 2 * num >= den
    # repartition to core count BEFORE caching: the groupBy-derived table
    # would otherwise pin the vanilla session's 200-partition layout into
    # the InMemoryRelation for all three consumers (CLAUDE.md cache rule)
    ranked = (
        _ranked_token_arrays(items, with_sig=use_sig)
        .repartition(spark.sparkContext.defaultParallelism)
        .cache()
    )
    # re-score parallelism: same narrow repartition as _prefix_filter_pairs
    # (the candidate distinct's byte-sized output layout starves the
    # compute-bound intersect stage — measured 34.4 s -> ~9 s at sf0.1)
    cand = _containment_candidates(ranked, num, den).repartition(
        spark.sparkContext.defaultParallelism, "id_a", "id_b"
    )
    if use_sig:
        # RECALL-SAFE bitmap pre-filter over the candidate pair stream.
        # Proof: every hashed item of A∩B is an item of B, so its bit is
        # set in sig_b; a bit set in (sig_a & ~sig_b) can therefore only
        # come from items of A\B, and distinct bits <= distinct items:
        #   popcount(sig_a & ~sig_b) <= |A\B| = sz_a - isz.
        # A qualifying pair has isz >= t_a = ceil(num*sz_a/den), hence
        # popcount <= sz_a - t_a — keeping exactly those pairs loses NO
        # qualifying pair at any bitmap width; false positives just pay
        # the exact intersect below, so output is identical. Cost per
        # pair: 16 AND-NOT+bit_count codegen terms on 128-byte sigs vs
        # array_intersect's per-pair hash set over ~350-element ~2.8 KB
        # arrays (r14 VERDICT item 1; measured at sf0.1 in
        # OPTIMIZATION_r15.md). Unrolled generated text, ONE F.expr —
        # the r7 build-banks-as-SQL-text lesson; 16 flat O(1) terms, not
        # the 64x64 nested-fold bank that lost in r14.
        excess = " + ".join(
            f"bit_count(element_at(sig_a, {k + 1}) & ~element_at(sig_b, {k + 1}))"
            for k in range(SIG_WORDS)
        )
        slack = f"sz_a - (({num} * sz_a + {den - 1}) div {den})"
        pa = ranked.select(
            F.col("doc_id").alias("id_a"),
            F.size("hitems").alias("sz_a"),
            F.col("sig").alias("sig_a"),
        )
        pb = ranked.select(
            F.col("doc_id").alias("id_b"), F.col("sig").alias("sig_b")
        )
        cand = (
            cand.join(pa, "id_a")
            .join(pb, "id_b")
            .filter(F.expr(f"({excess}) <= {slack}"))
            .select("id_a", "id_b")
        )
    ta = ranked.select(F.col("doc_id").alias("id_a"), F.col("hitems").alias("items_a"))
    tb = ranked.select(F.col("doc_id").alias("id_b"), F.col("hitems").alias("items_b"))
    isz = F.size(F.array_intersect(F.col("items_a"), F.col("items_b")))
    return (
        cand.join(ta, "id_a")
        .join(tb, "id_b")
        .filter(isz * den >= num * F.size("items_a"))
        .select(
            "id_a",
            "id_b",
            # CAST the size to BIGINT BEFORE the 1e6 multiply: size()
            # is INT and INT*1000000 wraps at isz >= 2148 in non-ANSI
            # Spark (fixture max is ~350 grams/doc — only 6x headroom;
            # canary in test_fixture_assumptions.py)
            F.expr(
                f"(CAST(size(array_intersect(items_a, items_b)) AS BIGINT)"
                f" * 1000000) div size(items_a)"
            ).cast("bigint").alias("cont_ppm"),
        )
    )


def _containment_candidates(ranked: DataFrame, num: int, den: int) -> DataFrame:
    """The raw prefix-probe x full-index candidate relation of
    _containment_pairs, BEFORE the exact re-score — factored out so the
    census probes (scripts/scale_probe_zipf.py) count the graded
    machinery's own join rather than a reconstruction of it. ``ranked``
    is _ranked_token_arrays output."""
    # probe side: A's rarest-first prefix of sz - ceil(tau*sz) + 1 grams,
    # with 1-based global positions (the slice is the array head, so
    # posexplode positions ARE positions in the full ranked array)
    prefix_len = F.expr(
        f"size(hitems) - (({num} * size(hitems) + {den - 1})"
        f" div {den}) + 1"
    )
    probe = ranked.select(
        F.col("doc_id").alias("id_a"),
        F.size("hitems").alias("sz_a"),
        F.posexplode(F.slice(F.col("hitems"), F.lit(1), prefix_len)).alias(
            "pa0", "it"
        ),
    ).select("id_a", "sz_a", (F.col("pa0") + 1).alias("pa"), "it")
    # index side: ALL grams (no prefix — containment bounds only A),
    # also with positions for the positional filter below
    index = ranked.select(
        F.col("doc_id").alias("id_b"),
        F.size("hitems").alias("sz_b"),
        F.posexplode("hitems").alias("pb0", "it"),
    ).select("id_b", "sz_b", (F.col("pb0") + 1).alias("pb"), "it")
    t_a = F.expr(f"({num} * sz_a + {den - 1}) div {den}")
    # PPJoin positional filter, containment form: a shared gram at
    # global-rank positions (pa, pb) bounds the overlap by
    # 1 + min(sz_a - pa, sz_b - pb) >= t_a = ceil(tau * sz_a). For a
    # TRUE pair the instance at the FIRST shared gram always passes
    # (all common grams sit at positions >= pa in A resp. >= pb in B,
    # so overlap <= both suffix lengths), and the FIRST shared gram is
    # inside A's prefix by pigeonhole — pruning later instances never
    # loses a pair. Measured at sf0.1: join instances 55.1M -> 35.2M
    # (the distinct's shuffle input), distinct pairs 11.9M -> 11.0M —
    # on this fixture most pruned instances belong to pairs that also
    # share an early rare gram, so the census cut is modest; on a
    # Zipf-tailed corpus the hot-gram instances ARE the census and
    # this filter is the standard lever (Xiao et al.). See SCALE.md.
    pos_ok = (
        F.lit(1) + F.least(F.col("sz_a") - F.col("pa"), F.col("sz_b") - F.col("pb"))
        >= t_a
    )
    return (
        probe.join(index, "it")
        .filter((F.col("id_a") != F.col("id_b")) & (F.col("sz_b") >= t_a) & pos_ok)
        .select("id_a", "id_b")
        .distinct()
    )


@register(
    "q_dedup_containment_shingle",
    oracle="""
        -- inverted-index form (the repo-wide rule: never the all-pairs
        -- list_intersect join; see q_dedup_containment's oracle)
        WITH g AS MATERIALIZED (
            SELECT doc_id,
                   list_distinct(list_transform(
                       range(1, len(string_split(text, ' '))),
                       i -> string_split(text, ' ')[i] || ' ' ||
                            string_split(text, ' ')[i + 1])) AS grams
            FROM documents WHERE len(string_split(text, ' ')) >= 2
        ),
        e AS MATERIALIZED (
            SELECT doc_id, len(grams) AS sz, unnest(grams) AS gram FROM g
        ),
        p AS MATERIALIZED (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   COUNT(*) AS isz, ANY_VALUE(a.sz) AS sz_a
            FROM e a JOIN e b ON a.gram = b.gram AND a.doc_id <> b.doc_id
            GROUP BY 1, 2
        )
        SELECT id_a, id_b,
               CAST((isz * 1000000) // sz_a AS BIGINT) AS cont_ppm
        FROM p WHERE isz * 5 >= 4 * sz_a
    """,
    family="dedup",
    scale_notes=(
        "the GRADED scale-safe containment tier the round-8 Zipf census "
        "prescribed: identical machinery to q_dedup_containment "
        "(guaranteed-recall rarest-first prefix probe vs full index, "
        "PPJoin positional filter, exact hashed re-score) with the gram "
        "UNIT moved from char-5-grams to WORD-2-GRAM shingles — the "
        "measured lever. Char-5-gram candidates census flat ~15% of "
        "all-pairs on every corpus shape tried (hot-word grams have "
        "df ~ n); word-2-gram shingle probability is the PRODUCT of two "
        "word probabilities, so the rarest-first prefix lands in the "
        "sparse tail and the candidate census is ~n (scripts/"
        "scale_probe_zipf.py: fraction falls ~1/n, 4.0e-5 -> 4.0e-6 at "
        "n=2k -> 32k; recall-floor test on the same corpus in tests/"
        "test_recall.py::test_containment_shingle_zipf_recall). Recall "
        "for the key's own semantics is "
        "GUARANTEED by pigeonhole (not probabilistic, not fixture-"
        "dependent): containment >= tau forces a shared shingle inside "
        "A's prefix. At 100 TB this is the candidate stage; a char-gram "
        "re-score over these candidates (q_dedup_containment's scorer) "
        "adds sub-word robustness where needed — measured coupling on "
        "this fixture in SCALE.md round-9 (word-bigram containment of "
        "true char-gram pairs bottoms at 0.33 at sf0.1, so the unit "
        "changes the qualifying set; the two keys are siblings, not "
        "substitutes)"
    ),
)
def q_dedup_containment_shingle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed containment pairs (A mostly inside B) by word-2-gram
    shingle overlap >= 0.8 of A's shingle set — the scale-safe gram
    unit through the same prefix-filter machinery as
    q_dedup_containment."""
    d = table_parallel(spark, sf_dir, "documents")
    shingles = F.expr(
        "transform(sequence(1, size(words) - 1),"
        " i -> concat(element_at(words, i), ' ', element_at(words, i + 1)))"
    )
    items = (
        d.select("doc_id", F.split("text", " ").alias("words"))
        .filter(F.size("words") >= 2)
        .select(
            "doc_id",
            F.lit("all").alias("grp"),
            F.array_distinct(shingles).alias("items"),
        )
    )
    return _containment_pairs(items, CONTAIN_NUM, CONTAIN_DEN)


# --- Leakage-safe train/eval split: whole clusters to one side ----------
#
# The split a training pipeline must run AFTER near-dup detection:
# hash-splitting documents independently puts near-duplicates on both
# sides of the train/eval boundary, so the eval set silently overlaps
# the training set (the contamination the decontaminate key scrubs
# against EXTERNAL benchmarks, here arising internally). The fix is to
# split by CLUSTER: every document inherits its near-dup component's
# root, and the root — not the doc — is hashed into a split, so a
# cluster never straddles the boundary. The split hash is exact
# integer arithmetic (minimal-standard LCG multiplier, mod 2^16, then
# decile) — portable across engines and safe under every division/mod
# sign convention because all operands are non-negative.

SPLIT_MULT = 48271             # minimal-standard LCG multiplier
SPLIT_MOD = 65536
SPLIT_TRAIN_DECILES = 8        # of 10 -> 80/20 train/eval


@register(
    "q_split_dedup_safe",
    oracle=f"""
        WITH RECURSIVE t AS MATERIALIZED (
            SELECT doc_id, lang, list_distinct(string_split(lower(text), ' ')) AS toks
            FROM documents
        ),
        e AS MATERIALIZED (
            SELECT doc_id, lang, len(toks) AS sz, unnest(toks) AS tok FROM t
        ),
        -- inverted-index edge derivation (see q_dedup_neardup's oracle)
        edges AS MATERIALIZED (
            SELECT id_a AS src, id_b AS dst FROM (
                SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS isz,
                       ANY_VALUE(a.sz) AS sz_a, ANY_VALUE(b.sz) AS sz_b
                FROM e a JOIN e b
                  ON a.lang = b.lang AND a.tok = b.tok
                 AND a.doc_id < b.doc_id
                GROUP BY 1, 2
            )
            WHERE isz * {JACCARD_DEN} >= {JACCARD_NUM} * (sz_a + sz_b - isz)
        ),
        und AS MATERIALIZED (
            SELECT src, dst FROM edges
            UNION SELECT dst AS src, src AS dst FROM edges
        ),
        reach AS (
            SELECT src AS id, src AS r FROM und
            UNION
            SELECT reach.id, und.dst AS r
            FROM reach JOIN und ON und.src = reach.r
        ),
        labels AS (SELECT id AS doc_id, MIN(r) AS cluster_id FROM reach GROUP BY id)
        SELECT CAST(d.doc_id AS BIGINT) AS doc_id,
               CAST(COALESCE(l.cluster_id, d.doc_id) AS BIGINT) AS cluster_root,
               CASE WHEN ((COALESCE(l.cluster_id, d.doc_id) * {SPLIT_MULT})
                          % {SPLIT_MOD}) % 10 < {SPLIT_TRAIN_DECILES}
                    THEN 'train' ELSE 'eval' END AS split
        FROM documents d LEFT JOIN labels l ON l.doc_id = d.doc_id
    """,
    family="curation",
    scale_notes=(
        "leakage-safe 80/20 split: documents inherit their near-dup "
        "component root (the SAME edge relation q_dedup_clusters "
        "contracts, large-star/small-star in O(log n) rounds) and the "
        "ROOT is hashed into a decile, so a cluster never straddles "
        "train/eval — the internal-contamination twin of "
        "q_decontaminate. Singletons (no near-dup) root at their own "
        "doc_id via an unhinted left join (labels only cover docs in "
        "the pair graph; AQE broadcasts it at small scale, shuffles "
        "past the threshold). The split hash is exact non-negative "
        "integer arithmetic (LCG multiply mod 2^16, then decile) — "
        "engine-portable, partition-independent, and stable under "
        "re-runs, so an incremental corpus re-split only moves docs "
        "whose CLUSTER changed. root*48271 needs doc_id < 2^47 — "
        "6 orders of magnitude above any real corpus id space"
    ),
)
def q_split_dedup_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """80/20 train/eval split where every near-dup cluster lands whole
    on one side: cluster roots from connected components over the
    q_dedup_neardup pair graph, split decided by an integer hash of
    the root."""
    edges = _neardup_pairs(spark, sf_dir).select("id_a", "id_b")
    labels, _rounds = connected_components(edges)
    d = table(spark, sf_dir, "documents").select("doc_id")
    lab = labels.select(F.col("node").alias("doc_id"), F.col("label"))
    root = F.coalesce(F.col("label"), F.col("doc_id"))
    return d.join(lab, "doc_id", "left").select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        root.cast("bigint").alias("cluster_root"),
        F.when(
            ((root * SPLIT_MULT) % SPLIT_MOD) % 10 < SPLIT_TRAIN_DECILES,
            F.lit("train"),
        )
        .otherwise(F.lit("eval"))
        .alias("split"),
    )


# --- Two-stage containment: word-shingle candidates, char-gram score ----
#
# The 100 TB containment recipe SCALE.md rounds 8-9 prescribe, shipped
# as a GRADED (rows-only) plan instead of prose: candidates from the
# ~n word-2-gram shingle stage, exact char-5-gram containment re-score
# on candidates only. The two gram units qualify different pair sets
# (measured coupling: word-bigram containment of true char-gram pairs
# bottoms at 0.333 at sf0.1), so the candidate threshold sits at 0.2 —
# BELOW the measured coupling floor — and recall is certified by a
# local recall-floor test against brute-force char-gram containment
# (tests/test_recall.py), not by a hash oracle whose margin would be
# zero under fixture regen (the round-9 decision VERDICT r9 accepted).

TWOSTAGE_CAND_NUM, TWOSTAGE_CAND_DEN = 1, 5   # candidate tau = 0.2


def _twostage_items(d: DataFrame) -> DataFrame:
    """Per-doc word-2-gram shingle sets for the 2stage candidate stage
    (shared by the graded plan and the Zipf census probe)."""
    shingles = F.expr(
        "transform(sequence(1, size(words) - 1),"
        " i -> concat(element_at(words, i), ' ', element_at(words, i + 1)))"
    )
    # single-word docs have no bigram; fall back to the word itself so
    # they still participate (a bigram always contains a space, a word
    # never does — the item namespaces are disjoint). Pairs whose ONLY
    # containment evidence is sub-word remain outside the word-unit
    # candidate reach — see the key's scale_notes (r10 review finding).
    return d.select("doc_id", F.split("text", " ").alias("words")).select(
        "doc_id",
        F.lit("all").alias("grp"),
        F.array_distinct(
            F.when(F.size("words") >= 2, shingles).otherwise(F.col("words"))
        ).alias("items"),
    )


def _twostage_pair_counts(items: DataFrame) -> DataFrame:
    """(id_a, id_b, isz): EXACT directed shingle-overlap counts for
    every doc pair sharing >= 1 item — the inverted-index COUNT form
    (explode hashed items, equi self-join, COUNT(*) per pair; the
    oracle-side shape of the dedup family, r7). Factored out so the
    Zipf census probe counts the graded plan's own raw relation
    (r13 extraction rule)."""
    ex = items.select(
        "doc_id", F.explode("items").alias("tk")
    ).select("doc_id", F.xxhash64("tk").alias("it"))
    return (
        ex.select(F.col("doc_id").alias("id_a"), "it")
        .join(ex.select(F.col("doc_id").alias("id_b"), "it"), "it")
        .filter(F.col("id_a") != F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("isz"))
    )


def _twostage_candidate_pairs(d: DataFrame) -> DataFrame:
    """Stage 1 of q_dedup_containment_2stage: word-2-gram shingle
    candidate pairs at the low candidate tau (0.2), via the exact
    inverted-index COUNT form (r15 rewrite, guide §2.3 "aggregate
    before you shuffle").

    WHY the count form here and the prefix+intersect form elsewhere:
    the prefix probe is sz - ceil(tau*sz) + 1 items — at tau 0.8 that
    is ~20% of each doc (thin probe, so the r14 full-count attempt
    cost 1.54 BILLION char-gram instances and lost), but at tau 0.2
    it is ~80% (fat probe), so probing ALL items costs only ~25% more
    join instances (73M at sf0.1) while COUNT(*) per pair replaces the
    ENTIRE re-score: no ranked arrays, no 17.9M-pair distinct, no
    array attach, no 17.9M array_intersects. Survivors are provably
    identical: COUNT(*) over the hashed-item equi join IS
    |A∩B| at the hash level (items are array_distinct'd), the same
    quantity size(array_intersect(hitems_a, hitems_b)) computed — and
    the measured survivor count at sf0.1 is byte-equal (273,882 both
    forms; stage-1 wall 13.1 -> 5.4 s). Pinned against brute force in
    tests/test_recall.py::test_twostage_stage1_count_form_equivalence.

    The survivor stream is hash-repartitioned to core count for stage
    2's compute-bound char-gram attach (the r14 unstarve rule: the
    groupBy leaves ~274k pairs in AQE-byte-coalesced partitions)."""
    spark = d.sparkSession
    items = _twostage_items(d).cache()
    szs = items.select(F.col("doc_id").alias("id_a"), F.size("items").alias("sz_a"))
    return (
        _twostage_pair_counts(items)
        .join(F.broadcast(szs), "id_a")
        .filter(
            F.col("isz") * TWOSTAGE_CAND_DEN
            >= TWOSTAGE_CAND_NUM * F.col("sz_a")
        )
        .select("id_a", "id_b")
        .repartition(
            spark.sparkContext.defaultParallelism, "id_a", "id_b"
        )
    )


@register(
    "q_dedup_containment_2stage",
    oracle=None,
    family="dedup",
    scale_notes=(
        "the two-stage containment composition, graded end-to-end as a "
        "rows-only key: stage 1 generates candidate pairs with the "
        "word-2-gram shingle machinery (shared _containment_pairs — "
        "guaranteed-recall rarest-first prefix probe, PPJoin positional "
        "filter) at candidate tau 0.2, stage 2 re-scores ONLY those "
        "candidates with exact char-5-gram containment at tau 0.8. "
        "Recall is EMPIRICAL, not pigeonhole: a char-gram pair is "
        "emitted iff its word-level containment reaches 0.2, and the "
        "measured coupling floor on this fixture is 0.333 at sf0.1 "
        "(SCALE.md round-9) — a 1.65x margin, asserted by the recall-"
        "floor test tests/test_recall.py::test_containment_2stage_"
        "recall_floor against brute-force char-gram containment (the "
        "honest certification for a composition whose hash oracle "
        "would sit on a zero-margin cliff under fixture regen; VERDICT "
        "r9 what's-missing #3). STRUCTURAL LIMIT: the candidate unit "
        "is word-level (bigrams; bare word for single-word docs), so a "
        "pair whose containment evidence is purely SUB-word — a "
        "space-free string buried inside another doc's longer token — "
        "is invisible to this stage at any tau; the char-gram sibling "
        "q_dedup_containment covers that regime (they are siblings, "
        "not substitutes — the round-9 lesson, now stated for the "
        "composition too). Scale, MEASURED ON THE PLAN ITSELF "
        "(SCALE.md round-11, scripts/scale_probe_zipf.py `twostage` — "
        "the probe counts _containment_candidates and "
        "_twostage_candidate_pairs, the graded plan's own relations): "
        "the raw tau-0.2 prefix join censuses ~n^2.05 under a FIXED "
        "vocabulary (flat ~0.9% of all-pairs; the fixture's 1.1% at "
        "sf0.1 is this regime's extreme), ~n^1.62 under Heaps V~sqrt(n) "
        "and ~n^1.21 under V~n — the natural-text regime at corpus "
        "scale — vs the graded tau-0.8 stage's ~n; and the only pair "
        "relation that MATERIALIZES into stage 2 (the word-level 0.2 "
        "re-score survivors) is ~n^1.0-1.25 in every regime, so the "
        "char-gram re-score is linear-class even where the raw join is "
        "not. Always an equi join on a derived key, never all-pairs; "
        "the worse char-gram census (flat ~15% of all-pairs, round 8) "
        "never materializes. At 100 TB the candidate tau is the "
        "measured recall-margin vs candidate-density dial; the "
        "re-score stays exact either way. r15: stage 1 runs as the "
        "exact inverted-index COUNT form (survivors provably and "
        "measurably identical to the prefix+intersect form; 2x at the "
        "graded scale because the fixture's bounded vocabulary makes "
        "the tau-0.2 prefix NON-selective — 72% of pairs share a "
        "prefix shingle). The form choice is REGIME-DEPENDENT and "
        "pure cost, never correctness: on Zipf/Heaps corpora the "
        "prefix form's raw relation is 40-70x sparser (SCALE.md "
        "round-15 table, both forms measured) and remains the 100 TB "
        "recipe there via the unchanged _containment_pairs machinery; "
        "measure Heaps beta + prefix selectivity before choosing "
        "(the r12 dial, extended)"
    ),
)
def q_dedup_containment_2stage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed containment pairs |A∩B|_char5 >= 0.8·|A|_char5, found by
    word-2-gram shingle candidates at tau 0.2 and exact char-5-gram
    re-score on candidates only — the scale recipe as one plan."""
    d = table_parallel(spark, sf_dir, "documents")
    # stage 1: word-shingle candidate pairs at the low candidate tau
    # (_twostage_candidate_pairs — shared with the Zipf census probe;
    # r15: the exact inverted-index COUNT form, see its docstring).
    # It already hash-repartitions the survivor stream to core count,
    # so stage 2's compute-bound char-gram attach runs full-core.
    cand = _twostage_candidate_pairs(d)
    # stage 2: exact char-gram containment on candidate ids only.
    # Hashed gram arrays (the _ranked_token_arrays trade: long
    # intersects ~5x faster than string intersects, 64-bit collisions
    # absent at corpus scale). Narrow scan-derived per-doc array table,
    # consumed twice (a-side and b-side) -> cache as-is (CLAUDE.md
    # cache rule: scan-derived, no shuffle layout to pin).
    grams_expr = F.expr(
        f"transform(sequence(1, length(text) - {CONTAIN_GRAM - 1}),"
        f" i -> substring(text, i, {CONTAIN_GRAM}))"
    )
    cg = (
        d.filter(F.length("text") >= CONTAIN_GRAM)
        .select("doc_id", F.array_distinct(grams_expr).alias("g"))
        .select("doc_id", F.expr("transform(g, x -> xxhash64(x))").alias("cg"))
        .cache()
    )
    ca = cg.select(F.col("doc_id").alias("id_a"), F.col("cg").alias("cg_a"))
    cb = cg.select(F.col("doc_id").alias("id_b"), F.col("cg").alias("cg_b"))
    isz = F.size(F.array_intersect(F.col("cg_a"), F.col("cg_b")))
    return (
        cand.join(ca, "id_a")
        .join(cb, "id_b")
        .filter(isz * CONTAIN_DEN >= CONTAIN_NUM * F.size("cg_a"))
        .select(
            "id_a",
            "id_b",
            # BIGINT cast before the 1e6 multiply (the q_dedup_containment
            # overflow rule; canary in test_fixture_assumptions.py)
            F.expr(
                "(CAST(size(array_intersect(cg_a, cg_b)) AS BIGINT)"
                " * 1000000) div size(cg_a)"
            ).cast("bigint").alias("cont_ppm"),
        )
    )
