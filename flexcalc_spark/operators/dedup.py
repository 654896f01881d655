"""Deduplication operators (north-star §2.3 + training-data pipeline):
exact, token-Jaccard, character-n-gram Jaccard, MinHash-LSH, SimHash,
embedding-cosine — each a ``queries()`` entry over ``documents``.

Scale design (SURVEY §4.3.2): the exact-pair operators bound their
candidate space with an equi key (lang/source) so the theta condition
evaluates inside hash-join partitions; the hash-sketch operators
(MinHash/SimHash) generate candidates by equi-joining on band keys —
O(n·bands) shuffle instead of O(n²) comparison — then re-score exactly.
At fixture scale the exact operators are oracle-checked; the sketch
operators are rows-only (their hash functions have no DuckDB twin) and
their recall is asserted against the exact pair set in
tests/test_dedup_recall.py.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from flexcalc_spark.registry import register
from flexcalc_spark.tables import table, table_parallel

JACCARD_TAU = 0.95
NGRAM_TAU = 0.98
COSINE_TAU = 0.4

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


def _neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(id_a, id_b, jac): exact token-Jaccard pairs >= tau within lang.

    Shared by q_dedup_neardup (emits the pairs) and q_dedup_clusters
    (uses them as edges)."""
    t = _tok_sets(spark, sf_dir)
    a = t.alias("a")
    b = t.alias("b")
    jac = _jaccard(F.col("a.toks"), F.col("b.toks"))
    # Size-ratio prune inside the join (jac >= tau forces min(|A|,|B|)
    # >= tau*max): skips the array_intersect for mismatched pairs;
    # provably output-identical, so the oracle stays the plain join.
    size_ok = F.least(
        F.size("a.toks"), F.size("b.toks")
    ) >= JACCARD_TAU * F.greatest(F.size("a.toks"), F.size("b.toks"))
    return (
        a.join(
            b,
            (F.col("a.lang") == F.col("b.lang"))
            & (F.col("a.doc_id") < F.col("b.doc_id"))
            & size_ok,
        )
        .filter(jac >= JACCARD_TAU)
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            F.round(jac, 4).alias("jac"),
        )
    )


@register(
    "q_dedup_neardup",
    oracle=f"""
        WITH t AS (
            SELECT doc_id, lang, list_distinct(string_split(lower(text), ' ')) AS toks
            FROM documents
        )
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               ROUND(CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
                     / len(list_distinct(a.toks || b.toks)), 4) AS jac
        FROM t a JOIN t b
          ON a.lang = b.lang AND a.doc_id < b.doc_id
        WHERE CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
              / len(list_distinct(a.toks || b.toks)) >= {JACCARD_TAU}
    """,
    family="dedup",
    scale_notes="exact token-set Jaccard; lang equi key bounds pairs per partition. The 100 TB path is q_dedup_minhash (band join), this is its re-scorer",
)
def q_dedup_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate pairs by token-set Jaccard >= 0.95 within language."""
    return _neardup_pairs(spark, sf_dir)


@register(
    "q_dedup_ngram",
    oracle=f"""
        WITH g AS (
            SELECT doc_id, source,
                   list_distinct(list_transform(range(1, LENGTH(text) - 1),
                                 i -> substring(text, CAST(i AS INT), 3))) AS grams
            FROM documents
        )
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               ROUND(CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
                     / len(list_distinct(a.grams || b.grams)), 4) AS jac3
        FROM g a JOIN g b
          ON a.source = b.source AND a.doc_id < b.doc_id
        WHERE CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
              / len(list_distinct(a.grams || b.grams)) >= {NGRAM_TAU}
    """,
    family="dedup",
    scale_notes="char-3-gram shingles built by a sequence/transform HOF (no explode); source equi key bounds the pair space",
)
def q_dedup_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate pairs by character-3-gram Jaccard within source."""
    d = table_parallel(spark, sf_dir, "documents")
    # Guard texts shorter than 3 chars: sequence(1, 0) would DESCEND
    # ([1, 0]) and fabricate grams the oracle's empty range() never sees.
    grams_expr = F.when(
        F.length("text") >= 3,
        F.expr("transform(sequence(1, length(text) - 2), i -> substring(text, i, 3))"),
    ).otherwise(F.expr("array()"))
    g = d.select(
        "doc_id",
        "source",
        F.array_distinct(grams_expr).alias("grams"),
    )
    a = g.alias("a")
    b = g.alias("b")
    jac = _jaccard(F.col("a.grams"), F.col("b.grams"))
    # Same size-ratio prune as _neardup_pairs, at the ngram tau.
    size_ok = F.least(
        F.size("a.grams"), F.size("b.grams")
    ) >= NGRAM_TAU * F.greatest(F.size("a.grams"), F.size("b.grams"))
    return (
        a.join(
            b,
            (F.col("a.source") == F.col("b.source"))
            & (F.col("a.doc_id") < F.col("b.doc_id"))
            & size_ok,
        )
        .filter(jac >= NGRAM_TAU)
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            F.round(jac, 4).alias("jac3"),
        )
    )


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
    # recall vs the exact pair set is asserted in tests/test_dedup_recall.py
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
    # recall loss by construction).
    size_ok = F.least(F.col("a.sz"), F.col("b.sz")) >= JACCARD_TAU * F.greatest(
        F.col("a.sz"), F.col("b.sz")
    )
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
    """(doc_id, simhash BIGINT): 64-bit SimHash over token xxhash64s."""
    t = _tok_sets(spark, sf_dir)
    ex = t.select("doc_id", F.explode("toks").alias("tok")).select(
        "doc_id", F.xxhash64(F.col("tok")).alias("h")
    )
    # bit i of the signature = sign of sum over tokens of ±1 per bit
    bit_sums = [
        F.sum(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) * 2 - 1).alias(f"s_{i}")
        for i in range(SIMHASH_BITS)
    ]
    sums = ex.groupBy("doc_id").agg(*bit_sums)
    sig = reduce(
        lambda acc, i: acc.bitwiseOR(
            F.when(F.col(f"s_{i}") > 0, F.shiftleft(F.lit(1).cast("bigint"), i)).otherwise(0)
        ),
        range(SIMHASH_BITS),
        F.lit(0).cast("bigint"),
    )
    return sums.select("doc_id", sig.alias("simhash"))


@register(
    "q_dedup_simhash",
    oracle=None,  # hash-seeded sketch, rows-only (see q_dedup_minhash)
    family="dedup",
    scale_notes="SimHash 64-bit + 16-bit-chunk banding (pigeonhole: hamming<=6 pairs share a chunk... candidates via 4 equi joins); bit_count(xor) re-score",
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
    )
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
    scale_notes="embedding near-dup: exact at fixture scale; at 100 TB candidates come from q_knn_lsh's hyperplane buckets, this is the re-scorer",
)
def q_dedup_embed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (cos >= 0.4)."""
    e = table_parallel(spark, sf_dir, "embeddings")
    a = e.alias("a")
    b = e.alias("b")
    dot = _dot_spark("a.embedding", "b.embedding")
    na = F.sqrt(_dot_spark("a.embedding", "a.embedding"))
    nb = F.sqrt(_dot_spark("b.embedding", "b.embedding"))
    cos = dot / (na * nb)
    return (
        a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
        .filter(cos >= COSINE_TAU)
        .select(
            F.col("a.vec_id").alias("id_a"),
            F.col("b.vec_id").alias("id_b"),
            F.round(cos, 4).alias("cos"),
        )
    )


CC_MAX_ITERS = 50


@register(
    "q_dedup_clusters",
    oracle=f"""
        WITH RECURSIVE t AS (
            SELECT doc_id, lang, list_distinct(string_split(lower(text), ' ')) AS toks
            FROM documents
        ),
        edges AS (
            SELECT a.doc_id AS src, b.doc_id AS dst
            FROM t a JOIN t b ON a.lang = b.lang AND a.doc_id < b.doc_id
            WHERE CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
                  / len(list_distinct(a.toks || b.toks)) >= {JACCARD_TAU}
        ),
        und AS (SELECT src, dst FROM edges UNION SELECT dst AS src, src AS dst FROM edges),
        reach AS (
            SELECT src AS id, src AS r FROM und
            UNION
            SELECT reach.id, und.dst AS r
            FROM reach JOIN und ON und.src = reach.r
        )
        SELECT id AS doc_id, MIN(r) AS cluster_id FROM reach GROUP BY id
    """,
    family="dedup",
    scale_notes="dedup clusters = connected components by iterative min-label propagation: per round one equi join on the edge key + a min-agg, O(diameter) rounds (near-dup clusters have tiny diameters), localCheckpoint truncates the growing lineage. The 100 TB upgrade is large-star/small-star alternation (same join primitive, O(log n) rounds); the oracle walks the same edges with a recursive CTE",
)
def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected-component cluster ids over the near-dup pair graph.

    The operator a training pipeline actually dedups with: pairs say
    "a~b"; clusters say "keep min(doc_id) of each component, drop the
    rest". Pure DataFrame ops in a driver-coordinated loop (the Spark
    idiom for iterative graph algorithms — GraphX Pregel does the same
    under the hood); the label sum is monotonically non-increasing and
    integer, so it is an exact convergence detector."""
    edges = _neardup_pairs(spark, sf_dir).select("id_a", "id_b")
    und = edges.select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst")
    ).union(
        edges.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst"))
    ).localCheckpoint()
    labels = (
        und.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("label", F.col("id"))
        .localCheckpoint()
    )
    cur_sum = labels.agg(F.sum("label")).collect()[0][0]
    for _ in range(CC_MAX_ITERS):
        prop = (
            und.join(labels, und["dst"] == labels["id"])
            .groupBy("src")
            .agg(F.min("label").alias("nl"))
        )
        labels_new = (
            labels.join(prop, labels["id"] == prop["src"], "left")
            .select(
                labels["id"],
                F.least(
                    F.col("label"), F.coalesce(F.col("nl"), F.col("label"))
                ).alias("label"),
            )
            .localCheckpoint()
        )
        new_sum = labels_new.agg(F.sum("label")).collect()[0][0]
        labels = labels_new
        if new_sum == cur_sum:
            break
        cur_sum = new_sum
    return labels.select(
        F.col("id").alias("doc_id"), F.col("label").alias("cluster_id")
    )
