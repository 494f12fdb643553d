"""Deduplication operators over the ``documents`` corpus.

Beyond the reference surface (SURVEY §7 M7): the operations a
large-scale training-data pipeline needs. Five dedup families, each a
registered query with a DuckDB oracle:

- ``dedup_exact``        — hash-groupBy on md5(text): one shuffle of
                           (hash, id), never the payload.
- ``dedup_ngram_jaccard``— exact token-trigram Jaccard via a shingle
                           posting-list join (never an all-pairs cross
                           join: pairs are generated only for docs that
                           *share* a shingle, so cost scales with
                           Σ df(shingle)², not N²).
- ``dedup_minhash_lsh``  — MinHash signatures (64 perms) → 16 bands ×
                           4 rows LSH bucketing → candidate pairs →
                           exact-Jaccard verification. The scale path:
                           candidate generation touches only
                           signature-collision pairs.
- ``dedup_simhash``      — 64-bit SimHash, 4 bands × 16 bits. By
                           pigeonhole, any pair within Hamming
                           distance 3 shares ≥1 full band, so banding
                           is *lossless* here: output is exactly all
                           pairs with distance ≤ 3.
- ``dedup_embedding``    — cosine near-dup over ``embeddings`` via
                           random-hyperplane sign-LSH (64 planes, 16
                           bands × 4 bits) + exact-cosine verification.

Determinism / oracle parity: all hashes and projections come from
``functions.portable`` — plain integer/double arithmetic that
evaluates bit-identically in Spark and DuckDB, so the oracle can
replicate the *entire* pipeline (signatures, banding, verification)
and hash-match exactly. For the LSH operators the operator's contract
is explicitly "banded candidates ∩ exact-verified" (standard verified-
LSH semantics); ``dedup_ngram_jaccard`` is the exhaustive ground truth
to diff against.

Scale notes (100 TB corpus):
- Signature/sketch computation is a pure projection — no shuffle, no
  Python, whole-stage codegen over array expressions.
- The only shuffles are groupBy/join on (band_key) and (pair) — both
  narrow keys; payloads (text, shingle arrays) are joined back only
  for the tiny candidate set.
- Skewed band buckets (near-identical cluster floods) are handled by
  AQE skew-join; a production run would also cap bucket size (any
  bucket ≫ expected size is a degenerate flood — dedup it exactly).

Reference parity: the reference has no dedup operators; the nearest
shapes are the within-line token dedup (a1/PairsPMI.java:68-86) and
the inverted-index posting construction (a3/BuildInvertedIndexCompressed.java:66-132),
whose explode→groupBy skeleton ``dedup_ngram_jaccard`` reuses.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions import tokenize, tokenize_sql
from ..functions.portable import (
    HASH_P,
    affine_perms,
    dot_fold,
    dot_fold_sql,
    float_list_sql,
    hyperplanes,
    let_col,
    poly_hash,
    round6,
    round6_sql,
    poly_hash_sql,
)

SHINGLE_N = 3  # token trigrams
JACCARD_T = 0.7  # near-dup threshold (planted dups sit at ≈0.97; the
# corpus has no pairs between ~0.1 and 0.9, so 0.7 keeps every true
# dup while giving the prefix filter a short prefix: |A|−⌈0.7|A|⌉+1)
MINHASH_K = 64
MINHASH_BANDS = 16
MINHASH_ROWS = 4  # 16 × 4 = 64
SIMHASH_BITS = 64
SIMHASH_BANDS = 4  # 4 bands × 16 bits; lossless for HAMMING_MAX < 4
HAMMING_MAX = 3
EMB_DIM = 64
EMB_PLANES = 64
EMB_BANDS = 16
EMB_ROWS = 4
COSINE_T = 0.4

_PERMS = affine_perms(MINHASH_K, seed=1)
_SIM_PERMS = affine_perms(SIMHASH_BITS, seed=2)
_PLANES = hyperplanes(EMB_PLANES, EMB_DIM, seed=7)

_TOKS_SQL = tokenize_sql("text")


# ---------------------------------------------------------------- shingles

def _shingles(text: Column) -> Column:
    """Distinct token SHINGLE_N-grams (space-joined) of a document.

    Tokenization is let-bound: referencing the tokenize() expression
    directly inside the transform lambda would re-run the regex split
    once per position (~|toks|× per doc).
    """
    return let_col(
        tokenize(text),
        lambda toks: F.array_distinct(
            F.transform(
                F.sequence(
                    F.lit(1),
                    F.greatest(F.size(toks) - (SHINGLE_N - 1), F.lit(1)),
                ),
                lambda i: F.concat_ws(" ", F.slice(toks, i, SHINGLE_N)),
            )
        ),
    )


def _shingles_sql(toks_expr: str) -> str:
    # DuckDB range() is end-exclusive; list slice t[i:j] is inclusive.
    return (
        f"list_distinct(list_transform("
        f"range(1, greatest(len({toks_expr}) - {SHINGLE_N - 2}, 2)), "
        f"i -> array_to_string({toks_expr}[i:i + {SHINGLE_N - 1}], ' ')))"
    )


_SH_CTE = f"""
    WITH sh AS (
        SELECT doc_id, {_shingles_sql(_TOKS_SQL)} AS sh
        FROM documents
    )
"""


def _docs_with_shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", _shingles(F.col("text")).alias("sh"))


def _verified_pairs(cand: DataFrame, sh: DataFrame) -> DataFrame:
    """Join shingle sets onto candidate (doc_a, doc_b) pairs and keep
    those with exact Jaccard ≥ JACCARD_T."""
    a = sh.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    return (
        cand.join(a, "doc_a")
        .join(b, "doc_b")
        .withColumn(
            "jaccard",
            round6(inter.cast("double") / union.cast("double")),
        )
        .where(F.col("jaccard") >= JACCARD_T)
        .select("doc_a", "doc_b", "jaccard")
        .orderBy("doc_a", "doc_b")
    )


_VERIFY_SQL = f"""
    SELECT c.doc_a, c.doc_b,
           (floor((len(list_intersect(a.sh, b.sh))::DOUBLE
                 / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)))::DOUBLE)
                 * 1000000 + 0.5) / 1000000) AS jaccard
    FROM cand c
    JOIN sh a ON a.doc_id = c.doc_a
    JOIN sh b ON b.doc_id = c.doc_b
    WHERE (floor((len(list_intersect(a.sh, b.sh))::DOUBLE
                / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)))::DOUBLE)
                * 1000000 + 0.5) / 1000000) >= {JACCARD_T}
    ORDER BY doc_a, doc_b
"""


# ---------------------------------------------------------------- exact

def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: group by md5(text), keep the smallest doc_id.

    Scale: only (md5, doc_id) is shuffled — 48 bytes/row regardless of
    document size; the partial hash aggregate combines map-side.
    """
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.md5("text").alias("text_md5"), "doc_id")
        .groupBy("text_md5")
        .agg(
            F.count("*").alias("n_copies"),
            F.min("doc_id").alias("keep_doc_id"),
        )
        .orderBy("text_md5")
    )


# ---------------------------------------------------------------- jaccard

def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exhaustive token-trigram Jaccard near-dup pairs (≥ JACCARD_T).

    AllPairs/PPJoin-style prefix filtering (Bayardo et al., WWW'07;
    Xiao et al., WWW'08), exact for Jaccard ≥ t: order every doc's
    shingles canonically by (global document frequency asc, shingle),
    keep only the first |A| − ⌈t·|A|⌉ + 1 as its *prefix*. Two sets
    with Jaccard ≥ t MUST share a prefix shingle (if they disagreed on
    all prefix elements, the overlap couldn't reach t), so the pair
    join runs over prefixes only — the rare shingles — and the full
    arrays are joined back just for the candidate set. Pair-generation
    cost drops from Σ df(shingle)² to Σ df(prefix shingle)², which is
    what survives a 100× corpus: frequent shingles (the quadratic
    killers) sit at the END of the canonical order and never enter a
    short prefix.
    """
    sh = _docs_with_shingles(spark, sf_dir)
    ex = sh.select("doc_id", F.explode("sh").alias("s"))
    dfreq = ex.groupBy("s").agg(F.count("*").alias("df"))
    prefix = (
        ex.join(dfreq, "s")
        .groupBy("doc_id")
        .agg(
            F.slice(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("df", "s"))),
                    lambda x: x["s"],
                ),
                1,
                F.size(F.collect_list("s"))
                - F.ceil(F.lit(JACCARD_T) * F.size(F.collect_list("s"))).cast("int")
                + 1,
            ).alias("pref")
        )
        .select("doc_id", F.explode("pref").alias("s"))
    )
    cand = (
        prefix.alias("x")
        .join(prefix.alias("y"), "s")
        .where(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(
            F.col("x.doc_id").alias("doc_a"),
            F.col("y.doc_id").alias("doc_b"),
        )
        .distinct()
    )
    return _verified_pairs(cand, sh)


# ---------------------------------------------------------------- minhash

def _minhash_sig(hs: Column) -> Column:
    """64-slot MinHash signature from a *materialized* base-hash array
    column (one poly-hash per shingle — computed once per row by the
    upstream projection, NOT re-inlined into each of the 64 slots).

    Pure projection: 64 affine permutations folded to their minimum —
    no explode, no shuffle. The permutation constants ride along as
    two literal array columns (2 Literal nodes total) instead of 64
    unrolled expressions — keeps the codegen'd method small.
    """
    a_lit = F.lit([a for a, _ in _PERMS])
    b_lit = F.lit([b for _, b in _PERMS])
    return F.zip_with(
        a_lit,
        b_lit,
        lambda a, b: F.array_min(
            F.transform(hs, lambda h: (a.cast("long") * h + b) % HASH_P)
        ),
    )


def _band_keys(sig: Column, bands: int, rows: int) -> Column:
    """Band keys 'j-v1-v2-…' — the key format is internal (keys only
    ever meet keys from the same engine), only the band *partition* of
    the signature must match the oracle's."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(bands - 1)),
        lambda j: F.concat(
            j.cast("string"),
            F.lit("-"),
            F.concat_ws(
                "-",
                F.transform(
                    F.slice(sig, j * rows + 1, rows), lambda x: x.cast("string")
                ),
            ),
        ),
    )


def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash + LSH near-dup: signature → band buckets → candidate
    pairs → exact-Jaccard verification (≥ JACCARD_T).

    Contract: output = pairs that (a) collide in ≥1 of 16 bands and
    (b) verify at exact Jaccard ≥ 0.5. At the planted-dup similarity
    (≈0.97) the per-pair miss probability is (1 − 0.97⁴)¹⁶ ≈ 1e-15.
    """
    sh = _docs_with_shingles(spark, sf_dir)
    # let-bind hashes → signature → band keys so each stage is
    # evaluated exactly once per row (see let_col: CollapseProject
    # would otherwise re-inline them multiplicatively).
    bk = let_col(
        F.transform(F.col("sh"), poly_hash),
        lambda hs: let_col(
            _minhash_sig(hs),
            lambda sig: _band_keys(sig, MINHASH_BANDS, MINHASH_ROWS),
        ),
    )
    # Materialize the (small) banded table once: the self-join would
    # otherwise recompute the full signature pipeline for each side.
    banded = sh.select("doc_id", F.explode(bk).alias("bk")).localCheckpoint(
        eager=True
    )
    cand = (
        banded.alias("x")
        .join(banded.alias("y"), "bk")
        .where(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(
            F.col("x.doc_id").alias("doc_a"),
            F.col("y.doc_id").alias("doc_b"),
        )
        .distinct()
    )
    return _verified_pairs(cand, sh)


def _minhash_sig_sql() -> str:
    h = poly_hash_sql("s")
    mins = ", ".join(
        f"list_min(list_transform(hs, h -> ({a}::BIGINT * h + {b}::BIGINT) % {HASH_P}))"
        for a, b in _PERMS
    )
    return (
        f"hs AS (SELECT doc_id, list_transform(sh, s -> {h}) AS hs FROM sh),\n"
        f"    sig AS (SELECT doc_id, [{mins}] AS sig FROM hs)"
    )


def _band_keys_sql(bands: int, rows: int) -> str:
    keys = ", ".join(
        "'" + str(j) + "-' || "
        + " || '-' || ".join(f"sig[{j * rows + r + 1}]" for r in range(rows))
        for j in range(bands)
    )
    return f"[{keys}]"


# ---------------------------------------------------------------- simhash

def _simhash_bits(ht: Column) -> Column:
    """64 sign bits from a materialized token-hash array column:
    bit_i = sign of Σ_tokens (±1 by parity of the i-th affine
    permutation of the token hash). Token multiplicity counts
    (frequency-weighted SimHash)."""
    a_lit = F.lit([a for a, _ in _SIM_PERMS])
    b_lit = F.lit([b for _, b in _SIM_PERMS])
    return F.zip_with(
        a_lit,
        b_lit,
        lambda a, b: F.when(
            F.aggregate(
                ht,
                F.lit(0).cast("long"),
                lambda acc, h: acc
                + F.when(((a.cast("long") * h + b) % HASH_P) % 2 == 1, 1).otherwise(-1),
            )
            > 0,
            1,
        ).otherwise(0),
    )


def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup: all pairs within Hamming distance HAMMING_MAX.

    Banding (4 × 16 bits) is *exact* here, not approximate: a pair
    differing in ≤3 bits cannot differ in all 4 bands, so every
    qualifying pair is generated as a candidate. Output is therefore
    identical to brute-force all-pairs Hamming — which is what the
    oracle computes, making this a true differential test.
    """
    docs = load_table(spark, sf_dir, "documents")
    # Materialized once: consumed by both join sides AND both verify
    # columns — recomputing the 64-bit sketch 4× would dominate.
    bits = docs.select(
        "doc_id",
        let_col(
            F.transform(tokenize("text"), poly_hash), _simhash_bits
        ).alias("bits"),
    ).localCheckpoint(eager=True)
    rows = SIMHASH_BITS // SIMHASH_BANDS
    banded = bits.select(
        "doc_id",
        "bits",
        F.explode(
            F.array(
                *[
                    F.concat_ws(
                        "-",
                        F.lit(str(j)),
                        F.concat_ws(
                            "",
                            F.transform(
                                F.slice("bits", j * rows + 1, rows),
                                lambda x: x.cast("string"),
                            ),
                        ),
                    )
                    for j in range(SIMHASH_BANDS)
                ]
            )
        ).alias("bk"),
    )
    hamming = F.aggregate(
        F.zip_with(
            F.col("bits_a"), F.col("bits_b"), lambda x, y: F.when(x != y, 1).otherwise(0)
        ),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    return (
        banded.alias("x")
        .join(banded.alias("y"), "bk")
        .where(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(
            F.col("x.doc_id").alias("doc_a"),
            F.col("y.doc_id").alias("doc_b"),
            F.col("x.bits").alias("bits_a"),
            F.col("y.bits").alias("bits_b"),
        )
        .distinct()
        .withColumn("hamming", hamming)
        .where(F.col("hamming") <= HAMMING_MAX)
        .select("doc_a", "doc_b", "hamming")
        .orderBy("doc_a", "doc_b")
    )


def _simhash_bits_sql() -> str:
    h = poly_hash_sql("t")
    bit_exprs = ", ".join(
        f"CASE WHEN list_reduce([0::BIGINT] || list_transform(ht, "
        f"h -> CASE WHEN (({a}::BIGINT * h + {b}::BIGINT) % {HASH_P}) % 2 = 1 "
        f"THEN 1::BIGINT ELSE -1::BIGINT END), (acc, x) -> acc + x) > 0 "
        f"THEN 1 ELSE 0 END"
        for a, b in _SIM_PERMS
    )
    return (
        f"ht AS (SELECT doc_id, list_transform({_TOKS_SQL}, t -> {h}) AS ht "
        f"FROM documents),\n"
        f"    bits AS (SELECT doc_id, [{bit_exprs}] AS bits FROM ht)"
    )


# ------------------------------------------------------------- embeddings

def _emb_bits(vec: Column) -> Column:
    """Sign bits of deterministic hyperplane projections (double-
    precision left-fold dot products — bit-identical to the oracle).
    The 64×64 plane matrix is ONE nested-array literal; bits come from
    a transform over it, not 64 unrolled dot products."""
    return F.transform(
        F.lit(_PLANES),
        lambda p: F.when(
            F.aggregate(
                F.zip_with(vec, p, lambda x, y: x * y),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
            > 0,
            1,
        ).otherwise(0),
    )


def dedup_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup over ``embeddings``: hyperplane
    sign-LSH (64 planes, 16 bands × 4 bits) for candidates, exact
    cosine ≥ COSINE_T verification.

    Contract mirrors dedup_minhash_lsh: banded ∩ verified; the oracle
    replicates both stages with identical arithmetic.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    # Cast float→double once; every downstream fold reuses the column.
    vec = emb.select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
    )
    norm = F.sqrt(dot_fold(F.col("embedding"), F.col("embedding")))
    base = vec.select("vec_id", "embedding", norm.alias("nrm"))
    bk = let_col(
        _emb_bits(F.col("embedding")),
        lambda bits: _band_keys(bits, EMB_BANDS, EMB_ROWS),
    )
    banded = vec.select("vec_id", F.explode(bk).alias("bk")).localCheckpoint(
        eager=True
    )
    cand = (
        banded.alias("x")
        .join(banded.alias("y"), "bk")
        .where(F.col("x.vec_id") < F.col("y.vec_id"))
        .select(
            F.col("x.vec_id").alias("vec_a"),
            F.col("y.vec_id").alias("vec_b"),
        )
        .distinct()
    )
    a = base.select(
        F.col("vec_id").alias("vec_a"),
        F.col("embedding").alias("emb_a"),
        F.col("nrm").alias("nrm_a"),
    )
    b = base.select(
        F.col("vec_id").alias("vec_b"),
        F.col("embedding").alias("emb_b"),
        F.col("nrm").alias("nrm_b"),
    )
    cosine = dot_fold(F.col("emb_a"), F.col("emb_b")) / (
        F.col("nrm_a") * F.col("nrm_b")
    )
    return (
        cand.join(a, "vec_a")
        .join(b, "vec_b")
        .withColumn("cosine", round6(cosine))
        .where(F.col("cosine") >= COSINE_T)
        .select("vec_a", "vec_b", "cosine")
        .orderBy("vec_a", "vec_b")
    )


def _emb_bits_sql(vec_expr: str) -> str:
    bit_exprs = ", ".join(
        f"CASE WHEN {dot_fold_sql(vec_expr, float_list_sql(plane), EMB_DIM)} > 0 "
        f"THEN 1 ELSE 0 END"
        for plane in _PLANES
    )
    return f"[{bit_exprs}]"


def _emb_band_keys_sql(bands: int, rows: int) -> str:
    keys = ", ".join(
        "'" + str(j) + "-' || "
        + " || '-' || ".join(f"bits[{j * rows + r + 1}]" for r in range(rows))
        for j in range(bands)
    )
    return f"[{keys}]"


ORACLE_SQL: dict[str, str] = {
    "dedup_exact": """
        SELECT md5(text) AS text_md5, count(*) AS n_copies,
               min(doc_id) AS keep_doc_id
        FROM documents GROUP BY md5(text) ORDER BY text_md5
    """,
    # Independent brute-force implementation (vs Spark's posting join).
    "dedup_ngram_jaccard": _SH_CTE + f"""
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               (floor((len(list_intersect(a.sh, b.sh))::DOUBLE
                     / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)))::DOUBLE)
                     * 1000000 + 0.5) / 1000000) AS jaccard
        FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        WHERE (floor((len(list_intersect(a.sh, b.sh))::DOUBLE
                    / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)))::DOUBLE)
                    * 1000000 + 0.5) / 1000000) >= {JACCARD_T}
        ORDER BY doc_a, doc_b
    """,
    "dedup_minhash_lsh": _SH_CTE.rstrip() + f""",
    {_minhash_sig_sql()},
    banded AS (
        SELECT doc_id, unnest({_band_keys_sql(MINHASH_BANDS, MINHASH_ROWS)}) AS bk
        FROM sig
    ),
    cand AS (
        SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
        FROM banded x JOIN banded y USING (bk)
        WHERE x.doc_id < y.doc_id
    )
    {_VERIFY_SQL}
    """,
    # Brute-force all-pairs Hamming (banding is lossless on the Spark
    # side, so results must agree exactly).
    "dedup_simhash": f"""
        WITH {_simhash_bits_sql()}
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               list_reduce([0] || list_transform(range(1, {SIMHASH_BITS + 1}),
                   i -> CASE WHEN a.bits[i] <> b.bits[i] THEN 1 ELSE 0 END),
                   (acc, x) -> acc + x) AS hamming
        FROM bits a JOIN bits b ON a.doc_id < b.doc_id
        WHERE list_reduce([0] || list_transform(range(1, {SIMHASH_BITS + 1}),
                  i -> CASE WHEN a.bits[i] <> b.bits[i] THEN 1 ELSE 0 END),
                  (acc, x) -> acc + x) <= {HAMMING_MAX}
        ORDER BY doc_a, doc_b
    """,
    "dedup_embedding": f"""
        WITH base AS (
            SELECT vec_id, embedding,
                   sqrt({dot_fold_sql('embedding', 'embedding', EMB_DIM)}) AS nrm,
                   {_emb_bits_sql('embedding')} AS bits
            FROM embeddings
        ),
        banded AS (
            SELECT vec_id, unnest({_emb_band_keys_sql(EMB_BANDS, EMB_ROWS)}) AS bk
            FROM base
        ),
        cand AS (
            SELECT DISTINCT x.vec_id AS vec_a, y.vec_id AS vec_b
            FROM banded x JOIN banded y USING (bk)
            WHERE x.vec_id < y.vec_id
        )
        SELECT c.vec_a, c.vec_b,
               (floor(({dot_fold_sql('a.embedding', 'b.embedding', EMB_DIM)}
                     / (a.nrm * b.nrm)) * 1000000 + 0.5) / 1000000) AS cosine
        FROM cand c
        JOIN base a ON a.vec_id = c.vec_a
        JOIN base b ON b.vec_id = c.vec_b
        WHERE (floor(({dot_fold_sql('a.embedding', 'b.embedding', EMB_DIM)}
                    / (a.nrm * b.nrm)) * 1000000 + 0.5) / 1000000) >= {COSINE_T}
        ORDER BY vec_a, vec_b
    """,
}

QUERIES = {
    "dedup_exact": dedup_exact,
    "dedup_ngram_jaccard": dedup_ngram_jaccard,
    "dedup_minhash_lsh": dedup_minhash_lsh,
    "dedup_simhash": dedup_simhash,
    "dedup_embedding": dedup_embedding,
}
