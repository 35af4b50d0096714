"""Deduplication operators for large-scale training-data pipelines
(beyond-reference extension; BASELINE.json north star).

Five families, all shaped for 100 TB:

- exact:     sha256 groupBy — one shuffle on a 32-byte key.
- MinHash:   shingle -> n permuted hashes -> signature, computed entirely as
             array expressions (NO explode, NO shuffle until the band join).
- LSH:       band the signatures, self-join on (band, key) — candidate
             generation cost is bound by bucket sizes, not N^2.
- SimHash:   64-bit weighted-projection fingerprint + Hamming distance.
- embedding: cosine-threshold pairs over dense vectors.

Every hash is ``stable_hash64`` (SHA-256-derived) so each operator replays
exactly in the DuckDB oracle. The MinHash permutation family is
``h_i(x) = (a_i * (x mod P) + b_i) mod P`` with 30-bit P so products stay
under 2^62 — BIGINT-safe in both engines (Spark wraps, DuckDB throws; we
overflow in neither).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.ids import stable_hash64
from ..functions.text import tokens, word_shingles

MINHASH_P = 1_000_000_007
SIMHASH_BITS = 60  # stable_hash64 yields 60 bits


def minhash_params(n_hashes: int) -> list[tuple[int, int]]:
    """Deterministic (a_i, b_i) permutation constants, shared with the SQL
    oracle rendering."""
    return [
        ((2 * i + 1) * 12582917 % MINHASH_P, (i + 1) * 4256249 % MINHASH_P)
        for i in range(n_hashes)
    ]


def exact_duplicates(docs: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Exact dedup via content hash (SURVEY SS7 M6): groups with >1 member,
    smallest id elected keeper. One shuffle on the 64-hex digest."""
    hashed = docs.select(
        F.col(id_col).alias("doc_id"), F.sha2(F.col(text_col), 256).alias("content_hash")
    )
    return (
        hashed.groupBy("content_hash")
        .agg(
            F.count("*").alias("n_dups"),
            F.min("doc_id").alias("keeper_id"),
            F.array_sort(F.collect_list("doc_id")).alias("doc_ids"),
        )
        .filter(F.col("n_dups") > 1)
    )


def minhash_signatures(docs: DataFrame, n_hashes: int = 16, shingle_n: int = 3,
                       text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """MinHash signature per document as ONE map-side expression.

    No explode: the signature is ``transform(seeds, i -> array_min(
    transform(shingles, s -> perm_i(hash(s)))))`` — each doc's shingle set is
    scanned n_hashes times inside codegen, zero shuffles. Docs with fewer
    than ``shingle_n`` tokens get a NULL signature (nothing to hash).

    Output: ``doc_id, sig ARRAY<BIGINT>[n_hashes]``.
    """
    sh = word_shingles(tokens(F.col(text_col)), shingle_n)
    params = minhash_params(n_hashes)

    def perm(a: int, b: int):
        return lambda s: (stable_hash64(s) % MINHASH_P * a + b) % MINHASH_P

    sig = F.array(*[F.array_min(F.transform(sh, perm(a, b))) for a, b in params])
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.when(F.size(sh) > 0, sig).alias("sig"),
    )


def lsh_candidate_pairs(docs: DataFrame, n_hashes: int = 16, bands: int = 4,
                        shingle_n: int = 3, text_col: str = "text",
                        id_col: str = "doc_id") -> DataFrame:
    """MinHash-LSH near-dup candidates: band the signature, hash-join docs
    sharing a (band_idx, band_key) bucket (SURVEY SS7 M6; the classic
    shingle->minhash->band->bucket-join pipeline).

    The self-join is an equi-join on the bucket key — at scale its cost is
    sum over buckets of |bucket|^2, controlled by bands x rows tuning, and
    AQE's skew-join splitting handles hot buckets.

    Output: ``doc_a, doc_b`` (a < b, distinct).
    """
    rows_per_band = n_hashes // bands
    sigs = minhash_signatures(docs, n_hashes, shingle_n, text_col, id_col).filter(
        F.col("sig").isNotNull()
    )
    banded = sigs.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bi).alias("band_idx"),
                        F.array_join(
                            F.transform(
                                F.slice(F.col("sig"), bi * rows_per_band + 1, rows_per_band),
                                lambda v: v.cast("string"),
                            ),
                            "_",
                        ).alias("band_key"),
                    )
                    for bi in range(bands)
                ]
            )
        ).alias("band"),
    ).select("doc_id", "band.band_idx", "band.band_key")
    left = banded.select(
        F.col("doc_id").alias("doc_a"), "band_idx", "band_key"
    )
    right = banded.select(
        F.col("doc_id").alias("doc_b"), "band_idx", "band_key"
    )
    return (
        left.join(right, ["band_idx", "band_key"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


def ngram_jaccard_pairs(docs: DataFrame, pairs: DataFrame, shingle_n: int = 3,
                        text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Verify candidate pairs with exact n-gram Jaccard similarity.

    Only candidates are verified (the LSH output, a tiny fraction of N^2);
    each side is a broadcast-able shingle-set lookup.

    Output: ``doc_a, doc_b, jaccard``.
    """
    shingled = docs.select(
        F.col(id_col).alias("doc_id"),
        F.array_distinct(word_shingles(tokens(F.col(text_col)), shingle_n)).alias("sh"),
    )
    a = shingled.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"))
    b = shingled.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    return (
        pairs.join(a, "doc_a")
        .join(b, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.when(union > 0, inter.cast("double") / union).otherwise(0.0), 6
            ).alias("jaccard"),
        )
    )


def simhash(docs: DataFrame, text_col: str = "text",
            id_col: str = "doc_id") -> DataFrame:
    """60-bit SimHash fingerprint: for each bit position, sum +/-1 over the
    token multiset's hash bits; bit set iff the sum is positive. Map-side
    expression only — the per-doc cost is 60 passes over the token array
    inside codegen, no shuffle.

    Output: ``doc_id, simhash BIGINT``.
    """
    toks = tokens(F.col(text_col))

    def bit_sum(b: int):
        def step(acc, t):
            return acc + (F.shiftright(stable_hash64(t), b) % 2) * 2 - 1

        return F.aggregate(toks, F.lit(0).cast("bigint"), step)
    fingerprint = None
    for b in range(SIMHASH_BITS):
        term = F.when(bit_sum(b) > 0, F.shiftleft(F.lit(1).cast("bigint"), b)).otherwise(
            F.lit(0).cast("bigint")
        )
        fingerprint = term if fingerprint is None else fingerprint + term
    return docs.select(F.col(id_col).alias("doc_id"), fingerprint.alias("simhash"))


def simhash_near_pairs(docs: DataFrame, max_hamming: int = 8,
                       text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """SimHash near-dup pairs by Hamming distance. Exact all-pairs form for
    oracle checking; at scale the standard trick is to split the fingerprint
    into (max_hamming+1) chunks and hash-join on any-equal-chunk (pigeonhole)
    before verifying — same verify expression, candidate join instead of the
    cross join."""
    s = simhash(docs, text_col, id_col)
    a = s.select(F.col("doc_id").alias("doc_a"), F.col("simhash").alias("sh_a"))
    b = s.select(F.col("doc_id").alias("doc_b"), F.col("simhash").alias("sh_b"))
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (
        a.crossJoin(b)
        .filter(F.col("doc_a") < F.col("doc_b"))
        .withColumn("hamming", hamming)
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )


def embedding_near_duplicates(embeddings: DataFrame, threshold: float = 0.95,
                              id_col: str = "vec_id",
                              vec_col: str = "embedding") -> DataFrame:
    """Embedding-cosine near-dup pairs (id_a < id_b, cosine >= threshold).

    Exact quadratic form — correct and oracle-checkable. The scale path is
    ``ivf_knn`` (operators.knn): assign cells once, compare only within
    cells, which is how a 100 TB run would bound the pair space.

    Output: ``doc_a, doc_b, cosine``.
    """
    from ..functions.vector import cosine_similarity

    a = embeddings.select(F.col(id_col).alias("doc_a"), F.col(vec_col).alias("va"))
    b = embeddings.select(F.col(id_col).alias("doc_b"), F.col(vec_col).alias("vb"))
    return (
        a.crossJoin(b)
        .filter(F.col("doc_a") < F.col("doc_b"))
        .withColumn("cosine", F.round(cosine_similarity(F.col("va"), F.col("vb")), 6))
        .filter(F.col("cosine") >= threshold)
        .select("doc_a", "doc_b", "cosine")
    )
