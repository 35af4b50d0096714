"""Scaling sweep for the round-4-session operators: BM25 (inline vs
prebuilt-postings), SemDeDup semantic dedup, and the corpus-prep funnel on
synthesized corpora of 1k-50k documents.

Documents are seeded token-soup (1000-word vocab + 10 stopwords, 30-80
tokens) with 2% planted near-duplicate copies so the dedup stages have
real work. Prints a markdown table for BASELINE.md.

Usage: python tools/retrieval_sweep.py [max_size]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# realistic lexical diversity: 1000-word vocab (the sf fixtures' 40-word
# soup makes MinHash bands collide near-all-pairs at 20k+ docs — a
# degenerate corpus, not a representative one; the funnel's max_bucket cap
# is the guard for THAT case and is exercised separately below)
VOCAB = [f"w{i:04d}" for i in range(1000)] + [
    "the", "a", "of", "and", "to", "in", "is", "it", "that", "for",
]
SEED = 20260814
SIZES = [1_000, 5_000, 20_000, 50_000]
N_PROBES = 100


def synth_docs(spark, n):
    rng = np.random.default_rng(SEED)
    lens = rng.integers(30, 81, size=n)
    rows = []
    for i in range(n):
        toks = rng.choice(VOCAB, size=lens[i])
        rows.append((i, " ".join(toks), f"src{i % 20}"))
    # 2% near-dup copies: drop the last token
    for j in range(0, n, 50):
        rows.append((n + j, rows[j][1].rsplit(" ", 1)[0], rows[j][2]))
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    df = df.repartition(32).cache()
    df.count()
    return df


def timed(fn):
    best = float("inf")
    for _ in range(2):
        t0 = time.monotonic()
        fn()
        best = min(best, time.monotonic() - t0)
    return round(best, 2)


def main() -> int:
    from pyspark.sql import functions as F

    from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark import (
        operators as ops,
    )
    from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.functions.embed import (
        embed_hash,
    )
    from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.functions.text import (
        tokens,
    )
    from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.plans.corpus_prep import (
        corpus_prep,
    )
    from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.session import (
        get_spark,
    )

    max_size = int(sys.argv[1]) if len(sys.argv) > 1 else SIZES[-1]
    spark = get_spark("retrieval-sweep")
    spark.sparkContext.setLogLevel("ERROR")

    print("| docs | bm25 inline (s) | bm25 prebuilt (s) | semantic dedup (s) "
          "| sem pairs | corpus-prep funnel (s) |")
    print("|---|---|---|---|---|---|")
    for n in [s for s in SIZES if s <= max_size]:
        docs = synth_docs(spark, n)
        probes = docs.filter(F.col("doc_id") < N_PROBES).select(
            F.col("doc_id").alias("query_id"),
            F.array_distinct(F.slice(tokens(F.col("text")), 1, 8)).alias("terms"),
        )
        t_inline = timed(lambda: ops.bm25_topk(docs, probes, k=10).count())

        idx = {k: v.cache() for k, v in ops.bm25_index(docs).items()}
        for v in idx.values():
            v.count()
        t_prebuilt = timed(
            lambda: ops.bm25_topk(None, probes, k=10, index=idx).count()
        )

        emb = embed_hash(docs, dim=64).select(
            F.col("doc_id").alias("vec_id"), "embedding"
        ).cache()
        emb.count()
        n_cells = max(16, n // 2000)
        pairs = []
        t_sem = timed(
            lambda: pairs.append(
                ops.semantic_duplicates(
                    emb, threshold=0.95, n_centroids=n_cells
                ).count()
            )
        )

        t_prep = timed(
            lambda: corpus_prep(
                docs, eval_docs=docs.limit(50), max_bucket=64
            )["accounting"].count()
        )
        print(f"| {docs.count()} | {t_inline} | {t_prebuilt} | {t_sem} "
              f"| {pairs[-1]} | {t_prep} |")
        for v in idx.values():
            v.unpersist()
        emb.unpersist()
        docs.unpersist()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
