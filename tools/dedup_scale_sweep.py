"""Measure the near-dup pipeline at corpus sizes beyond the fixtures —
evidence that candidate generation stays BOUNDED (the 100 TB survival
property), not just fast at 5k rows.

Synthesizes a seeded corpus (vocab-1000 token soup, ~120 tokens/doc, 5%
planted near-dup pairs with one token substituted) at sizes [5k, 20k, 50k]
and times: exact dedup, MinHash signatures -> LSH candidate pairs ->
Jaccard verify, and duplicate-group resolution. Prints a markdown table
(BASELINE.md source) with the candidate-pair count per size — if LSH ever
degenerates toward all-pairs, the pair column exposes it immediately.

Usage: python tools/dedup_scale_sweep.py [sizes...]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SEED = 20260813
VOCAB = 1000
DOC_TOKENS = 120
NEAR_DUP_FRAC = 0.05


def synth_docs(spark, n: int):
    rng = np.random.default_rng(SEED)
    vocab = [f"w{i:04d}" for i in range(VOCAB)]
    rows = []
    for i in range(n):
        toks = rng.integers(0, VOCAB, size=DOC_TOKENS)
        rows.append((i, " ".join(vocab[t] for t in toks)))
    # planted near-dups: copy of doc i with ONE token substituted
    n_dup = int(n * NEAR_DUP_FRAC)
    for j in range(n_dup):
        base = rows[j][1].split()
        base[7] = "zsub"
        rows.append((n + j, " ".join(base)))
    return spark.createDataFrame(rows, "doc_id long, text string").repartition(32)


def main() -> int:
    from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark import (
        operators as ops,
    )
    from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.session import (
        get_spark,
    )

    sizes = [int(a) for a in sys.argv[1:]] or [5000, 20000, 50000]
    spark = get_spark("dedup-scale-sweep")
    print("| corpus | exact dedup (s) | lsh pairs (s) | candidate pairs | "
          "verified pairs | dup_groups (s) | groups |")
    print("|---|---|---|---|---|---|---|")
    for n in sizes:
        docs = synth_docs(spark, n).cache()
        docs.count()

        t0 = time.monotonic()
        n_exact = ops.exact_duplicates(docs).count()  # noqa: F841 (timing)
        t_exact = time.monotonic() - t0

        t0 = time.monotonic()
        cand = ops.lsh_candidate_pairs(docs, n_hashes=16, bands=4)
        verified = ops.ngram_jaccard_pairs(docs, cand).filter("jaccard >= 0.5")
        verified = ops.persist_bounded(verified)
        n_ver = verified.count()
        n_cand = cand.count()
        t_lsh = time.monotonic() - t0

        t0 = time.monotonic()
        n_groups = (
            ops.duplicate_groups(verified, until_converged=True)
            .filter("is_keeper").count()
        )
        t_groups = time.monotonic() - t0

        print(f"| {n}+{int(n*NEAR_DUP_FRAC)} dups | {t_exact:.2f} | {t_lsh:.2f} | "
              f"{n_cand} | {n_ver} | {t_groups:.2f} | {n_groups} |")
        docs.unpersist()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
