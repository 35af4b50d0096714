"""Semantic-decontamination scale receipt: ``semantic_contamination``
(cross-table SemDeDup) at a 2M-vector corpus vs a 10k-vector eval set.

The question: does the cell-bounded corpus x eval join stay tractable and
exact where the quadratic form (2M x 10k = 2e10 cosines) is off the
table? With 64 balanced cells the pair space is sum(|corpus_cell| x
|eval_cell|) = 2M x 10k / 64 ~ 3.1e8 — a 64x cut that the broadcast-eval
join evaluates in whole-stage codegen.

Planted ground truth (deterministic, same generator as ann_scale_bench):
half the eval set are EXACT copies of corpus vectors (every one must be
flagged at any threshold — cosine 1.0, and a copy lands in its source's
cell because assignment is the same deterministic argmax), half are
fresh vectors from phase-shifted clusters (may or may not cross the
threshold; counted, not asserted). Misses on planted copies = 0 is the
exactness witness within the cell bound.

Usage: python tools/semantic_contam_scale.py [--n 2000000] [--n-eval 10000]
Writes nothing into the repo; tables land under /tmp/sem_contam.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.operators.dedup import (  # noqa: E402
    semantic_contamination,
)
from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.session import (  # noqa: E402
    get_spark,
)

DIM = 64
N_CLUSTERS = 64
NOISE = 0.15
EVAL_BASE = 1_000_000_000  # eval ids live far above corpus ids


def synthesize_corpus(spark, n: int, path: str) -> None:
    d = np.arange(DIM, dtype=np.float64)

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy(dtype=np.int64)
            centers = np.sin(((ids % N_CLUSTERS) * 31.0)[:, None] + d[None, :] * 17.0)
            noise = NOISE * np.sin(ids[:, None] * 131.7 + d[None, :] * 79.19)
            vecs = (centers + noise).astype(np.float32)
            yield pd.DataFrame({"vec_id": ids, "embedding": [v for v in vecs]})

    (
        spark.range(n)
        .repartition(32)
        .mapInPandas(gen, schema="vec_id long, embedding array<float>")
        .write.mode("overwrite")
        .parquet(path)
    )


def synthesize_eval(n_corpus: int, n_eval: int) -> pd.DataFrame:
    """First half: exact copies of corpus vectors (stride-sampled).
    Second half: fresh vectors from phase-shifted cluster centers."""
    d = np.arange(DIM, dtype=np.float64)
    half = n_eval // 2
    src = (np.arange(half, dtype=np.int64) * 199) % n_corpus
    centers = np.sin(((src % N_CLUSTERS) * 31.0)[:, None] + d[None, :] * 17.0)
    noise = NOISE * np.sin(src[:, None] * 131.7 + d[None, :] * 79.19)
    copies = (centers + noise).astype(np.float32)

    j = np.arange(half, dtype=np.int64)
    fresh = (
        np.sin(((j % N_CLUSTERS) * 31.0 + 0.5)[:, None] + d[None, :] * 17.0)
        + NOISE * np.sin(j[:, None] * 57.3 + d[None, :] * 41.1)
    ).astype(np.float32)

    ids = np.concatenate([EVAL_BASE + src, EVAL_BASE + 500_000_000 + j])
    vecs = np.concatenate([copies, fresh])
    return pd.DataFrame({"vec_id": ids, "embedding": [v for v in vecs]}), set(
        (EVAL_BASE + src).tolist()
    ), set(src.tolist())


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=2_000_000)
    ap.add_argument("--n-eval", type=int, default=10_000)
    ap.add_argument("--threshold", type=float, default=0.999)
    args = ap.parse_args()

    spark = get_spark("sem_contam_scale")
    spark.sparkContext.setLogLevel("ERROR")
    base = "/tmp/sem_contam"
    shutil.rmtree(base, ignore_errors=True)
    corpus_path = f"{base}/corpus"

    t0 = time.monotonic()
    synthesize_corpus(spark, args.n, corpus_path)
    print(f"corpus synthesized in {time.monotonic() - t0:.1f}s")

    eval_pdf, copy_eval_ids, copy_src_ids = synthesize_eval(args.n, args.n_eval)
    corpus = spark.read.parquet(corpus_path)
    ev = spark.createDataFrame(eval_pdf)

    t0 = time.monotonic()
    out = semantic_contamination(
        corpus, ev, threshold=args.threshold, n_centroids=N_CLUSTERS
    ).persist()
    n_pairs = out.count()
    wall = round(time.monotonic() - t0, 1)

    # verification aggregates stay Spark-side (at 2M the flagged-pair set
    # is itself large); planted recall = the (src, EVAL_BASE+src) pairs
    # present
    n_planted = len(copy_src_ids)
    planted = spark.createDataFrame(
        [(int(s), int(EVAL_BASE + s)) for s in copy_src_ids],
        "doc_id long, eval_id long",
    )
    planted_found = out.join(planted, ["doc_id", "eval_id"], "left_semi").count()
    agg = out.agg(
        F.count_distinct("doc_id").alias("docs"),
        F.count_if(F.col("eval_id") >= EVAL_BASE + 500_000_000).alias("fresh"),
    ).first()
    out.unpersist()
    result = {
        "corpus": args.n,
        "eval": args.n_eval,
        "threshold": args.threshold,
        "wall_s": wall,
        "pairs_flagged": n_pairs,
        "corpus_docs_flagged": agg["docs"],
        "planted_copies": n_planted,
        "planted_found": planted_found,
        "planted_recall": round(planted_found / n_planted, 4),
        "fresh_eval_pair_flags": agg["fresh"],
    }
    print(json.dumps(result))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
