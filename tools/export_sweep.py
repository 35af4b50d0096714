"""Measure the training-export operators at corpus sizes beyond the
fixtures — evidence the export's ONE-shuffle shape holds as documents
grow (the 100 TB survival property), not just that it works at 500 rows.

Synthesizes a seeded corpus (vocab-1000 token soup, ~120 tokens/doc) at
sizes [10k, 50k, 200k] and times, per size:

- ``shard_stats``: the per-shard manifest (partial agg -> one exchange)
- ``pack_sequences``: running-sum window per shard (one exchange + local
  sort) — the count column proves every doc lands in exactly one sequence
- ``export_shards``: the full shuffle-sort-write to parquet (n_shards
  scaled with the corpus so a shard stays ~constant-sized, the way a real
  deploy scales: shards are the unit a data-loader worker reads)

Prints a markdown table (BASELINE.md source).

Usage: python tools/export_sweep.py [sizes...]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SEED = 20260814
VOCAB = 1000
DOC_TOKENS = 120
PACK_BUDGET = 2048
DOCS_PER_SHARD = 2500  # shards scale with the corpus


def _corpus(spark, n: int):
    rng = np.random.default_rng(SEED)
    toks = rng.integers(0, VOCAB, size=(n, DOC_TOKENS))
    rows = [(int(i), " ".join(f"w{t}" for t in toks[i])) for i in range(n)]
    return spark.createDataFrame(rows, "doc_id long, text string").repartition(32)


def main() -> None:
    sizes = [int(s) for s in sys.argv[1:]] or [10_000, 50_000, 200_000]
    from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark import (
        operators as ops,
    )
    from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.session import (
        get_spark,
    )

    spark = get_spark("export-sweep")
    spark.sparkContext.setLogLevel("ERROR")

    print("| docs | shards | shard_stats s | pack_sequences s (rows) | export_shards s |")
    print("|---|---|---|---|---|")
    for n in sizes:
        docs = _corpus(spark, n).persist()
        docs.count()
        n_shards = max(8, n // DOCS_PER_SHARD)

        t0 = time.monotonic()
        ops.shard_stats(docs, n_shards=n_shards).count()
        t_stats = time.monotonic() - t0

        t0 = time.monotonic()
        n_packed = ops.pack_sequences(
            docs, budget=PACK_BUDGET, n_shards=n_shards
        ).count()
        t_pack = time.monotonic() - t0

        out = tempfile.mkdtemp(prefix="export_sweep_")
        t0 = time.monotonic()
        ops.export_shards(docs, out, n_shards=n_shards)
        t_export = time.monotonic() - t0
        shutil.rmtree(out, ignore_errors=True)

        print(
            f"| {n} | {n_shards} | {t_stats:.2f} | {t_pack:.2f} ({n_packed}) "
            f"| {t_export:.2f} |"
        )
        docs.unpersist()


if __name__ == "__main__":
    main()
