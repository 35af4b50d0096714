"""Sketch-at-scale measurement: HyperLogLog vs exact COUNT(DISTINCT), and
the temperature-mix rate derivation, at token counts where the exact
distinct shuffle is the thing being avoided.

Corpus: deterministic token stream (no RNG, batch-invariant) —
``n_rows`` docs x ``tokens_per_doc`` tokens, token ids drawn from a
per-source Zipf-ish congruential walk so sources have different distinct
cardinalities. The question at 100 TB is never "can Spark count
distinct" — it is what the count COSTS: exact COUNT(DISTINCT token)
shuffles every distinct (source, token) pair; the HLL shuffle carries at
most sources x 2^p register rows per map partition, and per-shard
sketches merge by groupBy-max without touching the data again.

Usage: python tools/sketch_scale_bench.py [--rows 2000000] [--toks 24]
Prints one JSON document; writes nothing into the repo.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.operators.sketch import (  # noqa: E402
    hll_build,
    hll_estimate,
    hll_merge,
)
from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.session import (  # noqa: E402
    get_spark,
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=2_000_000)
    ap.add_argument("--toks", type=int, default=24)
    args = ap.parse_args()

    spark = get_spark("sketch-scale")
    spark.sparkContext.setLogLevel("ERROR")

    # deterministic stream: source s gets vocab ~ 10^(5+s mod 3) via a
    # multiplicative walk; all column expressions, no RNG, no Python rows
    base = spark.range(args.rows).select(
        F.col("id"),
        F.concat(F.lit("src"), (F.col("id") % 4).cast("string")).alias("source"),
    )
    vocab = (
        F.when(F.col("source") == "src0", F.lit(100_000))
        .when(F.col("source") == "src1", F.lit(1_000_000))
        .when(F.col("source") == "src2", F.lit(3_000_000))
        .otherwise(F.lit(300_000))
    )
    toks = base.select(
        "source",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.lit(args.toks)),
                lambda j: F.concat(
                    F.lit("t"),
                    (((F.col("id") * 2654435761 + j * 40503) % vocab)).cast(
                        "string"
                    ),
                ),
            )
        ).alias("t"),
    )
    toks = toks.persist()
    n_tok = toks.count()

    t0 = time.monotonic()
    exact = {
        r.source: r.n
        for r in toks.groupBy("source")
        .agg(F.count_distinct("t").alias("n"))
        .collect()
    }
    exact_sec = round(time.monotonic() - t0, 2)

    t0 = time.monotonic()
    est = {
        r.source: (r.n_touched, r.est_distinct)
        for r in hll_estimate(
            hll_build(toks, "t", group_cols=("source",)), group_cols=("source",)
        ).collect()
    }
    hll_sec = round(time.monotonic() - t0, 2)

    # shard-merge property at scale: two half-corpus sketches, merged,
    # must equal the full build register-for-register
    t0 = time.monotonic()
    a = hll_build(toks.filter(F.crc32(F.col("t")) % 2 == 0), "t", ("source",))
    b = hll_build(toks.filter(F.crc32(F.col("t")) % 2 == 1), "t", ("source",))
    merged = {
        (r.source, r.bucket, r.reg) for r in hll_merge(a, b, ("source",)).collect()
    }
    merge_sec = round(time.monotonic() - t0, 2)
    full = {
        (r.source, r.bucket, r.reg)
        for r in hll_build(toks, "t", ("source",)).collect()
    }
    merge_equals_rebuild = merged == full

    report = {
        "n_token_rows": n_tok,
        "exact_count_distinct_sec": exact_sec,
        "hll_build_estimate_sec": hll_sec,
        "shard_merge_sec": merge_sec,
        "merge_equals_rebuild": merge_equals_rebuild,
        "per_source": {
            s: {
                "exact": exact[s],
                "hll_est": est[s][1],
                "rel_err": round(abs(est[s][1] - exact[s]) / exact[s], 4),
            }
            for s in sorted(exact)
        },
    }
    toks.unpersist()
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
