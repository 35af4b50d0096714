"""Funnel + fixpoint scale receipt at 100k-1M documents (r6 verdict ask):
the un-receipted risk was ``duplicate_groups(until_converged=True)`` when
the edge set stops being pairs/triples. This sweep plants LONG text-level
near-duplicate chains — components of diameter 11 in the jaccard>=0.8
graph — at 2% density, runs the LSH -> verify -> until-converged pipeline,
and records rounds-to-fixpoint, wall-clock growth, and an EXACT identity
witness: the fixpoint labels must equal a driver-side union-find over the
very same verified pair set (independent algorithm, same edges — LSH
recall misses cannot excuse a labeling mismatch).

Chain construction (all deterministic, no RNG): each block of
``BLOCK=1700`` ids contributes its first ``CHAIN_LEN=34`` ids as chain
members (34/1700 = 2%). Member m's text is a 60-token window starting at
offset 2m over the block's private token sequence (tokens globally unique
per (block, position) — zero cross-chain shingle overlap). With 3-token
shingles, members k apart share (58-2k) of (58+2k) shingles:
j(1)=0.933, j(2)=0.871, j(3)=0.8125 >= 0.8 > j(4)=0.758 — so the >=0.8
graph has chords up to distance 3 and the 34-member path has diameter
ceil(33/3) = 11. Min-label propagation must walk 11 rounds + 1 no-change
round; the fixed-3-round form provably mislabels every chain.

The remaining 98% are token-soup documents (9973-word alphabetic vocab,
30-80 tokens, arithmetic-hash token choice) — no planted similarity, so
LSH candidate counts stay bounded and the funnel's quality gates pass.

Also times the FULL ``prepare_and_ship`` lifecycle (7-stage funnel +
r=2 leakage re-pair + until-converged grouping + leakage-safe split +
sharded write) at each size.

Usage: python tools/funnel_scale_sweep.py [sizes...]   (default 100000
500000 1000000; the 1M row takes minutes). Prints a markdown table for
BASELINE.md plus one JSON line per size.

``--compare``: additionally run the SAME verified pair set through the
fixpoint WITHOUT pointer-jumping (``shortcut=False``, the pre-r7 plain
min-propagation) and report both modes' rounds + wall-clock side by side
— the O(log d)-vs-O(d) receipt. Both labelings are checked against the
union-find witness.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CHAIN_LEN = 34   # diameter ceil(33/3) = 11 in the >=0.8 jaccard graph
BLOCK = 1700     # 34/1700 = 2% chain density
W = 60           # tokens per chain member
STRIDE = 2       # window offset between consecutive members
VOCAB_N = 9973   # prime; soup token space


def _b26(i: int) -> str:
    s = ""
    i = int(i)
    while True:
        s = chr(ord("a") + i % 26) + s
        i //= 26
        if i == 0:
            return s


def synth(spark, n: int, path: str) -> None:
    """Distributed deterministic corpus: 2% chain docs, 98% soup."""
    vocab = np.array(["w" + _b26(i) for i in range(VOCAB_N)])

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy(dtype=np.int64)
            texts = []
            for i in ids:
                m = i % BLOCK
                if m < CHAIN_LEN:
                    b = i // BLOCK
                    toks = [
                        f"q{_b26(b)}x{_b26(p)}"
                        for p in range(STRIDE * m, STRIDE * m + W)
                    ]
                else:
                    ln = 30 + (i * 2654435761) % 51
                    # two-prime mix: a token sequence repeats only when
                    # BOTH id residues match (lcm(9973, 8191) >> 1M), so
                    # no accidental near-dup soup pairs — a linear-in-id
                    # scheme has period 9973 and plants prefix-duplicates
                    j = np.arange(ln)
                    idx = ((i % VOCAB_N) * (j + 7) + (i % 8191) * (j * j + 3) + j) % VOCAB_N
                    toks = list(vocab[idx])
                texts.append(" ".join(toks))
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "text": texts,
                    "source": [f"src{i % 20}" for i in ids],
                }
            )

    spark.range(n).repartition(64).mapInPandas(
        gen, "doc_id long, text string, source string"
    ).write.mode("overwrite").parquet(path)


def union_find(edges) -> dict[int, int]:
    """Driver-side exact connected components (min label per component) —
    the independent witness for the distributed fixpoint."""
    parent: dict[int, int] = {}

    def find(x):
        r = x
        while parent[r] != r:
            r = parent[r]
        while parent[x] != r:
            parent[x], x = r, parent[x]
        return r

    for a, b in edges:
        for v in (a, b):
            if v not in parent:
                parent[v] = v
        ra, rb = find(a), find(b)
        if ra != rb:
            if rb < ra:
                ra, rb = rb, ra
            parent[rb] = ra
    return {v: find(v) for v in parent}


def main() -> int:
    from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.operators.dedup import (
        duplicate_groups,
        lsh_candidate_pairs,
        ngram_jaccard_pairs,
    )
    from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.plans.ship import (
        prepare_and_ship,
    )
    from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.session import (
        get_spark,
    )

    argv = [a for a in sys.argv[1:] if a != "--compare"]
    compare = "--compare" in sys.argv[1:]
    sizes = [int(a) for a in argv] or [100_000, 500_000, 1_000_000]
    spark = get_spark("funnel-scale-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    work = "/tmp/funnel_scale_sweep"

    print(
        "| docs | chains | verified pairs | fixpoint rounds | fixpoint (s) | "
        "groups | labels==union-find | prepare_and_ship (s) |"
    )
    print("|---|---|---|---|---|---|---|---|")
    for n in sizes:
        synth(spark, n, f"{work}/docs")
        docs = spark.read.parquet(f"{work}/docs")
        # blocks contributing a full 34-member chain
        n_chains = n // BLOCK + (1 if n % BLOCK >= CHAIN_LEN else 0)

        # --- A: the until-converged fixpoint on the funnel's own pair set
        t0 = time.monotonic()
        pairs = ngram_jaccard_pairs(
            docs.select("doc_id", "text"),
            lsh_candidate_pairs(docs.select("doc_id", "text")),
        ).filter("jaccard >= 0.8")
        report: dict = {}
        groups = duplicate_groups(pairs, until_converged=True, report=report)
        grows = groups.collect()
        t_fix = round(time.monotonic() - t0, 1)

        # identity witness: exact union-find over the SAME edges
        edges = [(r.doc_a, r.doc_b) for r in pairs.select("doc_a", "doc_b").collect()]
        want = union_find(edges)
        got = {r.doc_id: r.group_id for r in grows}
        labels_ok = got == want
        n_groups = len({g for g in got.values()})

        plain_report: dict = {}
        fast_report: dict = {}
        t_plain = t_fast = None
        if compare:
            # both modes over the SAME pre-materialized edge frame, so the
            # timing isolates the fixpoint loop (the full-pipeline t_fix
            # above already includes LSH + verification).
            pe = pairs.select("doc_a", "doc_b").localCheckpoint()
            pe.count()
            for rep, sc in ((plain_report, False), (fast_report, True)):
                t0 = time.monotonic()
                labs = {
                    r.doc_id: r.group_id
                    for r in duplicate_groups(
                        pe,
                        until_converged=True,
                        max_iterations=200,
                        shortcut=sc,
                        report=rep,
                    ).collect()
                }
                dt = round(time.monotonic() - t0, 1)
                if sc:
                    t_fast = dt
                else:
                    t_plain = dt
                labels_ok = labels_ok and labs == want

        # --- B: the full lifecycle at the same size
        shutil.rmtree(f"{work}/out", ignore_errors=True)
        t0 = time.monotonic()
        prepare_and_ship(docs, f"{work}/out")
        t_ship = round(time.monotonic() - t0, 1)

        print(
            f"| {n} | {n_chains} | {len(edges)} | {report.get('rounds')} | "
            f"{t_fix} | {n_groups} | {labels_ok} | {t_ship} |"
        )
        print(
            json.dumps(
                {
                    "docs": n,
                    "chains": n_chains,
                    "verified_pairs": len(edges),
                    "fixpoint_rounds": report.get("rounds"),
                    "converged": report.get("converged"),
                    "shortcut": report.get("shortcut"),
                    "fixpoint_sec": t_fix,
                    "plain_rounds": plain_report.get("rounds"),
                    "plain_fixpoint_sec": t_plain,
                    "shortcut_rounds": fast_report.get("rounds"),
                    "shortcut_fixpoint_sec": t_fast,
                    "n_groups": n_groups,
                    "labels_match_union_find": labels_ok,
                    "prepare_and_ship_sec": t_ship,
                }
            ),
            flush=True,
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
