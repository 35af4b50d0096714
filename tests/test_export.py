"""Training-data export tests: deterministic shuffle/shard assignment,
per-shard manifest accounting, token-budget sequence packing, and the
on-disk shard writer (operators/export.py — beyond-reference extension)."""

import math
import os

import pytest
from pyspark.sql import functions as F

from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.operators.export import (
    export_shards,
    pack_sequences,
    shard_assignment,
    shard_stats,
)

N_SHARDS = 8


def test_shard_assignment_deterministic_and_complete(documents):
    a = {r.doc_id: (r.shard, r.sort_key) for r in
         shard_assignment(documents, N_SHARDS).collect()}
    b = {r.doc_id: (r.shard, r.sort_key) for r in
         shard_assignment(documents, N_SHARDS).collect()}
    assert a == b                                   # reproducible
    assert len(a) == documents.count()              # every doc exactly once
    assert {s for s, _ in a.values()} <= set(range(N_SHARDS))
    # the hash spreads: no shard holds more than 3x its fair share
    from collections import Counter

    sizes = Counter(s for s, _ in a.values())
    assert max(sizes.values()) <= 3 * math.ceil(len(a) / N_SHARDS)
    # shard and order salts are independent: order within a shard is not
    # monotone in doc_id (a correlated hash would sort ids)
    shard0 = sorted(
        ((sk, d) for d, (s, sk) in a.items() if s == 0)
    )
    ids_in_order = [d for _, d in shard0]
    assert ids_in_order != sorted(ids_in_order)


def test_shard_stats_match_bruteforce(spark, documents):
    got = {r.shard: (r.n_docs, r.n_tokens, r.n_bytes)
           for r in shard_stats(documents, N_SHARDS).collect()}
    rows = documents.select("doc_id", "text").collect()
    assign = {r.doc_id: r.shard for r in
              shard_assignment(documents, N_SHARDS).collect()}
    want = {}
    for r in rows:
        s = assign[r.doc_id]
        toks = [t for t in r.text.lower().split() if t]
        d, t, by = want.get(s, (0, 0, 0))
        want[s] = (d + 1, t + len(toks), by + len(r.text.encode("utf-8")))
    assert got == want


def test_pack_sequences_contract(spark, documents):
    budget = 200
    out = pack_sequences(documents, budget=budget, n_shards=N_SHARDS).collect()
    assert len(out) == documents.count()
    per_doc_max = max(r.n_tokens for r in out)
    from collections import defaultdict

    seqs = defaultdict(int)
    for r in out:
        seqs[(r.shard, r.seq_id)] += r.n_tokens
    # every sequence except possibly a shard's last is >= budget-start
    # aligned: totals never exceed budget + the largest single document
    for total in seqs.values():
        assert total <= budget + per_doc_max
    # seq ids are contiguous from 0 within each shard
    by_shard = defaultdict(set)
    for s, q in seqs:
        by_shard[s].add(q)
    for s, qs in by_shard.items():
        assert qs == set(range(len(qs))), s
    # boundary law: seq_id == floor(start_offset / budget) in shuffle order
    assign = {
        r.doc_id: (r.shard, r.sort_key)
        for r in shard_assignment(documents, N_SHARDS).collect()
    }
    got = {r.doc_id: (r.shard, r.seq_id, r.n_tokens) for r in out}
    by_shard_docs = defaultdict(list)
    for d, (s, sk) in assign.items():
        by_shard_docs[s].append((sk, d))
    for s, docs_ in by_shard_docs.items():
        cum = 0
        for _, d in sorted(docs_):
            _, seq_id, n_tok = got[d]
            assert seq_id == cum // budget, d
            cum += n_tok


def test_export_shards_roundtrip(spark, documents, tmp_path):
    out = str(tmp_path / "shards")
    export_shards(documents, out, N_SHARDS, extra_cols=("lang",))
    # partition layout on disk, one dir per non-empty shard
    dirs = {d for d in os.listdir(out) if d.startswith("shard=")}
    assert dirs and dirs <= {f"shard={i}" for i in range(N_SHARDS)}
    back = spark.read.parquet(out)
    assert set(back.columns) == {"doc_id", "text", "lang", "shard"}
    # content-complete: every doc exactly once with its text intact
    want = {(r.doc_id, r.text, r.lang) for r in
            documents.select("doc_id", "text", "lang").collect()}
    got = {(r.doc_id, r.text, r.lang) for r in back.collect()}
    assert got == want
    # shard column on disk matches the assignment operator
    assign = {r.doc_id: r.shard for r in
              shard_assignment(documents, N_SHARDS).collect()}
    for r in back.select("doc_id", "shard").collect():
        assert int(r.shard) == assign[r.doc_id]
    # deterministic rewrite: a second export produces identical per-shard
    # row orders (the resumability contract)
    order1 = {
        d: [r.doc_id for r in
            spark.read.parquet(f"{out}/{d}").collect()]
        for d in dirs
    }
    export_shards(documents, out, N_SHARDS, extra_cols=("lang",))
    for d in dirs:
        again = [r.doc_id for r in spark.read.parquet(f"{out}/{d}").collect()]
        assert again == order1[d], d


def test_export_validates_args(documents):
    with pytest.raises(ValueError, match="n_shards"):
        shard_assignment(documents, 0)
    with pytest.raises(ValueError, match="budget"):
        pack_sequences(documents, budget=0, n_shards=4)


def test_pack_sequences_budget_cut(spark):
    """Three 6-token docs at budget 10: start offsets are 0/6/12 in any
    hash order, so the third doc always opens sequence 1 — the cut happens
    exactly at the running-sum boundary, never by doc count."""
    rows = [(i, "w " * 6) for i in (1, 2, 3)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r.seq_id for r in
           pack_sequences(df, budget=10, n_shards=1).collect()}
    assert len(out) == 3
    assert sorted(out.values()) == [0, 0, 1]
