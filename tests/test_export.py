"""Training-data export tests: deterministic shuffle/shard assignment,
per-shard manifest accounting, token-budget sequence packing, and the
on-disk shard writer (operators/export.py — beyond-reference extension)."""

import math
import os

import pytest
from pyspark.sql import functions as F

from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.operators.export import (
    export_shards,
    leakage_safe_split,
    pack_sequences,
    shard_assignment,
    shard_stats,
    split_assignment,
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
    # each shard's sequences start at 0; ids may gap when a single doc
    # spans multiple budget windows (the boundary law below is the real
    # invariant — contiguity is not one, review finding)
    by_shard = defaultdict(set)
    for s, q in seqs:
        by_shard[s].add(q)
    for s, qs in by_shard.items():
        assert min(qs) == 0, s
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


def test_write_sharded_tolerates_preexisting_shard_cols(spark, documents,
                                                       tmp_path):
    """An input already carrying `shard` (e.g. derived from
    shard_assignment output) must not produce duplicate column names
    (r5 advice finding) — the kernel re-derives it from id_col. A
    caller's UNRELATED `sort_key` column, by contrast, is data and must
    pass through to the written shards untouched (r6 review finding: the
    internal ordering key is __-prefixed, so no collision)."""
    from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.operators.export import (
        write_sharded,
    )

    pre = documents.select("doc_id", "text").join(
        shard_assignment(documents, 2).select("doc_id", "shard"), "doc_id"
    ).withColumn("sort_key", documents.doc_id * 7)
    out = str(tmp_path / "shards")
    write_sharded(pre, out, N_SHARDS)  # would raise on ambiguity before
    back = spark.read.parquet(out)
    assert back.count() == documents.count()
    # the written shard is the n_shards=N_SHARDS derivation, not the
    # stale 2-shard column the input carried
    assign = {r.doc_id: r.shard for r in
              shard_assignment(documents, N_SHARDS).collect()}
    for r in back.select("doc_id", "shard").collect():
        assert int(r.shard) == assign[r.doc_id]
    # the business column named sort_key survived with its values
    assert "sort_key" in back.columns
    for r in back.select("doc_id", "sort_key").collect():
        assert r.sort_key == r.doc_id * 7


def test_export_validates_args(documents):
    with pytest.raises(ValueError, match="n_shards"):
        shard_assignment(documents, 0)
    with pytest.raises(ValueError, match="budget"):
        pack_sequences(documents, budget=0, n_shards=4)


def test_split_assignment_deterministic_fractions(documents):
    fr = {"train": 0.8, "val": 0.1, "test": 0.1}
    a = {r.doc_id: r.split for r in split_assignment(documents, fr).collect()}
    b = {r.doc_id: r.split for r in split_assignment(documents, fr).collect()}
    assert a == b
    assert len(a) == documents.count()
    assert set(a.values()) <= set(fr)
    from collections import Counter

    sizes = Counter(a.values())
    n = len(a)
    # hash uniformity at n=500: generous +-50% tolerance per bucket
    assert 0.5 * 0.8 * n <= sizes["train"] <= min(n, 1.5 * 0.8 * n + 1)
    for s in ("val", "test"):
        assert sizes[s] <= 0.1 * n * 2.5 + 1


def test_split_assignment_validates_fractions(documents):
    with pytest.raises(ValueError, match="sum to 1.0"):
        split_assignment(documents, {"train": 0.5, "test": 0.4})
    with pytest.raises(ValueError, match="negative"):
        split_assignment(documents, {"train": 1.5, "test": -0.5})


def test_leakage_safe_split_groups_stay_together(spark):
    """Every member of a duplicate group lands in the SAME split; docs in
    no group split independently; a group whose group_id equals a
    singleton's id agrees with that singleton (group_id is the min member
    id, so the group contains that very doc — consistent by design)."""
    docs = spark.createDataFrame(
        [(i, f"text {i}") for i in range(40)], "doc_id long, text string"
    )
    # groups: {0,1,2}, {10,11}, {20,25,30}; keepers irrelevant here
    rows = [(0, 0), (1, 0), (2, 0), (10, 10), (11, 10), (20, 20), (25, 20), (30, 20)]
    groups = spark.createDataFrame(rows, "doc_id long, group_id long")
    fr = {"train": 0.5, "val": 0.25, "test": 0.25}
    out = {r.doc_id: r.split for r in
           leakage_safe_split(docs, groups, fr).collect()}
    assert len(out) == 40
    for members in ([0, 1, 2], [10, 11], [20, 25, 30]):
        assert len({out[m] for m in members}) == 1, members
    # the group hashes its group_id, which equals member-doc 0's own key:
    # the singleton form of doc 0 would get the identical split
    solo = {r.doc_id: r.split for r in split_assignment(docs, fr).collect()}
    assert out[0] == solo[0]
    # ungrouped docs match the plain per-doc split exactly
    grouped_ids = {d for d, _ in rows}
    for d in set(out) - grouped_ids:
        assert out[d] == solo[d], d


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


def test_quality_cutoff_approx_percentile_swap(spark, documents, sf_dir):
    """The graded quality_cutoff uses the exact interpolated percentile;
    its docstring claims the 100 TB swap is approx_percentile with the
    same plan shape. Pin the precise relationship: approx_percentile
    returns a DATASET ELEMENT at-or-below the interpolated point (no
    interpolation), so the approx cut keeps a superset of the exact cut
    and every extra doc sits exactly AT the approx threshold — boundary
    ties, not ranking errors."""
    import __spark_entry__ as e
    from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.functions.text import (
        quality_score,
    )

    exact_ids = {r.doc_id for r in e.q_quality_cutoff(spark, sf_dir).collect()}

    scored = documents.select(
        "doc_id",
        F.round(quality_score(F.col("text")) * 1_000_000)
        .cast("bigint")
        .alias("quality6"),
    )
    thr = scored.agg(
        F.expr(
            f"approx_percentile(quality6, {e.QUALITY_CUTOFF_P}, 10000)"
        ).alias("thr")
    )
    thr_val = thr.collect()[0].thr
    approx = {
        r.doc_id: r.quality6
        for r in scored.crossJoin(F.broadcast(thr))
        .filter(F.col("quality6") >= F.col("thr"))
        .collect()
    }
    assert set(approx) >= exact_ids
    extras = set(approx) - exact_ids
    assert all(approx[d] == thr_val for d in extras), extras
    # the boundary-tie overshoot is a sliver, not a ranking error
    assert len(extras) <= max(2, len(exact_ids) // 10)
