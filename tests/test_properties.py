"""Property-based tests (hypothesis): operator semantics vs brute-force
Python oracles on randomized inputs. Spark jobs are expensive per example,
so each property runs a small number of GENEROUS examples (wide random
shapes) rather than hypothesis' default 100 — the goal is shapes a
hand-written golden test wouldn't think of (duplicate timestamps, all-equal
keys, empty sides, single-element sessions).
"""

import pytest
from hypothesis import given, settings, strategies as st

from pyspark.sql import functions as F

EXAMPLES = 10

_ts = st.integers(min_value=0, max_value=50)
_uid = st.integers(min_value=1, max_value=3)


@settings(max_examples=EXAMPLES, deadline=None)
@given(
    left=st.lists(st.tuples(_uid, _ts), min_size=1, max_size=12),
    right=st.lists(st.tuples(_uid, _ts), max_size=12),
)
def test_as_of_join_matches_bruteforce(spark, left, right):
    from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.operators.relational import (
        as_of_join,
    )

    lrows = [(i, u, t) for i, (u, t) in enumerate(left)]
    rrows = [(1000 + i, u, t) for i, (u, t) in enumerate(right)]
    ldf = spark.createDataFrame(lrows, "event_id long, user_id long, ts long")
    rdf = spark.createDataFrame(rrows, "event_id long, user_id long, ts long")
    out = {
        r.event_id: (r.right_ts, r.right_event_id)
        for r in as_of_join(
            ldf, rdf, key="user_id", right_cols=("event_id",),
            right_tiebreak="event_id",
        ).collect()
    }
    assert set(out) == {i for i, _, _ in lrows}
    for lid, u, t in lrows:
        cand = [(rt, rid) for rid, ru, rt in rrows if ru == u and rt <= t]
        want = max(cand, key=lambda p: (p[0], p[1])) if cand else (None, None)
        assert out[lid] == want, (lid, u, t)


@settings(max_examples=EXAMPLES, deadline=None)
@given(
    events=st.lists(st.tuples(_uid, _ts), min_size=1, max_size=15),
    gap=st.integers(min_value=1, max_value=20),
)
def test_sessionize_batch_matches_bruteforce(spark, events, gap):
    from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.streaming.events import (
        sessionize_batch,
    )

    rows = [(u, t, 1.0) for u, t in events]
    df = spark.createDataFrame(rows, "user_id long, ts long, value double")
    got = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in sessionize_batch(df, gap_ticks=gap).collect()
    }
    want = set()
    by_user = {}
    for u, t in events:
        by_user.setdefault(u, []).append(t)
    for u, ts in by_user.items():
        ts.sort()
        start = prev = ts[0]
        n = 1
        for t in ts[1:]:
            if t - prev > gap:
                want.add((u, start, prev, n))
                start, n = t, 0
            prev = t
            n += 1
        want.add((u, start, prev, n))
    assert got == want


@settings(max_examples=EXAMPLES, deadline=None)
@given(
    pairs=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=9),
            st.integers(min_value=0, max_value=9),
        ),
        min_size=1,
        max_size=15,
    )
)
def test_duplicate_groups_converged_matches_connected_components(spark, pairs):
    from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.operators.dedup import (
        duplicate_groups,
    )

    pairs = [(a, b) for a, b in pairs if a != b]
    if not pairs:
        return
    df = spark.createDataFrame(pairs, "doc_a long, doc_b long")
    got = {
        r.doc_id: r.group_id
        for r in duplicate_groups(df, until_converged=True).collect()
    }
    # brute-force union-find
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {x: find(x) for x in parent}
    assert got == want


_word = st.sampled_from(["alpha", "beta", "gamma", "delta", "eps"])
_doc = st.lists(_word, min_size=0, max_size=12).map(" ".join)


@pytest.mark.parametrize("idf_form", ["ratio", "log"])
@settings(max_examples=EXAMPLES, deadline=None)
@given(
    docs=st.lists(_doc, min_size=1, max_size=8),
    query=st.lists(_word, min_size=1, max_size=3),
)
def test_bm25_matches_bruteforce_random(spark, idf_form, docs, query):
    """BM25 vs the pure-Python oracle on random tiny corpora, for BOTH idf
    forms: same doc set, micro-unit-matched scores, same (score desc, id
    asc) ranks — including empty docs, all-identical docs, repeated query
    terms. The log-free ``ratio`` form is bit-deterministic cross-engine
    so its assertions are exact; the classic-``ln`` default tolerates one
    micro-unit per matched term (libm vs JVM ``ln`` may differ in the last
    ulp before the micro-round) and only pins ordering between docs whose
    oracle scores are separated by more than that slack."""
    import math

    from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.operators.retrieval import (
        BM25_B,
        BM25_K1,
        bm25_topk,
    )

    rows = list(enumerate(docs))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    probes = spark.createDataFrame(
        [(0, query)], "query_id long, terms array<string>"
    )
    got = {
        r.result_id: (r.score, r.rank)
        for r in bm25_topk(df, probes, k=100, idf=idf_form).collect()
    }

    toks = {d: t.split() for d, t in rows}
    n = float(len(rows))
    sum_dl = float(sum(len(t) for t in toks.values()))
    avgdl = sum_dl / n
    dfreq: dict[str, int] = {}
    for t in toks.values():
        for term in set(t):
            dfreq[term] = dfreq.get(term, 0) + 1
    want = {}
    terms_matched = {}
    for d, t in toks.items():
        c6 = 0
        nmatch = 0
        for term in set(query):
            tf = t.count(term)
            if tf == 0:
                continue
            nmatch += 1
            ratio = ((n - dfreq[term]) + 0.5) / (dfreq[term] + 0.5)
            idf = math.log(ratio + 1.0) if idf_form == "log" else ratio
            contrib = (idf * (tf * (BM25_K1 + 1.0))) / (
                tf + BM25_K1 * ((1.0 - BM25_B) + ((BM25_B * len(t)) / avgdl))
            )
            # Spark's F.round is HALF_UP; contrib is always positive
            c6 += int(math.floor(contrib * 1_000_000.0 + 0.5))
        if c6:
            want[d] = round(c6 / 1_000_000.0, 6)
            terms_matched[d] = nmatch
    assert set(got) == set(want)
    for d, s in want.items():
        tol = 1e-9 if idf_form == "ratio" else terms_matched[d] * 1e-6 + 1e-9
        assert abs(got[d][0] - s) <= tol, (d, got[d][0], s)
    order = [d for d, _ in sorted(want.items(), key=lambda kv: (-kv[1], kv[0]))]
    got_order = [d for d, _ in sorted(got.items(), key=lambda kv: kv[1][1])]
    if idf_form == "ratio":
        assert order == got_order
    else:
        # only pin relative order where the oracle separates the scores
        # by more than the combined rounding slack
        slack = 2.0 * (max(terms_matched.values(), default=0) * 1e-6 + 1e-9)
        pos = {d: i for i, d in enumerate(got_order)}
        for i, a in enumerate(order):
            for bdoc in order[i + 1 :]:
                if want[a] - want[bdoc] > slack:
                    assert pos[a] < pos[bdoc], (a, bdoc)


@settings(max_examples=EXAMPLES, deadline=None)
@given(
    keys=st.lists(st.integers(min_value=0, max_value=400), min_size=1, max_size=120),
    k=st.integers(min_value=4, max_value=16),
)
def test_kmv_merge_equals_rebuild_random(spark, keys, k):
    """Sketch composability on random shards: merge(sketch(A), sketch(B))
    is row-identical to sketch(A union B) for ANY split, and the estimate
    is exact whenever distinct count fits inside k."""
    from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.operators.sketch import (
        kmv_build,
        kmv_estimate,
        kmv_merge,
    )

    mid = len(keys) // 2
    mk = lambda rows: spark.createDataFrame(  # noqa: E731
        [("g", f"k{v}") for v in rows], "g string, k string"
    )
    a, b, full = mk(keys[:mid]), mk(keys[mid:]), mk(keys)
    if not keys[:mid]:
        a = mk([])  # empty side still merges
    merged = kmv_merge(
        kmv_build(a, "k", ("g",), k=k), kmv_build(b, "k", ("g",), k=k), ("g",), k=k
    )
    rebuilt = kmv_build(full, "k", ("g",), k=k)
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, rebuilt.collect()))
    n_true = len(set(keys))
    est = kmv_estimate(rebuilt, ("g",), k=k).collect()[0]
    if n_true < k:
        assert est.est_distinct == n_true


@settings(max_examples=EXAMPLES, deadline=None)
@given(
    bodies=st.lists(st.integers(min_value=0, max_value=5), min_size=1, max_size=10),
    min_df=st.integers(min_value=2, max_value=4),
)
def test_boilerplate_removal_threshold_property(spark, bodies, min_df):
    """For every line: removed from ALL docs iff its doc frequency reaches
    min_df — on random corpora where line sharing is induced by body-id
    collisions."""
    from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.operators.cleanse import (
        remove_boilerplate_lines,
    )

    rows = [
        (i, f"line-{b}\nuniq-{i}") for i, b in enumerate(bodies)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in remove_boilerplate_lines(df, min_df=min_df).collect()}
    from collections import Counter

    # df counts DISTINCT docs; each doc contributes its line-{b} exactly once
    dfreq = Counter(f"line-{b}" for b in bodies)
    for i, b in enumerate(bodies):
        removed = dfreq[f"line-{b}"] >= min_df
        lines = out[i].clean_text.split("\n") if out[i].clean_text else []
        assert (f"line-{b}" not in lines) == removed
        assert (f"uniq-{i}" in lines)  # unique lines always survive
        assert out[i].n_removed == (1 if removed else 0)


@settings(max_examples=5, deadline=None)
@given(
    repl=st.sets(st.integers(min_value=20, max_value=299), max_size=12),
    new=st.sets(st.integers(min_value=1000, max_value=1020), max_size=8),
    shift=st.integers(min_value=1, max_value=150),
)
def test_upsert_equals_rebuild_random_batches(spark, repl, new, shift):
    """upsert(base, batch) == build(base - replaced + batch) for ANY batch
    of replacements (ids 20-299, vectors swapped with the id+shift row —
    arbitrary cell migrations) and appends, under the same centroid bank
    (ids 0-15 never touched, so both banks agree)."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.operators.knn import (
        build_ivf_index,
        upsert_ivf_index,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    base = emb.filter(F.col("vec_id") < 300).select("vec_id", "embedding")
    vec_of = {
        r.vec_id: r.embedding
        for r in emb.select("vec_id", "embedding").collect()
    }
    rows = [(i, vec_of[(i + shift) % 500]) for i in sorted(repl)] + [
        (i, vec_of[i % 500]) for i in sorted(new)
    ]
    tmp = tempfile.mkdtemp(prefix="upsert_prop_")
    try:
        path = f"{tmp}/up"
        build_ivf_index(base, path, n_centroids=8)
        if rows:
            batch = spark.createDataFrame(
                rows, "vec_id long, embedding array<float>"
            )
            upsert_ivf_index(batch, path)
        merged = base.filter(~F.col("vec_id").isin([i for i, _ in rows]))
        if rows:
            merged = merged.unionByName(
                spark.createDataFrame(rows, "vec_id long, embedding array<float>")
            )
        path2 = f"{tmp}/rebuild"
        build_ivf_index(merged, path2, n_centroids=8)
        got = {
            (r.vec_id, r.cell): tuple(r.embedding)
            for r in spark.read.parquet(path).collect()
        }
        want = {
            (r.vec_id, r.cell): tuple(r.embedding)
            for r in spark.read.parquet(path2).collect()
        }
        assert got == want
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


# arbitrary unicode text (including whitespace runs, emoji, CJK, empty)
_unicode_doc = st.text(
    alphabet=st.characters(
        codec="utf-8", exclude_categories=("Cs",), max_codepoint=0x2FFFF
    ),
    max_size=60,
)


@settings(max_examples=EXAMPLES, deadline=None)
@given(docs=st.lists(_unicode_doc, min_size=1, max_size=12))
def test_shard_stats_matches_bruteforce_unicode(spark, docs):
    """shard_stats vs a pure-Python oracle on arbitrary unicode text:
    token counts (lowercased whitespace split), BYTE lengths (utf-8 —
    octet_length, not character count), and the salted-hash shard
    assignment all agree, including empty strings, whitespace-only docs,
    emoji and astral-plane codepoints."""
    import hashlib

    from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.operators.export import (
        shard_stats,
    )

    n_shards = 4
    rows = list(enumerate(docs))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.shard: (r.n_docs, r.n_tokens, r.n_bytes)
           for r in shard_stats(df, n_shards).collect()}

    def h60(s: str) -> int:
        return int(hashlib.sha256(s.encode("utf-8")).hexdigest()[:15], 16)

    want: dict = {}
    for i, t in rows:
        shard = h60(f"shard:{i}") % n_shards
        # Java regex \s (Spark split) and RE2 \s (the DuckDB oracle) are
        # the ASCII class [ \t\n\x0B\f\r]; PYTHON's re \s additionally
        # matches \x1c-\x1f and unicode spaces — so the brute force must
        # spell out the engines' class, not use \s (hypothesis found
        # '0\x1f0': 1 token in both engines, 2 under Python \s)
        toks = [
            w
            for w in __import__("re").split(r"[ \t\n\x0b\f\r]+", t.lower())
            if w
        ]
        d, tk, by = want.get(shard, (0, 0, 0))
        want[shard] = (d + 1, tk + len(toks), by + len(t.encode("utf-8")))
    assert got == want


@settings(max_examples=EXAMPLES, deadline=None)
@given(
    docs=st.lists(_unicode_doc, min_size=1, max_size=12),
    budget=st.integers(min_value=1, max_value=30),
)
def test_pack_sequences_boundary_law_random(spark, docs, budget):
    """pack_sequences on random unicode docs: every doc in exactly one
    sequence, seq_id == floor(start_offset/budget) in the hash order, and
    every shard's first sequence is 0. Sequence ids may have GAPS — a doc
    longer than the budget occupies several budget windows and the next
    doc starts at floor of a later offset (review finding: asserting
    contiguity here was a false invariant, e.g. a 5-token doc at budget 1
    legitimately yields seq ids {0, 5})."""
    import hashlib

    from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.operators.export import (
        pack_sequences,
    )

    rows = list(enumerate(docs))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: (r.shard, r.seq_id, r.n_tokens)
           for r in pack_sequences(df, budget=budget, n_shards=2).collect()}
    assert set(out) == {i for i, _ in rows}

    def h60(s: str) -> int:
        return int(hashlib.sha256(s.encode("utf-8")).hexdigest()[:15], 16)

    by_shard: dict = {}
    for i, t in rows:
        by_shard.setdefault(h60(f"shard:{i}") % 2, []).append(
            (h60(f"order:{i}"), i)
        )
    for shard, members in by_shard.items():
        cum = 0
        first = True
        for _, i in sorted(members):
            s, seq_id, n_tok = out[i]
            assert s == shard
            assert seq_id == cum // budget, i
            if first:
                assert seq_id == 0
                first = False
            cum += n_tok


@settings(max_examples=EXAMPLES, deadline=None)
@given(
    ids=st.lists(st.integers(min_value=0, max_value=10_000), min_size=1,
                 max_size=25, unique=True),
    cuts=st.tuples(
        st.floats(min_value=0.05, max_value=0.9),
        st.floats(min_value=0.05, max_value=0.9),
    ),
)
def test_split_assignment_matches_bruteforce(spark, ids, cuts):
    """split_assignment vs a pure-Python oracle: identical salted-hash
    bucketing for arbitrary ids and fraction layouts (thresholds are
    integer, computed by the same helper both sides)."""
    import hashlib

    from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.operators.export import (
        _split_thresholds,
        split_assignment,
    )

    a, b = sorted(cuts)
    fr = {"train": a, "val": b - a, "test": 1.0 - b}
    df = spark.createDataFrame([(i, "x") for i in ids], "doc_id long, text string")
    got = {r.doc_id: r.split for r in split_assignment(df, fr).collect()}

    ths = _split_thresholds(fr)
    want = {}
    for i in ids:
        h = int(hashlib.sha256(f"split:{i}".encode()).hexdigest()[:15], 16)
        for name, t in ths:
            if h < t:
                want[i] = name
                break
    assert got == want


@settings(max_examples=EXAMPLES, deadline=None)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=-1_000_000, max_value=1_000_000),
            st.integers(min_value=-10**14, max_value=10**14),
        ),
        min_size=1,
        max_size=20,
        unique=True,
    ),
    bits=st.integers(min_value=1, max_value=12),
)
def test_zorder_key_matches_bruteforce(spark, rows, bits):
    """zorder_key vs an independent Python implementation of the same
    stretch-scale + interleave arithmetic, over random (possibly negative,
    wide-range) domains — Python floats ARE IEEE doubles, so the single
    rounding in the scale division must agree bit-for-bit."""
    import math

    from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.operators.layout import (
        zorder_key,
    )

    df = spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(rows)],
        "rid long, a long, b long",
    )
    got = {r.rid: r.zkey for r in zorder_key(df, "a", "b", bits=bits).collect()}

    a_vals = [a for a, _ in rows]
    b_vals = [b for _, b in rows]
    m1, x1 = min(a_vals), max(a_vals)
    m2, x2 = min(b_vals), max(b_vals)

    def scale(c, lo, hi):
        return math.floor((float(c - lo) / float(hi - lo + 1)) * float(1 << bits))

    def morton(q1, q2):
        z = 0
        for i in range(bits):
            z |= ((q1 >> i) & 1) << (2 * i)
            z |= ((q2 >> i) & 1) << (2 * i + 1)
        return z

    for i, (a, b) in enumerate(rows):
        assert got[i] == morton(scale(a, m1, x1), scale(b, m2, x2)), (a, b)


_word = st.sampled_from(["aa", "bb", "cc", "dd", "ee"])


@settings(max_examples=EXAMPLES, deadline=None)
@given(
    texts=st.lists(
        st.lists(_word, min_size=0, max_size=12).map(" ".join),
        min_size=1,
        max_size=8,
    )
)
def test_overlap_measures_laws_random(spark, texts):
    """Containment and Jaccard over the SAME shared verification core obey
    the set laws on any input: jaccard <= containment <= 1, jaccard == 1
    iff both directions fully contained, and both match a brute-force
    shingle-set computation."""
    from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.operators.dedup import (
        containment_pairs,
        ngram_jaccard_pairs,
    )

    rows = [(i, t) for i, t in enumerate(texts)]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = [(a, b) for a in range(len(rows)) for b in range(a + 1, len(rows))]
    if not pairs:
        return
    pdf = spark.createDataFrame(pairs, "doc_a long, doc_b long")
    jac = {(r.doc_a, r.doc_b): r.jaccard for r in ngram_jaccard_pairs(d, pdf).collect()}
    con = {
        (r.doc_a, r.doc_b): (r.containment_a, r.containment_b, r.containment)
        for r in containment_pairs(d, pdf).collect()
    }

    def shingles(t):
        toks = t.split()
        return {" ".join(toks[i : i + 3]) for i in range(max(0, len(toks) - 2))}

    for (a, b) in pairs:
        sa, sb = shingles(texts[a]), shingles(texts[b])
        inter = len(sa & sb)
        union = len(sa | sb)
        want_j = round(inter / union, 6) if union else 0.0
        want_ca = round(inter / len(sa), 6) if sa else 0.0
        want_cb = round(inter / len(sb), 6) if sb else 0.0
        assert jac[(a, b)] == want_j, (a, b, texts[a], texts[b])
        ca, cb, c = con[(a, b)]
        assert (ca, cb) == (want_ca, want_cb)
        assert c == max(ca, cb)
        assert jac[(a, b)] <= c + 1e-9  # jaccard never exceeds containment


@settings(max_examples=EXAMPLES, deadline=None)
@given(
    member=st.lists(st.text(alphabet="xyz", min_size=1, max_size=4),
                    min_size=1, max_size=30, unique=True),
    other=st.lists(st.text(alphabet="uvw", min_size=1, max_size=4),
                   max_size=30, unique=True),
)
def test_bloom_never_false_negative_random(spark, member, other):
    """A Bloom filter may false-positive but NEVER false-negative — on any
    random member/non-member split, every member probe must hit."""
    from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.operators.sketch import (
        bloom_build,
        bloom_probe,
    )

    m = spark.createDataFrame([(k,) for k in member], "k string")
    bloom = bloom_build(m, "k")
    probes = spark.createDataFrame([(k,) for k in member + other], "k string")
    hits = {r.probe_key: r.bloom_hit for r in bloom_probe(bloom, probes, "k").collect()}
    assert all(hits[k] for k in member)


@settings(max_examples=EXAMPLES, deadline=None)
@given(
    texts=st.lists(
        st.lists(_word, min_size=3, max_size=10).map(" ".join),
        min_size=1,
        max_size=8,
    )
)
def test_novelty_matches_bruteforce_random(spark, texts):
    """novelty == fraction of a doc's distinct shingles first seen (by
    ascending doc_id) in that doc, vs a brute-force first-occurrence scan;
    an exact copy of an earlier doc always scores 0."""
    from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.operators.dedup import (
        novelty_scores,
    )

    rows = [(i, t) for i, t in enumerate(texts)]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: (r.n_shingles, r.n_novel, r.novelty)
           for r in novelty_scores(d).collect()}

    def shingles(t):
        toks = t.split()
        return {" ".join(toks[i : i + 3]) for i in range(max(0, len(toks) - 2))}

    first = {}
    for i, t in rows:
        for s in shingles(t):
            first.setdefault(s, i)
    for i, t in rows:
        sh = shingles(t)
        if not sh:
            assert i not in got
            continue
        novel = sum(1 for s in sh if first[s] == i)
        assert got[i] == (len(sh), novel, round(novel / len(sh), 6)), (i, t)


@settings(max_examples=EXAMPLES, deadline=None)
@given(
    train=st.lists(
        st.lists(_word, min_size=2, max_size=8).map(" ".join),
        min_size=1,
        max_size=6,
    )
)
def test_bigram_lm_matches_bruteforce_random(spark, train):
    """Train + self-score equals a brute-force add-one bigram LM in p6
    fixed point on any random corpus."""
    from collections import Counter

    from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.operators.lm import (
        bigram_lm_scores,
        train_bigram_lm,
    )

    rows = [(i, t) for i, t in enumerate(train)]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    model, vocab = train_bigram_lm(d)
    got = {r.doc_id: (r.n_bigrams, r.lm_score)
           for r in bigram_lm_scores(d, model, vocab).collect()}

    cbig, cuni, toks_all = Counter(), Counter(), set()
    doc_bgs = {}
    for i, t in rows:
        toks = t.split()
        toks_all.update(toks)
        bgs = list(zip(toks, toks[1:]))
        doc_bgs[i] = bgs
        cbig.update(bgs)
    for (w1, _), n in cbig.items():
        cuni[w1] += n
    V = len(toks_all)
    for i, bgs in doc_bgs.items():
        if not bgs:
            assert got[i] == (0, 0.0)
            continue
        p6s = [round(1000000.0 * (cbig[bg] + 1.0) / (cuni[bg[0]] + V)) for bg in bgs]
        # integer half-up mean, exactly the operator's (2a+b) div (2b)
        want6 = (2 * sum(p6s) + len(bgs)) // (2 * len(bgs))
        assert got[i] == (len(bgs), want6 / 1000000.0), (i, train[i])


def _bf_strip_once(docs_tokens: dict, run_n: int):
    """Brute-force one detect+strip pass: returns
    {doc_id: (kept_tokens, n_removed, n_runs)}."""
    first = {}
    for did in sorted(docs_tokens):
        toks = docs_tokens[did]
        for i in range(len(toks) - run_n + 1):
            w = tuple(toks[i : i + run_n])
            if w not in first:
                first[w] = did
    out = {}
    for did in sorted(docs_tokens):
        toks = docs_tokens[did]
        dup_pos = [
            i + 1
            for i in range(len(toks) - run_n + 1)
            if first[tuple(toks[i : i + run_n])] < did
        ]
        spans, prev = [], None
        for p in dup_pos:
            if prev is not None and p == prev + 1:
                spans[-1][1] = p + run_n - 1
            else:
                spans.append([p, p + run_n - 1])
            prev = p
        dropped = set()
        for s, e in spans:
            dropped.update(range(s, e + 1))
        kept = [t for j, t in enumerate(toks, start=1) if j not in dropped]
        out[did] = (kept, len(dropped), len(spans))
    return out


@settings(max_examples=EXAMPLES, deadline=None)
@given(
    docs=st.lists(
        st.lists(st.sampled_from("abcd"), max_size=14), min_size=1, max_size=6
    ),
    run_n=st.integers(min_value=2, max_value=4),
)
def test_strip_runs_and_fixpoint_match_bruteforce(spark, docs, run_n):
    """Random tiny-vocab corpora (collisions guaranteed): one strip pass
    must equal the brute-force pass per doc (text, tokens removed, runs),
    and strip_until_clean must equal brute-force iterated to emptiness —
    including the round count (rounds = strip passes + the proving empty
    detection)."""
    from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.operators.dedup import (
        strip_duplicate_runs,
        strip_until_clean,
    )

    toks_by_doc = {i: list(t) for i, t in enumerate(docs)}
    rows = [(i, " ".join(t)) for i, t in toks_by_doc.items()]
    d = spark.createDataFrame(rows, "doc_id long, text string")

    want_once = _bf_strip_once(toks_by_doc, run_n)
    got_once = {
        r.doc_id: (r.text, r.n_tokens_removed, r.n_runs_removed)
        for r in strip_duplicate_runs(d, run_n=run_n).collect()
    }
    assert got_once == {
        did: (" ".join(k), n, s) for did, (k, n, s) in want_once.items()
    }

    # brute-force fixpoint
    cur = dict(toks_by_doc)
    cum_tok = {i: 0 for i in cur}
    cum_run = {i: 0 for i in cur}
    bf_rounds = 1
    while True:
        step = _bf_strip_once(cur, run_n)
        if all(n == 0 for _, n, _ in step.values()):
            break
        bf_rounds += 1
        for did, (kept, n, s) in step.items():
            cur[did] = kept
            cum_tok[did] += n
            cum_run[did] += s

    report = {}
    got_fix = {
        r.doc_id: (r.text, r.n_tokens_removed, r.n_runs_removed)
        for r in strip_until_clean(d, run_n=run_n, report=report).collect()
    }
    assert report["converged"] is True
    assert report["rounds"] == bf_rounds
    assert got_fix == {
        did: (" ".join(cur[did]), cum_tok[did], cum_run[did]) for did in cur
    }
