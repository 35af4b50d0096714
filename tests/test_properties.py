"""Property-based tests (hypothesis): operator semantics vs brute-force
Python oracles on randomized inputs. Spark jobs are expensive per example,
so each property runs a small number of GENEROUS examples (wide random
shapes) rather than hypothesis' default 100 — the goal is shapes a
hand-written golden test wouldn't think of (duplicate timestamps, all-equal
keys, empty sides, single-element sessions).
"""

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
