"""Driver-contract invariants for __spark_entry__.py: every query builds
(analyzes) lazily, oracle keys line up, and every query has a full-value
oracle (media_features was the last rows-only one — it gained a NumPy
VALUES fixture). Catches analysis-time breakage (renamed columns, bad
expressions) in seconds, without executing plans."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402

ROWS_ONLY = set()  # every query now has a full-value oracle


def test_oracle_keys_subset_of_queries():
    q = set(entrymod.queries())
    o = set(entrymod.oracle_sql())
    assert o <= q
    assert q - o == ROWS_ONLY


def test_every_query_analyzes(spark, sf_dir):
    for name, fn in entrymod.queries().items():
        df = fn(spark, sf_dir)
        # schema access forces analysis (resolution) but no execution
        cols = df.columns
        assert cols, name
        assert len(cols) == len(set(cols)), f"{name}: duplicate column names"


def test_entry_returns_metrics_dataframe(spark):
    df = entrymod.entry(spark)
    assert set(df.columns) == {
        "success_rate", "mean_precision_at_k", "mrr", "map_at_k"
    }


def test_doc_counts_match_registry():
    """Three consecutive rounds of count-drift findings (COVERAGE/README
    claiming a stale registry size) -> generate the check from
    len(queries()). Docs must state the LIVE count."""
    import re

    n = len(entrymod.queries())
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "COVERAGE.md")) as f:
        m = re.search(r"`queries\(\)`'s (\d+) entries", f.read())
    assert m and int(m.group(1)) == n, (
        f"COVERAGE.md claims {m and m.group(1)} registry entries; "
        f"len(queries()) == {n}"
    )
    with open(os.path.join(root, "README.md")) as f:
        m = re.search(r"(\d+) queries, ALL value-hash-checked", f.read())
    assert m and int(m.group(1)) == n, (
        f"README.md claims {m and m.group(1)} queries; len(queries()) == {n}"
    )


def test_rotation_invariant():
    """COVERAGE.md's rotation rule, enforced: the correctness driver
    hash-checks only the FIRST 50 queries() entries, and no query may sit
    outside that window two consecutive rounds. Equivalently: every entry
    in the current tail must have a fully-green row in one of the LAST TWO
    committed CORRECTNESS_r{N}.json artifacts. Checking only the single
    latest artifact is wrong on a freshly-graded checkout: the driver
    writes CORRECTNESS_r{N}.json (containing exactly the current window)
    AFTER the builder's last commit, which made every tail entry "stale"
    by construction (round-4 verdict finding #1). A tail entry was, by the
    rotation rule itself, in-window and green in round N-1 — so the union
    of the last two artifacts is the correct green set whether or not the
    current round's artifact exists yet. New queries are still constrained
    into the window because they have no green history in either."""
    import glob
    import json
    import re

    import __spark_entry__ as entrymod

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    artifacts = {}
    for p in glob.glob(os.path.join(root, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", p)
        if m:
            artifacts[int(m.group(1))] = p
    assert artifacts, "no CORRECTNESS artifacts committed"
    recent = sorted(artifacts)[-2:]
    green = set()
    for rnd in recent:
        with open(artifacts[rnd]) as f:
            green |= {
                name
                for name, row in json.load(f).items()
                if row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match")
            }

    names = list(entrymod.queries())
    window, tail = names[:50], names[50:]
    stale = [q for q in tail if q not in green]
    assert not stale, (
        f"rotation violation: {stale} sit outside the 50-query window but "
        f"have no green row in rounds {recent} — they were already out "
        "(or failing) last round; rotate them back in"
    )
    # the window itself must not contain duplicates of tail entries
    assert len(set(names)) == len(names)
