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
