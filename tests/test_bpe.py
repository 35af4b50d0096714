"""Distributed BPE training/encoding (operators/bpe.py): differential
against an independent pure-Python BPE implementation, UDF-vs-expression
twin parity, the statically-unrolled DuckDB replay of every training
round (``bpe_sql`` is the STAGED r10 graded-entry oracle), and
hypothesis property pins on random corpora."""

import os
import re
import sys
from collections import Counter

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.operators import (  # noqa: E402
    bpe,
)

MERGES = 12


# ---------------------------------------------------------------------------
# independent pure-Python oracle (classic Sennrich algorithm over a word
# histogram — deliberately NOT sharing code with the module)
# ---------------------------------------------------------------------------

def _py_tokens(text: str) -> list[str]:
    # Java-regex/RE2 \s class spelled out (Python's \s is broader — the
    # engine-wide brute-force-oracle convention)
    return [t for t in re.split(r"[ \t\n\x0B\f\r]+", text.lower()) if t != ""]


def _py_hist(texts: list[str]) -> Counter:
    c: Counter = Counter()
    for t in texts:
        for w in _py_tokens(t):
            if bpe.SEP not in w:
                c[w] += 1
    return c


def _py_train(hist: Counter, num_merges: int, min_count: int = 2):
    words = {w: list(w) + [bpe.EOW] for w in hist}
    merges = []
    for rank in range(1, num_merges + 1):
        pc: Counter = Counter()
        for w, syms in words.items():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += hist[w]
        if not pc:
            break
        # count desc, then (left, right) lexicographic — the pinned tie-break
        (l, r), c = sorted(pc.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if c < min_count:
            break
        merges.append((rank, l, r, c))
        for w, syms in words.items():
            i, out = 0, []
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[w] = out
    return merges, words


def _py_encode(word: str, ranked) -> list[str]:
    syms = list(word) + [bpe.EOW]
    for l, r in ranked:
        i, out = 0, []
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                out.append(l + r)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


# ---------------------------------------------------------------------------
# the staged r10 graded-entry oracle: every training round statically
# unrolled in ANSI SQL (the kmeans_lloyd / strip_fixpoint precedent).
# Round k elects the (count desc, left, right) top pair of h{k-1} and
# applies it with the SAME sentinel replace the engine uses — replace()'s
# left-to-right non-overlapping scan is the greedy merge order in both
# engines.
# ---------------------------------------------------------------------------

_SQL_TOKENS = r"list_filter(string_split_regex(lower(text), '\s+'), t -> t <> '')"


def _bpe_round_sql(prev: str, k: int) -> str:
    # MATERIALIZED: each round references the previous twice (pair counts
    # + the merge application) — default CTE inlining would expand the
    # chain exponentially in num_merges
    return f"""p{k} AS MATERIALIZED (
  SELECT syms[i] AS l, syms[i + 1] AS r, sum(cnt) AS c
  FROM (SELECT cnt, string_split(trim(rendered, '·'), '··') AS syms FROM {prev}),
       UNNEST(range(1, len(syms))) t(i)
  GROUP BY 1, 2
),
m{k} AS MATERIALIZED (SELECT l, r, c FROM p{k} ORDER BY c DESC, l, r LIMIT 1),
h{k} AS MATERIALIZED (
  SELECT word, cnt,
         replace(rendered,
                 '·' || (SELECT l FROM m{k}) || '··' || (SELECT r FROM m{k}) || '·',
                 '·' || (SELECT l FROM m{k}) || (SELECT r FROM m{k}) || '·') AS rendered
  FROM {prev}
)"""


def bpe_sql(src_sql: str, num_merges: int = MERGES) -> str:
    """Unrolled BPE training over ``src_sql`` (must yield a ``text``
    column): returns ``rank, left, right, pair_count``."""
    ctes = [
        f"""h0 AS MATERIALIZED (
  SELECT word, count(*)::BIGINT AS cnt,
         '·' || array_to_string(list_append(string_split(word, ''), '</w>'), '··') || '·' AS rendered
  FROM (SELECT unnest({_SQL_TOKENS}) AS word FROM ({src_sql}))
  WHERE NOT contains(word, '·')
  GROUP BY word
)"""
    ]
    ctes += [_bpe_round_sql(f"h{k - 1}", k) for k in range(1, num_merges + 1)]
    sel = "\nUNION ALL\n".join(
        f"SELECT {k} AS rank, l AS left, r AS right, c AS pair_count FROM m{k}"
        for k in range(1, num_merges + 1)
    )
    return "WITH\n" + ",\n".join(ctes) + "\n" + sel + "\nORDER BY rank"


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def trained(documents):
    rep = {}
    merges = bpe.train_bpe(documents, num_merges=MERGES, report=rep)
    return merges, rep


def test_train_matches_python_oracle(documents, trained):
    merges, _ = trained
    texts = [r.text for r in documents.select("text").collect()]
    expected, _ = _py_train(_py_hist(texts), MERGES)
    got = [
        (r.rank, r.left, r.right, int(r.pair_count))
        for r in merges.orderBy("rank").collect()
    ]
    assert got == expected
    assert len(got) == MERGES  # fixture corpus sustains all rounds


def test_train_matches_unrolled_duckdb_oracle(documents, trained, sf_dir):
    merges, _ = trained
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    oracle = con.execute(bpe_sql("SELECT text FROM documents", MERGES)).fetchall()
    got = [
        (r.rank, r.left, r.right, int(r.pair_count))
        for r in merges.orderBy("rank").collect()
    ]
    assert got == [(int(a), b, c, int(d)) for a, b, c, d in oracle]


def bpe_encode_sql(ranked: list, src_sql: str) -> str:
    """Corpus encoding under FROZEN merges, replayed in SQL: per token,
    render the char+EOW sentinel string, chain one replace() per merge in
    rank order (left-to-right non-overlapping = greedy BPE), split back,
    flatten per doc — the apply_bpe_expr twin as pure ANSI SQL (a second
    staged r10 entry next to the training oracle)."""
    r = ("'·' || array_to_string(list_append(string_split(t, ''), '</w>'),"
         " '··') || '·'")
    for left, right in ranked:
        pat = f"'·{left}··{right}·'"
        rep = f"'·{left}{right}·'"
        r = f"replace({r}, {pat}, {rep})"
    return f"""
SELECT doc_id,
       flatten(list_transform(
         list_filter({_SQL_TOKENS}, t -> NOT contains(t, '·')),
         t -> string_split(trim({r}, '·'), '··'))) AS pieces
FROM ({src_sql})"""


def test_encode_matches_duckdb_replay(documents, trained, sf_dir):
    merges, _ = trained
    ranked = [(r.left, r.right) for r in merges.orderBy("rank").collect()]
    got = {
        r.doc_id: list(r.pieces)
        for r in bpe.apply_bpe_expr(documents, merges).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    oracle = {
        int(d): list(p)
        for d, p in con.execute(
            bpe_encode_sql(ranked, "SELECT doc_id, text FROM documents")
        ).fetchall()
    }
    assert got == oracle


def test_apply_udf_matches_expression_twin(documents, trained):
    merges, _ = trained
    a = {
        r.doc_id: (list(r.pieces), r.n_tokens, r.n_pieces)
        for r in bpe.apply_bpe(documents, merges).collect()
    }
    b = {
        r.doc_id: (list(r.pieces), r.n_tokens, r.n_pieces)
        for r in bpe.apply_bpe_expr(documents, merges).collect()
    }
    assert a == b
    assert len(a) == documents.count()


def test_apply_matches_python_oracle(documents, trained):
    merges, _ = trained
    ranked = [(r.left, r.right) for r in merges.orderBy("rank").collect()]
    texts = {r.doc_id: r.text for r in documents.collect()}
    got = {r.doc_id: list(r.pieces) for r in bpe.apply_bpe(documents, merges).collect()}
    for doc_id, text in texts.items():
        expected = [p for w in _py_tokens(text) for p in _py_encode(w, ranked)]
        assert got[doc_id] == expected


def test_encoding_roundtrips_and_compresses(documents, trained):
    merges, _ = trained
    enc = {r.doc_id: r for r in bpe.apply_bpe(documents, merges).collect()}
    texts = {r.doc_id: r.text for r in documents.collect()}
    for doc_id, text in texts.items():
        toks = _py_tokens(text)
        r = enc[doc_id]
        # lossless: stripping piece boundaries reconstructs the token stream
        assert "".join(r.pieces).replace(bpe.EOW, " ").split() == toks
        assert r.n_tokens == len(toks)
        # merges actually compress: fewer pieces than the char-level floor
        if toks:
            assert r.n_pieces < sum(len(w) + 1 for w in toks)


def test_min_count_stops_training(spark):
    # every adjacent pair globally unique -> no pair reaches min_count=2
    docs = spark.createDataFrame(
        [(1, "abc"), (2, "def"), (3, "ghi")], "doc_id long, text string"
    )
    merges = bpe.train_bpe(docs, num_merges=5, min_count=2)
    assert merges.count() == 0
    # encoding under an empty merge table is the char+EOW floor
    enc = {r.doc_id: list(r.pieces) for r in bpe.apply_bpe(docs, merges).collect()}
    assert enc[1] == ["a", "b", "c", bpe.EOW]


def test_sentinel_words_excluded_from_training(spark):
    # "aaa" x2 yields pair (a,a) weight 4 — but the sentinel word's (a,·)
    # and (·,a) pairs would weigh 5 if it illegally entered training
    docs = spark.createDataFrame(
        [(1, "aaa aaa"), (2, "a·a a·a a·a a·a a·a")], "doc_id long, text string"
    )
    merges = bpe.train_bpe(docs, num_merges=1)
    rows = merges.collect()
    assert [(r.left, r.right, int(r.pair_count)) for r in rows] == [("a", "a", 4)]
    # the UDF path still encodes sentinel words via the merge walk
    enc = {r.doc_id: list(r.pieces) for r in bpe.apply_bpe(docs, merges).collect()}
    assert enc[2] == ["a", "·", "a", bpe.EOW] * 5
    assert enc[1] == ["aa", "a", bpe.EOW] * 2


def test_vocab_matches_python_oracle(documents, trained):
    _, rep = trained
    got = {
        r.piece: (r.n_words, r.total_cnt)
        for r in bpe.bpe_vocab(rep["histogram"]).collect()
    }
    texts = [r.text for r in documents.select("text").collect()]
    hist = _py_hist(texts)
    _, words = _py_train(hist, MERGES)
    exp: dict = {}
    for w, syms in words.items():
        for p in set(syms):
            exp.setdefault(p, [0, 0])[0] += 1
        for p in syms:
            exp[p][1] += hist[w]
    assert got == {p: (a, b) for p, (a, b) in exp.items()}


def test_max_words_caps_histogram(documents):
    hist = bpe.word_histogram(documents, max_words=10)
    assert hist.count() == 10
    full = bpe.word_histogram(documents)
    top = {
        r.word
        for r in full.orderBy(full.cnt.desc(), "word").limit(10).collect()
    }
    assert {r.word for r in hist.collect()} == top


# hypothesis + session-scoped spark: wrap via a module-level holder
# (hypothesis @given can't take pytest fixtures directly)
_SPARK = {}


@pytest.fixture(autouse=True, scope="module")
def _capture_spark(spark):
    _SPARK["s"] = spark
    yield


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.text(alphabet="ab c", min_size=0, max_size=24),
        min_size=1,
        max_size=8,
    ),
    st.integers(min_value=1, max_value=6),
)
def test_property_train_and_encode_match_python_oracle(texts, n):
    spark = _SPARK["s"]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    merges = bpe.train_bpe(docs, num_merges=n, min_count=2)
    expected_merges, _ = _py_train(_py_hist(texts), n)
    got = [
        (r.rank, r.left, r.right, int(r.pair_count))
        for r in merges.orderBy("rank").collect()
    ]
    assert got == expected_merges
    ranked = [(l, r) for _, l, r, _ in expected_merges]
    enc = {r.doc_id: list(r.pieces) for r in bpe.apply_bpe(docs, merges).collect()}
    for i, t in enumerate(texts):
        assert enc[i] == [p for w in _py_tokens(t) for p in _py_encode(w, ranked)]


def bpe_vocab_sql(src_sql: str, num_merges: int = MERGES) -> str:
    """STAGED r11 graded-entry oracle: the piece vocabulary from the
    final training segmentation (h{num_merges}'s rendered column) —
    per-piece word-type count and corpus frequency."""
    ctes = [
        f"""h0 AS MATERIALIZED (
  SELECT word, count(*)::BIGINT AS cnt,
         '·' || array_to_string(list_append(string_split(word, ''), '</w>'), '··') || '·' AS rendered
  FROM (SELECT unnest({_SQL_TOKENS}) AS word FROM ({src_sql}))
  WHERE NOT contains(word, '·')
  GROUP BY word
)"""
    ]
    ctes += [_bpe_round_sql(f"h{k - 1}", k) for k in range(1, num_merges + 1)]
    return (
        "WITH\n" + ",\n".join(ctes) + f"""
SELECT piece, count(DISTINCT word)::BIGINT AS n_words,
       sum(cnt)::BIGINT AS total_cnt
FROM (SELECT word, cnt,
             unnest(string_split(trim(rendered, '·'), '··')) AS piece
      FROM h{num_merges})
GROUP BY piece"""
    )


def test_vocab_matches_duckdb_replay(documents, trained, sf_dir):
    """The staged r11 differential: bpe_vocab over the trained histogram
    vs the unrolled-SQL final segmentation."""
    import duckdb

    _, rep = trained
    got = {
        r.piece: (int(r.n_words), int(r.total_cnt))
        for r in bpe.bpe_vocab(rep["histogram"]).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    want = {
        p: (int(nw), int(tc))
        for p, nw, tc in con.execute(
            bpe_vocab_sql("SELECT text FROM documents", MERGES)
        ).fetchall()
    }
    assert got == want
