"""Lexical retrieval + hybrid rank fusion (beyond-reference extension).

The reference retrieves exclusively by dense-vector similarity (Qdrant
``search`` per probe, bcb_utils.py:161-174). Production retrieval over a
training corpus is almost always HYBRID: a lexical BM25 pass catches exact
term matches that embeddings blur, and the two rank lists are fused
(reciprocal-rank fusion being the standard parameter-free combiner). This
module supplies both halves as set-based DataFrame plans sharing the kNN
operators' output contract ``(query_id, result_id, score, rank)``.

Scale shape (BM25): the corpus side is two shuffles regardless of query
count — postings ``groupBy(doc, term)`` and document frequency
``groupBy(term)`` — then the (small) query-term table broadcasts against
the postings scan, partial-aggregates per (query, doc) map-side, and a
WindowGroupLimit top-k bounds the reduce. The corpus is never joined to
itself and never crosses the driver.

Determinism vs. semantics (the repo-wide oracle discipline): ``bm25_topk``
offers two idf forms. The DEFAULT is the classic Lucene/Robertson
``idf = ln((N - df + 0.5)/(df + 0.5) + 1)`` — what every IR-literate user
means by "BM25" — because the log-free ratio, while per-term
order-identical, weights rare terms linearly instead of logarithmically
and so blends multi-term scores materially differently. ``idf="ratio"``
selects the LOG-FREE Robertson ratio ``(N - df + 0.5)/(df + 0.5)`` for
cross-engine bit-determinism: ``ln`` is not IEEE-correctly-rounded on
every engine, so the ratio form is what the DuckDB value-hash oracle
grades. In both forms per-term contributions are rounded to micro-units
and summed as BIGINT so the per-(query, doc) sum is order-insensitive.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import tokens

BM25_K1 = 1.2
BM25_B = 0.75
RRF_C = 60  # the canonical reciprocal-rank-fusion constant


def bm25_index(
    docs: DataFrame,
    doc_id: str = "doc_id",
    text_col: str = "text",
) -> dict[str, DataFrame]:
    """The BM25 index as three relational tables — build once, query many:

    - ``postings``: ``result_id, term, tf, dl`` (one shuffle)
    - ``df``:       ``term, df`` (derived from postings; postings are
      unique per (doc, term) so df is a plain count)
    - ``stats``:    1-row ``n_docs, sum_dl``

    All three are plain DataFrames: persist them, or ``write.parquet`` and
    reload — the 100 TB shape is postings-on-disk bucketed by term, built
    once per corpus snapshot while ``bm25_topk`` replans only the (small)
    query side. Passing the dict to ``bm25_topk(index=...)`` also dedups
    the postings subtree within one plan (Spark has no cross-branch
    common-subplan reuse without an explicit persist)."""
    toks = tokens(F.col(text_col))
    base = docs.select(
        F.col(doc_id).alias("result_id"), toks.alias("toks")
    ).withColumn("dl", F.size("toks").cast("bigint"))
    stats = base.agg(
        F.count("*").cast("double").alias("n_docs"),
        F.sum("dl").cast("double").alias("sum_dl"),
    )
    postings = (
        base.select("result_id", "dl", F.explode("toks").alias("term"))
        .groupBy("result_id", "term")
        .agg(F.count("*").cast("bigint").alias("tf"), F.first("dl").alias("dl"))
    )
    df_tbl = postings.groupBy("term").agg(F.count("*").cast("bigint").alias("df"))
    return {"postings": postings, "df": df_tbl, "stats": stats}


def bm25_topk(
    docs: DataFrame | None,
    probes: DataFrame,
    k: int = 10,
    k1: float = BM25_K1,
    b: float = BM25_B,
    doc_id: str = "doc_id",
    text_col: str = "text",
    query_id: str = "query_id",
    query_terms: str = "terms",
    index: dict[str, DataFrame] | None = None,
    max_df_ratio: float | None = None,
    idf: str = "log",
) -> DataFrame:
    """BM25 top-k lexical retrieval: for each probe row (``query_id``,
    ``terms`` array<string>) score every document containing at least one
    query term and keep the top ``k``.

    score(q, d) = sum over matched terms of
        idf(t) * (tf * (k1+1)) / (tf + k1 * (1 - b + b * dl/avgdl))

    ``idf`` selects the idf form (see module docstring):

    - ``"log"`` (default): classic ``ln((N - df + 0.5)/(df + 0.5) + 1)`` —
      standard BM25 ranking; last-ulp ``ln`` differences across engines
      make it unsuitable for the bit-exact value-hash oracle.
    - ``"ratio"``: log-free ``(N - df + 0.5)/(df + 0.5)`` — per-term
      ordering identical, multi-term blends weight rare terms MORE
      aggressively than standard BM25 (linear, not logarithmic, in the
      ratio); bit-deterministic cross-engine, the oracle-graded form.

    ``index`` (from ``bm25_index``, possibly persisted/reloaded) skips the
    corpus passes entirely; otherwise the index plan is derived from
    ``docs`` inline.

    ``max_df_ratio`` is the hot-term guard for corpus scale: a query term
    matching more than that fraction of documents (stopwords, markup
    tokens) would pull O(N) posting rows through the join while
    contributing ~nothing to the score (idf -> 0 as df -> N). Setting e.g.
    ``0.5`` drops such terms BEFORE the postings join — standard IR-engine
    behavior — bounding per-term fan-out at the cost of exact scores for
    stopword-only queries. ``None`` (default) keeps exact semantics (the
    oracle-checked form).

    Output: ``query_id, result_id, score, rank`` (rank 1-based by score
    descending, ties by result_id ascending — the kNN operators' contract).
    """
    inline = index is None
    if inline:
        index = bm25_index(docs, doc_id, text_col)
    postings, df_tbl, stats = index["postings"], index["df"], index["stats"]

    qterms = probes.select(
        F.col(query_id).alias("query_id"),
        F.explode(F.array_distinct(F.col(query_terms))).alias("term"),
    )

    # r13 (guide §3.2 pre-filter the big side / §2.3 shuffle fewer
    # bytes): only postings of QUERY terms can score, so the broadcast
    # query-term table semi-filters the postings before any join — the
    # full postings table never flows through the df join. df(t) for a
    # surviving term counts only rows with that term, so on the inline
    # path the df table is re-derived FROM the filtered postings
    # (identical values, and it kills the second corpus
    # tokenize+explode+shuffle pass the unfiltered df groupBy cost);
    # the persisted-index path semi-filters its reloaded df table the
    # same way. Either way the df side is query-term-bounded and
    # broadcastable regardless of corpus size. The semi-joins build on
    # the SAME broadcast(qterms) frame as the scoring join (duplicate
    # terms are harmless to a left-semi), so ReuseExchange serves all
    # three sites from ONE broadcast build instead of three.
    bq = F.broadcast(qterms)
    postings = postings.join(bq, "term", "left_semi")
    if inline:
        # one materialization feeds the df derivation AND the scoring
        # join (lazy — plan builders must not execute at construction)
        from .dedup import persist_bounded

        postings = persist_bounded(postings, eager=False)
        df_tbl = postings.groupBy("term").agg(
            F.count("*").cast("bigint").alias("df")
        )
    else:
        df_tbl = df_tbl.join(bq, "term", "left_semi")

    with_df = postings.join(F.broadcast(df_tbl), "term")
    if max_df_ratio is not None:
        # the df/n_docs predicate is computable on the (small) df table
        # side alone, so the cut happens before any posting row moves
        cut = df_tbl.crossJoin(F.broadcast(stats)).filter(
            F.col("df") <= F.lit(float(max_df_ratio)) * F.col("n_docs")
        ).select("term")
        with_df = with_df.join(F.broadcast(cut), "term", "left_semi")
    matched = (
        with_df
        .join(bq, "term")
        .crossJoin(F.broadcast(stats))
    )
    # micro-unit fixed point: identical parenthesization in the SQL oracle
    avgdl = F.col("sum_dl") / F.col("n_docs")
    ratio = (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    if idf == "log":
        idf_expr = F.log(ratio + F.lit(1.0))
    elif idf == "ratio":
        idf_expr = ratio
    else:
        raise ValueError(f"idf must be 'log' or 'ratio', got {idf!r}")
    tfd = F.col("tf").cast("double")
    denom = tfd + F.lit(k1) * (F.lit(1.0) - F.lit(b) + (F.lit(b) * F.col("dl")) / avgdl)
    contrib6 = F.round(((idf_expr * (tfd * F.lit(k1 + 1.0))) / denom) * 1_000_000.0).cast(
        "bigint"
    )

    scored = (
        matched.select("query_id", "result_id", contrib6.alias("c6"))
        .groupBy("query_id", "result_id")
        .agg(F.round(F.sum("c6") / 1_000_000.0, 6).alias("score"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("result_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "result_id", "score", "rank")
    )


def rrf_fuse(
    ranked_a: DataFrame,
    ranked_b: DataFrame,
    k: int = 10,
    c: int = RRF_C,
) -> DataFrame:
    """Reciprocal-rank fusion of two ranked lists sharing the
    ``(query_id, result_id, rank)`` contract:

        fused(q, d) = 1/(c + rank_a) + 1/(c + rank_b)

    (a missing entry contributes 0). Parameter-free hybrid combiner —
    Cormack et al.'s RRF with the standard c = 60. Output follows the same
    contract, re-ranked by fused score (ties by result_id ascending).

    Scale shape: a single full-outer equi-join on (query_id, result_id) —
    both inputs are already top-k bounded (O(Q*k) rows each), so the fuse
    costs one small shuffle no matter how large the corpus that produced
    them was.
    """
    a = ranked_a.select("query_id", "result_id", F.col("rank").alias("rank_a"))
    bb = ranked_b.select("query_id", "result_id", F.col("rank").alias("rank_b"))
    fused = a.join(bb, ["query_id", "result_id"], "full_outer").select(
        "query_id",
        "result_id",
        F.round(
            F.coalesce(F.lit(1.0) / (F.lit(c).cast("double") + F.col("rank_a")), F.lit(0.0))
            + F.coalesce(
                F.lit(1.0) / (F.lit(c).cast("double") + F.col("rank_b")), F.lit(0.0)
            ),
            6,
        ).alias("score"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("result_id"))
    return (
        fused.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "result_id", "score", "rank")
    )
