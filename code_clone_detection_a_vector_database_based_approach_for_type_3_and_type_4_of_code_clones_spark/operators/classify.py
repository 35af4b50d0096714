"""Distributed linear document-quality classifier (beyond-reference
extension; the CCNet / fastText-classifier stage of a pretraining
pipeline, re-expressed for exact cross-engine replay).

The classic pipeline move (CCNet, LLaMA, GPT-3 data work) trains a small
linear classifier over cheap per-document statistics and keeps documents
the model scores as "quality". The engine's re-expression makes the
TRAINING itself a deterministic relational computation:

- **Features are micro-unit integers** (``BIGINT`` 1e-6 grid): character
  -class ratios, English-stopword coverage, length saturation — all
  positive-integer floor divisions, so the feature table is bit-identical
  in ANSI SQL.
- **Hinge-loss batch subgradient, class-balanced, NO transcendentals.**
  Each round computes ``dot12_i = sum_j w6[j] * f6[i][j]`` (an exact
  BIGINT in 1e-12 product units), flags margin violators
  ``y_i * dot12_i < 1e12``, and aggregates each CLASS's violator feature
  sums separately — one map-side-combinable aggregate per round whose
  output is 2K+2 integers (the ``kmeans_lloyd`` bounded-collect
  pattern). The per-class mean gradients are combined
  ``trunc(g_pos/n_pos) + trunc(g_neg/n_neg)`` so an unbalanced corpus
  cannot drift the weights toward the majority class (round 1 from zero
  weights IS the classic mean-difference prototype direction), and the
  weight update is integer truncated division with an explicit sign
  split, identical in Python and SQL. Unlike logistic regression there
  is no exp/sigmoid anywhere, so the whole training history replays
  bit-for-bit in a statically-unrolled SQL oracle (the
  kmeans/strip_fixpoint precedent).
- **Scoring is a map-side projection** under the trained weights; the
  keep decision is ``dot12 >= 0``.

At 100 TB: each round is ONE scan + one tiny aggregate (the gradient is
K+1 BIGINTs regardless of corpus size — beware BIGINT gradient overflow
past ~9e12 violator-docs; switch the sums to DECIMAL(38,0) there); the
feature table is computed once; scoring/filtering is a pushdown-friendly
map. Labels come from the caller (a curated positive set vs crawl); the
graded/staged shape trains against a PLANTED digit-spam twin corpus (the
remix-corpus precedent — the fixture's ``lang``/``source`` columns are
content-independent random labels, verified unlearnable), reaching exact
separation in CLS_ITERS rounds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import STOPWORDS_EN, tokens

M6 = 1_000_000
FEATURES = (
    "bias",
    "alpha_ratio",
    "digit_ratio",
    "punct_ratio",
    "stop_ratio",
    "len_sat",
    "avg_len_sat",
)
CLS_ITERS = 12  # reaches exact separation of the planted class at sf0.001
ETA_NUM, ETA_DEN = 1, 2  # eta = 0.5 / n_docs per round, integer-rational
LEN_SAT_TOKENS = 100     # length saturates at 100 tokens (C4/Gopher-style)
AVG_LEN_SAT = 20         # average token length saturates at 20 chars

# The per-class violator feature sums are BIGINT and each feature is at
# most 1e6, so a sum over more than ~(2^63-1)/1e6 violator docs can wrap
# silently. Training sets past this bound must switch the gradient sums
# to DECIMAL(38,0) (and the oracle's ::BIGINT casts with them); the guard
# in train_linear_filter makes the boundary loud instead of silent.
GRAD_SAFE_DOCS = (2**63 - 1) // M6  # ~9.22e12 labeled docs


def _r6(num: str, den: str) -> str:
    """Positive-domain micro-unit ratio as SQL text: ``(num*1e6) div den``
    (0 when the denominator is 0). BIGINT ``div`` == DuckDB ``//`` on
    non-negatives — exact, no double round-trip (the lm.py idiom)."""
    return f"CASE WHEN {den} > 0 THEN ({num} * 1000000) div {den} ELSE 0 END"


def doc_features(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document micro-int feature row: ``doc_id, f0..f6`` (order =
    ``FEATURES``), every value in [0, 1e6]."""
    text = F.col(text_col)
    toks = tokens(text)
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(toks).cast("bigint").alias("n_tok"),
        F.length(text).cast("bigint").alias("n_chars"),
        F.length(F.regexp_replace(text, r"[^A-Za-z]", ""))
        .cast("bigint")
        .alias("n_alpha"),
        F.length(F.regexp_replace(text, r"[^0-9]", ""))
        .cast("bigint")
        .alias("n_digit"),
        F.length(F.regexp_replace(text, r"[^.,;:!?'\"()-]", ""))
        .cast("bigint")
        .alias("n_punct"),
        F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS_EN)))
        .cast("bigint")
        .alias("stop_hits"),
        F.aggregate(
            toks, F.lit(0).cast("bigint"), lambda acc, t: acc + F.length(t)
        ).alias("sum_len"),
    )
    return base.select(
        "doc_id",
        F.lit(M6).cast("bigint").alias("f0"),
        F.expr(_r6("n_alpha", "n_chars")).cast("bigint").alias("f1"),
        F.expr(_r6("n_digit", "n_chars")).cast("bigint").alias("f2"),
        F.expr(_r6("n_punct", "n_chars")).cast("bigint").alias("f3"),
        F.expr(_r6("stop_hits", "n_tok")).cast("bigint").alias("f4"),
        F.expr(
            f"least((n_tok * 1000000) div {LEN_SAT_TOKENS}, 1000000)"
        ).cast("bigint").alias("f5"),
        F.expr(
            "least("
            + _r6("sum_len", f"(n_tok * {AVG_LEN_SAT})")
            + ", 1000000)"
        ).cast("bigint").alias("f6"),
    )


def _trunc_div(v: int, den: int) -> int:
    """Sign-split truncated integer division — the ONE division semantics
    shared with the SQL oracle's CASE rendering (floor of the positive
    magnitude, sign re-applied)."""
    return -((-v) // den) if v < 0 else v // den


def train_linear_filter(
    features: DataFrame,
    labels: DataFrame,
    iters: int = CLS_ITERS,
    eta_num: int = ETA_NUM,
    eta_den: int = ETA_DEN,
    report: dict | None = None,
) -> list[int]:
    """Train the hinge-loss linear filter; returns the micro-int weight
    vector ``w6`` (len == len(FEATURES), order = feature order).

    ``labels``: ``(doc_id, y)`` with y in {+1, -1}. Each round runs ONE
    map-side-combinable aggregate; only 2K+2 BIGINTs (per-class violator
    feature sums + counts) reach the driver per round (bounded like the
    k-means bank). Pass ``report`` to receive ``violations`` (per-round
    counts) and ``n_pos``/``n_neg``.

    Input contract, enforced loudly (all checks run on the persisted
    joined frame, so they cost counts, not extra corpus scans):

    - every joined label is exactly +1 or -1 — a stray 0/NULL row would
      otherwise be a perpetual margin violator that inflates the reported
      violation counts while contributing to neither class gradient;
    - ``labels`` carries each doc_id at most once — a duplicate would fan
      the join out and silently double-count that document's gradient;
    - the labeled-doc count stays under ``GRAD_SAFE_DOCS`` — past it the
      BIGINT per-class gradient sums can wrap silently (remediation:
      DECIMAL(38,0) sums; see the constant's comment). Violators are a
      subset of labeled docs, so this one upfront check bounds every
      round's sums.
    """
    # r13: localCheckpoint, not persist — the iterative-plan law
    # (duplicate_groups precedent). Each of the CLS_ITERS round aggregates
    # re-analyzes the frame's FULL logical plan under a persist (the
    # regex-heavy doc_features tree + the label join — measured ~0.5 s
    # per round of pure driver-side replanning on a cached 20k-row
    # fixture); the checkpoint swaps in a LogicalRDD leaf so a round
    # costs one scan of the materialized blocks (~0.35 s, job latency +
    # codegen). Eager is this function's existing contract (the guard
    # aggregate below was already the materializing action).
    df = features.join(labels, "doc_id").localCheckpoint(eager=True)
    # all four contract checks from ONE aggregate over the persisted
    # frame (r12: four separate count()/distinct().count() jobs each paid
    # a scheduler round-trip; at 100 TB on an unpersisted path they were
    # four scans — this is one)
    guard = df.agg(
        F.count_if(F.col("y") == 1).alias("n_pos"),
        F.count_if(F.col("y") == -1).alias("n_neg"),
        F.count("*").alias("n_all"),
        F.countDistinct("doc_id").alias("n_ids"),
    ).collect()[0]
    n_pos, n_neg = int(guard["n_pos"]), int(guard["n_neg"])
    n_all, n_ids = int(guard["n_all"]), int(guard["n_ids"])
    if n_pos == 0 or n_neg == 0:
        raise ValueError(
            f"train_linear_filter: need both classes (n_pos={n_pos}, "
            f"n_neg={n_neg})"
        )
    if n_all != n_pos + n_neg:
        raise ValueError(
            f"train_linear_filter: {n_all - n_pos - n_neg} labeled rows "
            "have y outside {+1, -1} (each would be a perpetual margin "
            "violator contributing to neither class gradient)"
        )
    if n_all != n_ids:
        raise ValueError(
            f"train_linear_filter: labels join fanned out ({n_all} joined "
            f"rows over {n_ids} distinct doc_ids) — duplicate doc_ids in "
            "labels would double-count those documents' gradients"
        )
    if n_all > GRAD_SAFE_DOCS:
        raise ValueError(
            f"train_linear_filter: {n_all} labeled docs exceeds "
            f"GRAD_SAFE_DOCS={GRAD_SAFE_DOCS}; the BIGINT per-class "
            "gradient sums could wrap silently — switch the sums (and the "
            "SQL oracle's casts) to DECIMAL(38,0) for corpora this large"
        )
    k = len(FEATURES)
    w6 = [0] * k
    violations: list[int] = []
    thresh = M6 * M6  # margin 1.0 in the 1e-12 product scale
    # (a broadcast 1-row weights frame instead of baked literals was
    # A/B'd and REJECTED: the per-round createDataFrame + broadcast job
    # cost more than the literal re-analysis it saved — measured
    # 0.51 -> 0.62 s/round; the checkpoint above is the real fix)
    try:
        for _ in range(iters):
            dot12 = sum(
                (F.col(f"f{j}") * F.lit(int(w6[j])) for j in range(k)),
                start=F.lit(0).cast("bigint"),
            )
            viol = (F.col("y") * dot12) < thresh
            aggs = []
            for cls, tag in ((1, "p"), (-1, "n")):
                aggs += [
                    F.sum(
                        F.when(
                            viol & (F.col("y") == cls), F.col(f"f{j}")
                        ).otherwise(0)
                    ).cast("bigint").alias(f"g{tag}{j}")
                    for j in range(k)
                ]
            aggs.append(F.count_if(viol).cast("bigint").alias("nv"))
            row = df.agg(*aggs).collect()[0]
            violations.append(int(row["nv"]))
            # class-balanced mean subgradient: violating positives pull
            # each weight UP by their class-mean feature, violating
            # negatives pull it DOWN by theirs — exact trunc-div means
            for j in range(k):
                step = _trunc_div(int(row[f"gp{j}"]), n_pos) - _trunc_div(
                    int(row[f"gn{j}"]), n_neg
                )
                w6[j] = int(w6[j]) + _trunc_div(step * eta_num, eta_den)
    finally:
        # the checkpointed blocks are freed when the RDD is GC'd after
        # this frame goes out of scope (the duplicate_groups convention)
        df.unpersist()
    if report is not None:
        report["violations"] = violations
        report["n_pos"] = n_pos
        report["n_neg"] = n_neg
    return [int(v) for v in w6]


def linear_filter_scores(
    features: DataFrame, w6: list[int]
) -> DataFrame:
    """Score every feature row under trained weights: ``doc_id, score12
    BIGINT`` (the exact 1e-12-scale margin) and ``keep`` (score12 >= 0)
    — a pure map-side projection, pushdown-friendly at any scale."""
    dot12 = None
    for j, w in enumerate(w6):
        term = F.col(f"f{j}") * F.lit(int(w))
        dot12 = term if dot12 is None else dot12 + term
    return features.select(
        "doc_id",
        dot12.cast("bigint").alias("score12"),
        (dot12 >= 0).alias("keep"),
    )


# ------------------------------------------------------------------
# The graded planted-twin shape + its DuckDB renderers. Kept HERE (the
# stable_hash64_sql "adjacent definitions" convention) so the pytest
# differential (tests/test_classify.py) and the graded-entry oracle
# (__spark_entry__'s `quality_filter`) can never assert different math.

# planted low-quality twins: digit-spam suffix (the machine-generated /
# numeric-boilerplate archetype) — shifts digit_ratio from exactly 0 to
# positive and dilutes alpha/stopword mass, all replayable in SQL
SPAM_SUFFIX = " 000 111 222 333 444 555 666 777 888 999" * 4
PLANTED_NEG_BASE = 6_000_000

_SQL_TOKS = r"list_filter(string_split_regex(lower(text), '\s+'), t -> t <> '')"


def planted_corpus(docs: DataFrame) -> tuple[DataFrame, DataFrame]:
    """``documents`` + their digit-spam twins under shifted ids, plus the
    (doc_id, y) label frame: the graded/staged training shape (the
    remix-corpus precedent — the fixture's ``lang``/``source`` columns
    are content-independent random labels, verified unlearnable)."""
    base = docs.select("doc_id", "text")
    neg = base.select(
        (F.col("doc_id") + PLANTED_NEG_BASE).alias("doc_id"),
        F.concat(F.col("text"), F.lit(SPAM_SUFFIX)).alias("text"),
    )
    corpus = base.unionByName(neg)
    labels = corpus.select(
        "doc_id",
        F.when(F.col("doc_id") < PLANTED_NEG_BASE, 1).otherwise(-1).alias("y"),
    )
    return corpus, labels


def doc_features_duckdb_sql(src: str) -> str:
    """DuckDB twin of ``doc_features`` over relation ``src``
    (doc_id, text) — expression-for-expression the Spark build above."""
    stop = ", ".join(f"'{w}'" for w in STOPWORDS_EN)
    r6 = lambda num, den: (  # noqa: E731
        f"CASE WHEN {den} > 0 THEN ({num} * 1000000) // {den} ELSE 0 END"
    )
    return f"""
  SELECT doc_id,
         1000000::BIGINT AS f0,
         ({r6('n_alpha', 'n_chars')})::BIGINT AS f1,
         ({r6('n_digit', 'n_chars')})::BIGINT AS f2,
         ({r6('n_punct', 'n_chars')})::BIGINT AS f3,
         ({r6('stop_hits', 'n_tok')})::BIGINT AS f4,
         least((n_tok * 1000000) // {LEN_SAT_TOKENS}, 1000000)::BIGINT AS f5,
         least({r6('sum_len', f'(n_tok * {AVG_LEN_SAT})')}, 1000000)::BIGINT AS f6
  FROM (
    SELECT doc_id,
           len(toks)::BIGINT AS n_tok,
           length(text)::BIGINT AS n_chars,
           length(regexp_replace(text, '[^A-Za-z]', '', 'g'))::BIGINT AS n_alpha,
           length(regexp_replace(text, '[^0-9]', '', 'g'))::BIGINT AS n_digit,
           length(regexp_replace(text, '[^.,;:!?''"()-]', '', 'g'))::BIGINT AS n_punct,
           len(list_filter(toks, t -> t IN ({stop})))::BIGINT AS stop_hits,
           coalesce(list_sum(list_transform(toks, t -> length(t)::BIGINT)), 0)::BIGINT AS sum_len
    FROM (SELECT doc_id, text, {_SQL_TOKS} AS toks FROM ({src}))
  )"""


def quality_filter_duckdb_sql(iters: int = CLS_ITERS) -> str:
    """The graded-entry oracle over view ``documents``: the planted
    corpus, the feature build, EVERY balanced hinge round statically
    unrolled (per-class violator sums, trunc-div mean gradients with
    sign-split CASE), and the final map-side scores — all in ANSI SQL
    (the kmeans_lloyd statically-unrolled precedent)."""
    k = len(FEATURES)
    tdiv = lambda v, d: (  # noqa: E731
        f"CASE WHEN ({v}) >= 0 THEN ({v}) // ({d}) ELSE -((-({v})) // ({d})) END"
    )
    src = f"""SELECT doc_id, text FROM documents
UNION ALL
SELECT doc_id + {PLANTED_NEG_BASE}, text || '{SPAM_SUFFIX}' FROM documents"""
    # MATERIALIZED everywhere a CTE is referenced by every unrolled round
    # (the _bpe_train_ctes lesson: default inlining re-evaluates the whole
    # upstream chain per round — exponential plan + fd exhaustion)
    parts = [
        f"corpus AS MATERIALIZED ({src})",
        f"feats AS MATERIALIZED ({doc_features_duckdb_sql('SELECT * FROM corpus')})",
        f"lab AS (SELECT doc_id, CASE WHEN doc_id < {PLANTED_NEG_BASE} THEN 1 ELSE -1 END AS y FROM corpus)",
        "fx AS MATERIALIZED (SELECT f.*, l.y FROM feats f JOIN lab l USING (doc_id))",
        "cnt AS MATERIALIZED (SELECT count_if(y = 1)::BIGINT AS np, count_if(y = -1)::BIGINT AS nn FROM fx)",
        "w0 AS MATERIALIZED (SELECT " + ", ".join(f"0::BIGINT AS w{j}" for j in range(k)) + ")",
    ]
    for t in range(1, iters + 1):
        prev = f"w{t - 1}"
        dot = " + ".join(f"{prev}.w{j} * fx.f{j}" for j in range(k))
        gsums = ", ".join(
            f"sum(CASE WHEN viol AND y = 1 THEN f{j} ELSE 0 END)::BIGINT AS gp{j}, "
            f"sum(CASE WHEN viol AND y = -1 THEN f{j} ELSE 0 END)::BIGINT AS gn{j}"
            for j in range(k)
        )

        def _upd(j: int) -> str:
            step = (
                f"(({tdiv(f'g.gp{j}', 'cnt.np')}) - "
                f"({tdiv(f'g.gn{j}', 'cnt.nn')}))"
            )
            return (
                f"{prev}.w{j} + ({tdiv(f'{step} * {ETA_NUM}', ETA_DEN)})"
                f" AS w{j}"
            )

        newws = ", ".join(_upd(j) for j in range(k))
        parts.append(
            f"""v{t} AS (
  SELECT fx.*, (y * ({dot})) < 1000000000000 AS viol FROM fx, {prev}
),
g{t} AS MATERIALIZED (SELECT {gsums} FROM v{t}),
w{t} AS MATERIALIZED (SELECT {newws} FROM {prev}, g{t} g, cnt)"""
        )
    dot_final = " + ".join(f"w.w{j} * f.f{j}" for j in range(k))
    return (
        "WITH " + ",\n".join(parts) + f"""
SELECT f.doc_id, ({dot_final})::BIGINT AS score12,
       ({dot_final}) >= 0 AS keep
FROM feats f, w{iters} w"""
    )
