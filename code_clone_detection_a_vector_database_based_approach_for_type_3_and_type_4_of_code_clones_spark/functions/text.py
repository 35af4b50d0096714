"""Text-analysis column functions (beyond-reference extension, BASELINE.json
north star: "LLM-data-pipeline operators ... text analysis").

Everything here is a pure Catalyst expression (whole-stage codegen, no Python
workers) and every formula has an exact ANSI-SQL rendering so the DuckDB
oracle can replay it. The building block for anything hash-shaped is
``stable_hash64`` (SHA-256-derived, engine-portable) from ``.ids``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .ids import stable_hash64

FINGERPRINT_MOD = 1_000_000_007  # 30-bit prime: (31*h + t) stays in 36 bits, no overflow in either engine

# Tiny embedded stopword lists for the language-ID heuristic. A real
# deployment would swap in fastText/CLD3 via a pandas UDF; the heuristic is
# the deterministic, dependency-free, oracle-checkable baseline.
STOPWORDS_EN = ("the", "a", "of", "and", "to", "in", "is", "it", "that", "for")
STOPWORDS_FR = ("le", "la", "de", "et", "un", "une", "est", "que", "pour", "dans")
STOPWORDS_DE = ("der", "die", "das", "und", "ist", "ein", "eine", "zu", "den", "von")
STOPWORDS_ES = ("el", "la", "de", "y", "que", "en", "un", "una", "es", "para")
LANG_STOPWORDS = {"en": STOPWORDS_EN, "fr": STOPWORDS_FR, "de": STOPWORDS_DE, "es": STOPWORDS_ES}


def _isin_pred(words: tuple[str, ...]):
    """Single-argument lambda factory for higher-order functions (Spark
    infers HOF arity from the Python signature, so default-arg captures
    would be misread as (element, index) lambdas)."""
    return lambda t: t.isin(*words)


def tokens(text: Column) -> Column:
    """Whitespace tokenization with empty-token removal (lowercased)."""
    return F.filter(F.split(F.lower(text), r"\s+"), lambda t: t != "")


BPE_PATTERN = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]+"


def bpe_tokens(text: Column) -> Column:
    """BPE-ish regex tokenization: letter runs / digit runs / symbol runs
    (the GPT-2 pre-tokenizer's character-class split, without byte-level
    merges). The subword-ish unit count a training pipeline budgets by;
    pattern is portable Java-regex/RE2 so the oracle can replay it."""
    return F.regexp_extract_all(F.lower(text), F.lit(BPE_PATTERN), 0)


def token_chunks(toks: Column, size: int = 50, stride: int = 40) -> Column:
    """Overlapping token windows for training-sample preparation: chunk
    ``idx`` covers tokens ``[idx*stride, idx*stride + size)`` (so
    ``size - stride`` tokens of overlap carry context across chunk
    boundaries — the standard long-document windowing for LM training).
    Chunk starts cover every token at least once; a final sub-stride tail
    is absorbed by the preceding chunk's overlap. Empty docs yield no
    chunks. Pure array expressions (sequence -> transform -> slice) — one
    pass, no explode until the caller chooses to.

    Output: ``array<struct<chunk_idx int, chunk_text string>>``.
    """
    n = F.size(toks)
    starts = F.when(
        n > 0, F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0)), F.lit(stride))
    ).otherwise(F.array().cast("array<int>"))
    return F.transform(
        starts,
        lambda s, i: F.struct(
            i.cast("int").alias("chunk_idx"),
            F.array_join(F.slice(toks, s + 1, size), " ").alias("chunk_text"),
        ),
    )


# portable Java-regex/RE2 patterns (no lookaround, no backrefs) so the SQL
# oracle replays them byte-for-byte
EMAIL_PATTERN = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
LONG_DIGITS_PATTERN = r"[0-9]{6,}"


def redact_pii(text: Column) -> dict[str, Column]:
    """Best-effort PII scrubbing for corpus preparation: replace email
    addresses and long digit runs (phone/account/id numbers) with typed
    placeholders, and count what was redacted so the scrub is observable
    (a silent scrub is unauditable at corpus scale).

    Returns ``{"redacted", "n_emails", "n_numbers"}`` columns.
    """
    return {
        "redacted": F.regexp_replace(
            F.regexp_replace(text, EMAIL_PATTERN, "<EMAIL>"),
            LONG_DIGITS_PATTERN,
            "<NUM>",
        ),
        "n_emails": F.size(F.regexp_extract_all(text, F.lit(EMAIL_PATTERN), 0)).cast(
            "bigint"
        ),
        "n_numbers": F.size(
            F.regexp_extract_all(text, F.lit(LONG_DIGITS_PATTERN), 0)
        ).cast("bigint"),
    }


def word_shingles(toks: Column, n: int = 3) -> Column:
    """n-token shingles (space-joined sliding windows) — the unit of MinHash
    near-dup detection. Empty array when the doc has < n tokens."""
    return F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (n - 1)),
            lambda i: F.array_join(F.slice(toks, i, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))


def char_ngrams(text: Column, n: int = 5) -> Column:
    """Character n-grams of the raw string (for n-gram Jaccard)."""
    t = text.cast("string")
    return F.when(
        F.length(t) >= n,
        F.transform(
            F.sequence(F.lit(1), F.length(t) - (n - 1)),
            lambda i: F.substring(t, i, n).substr(F.lit(1), F.lit(n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def token_stats(text: Column) -> dict[str, Column]:
    """Token counting (whitespace + punctuation-aware char classes)."""
    toks = tokens(text)
    n_tok = F.size(toks)
    n_chars = F.length(text)
    return {
        "n_tokens": n_tok.cast("bigint"),
        "n_chars": n_chars.cast("bigint"),
        "avg_token_len": F.when(
            n_tok > 0,
            F.aggregate(toks, F.lit(0.0), lambda acc, t: acc + F.length(t)) / n_tok,
        ).otherwise(F.lit(0.0)),
        "n_alpha": F.length(F.regexp_replace(text, r"[^A-Za-z]", "")).cast("bigint"),
        "n_digit": F.length(F.regexp_replace(text, r"[^0-9]", "")).cast("bigint"),
        "n_punct": F.length(F.regexp_replace(text, r"[^.,;:!?'\"()-]", "")).cast("bigint"),
    }


def quality_score(text: Column) -> Column:
    """Heuristic document quality in [0, 1]: blend of length saturation,
    alphabetic ratio, and English stopword coverage. Deterministic and
    SQL-replayable; thresholds follow common pretraining-data heuristics
    (Gopher/C4-style length + symbol-ratio filters)."""
    s = token_stats(text)
    toks = tokens(text)
    n_tok = s["n_tokens"]
    len_score = F.least(n_tok.cast("double") / F.lit(100.0), F.lit(1.0))
    alpha_ratio = F.when(
        s["n_chars"] > 0, s["n_alpha"].cast("double") / s["n_chars"]
    ).otherwise(F.lit(0.0))
    stop_hits = F.size(F.filter(toks, _isin_pred(STOPWORDS_EN)))
    stop_ratio = F.when(n_tok > 0, stop_hits.cast("double") / n_tok).otherwise(F.lit(0.0))
    stop_score = F.least(stop_ratio / F.lit(0.2), F.lit(1.0))
    return F.round(
        F.lit(0.4) * len_score + F.lit(0.4) * alpha_ratio + F.lit(0.2) * stop_score, 6
    )


def language_id(text: Column) -> Column:
    """n-gram/stopword-heuristic language ID over {en, fr, de, es}; returns
    the language with the highest stopword-hit count, 'und' when no hits.
    Ties break by fixed language order (en, fr, de, es)."""
    toks = tokens(text)
    hits = {
        lang: F.size(F.filter(toks, _isin_pred(sw)))
        for lang, sw in LANG_STOPWORDS.items()
    }
    best = F.greatest(*hits.values())
    out = F.lit("und")
    # reversed so that, after chaining, earlier languages win ties
    for lang in reversed(list(LANG_STOPWORDS)):
        out = F.when((best > 0) & (hits[lang] == best), F.lit(lang)).otherwise(out)
    return out


def doc_fingerprint(text: Column) -> Column:
    """Order-sensitive rolling-hash fingerprint of the token stream:
    left fold of ``h -> (31*h + stable_hash64(token) % P) % P``. Two docs with
    the same token sequence collide; any reordering almost surely does not.
    """
    toks = tokens(text)
    p = F.lit(FINGERPRINT_MOD)
    return F.aggregate(
        toks,
        F.lit(0).cast("bigint"),
        lambda acc, t: (acc * 31 + stable_hash64(t) % p) % p,
    )


def repetition_stats(text: Column) -> dict[str, Column]:
    """Intra-document repetition signals (Gopher/RefinedWeb-style quality
    filters): duplicated word-3-gram mass within one document. High ratios
    flag boilerplate/spam docs a training pipeline should drop. Pure
    column expressions — map-only, no shuffle, no UDF. (The companion
    top-token fraction needs a per-token count and lives in the query as
    an explode + two-stage agg — the scalable form; an expression version
    would be O(distinct x tokens) per doc.)

    Scale note: selecting several of these columns in ONE flat projection
    re-inlines the tokenize/shingle subtrees per reference (higher-order
    lambdas defeat codegen subexpression elimination); hot-path consumers
    should materialize ``toks``/``sh`` behind a Generate barrier first —
    see ``q_repetition_stats`` in ``__spark_entry__.py``."""
    toks = tokens(text)
    sh = word_shingles(toks, 3)
    n_sh = F.size(sh)
    n_uniq = F.size(F.array_distinct(sh))
    return {
        "n_tokens": F.size(toks).cast("bigint"),
        "n_shingles": n_sh.cast("bigint"),
        "n_distinct_shingles": n_uniq.cast("bigint"),
        "dup_shingle_ratio": F.when(
            n_sh > 0, F.round(F.lit(1.0) - n_uniq / n_sh.cast("double"), 6)
        ).otherwise(F.lit(0.0)),
    }


def quality_gate_columns(
    text: Column,
    quality_min: float = 0.25,
    max_dup_shingle_ratio: float = 0.5,
) -> dict[str, Column]:
    """THE quality-gate expressions, defined once: ``quality``,
    ``dup_shingle_ratio``, and the ``quality_ok`` conjunction with the
    standard thresholds. Shared by the batch funnel's stage 4
    (plans/corpus_prep.py), the streaming annotator
    (streaming/export_stream.quality_annotate_stream), and their parity
    test — one definition, so the stream's "identical plan" claim cannot
    silently drift from the funnel's verdicts (r5 review finding)."""
    q = quality_score(text)
    dsr = repetition_stats(text)["dup_shingle_ratio"]
    return {
        "quality": q,
        "dup_shingle_ratio": dsr,
        "quality_ok": (q >= F.lit(float(quality_min)))
        & (dsr <= F.lit(float(max_dup_shingle_ratio))),
    }
