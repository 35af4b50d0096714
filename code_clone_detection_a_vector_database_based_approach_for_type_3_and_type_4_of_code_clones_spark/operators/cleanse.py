"""Corpus cleaning: cross-document boilerplate-line removal
(beyond-reference extension).

Web-crawl corpora carry per-site boilerplate — cookie banners, nav bars,
"all rights reserved" footers — repeated verbatim across thousands of
pages. The C4/RefinedWeb recipe removes any LINE that occurs in more than a
small fraction of documents. That is a corpus-global statistic, so the
operator is inherently distributed: per-line document frequency is one
``groupBy(line)`` over the exploded corpus, and the removal itself is a
map-side array filter against the (small, broadcast) boilerplate set.

Scale shape: ``line_document_frequency`` shuffles once on the line hash;
the boilerplate SET (lines above the df threshold) is tiny by construction
— boilerplate is frequent, and there are few distinct frequent lines (Zipf)
— so ``remove_boilerplate_lines`` broadcasts it and the corpus itself never
shuffles. A line's identity is its trimmed text; hashing to
``stable_hash64`` first would halve shuffle width at 100 TB but costs the
oracle-visible text, so the df table keeps the text and lets Tungsten's
UnsafeRow do the compaction.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BOILERPLATE_MIN_DF = 3  # a line in >= this many docs is boilerplate


def _doc_lines(text: Column) -> Column:
    """Trimmed, non-empty lines of a document (order preserved, duplicates
    within one document kept — removal must drop every occurrence)."""
    return F.filter(
        F.transform(F.split(text, "\n"), lambda l: F.trim(l)), lambda l: l != ""
    )


def line_document_frequency(
    docs: DataFrame, doc_id: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-line document frequency across the corpus: ``line, df`` where
    ``df`` counts DISTINCT documents containing the (trimmed) line. The
    within-doc distinct happens map-side (``array_distinct`` before the
    explode), so the shuffle carries each (doc, line) once."""
    lines = F.array_distinct(_doc_lines(F.col(text_col)))
    return (
        docs.select(F.col(doc_id), F.explode(lines).alias("line"))
        .groupBy("line")
        .agg(F.count("*").cast("bigint").alias("df"))
    )


def boilerplate_lines(
    docs: DataFrame,
    min_df: int = BOILERPLATE_MIN_DF,
    doc_id: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The boilerplate set: lines whose document frequency reaches
    ``min_df``. Output: ``line, df`` — small by the Zipf argument above."""
    return line_document_frequency(docs, doc_id, text_col).filter(
        F.col("df") >= min_df
    )


def remove_boilerplate_lines(
    docs: DataFrame,
    min_df: int = BOILERPLATE_MIN_DF,
    doc_id: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Strip boilerplate lines from every document, with accounting (a
    silent cleanse is unauditable at corpus scale — same contract as
    ``redact_pii``).

    Output: ``doc_id, clean_text, n_lines, n_removed`` where ``clean_text``
    re-joins the surviving lines with ``\\n`` (line order preserved) and
    ``n_removed`` counts removed occurrences (not distinct lines).

    Physical plan: corpus scan -> broadcast left-semi-style array filter
    against the collected-as-set boilerplate lines (carried as a 1-row
    aggregated array, cross-joined broadcast — never through the driver).
    """
    bp = boilerplate_lines(docs, min_df, doc_id, text_col).agg(
        F.coalesce(F.collect_set("line"), F.array().cast("array<string>")).alias(
            "bp_lines"
        )
    )
    lines = _doc_lines(F.col(text_col))
    with_bp = docs.select(F.col(doc_id), lines.alias("lines")).crossJoin(
        F.broadcast(bp)
    )
    kept = F.filter(F.col("lines"), lambda l: ~F.array_contains(F.col("bp_lines"), l))
    return with_bp.select(
        F.col(doc_id),
        F.array_join(kept, "\n").alias("clean_text"),
        F.size("lines").cast("bigint").alias("n_lines"),
        (F.size("lines") - F.size(kept)).cast("bigint").alias("n_removed"),
    )
