"""Corpus construction: clone adjacency, metadata join, snippet extraction
(SURVEY SS2.2-2.3: P1/P2/P6, J1/J3, A1, S4/F5, F1).

The reference builds these structures with driver-side dicts and an O(n*m)
per-row pandas rescan (bcb_utils.py:12-73). Each becomes a single shuffle-
or broadcast-join stage here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.ids import uuid5_udf


def build_clone_map(pairs: DataFrame, a: str = "function_id_one",
                    b: str = "function_id_two") -> DataFrame:
    """Symmetric closure + set aggregation (SURVEY J3 + A1).

    The reference loops over CLONES.csv rows inserting both orientations
    into a dict of Python sets (bcb_utils.py:24-33). Spark form: union of
    both orientations -> ``collect_set`` — one shuffle on ``func_id``,
    map-side partial aggregation for free. The array is sorted so output is
    deterministic (Python set order is not a semantic).

    Output: ``func_id BIGINT, clones ARRAY<BIGINT>``.
    """
    fwd = pairs.select(F.col(a).alias("func_id"), F.col(b).alias("clone_id"))
    rev = pairs.select(F.col(b).alias("func_id"), F.col(a).alias("clone_id"))
    return (
        fwd.unionByName(rev)
        .groupBy("func_id")
        .agg(F.array_sort(F.collect_set("clone_id")).alias("clones"))
    )


def extract_snippets(functions: DataFrame, source_lines: DataFrame) -> DataFrame:
    """Line-range snippet extraction (SURVEY S4/F5).

    The reference reads each file and slices ``readlines()[start:end]``
    (bcb_utils.py:61-65) — which, with BCB's 1-based inclusive metadata,
    drops the first line (SURVEY SS0 quirk). This engine implements the
    INTENDED semantics: 1-based inclusive ``[startline, endline]``.

    Spark form: join file lines on the range predicate, then order-preserving
    ``concat_ws("\\n", ...)``. The range join on ``name`` is an equi-join on
    the file path plus a residual line-range filter, so Catalyst plans a hash
    join, not a cartesian; at 100 TB the lines table would be bucketed by
    ``name``.

    Output: ``id, name, snippet``.
    """
    fx = functions.select("id", "name", "startline", "endline")
    joined = fx.join(source_lines, "name").filter(
        F.col("line_no").between(F.col("startline"), F.col("endline"))
    )
    return (
        joined.groupBy("id", "name")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("line_no"), F.col("line")))
                    ),
                    lambda s: s["line"],
                ),
                "\n",
            ).alias("snippet")
        )
    )


def build_corpus(
    clone_map: DataFrame,
    functions: DataFrame,
    source_lines: DataFrame,
) -> DataFrame:
    """BCB corpus assembly (SURVEY SS3.1 step 5; bcb_utils.py:36-73).

    Clone-map entries are enriched with function metadata via a broadcast
    hash equi-join (the reference's per-row pandas scan P2 -> J1), snippets
    are extracted, ids are UUIDv5 of the function id (F1). Rows whose
    metadata or file content is missing are DROPPED — the reference's silent
    ``try/except`` (P6) made explicit: inner joins express exactly
    "keep rows where both lookups succeed".

    Output: ``code_uuid, func_id, code_contents, clones, is_base64``.
    ``is_base64`` mirrors the reference's point-payload flag
    (bcb_utils.py:111, always False there too: contents are stored
    decoded) — carried so an index row is payload-complete for a consumer
    migrating off the reference.
    """
    snippets = extract_snippets(functions, source_lines)
    return (
        clone_map.join(
            F.broadcast(functions.select(F.col("id").alias("func_id"))), "func_id"
        )
        .join(snippets.withColumnRenamed("id", "func_id"), "func_id")
        .select(
            uuid5_udf(F.col("func_id").cast("string")).alias("code_uuid"),
            "func_id",
            F.col("snippet").alias("code_contents"),
            "clones",
            F.lit(False).alias("is_base64"),
        )
    )


def dropped_row_count(clone_map: DataFrame, corpus: DataFrame) -> DataFrame:
    """P6 made countable: how many clone-map entries failed enrichment."""
    return clone_map.select(F.count("*").alias("n")).crossJoin(
        corpus.select(F.count("*").alias("kept"))
    ).select((F.col("n") - F.col("kept")).alias("dropped"))
