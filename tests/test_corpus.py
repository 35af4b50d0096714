"""Corpus-construction tests (SURVEY J1/J3/A1, S4/F5, P6)."""

import uuid

from pyspark.sql import functions as F

from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.operators.corpus import (
    build_clone_map,
    build_corpus,
    extract_snippets,
)


def test_clone_map_symmetric_closure(spark):
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 2)],  # duplicate pair must dedup (set semantics)
        "function_id_one long, function_id_two long",
    )
    cm = {r.func_id: r.clones for r in build_clone_map(pairs).collect()}
    assert cm == {1: [2], 2: [1, 3], 3: [2]}


def test_extract_snippets_one_based_inclusive(spark):
    functions = spark.createDataFrame(
        [(10, "f.java", 2, 3)], "id long, name string, startline long, endline long"
    )
    lines = spark.createDataFrame(
        [("f.java", 1, "l1"), ("f.java", 2, "l2"), ("f.java", 3, "l3"), ("f.java", 4, "l4")],
        "name string, line_no long, line string",
    )
    out = extract_snippets(functions, lines).first()
    # INTENDED 1-based inclusive semantics (the reference's [start:end] slice
    # drops the first line — documented divergence, SURVEY SS0)
    assert out.snippet == "l2\nl3"


def test_extract_snippets_preserves_line_order(spark):
    functions = spark.createDataFrame(
        [(1, "g.java", 1, 3)], "id long, name string, startline long, endline long"
    )
    # lines arrive shuffled; output must be in line_no order
    lines = spark.createDataFrame(
        [("g.java", 3, "c"), ("g.java", 1, "a"), ("g.java", 2, "b")],
        "name string, line_no long, line string",
    )
    assert extract_snippets(functions, lines).first().snippet == "a\nb\nc"


def test_build_corpus_drops_unresolvable_rows(spark):
    pairs = spark.createDataFrame(
        [(1, 2), (3, 99)], "function_id_one long, function_id_two long"
    )
    clone_map = build_clone_map(pairs)  # funcs 1,2,3,99
    functions = spark.createDataFrame(
        [(1, "f.java", 1, 1), (2, "f.java", 2, 2), (3, "missing.java", 1, 1)],
        "id long, name string, startline long, endline long",
    )  # 99 has no metadata; 3 points at a file with no lines
    lines = spark.createDataFrame(
        [("f.java", 1, "x"), ("f.java", 2, "y")],
        "name string, line_no long, line string",
    )
    corpus = build_corpus(clone_map, functions, lines)
    got = {r.func_id: r for r in corpus.collect()}
    # 99 (no metadata) and 3 (no file content) dropped — P6 made explicit
    assert set(got) == {1, 2}
    assert got[1].code_contents == "x"
    assert got[1].clones == [2]
    assert got[1].code_uuid == str(uuid.uuid5(uuid.NAMESPACE_DNS, "1"))
