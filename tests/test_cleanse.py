"""Boilerplate-line removal tests: df thresholding, every-occurrence
removal, accounting, order preservation, and the no-boilerplate identity."""

from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.operators.cleanse import (
    boilerplate_lines,
    line_document_frequency,
    remove_boilerplate_lines,
)

HDR = "subscribe to our newsletter"
FTR = "all rights reserved"


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_line_document_frequency_counts_docs_not_occurrences(spark):
    docs = _docs(
        spark,
        [
            (0, f"{HDR}\nunique zero\n{HDR}"),  # HDR twice in ONE doc
            (1, f"{HDR}\nunique one"),
            (2, "unique two"),
        ],
    )
    df = {r.line: r.df for r in line_document_frequency(docs).collect()}
    assert df[HDR] == 2  # two documents, not three occurrences
    assert df["unique zero"] == 1


def test_boilerplate_threshold_and_removal(spark):
    docs = _docs(
        spark,
        [
            (0, f"{HDR}\nbody zero\n{FTR}"),
            (1, f"{HDR}\nbody one"),
            (2, f"{HDR}\nbody two\n{FTR}"),
            (3, "body three"),
        ],
    )
    bp = {r.line for r in boilerplate_lines(docs, min_df=3).collect()}
    assert bp == {HDR}  # FTR has df 2 < 3

    out = {r.doc_id: r for r in remove_boilerplate_lines(docs, min_df=3).collect()}
    assert out[0].clean_text == f"body zero\n{FTR}"
    assert (out[0].n_lines, out[0].n_removed) == (3, 1)
    assert out[3].clean_text == "body three" and out[3].n_removed == 0


def test_removal_drops_every_occurrence_and_preserves_order(spark):
    docs = _docs(
        spark,
        [
            (0, f"{HDR}\nalpha\n{HDR}\nbeta"),
            (1, HDR),
            (2, f"x\n{HDR}"),
        ],
    )
    out = {r.doc_id: r for r in remove_boilerplate_lines(docs, min_df=3).collect()}
    assert out[0].clean_text == "alpha\nbeta"  # both occurrences gone, order kept
    assert out[0].n_removed == 2
    assert out[1].clean_text == "" and out[1].n_removed == 1  # all-boilerplate doc


def test_no_boilerplate_is_identity_on_lines(spark):
    docs = _docs(spark, [(0, "aa\nbb"), (1, "cc")])
    out = {r.doc_id: r for r in remove_boilerplate_lines(docs, min_df=2).collect()}
    assert out[0].clean_text == "aa\nbb" and out[0].n_removed == 0
    assert out[1].clean_text == "cc"


def test_trimming_and_blank_lines(spark):
    """Lines compare trimmed; blank lines don't count and don't survive."""
    docs = _docs(
        spark,
        [(0, f"  {HDR}  \n\nkeep me"), (1, HDR), (2, f"{HDR}\nother")],
    )
    out = {r.doc_id: r for r in remove_boilerplate_lines(docs, min_df=3).collect()}
    assert out[0].clean_text == "keep me"
    assert out[0].n_lines == 2  # blank line never counted


def test_boilerplate_plan_shape(spark):
    """The corpus never shuffles for the removal itself: one Exchange for
    the line-df aggregation, the boilerplate set comes back via a
    broadcast (1-row) join, and no CartesianProduct appears."""
    docs = _docs(spark, [(0, f"{HDR}\nbody"), (1, HDR), (2, HDR)])
    df = remove_boilerplate_lines(docs, min_df=3)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" in plan  # the 1-row set attach
    assert plan.count("Exchange") <= 3  # df agg (partial+final) + broadcast
