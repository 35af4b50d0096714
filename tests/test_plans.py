"""End-to-end pipeline tests (SURVEY SS3): BCB and POJ on synthetic inputs,
scalability sweep on the embeddings fixture."""

import os

import pytest
from pyspark.sql import functions as F

from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.plans.bcb import (
    bcb_pipeline,
)
from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.plans.poj import (
    poj_pipeline,
)
from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.plans.scalability import (
    scalability_sweep,
)


@pytest.fixture()
def bcb_inputs(spark, tmp_path):
    # 3 clone clusters over 9 functions; function i lives in file f{i}.java
    pairs = [(1, 2), (2, 3), (4, 5), (6, 7), (7, 8), (8, 9)]
    clones_csv = tmp_path / "CLONES.csv"
    clones_csv.write_text(
        "FUNCTION_ID_ONE,FUNCTION_ID_TWO\n"
        + "\n".join(f"{a},{b}" for a, b in pairs)
        + "\n"
    )
    funcs_csv = tmp_path / "FUNCTIONS.csv"
    funcs_csv.write_text(
        "ID,NAME,STARTLINE,ENDLINE\n"
        + "\n".join(f"{i},f{i}.java,1,2" for i in range(1, 10))
        + "\n"
    )
    lines = spark.createDataFrame(
        [(f"f{i}.java", ln, f"code of function {i} line {ln} cluster {(i - 1) // 3}")
         for i in range(1, 10) for ln in (1, 2)],
        "name string, line_no long, line string",
    )
    return str(clones_csv), str(funcs_csv), lines


def test_bcb_pipeline_end_to_end(spark, bcb_inputs):
    clones_csv, funcs_csv, lines = bcb_inputs
    res = bcb_pipeline(
        spark, clones_csv, funcs_csv, lines, num_samples=9, k=4
    )
    assert res.corpus.count() == 9
    corpus_row = res.corpus.filter(F.col("func_id") == 1).first()
    assert "code of function 1 line 1" in corpus_row.code_contents
    m = res.metrics.first()
    for v in (m.success_rate, m.mean_precision_at_k, m.mrr, m.map_at_k):
        assert 0.0 <= v <= 1.0
    # detailed output never contains a self-match (P3)
    assert res.detailed.filter(F.col("query_id") == F.col("result_id")).count() == 0


def test_bcb_pipeline_index_reuse(spark, bcb_inputs, tmp_path):
    clones_csv, funcs_csv, lines = bcb_inputs
    idx = str(tmp_path / "vector_index")
    bcb_pipeline(spark, clones_csv, funcs_csv, lines, index_path=idx,
                 num_samples=4, k=3)
    assert os.path.isdir(idx)
    # second run hits the existing index (S7 create-if-absent)
    res2 = bcb_pipeline(spark, clones_csv, funcs_csv, lines, index_path=idx,
                        num_samples=4, k=3)
    assert res2.metrics.first() is not None


def test_poj_pipeline_end_to_end(spark, tmp_path):
    for cls in ("10", "20"):
        d = tmp_path / "poj" / cls
        d.mkdir(parents=True)
        for i in range(4):
            (d / f"s{i}.txt").write_text(
                f"solution {i} for problem {cls} "
                + ("sort the array quickly " if cls == "10" else "count the primes ")
                * 5
            )
    res = poj_pipeline(spark, str(tmp_path / "poj"), num_samples=8, k=3)
    assert res.corpus.count() == 8
    m = res.metrics.first()
    assert 0.0 <= m.success_rate <= 1.0
    # same-class texts are near-identical under the hash embedder, so the
    # top results should mostly be same-class (type-4 semantics, P5)
    assert m.mean_precision_at_k > 0.5


def test_scalability_sweep_shape(spark, embeddings):
    out = scalability_sweep(
        spark, embeddings, sizes=(50, 100), k=5, n_queries=3
    ).collect()
    assert [r.size for r in out] == [50, 100]
    assert all(r.ingest_seconds > 0 and r.avg_query_time_seconds > 0 for r in out)
    # B2 memory columns: absolute used-heap is positive and sane; the
    # delta is best-effort (GC may make it negative) but always present
    import math

    assert all(r.heap_used_mb > 0 and not math.isnan(r.heap_used_mb) for r in out)
    assert all(not math.isnan(r.ingest_heap_delta_mb) for r in out)
