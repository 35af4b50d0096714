"""IR-metric golden + property tests (SURVEY A2-A6, W1-W4; SS5.2 items 2-3).

The golden case is hand-computed: 3 queries, k=4, with known relevance
patterns, checked against the exact reference formulas for BOTH AP@k
normalizations (bcb_utils.py:249-252 vs poj_utils.py:258-261).
"""

import pytest
from pyspark.sql import functions as F

from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.operators.evaluate import (
    detailed_results,
    ir_metrics,
    per_query_metrics,
    query_stats,
)

K = 4


def _detailed(spark):
    # query 1: relevant at ranks 1, 3   -> RR=1,   AP_num = 1/1 + 2/3
    # query 2: relevant at rank 2       -> RR=1/2, AP_num = 1/2
    # query 3: no relevant              -> RR=0,   AP_num = 0
    rows = [
        (1, 11, 0.9, 1, True),
        (1, 12, 0.8, 2, False),
        (1, 13, 0.7, 3, True),
        (1, 14, 0.6, 4, False),
        (2, 21, 0.9, 1, False),
        (2, 22, 0.8, 2, True),
        (2, 23, 0.7, 3, False),
        (2, 24, 0.6, 4, False),
        (3, 31, 0.5, 1, False),
        (3, 32, 0.4, 2, False),
        (3, 33, 0.3, 3, False),
        (3, 34, 0.2, 4, False),
    ]
    return spark.createDataFrame(
        rows, "query_id long, result_id long, score double, rank int, is_clone boolean"
    )


def test_per_query_metrics_golden(spark):
    pq = (
        per_query_metrics(_detailed(spark), k=K, ap_norm="k")
        .orderBy("query_id")
        .collect()
    )
    assert [r.success for r in pq] == [1, 1, 0]
    assert [r.precision_at_k for r in pq] == [0.5, 0.25, 0.0]
    assert [r.reciprocal_rank for r in pq] == [1.0, 0.5, 0.0]
    # POJ AP: (1 + 2/3)/4, (1/2)/4, 0 — fixed-point at 6 decimals
    assert pq[0].ap_at_k == pytest.approx(round(round((1 + 2 / 3) * 1e6) / 4) / 1e6)
    assert pq[1].ap_at_k == pytest.approx(0.125)
    assert pq[2].ap_at_k == 0.0


def test_ir_metrics_poj_golden(spark):
    m = ir_metrics(_detailed(spark), k=K, ap_norm="k").first()
    assert m.success_rate == pytest.approx(2 / 3, abs=1e-6)
    assert m.mean_precision_at_k == pytest.approx(0.25, abs=1e-6)
    assert m.mrr == pytest.approx(0.5, abs=1e-6)
    ap1 = round(round((1 + 2 / 3) * 1e6) / 4) / 1e6
    assert m.map_at_k == pytest.approx((ap1 + 0.125 + 0.0) / 3, abs=1e-6)


def test_ir_metrics_bcb_golden(spark):
    # ground-truth sizes: q1 has 2 clones total, q2 has 5 (capped to k=4), q3 none
    gt = spark.createDataFrame(
        [(1, 2), (2, 5), (3, 0)], "query_id long, gt_size long"
    )
    m = ir_metrics(_detailed(spark), k=K, ap_norm="gt", gt_sizes=gt).first()
    ap1 = round(round((1 + 2 / 3) * 1e6) / 2) / 1e6  # min(2, 4) = 2
    ap2 = round(round(0.5 * 1e6) / 4) / 1e6          # min(5, 4) = 4
    assert m.map_at_k == pytest.approx((ap1 + ap2 + 0.0) / 3, abs=1e-6)


def test_query_stats_golden(spark):
    qs = query_stats(_detailed(spark)).orderBy("query_id").collect()
    assert qs[0].avg_clone_score == pytest.approx(0.8, abs=1e-6)
    assert qs[0].avg_non_clone_score == pytest.approx(0.7, abs=1e-6)
    assert qs[0].num_clones_found == 2
    assert qs[2].avg_clone_score == 0.0  # empty group -> 0.0, reference semantics
    assert qs[2].num_non_clones_found == 4


def test_metric_bounds_on_fixture(spark, embeddings):
    from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.operators.knn import (
        self_knn,
    )

    knn = self_knn(embeddings, k=10, n_probes=50)
    detailed = detailed_results(knn, embeddings.select("vec_id", "label"), mode="label")
    m = ir_metrics(detailed, k=10, ap_norm="k").first()
    for v in (m.success_rate, m.mean_precision_at_k, m.mrr, m.map_at_k):
        assert 0.0 <= v <= 1.0
    # MRR >= MAP@k under the k-normalization (each AP term <= the RR term)
    assert m.mrr >= m.map_at_k


def test_clones_mode_relevance(spark):
    knn = spark.createDataFrame(
        [(1, 2, 0.9, 1), (1, 3, 0.8, 2)],
        "query_id long, result_id long, score double, rank int",
    )
    labels = spark.createDataFrame(
        [(1, [2])], "vec_id long, clones array<long>"
    )
    d = detailed_results(knn, labels, mode="clones").orderBy("rank").collect()
    assert [r.is_clone for r in d] == [True, False]
