"""CLI entry-point tests (``python -m <package>``) — the reference's
``main.py`` argument surface driven end-to-end on synthetic on-disk inputs."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.__main__ import (  # noqa: E402
    run,
)


@pytest.fixture()
def bcb_disk_inputs(tmp_path):
    pairs = [(1, 2), (2, 3), (4, 5), (6, 7), (7, 8), (8, 9)]
    clones_csv = tmp_path / "CLONES.csv"
    clones_csv.write_text(
        "FUNCTION_ID_ONE,FUNCTION_ID_TWO\n"
        + "\n".join(f"{a},{b}" for a, b in pairs) + "\n"
    )
    funcs_csv = tmp_path / "FUNCTIONS.csv"
    # absolute-path NAMEs, like the reference metadata — the CLI joins on
    # basenames
    funcs_csv.write_text(
        "ID,NAME,STARTLINE,ENDLINE\n"
        + "\n".join(f"{i},C:\\data\\src\\f{i}.java,1,2" for i in range(1, 10))
        + "\n"
    )
    src = tmp_path / "src"
    src.mkdir()
    for i in range(1, 10):
        (src / f"f{i}.java").write_text(
            f"code of function {i} line 1 cluster {(i - 1) // 3}\n"
            f"code of function {i} line 2 cluster {(i - 1) // 3}\n"
        )
    return str(clones_csv), str(funcs_csv), str(src)


def test_cli_bcb_end_to_end(spark, tmp_path, bcb_disk_inputs):
    clones_csv, funcs_csv, src = bcb_disk_inputs
    out_dir = tmp_path / "results"
    out_dir.mkdir()
    res = run([
        "--dataset", "bcb",
        "--clones_csv", clones_csv,
        "--functions_csv", funcs_csv,
        "--source_dir", src,
        "--num_samples", "9",
        "--k", "4",
        "--normalized",
        "--index_path", str(tmp_path / "bcb_index"),
        "--output_dir", str(out_dir),
    ])
    m = res["metrics"]
    for key in ("success_rate", "mean_precision_at_k", "mrr", "map_at_k"):
        assert 0.0 <= m[key] <= 1.0
    assert m["success_rate"] > 0  # clusters share text -> some hits
    assert os.path.exists(res["detailed"])
    assert os.path.exists(res["stats"])
    # create-if-absent: second run reuses the index (S7) and reproduces
    # identical metrics (deterministic sample + hash embedder)
    res2 = run([
        "--dataset", "bcb",
        "--clones_csv", clones_csv,
        "--functions_csv", funcs_csv,
        "--source_dir", src,
        "--num_samples", "9",
        "--k", "4",
        "--normalized",
        "--index_path", str(tmp_path / "bcb_index"),
        "--output_dir", str(out_dir),
    ])
    assert res2["metrics"] == m


def test_cli_poj_end_to_end(spark, tmp_path):
    root = tmp_path / "poj"
    for cls in ("1", "2"):
        d = root / cls
        d.mkdir(parents=True)
        for j in range(4):
            (d / f"{j}.txt").write_text(
                f"problem {cls} solution {j} shared class body {cls}"
            )
    out_dir = tmp_path / "results"
    out_dir.mkdir()
    res = run([
        "--dataset", "poj",
        "--poj_dir", str(root),
        "--num_samples", "8",
        "--k", "3",
        "--output_dir", str(out_dir),
    ])
    m = res["metrics"]
    for key in ("success_rate", "mean_precision_at_k", "mrr", "map_at_k"):
        assert 0.0 <= m[key] <= 1.0
    assert os.path.exists(res["detailed"])


def test_cli_missing_args_fail_fast():
    with pytest.raises(SystemExit):
        run(["--dataset", "bcb"])  # no paths
    with pytest.raises(SystemExit):
        run(["--dataset", "poj"])  # no poj_dir


def test_cli_unknown_model_fails_fast():
    """--model is validated against the catalog (embedding_models.yml
    parity) BEFORE any Spark work; --allow-any-model bypasses, matching the
    reference's accept-any-HF-id runtime behavior."""
    with pytest.raises(SystemExit, match="model catalog"):
        run(["--dataset", "poj", "--model", "no-such-model-xyz"])
    # bypass flag skips catalog validation and proceeds to the next check
    # (missing --poj_dir), proving validation itself was the gate above
    with pytest.raises(SystemExit, match="poj_dir"):
        run(["--dataset", "poj", "--model", "no-such-model-xyz",
             "--allow-any-model"])


def test_model_catalog_registry():
    from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.functions.models import (
        MODEL_CATALOG,
        model_info,
    )

    # the reference catalog (embedding_models.yml:1-74) + the builtin
    assert len(MODEL_CATALOG) == 25
    code_models = [m for m in MODEL_CATALOG.values() if m.kind == "code"]
    assert [m.name for m in code_models] == ["jinaai/jina-embeddings-v2-base-code"]
    assert model_info("bge-large-en-v1.5").num_params_m == 335
    assert model_info("hash").kind == "builtin"
    with pytest.raises(KeyError, match="known models"):
        model_info("nope")


def test_cli_corpus_end_to_end(spark, tmp_path, sf_dir):
    """--dataset corpus: the training-data lifecycle (prep funnel ->
    leakage-safe split -> sharded export) driven from the CLI against the
    sf0.001 documents fixture."""
    out_dir = tmp_path / "shipped"
    out_dir.mkdir()
    res = run([
        "--dataset", "corpus",
        "--docs_parquet", f"{sf_dir}/documents.parquet",
        "--output_dir", str(out_dir),
        "--n_shards", "4",
        "--train_frac", "0.8", "--val_frac", "0.1", "--test_frac", "0.1",
    ])
    acc = res["accounting"]
    assert acc["n_input"] > 0
    assert sum(res["per_split"].values()) == acc["n_sampled"]
    for name, path in res["written"].items():
        back = spark.read.parquet(path)
        assert back.count() == res["per_split"].get(name, 0)
        assert {"doc_id", "text", "shard"} <= set(back.columns)


def test_cli_corpus_substring_mode(spark, tmp_path, sf_dir):
    """--substring_run_n threads through prepare_and_ship into the funnel:
    the accounting gains the substring column (zero on the fixture corpus
    at a run length its short docs cannot reach is fine — presence and
    plumbing are the contract here; exactness is pinned in
    test_corpus_prep.py)."""
    out_dir = tmp_path / "shipped_substr"
    out_dir.mkdir()
    res = run([
        "--dataset", "corpus",
        "--docs_parquet", f"{sf_dir}/documents.parquet",
        "--output_dir", str(out_dir),
        "--n_shards", "2",
        "--substring_run_n", "8",
    ])
    acc = res["accounting"]
    assert "n_substr_tokens_removed" in acc
    assert acc["n_substr_tokens_removed"] >= 0
    assert sum(res["per_split"].values()) == acc["n_sampled"]


def test_cli_corpus_quality_filter_mode(spark, tmp_path, sf_dir):
    """--quality_train_parquet threads through prepare_and_ship into the
    funnel's learned-filter stage: a labeled frame (fixture docs as
    positives, digit-spam twins as negatives) trains the hinge filter,
    the accounting gains n_qualfilter_kept, and the clean fixture corpus
    survives the gate (exact separation is pinned in test_classify /
    test_corpus_prep; presence and plumbing are the contract here)."""
    from pyspark.sql import functions as F

    out_dir = tmp_path / "shipped_qual"
    out_dir.mkdir()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    spam = " 000 111 222 333 444 555 666 777 888 999" * 4
    train = (
        docs.limit(50).select("doc_id", "text", F.lit(1).alias("y"))
        .unionByName(
            docs.limit(50).select(
                (F.col("doc_id") + 7_000_000).alias("doc_id"),
                F.concat(F.col("text"), F.lit(spam)).alias("text"),
                F.lit(-1).alias("y"),
            )
        )
    )
    train_path = str(tmp_path / "qual_train.parquet")
    train.write.parquet(train_path)
    res = run([
        "--dataset", "corpus",
        "--docs_parquet", f"{sf_dir}/documents.parquet",
        "--output_dir", str(out_dir),
        "--n_shards", "2",
        "--quality_train_parquet", train_path,
    ])
    acc = res["accounting"]
    assert "n_qualfilter_kept" in acc
    assert acc["n_qualfilter_kept"] > 0  # the clean corpus passes the gate
    assert sum(res["per_split"].values()) == acc["n_sampled"]


def test_cli_corpus_missing_args_fail_fast():
    with pytest.raises(SystemExit, match="docs_parquet"):
        run(["--dataset", "corpus"])


def test_cli_scalability_sweep(spark, tmp_path, sf_dir):
    """--scalability_test (reference main3.py:23): timed ingest + search
    per corpus size, the reference's two CSVs written to --output_dir."""
    out_dir = tmp_path / "sweep"
    out_dir.mkdir()
    res = run([
        "--scalability_test",
        "--vectors_parquet", f"{sf_dir}/embeddings.parquet",
        "--sizes", "20,50",
        "--n_queries", "3",
        "--k", "5",
        "--output_dir", str(out_dir),
    ])
    assert [r["size"] for r in res["sweep"]] == [20, 50]
    for r in res["sweep"]:
        assert r["ingest_seconds"] > 0
        assert r["avg_query_time_seconds"] > 0
    times = spark.read.option("header", True).csv(res["query_times"])
    assert times.columns == ["size", "avg_query_time_seconds"]
    assert times.count() == 2
    memory = spark.read.option("header", True).csv(res["memory"])
    assert memory.columns == [
        "size", "ingest_seconds", "ingest_heap_delta_mb", "heap_used_mb"
    ]
    assert memory.count() == 2


def test_cli_scalability_missing_args_fail_fast():
    with pytest.raises(SystemExit, match="vectors_parquet"):
        run(["--scalability_test"])
