"""Source/sink tests (SURVEY S1-S7, F3, M2)."""

import os

from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.sources.csv_io import (
    read_clones_csv,
    read_functions_csv,
    write_results_csv,
)
from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.sources.files import (
    poj_directory_source,
    source_lines_from_files,
)
from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.sources.index import (
    index_exists,
    load_index,
    write_index,
)


def _mk_poj_tree(root):
    for cls, files in {
        "1": {"a.txt": "int main() { return 0; }", "b.txt": "print hello"},
        "2": {"c.txt": "for loop here"},
    }.items():
        d = os.path.join(root, cls)
        os.makedirs(d, exist_ok=True)
        for name, text in files.items():
            with open(os.path.join(d, name), "w") as f:
                f.write(text)
    # non-UTF8 file exercises the charset-tolerant decode (M2)
    with open(os.path.join(root, "2", "latin.txt"), "wb") as f:
        f.write("café résumé".encode("latin-1"))
    # non-matching suffix must be ignored by the glob (S2)
    with open(os.path.join(root, "2", "ignored.md"), "w") as f:
        f.write("not code")


def test_poj_directory_source(spark, tmp_path):
    _mk_poj_tree(str(tmp_path))
    df = poj_directory_source(spark, str(tmp_path))
    rows = {(r.clone_type, r.code_name): r.code_contents for r in df.collect()}
    assert ("1", "a.txt") in rows and rows[("1", "a.txt")] == "int main() { return 0; }"
    assert len(rows) == 4  # .md excluded
    latin = rows[("2", "latin.txt")]
    assert "caf" in latin  # decoded losslessly or lossily, never crashed


def test_source_lines_from_files(spark, tmp_path):
    p = tmp_path / "src"
    p.mkdir()
    (p / "x.java").write_text("line1\nline2\nline3")
    df = source_lines_from_files(spark, str(p))
    rows = sorted((r.line_no, r.line) for r in df.collect())
    assert rows == [(1, "line1"), (2, "line2"), (3, "line3")]


def test_csv_roundtrip(spark, tmp_path):
    clones_path = tmp_path / "CLONES.csv"
    clones_path.write_text(
        "FUNCTION_ID_ONE,FUNCTION_ID_TWO,TYPE\n1,2,3\n2,3,3\n"
    )
    clones = read_clones_csv(spark, str(clones_path))
    assert clones.columns == ["function_id_one", "function_id_two"]
    assert clones.count() == 2

    funcs_path = tmp_path / "FUNCTIONS.csv"
    funcs_path.write_text("ID,NAME,STARTLINE,ENDLINE\n7,f.java,1,5\n")
    funcs = read_functions_csv(spark, str(funcs_path))
    r = funcs.first()
    assert (r.id, r.name, r.startline, r.endline) == (7, "f.java", 1, 5)

    out = tmp_path / "out"
    write_results_csv(clones, str(out))
    back = spark.read.option("header", True).csv(str(out))
    assert back.count() == 2


def test_index_create_if_absent(spark, tmp_path, embeddings):
    path = str(tmp_path / "index")
    assert not index_exists(spark, path)
    write_index(embeddings.limit(10), path)
    assert index_exists(spark, path)
    # mode="ignore" semantics: second write is a no-op (S7 skip-if-exists)
    write_index(embeddings.limit(20), path)
    assert load_index(spark, path).count() == 10


def test_events_micros_physical_type_robust(spark, tmp_path):
    """load_events_micros must yield identical epoch-us BIGINTs whether the
    fixture stores ts as INT64 epoch-ns (legacy rounds), parquet
    timestamp[us] (current rounds), or an instant TIMESTAMP column — the
    r2 fixture flip broke six queries; this pins the normalization."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.sources.events import (
        load_events_micros,
    )

    us = [1_704_067_200_000_000, 1_704_067_201_500_000, 1_704_070_800_000_001]
    base = {
        "event_id": pa.array([1, 2, 3], pa.int64()),
        "user_id": pa.array([10, 10, 11], pa.int64()),
        "event_type": pa.array(["click", "purchase", "click"], pa.string()),
        "value": pa.array([1.0, 2.0, 3.0], pa.float64()),
        "props": pa.array(["{}", "{}", "{}"], pa.string()),
    }
    variants = {
        "ns_int64": pa.array([u * 1000 for u in us], pa.int64()),
        "ts_us": pa.array(us, pa.timestamp("us")),
        "ts_us_utc": pa.array(us, pa.timestamp("us", tz="UTC")),
    }
    got = {}
    for name, ts_arr in variants.items():
        d = tmp_path / name
        d.mkdir()
        pq.write_table(pa.table({**base, "ts": ts_arr}), str(d / "events.parquet"))
        df = load_events_micros(spark, str(d))
        assert dict(df.dtypes)["ts"] == "bigint", name
        got[name] = sorted((r.event_id, r.ts) for r in df.collect())
    want = sorted(zip([1, 2, 3], us))
    for name, rows in got.items():
        assert rows == want, name


def test_quantized_index_roundtrip_size_and_recall(spark, tmp_path, embeddings):
    """The int8 index table must be substantially smaller than the float32
    one on disk, dequantize lazily into the unchanged kNN operator, and
    keep >= 0.8 average top-10 recall vs the exact float index."""
    import os

    from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.operators.knn import (
        exact_knn_fast,
    )
    from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.sources.index import (
        load_quantized_index,
        write_index,
        write_quantized_index,
    )

    raw_path = str(tmp_path / "raw_index")
    q_path = str(tmp_path / "q_index")
    write_index(embeddings.select("vec_id", "embedding"), raw_path)
    write_quantized_index(embeddings, q_path)

    def disk(p):
        return sum(
            os.path.getsize(os.path.join(d, f))
            for d, _, fs in os.walk(p)
            for f in fs
            if f.endswith(".parquet")
        )

    assert disk(q_path) < disk(raw_path) * 0.45  # ~4x smaller, margin for footers

    from pyspark.sql import functions as F

    probes = embeddings.filter("vec_id < 30").select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    exact = exact_knn_fast(probes, spark.read.parquet(raw_path), k=10)
    approx = exact_knn_fast(probes, load_quantized_index(spark, q_path), k=10)
    e = {}
    for r in exact.collect():
        e.setdefault(r.query_id, set()).add(r.result_id)
    a = {}
    for r in approx.collect():
        a.setdefault(r.query_id, set()).add(r.result_id)
    recall = sum(len(e[q] & a.get(q, set())) / len(e[q]) for q in e) / len(e)
    assert recall >= 0.8, recall


def test_events_micros_nanos_parquet_fallback(spark, tmp_path):
    """A true parquet TIMESTAMP(NANOS) fixture (the r1/r2 physical type):
    the plain read refuses it, read_events_raw enables the legacy
    nanosAsLong conf and retries, and the INT64-ns branch lands on the
    same epoch-us integers as every other physical type."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.sources.events import (
        load_events_micros,
    )

    us = [1_704_067_200_000_000, 1_704_067_201_500_000]
    d = tmp_path / "ns_events"
    d.mkdir()
    pq.write_table(
        pa.table(
            {
                "ts": pa.array([u * 1000 for u in us], pa.timestamp("ns")),
                "event_id": pa.array([1, 2], pa.int64()),
            }
        ),
        str(d / "events.parquet"),
    )
    df = load_events_micros(spark, str(d))
    assert dict(df.dtypes)["ts"] == "bigint"
    assert sorted((r.event_id, r.ts) for r in df.collect()) == list(
        zip([1, 2], us)
    )


def test_events_read_reraises_unrelated_errors(spark, tmp_path):
    """The nanosAsLong fallback fires ONLY on the TIMESTAMP(NANOS) refusal:
    an unrelated failure (missing path) re-raises the original error and
    leaves the session conf untouched."""
    import pytest

    from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.sources.events import (
        read_events_raw,
    )

    spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
    with pytest.raises(Exception) as exc:
        read_events_raw(spark, str(tmp_path / "does_not_exist.parquet"))
    assert "nanosAsLong" not in str(exc.value)
    # conf not mutated as a side effect of the unrelated failure
    assert (
        spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") == "false"
    )


# ---------------------------------------------------------------------------
# JSONL source / sink
# ---------------------------------------------------------------------------


def test_jsonl_roundtrip(spark, documents, tmp_path):
    from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.sources.jsonl import (
        read_jsonl,
        write_jsonl,
    )

    path = str(tmp_path / "docs_jsonl")
    write_jsonl(documents, path)
    back = read_jsonl(spark, path)
    assert back.count() == documents.count()
    a = sorted(map(tuple, documents.collect()))
    b = sorted(map(tuple, back.select(*documents.columns).collect()))
    assert a == b


def test_jsonl_corrupt_lines_counted_not_crashed(spark, tmp_path):
    from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.sources.jsonl import (
        corrupt_line_count,
        read_jsonl,
    )

    p = tmp_path / "mixed.jsonl"
    p.write_text(
        '{"doc_id": 1, "text": "ok", "lang": "en", "source": "s", "n_chars": 2}\n'
        "this is not json\n"
        '{"doc_id": 2, "text": "also ok", "lang": "en", "source": "s", "n_chars": 7}\n'
        '{"broken": \n'
    )
    good = read_jsonl(spark, str(p))
    assert sorted(r.doc_id for r in good.collect()) == [1, 2]
    assert corrupt_line_count(spark, str(p)) == 2
