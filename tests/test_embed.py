"""Embedder tests (SURVEY M1): deterministic hash embedder; gated real model."""

import math
import os

import pytest
from pyspark.sql import functions as F

from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.functions.embed import (
    embed_hash,
    embed_sentence_transformer,
)


def test_hash_embedding_shape_and_norm(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "")], "doc_id long, text string"
    )
    out = {r.doc_id: r.embedding for r in embed_hash(df, dim=32).collect()}
    assert len(out[1]) == 32
    assert math.isclose(sum(x * x for x in out[1]) ** 0.5, 1.0, abs_tol=1e-9)
    assert out[2] == [0.0] * 32  # empty text -> zero vector, not NaN


def test_hash_embedding_deterministic(spark):
    df = spark.createDataFrame([(1, "same input text here")], "doc_id long, text string")
    a = embed_hash(df).first().embedding
    b = embed_hash(df).first().embedding
    assert a == b


def test_hash_embedding_similar_texts_close(spark, documents):
    """Same text -> identical vectors; disjoint vocab -> lower similarity."""
    df = spark.createDataFrame(
        [
            (1, "spark query engine distributed execution"),
            (2, "spark query engine distributed execution"),
            (3, "zebra quartz violin umbrella xylophone"),
        ],
        "doc_id long, text string",
    )
    vecs = {r.doc_id: r.embedding for r in embed_hash(df).collect()}

    def cos(a, b):
        num = sum(x * y for x, y in zip(a, b))
        return num  # vectors are unit-norm

    assert cos(vecs[1], vecs[2]) == pytest.approx(1.0, abs=1e-9)
    assert cos(vecs[1], vecs[3]) < 0.9


def test_sentence_transformer_gated(spark):
    df = spark.createDataFrame([(1, "text")], "doc_id long, text string")
    try:
        import sentence_transformers  # noqa: F401

        pytest.skip("sentence-transformers installed; gate not applicable")
    except ImportError:
        pass
    with pytest.raises(ImportError, match="embed_hash"):
        embed_sentence_transformer(df)


_FAKE_ST = '''\
"""Deterministic stand-in for sentence_transformers (test fixture).

One module serves both fake tests (addPyFile rejects same-named files
with different contents, so the behaviors dispatch on the model name):
a "recorder" model returns float64 vectors carrying the encode() call's
shape (call size, forwarded batch_size) so the driver can audit the UDF
boundary without a side channel; any other name returns the original
text-derived float32 vectors."""
import numpy as np


class SentenceTransformer:
    def __init__(self, name):
        self.name = name

    def encode(self, texts, batch_size=32, normalize_embeddings=False):
        if "recorder" in self.name:
            # float64 on purpose: the contract test pins the float32 cast
            # at the declared array<float> schema boundary
            n = float(len(texts))
            return np.stack([
                np.array([float(len(t)) + 0.1, n, float(batch_size)],
                         dtype=np.float64)
                for t in texts
            ])
        out = []
        for t in texts:
            v = np.array(
                [float(len(t)), float(sum(map(ord, t)) % 97) + 1.0, 1.0],
                dtype=np.float32,
            )
            if normalize_embeddings:
                v = v / np.linalg.norm(v)
            out.append(v)
        return np.stack(out)
'''


def test_sentence_transformer_fake_module(spark, tmp_path, monkeypatch):
    """Drive the real-model path END-TO-END (mapInPandas batching, schema
    assembly, per-worker model cache) with a deterministic fake
    sentence_transformers module shipped to the workers via addPyFile —
    the reference's core capability (bcb_utils.py:101, main.py:36)
    executed without the model download. NOTE: must run after the gated
    test above (the fake stays importable for the rest of the session).
    """
    import sys

    fake = tmp_path / "sentence_transformers.py"
    fake.write_text(_FAKE_ST)
    monkeypatch.syspath_prepend(str(tmp_path))  # driver-side import gate
    spark.sparkContext.addPyFile(str(fake))  # worker-side import in encode()
    try:
        rows = [(i, f"document number {i} " * (i % 4 + 1)) for i in range(37)]
        df = spark.createDataFrame(rows, "doc_id long, text string").repartition(4)
        out = embed_sentence_transformer(
            df, model_name="fake-model", batch_size=8, normalize=True
        )
        assert [f.simpleString() for f in out.schema.fields] == [
            "doc_id:bigint", "text:string", "embedding:array<float>",
        ]
        got = {r.doc_id: (r.text, r.embedding) for r in out.collect()}
        assert len(got) == 37  # every row survives batching across partitions

        import numpy as np

        for i, text in rows:
            t, emb = got[i]
            assert t == text  # passthrough columns intact
            v = np.array(
                [float(len(text)), float(sum(map(ord, text)) % 97) + 1.0, 1.0],
                dtype=np.float32,
            )
            v = v / np.linalg.norm(v)
            assert emb == pytest.approx(v.tolist(), abs=1e-6)  # right text->vec routing
            assert sum(x * x for x in emb) == pytest.approx(1.0, abs=1e-5)  # normalize flag

        # second invocation goes through the per-worker cache branch
        again = embed_sentence_transformer(
            df, model_name="fake-model", batch_size=8, normalize=True
        )
        got2 = {r.doc_id: r.embedding for r in again.collect()}
        assert got2 == {k: v for k, (_, v) in got.items()}
    finally:
        sys.modules.pop("sentence_transformers", None)


def test_sentence_transformer_udf_boundary_contract(spark, tmp_path,
                                                    monkeypatch):
    """The first real-cluster run's diffable CONTRACT (r5 verdict ask):
    (1) one encode() call per ARROW batch, sized by
    spark.sql.execution.arrow.maxRecordsPerBatch — never the whole
    partition; (2) the caller's batch_size reaches the model verbatim
    (the model does its own sub-batching, reference bcb_utils.py:101);
    (3) a float64-returning model is cast to float32 at the declared
    array<float> schema boundary — downstream kNN sees float32-rounded
    values, bit-exactly np.float32(x)."""
    import sys

    import numpy as np

    fake = tmp_path / "sentence_transformers.py"
    fake.write_text(_FAKE_ST)  # byte-identical to the e2e test's module
    monkeypatch.syspath_prepend(str(tmp_path))
    spark.sparkContext.addPyFile(str(fake))
    prev = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "7")
    try:
        rows = [(i, f"text number {i} " * (i % 3 + 1)) for i in range(37)]
        df = spark.createDataFrame(
            rows, "doc_id long, text string"
        ).repartition(2)
        got = {
            r.doc_id: r.embedding
            for r in embed_sentence_transformer(
                df, model_name="fake-recorder", batch_size=8
            ).collect()
        }
        assert len(got) == 37
        texts = dict(rows)
        for i, (len01, call_n, bsz) in got.items():
            # (3) float32 cast at the boundary: 0.1 is not representable,
            # so equality only holds against the float32-rounded value
            assert len01 == np.float32(len(texts[i]) + 0.1)
            assert len01 != len(texts[i]) + 0.1
            # (1) Arrow batch cap bounds every encode() call
            assert 1 <= int(call_n) <= 7
            # (2) batch_size forwarded verbatim
            assert int(bsz) == 8
        # at 37 rows / 2 partitions / cap 7, slicing must actually happen
        # (a whole-partition call would have shown call_n ~ 18)
        assert max(int(v[1]) for v in got.values()) <= 7
        assert sum(1 for v in got.values() if int(v[1]) == 7) > 0
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", prev)
        sys.modules.pop("sentence_transformers", None)


@pytest.mark.skipif(
    os.environ.get("SPARK_GRAFT_REAL_MODEL") != "1",
    reason="opt-in real-model smoke (SPARK_GRAFT_REAL_MODEL=1): needs "
    "sentence-transformers + a local MiniLM checkpoint; skipped in CI "
    "where neither ships",
)
def test_sentence_transformer_real_model_smoke(spark):
    """First-real-deployment smoke (VERDICT r3 item 7): when a real
    SentenceTransformer is available (env-gated), the iterator-UDF path
    must produce the model's advertised dimension, deterministic output
    across two runs, and unit norms under normalize=True — the properties
    every downstream kNN operator assumes. Reference anchor: main.py:36,
    bcb_utils.py:101 (the reference's default embedding path)."""
    import numpy as np

    model_name = os.environ.get("SPARK_GRAFT_REAL_MODEL_NAME", "all-MiniLM-L6-v2")
    try:
        from sentence_transformers import SentenceTransformer
    except ImportError:
        pytest.skip("sentence-transformers not installed")
    try:
        expected_dim = SentenceTransformer(
            model_name
        ).get_sentence_embedding_dimension()
    except Exception as e:  # no checkpoint on disk / no network
        pytest.skip(f"model {model_name} not loadable: {e}")

    df = spark.createDataFrame(
        [(i, f"sample text number {i} about spark engines") for i in range(8)],
        "doc_id long, text string",
    )
    out1 = {
        r.doc_id: r.embedding
        for r in embed_sentence_transformer(
            df, model_name=model_name, normalize=True
        ).collect()
    }
    out2 = {
        r.doc_id: r.embedding
        for r in embed_sentence_transformer(
            df, model_name=model_name, normalize=True
        ).collect()
    }
    assert set(out1) == set(range(8))
    for i, v in out1.items():
        assert len(v) == expected_dim
        assert abs(float(np.linalg.norm(v)) - 1.0) < 1e-3
        assert np.allclose(v, out2[i], atol=1e-6)
