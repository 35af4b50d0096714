"""POJ-104 end-to-end pipeline (SURVEY SS3.2; reference entry point
``python main.py --dataset poj``).

The reference walks the directory tree, hand-batches 128 files at a time,
decodes with chardet, encodes and upserts per batch, then loops a
synchronous search per sampled query (main.py:101-141). Here: one
``binaryFile`` scan (Spark partitions natively — the manual batching
disappears, SURVEY U1), one embed pass, one set-based kNN join; relevance is
same-problem-class (P5) and AP@k uses the POJ ``/k`` normalization
(poj_utils.py:259).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.embed import embed_hash
from ..functions.ids import stable_hash64, uuid5_udf
from ..operators.evaluate import detailed_results, ir_metrics, query_stats
from ..operators.knn import exact_knn_fast
from ..sources.files import poj_directory_source
from ..sources.index import index_exists, load_index, write_index


@dataclass
class PojResult:
    corpus: DataFrame
    detailed: DataFrame
    stats: DataFrame
    metrics: DataFrame
    extra: dict = field(default_factory=dict)


def poj_pipeline(
    spark: SparkSession,
    directory: str,
    index_path: str | None = None,
    embed=embed_hash,
    num_samples: int = 500,
    k: int = 100,
) -> PojResult:
    return poj_pipeline_corpus(
        spark,
        poj_directory_source(spark, directory),
        index_path=index_path,
        embed=embed,
        num_samples=num_samples,
        k=k,
    )


def poj_pipeline_corpus(
    spark: SparkSession,
    raw_corpus: DataFrame,
    index_path: str | None = None,
    embed=embed_hash,
    num_samples: int = 500,
    k: int = 100,
) -> PojResult:
    """The POJ pipeline over an already-loaded ``(clone_type, code_name,
    code_contents)`` frame — the source-agnostic core. ``poj_pipeline``
    feeds it the binaryFile directory scan; the graded ``poj_e2e`` oracle
    entry feeds it a frame derived from the test parquet so UUIDv5 ids,
    embed, sampling, kNN and the /k metrics replay end-to-end."""
    corpus = raw_corpus.select(
        uuid5_udf(F.concat(F.col("clone_type"), F.col("code_name"))).alias("code_uuid"),
        "clone_type",
        "code_name",
        "code_contents",
    )
    embedded = embed(corpus, text_col="code_contents", out_col="embedding")

    if index_path is not None:
        if not index_exists(spark, index_path):
            write_index(embedded, index_path)
        embedded = load_index(spark, index_path)

    probes = (
        embedded.withColumn("hk", stable_hash64(F.col("code_uuid")))
        .orderBy("hk", "code_uuid")
        .limit(num_samples)
        .select(
            F.col("code_uuid").alias("query_id"),
            F.col("embedding").alias("query_vec"),
        )
    )
    knn = exact_knn_fast(
        probes, embedded, k=k, id_col="code_uuid", vec_col="embedding"
    )
    labels = embedded.select("code_uuid", F.col("clone_type").alias("label"))
    detailed = detailed_results(knn, labels, mode="label", id_col="code_uuid")
    return PojResult(
        corpus=corpus,
        detailed=detailed,
        stats=query_stats(detailed),
        metrics=ir_metrics(detailed, k=k, ap_norm="k"),
    )
