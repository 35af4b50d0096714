"""BCB end-to-end pipeline (SURVEY SS3.1; reference entry point
``python main.py --dataset bcb``).

The reference's eight eager stages — CSV scans, dict-based clone map,
per-row corpus build, batched GPU encode + Qdrant upsert, then a per-query
synchronous search loop — become one lazy DataFrame graph: the sampled probe
set joins the index ONCE (J2) and every metric falls out of a window + two
aggregations. No driver loop, no per-query round-trip.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.embed import embed_hash
from ..functions.ids import stable_hash64
from ..operators.corpus import build_clone_map, build_corpus
from ..operators.evaluate import detailed_results, ir_metrics, query_stats
from ..operators.knn import exact_knn_fast
from ..sources.csv_io import read_clones_csv, read_functions_csv
from ..sources.index import index_exists, load_index, write_index


@dataclass
class BcbResult:
    corpus: DataFrame
    detailed: DataFrame
    stats: DataFrame
    metrics: DataFrame
    extra: dict = field(default_factory=dict)


def bcb_pipeline(
    spark: SparkSession,
    clones_csv: str,
    functions_csv: str,
    source_lines: DataFrame,
    index_path: str | None = None,
    embed=embed_hash,
    num_samples: int = 500,
    k: int = 100,
    sample_seed: int = 42,
    functions_name_transform=None,
) -> BcbResult:
    """Stages (SURVEY SS3.1), each a lazy plan:

    1-3. scans (S1) with pushed projections;
    4.   clone map: symmetric closure + collect_set (J3/A1);
    5.   corpus: broadcast metadata join + range-join snippet extraction +
         UUIDv5 ids, unresolvable rows dropped countably (J1/S4/F1/P6);
    6.   embed + conditional index build (M1/S5/S7) — the persisted parquet
         table is the collection; skip ingest when it already exists;
    7.   benchmark: deterministic exact-n probe sample (O3, seeded — the
         reference's unseeded ``df.sample`` made reproducible), ONE set-based
         kNN join (J2), relevance by clone-array membership (P4);
    8.   sinks: per-result table, per-query stats (A2/A3), global metrics
         (A4-A6, W1-W4 with the BCB ``min(|clones|,k)`` AP normalization).
    """
    clones = read_clones_csv(spark, clones_csv)
    functions = read_functions_csv(spark, functions_csv)
    if functions_name_transform is not None:
        # CLI path normalization: reference metadata stores absolute paths
        # (even Windows ones, main.py:51-54) while the scanned source tree
        # yields URIs — join on whatever the caller maps both sides to
        functions = functions.withColumn(
            "name", functions_name_transform(F.col("name"))
        )
    return bcb_pipeline_frames(
        spark,
        clones,
        functions,
        source_lines,
        index_path=index_path,
        embed=embed,
        num_samples=num_samples,
        k=k,
    )


def bcb_pipeline_frames(
    spark: SparkSession,
    clones: DataFrame,
    functions: DataFrame,
    source_lines: DataFrame,
    index_path: str | None = None,
    embed=embed_hash,
    num_samples: int = 500,
    k: int = 100,
) -> BcbResult:
    """Stages 4-8 of ``bcb_pipeline`` over already-loaded frames — the
    source-agnostic core. ``bcb_pipeline`` feeds it the reference's CSV
    scans; the graded ``bcb_e2e`` oracle entry feeds it frames derived from
    the test parquet so the whole composition (clone map -> corpus ->
    embed -> sample -> kNN -> metrics) replays in SQL end-to-end."""
    clone_map = build_clone_map(clones)
    corpus = build_corpus(clone_map, functions, source_lines)

    embedded = embed(corpus, text_col="code_contents", out_col="embedding")

    if index_path is not None:
        if not index_exists(spark, index_path):
            write_index(embedded, index_path)
        embedded = load_index(spark, index_path)

    # O3: exact-n deterministic sample by portable hash order
    probes = (
        embedded.withColumn("hk", stable_hash64(F.col("func_id")))
        .orderBy("hk", "func_id")
        .limit(num_samples)
        .select(
            F.col("func_id").alias("query_id"),
            F.col("embedding").alias("query_vec"),
        )
    )
    knn = exact_knn_fast(
        probes, embedded, k=k, id_col="func_id", vec_col="embedding"
    )
    labels = embedded.select("func_id", "clones")
    detailed = detailed_results(
        knn, labels, mode="clones", id_col="func_id", clones_col="clones"
    )
    gt_sizes = labels.select(
        F.col("func_id").alias("query_id"),
        F.size("clones").cast("bigint").alias("gt_size"),
    )
    return BcbResult(
        corpus=corpus,
        detailed=detailed,
        stats=query_stats(detailed),
        metrics=ir_metrics(detailed, k=k, ap_norm="gt", gt_sizes=gt_sizes),
    )
