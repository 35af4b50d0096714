"""Dump formatted physical plans for the headline operators (PLANS.md
source). Usage: python tools/explain_plans.py [sf_dir]"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark import (  # noqa: E402
    operators as ops,
)
from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.session import (  # noqa: E402
    get_spark,
)


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("explain")
    spark.sparkContext.setLogLevel("ERROR")
    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    li = spark.read.parquet(f"{sf}/lineitem.parquet")
    orders = spark.read.parquet(f"{sf}/orders.parquet")
    cust = spark.read.parquet(f"{sf}/customer.parquet")
    docs = spark.read.parquet(f"{sf}/documents.parquet")

    plans = {
        "exact_knn_fast": ops.self_knn(emb, k=100, n_probes=500, fast=True),
        "pricing_summary": (
            li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
            .groupBy("l_returnflag", "l_linestatus")
            .agg(F.sum("l_quantity").alias("sum_qty"))
        ),
        "lookup_join": (
            orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
            .groupBy("c_mktsegment")
            .agg(F.count("*").alias("n"))
        ),
        "minhash_signatures": ops.minhash_signatures(docs),
        "lsh_candidate_pairs": ops.lsh_candidate_pairs(docs),
        "srp_candidate_pairs": ops.srp_candidate_pairs(
            emb.select("vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("embedding"))
        ),
        "semi_join_q4": (
            orders.join(
                li.filter(F.col("l_returnflag") == "R"),
                orders.o_orderkey == li.l_orderkey,
                "left_semi",
            ).groupBy("o_orderpriority").agg(F.count("*").alias("n"))
        ),
        "large_orders_q18": (
            orders.join(
                li.groupBy("l_orderkey")
                .agg(F.sum("l_quantity").alias("sum_qty"))
                .filter(F.col("sum_qty") > 150),
                F.col("o_orderkey") == F.col("l_orderkey"),
            )
        ),
    }

    # round-3 additions: events ingestion, quantization, repetition,
    # decontamination — keep PLANS.md claims reproducible
    import __spark_entry__ as entrymod

    plans["click_attribution_events_us"] = entrymod.q_click_attribution(spark, sf)
    plans["quantized_embeddings"] = entrymod.q_quantized_embeddings(spark, sf)
    plans["repetition_stats"] = entrymod.q_repetition_stats(spark, sf)
    plans["contamination"] = entrymod.q_contamination(spark, sf)

    # round-4 additions: probe-distributed IVF join, SRP production
    # near-dup, persisted partition-pruned index (built into /tmp so the
    # PartitionFilters line is reproducible on demand)
    plans["knn_join_cogroup"] = entrymod.q_knn_join(spark, sf)
    plans["srp_verified_dups"] = entrymod.q_srp_verified_dups(spark, sf)
    ivf_path = "/tmp/explain_ivf_index"
    ops.build_ivf_index(emb, ivf_path, n_centroids=8, mode="overwrite")
    probe1 = emb.select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    ).filter(F.col("query_id") == 3)
    plans["ivf_knn_persisted_pruned"] = ops.ivf_knn_persisted(
        spark, ivf_path, probe1, k=5, nprobe=2
    )

    # round-4 session additions: lexical/hybrid retrieval, cleanse, KMV,
    # semantic dedup (the corpus-prep funnel's plan is NOT dumped here:
    # its checkpointed label-propagation stage executes at construction)
    plans["bm25_topk"] = entrymod.q_bm25_topk(spark, sf)
    plans["hybrid_rrf"] = entrymod.q_hybrid_rrf(spark, sf)
    plans["boilerplate_clean"] = entrymod.q_boilerplate_clean(spark, sf)
    plans["kmv_tokens"] = entrymod.q_kmv_tokens(spark, sf)
    plans["semantic_dups"] = entrymod.q_semantic_dups(spark, sf)

    # round-5 additions: training export (shard manifest + sequence
    # packing — expect ONE hash-partition exchange on the shard id, a
    # shard-local window sort, map-side hash/token expressions) and the
    # max_cell-guarded cogroup join (expect the occupancy aggregate as a
    # lazily-persisted BROADCAST side, never a driver collect)
    plans["shard_stats"] = entrymod.q_shard_stats(spark, sf)
    plans["packed_sequences"] = entrymod.q_packed_sequences(spark, sf)
    plans["knn_join_guarded"] = entrymod.q_knn_join_guarded(spark, sf)
    plans["zorder_keys"] = entrymod.q_zorder_keys(spark, sf)

    for name, df in plans.items():
        print(f"\n===== {name} =====")
        df.explain("formatted")


if __name__ == "__main__":
    main()
