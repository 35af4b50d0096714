"""CLI entry point — the Spark-first replacement for the reference's
``python main.py`` (main.py:15-23 argument surface).

Parity notes (SURVEY §0 quirks intentionally fixed):
- ``--normalized`` is a real store_true flag (the reference's ``type=bool``
  parses any non-empty string truthy, main.py:19);
- dataset paths are arguments (the reference hard-codes Windows paths,
  main.py:51-54);
- the Qdrant host/port/collection triple (main.py:17-18, 30-34) becomes
  ``--index_path``: a partitioned parquet vector table with create-if-
  absent semantics (S5/S7) — including the fix for the collection-name
  collapse bug (SURVEY §0);
- ``--model hash`` selects the deterministic hash embedder (no downloads);
  any other value is treated as a SentenceTransformer name (M1) and needs
  the library installed.

Usage:
    python -m <package> --dataset bcb --clones_csv CLONES.csv \
        --functions_csv FUNCTIONS.csv --source_dir ./java_sources \
        --index_path ./bcb_index --output_dir ./results
    python -m <package> --dataset poj --poj_dir ./datasets/poj104
    python -m <package> --dataset corpus --docs_parquet ./docs.parquet \
        --output_dir ./shipped --n_shards 32   # beyond-reference:
        # prep funnel -> leakage-safe split -> sharded training export
"""

from __future__ import annotations

import argparse
import sys

from pyspark.sql import functions as F


def _build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="clonespark",
        description="PySpark-native clone-detection benchmark pipelines",
    )
    p.add_argument("--dataset", choices=("bcb", "poj", "corpus"), default="poj",
                   help="pipeline to run (reference default: poj, main.py:16; "
                        "'corpus' is the beyond-reference training-data "
                        "lifecycle: prep funnel -> leakage-safe split -> "
                        "sharded export, plans/ship.py)")
    p.add_argument("--clones_csv", help="BCB CLONES.csv path")
    p.add_argument("--functions_csv", help="BCB FUNCTIONS_CLEANED.csv path")
    p.add_argument("--source_dir", help="BCB Java source tree")
    p.add_argument("--poj_dir", help="POJ-104 dataset directory")
    p.add_argument("--model", default="hash",
                   help="'hash' (deterministic, no downloads) or a "
                        "SentenceTransformer model name from the catalog "
                        "(main.py:20, embedding_models.yml)")
    p.add_argument("--allow-any-model", action="store_true",
                   help="accept a model name outside the catalog "
                        "(embedding_models.yml parity is strict by default)")
    p.add_argument("--normalized", action="store_true",
                   help="L2-normalize embeddings (main.py:19, fixed flag)")
    p.add_argument("--num_samples", type=int, default=500,
                   help="benchmark probe count (main.py:21)")
    p.add_argument("--k", type=int, default=100,
                   help="retrieval depth (main.py:22)")
    p.add_argument("--index_path", default=None,
                   help="parquet vector-index table; created if absent (S7)")
    p.add_argument("--output_dir", default=".",
                   help="where the two results CSVs go (main.py:85-90)")
    p.add_argument("--cpus", type=int, default=0,
                   help="local[n] cores; 0 = all")
    p.add_argument("--scalability_test", action="store_true",
                   help="run the ingest/search scalability sweep instead of "
                        "a benchmark pipeline (main3.py:23): per corpus "
                        "size, timed parquet ingest, JVM-heap delta, and "
                        "mean top-k search latency; writes the reference's "
                        "two CSVs (main3.py:89-92) into --output_dir")
    p.add_argument("--vectors_parquet",
                   help="scalability: the (vec_id, embedding) parquet table "
                        "the sweep slices (reference main3 generates its "
                        "corpus in-process; here any vector table works)")
    p.add_argument("--sizes", default="1000,5000,10000,20000,50000",
                   help="scalability: comma-separated corpus sizes "
                        "(reference list, main3.py:36)")
    p.add_argument("--n_queries", type=int, default=10,
                   help="scalability: probes per size (main3.py:75)")
    # --dataset corpus (training-data lifecycle)
    p.add_argument("--docs_parquet",
                   help="corpus: input documents parquet "
                        "(doc_id, text[, lang, source])")
    p.add_argument("--eval_parquet",
                   help="corpus: optional eval-set parquet for "
                        "decontamination (doc_id, text)")
    p.add_argument("--n_shards", type=int, default=8,
                   help="corpus: shards per split")
    p.add_argument("--train_frac", type=float, default=0.9)
    p.add_argument("--val_frac", type=float, default=0.05)
    p.add_argument("--test_frac", type=float, default=0.05)
    p.add_argument("--near_keeper", choices=("min_id", "quality"),
                   default="min_id",
                   help="corpus: near-dup keeper election — 'min_id' "
                        "(deterministic default) or 'quality' (keep each "
                        "group's best-quality member)")
    p.add_argument("--substring_run_n", type=int, default=None,
                   help="corpus: opt-in substring-level dedup — strip "
                        "repeated runs of >= N tokens from exact keepers "
                        "before near-dup/quality stages (Lee et al. 2022; "
                        "default off)")
    p.add_argument("--dsir_target_parquet", default=None,
                   help="corpus: opt-in DSIR importance selection — "
                        "parquet of target-domain documents; keeps the "
                        "top --dsir_keep_frac of the gate-surviving pool "
                        "by target/raw bigram-LM likelihood ratio "
                        "(Xie et al. 2023; default off)")
    p.add_argument("--dsir_keep_frac", type=float, default=0.25,
                   help="corpus: fraction kept by DSIR selection "
                        "(only with --dsir_target_parquet)")
    p.add_argument("--quality_train_parquet", default=None,
                   help="corpus: opt-in learned quality filter — parquet "
                        "of labeled docs (doc_id, text, y in {+1,-1}); "
                        "trains the class-balanced hinge filter and gates "
                        "survivors on its integer margin (the CCNet "
                        "classifier stage; default off)")
    return p


def _embedder(args):
    from .functions.embed import embed_hash, embed_sentence_transformer
    from .functions.vector import l2_normalize

    if args.model == "hash":
        base = embed_hash
    else:
        def base(df, text_col="text", out_col="embedding"):
            return embed_sentence_transformer(
                df, model_name=args.model, text_col=text_col, out_col=out_col
            )

    if not args.normalized:
        return base

    def normalized(df, text_col="text", out_col="embedding"):
        out = base(df, text_col=text_col, out_col=out_col)
        return out.withColumn(out_col, l2_normalize(F.col(out_col)))

    return normalized


def run(argv: list[str] | None = None) -> dict:
    args = _build_parser().parse_args(argv)
    from .functions.models import validate_model
    from .session import get_spark
    from .sources.csv_io import write_results_csv

    validate_model(args.model, allow_any=args.allow_any_model)

    master = f"local[{args.cpus}]" if args.cpus else None
    spark = get_spark("clonespark-cli", master=master)

    if args.scalability_test:
        if not args.vectors_parquet:
            raise SystemExit("--scalability_test requires --vectors_parquet")
        from .plans.scalability import scalability_sweep
        from .sources.csv_io import write_results_csv

        sizes = tuple(int(s) for s in args.sizes.split(",") if s.strip())
        sweep = scalability_sweep(
            spark,
            spark.read.parquet(args.vectors_parquet),
            sizes=sizes,
            k=args.k,
            n_queries=args.n_queries,
        )
        rows = sweep.collect()
        # the reference's two-CSV shape (main3.py:89-92): query times and
        # memory land in separate files
        times = sweep.select("size", "avg_query_time_seconds")
        memory = sweep.select(
            "size", "ingest_seconds", "ingest_heap_delta_mb", "heap_used_mb"
        )
        times_path = f"{args.output_dir}/scalability_query_times.csv"
        memory_path = f"{args.output_dir}/scalability_memory.csv"
        write_results_csv(times, times_path)
        write_results_csv(memory, memory_path)
        for r in rows:
            print(
                f"size={r.size} ingest={r.ingest_seconds}s "
                f"heap_delta={r.ingest_heap_delta_mb}MB "
                f"avg_query={r.avg_query_time_seconds}s"
            )
        return {
            "sweep": [r.asDict() for r in rows],
            "query_times": times_path,
            "memory": memory_path,
        }

    if args.dataset == "corpus":
        if not args.docs_parquet:
            raise SystemExit("--dataset corpus requires --docs_parquet")
        from .plans.ship import prepare_and_ship

        docs = spark.read.parquet(args.docs_parquet)
        eval_docs = (
            spark.read.parquet(args.eval_parquet) if args.eval_parquet else None
        )
        res = prepare_and_ship(
            docs,
            args.output_dir,
            eval_docs=eval_docs,
            fractions={
                "train": args.train_frac,
                "val": args.val_frac,
                "test": args.test_frac,
            },
            n_shards=args.n_shards,
            near_keeper=args.near_keeper,
            substring_run_n=args.substring_run_n,
            dsir_target=(
                spark.read.parquet(args.dsir_target_parquet)
                if args.dsir_target_parquet
                else None
            ),
            dsir_keep_frac=args.dsir_keep_frac,
            quality_train=(
                spark.read.parquet(args.quality_train_parquet)
                if args.quality_train_parquet
                else None
            ),
        )
        acc = res["accounting"].first().asDict()
        per_split: dict[str, int] = {}
        for r in res["manifest"].collect():
            per_split[r.split] = per_split.get(r.split, 0) + int(r.n_docs)
        print(f"Funnel: {acc}")
        print(f"Shipped: {per_split} -> {res['written']}")
        return {"accounting": acc, "per_split": per_split,
                "written": res["written"]}

    embed = _embedder(args)

    if args.dataset == "bcb":
        missing = [n for n in ("clones_csv", "functions_csv", "source_dir")
                   if not getattr(args, n)]
        if missing:
            raise SystemExit(f"--dataset bcb requires --{' --'.join(missing)}")
        from .plans.bcb import bcb_pipeline
        from .sources.files import source_lines_from_files

        lines = source_lines_from_files(spark, args.source_dir)
        # join on basenames: reference metadata stores absolute (Windows)
        # paths while the scanned tree yields file:// URIs
        basename = lambda c: F.element_at(F.split(c, r"[/\\]"), -1)  # noqa: E731
        lines = lines.withColumn("name", basename(F.col("name")))
        res = bcb_pipeline(
            spark, args.clones_csv, args.functions_csv, lines,
            index_path=args.index_path, embed=embed,
            num_samples=args.num_samples, k=args.k,
            functions_name_transform=basename,
        )
    else:
        if not args.poj_dir:
            raise SystemExit("--dataset poj requires --poj_dir")
        from .plans.poj import poj_pipeline

        res = poj_pipeline(
            spark, args.poj_dir, index_path=args.index_path, embed=embed,
            num_samples=args.num_samples, k=args.k,
        )

    detailed_path = f"{args.output_dir}/{args.dataset}_detailed_results.csv"
    stats_path = f"{args.output_dir}/{args.dataset}_query_stats.csv"
    write_results_csv(res.detailed, detailed_path)
    write_results_csv(res.stats, stats_path)

    m = res.metrics.first().asDict()
    # metric printout, reference shape (bcb_utils.py:270-277)
    print(f"Success rate: {m['success_rate']}")
    print(f"Mean precision@{args.k}: {m['mean_precision_at_k']}")
    print(f"MRR: {m['mrr']}")
    print(f"MAP@{args.k}: {m['map_at_k']}")
    return {"metrics": m, "detailed": detailed_path, "stats": stats_path}


if __name__ == "__main__":
    run(sys.argv[1:])
