"""Prepare-and-ship: the full training-data lifecycle as one composition —
curate (plans/corpus_prep) → leakage-safe split (operators/export) →
deterministic sharded export with per-split/per-shard manifests.

This is the step the reference never needed (it retrieves; it doesn't
ship corpora), and the one a 100 TB training pipeline runs nightly. The
design decision worth reading:

**The split threshold is LOWER than the drop threshold.** Stage 3 of the
funnel drops near-dups at ``jaccard_threshold`` (default 0.8 — only
near-identical docs cost tokens to keep). But eval leakage starts well
below that: a 0.6-jaccard pair kept in the corpus (correctly — it's
genuinely different text) still inflates eval numbers if one lands in
train and the other in test. So the ship step re-pairs the SURVIVORS at
``leakage_jaccard`` (default 0.5), resolves groups, and hashes the GROUP
id for the split (``leakage_safe_split``). The dedup pass and the split
pass answer different questions at different thresholds; conflating them
is the classic silent-leak bug this plan exists to prevent.

Scale shape: the survivor re-pairing is the same LSH-bounded pipeline as
stage 3 (never all-pairs); the split is map-side after one small join;
the export is one hash-partition shuffle per split. Writing the three
splits is three independent jobs over disjoint row sets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.dedup import (
    bucket_stats,
    duplicate_groups,
    lsh_candidate_pairs,
    minhash_bands,
    ngram_jaccard_pairs,
)
from ..operators.export import (
    export_shards,
    leakage_safe_split,
    shard_stats,
)
from .corpus_prep import corpus_prep

DEFAULT_FRACTIONS = {"train": 0.9, "val": 0.05, "test": 0.05}


def prepare_and_ship(
    docs: DataFrame,
    out_dir: str,
    eval_docs: DataFrame | None = None,
    fractions: dict[str, float] | None = None,
    n_shards: int = 8,
    leakage_jaccard: float = 0.5,
    leakage_bands: int = 8,
    leakage_max_bucket: int | None = None,
    quality_train: DataFrame | None = None,
    **prep_kwargs,
) -> dict:
    """Run the 7-stage funnel, split the survivors leakage-safely, and
    write ``{out_dir}/{split}/shard=<k>/`` parquet shards.

    ``quality_train`` (opt-in; a labeled ``doc_id, text, y`` frame with y
    in {+1, -1}) turns on the funnel's LEARNED quality filter (stage 5.4,
    plans/corpus_prep): the hinge classifier trains on it eagerly
    (CLS_ITERS bounded 2K+2-integer collects), then gates the corpus with
    one map-side score projection before the split/export. Named here —
    not just reachable through ``**prep_kwargs`` — because the nightly
    ship IS the lifecycle where a production pipeline applies its quality
    model; default off, and the default path's output is byte-identical
    with or without the parameter (pinned in tests/test_ship.py).

    Returns ``{"splits", "manifest", "accounting", "written"}``:

    - ``splits``: lazy ``(doc_id, split)`` assignment for every survivor;
    - ``manifest``: lazy per-(split, shard) ``n_docs/n_tokens/n_bytes``;
    - ``accounting``: the funnel's one-row accounting (lazy);
    - ``leakage_bucket_stats``: per-bucket occupancy of the r=2 leakage
      re-pairing (lazy; ``overflow`` flags buckets the ``max_bucket`` cap
      skipped — audit it before trusting the split on a degenerate corpus);
    - ``written``: dict split -> output path (the only executed part —
      calling this function writes the shards).
    """
    fractions = fractions or DEFAULT_FRACTIONS
    prep = corpus_prep(
        docs, eval_docs=eval_docs, quality_train=quality_train, **prep_kwargs
    )
    meta_cols = tuple(
        c for c in ("lang", "source") if c in prep["docs"].columns
    )
    survivors = prep["docs"].select("doc_id", "text", *meta_cols)

    # re-pair the survivors at the LOWER leakage threshold (module
    # docstring); the funnel's own groups (threshold = drop level) have at
    # most one surviving member each, so they cannot drive the split.
    # The banding must match the threshold: dedup's default (16 hashes /
    # 4 bands, r=4) targets ~0.8 jaccard — its candidate recall at 0.5 is
    # coin-flip. r=2 (8 bands) puts the S-curve's knee near 0.5
    # (per-band hit s^2, miss-all (1-s^2)^8: recall 0.90 at s=0.5, 0.997
    # at s=0.7), at the cost of more candidate verification — the right
    # trade for a leakage guard, where a miss silently corrupts evals.
    # r=2 banding makes buckets much larger than the funnel's r=4 pass, so
    # the in-bucket |B|^2 expansion needs a hot-bucket cap — an uncapped
    # hot bucket here is the module's own "never all-pairs" claim violated
    # at the worst possible stage. But the cap must NOT be the funnel's
    # own max_bucket verbatim: r=2 occupancy is systematically larger, so
    # a cap tuned for r=4 over-triggers here and silently drops leakage
    # candidate pairs — the exact silent leak this stage exists to
    # prevent. ``leakage_max_bucket`` is therefore its own parameter; when
    # unset it defaults to 4x the funnel's cap (a degenerate-blowup guard,
    # not a recall tuner — the multiplier only needs to keep |B|^2 off the
    # table). Skipped buckets stay countable via the returned
    # ``leakage_bucket_stats``.
    if leakage_max_bucket is None and prep_kwargs.get("max_bucket"):
        leakage_max_bucket = 4 * prep_kwargs["max_bucket"]
    # band the survivors ONCE: the same table serves candidate generation
    # and the occupancy audit (the signature pipeline is the expensive
    # stage — see lsh_candidate_pairs(banded=...)). localCheckpoint —
    # lazy, so the analyze-only gate holds — makes "once" true at RUNTIME
    # too: without it, collecting the returned leakage_bucket_stats is a
    # separate action that re-derives the whole shingle->minhash->band
    # pipeline (round-6 advice). First action materializes the bands;
    # every later consumer reads the checkpoint blocks.
    surv_banded = minhash_bands(survivors, bands=leakage_bands).localCheckpoint(
        eager=False
    )
    surv_pairs = ngram_jaccard_pairs(
        survivors,
        lsh_candidate_pairs(
            survivors, bands=leakage_bands, max_bucket=leakage_max_bucket,
            banded=surv_banded,
        ),
        eager_persist=False,
    ).filter(F.col("jaccard") >= leakage_jaccard)
    leakage_buckets = bucket_stats(surv_banded, max_bucket=leakage_max_bucket)
    # until_converged: the split hashes the GROUP id, so every member of a
    # connected component must resolve to the same label — a fixed round
    # count silently splits any component whose diameter exceeds it, which
    # is the exact train/test leak this plan exists to prevent. The lower
    # leakage threshold makes components larger and chainier than the dedup
    # pass's, so the fixpoint loop (not a guessed bound) is the only safe
    # resolution. It forces eager execution per round; prepare_and_ship
    # already executes writes, so the analyze-only gate is not violated.
    groups = duplicate_groups(surv_pairs, until_converged=True)

    splits = leakage_safe_split(survivors, groups, fractions)
    # the fan-out point: every split write + the manifest + the returned
    # `splits` re-consume this frame, and its lineage holds the funnel,
    # the survivor re-pairing, and the label propagation — persist (lazy:
    # plan builders must not execute; see persist_bounded) so the
    # pipeline materializes once, not once per consumer
    from ..operators.dedup import persist_bounded

    labeled = persist_bounded(survivors.join(splits, "doc_id"), eager=False)

    written = {}
    for name in fractions:
        part = labeled.filter(F.col("split") == name).drop("split")
        path = f"{out_dir}/{name}"
        export_shards(part, path, n_shards=n_shards, extra_cols=meta_cols)
        written[name] = path

    # per-(split, shard) manifest: reuse shard_stats per split and tag it
    parts = []
    for name in fractions:
        part = labeled.filter(F.col("split") == name)
        parts.append(
            shard_stats(part, n_shards=n_shards).select(
                F.lit(name).alias("split"), "shard", "n_docs", "n_tokens", "n_bytes"
            )
        )
    manifest = parts[0]
    for p in parts[1:]:
        manifest = manifest.unionByName(p)

    return {
        # served from the persisted frame so collecting it doesn't re-run
        # the funnel + split pipeline
        "splits": labeled.select("doc_id", "split"),
        "manifest": manifest,
        "accounting": prep["accounting"],
        "leakage_bucket_stats": leakage_buckets,
        "written": written,
    }
