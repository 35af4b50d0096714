"""Scale receipts for the r7 text-pipeline operators — tfidf_cosine_pairs,
bigram_lm_scores, novelty_scores, bloom build+probe — at 50k-500k docs
(beyond the 5k-row fixtures).

The question each row answers:

- tfidf_cosine_pairs: does the df-cap ACTUALLY bound the posting
  self-join when the corpus carries hot terms? Two corpora per size —
  "clean" token soup (5% planted one-token-substitution near-dups, like
  dedup_scale_sweep) and "hot" (the same corpus with a 6-token boilerplate
  prefix stamped on every 3rd doc, so its shingles' df is ~N/3 — five
  orders of magnitude over the cap at 500k). Uncapped, the hot shingles
  alone would contribute ~(N/3)^2 = 2.8e10 join rows at 500k; with the
  cap they are pruned from the pair space entirely, so hot wall-clock must
  track clean wall-clock and found pairs must track the planted dups.
- bigram_lm_scores: train+score wall-clock per doc must stay ~flat (model
  table is vocab^2-bounded, scoring is one hash join per doc-bigram).
- novelty_scores / bloom: both are two-shuffle map-side-combinable plans;
  per-doc cost must stay flat.

All text is seeded NumPy (no fixture mutation); every measurement is
wall-clock of a count() over the full plan.

Usage: python tools/text_ops_scale.py [sizes...]   (default 50000 200000;
pass 500000 for the big row). Prints a markdown table + one JSON line per
size.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F  # noqa: E402

import code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.operators as ops  # noqa: E402

SEED = 7
VOCAB = 1000
DOC_TOKENS = 120
NEAR_DUP_FRAC = 0.05
HOT_EVERY = 3  # boilerplate prefix stamped on every 3rd doc (~N/3 df)
HOT_PREFIX = "hdr0 hdr1 hdr2 hdr3 hdr4 hdr5"


def synth_docs(spark, n: int, hot: bool):
    rng = np.random.default_rng(SEED)
    vocab = [f"w{i:04d}" for i in range(VOCAB)]
    rows = []
    for i in range(n):
        toks = rng.integers(0, VOCAB, size=DOC_TOKENS)
        text = " ".join(vocab[t] for t in toks)
        if hot and i % HOT_EVERY == 0:
            text = HOT_PREFIX + " " + text
        rows.append((i, text))
    n_dup = int(n * NEAR_DUP_FRAC)
    for j in range(n_dup):
        base = rows[j][1].split()
        base[7] = "zsub"
        rows.append((n + j, " ".join(base)))
    return spark.createDataFrame(rows, "doc_id long, text string").repartition(32)


def timed(fn) -> tuple[float, int]:
    """Best-of-2 (the bench.py protocol): the first pass pays codegen
    compile, Python-worker spin-up, and any lazy-persist materialization;
    the min is the steady-state number a warmed pipeline delivers."""
    best, out = float("inf"), None
    for _ in range(2):
        t0 = time.monotonic()
        out = fn()
        best = min(best, time.monotonic() - t0)
    return round(best, 2), out


def longdoc_strip_receipt(spark, n_docs: int = 40,
                          lens: tuple[int, ...] = (10_000, 50_000)) -> int:
    """r9 receipt (r8 verdict what's-wrong #1): strip_duplicate_runs on a
    BOILERPLATE-HEAVY LONG-DOC corpus — n_docs docs of L tokens each, the
    first 80% of every doc one shared boilerplate passage (so dropped ~
    0.8 x tokens: exactly the regime where the r8 per-token
    array_contains filter went O(tokens x dropped) ~ quadratic in doc
    length). The r9 keep-mask (array_except hash set) is O(tokens +
    dropped) per doc, so wall-clock across the L sweep must scale ~like
    L (quadratic predicts the (L2/L1)^2 ratio — 25x for 10k->50k — and
    visibly does not fit). Output exactness is asserted inline: every
    non-first doc removes exactly 0.8L tokens in one run and keeps its
    0.2L unique tail (byte-checked via token count)."""
    print("| doc len L | docs | corpus tokens | strip (s) | s per Mtok | "
          "exact |")
    print("|---|---|---|---|---|---|")
    rows_out = []
    base_t = None
    for L in lens:
        n_dup = int(L * 0.8)
        boiler = " ".join(f"b{i:05d}" for i in range(n_dup))
        docs = spark.createDataFrame(
            [(0, boiler)]
            + [
                (i, boiler + " " + " ".join(
                    f"d{i:03d}t{j:05d}" for j in range(L - n_dup)))
                for i in range(1, n_docs)
            ],
            "doc_id long, text string",
        ).repartition(32).persist()
        docs.count()

        def strip():
            out = ops.strip_duplicate_runs(docs, run_n=50).persist()
            total = out.count()
            exact = out.filter(
                (F.col("doc_id") > 0)
                & (F.col("n_tokens_removed") == n_dup)
                & (F.col("n_runs_removed") == 1)
                & (F.size(F.split("text", " ")) == L - n_dup)
            ).count()
            keeper = out.filter(
                (F.col("doc_id") == 0) & (F.col("n_tokens_removed") == 0)
            ).count()
            out.unpersist()
            return total, exact, keeper

        t, (total, exact, keeper) = timed(strip)
        ok = total == n_docs and exact == n_docs - 1 and keeper == 1
        mtok = L * n_docs / 1e6
        print(f"| {L} | {n_docs} | {L * n_docs} | {t} | "
              f"{round(t / mtok, 2)} | {'yes' if ok else 'NO'} |")
        rows_out.append({"doc_len": L, "docs": n_docs, "strip_s": t,
                         "exact": ok})
        if base_t is None:
            base_t = (L, t)
        docs.unpersist()
    l1, t1 = base_t
    l2, t2 = lens[-1], rows_out[-1]["strip_s"]
    ratio = round(t2 / max(t1, 1e-9), 1)
    print(f"L {l1} -> {l2} ({l2 // l1}x tokens): wall {t1} -> {t2} s "
          f"({ratio}x; quadratic predicts ~{(l2 // l1) ** 2}x)")
    print(json.dumps({"longdoc_strip": rows_out, "wall_ratio": ratio,
                      "len_ratio": l2 // l1}))
    return 0


def bpe_receipt(spark, sizes: list[int], num_merges: int = 12) -> int:
    """r9 receipt: BPE training cost decomposition at corpus scale. The
    module contract says the word histogram is the ONLY corpus-scale pass
    and every merge round is vocab-sized — so with the synth corpus's
    fixed ~1k-word vocabulary, histogram wall must grow with docs while
    the per-round mean stays ~flat, and the ELECTED MERGES must be
    stable-by-construction receipts: rounds == num_merges at every size.
    apply_bpe (the map-only encode) must scale ~linearly, with the piece
    count strictly under the char+EOW floor (merges actually fire)."""
    from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.operators import (
        bpe,
    )

    print("| docs | hist (s) | train total (s) | s/round | apply (s) | "
          "pieces/tokens | rounds |")
    print("|---|---|---|---|---|---|---|")
    out_rows = []
    for n in sizes:
        docs = synth_docs(spark, n, hot=False).persist()
        docs.count()
        t_hist, _ = timed(
            lambda: bpe.word_histogram(docs).localCheckpoint(eager=True).count()
        )
        rep: dict = {}

        def train_once():
            rep.clear()
            return bpe.train_bpe(docs, num_merges=num_merges, report=rep)

        # best-of-2 so the per-round decomposition subtracts a WARM
        # histogram from a warm train (a cold hist inside a single-shot
        # train inflated per-round 3x in the first cut of this receipt)
        t_train, merges = timed(train_once)
        assert rep["rounds"] == num_merges, rep

        def apply_once():
            # one streaming agg pass — NO persist: materializing the
            # ~100M-piece column in the cache is a harness artifact, not
            # the operator (measured 18 s persisted vs 4.7 s streamed at
            # 200k docs)
            agg = bpe.apply_bpe(docs, merges).agg(
                F.sum("n_pieces").alias("p"), F.sum("n_tokens").alias("t")
            ).collect()[0]
            return int(agg.p), int(agg.t)

        t_apply, (n_pieces, n_toks) = timed(apply_once)
        per_round = round((t_train - t_hist) / num_merges, 2)
        print(f"| {docs.count()} | {t_hist} | {t_train} | {per_round} | "
              f"{t_apply} | {round(n_pieces / n_toks, 2)} | {rep['rounds']} |")
        out_rows.append({"docs": n, "hist_s": t_hist, "train_s": t_train,
                         "per_round_s": per_round, "apply_s": t_apply})
        docs.unpersist()
    print(json.dumps({"bpe": out_rows, "num_merges": num_merges}))
    return 0


def dsir_receipt(spark, sizes: list[int]) -> int:
    """r9 receipt: DSIR weighting cost at corpus scale. Target = every
    20th doc (deterministic slice); the plan is two bigram-LM trains plus
    two model joins over the once-exploded raw bigrams — every stage a
    map-side-combined shuffle — so wall per doc must stay ~flat and every
    doc must come back weighted (n rows, no-bigram docs included)."""
    print("| docs | dsir_weights (s) | s per 100k docs | broadcast (s) | rows |")
    print("|---|---|---|---|---|")
    out_rows = []
    for n in sizes:
        docs = synth_docs(spark, n, hot=False).persist()
        n_total = docs.count()
        target = docs.filter(F.col("doc_id") % 20 == 0)

        def weights_once(broadcast=False):
            # consume the VALUES, not just cardinality: a bare count()
            # lets Catalyst prune the model joins and p6 arithmetic out
            # of the plan (measured sub-second at 500k — a non-receipt)
            r = ops.dsir_weights(
                docs, target, broadcast_models=broadcast
            ).agg(
                F.count("*").alias("n"), F.sum("weight6").alias("s")
            ).collect()[0]
            assert int(r.s) > 0
            return int(r.n)

        t, rows = timed(weights_once)
        assert rows == n_total, (rows, n_total)
        # r10: the bounded-vocab deployment's opt-in — both model frames
        # broadcast, all four model joins become map-side
        t_b, rows_b = timed(lambda: weights_once(broadcast=True))
        assert rows_b == n_total, (rows_b, n_total)
        print(f"| {n_total} | {t} | {round(t / (n_total / 1e5), 2)} | "
              f"{t_b} | {rows} |")
        out_rows.append({"docs": n, "dsir_s": t, "dsir_broadcast_s": t_b})
        docs.unpersist()
    print(json.dumps({"dsir": out_rows}))
    return 0


def main() -> int:
    args = [a for a in sys.argv[1:] if a not in ("--longdoc", "--bpe", "--dsir")]
    longdoc = "--longdoc" in sys.argv[1:]
    bpe_mode = "--bpe" in sys.argv[1:]
    dsir_mode = "--dsir" in sys.argv[1:]
    sizes = [int(a) for a in args] or [50_000, 200_000]
    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "false")
        .appName("text_ops_scale")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    if longdoc:
        rc = longdoc_strip_receipt(spark)
        spark.stop()
        return rc
    if bpe_mode:
        rc = bpe_receipt(spark, sizes)
        spark.stop()
        return rc
    if dsir_mode:
        rc = dsir_receipt(spark, sizes)
        spark.stop()
        return rc

    print("| docs | planted | tfidf clean (s) | pairs | tfidf hot (s) | "
          "pairs | bigram LM (s) | novelty (s) | bloom build+probe (s) |")
    print("|---|---|---|---|---|---|---|---|---|")
    for n in sizes:
        planted = int(n * NEAR_DUP_FRAC)
        clean = synth_docs(spark, n, hot=False).persist()
        clean.count()
        t_clean, n_clean = timed(
            lambda: ops.tfidf_cosine_pairs(clean, threshold=0.5).count()
        )
        hotd = synth_docs(spark, n, hot=True).persist()
        hotd.count()
        t_hot, n_hot = timed(
            lambda: ops.tfidf_cosine_pairs(hotd, threshold=0.5).count()
        )

        # r8 cold-single-pass receipt (verdict item 7): each call below
        # builds a FRESH weighted-postings frame (new persist), so the
        # measurement is cold by construction even though the JVM and the
        # docs cache are warm. Default lazy persist lets the three
        # consumer stages race the cache (each can pay the SHA-256
        # shingle explode); materialize=True pays ONE serial explode pass
        # then fans out over cache. Single pass, no best-of-2 — cold is
        # the point.
        t0 = time.monotonic()
        n_cold = ops.tfidf_cosine_pairs(clean, threshold=0.5).count()
        t_cold_lazy = round(time.monotonic() - t0, 2)
        t0 = time.monotonic()
        n_mat = ops.tfidf_cosine_pairs(clean, threshold=0.5, materialize=True).count()
        t_cold_mat = round(time.monotonic() - t0, 2)
        assert n_cold == n_mat == n_clean, (n_cold, n_mat, n_clean)

        def lm():
            model, vocab_df = ops.train_bigram_lm(clean)
            return ops.bigram_lm_scores(clean, model, vocab_df).count()

        t_lm, n_lm = timed(lm)
        t_nov, _ = timed(lambda: ops.novelty_scores(clean).count())

        def bloom():
            from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.functions.text import (
                tokens,
                word_shingles,
            )

            sh = clean.select(
                "doc_id",
                F.explode(
                    F.array_distinct(word_shingles(tokens(F.col("text")), 3))
                ).alias("shingle"),
            )
            corpus_keys = (
                sh.filter(F.col("doc_id") % 5 != 0).select("shingle").distinct()
            )
            probes = sh.filter(F.col("doc_id") % 5 == 0).select("shingle").distinct()
            b = ops.bloom_build(corpus_keys, "shingle", m=1 << 22)
            return ops.bloom_probe(b, probes, "shingle", m=1 << 22).count()

        t_bloom, _ = timed(bloom)

        # r8 asym-containment receipt: plant one EXTREME-size-ratio subset
        # pair per 20 docs (a 14-token excerpt of a 120-token doc —
        # Jaccard ~ 0.1, so MinHash-LSH band collision ~ j^4 = 1e-4 per
        # band: structurally invisible to the Jaccard path). The bottom-k
        # generator must recover EVERY planted subset (a true subset
        # matches on all k sketch hashes) at ~linear wall-clock.
        SUBSET_BASE = 10_000_000
        subsets = clean.filter(F.col("doc_id") % 20 == 0).select(
            (F.col("doc_id") + SUBSET_BASE).alias("doc_id"),
            F.array_join(
                F.slice(F.split(F.col("text"), " "), 1, 14), " "
            ).alias("text"),
        )
        n_subsets = subsets.count()
        corpus = clean.unionByName(subsets).persist()
        corpus.count()

        def asym():
            out = ops.asym_containment_pairs(corpus, threshold=0.9).persist()
            total = out.count()
            # the subset doc carries the HIGHER id, so after canonical
            # (a < b) ordering it is doc_b and full containment is
            # containment_b (|B n A| / |B| with B the excerpt)
            found = out.filter(
                (F.col("doc_b") >= SUBSET_BASE)
                & (F.col("doc_a") == F.col("doc_b") - SUBSET_BASE)
                & (F.col("containment_b") == 1.0)
            ).count()
            out.unpersist()
            return total, found

        t_asym, (n_asym, n_sub_found) = timed(asym)
        corpus.unpersist()

        # r8 substring-run receipt: stamp ONE fixed 60-token passage plus
        # a DOC-UNIQUE separator token onto every 10th doc. The separator
        # matters: without it, window 12 (passage tail + the doc's first
        # random token) is duplicated whenever an earlier stamped doc
        # starts with the same vocab word (~always at 1000-word vocab),
        # legitimately extending the run past the passage. With it,
        # exactly windows 1..11 are duplicated, so every stamped doc
        # EXCEPT the first must emit exactly one maximal run (start 1,
        # end 60, 11 windows, src = first stamped id); clean docs emit
        # nothing. ~72 windows/doc hashed — wall must stay ~linear in
        # corpus size.
        # base docs only (ids < n): the appended near-dup copies would
        # legitimately emit their own base-duplicating runs and obscure
        # the exact expected count
        passage = " ".join(f"p{i:03d}" for i in range(60))
        stamped = clean.filter(F.col("doc_id") < n).withColumn(
            "text",
            F.when(
                F.col("doc_id") % 10 == 0,
                F.concat(
                    F.lit(passage + " u"),
                    F.col("doc_id").cast("string"),
                    F.lit(" "),
                    F.col("text"),
                ),
            ).otherwise(F.col("text")),
        ).persist()
        n_stamped = stamped.filter(F.col("doc_id") % 10 == 0).count()

        def substr():
            out = ops.substring_duplicate_runs(stamped, run_n=50).persist()
            total = out.count()
            exact = out.filter(
                (F.col("start_tok") == 1)
                & (F.col("end_tok") == 60)
                & (F.col("n_windows") == 11)
                & (F.col("src_doc") == 0)
            ).count()
            out.unpersist()
            return total, exact

        t_substr, (n_runs, n_exact) = timed(substr)
        substr_ok = n_runs == n_exact == n_stamped - 1

        # fixpoint receipt: on this corpus the doc-unique separator makes
        # every junction window unique, so strip_until_clean must converge
        # in exactly 2 detection passes (strip round + the proving empty
        # pass) at ~2x the single-detection cost. Single pass — the loop
        # is eager by design.
        fx_report: dict = {}
        t0 = time.monotonic()
        fixed = ops.strip_until_clean(stamped, run_n=50, report=fx_report)
        n_fixed = fixed.count()
        t_fix = round(time.monotonic() - t0, 2)
        fix_ok = (
            fx_report.get("converged") is True
            and fx_report.get("rounds") == 2
            and n_fixed == n + 0  # every base doc survives as a row
        )
        stamped.unpersist()

        print(
            f"| {n + planted} | {planted} | {t_clean} | {n_clean} | {t_hot} | "
            f"{n_hot} | {t_lm} | {t_nov} | {t_bloom} |"
        )
        print(
            f"asym containment: {t_asym} s, {n_asym} pairs >= 0.9, planted "
            f"subsets recovered {n_sub_found}/{n_subsets}"
            + ("" if n_sub_found == n_subsets else "  <-- RECALL MISS")
        )
        print(
            f"tfidf cold single pass: lazy {t_cold_lazy} s vs "
            f"materialize=True {t_cold_mat} s (warm best-of-2 {t_clean} s)"
        )
        print(
            f"substring runs: {t_substr} s, {n_runs} maximal runs "
            f"({n_exact} exactly (1,60,11,src=0)) from {n_stamped} stamped docs"
            + ("" if substr_ok else "  <-- SPAN/ATTRIBUTION MISS")
        )
        print(
            f"strip fixpoint: {t_fix} s, rounds={fx_report.get('rounds')} "
            f"runs_per_round={fx_report.get('runs_per_round')}"
            + ("" if fix_ok else "  <-- FIXPOINT MISS")
        )
        print(json.dumps({
            "docs": n + planted, "planted": planted,
            "tfidf_clean_s": t_clean, "tfidf_clean_pairs": n_clean,
            "tfidf_cold_lazy_s": t_cold_lazy, "tfidf_cold_mat_s": t_cold_mat,
            "tfidf_hot_s": t_hot, "tfidf_hot_pairs": n_hot,
            "bigram_lm_s": t_lm, "lm_rows": n_lm,
            "novelty_s": t_nov, "bloom_s": t_bloom,
            "asym_s": t_asym, "asym_pairs": n_asym,
            "asym_subsets_planted": n_subsets,
            "asym_subsets_found": n_sub_found,
            "substr_s": t_substr, "substr_runs": n_runs,
            "substr_exact": n_exact, "substr_stamped": n_stamped,
            "strip_fix_s": t_fix, "strip_fix_rounds": fx_report.get("rounds"),
        }))
        clean.unpersist()
        hotd.unpersist()
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
