"""Distributed BPE tokenizer training + corpus encoding (beyond-reference
extension; BASELINE.json north star: "token counting" made trainable).

A training-data pipeline doesn't just COUNT tokens (functions/text.py's
``bpe_tokens`` regex surrogate) — it TRAINS the tokenizer on the corpus
it just curated (Sennrich et al. 2016, "Neural Machine Translation of
Rare Words with Subword Units"; the GPT-2/LLaMA lineage trains merges the
same way). The classic algorithm is a corpus-scale loop; the engine's
re-expression makes the corpus-scale part run EXACTLY ONCE:

1. **Word histogram — the only corpus-scale pass.** One explode +
   map-side-combinable ``groupBy(word)``; everything after operates on
   the vocab-sized ``(word, cnt)`` frame (natural-language vocabularies
   are millions of rows where corpora are billions — this is the same
   reduction fastBPE / HuggingFace trainers rely on, here as a Spark
   shuffle instead of a single-node hash map). ``max_words`` caps the
   histogram deterministically (count desc, word asc) when even the
   vocabulary is too hot to iterate.
2. **Merge rounds on the vocab-sized frame.** Each round: adjacent-pair
   counts (one explode + one map-side-combined groupBy over vocab-sized
   input), elect the most frequent pair (count desc, then lexicographic
   — pinned so ties are deterministic across engines), and apply the
   merge as ONE string ``replace`` per word. Rounds are
   ``localCheckpoint``ed per the engine's iterative-plan law
   (duplicate_groups / strip_until_clean precedent); the top-1 collect
   per round is loop control on a 1-row frame.

**The sentinel representation is the whole trick.** A word's symbol
sequence renders as ``·c··a··t··</w>·`` (every symbol wrapped in a
middle-dot SEP, so adjacency is the 2-char ``··``). Merging pair (l, r)
is then ``replace(rendered, '·l··r·', '·lr·')`` — and left-to-right
non-overlapping ``replace`` semantics (identical in Spark and ANSI SQL)
are EXACTLY BPE's greedy merge order: ``·a··a··a·`` under (a,a) becomes
``·aa··a·``, never ``·a··aa·``. No lookaround regex, no per-row Python.
Because each round is one deterministic expression over integer counts,
the whole training history replays bit-for-bit in a statically-unrolled
SQL oracle (tests/test_bpe.py's ``bpe_sql`` — the strip_until_clean /
kmeans_lloyd precedent, staged for an r10 graded entry).

Words containing the sentinel character itself (U+00B7) are excluded
from TRAINING (they cannot render; vanishingly rare, and the histogram
filter makes the exclusion explicit) — the encode paths still tokenize
them via their own merge walk.

**Encoding** (``apply_bpe``) is the production path: merges collect to
the driver (bounded by ``num_merges`` — driver-small by construction,
the centroid-bank pattern) and an Arrow-batched ``mapInPandas`` kernel
applies them per DISTINCT word with a per-batch memo — word frequency
follows Zipf, so the memo turns per-token work into per-type work. The
expression twin ``apply_bpe_expr`` runs the same ranked replace chain as
pure column expressions (the SQL-replayable form; requires sentinel-free
text, which the UDF path does not). Applying merges in rank order is
equivalent to the lowest-rank-first iterative form: a merge's pattern
can only be created by LOWER-ranked merges, never later ones.

At 100 TB: the histogram shuffle is the only thing that scales with the
corpus; ``num_merges`` rounds each cost one vocab-sized job; encoding is
a map-only pass whose per-task cost is per-distinct-word, not per-token.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens

__all__ = [
    "word_histogram",
    "train_bpe",
    "bpe_vocab",
    "apply_bpe",
    "apply_bpe_expr",
    "SEP",
    "EOW",
]

SEP = "·"  # middle dot — the symbol-boundary sentinel
EOW = "</w>"  # end-of-word marker symbol (Sennrich-style)

_MERGES_SCHEMA = "rank int, left string, right string, pair_count bigint"


def _render(syms: Column) -> Column:
    """array<string> symbols -> sentinel string ``·s1··s2··...··sn·``."""
    return F.concat(F.lit(SEP), F.array_join(syms, SEP + SEP), F.lit(SEP))


def _split_syms(rendered: Column) -> Column:
    """Inverse of ``_render``: strip the outer single SEPs, split on the
    double-SEP adjacency boundary."""
    inner = rendered.substr(F.lit(2), F.length(rendered) - F.lit(2))
    return F.split(inner, SEP + SEP)


def _chars_plus_eow(word: Column) -> Column:
    """Initial symbol sequence of a word: its characters + the EOW marker."""
    return F.concat(
        F.regexp_extract_all(word, F.lit("."), 0), F.array(F.lit(EOW))
    )


def word_histogram(docs: DataFrame, text_col: str = "text",
                   max_words: int | None = None) -> DataFrame:
    """The one corpus-scale pass: ``(word, cnt, rendered)`` over the
    lowercased whitespace token stream (the engine's ``tokens()`` unit).
    ``rendered`` is the initial character-level sentinel form. Words
    containing the sentinel are excluded (module contract);
    ``max_words`` keeps only the top-N by (cnt desc, word asc)."""
    hist = (
        docs.select(F.explode(tokens(F.col(text_col))).alias("word"))
        .filter(~F.col("word").contains(SEP))
        .groupBy("word")
        .agg(F.count("*").cast("bigint").alias("cnt"))
    )
    if max_words is not None:
        hist = hist.orderBy(F.desc("cnt"), "word").limit(max_words)
    return hist.select(
        "word", "cnt", _render(_chars_plus_eow(F.col("word"))).alias("rendered")
    )


def _pair_counts(hist: DataFrame) -> DataFrame:
    """Weighted adjacent-pair counts over the vocab-sized histogram:
    ``(left, right, pair_count)``. Symbols are pre-projected once so the
    pair transform never re-inlines the split (the engine's documented
    re-inlining hazard)."""
    syms = hist.select("cnt", _split_syms(F.col("rendered")).alias("syms"))
    pairs = F.when(
        F.size("syms") >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size("syms") - 1),
            lambda i: F.struct(
                F.element_at(F.col("syms"), i).alias("l"),
                F.element_at(F.col("syms"), i + 1).alias("r"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<l:string,r:string>>"))
    return (
        syms.select("cnt", F.explode(pairs).alias("p"))
        .groupBy(F.col("p.l").alias("left"), F.col("p.r").alias("right"))
        .agg(F.sum("cnt").alias("pair_count"))
    )


def _merge_expr(rendered: Column, left: str, right: str) -> Column:
    """Apply merge (left, right) to a sentinel string: one replace whose
    left-to-right non-overlapping semantics IS the greedy merge order."""
    return F.replace(
        rendered,
        F.lit(SEP + left + SEP + SEP + right + SEP),
        F.lit(SEP + left + right + SEP),
    )


def train_bpe(docs: DataFrame, num_merges: int = 32, min_count: int = 2,
              text_col: str = "text", max_words: int | None = None,
              report: dict | None = None) -> DataFrame:
    """Train ``num_merges`` BPE merges on the corpus. Stops early when the
    best remaining pair's count drops below ``min_count`` (merging
    singletons memorizes the corpus instead of compressing it).

    Returns the ranked merge table ``(rank, left, right, pair_count)`` —
    rank 1 applied first. Pass ``report`` (dict) to receive
    ``rounds`` (merges actually learned) and ``histogram`` (the final
    vocab-sized ``(word, cnt, rendered)`` frame — its rendered column is
    the training corpus segmentation, useful for vocab extraction)."""
    spark = docs.sparkSession
    hist = word_histogram(docs, text_col, max_words).localCheckpoint(
        eager=True
    )
    merges: list[tuple[int, str, str, int]] = []
    # r12: checkpoint every CKPT_EVERY rounds instead of every round —
    # between checkpoints the lineage is at most CKPT_EVERY-1 nested
    # vocab-sized `replace` projections (linear, collapsed into one
    # Project by the optimizer; NOT the exponential CTE-re-inlining
    # hazard, which this module's oracle renderer guards separately), so
    # each top-1 job replays a few cheap string maps while ~3/4 of the
    # eager checkpoint jobs disappear (2 jobs/round -> ~1.25)
    ckpt_every = 4
    pending = 0
    for rank in range(1, num_merges + 1):
        top = (
            _pair_counts(hist)
            .orderBy(F.desc("pair_count"), "left", "right")
            .limit(1)
            .collect()
        )
        if not top or int(top[0].pair_count) < min_count:
            break
        left, right, c = top[0].left, top[0].right, int(top[0].pair_count)
        merges.append((rank, left, right, c))
        # vocab-sized map-only round; periodic checkpoint bounds lineage
        hist = hist.withColumn(
            "rendered", _merge_expr(F.col("rendered"), left, right)
        )
        pending += 1
        if pending >= ckpt_every:
            hist = hist.localCheckpoint(eager=True)
            pending = 0
    if pending and report is not None:
        # flush the tail: report["histogram"] must hand consumers a
        # materialized leaf, not up to ckpt_every-1 pending merge
        # projections that every downstream action would replay. Only
        # when a report is requested — otherwise the pending lineage is
        # dropped unused and the flush would be a pure extra job.
        hist = hist.localCheckpoint(eager=True)
    if report is not None:
        report["rounds"] = len(merges)
        report["histogram"] = hist
    return spark.createDataFrame(merges, _MERGES_SCHEMA)


def bpe_vocab(histogram: DataFrame) -> DataFrame:
    """The piece vocabulary implied by a trained histogram (the
    ``report["histogram"]`` frame ``train_bpe`` returns — its rendered
    column is the final segmentation of every training word): one row
    per distinct piece with ``n_words`` (how many word types contain it)
    and ``total_cnt`` (corpus token occurrences — the frequency a
    tokenizer ships in its vocab file). Vocab-sized input, one explode +
    one map-side-combined groupBy."""
    syms = histogram.select(
        "word", "cnt", F.explode(_split_syms(F.col("rendered"))).alias("piece")
    )
    return syms.groupBy("piece").agg(
        F.count_distinct("word").cast("bigint").alias("n_words"),
        F.sum("cnt").cast("bigint").alias("total_cnt"),
    )


def _collect_ranked(merges: DataFrame) -> list[tuple[str, str]]:
    """Driver-small by construction: bounded by num_merges."""
    return [
        (r.left, r.right)
        for r in merges.select("rank", "left", "right").orderBy("rank").collect()
    ]


def _encode_word(word: str, ranked: list[tuple[str, str]]) -> list[str]:
    """Sequential ranked merges over one word's symbols — the Python twin
    of the sentinel replace chain (greedy left-to-right per merge)."""
    syms: list[str] = list(word) + [EOW]
    for left, right in ranked:
        i, out = 0, []
        n = len(syms)
        while i < n:
            if i + 1 < n and syms[i] == left and syms[i + 1] == right:
                out.append(left + right)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def apply_bpe(docs: DataFrame, merges: DataFrame, text_col: str = "text",
              id_col: str = "doc_id") -> DataFrame:
    """Encode the corpus under a trained merge table — the production
    path: tokenization stays in Spark (exact parity with training's
    ``tokens()`` unit), the ranked merges ride the task closure, and an
    Arrow-batched ``mapInPandas`` kernel encodes each DISTINCT word once
    per batch (Zipf makes the memo hit rate ~1 for natural text). Pieces
    keep the ``</w>`` marker as learned (merged into word-final pieces
    once training elects those merges).

    Output: ``doc_id, pieces array<string>, n_tokens, n_pieces`` for
    every input doc (empty docs encode to empty pieces, kept)."""
    ranked = _collect_ranked(merges)
    toked = docs.select(
        F.col(id_col).alias("doc_id"), tokens(F.col(text_col)).alias("toks")
    )
    # id dtype follows the input (the exact_knn_fast pattern): string/UUID
    # doc ids must survive the Arrow round-trip, not coerce to bigint
    id_type = dict(docs.dtypes)[id_col]

    def encode(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        memo: dict[str, list[str]] = {}
        for pdf in batches:
            pieces_col, ntok_col, npc_col = [], [], []
            for toks in pdf["toks"]:
                out: list[str] = []
                for w in toks:
                    enc = memo.get(w)
                    if enc is None:
                        enc = _encode_word(w, ranked)
                        memo[w] = enc
                    out.extend(enc)
                pieces_col.append(out)
                ntok_col.append(len(toks))
                npc_col.append(len(out))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "pieces": pieces_col,
                    "n_tokens": ntok_col,
                    "n_pieces": npc_col,
                }
            )

    return toked.mapInPandas(
        encode,
        f"doc_id {id_type}, pieces array<string>, n_tokens bigint, n_pieces bigint",
    )


def apply_bpe_expr(docs: DataFrame, merges: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    """The SQL-replayable expression twin of ``apply_bpe``: per token,
    render -> ranked replace chain -> split, then flatten per doc. Pure
    column expressions (expression size grows with num_merges — the twin
    is for oracles and modest merge tables, the UDF path for production).
    Requires sentinel-free text (module contract); tokens containing the
    sentinel are dropped to keep the representation sound — the parity
    test pins both paths on sentinel-free corpora where the filter is a
    no-op."""
    ranked = _collect_ranked(merges)

    def encode_tok(t: Column) -> Column:
        r = _render(_chars_plus_eow(t))
        for left, right in ranked:
            r = _merge_expr(r, left, right)
        return _split_syms(r)

    toked = docs.select(
        F.col(id_col).alias("doc_id"),
        F.filter(
            tokens(F.col(text_col)), lambda t: ~t.contains(SEP)
        ).alias("toks"),
    )
    return toked.select(
        "doc_id",
        F.flatten(F.transform("toks", encode_tok)).alias("pieces"),
        F.size("toks").cast("bigint").alias("n_tokens"),
    ).withColumn("n_pieces", F.size("pieces").cast("bigint"))
