"""Training-data export: deterministic global shuffle, sharding, and
token-budget sequence packing (beyond-reference extension).

The reference stops at retrieval — it never has to SHIP a corpus. A
production training-data pipeline does, and the export step has three
hard requirements this module implements Spark-first:

1. **Deterministic global shuffle.** Training wants documents in
   pseudo-random order, reproducibly: re-running the export on the same
   snapshot must produce byte-identical shards (resumable jobs, debugging,
   data lineage). ``shard_assignment`` derives both the shard and the
   within-shard order from salted ``stable_hash64`` (SHA-256-based, engine-
   portable) — no ``rand()``, no ``Date.now``-style nondeterminism, and no
   global ``orderBy`` (a full sort of 100 TB); the hash IS the shuffle.
2. **Bounded shards.** ``n_shards`` controls the unit of downstream
   parallelism (a data-loader worker reads one shard). At 100 TB, size
   n_shards so a shard is ~1-10 GB (e.g. 32k shards); the export is then
   ONE hash-partition shuffle on the shard id, each shard sorted locally —
   ``repartition(shard).sortWithinPartitions(sort_key)`` — never a global
   sort.
3. **Token accounting.** ``shard_stats`` is the per-shard manifest
   (docs/tokens/bytes) a loader needs for length-aware scheduling, as one
   partial-aggregated groupBy; ``pack_sequences`` assigns every document to
   a fixed-token-budget training sequence.

Packing semantics (``pack_sequences``): documents are laid out in the
deterministic shuffle order and cut into CONTIGUOUS chunks at running-sum
budget boundaries — ``seq_id = floor(start_offset / budget)`` where
``start_offset`` is the running token sum before the document. Every
document lands in exactly one sequence; a sequence's total may overshoot
``budget`` by at most one document (the standard "document boundary"
packing approximation — greedy first-fit needs sequential state, this form
is a pure window expression and within one doc of greedy for shuffled
corpora). The window runs per shard in shuffle order, so its sort is local
to a shard — the same scale unit as the export itself.

Everything here is JVM-side expressions (SHA-256, regexp tokenization,
window running sums) — no Python in the hot path, and each output is
bit-reproducible in the DuckDB oracle via ``stable_hash64_sql``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.ids import stable_hash64
from ..functions.text import tokens

SHARD_SALT = "shard:"
ORDER_SALT = "order:"


def shard_assignment(
    docs: DataFrame,
    n_shards: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The deterministic pseudo-shuffle: ``(id, shard, sort_key, n_tokens,
    n_bytes)`` with ``shard = H('shard:'||id) % n_shards`` and ``sort_key =
    H('order:'||id)`` for the within-shard order (ties broken by id — hash
    collisions must not make the order ambiguous). Independent salts keep
    the shard and the order uncorrelated. Map-only: no shuffle until a
    consumer groups or repartitions on ``shard``."""
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    return docs.select(
        F.col(id_col),
        (stable_hash64(F.col(id_col), salt=SHARD_SALT) % n_shards).alias("shard"),
        stable_hash64(F.col(id_col), salt=ORDER_SALT).alias("sort_key"),
        F.size(tokens(F.col(text_col))).cast("bigint").alias("n_tokens"),
        F.octet_length(F.col(text_col)).cast("bigint").alias("n_bytes"),
    )


def shard_stats(
    docs: DataFrame,
    n_shards: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The export manifest: per-shard ``n_docs, n_tokens, n_bytes`` — what
    a length-aware data loader schedules from. One partial-aggregated
    groupBy on the shard id (map-side combine leaves at most ``n_shards``
    rows per task to shuffle)."""
    return (
        shard_assignment(docs, n_shards, id_col, text_col)
        .groupBy("shard")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
            F.sum("n_bytes").alias("n_bytes"),
        )
    )


def pack_sequences(
    docs: DataFrame,
    budget: int,
    n_shards: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Assign every document to a fixed-token-budget training sequence:
    ``(id, shard, seq_id, n_tokens)`` with ``seq_id = floor((running_sum -
    n_tokens) / budget)`` over the deterministic shuffle order within each
    shard (semantics in the module docstring; overshoot bounded by one
    document). The running sum is a per-shard window — the only shuffle is
    the hash partition on ``shard``, and the sort is local to a shard."""
    if budget < 1:
        raise ValueError(f"budget must be >= 1, got {budget}")
    w = (
        Window.partitionBy("shard")
        .orderBy("sort_key", id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        shard_assignment(docs, n_shards, id_col, text_col)
        .withColumn("cum", F.sum("n_tokens").over(w))
        .select(
            F.col(id_col),
            "shard",
            F.floor((F.col("cum") - F.col("n_tokens")) / budget)
            .cast("bigint")
            .alias("seq_id"),
            "n_tokens",
        )
    )


def export_shards(
    docs: DataFrame,
    out_dir: str,
    n_shards: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    extra_cols: tuple[str, ...] = (),
) -> None:
    """Write the shuffled corpus as ``{out_dir}/shard=<k>/`` parquet, one
    file per shard, rows in the deterministic order. The physical plan is
    the 100 TB shape: hash repartition ON THE SHARD COLUMN (one shuffle,
    n_shards reduce tasks), local sort by ``sort_key``, dynamic partition
    write — no global sort, no driver involvement. Re-running on the same
    snapshot rewrites byte-identical shards (deterministic hash order +
    ``maxRecordsPerFile``-free single file per task)."""
    keep = [id_col, text_col, *extra_cols]
    (
        docs.select(
            *keep,
            (stable_hash64(F.col(id_col), salt=SHARD_SALT) % n_shards).alias("shard"),
            stable_hash64(F.col(id_col), salt=ORDER_SALT).alias("sort_key"),
        )
        .repartition(n_shards, "shard")
        .sortWithinPartitions("sort_key", id_col)
        .drop("sort_key")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(out_dir)
    )
