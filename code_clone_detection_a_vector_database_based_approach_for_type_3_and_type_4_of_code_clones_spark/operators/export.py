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
4. **Leakage-safe splits.** ``split_assignment`` is the deterministic
   hash train/val/test split; ``leakage_safe_split`` hashes the
   DUPLICATE-GROUP id instead of the document id, so near-duplicates
   (which survive any imperfect dedup) can never straddle train and
   test and silently inflate eval numbers.

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


SPLIT_SALT = "split:"
_HASH_SPACE = 1 << 60  # stable_hash64 is uniform on [0, 2^60)


def _split_thresholds(fractions: dict[str, float]) -> list[tuple[str, int]]:
    total = sum(fractions.values())
    if not fractions or abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1.0, got {total}")
    out, cum = [], 0.0
    for name, f in fractions.items():
        if f < 0:
            raise ValueError(f"negative fraction for {name!r}")
        cum += f
        out.append((name, int(cum * _HASH_SPACE)))
    out[-1] = (out[-1][0], _HASH_SPACE)  # close float gap at the top
    return out


def split_assignment(
    docs: DataFrame,
    fractions: dict[str, float] | None = None,
    id_col: str = "doc_id",
    key_col: str | None = None,
) -> DataFrame:
    """Deterministic train/val/test split: ``(id, split)`` where the split
    is chosen by which cumulative-fraction bucket the salted 60-bit hash
    of the SPLIT KEY falls in — integer thresholds, no ``rand()``, stable
    under data layout, re-runs, and cluster size. Map-only.

    ``key_col`` is the leakage lever: by default the key is the document
    id, but passing a DUPLICATE-GROUP id (see ``leakage_safe_split``)
    hashes the group instead, so near-identical documents can never
    straddle train and test — the classic eval-contamination bug with
    per-document random splits over an imperfectly-deduped corpus.
    """
    fractions = fractions or {"train": 0.98, "val": 0.01, "test": 0.01}
    key = F.col(key_col) if key_col else F.col(id_col)
    h = stable_hash64(key, salt=SPLIT_SALT)
    expr = F.lit(None).cast("string")
    for name, threshold in reversed(_split_thresholds(fractions)):
        expr = F.when(h < threshold, F.lit(name)).otherwise(expr)
    return docs.select(F.col(id_col), expr.alias("split"))


def leakage_safe_split(
    docs: DataFrame,
    dup_groups: DataFrame,
    fractions: dict[str, float] | None = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """Group-aware split: documents that are near-duplicates of each other
    (per ``duplicate_groups``' ``(doc_id, group_id)`` output) are split as
    ONE unit — the whole group hashes on its ``group_id``, singletons on
    their own id. Output ``(id, split)`` for every document.

    Scale shape: ``dup_groups`` covers only docs that appear in some
    near-dup pair (a small fraction of a deduped corpus), so the join is
    a broadcast-or-small shuffle against the corpus, and everything after
    is map-side. The group table is exactly what the dedup stage already
    produced — no extra corpus pass."""
    g = dup_groups.select(
        F.col(id_col), F.col("group_id").cast("string").alias("_split_key")
    )
    keyed = docs.select(F.col(id_col)).join(g, id_col, "left").select(
        F.col(id_col),
        F.coalesce(F.col("_split_key"), F.col(id_col).cast("string")).alias(
            "_split_key"
        ),
    )
    return split_assignment(
        keyed, fractions, id_col=id_col, key_col="_split_key"
    )


def write_sharded(
    df: DataFrame,
    out_dir: str,
    n_shards: int,
    id_col: str = "doc_id",
    partition_cols: tuple[str, ...] = ("shard",),
    dynamic: bool = False,
) -> None:
    """The shared shuffle-sort-write kernel behind ``export_shards`` and
    the streaming appender (``streaming/export_stream``) — ONE definition
    of the shard/order contract so batch and stream can never drift:
    salted-hash shard + sort_key, hash repartition ON THE SHARD COLUMN
    (one shuffle, n_shards reduce tasks), shard-local sort, partitioned
    parquet write. ``dynamic`` switches to dynamic partition overwrite
    (rewrite only the partitions present in ``df`` — the streaming
    replay-idempotence mode); extra ``partition_cols`` (e.g. a batch id)
    must already be columns of ``df``.

    Note the Hive layout contract: ``partition_cols`` are encoded in the
    DIRECTORY names, not in the data files. Partition-discovery readers
    (``spark.read.parquet(out_dir)``) recover them as columns; a raw
    per-file loader (pyarrow on one shard's files) gets them from the
    path it chose to read — ``.../shard=7/part-*.parquet`` IS the shard
    label."""
    # `shard` is DERIVED here (the one definition of the contract); an
    # input already carrying one — anything built from shard_assignment
    # output — would produce a duplicate column name and fail the
    # repartition with an ambiguity error. Dropping `shard` specifically
    # is safe BECAUSE the name is this module's own published derivation
    # (a pure function of id_col and n_shards): recomputing yields the
    # same values or corrects a stale n_shards. The ordering key, by
    # contrast, is internal-only and never appears in output — it uses a
    # __-prefixed name so an unrelated caller column called `sort_key`
    # passes through to the written shards untouched instead of being
    # silently dropped (r6 review finding).
    df = df.drop("shard")
    writer = (
        df.select(
            "*",
            (stable_hash64(F.col(id_col), salt=SHARD_SALT) % n_shards).alias(
                "shard"
            ),
            stable_hash64(F.col(id_col), salt=ORDER_SALT).alias("__sort_key"),
        )
        .repartition(n_shards, "shard")
        .sortWithinPartitions("__sort_key", id_col)
        .drop("__sort_key")
        .write.mode("overwrite")
    )
    if dynamic:
        writer = writer.option("partitionOverwriteMode", "dynamic")
    writer.partitionBy(*partition_cols).parquet(out_dir)


def export_shards(
    docs: DataFrame,
    out_dir: str,
    n_shards: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    extra_cols: tuple[str, ...] = (),
) -> None:
    """Write the shuffled corpus as ``{out_dir}/shard=<k>/`` parquet, one
    file per shard, rows in the deterministic order (``write_sharded``
    kernel — see its docstring for the plan shape and the Hive-layout
    contract on the ``shard`` label). Re-running on the same snapshot
    rewrites byte-identical shards (deterministic hash order +
    ``maxRecordsPerFile``-free single file per task)."""
    write_sharded(
        docs.select(id_col, text_col, *extra_cols), out_dir, n_shards, id_col
    )
