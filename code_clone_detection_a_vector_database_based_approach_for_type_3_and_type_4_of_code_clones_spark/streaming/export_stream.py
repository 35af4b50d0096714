"""Continuous training-data export: Structured Streaming -> deterministic
shard layout (beyond-reference extension; the streaming twin of
``operators/export.export_shards``).

A live corpus grows in increments (crawl drops, nightly dumps); the
export layout must absorb them without rewriting history and without
duplicating rows when a micro-batch replays after a crash. The sink
writes each batch under ``{out_dir}/batch=<id>/shard=<k>/`` with DYNAMIC
partition overwrite:

- the shard id and within-shard order come from the same salted portable
  hashes as the batch exporter, so a document's shard never depends on
  WHEN it arrived;
- ``batch`` is the idempotence key: ``foreachBatch`` replays a batch with
  the same ``batch_id`` and the same rows, and dynamic overwrite rewrites
  exactly the ``batch=<id>`` partitions — effectively-exactly-once with
  no transaction log (the same argument as ``index_ingest_stream``'s
  replace-per-id upsert, keyed on the partition instead of the row);
- the global shard k is the union of the per-batch ``shard=<k>``
  directories — append-only from the reader's point of view. Hive-layout
  contract: ``batch`` and ``shard`` live in the DIRECTORY names, not the
  data files; ``spark.read.parquet(out_dir)`` (or any partition-discovery
  reader) recovers both as columns, and a raw per-file loader targeting
  one shard globs ``*/shard=<k>/*.parquet`` — the path it chose IS the
  shard label.

Scale shape per batch: one hash-partition shuffle on ``shard``, local
sort, dynamic-partition write — identical to the batch exporter, sized by
the increment, never by the accumulated corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.export import write_sharded

DOCUMENT_SCHEMA = "doc_id bigint, text string"


def export_stream(
    spark: SparkSession,
    docs_dir: str,
    out_dir: str,
    n_shards: int,
    schema: str = DOCUMENT_SCHEMA,
    id_col: str = "doc_id",
    max_files_per_trigger: int | None = None,
):
    """Build the (unstarted) streaming writer: call ``.trigger(...)``,
    ``.option("checkpointLocation", ...)`` and ``.start()`` on the result.

    Each micro-batch shards deterministically and lands under
    ``batch=<batch_id>/shard=<k>`` via dynamic partition overwrite (module
    docstring for the idempotence argument)."""
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(docs_dir)

    def sink(batch: DataFrame, batch_id: int) -> None:
        if not batch.take(1):
            return
        # ONE shard/order definition for batch + stream: the shared
        # write_sharded kernel (operators/export.py) — only the batch
        # partition column and dynamic-overwrite mode differ here
        write_sharded(
            batch.withColumn("batch", F.lit(batch_id)),
            out_dir,
            n_shards,
            id_col=id_col,
            partition_cols=("batch", "shard"),
            dynamic=True,
        )

    return stream.writeStream.foreachBatch(sink)


def last_committed_batch(spark: SparkSession, checkpoint_dir: str) -> int | None:
    """Highest FULLY-COMMITTED batch id per the stream's own commit log
    (``<checkpoint>/commits/<batch_id>`` — Spark writes each entry only
    AFTER ``foreachBatch`` returns, so this is the authoritative
    completion record, valid live or stopped). ``None`` if no batch has
    committed yet. Uses the Hadoop FS API so any checkpoint scheme
    (local, HDFS, s3a) works."""
    jvm = spark._jvm
    path = jvm.org.apache.hadoop.fs.Path(checkpoint_dir, "commits")
    fs = path.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(path):
        return None
    ids = []
    for status in fs.listStatus(path):
        name = status.getPath().getName()
        if name.isdigit():  # skips .tmp spill files and metadata
            ids.append(int(name))
    return max(ids) if ids else None


def read_shards_as_of(
    spark: SparkSession,
    out_dir: str,
    max_batch: int | None = None,
    committed_only: bool = False,
    checkpoint_dir: str | None = None,
    schema: str | None = None,
) -> DataFrame:
    """Snapshot read of the streaming shard layout: the corpus AS OF batch
    ``max_batch`` (inclusive; ``None`` = latest). Because the sink is
    append-only at the batch level — a batch id's partitions are written
    once and only ever REWRITTEN with identical content on crash replay —
    ``batch <= N`` is a consistent, reproducible snapshot: the exact
    training corpus a run that consumed batches 0..N saw, recoverable
    forever. Poor-man's time travel with zero manifest machinery; the
    filter is partition pruning on the ``batch`` directory column, so a
    snapshot read scans only its own batches' files.

    CONSISTENCY CAVEAT for ``max_batch=None`` while the stream is LIVE: a
    batch is several ``shard=<k>`` directories with no atomic
    cross-partition commit, so the highest batch id on disk may be
    mid-write (or a crash's partial leftover awaiting replay) — reading
    it is a torn view. The sound fix is ``checkpoint_dir``: the stream's
    own commit log (``commits/<id>``, written only after ``foreachBatch``
    returns) is the authoritative completion record, so the snapshot is
    exactly the committed prefix — live or stopped, including the final
    batch of a finished stream. ``committed_only=True`` WITHOUT a
    checkpoint dir is the legacy pessimistic heuristic: it excludes the
    highest batch id on disk, which is sound only while the stream is
    live (at most one batch in flight, foreachBatch's sequential
    contract) — on a STOPPED stream it over-drops the final committed
    batch, and with exactly one batch on disk it returns an empty frame.
    Prefer ``checkpoint_dir``; ``None`` alone is only consistent when the
    stream is stopped.

    ``schema``: DDL string for the empty-snapshot case when ``out_dir``
    does not exist yet (a monitoring job racing the stream's first write
    — the batch column is appended automatically). Without it, a missing
    ``out_dir`` raises even in checkpoint mode, since the row schema
    cannot be conjured."""
    if checkpoint_dir is not None and max_batch is None:
        max_batch = last_committed_batch(spark, checkpoint_dir)
        if max_batch is None and schema is not None:
            # nothing committed AND possibly nothing written: the only
            # consistent snapshot is empty, and out_dir may not exist yet
            return spark.createDataFrame([], schema + ", batch bigint")
    df = spark.read.parquet(out_dir)
    if checkpoint_dir is not None and max_batch is None:
        return df.filter(F.lit(False))  # nothing committed: empty snapshot
    if max_batch is not None:
        df = df.filter(F.col("batch") <= max_batch)
    elif committed_only:
        top = df.agg(F.max("batch").alias("m"))
        df = df.join(F.broadcast(top)).filter(F.col("batch") < F.col("m")).drop("m")
    return df


def quality_annotate_stream(
    spark: SparkSession,
    docs_dir: str,
    schema: str = DOCUMENT_SCHEMA,
    quality_min: float = 0.25,
    max_dup_shingle_ratio: float = 0.5,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """The map-only curation stages of the prep funnel as a STREAM: as
    document increments arrive, annotate quality score, repetition mass,
    language id, token count, and the resulting ``quality_ok`` flag —
    per-document pure expressions (funnel stage 4 + the text-analysis
    columns), so the streaming twin is the IDENTICAL plan over a
    streaming source, no state, no watermark.

    Returns the streaming DataFrame; write it with
    ``.writeStream.format("parquet").option("checkpointLocation", ...)``
    — Spark's file sink is exactly-once under checkpointing (its commit
    log records which files belong to each batch), so no custom
    idempotence machinery is needed for a pure-map stage. The corpus-wide
    stages (boilerplate df, dedup, decontamination) are inherently batch
    — they need the whole corpus — and stay in plans/corpus_prep; the
    production split is stream-annotate cheap gates at ingest, batch-run
    the corpus-wide passes per snapshot.
    """
    from ..functions.text import language_id, quality_gate_columns, token_stats

    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    docs = reader.parquet(docs_dir)
    # ONE gate definition for batch funnel + stream + parity test
    # (functions.text.quality_gate_columns — r5 review finding)
    gate = quality_gate_columns(
        F.col("text"), quality_min, max_dup_shingle_ratio
    )
    stats = token_stats(F.col("text"))
    return docs.select(
        "*",
        gate["quality"].alias("quality"),
        gate["dup_shingle_ratio"].alias("dup_shingle_ratio"),
        language_id(F.col("text")).alias("lang_pred"),
        stats["n_tokens"].cast("bigint").alias("n_tokens"),
        gate["quality_ok"].alias("quality_ok"),
    )


def lm_score_stream(
    spark: SparkSession,
    docs_dir: str,
    model: DataFrame,
    vocab: DataFrame,
    out_dir: str,
    schema: str = DOCUMENT_SCHEMA,
    max_files_per_trigger: int | None = None,
):
    """Score document increments under a FROZEN bigram LM as they arrive —
    the ingest-time twin of ``operators.lm.bigram_lm_scores``, the same
    split as the quality gates: train the model in batch per corpus
    snapshot, score every new document in-stream against the static model.

    Each micro-batch runs the IDENTICAL batch scorer (one definition —
    the parity test pins stream == batch) with the model/vocab as static
    join sides, and lands under ``batch=<batch_id>`` via dynamic
    partition overwrite, so a crashed batch's replay rewrites exactly its
    own partition (the module-docstring idempotence argument). Scoring is
    per-document — no cross-batch state, no watermark — so a doc's score
    never depends on which increment carried it.

    Returns the (unstarted) writer: call ``.option("checkpointLocation",
    ...)`` / ``.trigger(...)`` / ``.start()`` on it.
    """
    from ..operators.lm import bigram_lm_scores

    # FREEZE the model for real: the scoring join references model/vocab
    # once per micro-batch, and an unpersisted lazy plan would re-run the
    # full bigram-count training aggregation over the train corpus EVERY
    # batch despite the frozen-model framing. Lazy persist keeps writer
    # construction execution-free (the analyze-only property); the first
    # batch materializes the cache, every later batch pays only the
    # scoring join. Model tables are bounded by the corpus bigram
    # vocabulary — the same persist trade as tfidf_cosine_pairs'
    # weighted postings.
    model = model.persist()
    vocab = vocab.persist()

    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(docs_dir)

    def sink(batch: DataFrame, batch_id: int) -> None:
        if not batch.take(1):
            return
        (
            bigram_lm_scores(batch, model, vocab)
            .withColumn("batch", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch")
            .parquet(out_dir)
        )

    return stream.writeStream.foreachBatch(sink)
