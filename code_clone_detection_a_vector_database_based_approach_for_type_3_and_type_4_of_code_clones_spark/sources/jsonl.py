"""JSONL (newline-delimited JSON) source + sink (beyond-reference
extension).

The reference ingests CSV and raw text directories; real training corpora
ship overwhelmingly as JSONL shards (one document object per line). Two
scale rules drive this module:

- **Explicit schema, always.** ``spark.read.json`` without a schema runs a
  FULL extra pass over the data to infer one — at 100 TB that doubles the
  ingest cost before the first real byte of work. Callers pass a DDL
  string / StructType; ``DOCUMENT_SCHEMA`` covers the engine's standard
  document shape.
- **Corrupt lines are counted, not crashed on** (the S3/P6 error-tolerance
  contract): PERMISSIVE mode routes unparseable lines into a corrupt-record
  column so the drop is observable, same as ``build_corpus``'s
  ``dropped_row_count``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DOCUMENT_SCHEMA = (
    "doc_id bigint, text string, lang string, source string, n_chars bigint"
)
CORRUPT_COL = "_corrupt_record"


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: str = DOCUMENT_SCHEMA,
    keep_corrupt: bool = False,
) -> DataFrame:
    """Read a JSONL file/directory with an EXPLICIT schema. Unparseable
    lines are dropped at parse time (DROPMALFORMED — no second pass, no
    corrupt-column materialization); use ``corrupt_line_count`` to make the
    drop observable, or ``keep_corrupt=True`` to get the raw line in
    ``_corrupt_record`` for quarantine sinks (note Spark's restriction:
    cache/save the parsed result before running corrupt-column-only
    queries on it)."""
    if keep_corrupt:
        return spark.read.schema(f"{schema}, {CORRUPT_COL} string").option(
            "mode", "PERMISSIVE"
        ).option("columnNameOfCorruptRecord", CORRUPT_COL).json(path)
    return spark.read.schema(schema).option("mode", "DROPMALFORMED").json(path)


def corrupt_line_count(spark: SparkSession, path: str, schema: str = DOCUMENT_SCHEMA) -> int:
    """Observability twin of ``read_jsonl``'s drop: how many lines failed
    to parse under the given schema. Caches the parsed batch around the
    count (Spark disallows corrupt-record-only scans on raw files)."""
    df = read_jsonl(spark, path, schema, keep_corrupt=True).cache()
    try:
        return df.filter(F.col(CORRUPT_COL).isNotNull()).count()
    finally:
        df.unpersist()


def write_jsonl(df: DataFrame, path: str, mode: str = "error", single_file: bool = False) -> None:
    """Write a DataFrame as JSONL. ``single_file`` coalesces to one shard
    (for small exports / fixtures — never at scale)."""
    out = df.coalesce(1) if single_file else df
    out.write.mode(mode).json(path)
