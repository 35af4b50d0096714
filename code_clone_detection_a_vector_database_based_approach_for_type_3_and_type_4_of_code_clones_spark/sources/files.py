"""File-tree sources (SURVEY S2/S3/S4, F3, M2).

The reference walks ``datasets/poj104/<class>/<file>.txt`` with ``os.walk``
(poj_utils.py:15-28), hand-batches the file list (poj_utils.py:31-43), reads
bytes and decodes them chardet-tolerantly (poj_utils.py:64-70). Spark-side
this is ONE ``binaryFile`` scan — the data source handles listing,
partitioning and parallel reads; path parsing and decoding are columns.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

try:  # optional; the stdlib fallback covers the fixture data
    import chardet  # type: ignore
except Exception:  # pragma: no cover
    chardet = None


@pandas_udf(StringType())
def _decode_lossy(content: pd.Series) -> pd.Series:
    """Charset-tolerant decode (M2): chardet when available, else UTF-8 with
    latin-1 fallback; undecodable bytes dropped (``errors="ignore"``,
    matching poj_utils.py:67-70)."""

    def dec(b):
        if b is None:
            return None
        if chardet is not None:
            enc = chardet.detect(bytes(b)).get("encoding") or "utf-8"
            try:
                return bytes(b).decode(enc, errors="ignore")
            except LookupError:
                return bytes(b).decode("utf-8", errors="ignore")
        try:
            return bytes(b).decode("utf-8")
        except UnicodeDecodeError:
            return bytes(b).decode("latin-1", errors="ignore")

    return content.map(dec)


def poj_directory_source(
    spark: SparkSession, directory: str, glob: str = "*.txt"
) -> DataFrame:
    """POJ-104-shaped corpus scan: recursive ``binaryFile`` source; the
    parent directory is the problem-class label, the basename the code name
    (F3, poj_utils.py:59-61); contents decoded charset-tolerantly (M2).

    Output: ``clone_type, code_name, code_contents, path``.
    """
    raw = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .option("recursiveFileLookup", "true")
        .load(directory)
    )
    parts = F.split(F.col("path"), "/")
    return raw.select(
        F.element_at(parts, -2).alias("clone_type"),
        F.element_at(parts, -1).alias("code_name"),
        _decode_lossy(F.col("content")).alias("code_contents"),
        F.col("path"),
    )


def source_lines_from_files(spark: SparkSession, directory: str) -> DataFrame:
    """Java-source line table for snippet extraction (S4): ``spark.read.text``
    keeps one row per line; 1-based line numbers assigned per file.

    The line number comes from a window over the textfile's intra-file order.
    Spark's text source preserves order within a partition of a single file;
    for multi-split large files use ``zipWithIndex`` semantics per file —
    here files are function-sized Java sources, always single-split.

    Output: ``name, line_no, line``.
    """
    from pyspark.sql import Window

    raw = (
        spark.read.option("recursiveFileLookup", "true")
        .text(directory)
        .select(
            F.input_file_name().alias("name"),
            F.monotonically_increasing_id().alias("file_pos"),
            F.col("value").alias("line"),
        )
    )
    w = Window.partitionBy("name").orderBy("file_pos")
    return raw.select(
        "name", F.row_number().over(w).alias("line_no"), "line"
    )
