"""Multi-dimensional file layout: Z-order clustering for row-group
pruning (beyond-reference extension; the open-source-Spark gap the Delta/
Iceberg OPTIMIZE ZORDER command fills in lakehouse engines).

Why it exists at 100 TB: parquet scans prune ROW GROUPS by min/max
statistics. A table sorted by one column prunes filters on that column
and nothing else; a table with a 2-D predicate (``user_id BETWEEN ... AND
ts BETWEEN ...`` — the retention-join / sessionize-window shape) reads
almost every row group of a 1-D-sorted layout because the second column's
ranges span the whole domain inside every file. Interleaving the bits of
both (scaled) columns into one Z-order key and range-partitioning + sorting
by it gives every file a tight bounding BOX in (c1, c2) space, so BOTH
columns' min/max stats become selective at once — data-layout clustering,
orthogonal to partition pruning and free at read time.

Everything is deterministic integer/IEEE arithmetic expressed identically
in Spark and the DuckDB oracle:

- per-dimension scaling ``q = floor((c - min) / (max - min + 1) * 2^bits)``
  — the ratio is ONE IEEE division of exact inputs and the power-of-two
  multiply is exact (exponent shift), so both engines floor the same
  value. Crucially this STRETCHES small domains across the full bit
  range: a divide-by-step scaling leaves a narrow dimension's high bits
  all zero and the interleave silently degenerates to a 1-D sort on the
  other dimension (found by the pruning test);
- bit interleave ``z = sum_i ((q1>>i & 1) << 2i | (q2>>i & 1) << 2i+1)``
  — pure bigint bit ops.

The write path (``write_zordered``) is one range shuffle on the z-key +
a file-local sort — the same single-wide-op discipline as the shard
exporter. ``file_pruning_stats`` computes the receipt from parquet
footers: the fraction of row groups a (c1, c2) box predicate must read
under a given layout.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _check_bits(bits: int) -> None:
    # 2*bits interleaved bits must fit a signed long WITHOUT touching the
    # sign bit: bits=32 would shift q2's top bit to position 63, making
    # high keys NEGATIVE and range-sorting them before all positive keys —
    # silently destroying the Morton clustering (r5 review finding)
    if not 1 <= bits <= 31:
        raise ValueError(f"bits must be in [1, 31], got {bits}")


def scale_to_bits(c: Column, cmin: Column, cmax: Column, bits: int) -> Column:
    """``floor((c - cmin) / (cmax - cmin + 1) * 2^bits)`` — maps
    [cmin, cmax] onto [0, 2^bits), STRETCHING narrow domains across the
    full bit range so every dimension contributes high interleave bits
    (see module docstring for the cross-engine exactness argument and why
    a divide-by-step form is wrong here)."""
    _check_bits(bits)
    ratio = (c - cmin).cast("double") / (cmax - cmin + F.lit(1)).cast("double")
    return F.floor(ratio * F.lit(float(1 << bits))).cast("bigint")


def interleave_bits(q1: Column, q2: Column, bits: int) -> Column:
    """Z-order (Morton) key of two already-scaled bigints in [0, 2^bits):
    bit i of ``q1`` lands at position 2i, bit i of ``q2`` at 2i+1."""
    _check_bits(bits)
    one = F.lit(1)
    out = None
    for i in range(bits):
        t1 = F.shiftleft(F.shiftright(q1, i).bitwiseAND(one), 2 * i)
        t2 = F.shiftleft(F.shiftright(q2, i).bitwiseAND(one), 2 * i + 1)
        term = t1.bitwiseOR(t2)
        out = term if out is None else out.bitwiseOR(term)
    return out.cast("bigint")


def zorder_key(
    df: DataFrame, col1: str, col2: str, bits: int = 12
) -> DataFrame:
    """Append ``zkey``: the Z-order key of (col1, col2) scaled against the
    frame's OWN min/max (computed as a lazy 1-row broadcast — building the
    plan executes nothing). Both inputs must be integral columns."""
    stats = df.agg(
        F.min(col1).alias("__min1"),
        F.max(col1).alias("__max1"),
        F.min(col2).alias("__min2"),
        F.max(col2).alias("__max2"),
    )
    q1 = scale_to_bits(F.col(col1), F.col("__min1"), F.col("__max1"), bits)
    q2 = scale_to_bits(F.col(col2), F.col("__min2"), F.col("__max2"), bits)
    return (
        df.crossJoin(F.broadcast(stats))
        .withColumn("zkey", interleave_bits(q1, q2, bits))
        .drop("__min1", "__max1", "__min2", "__max2")
    )


def write_zordered(
    df: DataFrame,
    out_dir: str,
    col1: str,
    col2: str,
    bits: int = 12,
    n_files: int = 16,
) -> None:
    """Cluster ``df`` on the Z-order of (col1, col2) and write ``n_files``
    parquet files, each covering a tight bounding box in (col1, col2)
    space: ONE range shuffle on the z-key, file-local sort, plain write.
    At 100 TB, ``n_files`` is row-group-budget sizing (files of ~1 GB);
    re-clustering is a rewrite of the affected partition, exactly like
    lakehouse OPTIMIZE."""
    (
        zorder_key(df, col1, col2, bits)
        .repartitionByRange(n_files, "zkey")
        .sortWithinPartitions("zkey")
        .drop("zkey")
        .write.mode("overwrite")
        .parquet(out_dir)
    )


def file_pruning_stats(path: str, box: dict[str, tuple]) -> dict:
    """The layout receipt, computed from parquet FOOTERS (no data read):
    for a conjunctive box predicate ``{col: (lo, hi), ...}``, the fraction
    of row groups whose [min, max] statistics overlap the box — i.e. what
    a stats-pruning scan must actually read under this layout."""
    import glob
    import os

    import pyarrow.parquet as pq

    files = sorted(
        glob.glob(os.path.join(path, "*.parquet"))
        or glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)
    )
    total = 0
    overlapping = 0
    for f in files:
        md = pq.ParquetFile(f).metadata
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
        for rg in range(md.num_row_groups):
            total += 1
            hit = True
            for col, (lo, hi) in box.items():
                if col not in idx:
                    # hive PARTITION columns (batch=/shard= layouts) live
                    # in directory names, not file schemas: footer stats
                    # can't speak to them -> cannot prune -> counts as read
                    continue
                st = md.row_group(rg).column(idx[col]).statistics
                if st is None or st.min is None or st.max is None:
                    continue  # no stats -> cannot prune -> counts as read
                if st.max < lo or st.min > hi:
                    hit = False
                    break
            overlapping += int(hit)
    return {
        "row_groups": total,
        "must_read": overlapping,
        "read_fraction": (overlapping / total) if total else 1.0,
    }
