"""Z-order layout tests: Morton-key correctness vs a pure-Python oracle,
and the row-group pruning receipt — a 2-D box predicate must read
materially fewer row groups under the Z-ordered layout than under a 1-D
sort (operators/layout.py)."""

import pytest
from pyspark.sql import functions as F

from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.operators.layout import (
    file_pruning_stats,
    interleave_bits,
    write_zordered,
    zorder_key,
)


def _morton(a: int, b: int, bits: int) -> int:
    z = 0
    for i in range(bits):
        z |= ((a >> i) & 1) << (2 * i)
        z |= ((b >> i) & 1) << (2 * i + 1)
    return z


def test_interleave_matches_python_oracle(spark):
    rows = [(a, b) for a in (0, 1, 2, 3, 5, 255) for b in (0, 1, 7, 128, 255)]
    df = spark.createDataFrame(rows, "a long, b long")
    got = {
        (r.a, r.b): r.z
        for r in df.select(
            "a", "b", interleave_bits(F.col("a"), F.col("b"), 8).alias("z")
        ).collect()
    }
    for (a, b), z in got.items():
        assert z == _morton(a, b, 8), (a, b)


def test_zorder_key_locality(spark):
    """Neighbors in (c1, c2) space get nearby z-keys: the max z-key within
    a small box is far below the global max (the clustering property the
    layout exploits)."""
    rows = [(i, j) for i in range(32) for j in range(32)]
    df = spark.createDataFrame(rows, "x long, y long")
    out = {(r.x, r.y): r.zkey for r in zorder_key(df, "x", "y", bits=5).collect()}
    assert len(out) == 1024
    assert len(set(out.values())) == 1024  # bijective on the grid
    # the (0..7, 0..7) box is exactly the first 64 z-values
    box = {out[(i, j)] for i in range(8) for j in range(8)}
    assert box == set(range(64))


@pytest.fixture(scope="module")
def layouts(spark, sf_dir, tmp_path_factory):
    from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.sources.events import (
        load_events_micros,
    )

    base = tmp_path_factory.mktemp("layouts")
    ev = load_events_micros(spark, sf_dir).select("event_id", "user_id", "ts")
    n_files = 16
    # unsorted baseline (hash-scattered), 1-D ts-sorted, and z-ordered
    ev.repartition(n_files).write.mode("overwrite").parquet(f"{base}/unsorted")
    (
        ev.repartitionByRange(n_files, "ts")
        .sortWithinPartitions("ts")
        .write.mode("overwrite")
        .parquet(f"{base}/ts_sorted")
    )
    write_zordered(ev, f"{base}/zordered", "user_id", "ts", bits=10,
                   n_files=n_files)
    stats = ev.agg(
        F.min("user_id"), F.max("user_id"), F.min("ts"), F.max("ts")
    ).first()
    return str(base), stats, ev


def test_zorder_prunes_2d_box(spark, layouts):
    base, st, ev = layouts
    umin, umax, tmin, tmax = st
    # a selective 2-D box: ~1/8 of users x ~1/8 of the time range
    ubox = (umin, umin + max(1, (umax - umin) // 8))
    tbox = (tmin, tmin + max(1, (tmax - tmin) // 8))
    box = {"user_id": ubox, "ts": tbox}

    frac = {
        name: file_pruning_stats(f"{base}/{name}", box)["read_fraction"]
        for name in ("unsorted", "ts_sorted", "zordered")
    }
    # unsorted layout cannot prune the box at all (every file spans both
    # domains); ts_sorted prunes the time dimension; z-order prunes BOTH
    # — never worse than the 1-D sort, and far below the full scan
    assert frac["unsorted"] == 1.0
    assert frac["zordered"] <= frac["ts_sorted"] <= 1.0
    assert frac["zordered"] <= 0.5

    # the sharper discriminator: a USER-only slice (full time range) —
    # the ts-sorted layout is powerless (every file spans all users), the
    # z-ordered layout still prunes because every file is a bounding box
    # in BOTH dimensions
    ubox_only = {"user_id": ubox}
    f_ts = file_pruning_stats(f"{base}/ts_sorted", ubox_only)["read_fraction"]
    f_z = file_pruning_stats(f"{base}/zordered", ubox_only)["read_fraction"]
    assert f_ts == 1.0
    assert f_z < 1.0

    # pruning is an optimization, never a semantics change: the box query
    # returns identical rows from every layout
    want = ev.filter(
        F.col("user_id").between(*box["user_id"])
        & F.col("ts").between(*box["ts"])
    ).count()
    for name in ("unsorted", "ts_sorted", "zordered"):
        got = (
            spark.read.parquet(f"{base}/{name}")
            .filter(
                F.col("user_id").between(*box["user_id"])
                & F.col("ts").between(*box["ts"])
            )
            .count()
        )
        assert got == want, name


def test_bits_validation(spark):
    """bits outside [1, 31] must fail fast: 0 is degenerate and >= 32
    would push interleaved bits into the long sign bit, silently breaking
    the z-order (negative keys sort first)."""
    df = spark.createDataFrame([(1, 2)], "x long, y long")
    for bad in (0, 32, 64):
        with pytest.raises(ValueError, match="bits"):
            zorder_key(df, "x", "y", bits=bad)
