"""Count-Min sketch tests: upper-bound estimates, zero-for-absent,
mergeability by counter summation."""

from pyspark.sql import functions as F

from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.operators.sketch import (
    count_min_build,
    count_min_estimate,
)


def _counts(spark, rows):
    return spark.createDataFrame([(r,) for r in rows], "k string")


def test_cms_estimates_upper_bound_exact(spark):
    rows = ["a"] * 7 + ["b"] * 3 + ["c"]
    df = _counts(spark, rows)
    sketch = count_min_build(df, "k")
    probes = spark.createDataFrame([("a",), ("b",), ("c",), ("zz",)], "k string")
    got = {r.k: r.est for r in count_min_estimate(sketch, probes, "k").collect()}
    exact = {"a": 7, "b": 3, "c": 1, "zz": 0}
    for k, n in exact.items():
        assert got[k] >= n, k            # CMS never under-counts
    # d=4, w=1024, 11 increments: collisions are absent for this input
    assert got == exact


def test_cms_merge_by_counter_sum(spark):
    """sketch(A union B) == sum of counters of sketch(A) and sketch(B) —
    the property that lets per-partition/per-corpus sketches combine with
    a plain groupBy-sum instead of a rebuild."""
    a = _counts(spark, ["x"] * 5 + ["y"])
    b = _counts(spark, ["x"] * 2 + ["z"] * 4)
    merged = (
        count_min_build(a, "k")
        .unionByName(count_min_build(b, "k"))
        .groupBy("row_i", "bucket")
        .agg(F.sum("cnt").cast("bigint").alias("cnt"))
    )
    full = count_min_build(a.unionByName(b), "k")
    as_set = lambda df: {(r.row_i, r.bucket, r.cnt) for r in df.collect()}  # noqa: E731
    assert as_set(merged) == as_set(full)
    probes = spark.createDataFrame([("x",), ("y",), ("z",)], "k string")
    got = {r.k: r.est for r in count_min_estimate(merged, probes, "k").collect()}
    assert got == {"x": 7, "y": 1, "z": 4}


# ---------------------------------------------------------------------------
# KMV distinct sketch
# ---------------------------------------------------------------------------

from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.operators.sketch import (  # noqa: E402
    kmv_build,
    kmv_estimate,
    kmv_merge,
)


def _keyed(spark, rows):
    return spark.createDataFrame([(g, k) for g, k in rows], "g string, k string")


def test_kmv_exact_below_k(spark):
    """Groups with fewer than k distinct values are EXACT (n_obs path)."""
    df = _keyed(spark, [("a", f"v{i}") for i in range(5)] * 3)  # 5 distinct, repeated
    est = kmv_estimate(kmv_build(df, "k", ("g",), k=16), ("g",), k=16).collect()
    assert est[0].n_obs == 5 and est[0].est_distinct == 5


def test_kmv_estimator_accuracy(spark):
    """2000 distinct keys, k=64: Bar-Yossef relative error ~1/sqrt(k-2)
    ~ 13%; assert a generous 3-sigma-ish 40% band."""
    n = 2000
    df = _keyed(spark, [("a", f"key-{i}") for i in range(n)])
    est = kmv_estimate(kmv_build(df, "k", ("g",), k=64), ("g",), k=64).collect()[0]
    assert est.n_obs == 64
    assert 0.6 * n <= est.est_distinct <= 1.4 * n


def test_kmv_merge_equals_rebuild(spark):
    """merge(sketch(A), sketch(B)) is row-identical to sketch(A union B) —
    the property that makes per-shard sketches compose at 100 TB."""
    a = _keyed(spark, [("g1", f"a{i}") for i in range(300)])
    b = _keyed(spark, [("g1", f"b{i}") for i in range(300)] + [("g1", f"a{i}") for i in range(100)])
    merged = kmv_merge(
        kmv_build(a, "k", ("g",), k=32), kmv_build(b, "k", ("g",), k=32), ("g",), k=32
    )
    rebuilt = kmv_build(a.unionByName(b), "k", ("g",), k=32)
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, rebuilt.collect()))


def test_kmv_groups_are_independent(spark):
    df = _keyed(
        spark,
        [("big", f"x{i}") for i in range(500)] + [("small", f"y{i}") for i in range(3)],
    )
    est = {
        r.g: r.est_distinct
        for r in kmv_estimate(kmv_build(df, "k", ("g",), k=32), ("g",), k=32).collect()
    }
    assert est["small"] == 3
    assert 250 <= est["big"] <= 750


# --- Bloom -----------------------------------------------------------------


def test_bloom_no_false_negatives(spark):
    from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.operators.sketch import (
        bloom_build,
        bloom_probe,
    )

    keys = spark.createDataFrame([(f"key{i}",) for i in range(200)], "k string")
    bloom = bloom_build(keys, "k")
    out = {r.probe_key: r.bloom_hit for r in bloom_probe(bloom, keys, "k").collect()}
    assert len(out) == 200 and all(out.values())  # every member must hit


def test_bloom_rejects_most_non_members(spark):
    from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.operators.sketch import (
        bloom_build,
        bloom_probe,
    )

    members = spark.createDataFrame([(f"in{i}",) for i in range(500)], "k string")
    others = spark.createDataFrame([(f"out{i}",) for i in range(500)], "k string")
    bloom = bloom_build(members, "k")
    hits = [r.bloom_hit for r in bloom_probe(bloom, others, "k").collect()]
    # m=2^14, k=3, n=500 -> fp ~ (1-e^{-3*500/16384})^3 ~ 6e-4; allow slack
    assert sum(hits) <= 5


def test_bloom_merge_is_bitor(spark):
    from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.operators.sketch import (
        bloom_build,
        bloom_probe,
    )
    from pyspark.sql import functions as F

    a = spark.createDataFrame([("a1",), ("a2",)], "k string")
    b = spark.createDataFrame([("b1",), ("b2",)], "k string")
    merged = (
        bloom_build(a, "k")
        .unionByName(bloom_build(b, "k"))
        .groupBy("word_idx")
        .agg(F.bit_or("bits").alias("bits"))
    )
    direct = bloom_build(a.unionByName(b), "k")
    assert {tuple(r) for r in merged.collect()} == {tuple(r) for r in direct.collect()}


def test_bloom_words_stay_positive(spark):
    from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.operators.sketch import (
        bloom_build,
    )
    from pyspark.sql import functions as F

    keys = spark.createDataFrame([(f"k{i}",) for i in range(2000)], "k string")
    row = bloom_build(keys, "k").agg(F.min("bits")).collect()[0]
    assert row[0] > 0  # 60-bit packing: no sign-bit divergence possible


def test_bloom_m_for_sizes_from_key_count():
    import math

    from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.operators.sketch import (
        BLOOM_K,
        BLOOM_WORD_BITS,
        bloom_m_for,
    )

    for n, p in [(1000, 0.01), (100_000, 0.001), (5_000_000, 0.01)]:
        m = bloom_m_for(n, p)
        assert m % BLOOM_WORD_BITS == 0
        # the analytic fp at the returned size must meet the target
        fp = (1.0 - math.exp(-BLOOM_K * n / m)) ** BLOOM_K
        assert fp <= p * 1.001
    assert bloom_m_for(0) == BLOOM_WORD_BITS


def test_bloom_occupancy_flags_saturation(spark):
    """The r7 ADVICE finding made observable: the fixture-sized default m
    saturates at realistic key counts — bloom_occupancy must read ~1.0
    load / ~1.0 est_fp there, and a bloom_m_for-sized filter must not."""
    from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.operators.sketch import (
        bloom_build,
        bloom_m_for,
        bloom_occupancy,
        bloom_probe,
    )

    keys = spark.createDataFrame([(f"key{i}",) for i in range(20_000)], "k string")

    # undersized (the default m=2^14 at 20k keys): visibly saturated
    sat = bloom_occupancy(bloom_build(keys, "k"), m=1 << 14).collect()[0]
    assert sat.load > 0.9 and sat.est_fp > 0.7

    # sized from the key count: healthy load, and probes actually reject
    m = bloom_m_for(20_000, target_fp=0.01)
    sized = bloom_build(keys, "k", m=m)
    occ = bloom_occupancy(sized, m=m).collect()[0]
    assert occ.load < 0.5 and occ.est_fp < 0.01 * 1.5
    others = spark.createDataFrame([(f"out{i}",) for i in range(2000)], "k string")
    fp_hits = sum(
        r.bloom_hit for r in bloom_probe(sized, others, "k", m=m).collect()
    )
    assert fp_hits <= 2000 * 0.01 * 3  # generous slack over the 1% target


# ---------------------------------------------------------------------------
# HyperLogLog distinct sketch (r11; staged r12 graded-entry differential)

import hashlib

from conftest import hll_estimate_sql
from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.functions.ids import (
    stable_hash64_sql,
)
from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.operators.sketch import (
    HLL_P,
    hll_build,
    hll_estimate,
    hll_merge,
)

_SQL_TOKS = r"list_filter(string_split_regex(lower(text), '\s+'), t -> t <> '')"


def _py_h60(s: str) -> int:
    return int(hashlib.sha256(s.encode()).hexdigest()[:15], 16)


def _py_registers(keys, p=HLL_P):
    m = 1 << p
    regs = {}
    for key in keys:
        h = _py_h60(key)
        b, w = h % m, h >> p
        rho = (60 - p + 1) if w == 0 else (60 - p + 1) - w.bit_length()
        regs[b] = max(regs.get(b, 0), rho)
    return regs


def test_hll_registers_match_python_oracle(spark):
    keys = [f"tok{i}" for i in range(1000)]
    df = spark.createDataFrame([(k,) for k in keys], "k string")
    got = {r.bucket: r.reg for r in hll_build(df, "k").collect()}
    assert got == _py_registers(keys)


def test_hll_merge_equals_rebuild(spark):
    a = spark.createDataFrame([(f"a{i}",) for i in range(400)], "k string")
    b = spark.createDataFrame(
        [(f"a{i}",) for i in range(200, 600)], "k string"
    )
    merged = {
        (r.bucket, r.reg)
        for r in hll_merge(hll_build(a, "k"), hll_build(b, "k")).collect()
    }
    full = {
        (r.bucket, r.reg) for r in hll_build(a.unionByName(b), "k").collect()
    }
    assert merged == full


def test_hll_estimate_accuracy_and_small_range(spark):
    """Deterministic, so the values are pinned (not just bounded): the
    standard error at m=256 is ~6.5%; the 40-key case must route through
    the linear-counting branch (est <= 2.5m with empty registers)."""
    big = spark.createDataFrame([(f"k{i}",) for i in range(5000)], "k string")
    est = hll_estimate(hll_build(big, "k")).collect()[0]
    assert abs(est.est_distinct - 5000) / 5000 < 0.10, est.est_distinct
    small = spark.createDataFrame([(f"s{i}",) for i in range(40)], "k string")
    row = hll_estimate(hll_build(small, "k")).collect()[0]
    assert row.n_touched <= 40
    assert abs(row.est_distinct - 40) / 40 < 0.15, row.est_distinct


def test_hll_groups_are_independent(spark):
    df = spark.createDataFrame(
        [(f"g{i % 2}", f"k{i}") for i in range(500)], "g string, k string"
    )
    out = {
        r.g: r.est_distinct
        for r in hll_estimate(
            hll_build(df, "k", group_cols=("g",)), group_cols=("g",)
        ).collect()
    }
    for g in ("g0", "g1"):
        assert abs(out[g] - 250) / 250 < 0.15, (g, out[g])


def hll_tokens_sql(p: int = HLL_P) -> str:
    """STAGED r12 graded-entry oracle: per-source distinct-token HLL —
    registers AND the estimate replayed in full ANSI SQL via the SHARED
    conftest renderer of the hll_estimate contract (integer-exact
    harmonic sum, linear-counting branch, 6dp)."""
    h = stable_hash64_sql("t")
    hashed = f"""SELECT source, {h} AS h
  FROM (SELECT source, unnest({_SQL_TOKS}) AS t FROM documents)"""
    return hll_estimate_sql(hashed, ["source"], p)


def test_hll_tokens_matches_duckdb_replay(documents, sf_dir):
    """The staged r12 differential: per-source token HLL (build + merge-
    free estimate) vs the full-SQL replay, registers value-checked via
    (n_touched, reg_sum) and the 6dp estimate compared exactly."""
    import duckdb

    from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.functions.text import (
        tokens,
    )

    toks = documents.select(
        "source", F.explode(tokens(F.col("text"))).alias("t")
    )
    got = {
        r.source: (r.n_touched, r.reg_sum, r.est_distinct)
        for r in hll_estimate(
            hll_build(toks, "t", group_cols=("source",)),
            group_cols=("source",),
        ).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    want = {
        r[0]: (int(r[1]), int(r[2]), float(r[3]))
        for r in con.execute(hll_tokens_sql()).fetchall()
    }
    assert got == want
    # sanity: estimates within the m=256 error envelope of exact
    exact = {
        r.source: r.n
        for r in toks.groupBy("source")
        .agg(F.count_distinct("t").alias("n"))
        .collect()
    }
    for s, n in exact.items():
        assert abs(got[s][2] - n) / n < 0.15, (s, got[s][2], n)


def test_hll_plan_shape(spark, documents):
    """hll_build + hll_estimate compile to pure JVM aggregates: no
    Python UDFs, no cartesian products, and the register shuffle is a
    partial-aggregated groupBy (HashAggregate on both sides)."""
    toks = documents.select(
        "source", F.explode(
            __import__(
                "code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.functions.text",
                fromlist=["tokens"],
            ).tokens(F.col("text"))
        ).alias("t")
    )
    est = hll_estimate(
        hll_build(toks, "t", group_cols=("source",)), group_cols=("source",)
    )
    plan = est._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert "HashAggregate" in plan


# ------------------------------------------------------------------
# Mergeable exact value-histogram quantiles (r12; staged r13 candidate)

_VQ_QS = ((1, 4), (1, 2), (3, 4), (9, 10), (99, 100))


def _ntok(documents):
    from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.functions.text import (
        tokens,
    )

    return documents.select(
        "source", F.size(tokens(F.col("text"))).alias("n_tokens")
    )


def test_vhist_quantiles_match_duckdb_replay(documents, sf_dir):
    """The staged r13 differential: per-source token-count quantiles from
    the value histogram vs the shared engine renderer's full-SQL replay —
    exact integer order statistics + one fixed-order interpolation, every
    value identical."""
    import duckdb

    from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.operators.sketch import (
        vhist_build,
        vhist_quantiles,
        vhist_quantiles_duckdb_sql,
    )

    nt = _ntok(documents)
    out = vhist_quantiles(
        vhist_build(nt, "n_tokens", group_cols=("source",)),
        _VQ_QS,
        group_cols=("source",),
    )
    got = sorted((r.source, r.q, r.value) for r in out.collect())
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    sql = vhist_quantiles_duckdb_sql(
        f"SELECT source, len({_SQL_TOKS})::BIGINT AS n_tokens FROM documents",
        "n_tokens",
        ("source",),
        _VQ_QS,
    )
    want = sorted((a, float(b), float(c)) for a, b, c in con.execute(sql).fetchall())
    assert got == want
    assert len(got) == len(_VQ_QS) * documents.select("source").distinct().count()


def test_vhist_quantiles_are_numpy_type7(documents):
    """The extraction is EXACTLY numpy's default (type-7 linear)
    quantile: same order statistics, same interpolation."""
    import numpy as np

    from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.operators.sketch import (
        vhist_build,
        vhist_quantiles,
    )

    nt = _ntok(documents)
    got = {
        (r.source, r.q): r.value
        for r in vhist_quantiles(
            vhist_build(nt, "n_tokens", group_cols=("source",)),
            _VQ_QS,
            group_cols=("source",),
        ).collect()
    }
    pdf = nt.toPandas()
    for src_name, grp in pdf.groupby("source"):
        vals = grp["n_tokens"].to_numpy()
        for num, den in _VQ_QS:
            q = num / den
            assert abs(float(np.quantile(vals, q)) - got[(src_name, q)]) <= 1e-6, (
                src_name, q,
            )


def test_vhist_merge_equals_rebuild(documents):
    """The sketch-family merge law: per-shard histograms merged by count
    addition equal the from-scratch histogram row-for-row (EXACT, like
    hll_merge), so shard/stream histograms compose losslessly."""
    from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.operators.sketch import (
        vhist_build,
        vhist_merge,
    )

    nt = _ntok(documents)
    a = nt.filter(F.col("n_tokens") % 2 == 0)
    b = nt.filter(F.col("n_tokens") % 2 == 1)
    merged = sorted(
        (r.source, r.v, r.c)
        for r in vhist_merge(
            vhist_build(a, "n_tokens", ("source",)),
            vhist_build(b, "n_tokens", ("source",)),
            ("source",),
        ).collect()
    )
    rebuilt = sorted(
        (r.source, r.v, r.c)
        for r in vhist_build(nt, "n_tokens", ("source",)).collect()
    )
    assert merged == rebuilt


def test_vhist_quantiles_edge_cases(spark):
    """Single-value groups (all quantiles collapse to it), exact-rank
    quantiles on tiny n (rem == 0 -> no interpolation), and the global
    (no group) form."""
    from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.operators.sketch import (
        vhist_build,
        vhist_quantiles,
    )

    df = spark.createDataFrame(
        [("a", 7), ("a", 7), ("b", 1), ("b", 3), ("b", 5)],
        "g string, x long",
    )
    got = {
        (r.g, r.q): r.value
        for r in vhist_quantiles(
            vhist_build(df, "x", ("g",)), ((1, 2), (1, 4)), ("g",)
        ).collect()
    }
    assert got[("a", 0.5)] == 7.0 and got[("a", 0.25)] == 7.0
    assert got[("b", 0.5)] == 3.0       # n=3, h=(3-1)*1/2=1 exact
    assert got[("b", 0.25)] == 2.0      # h=0.5 -> 1 + 0.5*(3-1)
    g = {
        r.q: r.value
        for r in vhist_quantiles(vhist_build(df, "x"), ((1, 2),)).collect()
    }
    assert g[0.5] == 5.0  # n=5 values [1,3,5,7,7], median exact rank

    plan = vhist_quantiles(
        vhist_build(df, "x", ("g",)), ((1, 2),), ("g",)
    )._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan
