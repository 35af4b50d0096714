"""Relational breadth queries (semi/anti join, Q17/Q18 shapes, CUBE,
distinct aggs, running-total windows, range-window interval join, set ops,
L2 normalization) — semantic invariants at sf0.001 plus plan-shape checks
that the scale-critical physical choices actually happen."""

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_order_priority_check_semi_join(spark, sf_dir):
    out = entrymod.q_order_priority_check(spark, sf_dir)
    rows = {r.o_orderpriority: r.n_orders for r in out.collect()}
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    total = orders.count()
    # semi join never duplicates the probe side
    assert sum(rows.values()) <= total
    assert all(n > 0 for n in rows.values())
    assert "LeftSemi" in _plan(out)


def test_dormant_customers_anti_join(spark, sf_dir):
    out = entrymod.q_dormant_customers(spark, sf_dir)
    dormant = {r.c_custkey for r in out.collect()}
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    recent = {
        r.o_custkey
        for r in orders.filter(
            F.col("o_orderdate") >= entrymod.DORMANT_CUTOFF
        ).select("o_custkey").distinct().collect()
    }
    assert dormant, "cutoff should leave some dormant customers"
    assert not (dormant & recent)
    assert "LeftAnti" in _plan(out)


def test_large_orders_threshold(spark, sf_dir):
    out = entrymod.q_large_orders(spark, sf_dir).collect()
    assert out
    assert all(r.sum_qty > entrymod.LARGE_ORDER_QTY for r in out)
    # one output row per qualifying order
    keys = [r.o_orderkey for r in out]
    assert len(keys) == len(set(keys))


def test_small_qty_revenue_broadcasts_per_part_agg(spark, sf_dir):
    out = entrymod.q_small_qty_revenue(spark, sf_dir)
    row = out.first()
    assert row.n_items > 0 and row.total_revenue > 0
    assert "BroadcastHashJoin" in _plan(out)


def test_cust_running_total_monotone(spark, sf_dir):
    out = entrymod.q_cust_running_total(spark, sf_dir)
    pdf = out.toPandas().sort_values(["o_custkey", "order_seq"])
    for _, g in pdf.groupby("o_custkey"):
        rs = g["running_spend"].tolist()
        assert rs == sorted(rs)  # cumulative spend never decreases
        assert g["order_seq"].tolist() == list(range(1, len(g) + 1))
        gaps = g["gap_days"].tolist()
        assert gaps[0] != gaps[0]  # first order has no predecessor -> NaN
        assert all(gd >= 0 for gd in gaps[1:])


def test_click_attribution_matches_brute_force(spark, sf_dir):
    out = entrymod.q_click_attribution(spark, sf_dir)
    got = {r.event_id: r.clicks_12h for r in out.collect()}
    from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.sources.events import (
        load_events_micros,
    )

    ev = load_events_micros(spark, sf_dir)
    p = [(r.event_id, r.user_id, r.ts) for r in ev.filter(F.col("event_type") == "purchase").collect()]
    c = [(r.user_id, r.ts) for r in ev.filter(F.col("event_type") == "click").collect()]
    for eid, uid, ts in p:
        want = sum(
            1
            for cu, ct in c
            if cu == uid and ts - entrymod.CLICK_WINDOW_US <= ct <= ts
        )
        assert got[eid] == want, eid
    # purchases only, every purchase present
    assert len(got) == len(p)


def test_sales_cube_totals_consistent(spark, sf_dir):
    rows = entrymod.q_sales_cube(spark, sf_dir).collect()
    by_key = {(r.returnflag, r.linestatus): r.n_items for r in rows}
    grand = by_key[("ALL", "ALL")]
    flags = {k[0] for k in by_key if k[0] != "ALL"}
    stats = {k[1] for k in by_key if k[1] != "ALL"}
    assert sum(by_key[(f, "ALL")] for f in flags) == grand
    assert sum(by_key[("ALL", s)] for s in stats) == grand
    assert len(by_key) == (len(flags) + 1) * (len(stats) + 1)


def test_priority_distinct_bounds(spark, sf_dir):
    rows = entrymod.q_priority_distinct(spark, sf_dir).collect()
    for r in rows:
        assert 1 <= r.n_custs <= r.n_orders
        assert 1 <= r.n_statuses <= 3


def test_normalized_embeddings_unit_norm(spark, sf_dir):
    rows = entrymod.q_normalized_embeddings(spark, sf_dir).collect()
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").collect()
    raw = {r.vec_id: r.embedding for r in emb}
    for r in rows:
        v = raw[r.vec_id]
        n = sum(x * x for x in v) ** 0.5
        assert abs(r.l2_norm - n) < 1e-4
        if n:
            assert abs(r.nx0 - v[0] / n) < 1e-4


def test_source_overlap_set_semantics(spark, sf_dir):
    rows = entrymod.q_source_overlap(spark, sf_dir).collect()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    en = {r.source for r in docs.filter(F.col("lang") == "en").select("source").distinct().collect()}
    de = {r.source for r in docs.filter(F.col("lang") == "de").select("source").distinct().collect()}
    both = {r.source for r in rows if r.op == "both"}
    only = {r.source for r in rows if r.op == "en_only"}
    assert both == en & de
    assert only == en - de
    assert not (both & only)


def test_approx_count_distinct_within_tolerance(spark, sf_dir):
    """Approximate aggregate (SURVEY §2.4 'absent' row's Spark mapping):
    HLL++ distinct-count within its rsd bound on a real column."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    exact = orders.select(F.countDistinct("o_custkey")).first()[0]
    approx = orders.select(
        F.approx_count_distinct("o_custkey", rsd=0.02)
    ).first()[0]
    assert abs(approx - exact) <= 0.1 * exact


def test_status_pivot_row_conservation(spark, sf_dir):
    import __spark_entry__ as em

    rows = em.q_status_pivot(spark, sf_dir).collect()
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    assert sum(r.n_O + r.n_F + r.n_P for r in rows) == orders.count()


def test_latest_per_key_deterministic_ties(spark):
    from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.operators.relational import (
        latest_per_key,
    )

    rows = [
        (1, "click", 100, 7),
        (1, "click", 100, 9),   # ts tie -> larger event_id wins
        (1, "click", 50, 99),
        (2, "view", 10, 1),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_type string, ts long, event_id long"
    ).repartition(4)
    got = {
        (r.user_id, r.event_type): r.event_id
        for r in latest_per_key(
            df, ["user_id", "event_type"], "ts", "event_id"
        ).collect()
    }
    assert got == {(1, "click"): 9, (2, "view"): 1}


def test_stratified_sample_exact_n_and_reproducible(spark, sf_dir):
    from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.operators.relational import (
        stratified_sample_deterministic,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "lang")
    a = stratified_sample_deterministic(docs, "lang", "doc_id", 3)
    per = {r.lang: r.n for r in a.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert all(n == 3 for n in per.values())
    # reproducible across physical layouts
    b = stratified_sample_deterministic(docs.repartition(13), "lang", "doc_id", 3)
    assert {tuple(r) for r in a.collect()} == {tuple(r) for r in b.collect()}


def test_event_queries_are_timezone_invariant(spark, sf_dir):
    """Event-time queries must produce identical rows whatever
    spark.sql.session.timeZone is — the driver/bench sessions don't pin it.
    India (+5:30, non-whole-hour) and New York (DST transitions) are the
    adversarial zones; epoch-us integer arithmetic must not see either."""
    qs = [
        entrymod.q_asof_click,
        entrymod.q_events_hourly,
        entrymod.q_sliding_events,
        entrymod.q_latest_events,
    ]
    prev = spark.conf.get("spark.sql.session.timeZone")
    try:
        base = []
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        for q in qs:
            base.append({tuple(r) for r in q(spark, sf_dir).collect()})
        for tz in ("Asia/Kolkata", "America/New_York"):
            spark.conf.set("spark.sql.session.timeZone", tz)
            for q, want in zip(qs, base):
                got = {tuple(r) for r in q(spark, sf_dir).collect()}
                assert got == want, (q.__name__, tz)
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)


def test_ngram_contamination_golden_and_broadcast(spark):
    from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.operators.relational import (
        ngram_contamination,
    )

    eval_txt = "the quick brown fox jumps over the lazy dog tonight"
    rows = [
        (1, eval_txt),                                # exact eval copy
        (2, "prefix words " + eval_txt + " suffix"),  # contains the eval text
        (3, "quick brown fox jumps over the lazy cat today now ok"),  # <8-gram overlap
        (4, "completely different words in every position here today"),
        (5, "short doc"),                             # too short for 8-grams
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    ev = spark.createDataFrame([(0, eval_txt)], "doc_id long, text string")
    out = ngram_contamination(docs, ev, n=8)
    got = {r.doc_id: (r.n_contaminated_ngrams, r.is_contaminated) for r in out.collect()}
    assert set(got) == {1, 2, 3, 4, 5}  # every doc present, hit or not
    assert got[1][1] and got[2][1]      # both contain eval 8-grams
    assert got[1][0] == 3               # 10 tokens -> 3 8-grams, all hits
    assert not got[3][1] and not got[4][1] and not got[5][1]
    plan = _plan(out)
    assert "BroadcastHashJoin" in plan  # eval n-gram set broadcasts


def test_mixture_sample_deterministic_and_weighted(spark, sf_dir):
    from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.operators.relational import (
        mixture_sample,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "source"
    )
    w = {"src0": 1.0, "src1": 0.5, "src2": 0.0}
    a = mixture_sample(docs, w, default_weight=0.2)
    per = {r.source: r.n for r in a.groupBy("source").agg(F.count("*").alias("n")).collect()}
    total = {r.source: r.n for r in docs.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert per["src0"] == total["src0"]        # weight 1.0 keeps everything
    assert "src2" not in per                   # weight 0.0 drops everything
    assert 0 < per.get("src1", 0) < total["src1"]
    # reproducible across physical layouts
    b = mixture_sample(docs.repartition(17), w, default_weight=0.2)
    assert sorted(r.doc_id for r in a.collect()) == sorted(
        r.doc_id for r in b.collect()
    )


def test_snapshot_diff_classifies_and_drops_unchanged(spark):
    from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.operators.relational import (
        snapshot_diff,
    )

    old = spark.createDataFrame(
        [(1, "same text"), (2, "will change"), (3, "will be removed")],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [(1, "same text"), (2, "has changed"), (4, "brand new doc")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in snapshot_diff(old, new).collect()}
    assert set(out) == {2, 3, 4}  # unchanged doc 1 dropped
    assert out[2].status == "changed"
    assert out[2].old_sha is not None and out[2].new_sha is not None
    assert out[2].old_sha != out[2].new_sha
    assert out[3].status == "removed" and out[3].new_sha is None
    assert out[4].status == "added" and out[4].old_sha is None
    # identical snapshots diff to empty
    assert snapshot_diff(old, old).count() == 0


def test_snapshot_diff_matches_duckdb_oracle(spark, documents, sf_dir):
    """Differential test staging the r9 graded-entry oracle: new snapshot
    derived deterministically from the fixture (every 10th doc edited,
    every 7th-but-not-10th removed, 20 fresh ids added)."""
    import duckdb

    from pyspark.sql import functions as F

    from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.operators.relational import (
        snapshot_diff,
    )

    edited = documents.filter(F.col("doc_id") % 10 == 0).select(
        "doc_id", F.concat(F.col("text"), F.lit(" EDIT")).alias("text")
    )
    kept = documents.filter(
        (F.col("doc_id") % 10 != 0) & (F.col("doc_id") % 7 != 0)
    ).select("doc_id", "text")
    added = documents.filter(F.col("doc_id") < 20).select(
        (F.col("doc_id") + 2_000_000).alias("doc_id"),
        F.concat(F.lit("fresh "), F.col("text")).alias("text"),
    )
    new = kept.unionByName(edited).unionByName(added)
    got = {
        (r.doc_id, r.status, r.old_sha, r.new_sha)
        for r in snapshot_diff(documents.select("doc_id", "text"), new).collect()
    }

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    oracle = con.execute("""
WITH newsnap AS (
  SELECT doc_id, text FROM documents WHERE doc_id % 10 <> 0 AND doc_id % 7 <> 0
  UNION ALL
  SELECT doc_id, text || ' EDIT' FROM documents WHERE doc_id % 10 = 0
  UNION ALL
  SELECT doc_id + 2000000, 'fresh ' || text FROM documents WHERE doc_id < 20
),
o AS (SELECT doc_id, sha256(text) AS old_sha FROM documents),
n AS (SELECT doc_id, sha256(text) AS new_sha FROM newsnap)
SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
       CASE WHEN o.old_sha IS NULL THEN 'added'
            WHEN n.new_sha IS NULL THEN 'removed'
            WHEN o.old_sha <> n.new_sha THEN 'changed' END AS status,
       o.old_sha, n.new_sha
FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id
WHERE status IS NOT NULL
""").fetchall()
    con.close()
    want = {(r[0], r[1], r[2], r[3]) for r in oracle}
    assert got == want
    # non-vacuous: all three statuses occur
    assert {s for _, s, _, _ in got} == {"added", "removed", "changed"}


# ---------------------------------------------------------------------------
# temperature_sample (r11; staged r12 graded-entry differential)

def temperature_sample_sql(temperature: float = 2.0,
                           keep_frac: float = 0.5) -> str:
    """Delegates to the engine's renderer
    (operators/relational.py::temperature_sample_duckdb_sql) so this
    differential and the graded-entry oracle in __spark_entry__ can never
    assert different math."""
    from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.operators.relational import (
        temperature_sample_duckdb_sql,
    )

    return temperature_sample_duckdb_sql(temperature, keep_frac)


def test_temperature_sample_matches_duckdb_replay(spark, sf_dir):
    """The staged r12 differential: temperature_sample vs the full-SQL
    replay — every kept row and its applied rate value-identical."""
    import duckdb

    from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.operators.relational import (
        temperature_sample,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = sorted(
        (r.doc_id, r.source, r.mix_rate)
        for r in temperature_sample(docs).select(
            "doc_id", "source", "mix_rate"
        ).collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    want = sorted(
        (int(r[0]), r[1], float(r[2]))
        for r in con.execute(
            "SELECT doc_id, source, mix_rate FROM ("
            + temperature_sample_sql()
            + ")"
        ).fetchall()
    )
    assert got == want
    assert 0 < len(got) < docs.count()


def test_temperature_flattens_toward_uniform(spark, sf_dir):
    """T=4 must pull the kept-set source shares closer to uniform than
    the input shares (the operator's whole point; needs a SKEWED input —
    the fixture's sources are exactly uniform, where flattening is a
    no-op by construction), and T=1 must keep the natural proportions
    (rate = keep_frac for every source)."""
    from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.operators.relational import (
        temperature_sample,
    )

    rows = (
        [(i, "web") for i in range(800)]
        + [(i + 1000, "books") for i in range(150)]
        + [(i + 2000, "code") for i in range(50)]
    )
    docs = spark.createDataFrame(rows, "doc_id long, source string")
    n_src = {r.source: r.n for r in
             docs.groupBy("source").agg(F.count("*").alias("n")).collect()}
    tot = sum(n_src.values())
    kept = {r.source: r.n for r in
            temperature_sample(docs, temperature=4.0).groupBy("source")
            .agg(F.count("*").alias("n")).collect()}
    ktot = sum(kept.values())
    m = len(n_src)
    dev_in = sum(abs(v / tot - 1 / m) for v in n_src.values())
    dev_out = sum(abs(kept.get(s, 0) / ktot - 1 / m) for s in n_src)
    assert dev_out < dev_in, (dev_in, dev_out)
    # the scarce source is protected: its rate caps at 1.0 (kept whole)
    assert kept["code"] == 50
    # T=1 keeps natural proportions: rate == keep_frac for every source
    t1 = {r.source: r.mix_rate for r in
          temperature_sample(docs, temperature=1.0).select(
              "source", "mix_rate").distinct().collect()}
    for s, rate in t1.items():
        assert abs(rate - 0.5) < 1e-6, (s, rate)


def test_temperature_sample_null_source_raises(spark, sf_dir):
    """r12 contract guard (ADVICE): a NULL source gets its own count
    group and rate, but the inner rate join can never match it — those
    docs would silently vanish regardless of keep_frac. Refuse loudly
    (the mixture_sample contract)."""
    from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.operators.relational import (
        temperature_sample,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").withColumn(
        "source",
        F.when(F.col("doc_id") % 101 == 0, None).otherwise(F.col("source")),
    )
    with pytest.raises(ValueError, match="NULL"):
        temperature_sample(docs)


def test_round_half_up_guard_refuses_boundary():
    """r12 pow-boundary guard (the r11 verdict's one decision-feeding
    transcendental): values within 4 ULPs of a .5 boundary raise; values
    clear of it round half-up exactly."""
    import math

    from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.operators.relational import (
        _round_half_up_guarded,
    )

    with pytest.raises(ValueError, match="ULPs"):
        _round_half_up_guarded(2.5, "exact boundary")
    with pytest.raises(ValueError, match="ULPs"):
        _round_half_up_guarded(2.5 + 2 * math.ulp(2.5), "inside the zone")
    assert _round_half_up_guarded(2.5 + 1e-9, "above") == 3
    assert _round_half_up_guarded(2.5 - 1e-9, "below") == 2
    assert _round_half_up_guarded(7.0, "integer") == 7
    assert _round_half_up_guarded(0.0, "zero") == 0
