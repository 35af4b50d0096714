"""Skew-aware relational helpers (beyond-reference extension).

The reference has no skewed workloads (single-node pandas; SURVEY SS4.1
"Partitioning / shuffle: None"). At 100 TB the canonical hot-key problem is
a grouped count over a Zipf-distributed key (corpus token counts being the
textbook case): one reducer receives the head key's entire partition. Two
mitigations exist in this engine — AQE skew-join/partition splitting
(enabled in session.py) and the explicit two-stage salted aggregation here,
which works even where AQE cannot help (a single group key is ONE map-side
hash bucket regardless of how AQE splits partitions).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _round_half_up_guarded(x: float, what: str, ulps: int = 4) -> int:
    """HALF-UP round of a non-negative double to int, REFUSING values
    within ``ulps`` ULPs of the ``.5`` rounding boundary.

    Used where a decision-feeding integer is derived through a
    transcendental (``temperature_sample``'s ``pw9``): libm ``pow``
    implementations agree only to ~1 ULP, so a mass sitting at the
    boundary could round differently across engines and silently flip the
    keep set. Values certified by this guard round identically under ANY
    IEEE double implementation within ``ulps`` ULPs — fixture/corpus
    drift onto a boundary fails loudly instead (the ``_bpe_merges``
    report-assertion pattern)."""
    f = math.floor(x)
    frac = x - f  # exact: f is within a factor of 2 of x for x >= 1
    if abs(frac - 0.5) <= ulps * max(math.ulp(x), 5e-324):
        raise ValueError(
            f"temperature_sample: {what} = {x!r} sits within {ulps} ULPs "
            "of a .5 rounding boundary — a half-ULP libm disagreement "
            "could flip the rounded integer across engines; perturb the "
            "temperature/keep_frac or use an exact-rational formulation"
        )
    return int(f) + 1 if frac > 0.5 else int(f)


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: tuple[str, ...] = (),
    right_tiebreak: str | None = None,
    tolerance: int | None = None,
) -> DataFrame:
    """Point-in-time (as-of) join: for each left row, attach the LATEST
    right row of the same key with ``right_ts <= left_ts`` — the classic
    time-series enrichment Spark has no built-in operator for.
    ``tolerance`` (same ticks as the ts columns) bounds staleness: a match
    older than ``left_ts - tolerance`` is nulled out map-side after the
    carry-forward — no change to the shuffle or sort.

    Implemented as the scalable union + carry-forward formulation, not a
    range cross join: tag both sides, union, sort per key by (ts, side)
    with the right side winning ties, and carry the last-seen right row
    forward with ``last(ignorenulls)`` over an unbounded-preceding window.
    Cost is ONE shuffle on the key plus a per-partition sort —
    O((|L|+|R|) log) — where the naive theta-join is O(|L| x |R|) per key.
    Left rows with no prior right row keep NULLs.

    Output: all left columns + ``right_<ts>`` (the matched timestamp) +
    the requested ``right_cols`` (each prefixed ``right_``).
    """
    lt = left.withColumn("_side", F.lit(1))
    rt = right.select(
        F.col(key),
        F.col(right_ts).alias("_rts"),
        *[F.col(c) for c in right_cols],
    ).withColumn("_side", F.lit(0))
    unioned = lt.unionByName(rt, allowMissingColumns=True)
    # right rows sort before left rows at equal timestamps => a right row
    # AT the left row's timestamp is visible to it (<=, not <)
    order_ts = F.coalesce(F.col("_rts"), F.col(left_ts))
    order_cols = [order_ts.asc(), F.col("_side").asc()]
    if right_tiebreak is not None:
        # equal-timestamp right rows would otherwise resolve
        # nondeterministically; the LAST in tiebreak order wins
        order_cols.append(F.col(right_tiebreak).asc())
    w = (
        Window.partitionBy(key)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried_out = [
        F.last(F.col("_rts"), ignorenulls=True).over(w).alias(f"right_{right_ts}")
    ] + [
        F.last(F.when(F.col("_side") == 0, F.col(c)), ignorenulls=True)
        .over(w)
        .alias(f"right_{c}")
        for c in right_cols
    ]
    out = (
        unioned.select("*", *carried_out)
        .filter(F.col("_side") == 1)
        .drop("_side", "_rts")
    )
    if tolerance is not None:
        rts = f"right_{right_ts}"
        out = out.withColumn(
            "_fresh",
            F.col(rts).isNotNull()
            & (F.col(rts) >= F.col(left_ts) - F.lit(tolerance)),
        )
        for c in (rts, *[f"right_{c}" for c in right_cols]):
            out = out.withColumn(c, F.when(F.col("_fresh"), F.col(c)))
        out = out.drop("_fresh")
    return out


def salted_key_counts(df: DataFrame, key: Column | str,
                      salt_buckets: int = 32) -> DataFrame:
    """Count rows per key with two-stage salted aggregation.

    Stage 1 groups by (key, salt) so a hot key's rows spread over
    ``salt_buckets`` reducers; stage 2 merges the ≤ salt_buckets partial
    counts per key. The salt is the task partition id — deterministic for a
    fixed input layout, and irrelevant to the result (it is summed out), so
    the operator stays oracle-replayable as a plain GROUP BY.

    Output: ``key, n_rows``.
    """
    keyed = df.select(F.col(key).alias("key") if isinstance(key, str) else key.alias("key"))
    salted = keyed.withColumn("_salt", F.spark_partition_id() % salt_buckets)
    partial = salted.groupBy("key", "_salt").agg(F.count("*").alias("c"))
    return partial.groupBy("key").agg(F.sum("c").cast("bigint").alias("n_rows"))


def heavy_hitters(df: DataFrame, key: Column | str, n: int = 20,
                  salt_buckets: int = 32) -> DataFrame:
    """Global top-n most frequent keys (count desc, key asc) on top of the
    salted count — plans as TakeOrderedAndProject, no full sort.

    Output: ``key, n_rows, rank``.
    """
    counts = salted_key_counts(df, key, salt_buckets)
    # rank over the already-limited 20-row result: the single-partition
    # window is trivially small; the heavy lifting happened upstream
    w = Window.orderBy(F.desc("n_rows"), F.asc("key"))
    return (
        counts.orderBy(F.desc("n_rows"), F.asc("key"))
        .limit(n)
        .withColumn("rank", F.row_number().over(w))
    )


def latest_per_key(df: DataFrame, keys: list[str], order_col: str,
                   tiebreak_col: str) -> DataFrame:
    """Keep the newest row per key (CDC-style dedup / snapshot compaction —
    the batch form of `dropDuplicates` made DETERMINISTIC: `dropDuplicates`
    keeps an arbitrary first-seen row, this keeps the one the contract
    names: max ``order_col``, ties by max ``tiebreak_col``).

    One shuffle on the key; WindowGroupLimit pushes the rank-1 filter into
    partial top-1 per map partition before it, so the shuffle carries one
    row per (key, map partition), not the history.
    """
    w = Window.partitionBy(*keys).orderBy(
        F.desc(order_col), F.desc(tiebreak_col)
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def stratified_sample_deterministic(df: DataFrame, strata_col: str,
                                    key_col: str, n_per_stratum: int) -> DataFrame:
    """Exact-n-per-stratum sample, reproducible across engines: rank rows
    within each stratum by the portable ``stable_hash64`` of the key (plus
    key tiebreak) and keep the first n. The deterministic analog of
    ``df.sampleBy(fractions, seed)`` — sampleBy is probabilistic per-row
    (no exact n, seed-stable only within one Spark version), while hash
    order replays identically in any engine with SHA-256.

    One shuffle on the stratum; WindowGroupLimit bounds it map-side.
    """
    from ..functions.ids import stable_hash64

    w = Window.partitionBy(strata_col).orderBy("_hk", key_col)
    return (
        df.withColumn("_hk", stable_hash64(F.col(key_col)))
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= n_per_stratum)
        .drop("_rn", "_hk")
    )


def ngram_contamination(
    docs: DataFrame,
    eval_docs: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Benchmark decontamination: flag training documents sharing any
    word-``n``-gram with an evaluation corpus — the standard pre-training
    hygiene pass that keeps test sets out of the training data.

    Scale shape: the eval corpus is small by definition, so its DISTINCT
    n-gram set broadcasts; the training side explodes its n-grams map-side
    and the broadcast hash join filters them WITHOUT shuffling the corpus —
    the only shuffle is the per-doc hit count (partial-agg combined). At
    100 TB the eval n-gram set can also be a bloom filter pushed into the
    scan; the exact-join form here is the oracle-checkable contract.

    Output: one row per training doc — ``id_col, n_contaminated_ngrams,
    is_contaminated`` (docs with no hit included, count 0).
    """
    from ..functions.text import tokens, word_shingles

    ev = (
        eval_docs.select(
            F.explode(word_shingles(tokens(F.col(text_col)), n)).alias("ngram")
        )
        .distinct()
    )
    tr = docs.select(
        F.col(id_col), F.explode(word_shingles(tokens(F.col(text_col)), n)).alias("ngram")
    )
    hits = (
        tr.join(F.broadcast(ev), "ngram")
        .groupBy(id_col)
        .agg(F.countDistinct("ngram").alias("n_hit"))
    )
    return docs.select(id_col).join(hits, id_col, "left").select(
        id_col,
        F.coalesce(F.col("n_hit"), F.lit(0)).cast("bigint").alias(
            "n_contaminated_ngrams"
        ),
        (F.coalesce(F.col("n_hit"), F.lit(0)) > 0).alias("is_contaminated"),
    )


def mixture_sample(
    df: DataFrame,
    weights: dict[str, float],
    default_weight: float = 0.0,
    source_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic domain-mixture sampling: keep each row with its
    source's probability — the training-mixture reweighting stage (e.g.
    up-sample books, down-sample web crawl). The keep decision is a pure
    function of ``(source, id)`` via the engine-portable ``stable_hash64``,
    so it is reproducible across runs, layouts, AND engines (the DuckDB
    oracle replays it exactly) — no RNG, no ``sample()`` nondeterminism.
    Map-side filter; pushes to the scan when the columns allow.
    """
    from ..functions.ids import stable_hash64

    pairs = []
    for k, v in weights.items():
        pairs += [F.lit(k), F.lit(float(v))]
    wcol = F.coalesce(
        F.create_map(*pairs)[F.col(source_col)], F.lit(float(default_weight))
    )
    thresh = F.round(wcol * 1_000_000).cast("bigint")
    h = stable_hash64(
        F.concat(F.col(source_col), F.lit(":"), F.col(id_col).cast("string"))
    ) % 1_000_000
    return df.filter(h < thresh)


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Content-hash diff between two corpus snapshots — the driver for
    INCREMENTAL reprocessing: after a crawl refresh, only ``added`` /
    ``changed`` docs need re-embedding (``upsert_ivf_index``), near-dup
    screening against history (``streaming.dedup_history.
    process_increment``), and re-sharding; ``removed`` docs need index
    deletion. Without a diff, every refresh pays a full-corpus rebuild.

    Relational shape: each side reduces map-side to ``(id, sha256(text))``
    — the scan reads two columns regardless of how wide the corpus table
    is — and one full-outer hash join classifies. ``unchanged`` rows are
    dropped INSIDE the join's projection (the common case at 100 TB: a
    refresh touches a small fraction, and emitting unchanged rows would
    make the output corpus-sized).

    Output: ``doc_id, status ('added'|'removed'|'changed'), old_sha,
    new_sha`` — null sha on the absent side, exactly replayable in SQL.
    """
    o = old.select(
        F.col(id_col).alias("doc_id"), F.sha2(F.col(text_col), 256).alias("old_sha")
    )
    n = new.select(
        F.col(id_col).alias("doc_id"), F.sha2(F.col(text_col), 256).alias("new_sha")
    )
    status = (
        F.when(F.col("old_sha").isNull(), F.lit("added"))
        .when(F.col("new_sha").isNull(), F.lit("removed"))
        .when(F.col("old_sha") != F.col("new_sha"), F.lit("changed"))
    )
    return (
        o.join(n, "doc_id", "full_outer")
        .withColumn("status", status)
        .filter(F.col("status").isNotNull())
        .select("doc_id", "status", "old_sha", "new_sha")
    )


def temperature_sample(
    df: DataFrame,
    temperature: float = 2.0,
    keep_frac: float = 0.5,
    source_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Temperature-flattened mixture sampling (r11; the multilingual /
    data-recipe move, e.g. mT5 and the LLaMA crawl mix): resample so the
    source distribution follows ``q_s \\propto p_s^(1/T)`` — T=1 keeps the
    natural proportions, T -> inf approaches uniform-over-sources —
    targeting ``keep_frac`` of the corpus overall. Unlike
    ``mixture_sample`` (caller-provided static weights), the rates are
    DERIVED from the observed source counts: one tiny groupBy, flatten,
    normalize, then the same portable-hash micro-unit keep filter.

    Cross-engine determinism is pinned the fixed-point way: the flattened
    masses round to a 1e-9 grid FIRST (``pw9`` BIGINT), the normalizer is
    their EXACT integer sum, and the final per-source rate rounds to
    micro-units before the hash compare — so the oracle replays the keep
    set bit-for-bit and float summation order never matters. Rates cap at
    1.0 (down-sampling form; up-sampling duplication is a different
    operator).

    ``pw9`` is the ONE decision-feeding integer in the engine derived
    from a transcendental (``pow``), so its rounding boundary is GUARDED:
    the per-source counts (bounded by the number of sources — the same
    scale the broadcast rates table already was) are collected and the
    flattened masses computed driver-side with an explicit 4-ULP
    exclusion zone around every ``.5`` boundary. Any fixture/corpus whose
    mass lands inside the zone raises loudly instead of risking a silent
    cross-engine flip from a half-ULP libm disagreement (DuckDB replays
    ``pow`` with its own libm; everything downstream of the certified
    integers is correctly-rounded IEEE arithmetic on identical inputs,
    hence bit-identical). The derived rates re-enter the plan as a
    literal broadcast frame.

    ``source_col`` must be non-null: a NULL source would get its own
    count group (and a rate) but the inner equi-join can never match it,
    silently excluding those docs regardless of ``keep_frac`` — so NULLs
    raise instead (the ``mixture_sample`` contract).

    Scale shape: ONE source-sized aggregate collected to the driver, then
    the corpus sees ONE map-side broadcast-join + hash filter — at 100 TB
    this costs a column-pruned scan, never a shuffle of the data rows.

    Output: all ``df`` columns + ``mix_rate DOUBLE`` (the applied rate in
    exact micro-units).
    """
    from ..functions.ids import stable_hash64

    rows = (
        df.groupBy(source_col)
        .agg(F.count("*").cast("bigint").alias("n_s"))
        .collect()
    )
    if any(r[source_col] is None for r in rows):
        raise ValueError(
            f"temperature_sample: NULL values in {source_col!r} — the "
            "rate join can never match them, so those docs would be "
            "silently dropped; filter or fill the source column first"
        )
    n_tot = sum(int(r["n_s"]) for r in rows)
    inv_t = 1.0 / float(temperature)
    rate_rows = []
    for r in rows:
        n_s = int(r["n_s"])
        pw9 = _round_half_up_guarded(
            (n_s / n_tot) ** inv_t * 1e9, f"pw9[{r[source_col]!r}]"
        )
        rate_rows.append((r[source_col], n_s, pw9))
    z9 = sum(p for _, _, p in rate_rows)
    rates_local = [
        (
            src,
            _round_half_up_guarded(
                min(1.0, (float(keep_frac) * float(n_tot) * (pw9 / z9)) / n_s)
                * 1e6,
                f"thresh6[{src!r}]",
            ),
        )
        for src, n_s, pw9 in rate_rows
    ]
    src_field = df.schema[source_col]
    rates = df.sparkSession.createDataFrame(
        rates_local,
        T.StructType(
            [
                T.StructField(source_col, src_field.dataType),
                T.StructField("thresh6", T.LongType()),
            ]
        ),
    )
    h = stable_hash64(
        F.concat(F.col(source_col), F.lit(":"), F.col(id_col).cast("string"))
    ) % 1_000_000
    return (
        df.join(F.broadcast(rates), source_col)
        .filter(h < F.col("thresh6"))
        .withColumn("mix_rate", F.col("thresh6").cast("double") / 1e6)
        .drop("thresh6")
    )


def temperature_sample_duckdb_sql(
    temperature: float = 2.0, keep_frac: float = 0.5
) -> str:
    """The DuckDB rendering of ``temperature_sample`` over view
    ``documents`` (kept adjacent so the two definitions can't drift):
    source counts, 1e-9-grid flattened masses, EXACT integer normalizer,
    micro-unit rate threshold, portable-hash keep filter. The engine
    derives pw9/thresh6 driver-side under the ULP guard above; this
    replay recomputes them with DuckDB's own ``pow`` — the guard is what
    certifies both land on the same integers."""
    from ..functions.ids import stable_hash64_sql

    h = stable_hash64_sql("d.source || ':' || d.doc_id")
    return f"""
WITH c AS (SELECT source, count(*)::BIGINT AS n_s FROM documents GROUP BY source),
t AS (SELECT sum(n_s)::BIGINT AS n_tot FROM c),
p AS (SELECT source, n_s, n_tot,
             round(pow(n_s::DOUBLE / n_tot::DOUBLE, {1.0 / temperature!r}) * 1e9)::BIGINT AS pw9
      FROM c, t),
z AS (SELECT sum(pw9)::BIGINT AS z9 FROM p),
r AS (SELECT source,
             round(least(1.0, ({float(keep_frac)!r} * n_tot::DOUBLE *
                              (pw9::DOUBLE / z9::DOUBLE)) / n_s::DOUBLE) * 1e6)::BIGINT AS thresh6
      FROM p, z)
SELECT d.*, r.thresh6 / 1e6 AS mix_rate
FROM documents d JOIN r USING (source)
WHERE ({h}) % 1000000 < r.thresh6"""
