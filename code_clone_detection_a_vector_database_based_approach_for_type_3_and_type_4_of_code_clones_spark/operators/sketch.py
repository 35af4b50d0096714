"""Count-Min sketch: sublinear frequency summaries for heavy-hitter-style
questions at corpus scale (beyond-reference extension).

Spark ships ``F.count_min_sketch``, but it returns an opaque binary blob —
useless for cross-engine verification and awkward to merge outside Spark.
This formulation keeps the sketch RELATIONAL: a ``(row_i, bucket, cnt)``
table of ``d x w`` counters built with the engine-portable
``stable_hash64`` (salted per row), so it is exactly replayable in the
DuckDB oracle, mergeable across corpora by a further groupBy-sum, and
queryable with a plain join.

Scale shape: the build is explode(d) -> groupBy(row_i, bucket) with
map-side partial aggregation — the shuffle carries at most ``d x w``
counters per map partition regardless of corpus size. Estimation joins the
(tiny, broadcastable) sketch against the probe keys and takes ``min`` over
the d rows — the classic CMS upper-bound estimate (never under-counts;
over-counts by collision mass ~ N/w per row).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.ids import stable_hash64

CMS_D = 4      # hash rows
CMS_W = 1024   # buckets per row


def _bucket_array(key: Column, d: int, w: int) -> Column:
    return F.array(
        *[
            F.struct(
                F.lit(i).alias("row_i"),
                (stable_hash64(key, salt=f"cms{i}:") % w).alias("bucket"),
            )
            for i in range(d)
        ]
    )


def count_min_build(
    df: DataFrame, key: Column | str, d: int = CMS_D, w: int = CMS_W
) -> DataFrame:
    """Build the ``d x w`` counter table over one increment per input row.

    Output: ``row_i INT, bucket BIGINT, cnt BIGINT`` (only touched buckets
    materialize; absent buckets are implicitly zero).
    """
    k = F.col(key) if isinstance(key, str) else key
    return (
        df.select(F.explode(_bucket_array(k, d, w)).alias("b"))
        .groupBy(F.col("b.row_i").alias("row_i"), F.col("b.bucket").alias("bucket"))
        .agg(F.count("*").cast("bigint").alias("cnt"))
    )


def count_min_estimate(
    sketch: DataFrame,
    probes: DataFrame,
    key: str,
    d: int = CMS_D,
    w: int = CMS_W,
) -> DataFrame:
    """Point-estimate the frequency of each probe key: min over the key's
    ``d`` counters (0 when a counter was never touched). The sketch side is
    at most ``d x w`` rows — broadcast it.

    Output: the probe rows + ``est BIGINT`` (>= the true count, always).
    """
    pb = probes.select(
        F.col(key), F.explode(_bucket_array(F.col(key), d, w)).alias("b")
    ).select(key, F.col("b.row_i").alias("row_i"), F.col("b.bucket").alias("bucket"))
    joined = pb.join(F.broadcast(sketch), ["row_i", "bucket"], "left")
    return joined.groupBy(key).agg(
        F.min(F.coalesce(F.col("cnt"), F.lit(0))).cast("bigint").alias("est")
    )


# ---------------------------------------------------------------------------
# KMV (k-minimum-values) distinct-count sketch
# ---------------------------------------------------------------------------
#
# Spark ships HyperLogLog as ``approx_count_distinct``, but (like
# ``count_min_sketch``) its state is an opaque binary — unverifiable across
# engines and unmergeable outside Spark. KMV is the relational alternative:
# keep the k SMALLEST ``stable_hash64`` values per group. The kth-smallest
# order statistic of n uniform draws on [0, H) sits near k*H/n, so
# ``(k-1) * H / h_k`` estimates n (Bar-Yossef et al.'s classic estimator,
# relative error ~ 1/sqrt(k-2)). Groups with fewer than k distinct hashes
# are EXACT (the sketch saw every value).
#
# Scale shape: build is groupBy(group, hash)-distinct then a per-group
# WindowGroupLimit (partial top-k before the shuffle) — the sketch is k rows
# per group regardless of corpus size, and two corpora merge by unioning
# sketches and re-taking the k minima (min-union is associative and
# idempotent, so merge order never matters).

KMV_K = 64
KMV_HMAX = 1 << 60  # stable_hash64 is uniform on [0, 2^60)


def _k_minima(
    hashed: DataFrame, group_cols: tuple[str, ...], k: int
) -> DataFrame:
    """Shared KMV retention rule: distinct hashes per group, keep the k
    smallest with 1-based ``pos`` — build and merge MUST share this body
    (the merge==rebuild property is exactly "same retention rule")."""
    w = Window.partitionBy(*[F.col(g) for g in group_cols]).orderBy(F.asc("h"))
    return (
        hashed.distinct()
        .withColumn("pos", F.row_number().over(w))
        .filter(F.col("pos") <= k)
        .select(*group_cols, F.col("pos").cast("int").alias("pos"), "h")
    )


def kmv_build(
    df: DataFrame, key: Column | str, group_cols: tuple[str, ...] = (), k: int = KMV_K
) -> DataFrame:
    """Build the per-group KMV sketch: the ``k`` smallest distinct hash
    values of ``key``. Output: ``group_cols..., pos INT, h BIGINT`` with
    ``pos`` = 1-based rank of ``h`` among the group's retained minima."""
    kc = F.col(key) if isinstance(key, str) else key
    hashed = df.select(
        *[F.col(g) for g in group_cols], stable_hash64(kc).alias("h")
    )
    return _k_minima(hashed, group_cols, k)


def kmv_merge(
    a: DataFrame, b: DataFrame, group_cols: tuple[str, ...] = (), k: int = KMV_K
) -> DataFrame:
    """Merge two KMV sketches over the same key domain: union the retained
    hashes, dedup, re-take the k minima. Exactly ``kmv_build`` of the
    concatenated inputs (proven in tests), so sketches of shards compose."""
    u = a.select(*group_cols, "h").unionByName(b.select(*group_cols, "h"))
    return _k_minima(u, group_cols, k)


def kmv_estimate(
    sketch: DataFrame, group_cols: tuple[str, ...] = (), k: int = KMV_K
) -> DataFrame:
    """Distinct-count estimate per group from a KMV sketch.

    ``n_obs < k`` -> exact ``n_obs``; otherwise
    ``round((k-1) * (HMAX / h_k))`` with ``h_k`` = the kth-smallest hash
    (the sketch's max). The division happens FIRST (HMAX and h_k are both
    exactly representable order-of-magnitude doubles) and identically in
    the SQL oracle, so the estimate is bit-deterministic cross-engine.

    Output: ``group_cols..., n_obs BIGINT, est_distinct BIGINT``.
    """
    grouped = sketch.groupBy(*[F.col(g) for g in group_cols]).agg(
        F.count("*").cast("bigint").alias("n_obs"),
        F.max("h").alias("h_k"),
    )
    est = F.when(F.col("n_obs") < k, F.col("n_obs")).otherwise(
        F.round(
            F.lit(float(k - 1)) * (F.lit(float(KMV_HMAX)) / F.col("h_k").cast("double"))
        ).cast("bigint")
    )
    return grouped.select(
        *group_cols, "n_obs", est.cast("bigint").alias("est_distinct")
    )


# --- Bloom filter -----------------------------------------------------------
# Same design brief as CMS/KMV: Spark has F.bloom_filter_agg-style opaque
# blobs (and DataFrameStatFunctions), but an opaque binary sketch cannot be
# verified cross-engine or merged relationally. This Bloom filter is a
# (word_idx, bits) TABLE: k salted stable_hash64 positions per key, packed
# 60 bits per BIGINT word (bit 59 max keeps every word positive — no
# signed-overflow divergence between engines), OR-aggregated per word.

BLOOM_K = 3            # hash functions
BLOOM_M = 1 << 14      # default filter size in bits — sized for the graded
#                        sf0.01 fixture (~4.4k distinct shingles). At
#                        realistic key cardinalities this DEFAULT SATURATES
#                        (fp -> 1, every probe "hits"): size m from the
#                        expected key count with ``bloom_m_for`` and check
#                        ``bloom_occupancy`` after building — a load factor
#                        near 1.0 means the filter carries no signal.
BLOOM_WORD_BITS = 60   # bits packed per BIGINT word (positive-safe)


def bloom_m_for(expected_keys: int, target_fp: float = 0.01,
                k: int = BLOOM_K) -> int:
    """Size the filter from the expected DISTINCT key count: the smallest
    ``m`` (rounded up to whole 60-bit words) with false-positive rate
    ``<= target_fp`` at ``expected_keys`` insertions under ``k`` hashes —
    solve fp = (1 - e^{-kn/m})^k for m: ``m = -k*n / ln(1 - fp^(1/k))``.
    Callers at corpus scale MUST size from a count (or a KMV estimate —
    ``kmv_distinct`` composes here) instead of taking BLOOM_M, which is
    fixture-sized and saturates beyond a few thousand keys."""
    import math

    if expected_keys <= 0:
        return BLOOM_WORD_BITS
    if not 0.0 < target_fp < 1.0:
        raise ValueError(f"target_fp must be in (0, 1), got {target_fp}")
    m = -k * expected_keys / math.log(1.0 - target_fp ** (1.0 / k))
    words = max(1, math.ceil(m / BLOOM_WORD_BITS))
    return words * BLOOM_WORD_BITS


def bloom_occupancy(bloom: DataFrame, m: int = BLOOM_M,
                    k: int = BLOOM_K) -> DataFrame:
    """The saturation side-channel (the bucket_stats analog for Bloom
    filters): one row with the filter's set-bit count, load factor
    (set bits / m) and the implied false-positive rate ``load^k`` — a
    probe misses only if at least one of its k positions is unset, so at
    load ~1.0 ``bloom_hit`` degenerates to all-true and the caller should
    resize via ``bloom_m_for`` instead of trusting the hits. One scan of
    the (<= m/60-row) filter table, no shuffle.

    Output: ``n_set_bits BIGINT, m BIGINT, load DOUBLE, est_fp DOUBLE``.
    """
    return bloom.agg(
        F.coalesce(F.sum(F.bit_count("bits")), F.lit(0)).cast("bigint").alias(
            "n_set_bits"
        )
    ).select(
        "n_set_bits",
        F.lit(m).cast("bigint").alias("m"),
        F.round(F.col("n_set_bits") / F.lit(float(m)), 6).alias("load"),
        F.round(F.pow(F.col("n_set_bits") / F.lit(float(m)), F.lit(float(k))), 6).alias(
            "est_fp"
        ),
    )


def _bloom_positions(key: Column, k: int, m: int) -> Column:
    return F.array(
        *[(stable_hash64(key, salt=f"bloom{i}:") % m) for i in range(k)]
    )


def _word_mask(pos: Column) -> Column:
    """``1 << (pos % 60)`` with a COLUMN shift amount (F.shiftleft only
    takes a literal count): index a 60-entry power-of-two array literal —
    constant-folded, stays in whole-stage codegen. Bit 59 max keeps every
    word positive (no signed-overflow divergence between engines)."""
    masks = F.array(
        *[F.lit(1 << b).cast("bigint") for b in range(BLOOM_WORD_BITS)]
    )
    return F.element_at(masks, (pos % BLOOM_WORD_BITS).cast("int") + 1)


def bloom_build(df: DataFrame, key: Column | str, k: int = BLOOM_K,
                m: int = BLOOM_M) -> DataFrame:
    """Build the relational Bloom filter over a key column.

    Output: ``word_idx BIGINT, bits BIGINT`` — only touched words
    materialize (absent words are implicitly 0). Mergeable across
    corpora/increments with a further ``groupBy(word_idx).agg(bit_or)``;
    the shuffle carries at most ``m / 60`` words per map partition
    regardless of corpus size (map-side partial bit_or).
    """
    kc = F.col(key) if isinstance(key, str) else key
    return (
        df.select(F.explode(_bloom_positions(kc, k, m)).alias("pos"))
        .select(
            (F.col("pos") / F.lit(BLOOM_WORD_BITS)).cast("bigint").alias("word_idx"),
            _word_mask(F.col("pos")).alias("mask"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("mask").alias("bits"))
    )


def bloom_probe(bloom: DataFrame, probes: DataFrame, key: Column | str,
                k: int = BLOOM_K, m: int = BLOOM_M) -> DataFrame:
    """Probe membership: a key is a HIT iff all k of its bit positions are
    set. Never a false negative; false-positive rate ~ (1 - e^{-kn/m})^k.

    The filter table is at most ``m/60`` rows — broadcast onto the probe
    stream, so probing is map-side (no shuffle of the probe side beyond
    the per-key groupBy counting satisfied positions).

    Output: one row per DISTINCT probe key (the per-key groupBy that
    checks all k positions also dedupes), ``probe_key, bloom_hit``.
    """
    kc = F.col(key) if isinstance(key, str) else key
    exploded = probes.select(
        kc.alias("probe_key"), F.explode(_bloom_positions(kc, k, m)).alias("pos")
    ).select(
        "probe_key",
        "pos",
        (F.col("pos") / F.lit(BLOOM_WORD_BITS)).cast("bigint").alias("word_idx"),
        _word_mask(F.col("pos")).alias("mask"),
    )
    hits = (
        exploded.join(F.broadcast(bloom), "word_idx", "left")
        .withColumn(
            "set_",
            (F.coalesce(F.col("bits"), F.lit(0)).bitwiseAND(F.col("mask")) != 0),
        )
        .groupBy("probe_key")
        .agg((F.count_if(F.col("set_")) == F.count("*")).alias("bloom_hit"))
    )
    return hits


# --- HyperLogLog ------------------------------------------------------------
# Same design brief as CMS/KMV/Bloom: Spark ships approx_count_distinct
# (HLL++) but its sketch is opaque and its estimate engine-specific — not
# verifiable cross-engine, not mergeable relationally. This HLL keeps the
# sketch as a ``(group..., bucket, reg)`` TABLE built on the engine-portable
# 60-bit stable_hash64, so registers replay exactly in ANSI SQL, shards
# merge with a groupBy-max (the defining HLL property), and the estimate is
# computed from EXACT integer register sums so the only floats are one
# division, one add, and (in the small-range branch) one ln — identical
# expression shape both engines, rounded to 6dp.
#
# Layout: bucket = h mod 2^p (m = 2^p registers), w = h >> p uniform on
# [0, 2^(60-p)); reg = rho(w) = (60 - p) - nbits(w) + 1, where nbits(w) =
# length(bin(w)) in BOTH engines (minimal binary rendering, no leading
# zeros), and rho(0) = 60 - p + 1. At 100 TB the sketch is the whole point:
# distinct-token / distinct-shingle cardinality per source without the
# exact COUNT(DISTINCT) shuffle — the build's shuffle carries at most
# groups x m registers regardless of corpus size, and per-shard sketches
# compose by max.

HLL_P = 8                    # 2^8 = 256 registers per group
HLL_ALPHA = {                # alpha_m for the standard bias correction
    16: 0.673, 32: 0.697, 64: 0.709,
}


def _hll_alpha(m: int) -> float:
    return HLL_ALPHA.get(m, 0.7213 / (1.0 + 1.079 / m))


def hll_cols(key: Column, p: int = HLL_P) -> tuple[Column, Column]:
    """The per-occurrence ``(bucket, rho)`` column pair — the ONE source
    of truth shared by ``hll_build`` and the streaming register twin
    (``streaming.events.streaming_hourly_distinct_registers``), so batch
    and stream cannot drift. Integer shift, NOT h/m: a double round-trip
    would lose low bits for h > 2^53 (stable_hash64 is uniform on
    [0, 2^60))."""
    m = 1 << p
    h = stable_hash64(key)
    w = F.shiftright(h, p)
    rho = (
        F.when(w == 0, F.lit(60 - p + 1))
        .otherwise(F.lit(60 - p + 1) - F.length(F.bin(w)))
        .cast("int")
    )
    return (h % m), rho


def hll_build(
    df: DataFrame,
    key: Column | str,
    group_cols: tuple[str, ...] = (),
    p: int = HLL_P,
) -> DataFrame:
    """Build the per-group HLL register table over ``key``.

    Output: ``group_cols..., bucket BIGINT, reg INT`` — only touched
    buckets materialize (absent buckets are implicitly reg=0, accounted
    for by ``hll_estimate``). One explode-free map pass + one
    map-side-combinable groupBy-max; the shuffle carries at most
    groups x 2^p rows per map partition."""
    kc = F.col(key) if isinstance(key, str) else key
    bucket, rho = hll_cols(kc, p)
    return (
        df.select(
            *[F.col(g) for g in group_cols],
            bucket.alias("bucket"),
            rho.alias("rho"),
        )
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rho").alias("reg"))
    )


def hll_merge(
    a: DataFrame, b: DataFrame, group_cols: tuple[str, ...] = ()
) -> DataFrame:
    """Merge two HLL register tables over the same key domain: per-bucket
    max. Exactly ``hll_build`` of the concatenated inputs (the lossless-
    union property that makes HLL the distributed distinct-counter —
    proven in tests), so shard sketches compose with one tiny shuffle."""
    u = a.select(*group_cols, "bucket", "reg").unionByName(
        b.select(*group_cols, "bucket", "reg")
    )
    return u.groupBy(*group_cols, "bucket").agg(F.max("reg").alias("reg"))


def hll_estimate(
    sketch: DataFrame, group_cols: tuple[str, ...] = (), p: int = HLL_P
) -> DataFrame:
    """Cardinality estimate per group from a register table.

    The harmonic sum is computed EXACTLY in integers: sum over touched
    registers of 2^(60-p+1-reg) is a BIGINT (reg >= 1 bounds each term at
    2^(60-p); 2^p terms keep the sum far inside 2^63), then ONE float
    division by 2^(60-p+1) and ONE add of the untouched-register count
    reconstruct sum(2^-reg) bit-identically in both engines. Standard
    corrections: raw = alpha*m^2/sum; raw <= 2.5m with empty registers ->
    linear counting m*ln(m/zeros) (the single ln; rounded 6dp).

    Output: ``group_cols..., n_touched BIGINT, reg_sum BIGINT,
    est_distinct DOUBLE`` (6dp)."""
    m = 1 << p
    maxr = 60 - p + 1
    grouped = sketch.groupBy(*[F.col(g) for g in group_cols]).agg(
        F.count("*").cast("bigint").alias("n_touched"),
        F.sum("reg").cast("bigint").alias("reg_sum"),
        # SQL-form shiftleft: the pyspark wrapper only takes a literal
        # shift amount, the SQL function takes an expression
        F.sum(
            F.expr(f"shiftleft(CAST(1 AS BIGINT), {maxr} - reg)")
        ).cast("bigint").alias("inv_sum_scaled"),
    )
    zeros = (F.lit(m) - F.col("n_touched")).cast("double")
    inv_sum = F.col("inv_sum_scaled").cast("double") / F.lit(
        float(1 << maxr)
    ) + zeros
    raw = F.lit(_hll_alpha(m) * m * m) / inv_sum
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (zeros > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / zeros),
    ).otherwise(raw)
    return grouped.select(
        *group_cols,
        "n_touched",
        "reg_sum",
        F.round(est, 6).alias("est_distinct"),
    )


def hll_estimate_duckdb_sql(
    hashed_cte: str, group_cols: tuple[str, ...] | list[str], p: int = HLL_P
) -> str:
    """The ONE DuckDB rendering of the HLL register build + estimate
    contract above (``hll_build``/``hll_estimate``), kept adjacent so the
    two definitions can't drift (the ``stable_hash64_sql`` convention).
    Shared by every HLL oracle — the graded ``hll_tokens`` /
    ``events_hourly_distinct`` entries in ``__spark_entry__`` AND the
    pytest differentials (via ``tests/conftest.hll_estimate_sql``) — so a
    change to the correction logic cannot leave one oracle asserting
    stale math.

    ``hashed_cte``: SQL producing ``group_cols..., h`` (h = the portable
    60-bit hash — render it with ``functions.ids.stable_hash64_sql``,
    never a fresh literal). Output: ``group_cols..., n_touched, reg_sum,
    est_distinct`` (6dp)."""
    m, maxr = 1 << p, 60 - p + 1
    alpha_mm = _hll_alpha(m) * m * m  # ONE float literal: DuckDB parses
    # `0.718... * 256 * 256` as DECIMAL and overflows
    g = ", ".join(group_cols)
    est = (
        f"{alpha_mm!r} / (inv_scaled::DOUBLE / {float(1 << maxr)!r}"
        f" + ({m} - n_touched)::DOUBLE)"
    )
    return f"""
WITH hashed AS ({hashed_cte}),
regs AS (
  SELECT {g}, h % {m} AS bucket,
         max(CASE WHEN (h >> {p}) = 0 THEN {maxr}
                  ELSE {maxr} - length(bin(h >> {p})) END)::INT AS reg
  FROM hashed GROUP BY {g}, h % {m}
),
agg AS (
  SELECT {g}, count(*)::BIGINT AS n_touched,
         sum(reg)::BIGINT AS reg_sum,
         sum((1::BIGINT << ({maxr} - reg)))::BIGINT AS inv_scaled
  FROM regs GROUP BY {g}
)
SELECT {g}, n_touched, reg_sum,
       round(CASE WHEN {est} <= {2.5 * m!r} AND n_touched < {m}
             THEN {float(m)!r} * ln({float(m)!r} / ({m} - n_touched)::DOUBLE)
             ELSE {est}
             END, 6) AS est_distinct
FROM agg"""


# ---------------------------------------------------------------------------
# Mergeable exact value-histogram quantiles (r12; staged r13 graded-entry
# candidate) — the QUANTILES rung of the sketch family (counts: CMS;
# distinct: HLL/KMV; membership: Bloom). Spark's exact `percentile`
# buffers every row per group and `approx_percentile` (Greenwald-Khanna)
# is not SQL-replayable; for the integer-valued columns this engine
# actually measures (micro-unit scores bounded by the 1e6 grid, token
# counts, byte lengths) the honest 100 TB shape is a VALUE histogram:
# the shuffle carries (group, value) partial counts — bounded by value
# CARDINALITY, never row count — per-shard histograms merge by count
# ADDITION (merge == rebuild EXACT, the hll_merge property), and the
# type-7 quantile extraction is exact integer arithmetic over the tiny
# merged table. Interpolation happens once, in a fixed-operand-order
# double expression over identical integers, so it is bit-identical
# cross-engine.


def vhist_build(
    df: DataFrame,
    col: Column | str,
    group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Per-group value histogram over an integer-valued column: ONE
    map-side-combinable groupBy. Output: ``group_cols..., v BIGINT,
    c BIGINT``."""
    vc = (F.col(col) if isinstance(col, str) else col).cast("bigint")
    return (
        df.select(*[F.col(g) for g in group_cols], vc.alias("v"))
        .groupBy(*group_cols, "v")
        .agg(F.count("*").cast("bigint").alias("c"))
    )


def vhist_merge(
    a: DataFrame, b: DataFrame, group_cols: tuple[str, ...] = ()
) -> DataFrame:
    """Merge two histograms: per-(group, value) count sum — exactly
    ``vhist_build`` of the concatenated inputs (pinned in tests), so
    shard/stream histograms compose with one tiny shuffle."""
    u = a.select(*group_cols, "v", "c").unionByName(
        b.select(*group_cols, "v", "c")
    )
    return u.groupBy(*group_cols, "v").agg(F.sum("c").cast("bigint").alias("c"))


def vhist_quantiles(
    hist: DataFrame,
    qs: tuple[tuple[int, int], ...] = ((1, 4), (1, 2), (3, 4)),
    group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Exact type-7 (linear-interpolated) quantiles per group from a
    value histogram. ``qs`` are exact rationals ``(num, den)`` — the
    target rank ``h = (n-1) * num / den`` splits into integer arithmetic
    ``k = h_num div den``, ``rem = h_num mod den``, and the result is
    ``x[k] + rem/den * (x[k+1] - x[k])`` (numpy/DuckDB ``quantile_cont``
    semantics; ``rem == 0`` needs no upper order statistic).

    Relational shape: per-group running counts over the value-BOUNDED
    histogram (the heavy_hitters bounded-window class), an equi-join of
    the tiny (group x qs) target frame, and ONE conditional aggregation
    that selects both order statistics — no corpus-wide sort, no
    per-group row buffering, and no self-join: ``x_lo``/``x_hi`` are
    ``min(v WHERE cum >= k+1)`` / ``min(v WHERE cum >= k+2)`` computed
    side by side (r12: the previous two-groupBy + left-join form ran the
    whole cum-window subtree twice and sort-merge-joined the halves).

    Output: ``group_cols..., q DOUBLE, value DOUBLE`` (value rounded
    6dp)."""
    gb = [F.col(g) for g in group_cols]
    w = Window.partitionBy(*gb).orderBy(F.col("v").asc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = hist.select(
        *gb, "v", F.sum("c").over(w).alias("cum")
    )
    n = hist.groupBy(*gb).agg(F.sum("c").cast("bigint").alias("n"))
    # ONE scan of the per-group totals yields every target row (the
    # previous per-quantile unionByName re-derived the `n` aggregate —
    # and its whole upstream build — once per quantile); group columns
    # are renamed before the re-join so the self-join never hits Spark's
    # conflicting-attribute analysis (seen on memory-sink views)
    targets = n.select(
        *[F.col(g).alias(f"_t_{g}") for g in group_cols],
        F.explode(
            F.array(
                *[
                    F.struct(
                        (F.lit(float(num)) / F.lit(float(den))).alias("q"),
                        F.expr(f"((n - 1) * {int(num)}) div {int(den)}").alias("k"),
                        F.expr(f"((n - 1) * {int(num)}) % {int(den)}").alias("rem"),
                        F.lit(int(den)).alias("den"),
                    )
                    for num, den in qs
                ]
            )
        ).alias("_t"),
    ).select(
        *[F.col(f"_t_{g}") for g in group_cols],
        "_t.q", "_t.k", "_t.rem", "_t.den",
    )
    if group_cols:
        cond = None
        for g in group_cols:
            c = cum[g] == targets[f"_t_{g}"]
            cond = c if cond is None else (cond & c)
        joined = cum.join(F.broadcast(targets), cond).drop(
            *[f"_t_{g}" for g in group_cols]
        )
    else:
        joined = cum.crossJoin(F.broadcast(targets))
    # x_lo always exists (k <= n-1 so the last cum row qualifies); x_hi
    # is NULL exactly when no row reaches rank k+2 — the same rows the
    # old left join produced, now from a single pass
    res = joined.groupBy(*gb, "q", "rem", "den").agg(
        F.min(F.when(F.col("cum") >= F.col("k") + 1, F.col("v"))).alias("x_lo"),
        F.min(F.when(F.col("cum") >= F.col("k") + 2, F.col("v"))).alias("x_hi"),
    )
    val = F.round(
        F.col("x_lo")
        + (F.col("rem").cast("double") / F.col("den").cast("double"))
        * (F.coalesce(F.col("x_hi"), F.col("x_lo")) - F.col("x_lo"))
        .cast("double"),
        6,
    )
    return res.select(*gb, "q", val.alias("value"))


def vhist_quantiles_duckdb_sql(
    src: str,
    value_expr: str,
    group_cols: tuple[str, ...] = (),
    qs: tuple[tuple[int, int], ...] = ((1, 4), (1, 2), (3, 4)),
) -> str:
    """The DuckDB rendering of ``vhist_build`` + ``vhist_quantiles`` over
    relation ``src`` (kept adjacent so the definitions can't drift).
    ``value_expr`` is the integer value SQL; output matches the Spark
    operator: ``group_cols..., q, value``."""
    g = ", ".join(group_cols)
    gc = f"{g}, " if group_cols else ""
    part = f"PARTITION BY {g} " if group_cols else ""
    join_on = (
        " AND ".join(f"c.{x} = t.{x}" for x in group_cols)
        if group_cols
        else "TRUE"
    )
    tsel = " UNION ALL ".join(
        f"""SELECT {gc}{float(num) / float(den)!r} AS q,
           ((n - 1) * {int(num)}) // {int(den)} AS k,
           ((n - 1) * {int(num)}) % {int(den)} AS rem,
           {int(den)} AS den
    FROM n"""
        for num, den in qs
    )
    return f"""
WITH hist AS (
  SELECT {gc}({value_expr})::BIGINT AS v, count(*)::BIGINT AS c
  FROM ({src}) GROUP BY {g + ', ' if g else ''}v
),
cum AS (
  SELECT {gc}v,
         sum(c) OVER ({part}ORDER BY v ASC ROWS UNBOUNDED PRECEDING) AS cum
  FROM hist
),
n AS (SELECT {gc}sum(c)::BIGINT AS n FROM hist {('GROUP BY ' + g) if g else ''}),
targets AS ({tsel}),
lo AS (
  SELECT {('c.' + ', c.'.join(group_cols) + ', ') if group_cols else ''}t.q, t.rem, t.den,
         min(c.v) AS x_lo
  FROM cum c JOIN targets t ON {join_on}
  WHERE c.cum >= t.k + 1
  GROUP BY {('c.' + ', c.'.join(group_cols) + ', ') if group_cols else ''}t.q, t.rem, t.den
),
hi AS (
  SELECT {('c.' + ', c.'.join(group_cols) + ', ') if group_cols else ''}t.q,
         min(c.v) AS x_hi
  FROM cum c JOIN targets t ON {join_on}
  WHERE c.cum >= t.k + 2
  GROUP BY {('c.' + ', c.'.join(group_cols) + ', ') if group_cols else ''}t.q
)
SELECT {('lo.' + ', lo.'.join(group_cols) + ', ') if group_cols else ''}lo.q,
       round(lo.x_lo + (lo.rem::DOUBLE / lo.den::DOUBLE)
             * (coalesce(hi.x_hi, lo.x_lo) - lo.x_lo)::DOUBLE, 6) AS value
FROM lo LEFT JOIN hi
  ON {(' AND '.join(f'lo.{x} = hi.{x}' for x in group_cols) + ' AND ') if group_cols else ''}lo.q = hi.q"""
