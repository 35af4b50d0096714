"""Driver-style correctness harness: run every queries() entry on Spark and
its oracle_sql() twin on DuckDB at sf0.01, compare row count, column names
and order-insensitive values. Usage:

    python tools/check_oracle.py [query_name ...]
    python tools/check_oracle.py --analyze-only   # fast pre-commit gate

``--analyze-only`` builds every Spark plan (forcing analysis/resolution) and
parses every oracle SQL against the DuckDB catalog WITHOUT executing either —
it catches schema drift in the fixtures (e.g. the events.ts physical-type
change that silently broke a whole round's artifacts), renamed columns, and
bad expressions in seconds. Run it before committing round artifacts.
One documented exception: plans containing a per-round checkpoint
(dup_groups, corpus_prep_funnel) execute the checkpoint's upstream stages
at construction — AQE materializes them inside ``localCheckpoint`` even
with eager=False — adding a few seconds at sf0.01.
"""

from __future__ import annotations

import math
import os
import sys

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    df.columns = [c.lower() for c in df.columns]
    df = df[sorted(df.columns)]
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def compare(name: str, mine: pd.DataFrame, oracle: pd.DataFrame) -> list[str]:
    problems = []
    if len(mine) != len(oracle):
        problems.append(f"row count {len(mine)} vs oracle {len(oracle)}")
    mcols, ocols = sorted(c.lower() for c in mine.columns), sorted(
        c.lower() for c in oracle.columns
    )
    if mcols != ocols:
        problems.append(f"columns {mcols} vs {ocols}")
        return problems
    m, o = normalize(mine), normalize(oracle)
    if len(m) == len(o):
        for c in m.columns:
            a, b = m[c], o[c]
            # the driver's value-hash is dtype-sensitive: an int64 Spark
            # column vs a float64 oracle column (e.g. DuckDB sum(BIGINT) ->
            # HUGEINT -> float64 in pandas) hash-mismatches even when every
            # value is numerically equal — flag kind mismatches loudly
            if a.dtype.kind != b.dtype.kind and not (
                a.dtype == object or b.dtype == object
            ):
                problems.append(
                    f"col {c}: dtype kind mismatch {a.dtype} vs oracle {b.dtype}"
                    " (driver hash would fail)"
                )
            if pd.api.types.is_float_dtype(a) or pd.api.types.is_float_dtype(b):
                af = pd.to_numeric(a, errors="coerce").astype(float)
                bf = pd.to_numeric(b, errors="coerce").astype(float)
                bad = ~(
                    (af.isna() & bf.isna())
                    | (abs(af - bf) <= 1e-9 + 1e-9 * abs(bf))
                )
                if bad.any():
                    i = bad.idxmax()
                    problems.append(
                        f"col {c}: {int(bad.sum())} value diffs, first at row {i}: "
                        f"{af[i]!r} vs {bf[i]!r}"
                    )
            else:
                if not a.astype(str).equals(b.astype(str)):
                    neq = a.astype(str) != b.astype(str)
                    i = neq.idxmax()
                    problems.append(
                        f"col {c}: {int(neq.sum())} value diffs, first at row {i}: "
                        f"{a[i]!r} vs {b[i]!r}"
                    )
    return problems


def main() -> int:
    sf_dir = os.environ.get("SF_DIR", "/root/testdata/sf0.01")
    import __spark_entry__ as entrymod

    from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.session import (
        get_spark,
    )

    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    args = [a for a in sys.argv[1:] if a != "--analyze-only"]
    analyze_only = "--analyze-only" in sys.argv[1:]
    only = set(args)
    unknown = only - set(qs)
    if unknown:
        print(f"unknown query name(s): {sorted(unknown)}")
        print(f"known: {sorted(qs)}")
        return 2
    failed = []
    if analyze_only:
        for name, fn in qs.items():
            if only and name not in only:
                continue
            try:
                cols = fn(spark, sf_dir).columns  # forces analysis, no exec
                assert cols and len(cols) == len(set(cols))
            except Exception as e:
                print(f"FAIL  {name}: spark analysis: {str(e).splitlines()[0]}")
                failed.append(name)
                continue
            if name in oracles:
                try:
                    # DESCRIBE parses + binds the SQL without running it AND
                    # yields the oracle's output column names — the driver's
                    # value-hash sorts columns by name, so an alias mismatch
                    # (sum(l_quantity) vs sum_qty) fails the gate here,
                    # statically, instead of at artifact time
                    ocols = [
                        r[0].lower()
                        for r in con.sql(
                            f"DESCRIBE {oracles[name]}"
                        ).fetchall()
                    ]
                except Exception as e:
                    print(f"FAIL  {name}: duckdb parse: {str(e).splitlines()[0]}")
                    failed.append(name)
                    continue
                if sorted(c.lower() for c in cols) != sorted(ocols):
                    print(
                        f"FAIL  {name}: column names differ: spark "
                        f"{sorted(c.lower() for c in cols)} vs oracle "
                        f"{sorted(ocols)}"
                    )
                    failed.append(name)
                    continue
            print(f"ok    {name} (analyzed)")
        print()
        if failed:
            print(f"{len(failed)} FAILED: {failed}")
            return 1
        print("all queries analyze")
        return 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            mine = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            failed.append(name)
            continue
        if name not in oracles:
            print(f"skip  {name}: no oracle (rows-only check: {len(mine)} rows)")
            continue
        try:
            oracle = con.sql(oracles[name]).df()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {str(e).splitlines()[0]}")
            failed.append(name)
            continue
        problems = compare(name, mine, oracle)
        if problems:
            print(f"FAIL  {name}: " + "; ".join(problems))
            failed.append(name)
        else:
            print(f"ok    {name} ({len(mine)} rows)")
    print()
    if failed:
        print(f"{len(failed)} FAILED: {failed}")
        return 1
    print("all queries match the oracle")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
