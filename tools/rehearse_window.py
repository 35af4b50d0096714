"""Driver-condition rehearsal: run the first-50 ``queries()`` window under a
PLAIN SparkSession — ``local[8]``, no tuned configs — and time each entry.

Why this exists (round-6 lesson, re-checked every round): the tuned session
``tools/check_oracle.py`` builds hides interpreted-expression hazards.
Higher-order array lambdas run INTERPRETED and re-evaluate free
subexpressions per invocation, so a query that is fast under the tuned
local[32] session can be 30-100x slower under the plain session the
grading driver actually uses (r6 finding: doc_knn 135 s -> 7.6 s and
poj_e2e 269 s -> 4.0 s after token-major folds). Rehearse BEFORE artifact
day; any entry an order of magnitude over its check_oracle time is a red
flag to fix, not to hope past.

Usage: python tools/rehearse_window.py [n_entries] [sf_dir]
Defaults: 50 entries (the driver window), /root/testdata/sf0.01.
Prints per-entry wall seconds (collect() included) and a total.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"

    from pyspark.sql import SparkSession

    import __spark_entry__ as entry

    # deliberately NO tuned configs — this must match the grading driver's
    # plain session, which is the whole point of the rehearsal
    spark = SparkSession.builder.master("local[8]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    qs = list(entry.queries().items())[:n]
    total = 0.0
    worst: list[tuple[float, str]] = []
    for name, fn in qs:
        t0 = time.time()
        cnt = len(fn(spark, sf_dir).collect())
        dt = time.time() - t0
        total += dt
        worst.append((dt, name))
        print(f"{dt:7.2f}s  {name} ({cnt} rows)", flush=True)
    worst.sort(reverse=True)
    print(f"\ntotal {total:.1f}s over {len(qs)} entries; slowest:")
    for dt, name in worst[:8]:
        print(f"  {dt:7.2f}s  {name}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
