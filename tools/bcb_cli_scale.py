"""BCB CLI end-to-end at a non-trivial size (r6 verdict ask #8): the
reference's own entry-point shape — CLONES.csv + FUNCTIONS.csv metadata +
a Java source TREE on disk — generated at ~50k functions and driven
through ``python -m <package> --dataset bcb`` (the ``run()`` surface),
timed as one lifecycle: recursive source scan -> decode -> snippet
extraction -> corpus build -> hash embed -> index write (create-if-
absent) -> 500-probe kNN benchmark -> IR metrics + the two results CSVs.

Input shape mirrors tests/test_cli.py's fixture, scaled: functions come
in 10-member clone clusters sharing most of their text (within-cluster
pairs are the CLONES.csv ground truth), each function file ~20 lines with
cluster-shared lines plus per-function unique lines; metadata NAMEs are
absolute Windows-style paths (the CLI joins on basenames, the reference
quirk). Files spread over ``n/250`` subdirectories so the recursive scan
has real directory fan-out.

Usage: python tools/bcb_cli_scale.py [--functions 50000] [--samples 500]
[--k 10]. Prints one JSON line for BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CLUSTER = 10  # functions per clone cluster


def generate(root: str, n: int) -> tuple[str, str, str]:
    src = os.path.join(root, "src")
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(src)
    per_dir = 250
    t0 = time.monotonic()
    for d0 in range(0, n, per_dir):
        d = os.path.join(src, f"pkg{d0 // per_dir:04d}")
        os.makedirs(d)
        for i in range(d0, min(d0 + per_dir, n)):
            c = i // CLUSTER
            lines = [f"public void f{i}() {{"]
            # cluster-shared body (drives within-cluster similarity)
            lines += [
                f"  shared stmt {j} of cluster {c} token{(c * 7 + j) % 997};"
                for j in range(14)
            ]
            # per-function unique tail
            lines += [f"  unique stmt {j} of function {i};" for j in range(4)]
            lines.append("}")
            with open(os.path.join(d, f"f{i}.java"), "w") as f:
                f.write("\n".join(lines) + "\n")
    gen_files = round(time.monotonic() - t0, 1)

    clones_csv = os.path.join(root, "CLONES.csv")
    with open(clones_csv, "w") as f:
        f.write("FUNCTION_ID_ONE,FUNCTION_ID_TWO\n")
        # ALL C(CLUSTER,2) within-cluster pairs, not just the adjacent
        # chain: build_clone_map is symmetric but does NO transitive
        # closure, so a chain-only ground truth would mark 7 of 9 correct
        # sibling retrievals non-clones and cap precision near 0.2
        # regardless of retrieval quality (r7 review finding)
        for c in range(n // CLUSTER):
            base = c * CLUSTER
            for j in range(CLUSTER - 1):
                for m in range(j + 1, CLUSTER):
                    f.write(f"{base + j},{base + m}\n")

    funcs_csv = os.path.join(root, "FUNCTIONS.csv")
    with open(funcs_csv, "w") as f:
        f.write("ID,NAME,STARTLINE,ENDLINE\n")
        for i in range(n):
            # snippet = the shared body + unique tail (skip the brace lines)
            f.write(f"{i},C:\\data\\src\\f{i}.java,2,19\n")

    print(
        json.dumps({"stage": "generate", "files": n, "sec": gen_files}),
        flush=True,
    )
    return clones_csv, funcs_csv, src


def main() -> int:
    from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.__main__ import (
        run,
    )

    ap = argparse.ArgumentParser()
    ap.add_argument("--functions", type=int, default=50_000)
    ap.add_argument("--samples", type=int, default=500)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--workdir", default="/tmp/bcb_cli_scale")
    args = ap.parse_args()

    clones_csv, funcs_csv, src = generate(args.workdir, args.functions)
    out_dir = os.path.join(args.workdir, "results")
    os.makedirs(out_dir, exist_ok=True)

    t0 = time.monotonic()
    res = run([
        "--dataset", "bcb",
        "--clones_csv", clones_csv,
        "--functions_csv", funcs_csv,
        "--source_dir", src,
        "--num_samples", str(args.samples),
        "--k", str(args.k),
        "--normalized",
        "--index_path", os.path.join(args.workdir, "bcb_index"),
        "--output_dir", out_dir,
    ])
    wall = round(time.monotonic() - t0, 1)
    print(
        json.dumps(
            {
                "functions": args.functions,
                "samples": args.samples,
                "k": args.k,
                "pipeline_sec": wall,
                "metrics": res["metrics"],
                "results_csvs": sorted(os.listdir(out_dir)),
            }
        ),
        flush=True,
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
