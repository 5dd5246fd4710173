#!/usr/bin/env python3
"""Compare two graft.Verify output dirs value-for-value.

Usage: python3 tools/diff_verify.py <outDirA> <outDirB>

Used for end-to-end invariance replays: run Verify twice with different
`SPARK_GRAFT_CPUS` (shuffle partitions / parallelism) or back-to-back with
identical settings, then diff every query's dumped parquet. The declared
queries all end in a deterministic ORDER BY, so the dumps must be
row-for-row identical — any diff is either nondeterminism (e.g. a limit
without a total order) or partition-count sensitivity (e.g. a float
aggregation whose rounding flips with summation order), both of which the
engine's conventions (pround/qlong quantization, pinned tie-breaks) exist
to rule out. NaN == NaN here (a NaN cell matching a NaN cell is equal);
row ORDER matters.

Exit 1 on any diff; prints one line per query.
"""
import math
import sys

import pyarrow.dataset as ds


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0.0:  # -0.0 == 0.0 comparison-normalized
            return 0.0
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    return v


def main(a_dir, b_dir):
    import os
    names = sorted(d for d in os.listdir(a_dir)
                   if os.path.isdir(os.path.join(a_dir, d)))
    b_names = sorted(d for d in os.listdir(b_dir)
                     if os.path.isdir(os.path.join(b_dir, d)))
    n_pass = n_fail = 0
    if names != b_names:
        only_a = set(names) - set(b_names)
        only_b = set(b_names) - set(names)
        print(f"FAIL query sets differ: only_a={sorted(only_a)} only_b={sorted(only_b)}")
        n_fail += 1
    for name in sorted(set(names) & set(b_names)):
        ta = ds.dataset(f"{a_dir}/{name}").to_table()
        tb = ds.dataset(f"{b_dir}/{name}").to_table()
        ca, cb = ta.column_names, tb.column_names
        if ca != cb:
            print(f"FAIL {name}: columns {ca} vs {cb}"); n_fail += 1; continue
        if ta.num_rows != tb.num_rows:
            print(f"FAIL {name}: rows {ta.num_rows} vs {tb.num_rows}"); n_fail += 1; continue
        rows_a = list(zip(*[ta.column(c).to_pylist() for c in ca])) if ca else []
        rows_b = list(zip(*[tb.column(c).to_pylist() for c in ca])) if ca else []
        bad = [(i, x, y) for i, (x, y) in enumerate(zip(rows_a, rows_b))
               if tuple(map(norm, x)) != tuple(map(norm, y))]
        if bad:
            i, x, y = bad[0]
            print(f"FAIL {name}: {len(bad)}/{len(rows_a)} differing rows; "
                  f"first: row {i} a={x} b={y}  cols={ca}")
            n_fail += 1
        else:
            print(f"PASS {name} ({ta.num_rows} rows)")
            n_pass += 1
    print(f"== {n_pass} identical, {n_fail} differ")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
