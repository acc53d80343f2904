#!/usr/bin/env python3
"""Double-run determinism diff (dev tooling, not part of the library).

Usage: python3 tools/detdiff.py <outDirA> <outDirB>

For every query directory present in A, loads both parquet outputs and
compares as sorted multisets of rows with columns sorted by name — the
same normalization as tools/check.py, so "deterministic" here means
"the driver's hash gate would see identical bytes on every run".
Exit 1 on any mismatch or missing output.
"""
import sys, os, glob
import pyarrow.parquet as pq
import pyarrow as pa


def norm(v):
    # None sorts before everything by wrapping in a (is_null, repr) key
    if v is None:
        return (0, "")
    if isinstance(v, dict):
        return (1, tuple(sorted((k, norm(x)) for k, x in v.items())))
    if isinstance(v, (list, tuple)):
        return (1, tuple(norm(x) for x in v))
    return (1, repr(v))


def load(path):
    files = sorted(glob.glob(os.path.join(path, "*.parquet")))
    if not files:
        return None
    tbl = pa.concat_tables([pq.read_table(f) for f in files])
    cols = sorted(tbl.column_names)
    data = [tbl.column(c).to_pylist() for c in cols]
    return cols, sorted(tuple(norm(v) for v in row) for row in zip(*data))


def main():
    a_dir, b_dir = sys.argv[1], sys.argv[2]
    names = sorted(d for d in os.listdir(a_dir)
                   if os.path.isdir(os.path.join(a_dir, d)))
    n_bad = 0
    for name in names:
        a = load(os.path.join(a_dir, name))
        b = load(os.path.join(b_dir, name))
        if a is None or b is None:
            print(f"MISSING {name}: a={'ok' if a else 'none'} b={'ok' if b else 'none'}")
            n_bad += 1
        elif a != b:
            print(f"DIFF {name}")
            n_bad += 1
    print(f"{len(names)} queries, {n_bad} nondeterministic/missing")
    sys.exit(1 if n_bad else 0)


main()
