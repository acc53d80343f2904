#!/usr/bin/env python3
"""BPE merge-exhaustion parity check (dev tooling, NOT part of the library).

The q_bpe_merge / q_bpe_encode oracles retrain 3 merges as CTEs; on a
corpus whose pair census runs dry earlier (every word reduces to one
symbol), the m2/m3 argmax CTEs are empty and — before round 8 — emptied
every downstream cross join while the engine still emitted per-doc
encodings. The oracles now union an unreachable ''-symbol fallback row
into empty rounds; this script proves engine ≡ DuckDB on exactly that
corpus ("abab" everywhere: merge 1 = (a,b), merge 2 = (ab,ab), round 3
exhausted).

Usage: python3 tools/bpe_exhaustion_check.py
(writes the fixture to /tmp/bpex, runs graft.Verify on it, compares)
"""
import glob
import json
import subprocess
import sys

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

FIXTURE = "/tmp/bpex"
OUT = "/tmp/bpex_verify"

tbl = pa.table({
    "doc_id": pa.array([1, 2], pa.int64()),
    "text": ["abab abab", "abab"],
    "lang": ["en", "en"], "source": ["s", "s"],
    "n_chars": pa.array([9, 4], pa.int64()),
})
import os
os.makedirs(FIXTURE, exist_ok=True)
pq.write_table(tbl, f"{FIXTURE}/documents.parquet")

r = subprocess.run(
    ["sbt", "-batch", f"runMain graft.Verify {FIXTURE} {OUT} q_bpe_.*"],
    capture_output=True, text=True)
if r.returncode != 0:
    sys.exit(f"Verify failed:\n{r.stdout[-2000:]}")

con = duckdb.connect()
con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{FIXTURE}/documents.parquet')")
oracles = json.load(open(f"{OUT}/oracle_sql.json"))
fails = 0
for name in ["q_bpe_merge", "q_bpe_encode", "q_bpe_roundtrip"]:
    files = sorted(glob.glob(f"{OUT}/{name}/*.parquet"))
    spark_rows = pa.concat_tables([pq.read_table(f) for f in files]).to_pylist()
    cols = None
    cur = con.execute(oracles[name])
    cols = [d[0] for d in cur.description]
    duck_rows = [dict(zip(cols, row)) for row in cur.fetchall()]
    ok = spark_rows == duck_rows
    print(f"{'PASS' if ok else 'FAIL'} {name} ({len(spark_rows)} rows)")
    if not ok:
        print(" spark:", spark_rows, "\n duck :", duck_rows)
        fails += 1
print(f"== {3 - fails} pass / {fails} fail ==")
sys.exit(1 if fails else 0)
