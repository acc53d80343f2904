#!/usr/bin/env python3
"""Stitch two (or more) BENCH_FILTER-halved graft.Bench outputs into one
full-registry record (SCALE.md "Bench wall-clock budget": past ~450
queries a full two-run sweep breaches the 15-min sbt wall cap, so the
sweep runs as disjoint halves — each under the cap, measured under the
same family-cache policy — and this stitches the archive file).

Usage: bench_stitch.py out.json half1.json half2.json [...]

Halves must cover DISJOINT query sets (exits 1 on overlap or on
differing sf dirs). run_totals are summed element-wise per run index —
the stitched totals read as "one sweep's wall, paid in two sbt
sessions". The per-query minimums are untouched, so bench_diff.py
consumes the stitched file exactly like a single-run archive.
"""
import json
import sys


def load(path):
    with open(path) as f:
        lines = [json.loads(l) for l in f if l.strip()]
    total = next(l for l in lines if l.get("metric") == "total")
    detail = next(l for l in lines if l.get("metric") == "detail")
    return total, detail


def main():
    out, paths = sys.argv[1], sys.argv[2:]
    totals, details = zip(*[load(p) for p in paths])
    sfs = {t["sf"] for t in totals}
    if len(sfs) != 1:
        sys.exit(f"sf dirs differ across halves: {sfs}")
    queries = {}
    for p, d in zip(paths, details):
        overlap = set(queries) & set(d["queries"])
        if overlap:
            sys.exit(f"halves overlap ({p}): {sorted(overlap)[:5]} ...")
        queries.update(d["queries"])
    errors = sorted({e for d in details for e in d.get("errors", [])})
    flaky = sorted({e for d in details for e in d.get("flaky", [])})
    n_runs = max(t["n_runs"] for t in totals)
    run_totals = [
        round(sum(t["run_totals"][i] for t in totals if i < len(t["run_totals"])), 3)
        for i in range(n_runs)]
    total_line = {
        "metric": "total", "value": sum(t["value"] for t in totals),
        "unit": "sec", "n_queries": len(queries), "n_errors": len(errors),
        "n_flaky": len(flaky), "n_runs": n_runs, "run_totals": run_totals,
        "sf": sfs.pop(), "stitched_from": paths}
    detail_line = {"metric": "detail", "queries": queries, "errors": errors,
                   "flaky": flaky, "sf": total_line["sf"]}
    # compact separators: bench_diff.py recognizes the detail line by the
    # literal substring "metric":"detail"
    with open(out, "w") as f:
        f.write(json.dumps(total_line, separators=(",", ":")) + "\n")
        f.write(json.dumps(detail_line, separators=(",", ":")) + "\n")
    print(f"stitched {len(paths)} halves -> {out}: {len(queries)} queries, "
          f"total {total_line['value']:.1f}s, run_totals {run_totals}")


if __name__ == "__main__":
    main()
