#!/usr/bin/env python3
"""Docs-count drift guard (dev tooling, NOT part of the Scala library).

README/SURVEY claim concrete counts (oracle queries, ScalaTest tests,
suites) that were hand-edited every round and drifted twice in round 6.
This guard derives the real numbers and fails when any CURRENT doc line
disagrees. Historical sections (markdown headers containing "prev") are
skipped — past-round logs legitimately cite past counts.

Sources of truth:
  - query/oracle counts: `sbt "runMain graft.CountDump"` (authoritative:
    the actual SparkEntry registries; takes ~20 s), or --counts '{"n_queries":N,...}'
    to reuse a fresh dump.
  - test/suite counts: the tail of an `sbt test` log via --sbt-log FILE
    (looks for "Total number of tests run: N" / "Suites: completed M").
    Omitted -> test-count checks are skipped with a warning.

Usage:
  python3 tools/countcheck.py [--counts JSON] [--sbt-log FILE]
Exit 1 on any drift.
"""
import json
import re
import subprocess
import sys

DOCS = ["README.md", "SURVEY.md", "COVERAGE.md", "SCALE.md"]

# pattern -> counts key; each match's number must equal the real count
CLAIMS = [
    (re.compile(r"(\d+)\s+oracle[- ]checked quer", re.I), "n_queries"),
    (re.compile(r"(\d+)\s+oracle quer", re.I), "n_queries"),
    # case-sensitive: "all 231 queries" is a registry-size claim, while
    # COVERAGE's "ALL 22 queries" is the TPC-H shape count
    (re.compile(r"all\s+(\d+)\s+quer"), "n_queries"),
    (re.compile(r"(\d+)/(?:\d+)\s+quer", re.I), "n_queries"),
    (re.compile(r"(\d+)\s+ScalaTest (?:specs|tests)", re.I), "n_tests"),
    (re.compile(r"(\d+)\s+tests?\s*/\s*\d+\s+suites", re.I), "n_tests"),
    (re.compile(r"\d+\s+tests?\s*/\s*(\d+)\s+suites", re.I), "n_suites"),
    (re.compile(r"across\s+(\d+)\s+suites", re.I), "n_suites"),
]


def real_counts(args):
    counts = {}
    if args.counts:
        counts.update(json.loads(args.counts))
    else:
        out = subprocess.run(
            ["sbt", "-batch", "runMain graft.CountDump"],
            capture_output=True, text=True, check=False)
        for line in out.stdout.splitlines():
            m = re.search(r'\{"n_queries":\d+,"n_oracles":\d+\}', line)
            if m:
                counts.update(json.loads(m.group(0)))
        if "n_queries" not in counts:
            sys.exit(f"CountDump produced no counts; sbt output tail:\n{out.stdout[-2000:]}")
    if args.sbt_log:
        log = open(args.sbt_log).read()
        t = re.findall(r"Total number of tests run: (\d+)", log)
        s = re.findall(r"Suites: completed (\d+)", log)
        if t:
            counts["n_tests"] = int(t[-1])
        if s:
            counts["n_suites"] = int(s[-1])
    return counts


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--counts", help='reuse a fresh CountDump JSON, e.g. \'{"n_queries":231,"n_oracles":231}\'')
    ap.add_argument("--sbt-log", help="path to an `sbt test` output log for test/suite counts")
    args = ap.parse_args()
    counts = real_counts(args)
    print(f"real counts: {counts}")
    if "n_tests" not in counts:
        print("WARN: no --sbt-log given — test/suite count claims are NOT checked")

    drift = []
    for doc in DOCS:
        try:
            lines = open(doc).read().splitlines()
        except FileNotFoundError:
            continue
        in_prev = False
        for i, line in enumerate(lines, 1):
            if line.startswith("#"):
                in_prev = ("prev" in line.lower()) or ("historical" in line.lower())
            if in_prev:
                continue
            for pat, key in CLAIMS:
                if key not in counts:
                    continue
                for m in pat.finditer(line):
                    claimed = int(m.group(1))
                    if claimed != counts[key]:
                        drift.append((doc, i, key, claimed, counts[key], line.strip()[:100]))
    for doc, i, key, claimed, real, ctx in drift:
        print(f"DRIFT {doc}:{i} claims {key}={claimed}, real={real} | {ctx}")
    print(f"{len(drift)} stale count(s)")
    sys.exit(1 if drift else 0)


if __name__ == "__main__":
    main()
