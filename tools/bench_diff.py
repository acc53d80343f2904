#!/usr/bin/env python3
"""Bench regression gate (dev tooling, NOT part of the Scala library).

Diffs two bench result files per query and flags regressions. Accepts
either format:
  - tools/bench_local_r*.json / tools/bench_last.json: JSON-lines with a
    {"metric":"detail","queries":{...}} line
  - BENCH_r*.json (driver capture): object whose "tail" string contains
    the truncated per-query map — parsed best-effort for whatever query
    names survived the capture window

Usage: python3 tools/bench_diff.py <old[,old2,...]> <new> [ratio=1.5]
[floor_sec=0.5]

A query is flagged only when BOTH (a) new/old >= ratio and (b) new time
>= floor_sec — sub-floor queries are pure harness noise. Since round 6,
Bench emits the MIN of two independent runs per query, so a flagged
ratio is by construction reproduced (both runs of the new code exceeded
it); the two-run rule is built into the numbers, not this script.

Two-anchor mode (round 14): <old> may be a comma-separated list of
anchors — typically the adjacent bench AND the previous round's
committed bench. The r13 graph family gained +23% in sub-threshold
steps the single adjacent anchor could not see (each step < ratio, the
cumulative drift > ratio); diffing against BOTH anchors catches it: per
query, the OLD time is the per-anchor MINIMUM (each anchor is already a
healthy-box min-of-two), so cumulative drift compounds against the
older anchor while a genuinely new query still compares against
whichever anchor has it. The flag report names the anchor that supplied
the old time. OLD family totals are computed PER ANCHOR (each a
coherent same-session sum over that anchor's valid members) and the
minimum total over the BEST-COVERING anchors is used — never a mix of
per-query minima from different sessions (ADVICE r14), and never a bare
min that lets an anchor predating some family members undercut a
full-coverage anchor's total (ADVICE r15).

Box-health annotation (round 15): each side's warmup_sec probe (the
fixed session-warm action Bench/ScaleCurve time and emit) is printed
when present, so a degraded-box comparison is visible in the report
itself instead of requiring the run_totals narrative.

Family-aware (round 8): queries cache-share persisted intermediates
within a bench family (first two '_'-segments of the name — the unit at
which Bench clears caches). Which member pays the shared build is an
artifact of alphabetical order, so adding/renaming a family member moves
seconds between slots without any real regression (r7: the
q_dedup_source_mirror rename landed the shingle build on q_dedup_ngram,
1.9x "slower", while the dedup family TOTAL fell 4.1 s). A per-query flag is an
ATTRIBUTION SHIFT (informational, exit 0) only when the family total is
roughly CONSERVED — at least half of the query's own increase is offset
elsewhere in its family (family_delta < 0.5 * query_delta). If the
family total grew by most of the query's delta, nothing offset it: the
slowdown is real and the flag is REGRESSED (exit 1), even when the
family is too large for its own total to trip the ratio.

The detail line's errors array gates too: EVERY query in the new run's
errors list has no valid measurement (its elapsed is a time-to-crash),
so it is reported as ERRORED and fails the gate — including a query that
errors on BOTH sides (absent from both queries maps) or a brand-new
failing query; a broken query fails the gate every round until fixed.
Exit code 1 when any regression OR errored query is found (CI-style).
"""
import json
import re
import sys


def load(path):
    """Returns (queries: {name: sec}, errors: set[name], warmup_sec|None,
    probe2_sec|None)."""
    txt = open(path).read()
    # box-health probes: prefer the PARSED total/summary line (JSON-lines
    # format) — a driver-capture artifact whose tail concatenates lines
    # from more than one run would otherwise report a stale probe via a
    # first-match regex (ADVICE r15). When several total lines exist, the
    # LAST one is the run the file describes; the raw-text fallback below
    # mirrors that with the last regex match.
    warmup, probe2, detail = None, None, None
    for line in txt.splitlines():
        line = line.strip()
        if not line.startswith("{"):
            continue
        if '"metric":"detail"' in line and detail is None:
            detail = json.loads(line)
        elif '"metric":"total"' in line:
            try:
                t = json.loads(line)
                if "warmup_sec" in t:
                    warmup = float(t["warmup_sec"])
                if "probe2_sec" in t:
                    probe2 = float(t["probe2_sec"])
            except json.JSONDecodeError:
                pass
    if warmup is None:
        ms = re.findall(r'"warmup_sec":([0-9.]+)', txt)
        warmup = float(ms[-1]) if ms else None
    if probe2 is None:
        ms = re.findall(r'"probe2_sec":([0-9.]+)', txt)
        probe2 = float(ms[-1]) if ms else None
    if detail is not None:
        return detail["queries"], set(detail.get("errors", [])), warmup, probe2
    # driver capture: whole object with optional "tail" fragment
    try:
        obj = json.loads(txt)
        if isinstance(obj, dict):
            errs = set(obj.get("errors", []))
            if "queries" in obj:
                return obj["queries"], errs, warmup, probe2
            if "queries_sec" in obj:
                return obj["queries_sec"], errs, warmup, probe2
            if "tail" in obj:
                return {
                    m.group(1): float(m.group(2))
                    for m in re.finditer(r'"(q_\w+)":([0-9.]+)', obj["tail"])
                }, errs, warmup, probe2
    except json.JSONDecodeError:
        pass
    raise SystemExit(f"unrecognized bench format: {path}")


def family(q):
    """Cache-sharing unit: first two '_'-segments ('q_dedup_ngram' -> 'q_dedup').

    Must mirror graft.Bench's family() — the boundary at which the bench
    clears caches, hence the unit within which persisted intermediates are
    shared and per-slot attribution can shift.
    """
    parts = q.split("_")
    return "_".join(parts[:2]) if len(parts) > 2 else q


def main():
    old_paths, new_path = sys.argv[1].split(","), sys.argv[2]
    ratio = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    floor = float(sys.argv[4]) if len(sys.argv) > 4 else 0.5
    anchors = [(p, *load(p)) for p in old_paths]
    new, new_errs, new_warm, new_p2 = load(new_path)
    def probes(w, p2):
        a = "%.2fs" % w if w is not None else "n/a (pre-r15 artifact)"
        b = f", probe2 {p2:.2f}s" if p2 is not None else ""
        return a + b
    for path, _, _, w, p2 in anchors:
        print(f"box probe {path}: {probes(w, p2)}")
    print(f"box probe {new_path}: {probes(new_warm, new_p2)}")
    # merged old side: per-query minimum across anchors (each anchor is a
    # healthy min-of-two already); remember which anchor supplied it so a
    # flag names the round it drifted from. A query errored in an anchor
    # contributes nothing from that anchor.
    old, old_src, old_errs = {}, {}, None
    for path, q, errs, _, _ in anchors:
        for name, t in q.items():
            if name in errs:
                continue
            if name not in old or t < old[name]:
                old[name], old_src[name] = t, path
        # a query only counts as old-errored if it errored in EVERY anchor
        # that knows it (otherwise some anchor has a valid measurement)
        old_errs = errs if old_errs is None else (old_errs & errs)
    old_errs = (old_errs or set()) - set(old)
    common = sorted(set(old) & set(new))
    print(f"comparing {len(common)} common queries across "
          f"{len(anchors)} anchor(s) "
          f"({len(new) - len(common)} new-only, {len(old) - len(common)} old-only)")
    # a query errored in the new run has no valid measurement: its fast
    # fail time must not pass (or even flatter) the gate. Since round 8,
    # Bench omits always-failing queries from the queries map entirely
    # (they exist only in `errors`), so detection goes through the errors
    # array, not the common-key intersection — and EVERY new-run error
    # gates, including a query that errors on both sides (absent from
    # both maps) or a brand-new failing query: a broken query must fail
    # the gate every round until fixed, not only the round it broke.
    errored = sorted(new_errs)
    # family totals; computed over the FULL registry on each side (not just
    # common) so a member added on one side still lands in its family's
    # total — that asymmetry is exactly the attribution-shift case this
    # exists to adjudicate. OLD totals are per-anchor sums (each a coherent
    # same-session number) with the minimum taken over anchors containing
    # the family — never a cross-session mix of per-query minima, which
    # understates the old total and skews is_shift toward REGRESSED
    # (ADVICE r14).
    fam_n = {}
    for q, t in new.items():
        if q not in new_errs:
            fam_n[family(q)] = fam_n.get(family(q), 0.0) + t
    # OLD family totals: per-anchor sums (coherent same-session numbers),
    # but an anchor that predates some of the family's COMMON members has a
    # structurally smaller total — taking a bare min over such anchors
    # understates fo and biases is_shift toward REGRESSED, the same skew
    # the per-anchor rule was meant to remove (ADVICE r15). So anchors are
    # ranked by how many of the family's common members they cover; the min
    # total is taken only among the best-covering anchors (the adjacent
    # anchor, same registry, always fully covers — older subset anchors
    # only win when nothing better knows the family).
    fam_common = {}
    for q in common:
        fam_common.setdefault(family(q), set()).add(q)
    fam_best = {}  # family -> (coverage, total)
    for _, q, errs, _, _ in anchors:
        valid = {n for n in q if n not in errs}
        per_anchor = {}
        for name, t in q.items():
            if name not in errs:
                per_anchor[family(name)] = per_anchor.get(family(name), 0.0) + t
        for f, tot in per_anchor.items():
            cov = len(fam_common.get(f, set()) & valid)
            cur = fam_best.get(f)
            if cur is None or cov > cur[0] or (cov == cur[0] and tot < cur[1]):
                fam_best[f] = (cov, tot)
    fam_o = {f: tot for f, (_, tot) in fam_best.items()}
    flagged, shifted, improved = [], [], []
    for q in common:
        if q in new_errs or q in old_errs:
            continue  # no valid (pair of) measurements to compare
        o, n = old[q], new[q]
        if n >= floor and o > 0 and n / o >= ratio:
            f = family(q)
            fo, fn = fam_o.get(f, o), fam_n.get(f, n)
            # an attribution SHIFT means the query's extra time MOVED
            # within its cache-sharing family (family total roughly
            # conserved): at least half the query's increase must be
            # offset elsewhere in the family. If the family total grew
            # by most of the query's delta, nothing offset it — the
            # slowdown is real and gates, even when the family is too
            # large for its own ratio to trip.
            is_shift = (fn - fo) < 0.5 * (n - o)
            (shifted if is_shift else flagged).append(
                (n / o, q, o, n, f, fo, fn, old_src[q]))
        elif o >= floor and n > 0 and o / n >= ratio:
            improved.append((o / n, q, o, n))
    for r, q, o, n in sorted(improved, reverse=True):
        print(f"  IMPROVED {q}: {o:.2f}s -> {n:.2f}s ({r:.1f}x faster)")
    for r, q, o, n, f, fo, fn, src in sorted(shifted, reverse=True):
        print(f"  SHIFTED {q}: {o:.2f}s -> {n:.2f}s ({r:.1f}x vs {src}) but "
              f"family {f} total {fo:.1f}s -> {fn:.1f}s — intra-family cache "
              f"attribution, not a regression")
    for r, q, o, n, f, fo, fn, src in sorted(flagged, reverse=True):
        print(f"  REGRESSED {q}: {o:.2f}s -> {n:.2f}s ({r:.1f}x slower vs "
              f"{src}); family {f} total {fo:.1f}s -> {fn:.1f}s")
    for q in errored:
        print(f"  ERRORED {q}: failed in the new run — no valid measurement")
    ok = set(common) - new_errs - old_errs
    tot_o = sum(old[q] for q in ok)
    tot_n = sum(new[q] for q in ok)
    print(f"common-set total (valid both sides): {tot_o:.1f}s -> {tot_n:.1f}s")
    # probe2 normalization (r15 verdict #4): rescale the new total by the
    # sustained-throughput probe ratio so a cross-box comparison reads in
    # the anchor box's seconds — the mechanical replacement for the
    # run_totals narrative. Printed only when BOTH sides carry probe2
    # (informational: per-query flags above stay unnormalized).
    old_p2s = [p2 for *_, p2 in anchors if p2 is not None]
    if new_p2 and old_p2s:
        f = min(old_p2s) / new_p2
        print(f"probe2-normalized new total: {tot_n * f:.1f}s "
              f"(box factor {f:.3f} = anchor probe2 {min(old_p2s):.2f}s "
              f"/ new probe2 {new_p2:.2f}s)")
    print(f"{len(flagged)} regression(s), {len(shifted)} attribution shift(s), "
          f"{len(errored)} errored (ratio>={ratio}, floor={floor}s)")
    sys.exit(1 if (flagged or errored) else 0)


if __name__ == "__main__":
    main()
