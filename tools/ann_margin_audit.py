#!/usr/bin/env python3
"""ANN census margin audit (r18 diagnostics, VERDICT r17 item 1c).

Replays the engine's EXACT cell-assignment and PQ-code semantics in pure
Python (IEEE doubles, floor-scaled longs — a third implementation,
independent of both Spark and DuckDB), computes the three census results
(q_ann_build / q_ann_delta / q_ann_stats), and reports:

  - the census rows (to compare against Spark's and DuckDB's),
  - the MINIMUM decision margin over every argmax (cell assignment) and
    argmin (PQ code) decision: |best - runner_up| relative to |best|.

If every margin is fat (>> 1 ulp), no IEEE-conforming environment can
flip any assignment, so a driver-environment divergence must be
structural (stale artifact, different data, different compare), not
float drift.

Usage: python3 tools/ann_margin_audit.py <sfDir>
"""
import math
import sys

import pyarrow.parquet as pq

SCALE = 1e12


def scaled_dot(a, b):
    # engine: Σ floor(x·y·1e12) as long (exact, order-independent)
    s = 0
    for x, y in zip(a, b):
        s += math.floor(float(x) * float(y) * SCALE)
    return s


def scaled_sq_dist(a, b):
    s = 0
    for x, y in zip(a, b):
        d = float(x) - float(y)
        s += math.floor(d * d * SCALE)
    return s


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    tbl = pq.read_table(f"{sf}/embeddings.parquet")
    ids = tbl.column("vec_id").to_pylist()
    vecs = tbl.column("embedding").to_pylist()
    rows = sorted(zip(ids, vecs))
    data = {i: v for i, v in rows}

    def build(pred):
        corpus = [(i, v) for i, v in rows if pred(i)]
        seeds = corpus[:16]  # 16 smallest ids (rows sorted)
        codebook = [[float(x) for x in v] for _, v in seeds[:8]]
        seed_norms = [math.sqrt(float(scaled_dot(v, v))) for _, v in seeds]
        out = {}
        min_cell_margin = (float("inf"), None)
        min_code_margin = (float("inf"), None)
        for vid, v in corpus:
            n2 = scaled_dot(v, v)
            nv = math.sqrt(float(n2))
            cos = [float(scaled_dot(v, sv)) / (nv * seed_norms[si])
                   for si, (_, sv) in enumerate(seeds)]
            best = max(range(16), key=lambda i: (cos[i], -i))
            # engine fold: strict > keeps FIRST max == lowest index tie-break
            cell = 0
            for i in range(16):
                if cos[i] > cos[cell]:
                    cell = i
            assert cell == best or cos[cell] == cos[best]
            srt = sorted(cos, reverse=True)
            if srt[0] != 0:
                m = abs(srt[0] - srt[1]) / abs(srt[0])
                if m < min_cell_margin[0]:
                    min_cell_margin = (m, vid)
            codes = []
            code_sum = 0
            for mi in range(8):
                sub = [float(x) for x in v[mi * 8:(mi + 1) * 8]]
                ds = [scaled_sq_dist(sub, c[mi * 8:(mi + 1) * 8])
                      for c in codebook]
                k = min(range(8), key=lambda j: (ds[j], j))
                codes.append(k)
                code_sum += k
                dd = sorted(ds)
                if dd[0] != dd[1]:
                    m = (dd[1] - dd[0]) / max(dd[0], 1)
                    if m < min_code_margin[0]:
                        min_code_margin = (m, (vid, mi))
            dist = sum(min(scaled_sq_dist([float(x) for x in v[mi*8:(mi+1)*8]],
                                          c[mi * 8:(mi + 1) * 8])
                           for c in codebook) for mi in range(8))
            out[vid] = (cell, n2, code_sum, dist, codes)
        return out, min_cell_margin, min_code_margin

    main_assign, cm, km = build(lambda i: i != 0)
    print(f"n_corpus={len(main_assign)}  min_cell_margin={cm[0]:.3e} at vec {cm[1]}  "
          f"min_code_margin={km[0]:.3e} at {km[1]}")

    # q_ann_build census
    cells = {}
    for vid, (cell, n2, sc, dist, _) in main_assign.items():
        c = cells.setdefault(cell, [0, 0, 0, None, None, 0, 0])
        c[0] += 1; c[1] += n2; c[2] += sc
        c[3] = vid if c[3] is None else min(c[3], vid)
        c[4] = vid if c[4] is None else max(c[4], vid)
        c[5] += dist; c[6] = max(c[6], dist)
    print("q_ann_build (cell:n_vecs:sum_n2:sum_codes:min:max):")
    print(";".join(f"{c}:{v[0]}:{v[1]}:{v[2]}:{v[3]}:{v[4]}"
                   for c, v in sorted(cells.items())))
    print("q_ann_stats (cell:n_vecs:sum_distortion:max_distortion):")
    print(";".join(f"{c}:{v[0]}:{v[5]}:{v[6]}" for c, v in sorted(cells.items())))

    # q_ann_delta: base = even ids (≠0), delta = odd ids assigned under base seeds
    base_assign, cm2, km2 = build(lambda i: i != 0 and i % 2 == 0)
    base_seeds = [(i, v) for i, v in rows if i != 0 and i % 2 == 0][:16]
    seed_norms = [math.sqrt(float(scaled_dot(v, v))) for _, v in base_seeds]
    dcells = {}
    for vid, (cell, n2, _, _, _) in base_assign.items():
        c = dcells.setdefault(cell, [0, 0, 0])
        c[0] += 1; c[2] += n2
    min_dm = (float("inf"), None)
    for vid, v in rows:
        if vid == 0 or vid % 2 == 0:
            continue
        n2 = scaled_dot(v, v)
        nv = math.sqrt(float(n2))
        cos = [float(scaled_dot(v, sv)) / (nv * seed_norms[si])
               for si, (_, sv) in enumerate(base_seeds)]
        cell = 0
        for i in range(16):
            if cos[i] > cos[cell]:
                cell = i
        srt = sorted(cos, reverse=True)
        if srt[0] != 0:
            m = abs(srt[0] - srt[1]) / abs(srt[0])
            if m < min_dm[0]:
                min_dm = (m, vid)
        c = dcells.setdefault(cell, [0, 0, 0])
        c[1] += 1; c[2] += n2
    print(f"delta min margins: base cell {cm2[0]:.3e}@{cm2[1]}  delta cell {min_dm[0]:.3e}@{min_dm[1]}")
    print("q_ann_delta (cell:n_base:n_delta:sum_n2):")
    print(";".join(f"{c}:{v[0]}:{v[1]}:{v[2]}" for c, v in sorted(dcells.items())))


if __name__ == "__main__":
    main()
