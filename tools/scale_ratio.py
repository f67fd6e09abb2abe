#!/usr/bin/env python3
"""Battery scale-validation report (VERDICT r9 item 1): compare two Bench
JSON lines (sf0.1 vs the ScaleGen sf1-equivalent) and print a per-query
ratio table sorted by ratio, flagging superlinear queries.

Usage: python3 tools/scale_ratio.py <bench_sf0.1.json> <bench_sf1.json>
       [flag_ratio=15]

A 10x data scale on local[32] should cost <= ~10x wall-clock for a
linear, well-partitioned operator (often less: fixed overheads amortize).
Queries above flag_ratio get a plan audit; sublinear queries (limits,
id-capped oracles, fixed-k outputs) are expected and reported, not
flagged.
"""
import json
import sys


def load(path):
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line.startswith("{") and '"queries"' in line:
                return json.loads(line)
    raise SystemExit(f"no bench JSON line in {path}")


def main():
    a = load(sys.argv[1])  # sf0.1
    b = load(sys.argv[2])  # sf1
    flag = float(sys.argv[3]) if len(sys.argv) > 3 else 15.0
    qa, qb = a["queries"], b["queries"]
    rows = []
    for q in sorted(qa):
        if q not in qb:
            print(f"MISSING at sf1: {q}")
            continue
        ta, tb = qa[q], qb[q]
        ratio = tb / ta if ta > 0 else float("inf")
        rows.append((ratio, q, ta, tb))
    rows.sort(reverse=True)
    print(f"{'query':32s} {'sf0.1':>8s} {'sf1':>8s} {'ratio':>7s}  verdict")
    n_flag = 0
    for ratio, q, ta, tb in rows:
        v = ""
        if ratio > flag:
            v = "SUPERLINEAR — audit"
            n_flag += 1
        elif ratio > 10:
            v = "~linear+overhead"
        elif ratio < 2:
            v = "sublinear/fixed"
        print(f"{q:32s} {ta:8.2f} {tb:8.2f} {ratio:7.2f}  {v}")
    print(f"\ntotal: sf0.1={a['value']:.1f}s sf1={b['value']:.1f}s "
          f"ratio={b['value'] / a['value']:.2f} "
          f"({n_flag} queries over {flag}x)")


if __name__ == "__main__":
    main()
