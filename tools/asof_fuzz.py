#!/usr/bin/env python3
"""As-of-join differential fuzz corpus: random keyed time series put
through pandas.merge_asof (executed in-sandbox) across every direction /
tolerance / by / duplicate-ts shape graft's Joins.asofJoinBy supports —
goldens replayed by graft.AsofFuzzSpec.

Why pandas and not DuckDB: the battery's q_asof_* oracles already replay
through DuckDB's native ASOF JOIN, but the operator's documented contract
is pandas merge_asof parity (direction backward/forward/nearest, per-arm
tolerance, dup-ts pick-last/pick-first, nearest equal-distance -> the
backward arm). Executing pandas itself pins exactly those clauses.

Semantics established by probe (2026-08-14, pandas 2.2.2):
  - duplicate right ts: backward picks the LAST input occurrence,
    forward the FIRST, nearest follows the winning arm's rule
    (graft mirror: rightTieBreak=["pos"] over an input-order ordinal);
  - nearest equal-distance tie -> the backward match;
  - tolerance applies per candidate arm (a too-far backward match is
    NaN even when a within-bound forward row exists, and vice versa);
  - NaN payload on a matched row stays NaN (no-match is NaN too —
    the replay compares the matched r_ts column to disambiguate).

Usage: python3 tools/asof_fuzz.py [n_cases] [seed] [out.jsonl]
"""
import json
import random
import sys
from pathlib import Path

import numpy as np
import pandas as pd


def gen_case(r):
    by = r.random() < 0.5
    ngroups = r.randint(1, 3) if by else 1
    n_left = r.randint(3, 12)
    n_right = r.choice([0] + [r.randint(1, 10)] * 5)
    # ts pools deliberately tight so exact-match / dup-ts / tie shapes
    # occur often; a 1-in-8 wide pool covers the sparse regime
    hi = 60 if r.random() < 0.125 else 20
    left = sorted((r.randint(0, hi), r.randint(0, ngroups - 1), i)
                  for i in range(n_left))
    right = sorted((r.randint(0, hi), r.randint(0, ngroups - 1), j)
                   for j in range(n_right))
    rvs = [None if r.random() < 0.1 else round(r.uniform(-5, 9), 3)
           for _ in range(n_right)]
    direction = r.choice(["backward", "forward", "nearest"])
    tolerance = r.randint(1, 5) if r.random() < 0.4 else None
    return {
        "left": {"ts": [t for t, _, _ in left],
                 "g": [g for _, g, _ in left],
                 "uid": [u for _, _, u in left]},
        "right": {"ts": [t for t, _, _ in right],
                  "g": [g for _, g, _ in right],
                  "pos": list(range(n_right)),
                  "rv": rvs},
        "args": {"direction": direction, "tolerance": tolerance,
                 "by": by},
    }


def run_pandas(case):
    L = pd.DataFrame({"ts": pd.array(case["left"]["ts"], dtype="int64"),
                      "g": pd.array(case["left"]["g"], dtype="int64"),
                      "uid": pd.array(case["left"]["uid"], dtype="int64")})
    R = pd.DataFrame({"ts": pd.array(case["right"]["ts"], dtype="int64"),
                      "g": pd.array(case["right"]["g"], dtype="int64"),
                      "pos": pd.array(case["right"]["pos"], dtype="int64"),
                      "rv": pd.array(case["right"]["rv"], dtype="float64"),
                      "rts": pd.array(case["right"]["ts"], dtype="int64")})
    kw = {"on": "ts", "direction": case["args"]["direction"]}
    if case["args"]["by"]:
        kw["by"] = "g"
    else:
        L = L.drop(columns=["g"])
        R = R.drop(columns=["g"])
    if case["args"]["tolerance"] is not None:
        kw["tolerance"] = case["args"]["tolerance"]
    m = pd.merge_asof(L, R, **kw)
    out = {}
    for _, row in m.iterrows():
        uid = int(row["uid"])
        rts = None if pd.isna(row["rts"]) else int(row["rts"])
        rv = None if pd.isna(row["rv"]) else float(row["rv"])
        pos = None if pd.isna(row["pos"]) else int(row["pos"])
        out[str(uid)] = [rts, rv, pos]
    return out


def main():
    n_cases = int(sys.argv[1]) if len(sys.argv) > 1 else 400
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 20260816
    out = Path(sys.argv[3]) if len(sys.argv) > 3 else \
        Path(__file__).parent.parent / "src/test/resources/fuzz/asof_fuzz.jsonl"
    out.parent.mkdir(parents=True, exist_ok=True)
    kept, errors, i = [], [], 0
    counts = {}
    while len(kept) < n_cases and i < n_cases * 4:
        r = random.Random(seed * 99991 + i)
        i += 1
        case = gen_case(r)
        try:
            expect = run_pandas(case)
        except Exception as e:  # noqa: BLE001
            errors.append({"args": case["args"],
                           "err": f"{type(e).__name__}: {e}"[:200]})
            continue
        case["id"] = len(kept)
        case["expect"] = expect
        kept.append(case)
        key = case["args"]["direction"] + (
            "+tol" if case["args"]["tolerance"] is not None else "")
        counts[key] = counts.get(key, 0) + 1
    with out.open("w") as f:
        for c in kept:
            f.write(json.dumps(c, allow_nan=False) + "\n")
    print(f"wrote {len(kept)} cases ({i} attempts, {len(errors)} "
          f"pandas-errored, dirs={counts})")
    if errors:
        print("sample errors:", json.dumps(errors[:5], indent=1))


if __name__ == "__main__":
    main()
