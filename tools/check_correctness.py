#!/usr/bin/env python3
"""Local pre-check mimicking the driver's correctness gate.

Usage: python3 tools/check_correctness.py <sfDir> <outDir>
  (run `sbt "runMain graft.Verify <sfDir> <outDir>"` first)

For each <outDir>/<name> parquet dir, runs the matching oracle SQL from
<outDir>/oracle_sql.json in DuckDB against the sfDir tables, then compares
row counts, column names, and value hashes (columns sorted by name, rows
sorted by all columns) — the same spirit as the driver's compare.

NOT part of the shipped library — dev tooling only (duckdb/pandas are
driver-side deps, never imported by the Scala engine).
"""
import json
import sys
from pathlib import Path

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df.columns):
        df = df.sort_values(by=list(df.columns), ignore_index=True)
    # normalize ints (int32 vs int64) and floats
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
    return df


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.loads((Path(out_dir) / "oracle_sql.json").read_text())
    failures = 0
    names = sorted(d.name for d in Path(out_dir).iterdir() if d.is_dir())
    # A query that THREW inside Verify writes no output dir — diff against
    # the declared battery so missing outputs fail loudly instead of
    # silently shrinking the denominator (the round-7 events.ts
    # regeneration slipped through exactly this way).
    expected_file = Path(out_dir) / "queries.json"
    if expected_file.exists():
        expected = set(json.loads(expected_file.read_text()))
        missing = sorted(expected - set(names))
        for name in missing:
            print(f"FAIL {name}: NO OUTPUT (query failed inside Verify)")
            failures += 1
    else:
        missing = []
    for name in names:
        got = pd.read_parquet(Path(out_dir) / name)
        if name not in oracle:
            print(f"  {name}: rows={len(got)} (rows-only check, no oracle)")
            if len(got) == 0:
                print(f"FAIL {name}: zero rows")
                failures += 1
            continue
        try:
            exp = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            failures += 1
            continue
        g, e = canon(got), canon(exp)
        if list(g.columns) != list(e.columns):
            print(f"FAIL {name}: columns {list(g.columns)} != {list(e.columns)}")
            failures += 1
            continue
        if len(g) != len(e):
            print(f"FAIL {name}: rows {len(g)} != {len(e)}")
            failures += 1
            continue
        # The driver hashes dtypes: int64 vs float64 for the same column is a
        # hash mismatch even when values are equal (round-1 q_rollup). Flag
        # any post-canon dtype divergence as a failure.
        dtype_diff = [c for c in g.columns if str(g[c].dtype) != str(e[c].dtype)]
        if dtype_diff:
            print(f"FAIL {name}: dtype mismatch on {dtype_diff}: "
                  f"spark={[str(g[c].dtype) for c in dtype_diff]} "
                  f"oracle={[str(e[c].dtype) for c in dtype_diff]}")
            failures += 1
            continue
        if len(g) == 0:
            # an empty result matching an empty oracle proves nothing —
            # treat as a degenerate query that needs a better predicate
            print(f"FAIL {name}: oracle matches but result is EMPTY "
                  f"(degenerate query)")
            failures += 1
            continue
        try:
            pd.testing.assert_frame_equal(g, e, check_dtype=False,
                                          check_exact=True)
            print(f"  {name}: OK ({len(g)} rows)")
        except AssertionError:
            # retry with tolerance to show whether it's a rounding-only diff
            try:
                pd.testing.assert_frame_equal(g, e, check_dtype=False,
                                              rtol=1e-6, atol=1e-6)
                print(f"NEAR {name}: values differ only within 1e-6 "
                      f"(hash compare would FAIL)")
            except AssertionError as e2:
                print(f"FAIL {name}: value mismatch\n{str(e2)[:500]}")
            failures += 1
    total = len(names) + len(missing)
    print(f"\n{total - failures}/{total} queries pass")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
