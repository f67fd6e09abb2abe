#!/usr/bin/env python3
"""dt-surface completeness audit (VERDICT r9 item 3): execute the REFERENCE
with every pandas Series.dt attribute/method not yet in graft's grammar, on
BOTH layers (base numpy datetime64 and nested arrow timestamp), and report
accept/raise + a sample value. Dev tooling only.

Usage: python3 tools/dt_audit.py
"""
import sys
from pathlib import Path

import numpy as np
import pandas as pd

sys.path.insert(0, str(Path(__file__).parent))
from ref_harness import load_reference  # noqa: E402

npd = load_reference()

base = pd.DataFrame({
    "i": [1, 2, 3],
    "ts": pd.to_datetime(["2024-03-05 10:30:45.123456",
                          "2023-12-31 23:59:59",
                          "2022-01-01 00:00:00"], format="mixed"),
})
nf = npd.NestedFrame(base.set_index("i"))
child = pd.DataFrame({
    "t": pd.to_datetime(["2024-02-29 06:00:00", "2021-07-04 12:00:00",
                         "2024-03-05 10:30:45.123456",
                         "2020-02-29 00:00:00", "2023-06-15 18:45:00",
                         "2022-11-11 11:11:11"], format="mixed"),
    "v": [1.0, 2.0, 3.0, 4.0, 5.0, 6.0],
}, index=[1, 1, 2, 2, 3, 3])
nf = nf.add_nested(child, "n")

CASES = [
    # (label, base_expr, nested_expr)
    ("date", "r = ts.dt.date", "r = n.t.dt.date"),
    ("time", "r = ts.dt.time", "r = n.t.dt.time"),
    ("timetz", "r = ts.dt.timetz", "r = n.t.dt.timetz"),
    ("nanosecond", "r = ts.dt.nanosecond", "r = n.t.dt.nanosecond"),
    ("day_name", "r = ts.dt.day_name()", "r = n.t.dt.day_name()"),
    ("month_name", "r = ts.dt.month_name()", "r = n.t.dt.month_name()"),
    ("tz_localize", "r = ts.dt.tz_localize('UTC')",
     "r = n.t.dt.tz_localize('UTC')"),
    ("tz_convert", "r = ts.dt.tz_localize('UTC').dt.tz_convert('US/Eastern')",
     "r = n.t.dt.tz_localize('UTC').dt.tz_convert('US/Eastern')"),
    ("ceil", "r = ts.dt.ceil('h')", "r = n.t.dt.ceil('h')"),
    ("round", "r = ts.dt.round('h')", "r = n.t.dt.round('h')"),
    ("to_period", "r = ts.dt.to_period('M')", "r = n.t.dt.to_period('M')"),
    ("as_unit", "r = ts.dt.as_unit('ms')", "r = n.t.dt.as_unit('ms')"),
    ("isocalendar", "r = ts.dt.isocalendar()", "r = n.t.dt.isocalendar()"),
    ("to_pydatetime", "r = ts.dt.to_pydatetime()",
     "r = n.t.dt.to_pydatetime()"),
    ("unit", "r = ts.dt.unit", "r = n.t.dt.unit"),
    ("tz_attr", "r = ts.dt.tz", "r = n.t.dt.tz"),
    ("freq", "r = ts.dt.freq", "r = n.t.dt.freq"),
    ("start_time", "r = ts.dt.start_time", "r = n.t.dt.start_time"),
    # comparisons through derived attrs (should work if attr works)
    ("day_name_cmp_query", None, None),  # handled specially below
]

for label, be, ne in CASES:
    if be is None:
        continue
    for layer, expr in (("base", be), ("nested", ne)):
        try:
            out = nf.eval(expr, inplace=False)
            if layer == "base":
                val = out["r"].head(3).tolist()
                dt = out["r"].dtype
            else:
                flat = out["n"].nest.to_flat()
                val = flat["r"].head(3).tolist()
                dt = flat["r"].dtype
            print(f"OK    {label:14s} {layer:6s} dtype={dt} sample={val}")
        except Exception as e:
            msg = str(e).replace("\n", " | ")[:140]
            print(f"RAISE {label:14s} {layer:6s} {type(e).__name__}: {msg}")

# query-path usage of the two name methods
for q, layer in [("ts.dt.day_name() == 'Tuesday'", "base"),
                 ("n.t.dt.month_name() == 'February'", "nested")]:
    try:
        out = nf.query(q)
        print(f"OK    query:{layer:6s} {q!r} rows={len(out)}")
    except Exception as e:
        print(f"RAISE query:{layer:6s} {q!r} {type(e).__name__}: "
              f"{str(e)[:120]}")
