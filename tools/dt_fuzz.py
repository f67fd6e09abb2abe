#!/usr/bin/env python3
"""`.dt` accessor differential fuzz corpus: random frames with datetime
columns on BOTH layers put through the reference's query/eval (executed
in-sandbox) over the Series.dt surface graft maps — attributes, strftime,
normalize, floor, bare boolean-attr predicates, and direct
timestamp-vs-string comparisons. Goldens replayed by the dt corpus test
in graft.DialectFuzzSpec.

Probe-pinned semantics this corpus guards (2026-08-14):
  - base `.dt` comparison spans are 2-valued (NaT -> False, negation
    keeps); element spans are Kleene (NaT drops under mask AND ~mask);
  - base boolean attrs (`is_*`) are numpy bool arrays: NaT -> False
    (graft coalesces on the base layer only);
  - strftime on NaT -> missing; normalize/floor on NaT -> NaT;
  - dayofweek is Monday=0; microsecond is the fractional part.

Timestamps are encoded as Timestamp.isoformat() strings (type code
"dt"); the Scala side builds TimestampNTZ columns — naive datetime64
has no zone, so NTZ is the faithful Spark type.

Usage: python3 tools/dt_fuzz.py [n_cases] [seed] [out.jsonl]
"""
import json
import random
import sys
from pathlib import Path

import pandas as pd

sys.path.insert(0, str(Path(__file__).parent))
from dialect_fuzz import enc_frame, enc_series  # noqa: E402
from ref_harness import load_reference  # noqa: E402

npd = load_reference()

DT_ATTRS = ["year", "month", "day", "hour", "minute", "second",
            "microsecond", "dayofweek", "weekday", "day_of_week",
            "dayofyear", "day_of_year", "quarter", "days_in_month",
            "daysinmonth", "nanosecond"]
DT_BOOL_ATTRS = ["is_leap_year", "is_month_start", "is_month_end",
                 "is_year_start", "is_year_end", "is_quarter_start",
                 "is_quarter_end"]
ATTR_LIT = {"year": (1995, 2031), "month": (1, 12), "day": (1, 28),
            "hour": (0, 23), "minute": (0, 59), "second": (0, 59),
            "microsecond": (0, 999999), "dayofweek": (0, 6),
            "weekday": (0, 6), "day_of_week": (0, 6),
            "dayofyear": (1, 366), "day_of_year": (1, 366),
            "quarter": (1, 4), "days_in_month": (28, 31),
            "daysinmonth": (28, 31), "nanosecond": (0, 1)}
STRFTIME_FMTS = ["%Y-%m-%d", "%Y/%m/%d %H:%M", "%d %b %Y", "%H:%M:%S",
                 "%Y-%m-%dT%H:%M:%S.%f", "%A %j", "%I %p", "100%% %Y",
                 "%y-%m", "%B"]
FLOOR_FREQS = ["D", "h", "min", "s"]
# fixed freqs incl. multiples for floor/ceil/round (r10 dt-audit additions)
ROUND_FREQS = ["D", "h", "min", "s", "15min", "2h", "30s", "500ms", "12h"]
DAYS = ["Monday", "Tuesday", "Wednesday", "Thursday", "Friday",
        "Saturday", "Sunday"]
MONTHS = ["January", "February", "March", "April", "May", "June", "July",
          "August", "September", "October", "November", "December"]
CMPS = ["<", "<=", ">", ">=", "==", "!="]

# boundary pool exercises the is_* attrs and leap/month-end edges.
# Every value carries explicit microseconds: pandas to_datetime infers
# ONE format for the whole column, so the encoding must be uniform.
TS_POOL = ["2020-02-29 00:00:00.000000", "2020-12-31 23:59:59.000000",
           "2021-01-01 00:00:00.000000", "2019-06-30 12:00:00.000000",
           "2024-02-29 06:30:15.123456", "2023-03-31 23:59:59.999999",
           "2022-04-01 00:00:00.000000", "2000-02-28 00:00:00.000000",
           "1999-12-31 23:00:00.000000", "2026-07-01 00:00:00.000001"]


def rand_ts(r):
    if r.random() < 0.35:
        return r.choice(TS_POOL)
    y, mo, d = r.randint(1995, 2030), r.randint(1, 12), r.randint(1, 28)
    h, mi, s = r.randint(0, 23), r.randint(0, 59), r.randint(0, 59)
    us = r.choice([0, 0, 0, r.randint(1, 999999)])
    return f"{y:04d}-{mo:02d}-{d:02d} {h:02d}:{mi:02d}:{s:02d}.{us:06d}"


def gen_frame_dt(r, allow_missing=True):
    nrows = r.randint(15, 40) if r.random() < 0.125 else r.randint(3, 7)
    a = [r.randint(-5, 12) for _ in range(nrows)]
    ts = [None if r.random() < 0.12 else rand_ts(r) for _ in range(nrows)]
    cells = []
    for _ in range(nrows):
        if allow_missing and r.random() < 0.12:
            cells.append(None)
            continue
        cells.append([[None if r.random() < 0.1 else rand_ts(r),
                       None if r.random() < 0.1 else
                       round(r.uniform(-4, 9), 3)]
                      for _ in range(r.randint(1, 4))])
    return {"k": list(range(nrows)),
            "base": {"a": {"t": "i", "v": a}, "ts": {"t": "dt", "v": ts}},
            "nests": {"n": {"fields": [["t", "dt"], ["x", "d"]],
                            "cells": cells}}}


def build_ref_frame_dt(spec):
    nf = npd.NestedFrame(
        {"a": pd.Series(spec["base"]["a"]["v"], index=spec["k"],
                        dtype="int64"),
         "ts": pd.Series(pd.to_datetime(spec["base"]["ts"]["v"],
                                        format="%Y-%m-%d %H:%M:%S.%f"),
                         index=spec["k"])},
        index=spec["k"])
    rows_t, rows_x, idx = [], [], []
    for k, cell in zip(spec["k"], spec["nests"]["n"]["cells"]):
        if cell is None:
            continue
        for t, x in cell:
            rows_t.append(t)
            rows_x.append(x)
            idx.append(k)
    child = pd.DataFrame({"t": pd.to_datetime(
                              rows_t, format="%Y-%m-%d %H:%M:%S.%f"),
                          "x": pd.array(rows_x, dtype="float64")},
                         index=idx)
    return nf.add_nested(child, "n")


def dt_cmp(r, recv):
    roll = r.random()
    if roll < 0.1:
        # r10 audit: day_name/month_name equality (string result)
        return f"{recv}.dt.day_name() {r.choice(['==', '!='])} " \
               f"'{r.choice(DAYS)}'"
    if roll < 0.18:
        return f"{recv}.dt.month_name() {r.choice(['==', '!='])} " \
               f"'{r.choice(MONTHS)}'"
    if roll < 0.3:
        # ceil/round vs date-string (pandas coerces the literal)
        meth = r.choice(["ceil", "round"])
        return f"{recv}.dt.{meth}('{r.choice(ROUND_FREQS)}') " \
               f"{r.choice(CMPS)} '{rand_ts(r)[:10]}'"
    m = r.choice(DT_ATTRS)
    lo, hi = ATTR_LIT[m]
    return f"{recv}.dt.{m} {r.choice(CMPS)} {r.randint(lo, hi)}"


def gen_program(r, fam):
    if fam == "query_base":
        roll = r.random()
        if roll < 0.25:
            core = f"{'' if r.random() < 0.5 else '~'}ts.dt." \
                   f"{r.choice(DT_BOOL_ATTRS)}"
        elif roll < 0.4:
            # direct timestamp-vs-string comparison (pandas coerces)
            core = f"ts {r.choice(CMPS)} '{rand_ts(r)[:10]}'"
        elif roll < 0.5:
            # global dt-derived reduction vs attr (base layer only:
            # the reference REJECTS reductions inside nested queries —
            # "cannot target multiple structs/layers")
            m = r.choice(["year", "month", "dayofyear", "hour"])
            agg = r.choice(["mean", "min", "max", "median"])
            core = f"ts.dt.{m} {r.choice(CMPS)} ts.dt.{m}.{agg}()"
        else:
            core = dt_cmp(r, "ts")
        if r.random() < 0.3:
            core = f"~({core})"
        if r.random() < 0.3:
            core = f"({core}) {r.choice(['and', 'or'])} " \
                   f"(a {r.choice(CMPS)} {r.randint(-2, 8)})"
        return "query", core
    if fam == "query_elem":
        roll = r.random()
        if roll < 0.12:
            # direct element timestamp-vs-string comparison: equality is
            # 2-valued, ordering Kleene (r10 probes, reference-executed)
            core = f"n.t {r.choice(CMPS)} '{rand_ts(r)[:10]}'"
            if r.random() < 0.35:
                # CHAINED range: each conjunct keeps its own NA regime
                lo, hi = sorted((rand_ts(r)[:10], rand_ts(r)[:10]))
                core = f"'{lo}' <= n.t < '{hi}'"
            if r.random() < 0.3:
                core = f"~({core})"
            if r.random() < 0.25:
                core = f"({core}) {r.choice(['and', 'or'])} " \
                       f"(n.x {r.choice(CMPS)} {r.randint(-2, 6)})"
            return "query", core
        core = dt_cmp(r, "n.t") if r.random() < 0.8 else \
            f"{'' if r.random() < 0.5 else '~'}n.t.dt." \
            f"{r.choice(DT_BOOL_ATTRS)}"
        if r.random() < 0.3:
            core = f"~({core})"
        if r.random() < 0.25:
            core = f"({core}) {r.choice(['and', 'or'])} " \
                   f"(n.x {r.choice(CMPS)} {r.randint(-2, 6)})"
        return "query", core
    if fam == "eval_base":
        return "eval", f"r = {dt_rhs(r, 'ts')}"
    if fam == "eval_both":
        # r12 (VERDICT item 5, .dt half): cross-MODE differential with
        # dt chains — one multi-line program, BOTH inplace modes
        # reference-executed; read-after-write on a dt-derived nested
        # field is the mode-diverging shape
        roll = r.random()
        if roll < 0.35:
            # overwrite n.x from a dt attr, then read n.x back
            l1 = f"n.x = n.t.dt.{r.choice(['month', 'day', 'hour'])}"
            l2 = ("n.z = " if r.random() < 0.6 else "n.x = ") +                 f"n.x {r.choice(['+', '*'])} {r.randint(1, 3)}"
            return "eval_both", l1 + "\n" + l2
        if roll < 0.6:
            # dt-reduction sandwich: a write between two reductions of
            # the same column moves r2 only in sequential mode
            l1 = f"r1 = a + n.x.{r.choice(['mean', 'max'])}()"
            l2 = f"n.x = n.t.dt.{r.choice(['year', 'dayofyear'])}"
            l3 = f"r2 = a + n.x.{r.choice(['mean', 'min'])}()"
            return "eval_both", l1 + "\n" + l2 + "\n" + l3
        # created dt-derived field read back: frozen raises
        l1 = f"n.w = n.t.dt.{r.choice(['month', 'minute'])}"
        l2 = f"n.z = n.w + {r.randint(0, 3)}"
        return "eval_both", l1 + "\n" + l2
    # eval_elem (no-missing frames: nested assignment flat-repacks)
    return "eval", f"n.w = {dt_rhs(r, 'n.t')}"


def dt_rhs(r, recv):
    roll = r.random()
    if roll < 0.1:
        if r.random() < 0.3:
            # boolean-attr reduction: pandas aggregates bool as numeric
            # (mean = fraction of true, sum = count) — pins the
            # cast-to-int path (Spark rejects avg(boolean)) — EXCEPT
            # min/max, which stay BOOLEAN (False/True, not 0/1)
            battr = r.choice(["is_leap_year", "is_month_start",
                              "is_month_end"])
            agg = r.choice(["mean", "sum", "min", "max"])
            return f"{recv}.dt.{battr}.{agg}()"
        # dt-derived global reduction broadcast into the expression
        m = r.choice(["year", "month", "dayofyear", "minute"])
        agg = r.choice(["mean", "min", "max", "median", "std", "count"])
        return f"{recv}.dt.{m} - {recv}.dt.{m}.{agg}()"
    if roll < 0.35:
        return f"{recv}.dt.{r.choice(DT_ATTRS + DT_BOOL_ATTRS)}"
    if roll < 0.5:
        return f"{recv}.dt.strftime('{r.choice(STRFTIME_FMTS)}')"
    if roll < 0.56:
        return f"{recv}.dt.floor('{r.choice(FLOOR_FREQS)}')"
    if roll < 0.62:
        meth = r.choice(["ceil", "round"])
        return f"{recv}.dt.{meth}('{r.choice(ROUND_FREQS)}')"
    if roll < 0.66:
        return f"{recv}.dt.{r.choice(['day_name', 'month_name'])}()"
    if roll < 0.69:
        return f"{recv}.dt.as_unit('{r.choice(['s', 'ms', 'us'])}')"
    if roll < 0.72:
        return f"{recv}.dt.normalize()"
    # chains off a method result (reference-executed: pandas series
    # results chain freely)
    hr = r.random()
    if hr < 0.4:
        head = f"{recv}.dt.floor('{r.choice(FLOOR_FREQS)}')"
    elif hr < 0.6:
        head = f"{recv}.dt.{r.choice(['ceil', 'round'])}" \
               f"('{r.choice(ROUND_FREQS)}')"
    else:
        head = f"{recv}.dt.normalize()"
    roll2 = r.random()
    if roll2 < 0.45:
        return f"{head}.dt.{r.choice(DT_ATTRS + DT_BOOL_ATTRS)}"
    if roll2 < 0.65:
        return f"{head}.dt.strftime('{r.choice(STRFTIME_FMTS)}')"
    if roll2 < 0.8:
        # string methods chain off the name methods (r10 audit)
        nm = r.choice(["day_name", "month_name"])
        sm = r.choice([".str.len()", ".str.upper()",
                       ".str.startswith('S')", ".str.slice(0, 3)"])
        return f"{recv}.dt.{nm}(){sm}"
    return f"{recv}.dt.strftime('{r.choice(STRFTIME_FMTS)}').str.len()"


FAMS = ["query_base", "query_elem", "eval_base", "eval_elem",
        "eval_both"]
FAM_WEIGHTS = [28, 23, 23, 18, 8]
MISSING_OK = {"query_base", "query_elem", "eval_base"}


def run_reference(nf, kind, text):
    if kind == "query":
        return enc_frame(nf.query(text))
    return enc_frame(nf.eval(text))


def main():
    n_cases = int(sys.argv[1]) if len(sys.argv) > 1 else 500
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 20260817
    out = Path(sys.argv[3]) if len(sys.argv) > 3 else \
        Path(__file__).parent.parent / "src/test/resources/fuzz/dt_fuzz.jsonl"
    out.parent.mkdir(parents=True, exist_ok=True)
    kept, errors, i = [], [], 0
    counts = {}
    r0 = random.Random(seed)
    while len(kept) < n_cases and i < n_cases * 4:
        r = random.Random(seed * 99991 + i)
        i += 1
        fam = r.choices(FAMS, weights=FAM_WEIGHTS)[0]
        frame = gen_frame_dt(r, allow_missing=fam in MISSING_OK)
        kind, text = gen_program(r, fam)
        if kind == "eval_both":
            # both modes on one program (same contract as
            # dialect_fuzz's eval_both): sequential golden required,
            # frozen may legitimately raise on a created-field read
            try:
                nf = build_ref_frame_dt(frame)
                seqf = nf.copy()
                seqf.eval(text, inplace=True)
                expect_seq = enc_frame(seqf)
            except Exception as e:  # noqa: BLE001
                errors.append({"fam": fam, "text": text,
                               "err": f"seq {type(e).__name__}: "
                                      f"{e}"[:200]})
                continue
            rec = {"id": len(kept), "kind": kind, "text": text,
                   "frame": frame, "expect_seq": expect_seq}
            try:
                rec["expect_frozen"] = enc_frame(nf.eval(text))
            except Exception as e:  # noqa: BLE001
                if type(e).__name__ in ("AttributeError", "KeyError",
                                        "UndefinedVariableError"):
                    rec["frozen_error"] = type(e).__name__
                else:
                    errors.append({"fam": fam, "text": text,
                                   "err": f"frozen {type(e).__name__}: "
                                          f"{e}"[:200]})
                    continue
            kept.append(rec)
            counts[fam] = counts.get(fam, 0) + 1
            continue
        try:
            nf = build_ref_frame_dt(frame)
            expect = run_reference(nf, kind, text)
        except Exception as e:  # noqa: BLE001
            errors.append({"fam": fam, "text": text,
                           "err": f"{type(e).__name__}: {e}"[:200]})
            continue
        kept.append({"id": len(kept), "kind": kind, "text": text,
                     "frame": frame, "expect": expect})
        counts[fam] = counts.get(fam, 0) + 1
    with out.open("w") as f:
        for c in kept:
            f.write(json.dumps(c, allow_nan=False) + "\n")
    out.with_suffix(".errors.json").write_text(json.dumps(
        {"n_reference_errors": len(errors), "sample": errors[:30]},
        indent=1))
    print(f"wrote {len(kept)} cases ({i} attempts, {len(errors)} "
          f"reference-errored, fams={counts})")


if __name__ == "__main__":
    main()
