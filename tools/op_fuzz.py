#!/usr/bin/env python3
"""Operator-level differential fuzz corpus: random frames put through the
REFERENCE's dropna / fillna / count_nested / split / to_flat (executed
in-sandbox via ref_harness) — goldens replayed by graft.OpFuzzSpec.

Extends the dialect fuzzer (dialect_fuzz.py) from the expression surface
to the operator surface, same encoding conventions.

Usage: python3 tools/op_fuzz.py [n_cases] [seed] [out.jsonl]
"""
import json
import random
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent))
from dialect_fuzz import (build_ref_frame, enc_frame, enc_val,  # noqa: E402
                          gen_frame, bool_expr, npd)

OPS = ["dropna_nested", "dropna_base", "fillna", "count_nested", "split",
       "to_flat", "sort_base", "sort_nested", "minmax", "explode",
       "to_lists", "nest_query", "describe", "pack", "from_flat",
       "flatten_inner", "concat", "setitem", "reduce", "join_how",
       "take", "zip_nests", "nest_lists", "set_filled", "set_list",
       "drop_fields", "explode_multi",
       # r10: the inherited-pandas surface with nests in flight (VERDICT
       # item 2) — base-column merge, base groupby().agg() with the nest
       # carried through, positional head/tail
       "merge_base", "groupby_agg", "head_tail",
       # r11 tranche 2 (VERDICT item 7): column-wise concat, rename
       # (dotted nested keys are silently IGNORED by the reference —
       # probe 2026-08-15), base astype with the nest in flight,
       # drop_duplicates(subset=) keep first/last
       "concat_axis1", "rename_cols", "astype_base", "drop_dup",
       # r11 tranche 3: nlargest/nsmallest (NaN rows fill remaining slots
       # LAST; keep= tie policy probed 2026-08-16), value_counts(subset=)
       # with a CANONICAL (count desc, keys asc, NaN last) order pinned on
       # both engines (pandas' tie order under sort_values is not
       # guaranteed stable), frame-level where/mask (non-kept rows null
       # every column INCLUDING the nest cell), replace(dict) on base
       # columns, and round() (base floats only — nested fields untouched,
       # numpy HALF-EVEN ≡ Spark bround)
       "nlargest", "value_counts", "where_mask", "replace_vals",
       "round_base",
       # r11 tranche 4: positional shift (the NEST cell shifts with the
       # row — lag-features shape) and ffill/bfill (missing cells fill
       # from neighbor CELLS, strings and nests included). diff/cumsum
       # raise on object/nest columns in the reference itself — not
       # drawn.
       "shift_rows", "fill_dir",
       # combine_first (outer-align, self-else-other per value incl.
       # whole nest CELLS) and update (other's non-missing values
       # overwrite on the index intersection)
       "combine_update",
       # df[df.duplicated(subset, keep)] (the complement of drop_dup;
       # NULL keys group) and add_prefix/add_suffix (top-level column
       # renames, nest FIELDS untouched)
       "dup_filter", "prefix_suffix",
       # r12 tranche 5 (VERDICT item 7): melt (unpivot value columns to
       # variable/value rows, VARIABLE-MAJOR order, nest cells move
       # whole both as id vars and as the value var — probe 2026-08-16)
       # and pivot_table (NULL keys drop, all-NaN columns then all-NaN
       # rows drop, keys sorted — the pandas dropna=True defaults)
       "melt_frame", "pivot_table",
       # r12 tranche 6: Series.rank over a column (tie methods, na_option
       # top/bottom rank the missing group as one tie block, pct
       # denominators probed 2026-08-16), and cumsum/cummax/cummin/diff
       # (missing STAYS missing, running aggregate skips it)
       "rank_col", "cum_diff",
       # r12 tranche 7: column-stat verbs — idxmax/idxmin (FIRST
       # occurrence, missing skipped), mode (all modal values sorted,
       # missing excluded), quantile (linear interp, missing skipped),
       # nunique(dropna=) — probed 2026-08-16
       "col_stats",
       # r12 tranche 8: groupby(key)[value].transform(fn) — per-group
       # stat broadcast to rows; missing KEY -> missing result (groupby
       # dropna), count = non-missing values, size = rows, sum is
       # min_count=0 — probed 2026-08-16
       "group_transform",
       # r12 tranche 9: rolling/expanding window aggregates (the
       # min_periods gate counts NON-NA values for every kernel except
       # `count`, whose gate counts ROWS — probed 2026-08-16), linear
       # interpolate (leading NA stays, interior linear by POSITION,
       # trailing carries last), clip (NA passes through; int bounds on
       # an int column stay int) and pct_change (pandas-2.2.2 default
       # fill_method='pad' pads non-leading NA BEFORE the ratio)
       "roll_expand", "interp", "clip_pct",
       # r12 tranche 10: cut/qcut binning (labels=False bin indices;
       # int-bins edges are np.linspace with the outermost edge pushed
       # 0.1% of the range outward; qcut draws only INTEGER quantile
       # positions — q dividing non-NA-count-1 — so edges equal data
       # values bit-exactly on both engines; the interpolation parity
       # itself is pinned by the tranche-7 quantile family) and
       # corr/cov (pairwise-complete sample stats ≡ corr/covar_samp)
       "cut_qcut", "corr_cov",
       # r12 tranche 11: crosstab (count matrix, either-key-missing rows
       # drop, keys sorted, margins appends All row/col), get_dummies
       # (sorted boolean indicators, missing all-false, dummy_na appends
       # a NaN column) and factorize (codes by FIRST APPEARANCE,
       # missing -> -1 sentinel or its own appearance-ordered code) —
       # probed 2026-08-16
       "crosstab", "get_dummies", "factorize",
       # r12 tranche 13 (r13-widened): ewm — pandas kernel replayed
       # exactly (old_wt decay per row / per observation under
       # ignore_na, adjust new_wt 1 vs alpha, missing positions CARRY
       # the mean, min_periods gates on observation count); r13 adds
       # span/halflife/com parameterizations (each converts to
       # center-of-mass, kernel alpha = 1/(1+com) — pandas
       # get_center_of_mass chain) and var/std (the ewmcov kernel:
       # running debias W1²/(W1²−W2); std is zsqrt) — probed 2026-08-16
       "ewm",
       # r13 tranche 14: time-based rolling (offset window (t−w, t] by
       # default, closed= picks the endpoints, min_periods defaults 1),
       # stack/unstack (row-major melt with NaN cells dropped /
       # first-value pivot raising on duplicate pairs) and resample
       # (left-closed left-labeled bins anchored at midnight of the
       # first day, EMPTY bins emitted: sum 0.0, count 0, mean missing)
       # — probed 2026-08-16
       "roll_time", "stack_unstack", "resample",
       # r13 breadth: ewm().cov(other)/corr(other) — ONE ewmcov kernel
       # instance for cov (observation = both present); corr masks both
       # inputs to the COMMON present pattern then divides three
       # bias=True instances (probed 2026-08-16, bit-exact on 8.8k
       # cells incl. the alpha→com→alpha round-trip)
       "ewm_cov"]
OP_WEIGHTS = [12, 7, 11, 10, 9, 9, 7, 7, 5, 5, 5, 6, 5, 6, 5, 5, 5, 9, 9, 7,
              8, 6, 7, 6, 7, 5, 6, 9, 8, 6,
              6, 5, 5, 7,
              7, 6, 7, 5, 5,
              6, 6,
              7,
              6, 4,
              7, 7,
              7, 6,
              7,
              7,
              9, 5, 7,
              8, 5,
              6, 6, 7,
              12,
              8, 7, 8,
              7]

# __setitem__ fuzzes over PRESENT cells only: pandas' flat-repack on
# nested assignment turns a missing cell into an EMPTY cell (probe
# 2026-08-14; the adjudicated representational divergence — graft keeps
# missing missing, PARITY.md §fuzz). reduce kernels that ERROR or pack
# ambiguously on an empty cell (min/max/std/offsets/append) likewise
# draw no-missing frames; mean/sum/size keep missing cells (np.mean([])
# -> NaN, np.sum([]) -> 0.0, size -> 0 — real reduce-over-gaps shapes).
SETITEM_VARS = ["scalar", "base", "modify", "field", "crossnest",
                "newnest", "del_field", "del_base"]
REDUCE_KERNELS = ["mean", "sum", "size", "min", "max", "std",
                  "mean_minus_base", "offsets", "append_max"]
NO_MISSING_KERNELS = {"min", "max", "std", "offsets", "append_max"}


def fixup_for_sort(frame, r, nested):
    """Deterministic order needs tie-free sort keys: distinct b values and
    at most one null (base sort); distinct x and <=1 null-x per cell
    (nested sort)."""
    if not nested:
        vs = frame["base"]["b"]["v"]
        seen = set()
        nulls = 0
        for i, v in enumerate(vs):
            if v is None:
                nulls += 1
                if nulls > 1:
                    v = round(r.uniform(-3, 8), 3) + i * 0.0011
                else:
                    continue
            while v in seen:
                v = round(v + 0.0017, 4)
            vs[i] = v
            seen.add(v)
    else:
        for cell in frame["nests"]["n"]["cells"]:
            if cell is None:
                continue
            seen = set()
            nulls = 0
            for j, el in enumerate(cell):
                v = el[0]
                if v is None:
                    nulls += 1
                    if nulls > 1:
                        v = round(r.uniform(-4, 9), 3) + j * 0.0013
                    else:
                        continue
                while v in seen:
                    v = round(v + 0.0019, 4)
                el[0] = v
                seen.add(v)


def gen_op(r):
    op = r.choices(OPS, weights=OP_WEIGHTS)[0]
    if op == "dropna_nested":
        mode = r.choice(["subset_any", "subset_all", "thresh", "all_fields"])
        if mode == "subset_any":
            return op, {"subset": ["n.x"], "how": "any", "thresh": None}
        if mode == "subset_all":
            return op, {"subset": ["n.x"], "how": "all", "thresh": None}
        if mode == "thresh":
            return op, {"subset": None, "how": None, "thresh": r.randint(2, 3)}
        return op, {"subset": None, "how": "any", "thresh": None}
    if op == "dropna_base":
        if r.random() < 0.35:
            # pandas thresh counts non-NA across ALL columns, the nest
            # cell included (r10 probe) — no subset/how with thresh
            return op, {"subset": None, "how": None,
                        "thresh": r.randint(3, 6)}
        return op, {"subset": ["b"], "how": r.choice(["any", "all"])}
    if op == "fillna":
        vals = {}
        if r.random() < 0.8:
            vals["n.x"] = round(r.uniform(-9, 9), 2)
        if r.random() < 0.5:
            vals["b"] = round(r.uniform(-9, 9), 2)
        if not vals:
            vals["n.x"] = -1.0
        return op, {"values": vals}
    if op == "count_nested":
        # dropna=True ignores NA by-values (r9 probe; dropna=False raises
        # in BOTH engines — error parity pinned elsewhere)
        if r.random() < 0.3:
            return op, {"by": "t", "dropna": True}
        return op, {"by": r.choice([None, "t"])}
    if op == "split":
        return op, {"by": "t"}
    if op == "sort_base":
        if r.random() < 0.35:
            # multi-key: a's ties broken by the (fixup-distinct) b
            return op, {"by": ["a", "b"],
                        "asc": [r.random() < 0.5, r.random() < 0.5],
                        "na_position": r.choice(["first", "last"])}
        return op, {"by": "b", "asc": r.random() < 0.5,
                    "na_position": r.choice(["first", "last"])}
    if op == "sort_nested":
        return op, {"by": "n.x", "asc": r.random() < 0.5,
                    "na_position": r.choice(["first", "last"])}
    if op == "minmax":
        # numeric_only=False includes strings (lexicographic min/max,
        # r9 probe) — both engines skip missing values. Half the family
        # draws the flag tier: skipna=False (pandas NA propagation — any
        # NA in the column -> NA; numeric_only to keep str-vs-float
        # comparisons out of pandas' own TypeError) and/or exclude_nest.
        if r.random() < 0.5:
            return op, {"fn": r.choice(["min", "max"]),
                        "numeric_only": True,
                        "skipna": r.random() < 0.5,
                        "exclude_nest": r.random() < 0.35}
        return op, {"fn": r.choice(["min", "max"]),
                    "numeric_only": r.random() < 0.5}
    if op == "nest_query":
        # same predicate in both dialects: graft sees nest-prefixed
        # fields, the reference accessor sees flat names. CONSTANT-only
        # predicates are excluded: pandas query of a scalar boolean
        # degenerates to .loc[True] == "select the row LABELED 1"
        # (alt-seed 661177 catch, case `not (not (1.40 != 7))`) — an
        # indexing artifact, not query semantics.
        text = bool_expr(r, ["n.x", "n.y"], r.randint(0, 2), "n.t")
        while not any(f in text for f in ("n.x", "n.y", "n.t")):
            text = bool_expr(r, ["n.x", "n.y"], r.randint(0, 2), "n.t")
        return op, {"text": text, "flat_text": text.replace("n.", "")}
    if op == "setitem":
        v = r.choice(SETITEM_VARS)
        if v == "scalar":
            return op, {"var": v, "value": round(r.uniform(-6, 8), 3)}
        if v in ("base", "field"):
            return op, {"var": v, "mul": r.randint(-3, 4)}
        if v in ("modify", "crossnest", "newnest"):
            return op, {"var": v, "delta": round(r.uniform(-5, 5), 3)}
        return op, {"var": v}  # del_field / del_base
    if op == "reduce":
        k = r.choice(REDUCE_KERNELS)
        col = r.choice(["n.x", "n.y", "m.u"])
        return op, {"kernel": k, "col": col}
    if op == "describe":
        # percentiles= variant: pandas auto-includes the median and sorts
        # ascending (integral percents only — 2-dec rounding — so both
        # engines render identical labels)
        if r.random() < 0.5:
            ps = sorted({round(r.uniform(0.05, 0.95), 2)
                         for _ in range(r.randint(1, 3))})
            return op, {"percentiles": ps}
        return op, {}
    if op == "take":
        return op, {"allow_fill": r.random() < 0.4,
                    "raise": r.random() < 0.18}
    if op == "set_list":
        return op, {"mismatch": r.random() < 0.22}
    if op == "explode_multi":
        return op, {"mismatch": r.random() < 0.15}
    if op == "drop_fields":
        return op, {"variant": r.choices(
            ["one", "two", "all", "missing"], weights=[45, 25, 15, 15])[0]}
    if op == "nest_lists":
        return op, {"mismatch": r.random() < 0.15}
    if op == "merge_base":
        # other: dim-like lookup with UNIQUE keys spanning/overlapping the
        # frame's `a` range, so merge is many-to-one and (k0, a) is a
        # total sort key for order-independent goldens
        n_other = r.randint(2, 6)
        keys = r.sample(range(-5, 15), n_other)
        other = {"a": keys,
                 "c": [r.choice(["X", "Y", "Z", "W", "hi", ""])
                       for _ in keys]}
        if r.random() < 0.4:  # overlapping value column -> suffixes
            other["b"] = [round(r.uniform(-9, 9), 2) for _ in keys]
        return op, {"how": r.choice(["left", "inner", "right", "outer"]),
                    "other": other}
    if op == "groupby_agg":
        fns = {}
        for fn in r.sample(["mean", "sum", "min", "max", "count", "std"],
                           r.randint(1, 3)):
            fns[f"b_{fn}"] = ["b", fn]
        if r.random() < 0.6:
            fns["n_count"] = ["n", "count"]
        return op, {"fns": fns}
    if op == "head_tail":
        return op, {"which": r.choice(["head", "tail"]),
                    "n": r.choice([1, 2, 3, 5, 40, -1, -2])}
    if op == "concat_axis1":
        if r.random() < 0.5:
            # split the frame's columns in two, concat back on the index
            return op, {"mode": "split"}
        n_extra = r.randint(2, 5)
        idx = sorted(r.sample(range(-2, 10), n_extra))
        return op, {"mode": "extra",
                    "extra": {"k": idx,
                              "c": [round(r.uniform(-5, 5), 2)
                                    for _ in idx]}}
    if op == "rename_cols":
        mapping = {c: c + "2" for c in r.sample(["a", "b", "s"],
                                                r.randint(1, 2))}
        if r.random() < 0.4:
            # the reference IGNORES dotted nested keys (rename of n.x is
            # a no-op — probe 2026-08-15); pin the no-op
            mapping["n.x"] = "n.z"
        return op, {"mapping": mapping}
    if op == "astype_base":
        col_, dt = r.choice([("a", "float64"), ("a", "str"),
                             ("a", "int32"), ("s", "str"),
                             ("b", "float64")])
        return op, {"col": col_, "dtype": dt}
    if op == "drop_dup":
        return op, {"subset": r.choice([["a"], ["s"], ["a", "s"]]),
                    "keep": r.choice(["first", "last"])}
    if op == "nlargest":
        return op, {}  # drawn in main: n must depend on the frame length
    if op == "value_counts":
        return op, {"subset": r.choice([["a"], ["b"], ["s"], ["a", "s"],
                                        ["s", "b"]]),
                    "normalize": r.random() < 0.3,
                    "dropna": r.random() < 0.7}
    if op == "where_mask":
        col_, op2, val = r.choice([
            ("a", r.choice([">", "<=", "=="]), r.randint(-2, 8)),
            ("b", r.choice([">", "<=", ">="]), round(r.uniform(-2, 6), 2)),
            ("s", "==", r.choice(["Abc", "de f", "aa", "b", "Ab"]))])
        return op, {"fn": r.choice(["where", "mask"]),
                    "col": col_, "op2": op2, "val": val}
    if op == "replace_vals":
        if r.random() < 0.5:
            mapping = {str(r.randint(-5, 12)): r.randint(-20, 20)
                       for _ in range(r.randint(1, 2))}
            return op, {"col": "a", "mapping": mapping}
        mapping = {r.choice(["Abc", "de f", "aa", "b", "Ab", "zz9"]):
                   r.choice(["ZZ", "qq", ""])
                   for _ in range(r.randint(1, 2))}
        return op, {"col": "s", "mapping": mapping}
    if op == "round_base":
        if r.random() < 0.4:
            return op, {"decimals": {"b": r.randint(0, 2)}}
        return op, {"decimals": r.randint(0, 2)}
    if op == "shift_rows":
        return op, {"n": r.choice([-2, -1, 0, 1, 2, 3])}
    if op == "fill_dir":
        return op, {"fn": r.choice(["ffill", "bfill"])}
    if op == "combine_update":
        return op, {"fn": r.choice(["combine_first", "update"])}
    if op == "dup_filter":
        return op, {"subset": r.choice([["a"], ["s"], ["a", "s"]]),
                    "keep": r.choice(["first", "last", False])}
    if op == "prefix_suffix":
        return op, {"fn": r.choice(["add_prefix", "add_suffix"]),
                    "affix": r.choice(["p_", "_z", "X"])}
    if op == "melt_frame":
        # value sets are type-homogeneous (pandas melts into ONE object
        # column; graft types the value column, so mixed numeric+string
        # sets are out of contract — documented in the scaladoc)
        vv = r.choice([["a", "b"], ["b", "a"], ["b"], ["a"], ["s"],
                       ["n"]])
        id_pool = [c for c in ["a", "s"] if c not in vv]
        ids = ["k"] + r.sample(id_pool, r.randint(0, len(id_pool)))
        if r.random() < 0.25 and "n" not in vv:
            ids.append("n")  # nest cell as an id var (repeats per block)
        return op, {"id_vars": ids, "value_vars": vv}
    if op == "pivot_table":
        # columns stay the INT column: pivoted column NAMES are the keys'
        # string forms on both engines (int keys agree; float formatting
        # would not)
        return op, {"index": "s", "columns": "a", "values": "b",
                    "aggfunc": r.choice(["mean", "sum", "min", "max",
                                         "count"])}
    if op == "rank_col":
        # b carries NA (exercises na_option); a is tie-rich
        return op, {"col": r.choice(["b", "a", "a"]),
                    "method": r.choice(["average", "min", "max",
                                        "first", "dense"]),
                    "ascending": r.random() < 0.6,
                    "na_option": r.choice(["keep", "keep", "top",
                                           "bottom"]),
                    "pct": r.random() < 0.3}
    if op == "cum_diff":
        fn = r.choice(["cumsum", "cummax", "cummin", "diff", "cumprod"])
        args = {"fn": fn, "col": r.choice(["b", "a"])}
        if fn == "diff":
            args["n"] = r.choice([-2, -1, 1, 1, 2, 3])
            args["col"] = "b"  # diff of int col upcasts oddly; pin double
        if fn == "cumprod":
            args["col"] = "b"  # int cumprod overflows differently; pin
        return op, args
    if op == "group_transform":
        key = r.choice(["a", "s"])
        return op, {"key": key,
                    "value": "b" if key == "a" or r.random() < 0.7
                             else "a",
                    "fn": r.choice(["mean", "sum", "max", "min",
                                    "count", "size"])}
    if op == "roll_expand":
        kind = "expanding" if r.random() < 0.3 else "rolling"
        fn = r.choice(["mean", "sum", "min", "max", "std", "var", "count",
                       # r13: order statistics + centered frames
                       "median", "quantile",
                       # r13 breadth: window-level bias-corrected
                       # moments (internal 3/4-value floors, rolling
                       # zero-variance conventions skew 0.0 / kurt -3.0)
                       "skew", "kurt"])
        args = {"kind": kind, "col": r.choice(["b", "b", "a"]), "fn": fn}
        if fn == "quantile":
            args["q"] = r.choice([0.1, 0.25, 0.3, 0.5, 0.75, 0.9])
        if kind == "rolling":
            # moments need 3/4 present values to emit anything at all
            args["window"] = (r.randint(4, 7) if fn in ("skew", "kurt")
                              else r.randint(2, 4))
            args["min_periods"] = (None if r.random() < 0.4
                                   else r.randint(1, args["window"]))
            args["center"] = r.random() < 0.3
        else:
            args["window"] = None
            args["min_periods"] = (None if r.random() < 0.5
                                   else r.randint(1, 4))
        return op, args
    if op == "interp":
        # r13 breadth: method='index' interpolates by the ORDER VALUE
        # (the time-series abscissa); the irregular strictly-increasing
        # index is frame-length-dependent — fixed up in main()
        return op, {"col": "b",
                    "method": r.choice(["linear", "linear", "index"]),
                    "idx": None}
    if op == "clip_pct":
        if r.random() < 0.5:
            c_ = r.choice(["a", "b"])
            lo = None if r.random() < 0.3 else round(r.uniform(-4, 3), 1)
            hi = None if (lo is not None and r.random() < 0.3) \
                else round(r.uniform(3, 9), 1)
            if c_ == "a" and r.random() < 0.4:
                lo = int(lo) if lo is not None else None
                hi = int(hi) if hi is not None else None
            return op, {"kind": "clip", "col": c_, "lower": lo, "upper": hi}
        return op, {"kind": "pct", "col": "b",
                    "n": r.choice([-2, -1, 1, 1, 2, 3]),
                    "fill": r.choice(["pad", "pad", None])}
    if op == "cut_qcut":
        mode = r.choice(["cut_edges", "cut_edges", "cut_int", "qcut",
                         "qcut"])
        if mode == "cut_edges":
            nb = r.randint(2, 4)
            edges = sorted({round(r.uniform(-5, 9), 1)
                            for _ in range(nb + 1)})
            while len(edges) < nb + 1:
                edges.append(round(edges[-1] + r.uniform(0.5, 2), 1))
            return op, {"mode": mode, "col": r.choice(["a", "b"]),
                        "edges": edges, "right": r.random() < 0.7,
                        "include_lowest": r.random() < 0.3}
        if mode == "cut_int":
            return op, {"mode": mode, "col": r.choice(["a", "b"]),
                        "bins": r.randint(2, 5), "right": r.random() < 0.8}
        # q is frame-dependent (integer quantile positions) — fixed up
        # in main() after the frame draw
        return op, {"mode": "qcut", "col": r.choice(["a", "b"]), "q": None}
    if op == "corr_cov":
        return op, {"fn": r.choice(["corr", "cov"]), "c1": "a", "c2": "b"}
    if op == "crosstab":
        rowc, colc = r.choice([("s", "a"), ("a", "s"), ("a", "b")])
        return op, {"row": rowc, "col": colc, "margins": r.random() < 0.4}
    if op == "get_dummies":
        return op, {"col": r.choice(["s", "a"]),
                    "dummy_na": r.random() < 0.4}
    if op == "factorize":
        return op, {"col": r.choice(["s", "a", "b"]),
                    "sentinel": r.random() < 0.7}
    if op == "ewm":
        param = r.choice(["alpha", "alpha", "span", "span", "halflife",
                          "com"])
        value = {"alpha": lambda: round(r.uniform(0.1, 0.9), 2),
                 "span": lambda: r.choice([2, 3, 4, 5, 10, 20,
                                           round(r.uniform(1.5, 12), 1)]),
                 "halflife": lambda: round(r.uniform(0.5, 8), 2),
                 "com": lambda: round(r.uniform(0.1, 6), 2)}[param]()
        stat = r.choice(["mean", "mean", "var", "var", "std",
                         # r13 breadth: the unnormalized kernel
                         "sum", "sum"])
        args = {"param": param, "value": value, "stat": stat,
                # pandas raises NotImplementedError for adjust=False sum
                "adjust": True if stat == "sum" else r.random() < 0.5,
                "ignore_na": r.random() < 0.4,
                "min_periods": r.randint(1, 3)}
        if stat not in ("mean", "sum"):
            args["bias"] = r.random() < 0.3
        return op, args
    if op == "ewm_cov":
        # r13: ewm().cov(other)/corr(other) — x is frame column b, the
        # second series rides in args (yv, frame-length-dependent,
        # fixed up in main()) so BOTH sides draw missing cells
        param = r.choice(["alpha", "alpha", "span", "halflife", "com"])
        value = {"alpha": lambda: round(r.uniform(0.1, 0.9), 2),
                 "span": lambda: r.choice([2, 3, 5, 10,
                                           round(r.uniform(1.5, 12), 1)]),
                 "halflife": lambda: round(r.uniform(0.5, 8), 2),
                 "com": lambda: round(r.uniform(0.1, 6), 2)}[param]()
        args = {"param": param, "value": value,
                "fn": r.choice(["cov", "cov", "corr"]),
                "adjust": r.random() < 0.5,
                "ignore_na": r.random() < 0.4,
                "min_periods": r.randint(1, 3), "yv": None}
        if args["fn"] == "cov":
            args["bias"] = r.random() < 0.3
        return op, args
    if op == "roll_time":
        # ts offsets are frame-length-dependent — fixed up in main()
        return op, {"window_s": r.randint(2, 6),
                    "closed": r.choice(["right", "right", "both", "left",
                                        "neither"]),
                    "fn": r.choice(["mean", "sum", "min", "max", "count",
                                    "median", "quantile"]),
                    "q": round(r.choice([0.25, 0.3, 0.5, 0.75, 0.9]), 2),
                    "minp": r.randint(1, 3), "ts": None}
    if op == "stack_unstack":
        if r.random() < 0.55:
            # numeric-only: graft melt unifies mixed numerics to double
            # (≡ pandas' object column under enc tolerance); a string
            # mix would stringify numbers differently than python repr
            vv = r.choice([["a", "b"], ["b", "a"], ["b"], ["a"]])
            return op, {"mode": "stack", "value_vars": vv}
        return op, {"mode": "unstack"}
    if op == "resample":
        # ts offsets fixed up in main(); base picks a mid-day anchor so
        # origin='start_day' differs from epoch alignment when freq
        # doesn't divide the day offset
        return op, {"freq_s": r.randint(2, 7),
                    "label": r.choice(["left", "left", "right"]),
                    "fn": r.choice(["mean", "sum", "min", "max", "count",
                                    "std", "var", "median",
                                    "first", "last"]),
                    "base": r.choice(["2026-01-02 03:04:05",
                                      "2026-01-02 00:00:00",
                                      "1970-01-01 00:00:11"]),
                    "ts": None}
    if op == "col_stats":
        fn = r.choice(["idxmax", "idxmin", "mode", "quantile", "nunique",
                       # r12 tranche 12: bias-corrected sample moments
                       "skew", "kurt", "sem"])
        args = {"fn": fn,
                # idxmax/idxmin numeric only (graft's tie trick negates);
                # mode/nunique also draw the string column; moments are
                # numeric-only like pandas
                "col": r.choice(["a", "b"]) if fn in ("idxmax", "idxmin",
                                                      "quantile", "skew",
                                                      "kurt", "sem")
                       else r.choice(["a", "b", "s"])}
        if fn == "quantile":
            args["q"] = r.choice([0.0, 0.25, 0.3, 0.5, 0.75, 0.9, 1.0])
        if fn == "nunique":
            args["dropna"] = r.random() < 0.7
        return op, args
    return op, {}  # to_flat / explode / to_lists / zip_nests


def _enc_melt_value(v):
    """Encode one melted `value` cell: scalars via enc_val; a nested cell
    (per-cell DataFrame) as the usual [[field values…]] row list."""
    import pandas as pd
    if hasattr(v, "columns"):  # nested cell → per-cell DataFrame
        return [[enc_val(v[f].iloc[j]) for f in v.columns]
                for j in range(len(v))]
    if v is None or (not isinstance(v, (list, str)) and pd.isna(v)):
        return None
    return enc_val(v)


def run_reference(nf, op, args):
    if op == "roll_expand":
        base = nf[args["col"]]
        mp = args["min_periods"]
        if args["kind"] == "rolling":
            roller = base.rolling(args["window"],
                                  min_periods=mp if mp is not None
                                  else args["window"],
                                  center=args.get("center", False))
            # (explicit default: pandas rolling min_periods=None means
            # the window size)
        else:
            roller = base.expanding(mp if mp is not None else 1)
        if args["fn"] == "quantile":
            ser = roller.quantile(args["q"])
        else:
            ser = getattr(roller, args["fn"])()
        return {"vals": [enc_val(v) for v in ser]}
    if op == "roll_time":
        import pandas as pd
        idx = pd.to_datetime(args["ts"], unit="s")
        ser0 = pd.Series(list(nf["b"]), index=idx)
        roller = ser0.rolling(f"{args['window_s']}s",
                              closed=args["closed"],
                              min_periods=args["minp"])
        if args["fn"] == "quantile":
            ser = roller.quantile(args["q"])
        else:
            ser = getattr(roller, args["fn"])()
        return {"vals": [enc_val(v) for v in ser]}
    if op == "stack_unstack":
        import pandas as pd
        if args["mode"] == "stack":
            m = nf.reset_index(names="k")
            st = m.set_index("k")[args["value_vars"]].stack()
            return {"rows": [[int(k), str(var), enc_val(v)]
                             for (k, var), v in st.items()]}
        # unstack: (k, s) two-level index over b — k unique so pairs
        # are unique (the duplicate-pair raise is spec-covered on the
        # Scala side); rows with missing s drop (graft's null-key drop)
        m = nf.reset_index(names="k")
        m = m[m["s"].notna()]
        un = m.set_index(["k", "s"])["b"].unstack()
        return {"cols": [str(c) for c in un.columns],
                "rows": [[int(k)] + [enc_val(un[c].loc[k])
                                     for c in un.columns]
                         for k in un.index]}
    if op == "resample":
        import pandas as pd
        base = pd.Timestamp(args["base"])
        idx = base + pd.to_timedelta(args["ts"], unit="s")
        ser0 = pd.Series(list(nf["b"]), index=idx)
        res = getattr(ser0.resample(f"{args['freq_s']}s",
                                    label=args["label"]), args["fn"])()
        return {"labels": [t.isoformat() for t in res.index],
                "vals": [enc_val(v) for v in res]}
    if op == "interp":
        if args.get("method") == "index":
            import pandas as pd
            ser = pd.Series(list(nf[args["col"]]),
                            index=pd.Index(args["idx"], dtype="float64")
                            ).interpolate(method="index")
        else:
            ser = nf[args["col"]].interpolate()
        return {"vals": [enc_val(v) for v in ser]}
    if op == "clip_pct":
        import math
        base = nf[args["col"]]
        if args["kind"] == "clip":
            ser = base.clip(lower=args["lower"], upper=args["upper"])
        else:
            ser = base.pct_change(args["n"], fill_method=args["fill"])

        def enc_inf(v):  # json allow_nan=False: ±inf rides as a string
            if isinstance(v, float) and math.isinf(v):
                return "inf" if v > 0 else "-inf"
            return enc_val(v)
        return {"vals": [enc_inf(v) for v in ser]}
    if op == "cut_qcut":
        import pandas as pd
        base = nf[args["col"]]
        if args["mode"] == "cut_edges":
            ser = pd.cut(base, args["edges"], labels=False,
                         right=args["right"],
                         include_lowest=args["include_lowest"])
        elif args["mode"] == "cut_int":
            ser = pd.cut(base, args["bins"], labels=False,
                         right=args["right"])
        else:
            ser = pd.qcut(base, args["q"], labels=False,
                          duplicates="drop")
        return {"vals": [enc_val(v) for v in ser]}
    if op == "corr_cov":
        got = getattr(nf[args["c1"]], args["fn"])(nf[args["c2"]])
        return {"val": enc_val(got)}
    if op == "crosstab":
        import pandas as pd
        ct = pd.crosstab(nf[args["row"]], nf[args["col"]],
                         margins=args["margins"])
        return {"rows": [enc_val(v) for v in ct.index],
                "cols": [enc_val(v) for v in ct.columns],
                "matrix": [[int(ct[c].iloc[i]) for c in ct.columns]
                           for i in range(len(ct))]}
    if op == "get_dummies":
        import math
        import pandas as pd
        gd = pd.get_dummies(nf[args["col"]], dummy_na=args["dummy_na"])
        cols = [None if (isinstance(c, float) and math.isnan(c))
                else enc_val(c) for c in gd.columns]
        return {"cols": cols,
                "rows": [[bool(gd[c].iloc[i]) for c in gd.columns]
                         for i in range(len(gd))]}
    if op == "factorize":
        import pandas as pd
        codes, uniq = pd.factorize(nf[args["col"]],
                                   use_na_sentinel=args["sentinel"])
        return {"codes": [int(c) for c in codes],
                "uniques": [enc_val(u) for u in uniq]}
    if op == "ewm":
        kw = {args["param"]: args["value"], "adjust": args["adjust"],
              "ignore_na": args["ignore_na"],
              "min_periods": args["min_periods"]}
        roller = nf["b"].ewm(**kw)
        if args["stat"] in ("mean", "sum"):
            ser = getattr(roller, args["stat"])()
        else:
            ser = getattr(roller, args["stat"])(bias=args["bias"])
        return {"vals": [enc_val(v) for v in ser]}
    if op == "ewm_cov":
        import pandas as pd
        kw = {args["param"]: args["value"], "adjust": args["adjust"],
              "ignore_na": args["ignore_na"],
              "min_periods": args["min_periods"]}
        other = pd.Series(args["yv"], index=nf.index, dtype="float64")
        roller = nf["b"].ewm(**kw)
        ser = (roller.cov(other, bias=args["bias"])
               if args["fn"] == "cov" else roller.corr(other))
        return {"vals": [enc_val(v) for v in ser]}
    if op == "melt_frame":
        # k lives in the INDEX on the reference side; melt discards the
        # index (ignore_index=True default), so materialize it first —
        # the Spark frame carries k as a column already
        m = nf.reset_index(names="k").melt(id_vars=args["id_vars"],
                                           value_vars=args["value_vars"])
        rows = []
        for i in range(len(m)):
            rows.append({
                "ids": [_enc_melt_value(m[c].iloc[i])
                        for c in args["id_vars"]],
                "variable": m["variable"].iloc[i],
                "value": _enc_melt_value(m["value"].iloc[i])})
        return {"melt_rows": rows}
    if op == "group_transform":
        ser = nf.groupby(args["key"])[args["value"]].transform(args["fn"])
        return {"vals": [enc_val(v) for v in ser]}
    if op == "col_stats":
        base = nf[args["col"]]
        fn = args["fn"]
        if fn in ("idxmax", "idxmin"):
            return {"val": enc_val(getattr(base, fn)())}
        if fn == "mode":
            return {"vals": [enc_val(v) for v in base.mode()]}
        if fn == "quantile":
            return {"val": enc_val(base.quantile(args["q"]))}
        if fn in ("skew", "kurt", "sem"):
            return {"val": enc_val(getattr(base, fn)())}
        return {"val": enc_val(base.nunique(dropna=args["dropna"]))}
    if op == "rank_col":
        ser = nf[args["col"]].rank(method=args["method"],
                                   ascending=args["ascending"],
                                   na_option=args["na_option"],
                                   pct=args["pct"])
        return {"vals": [enc_val(v) for v in ser]}
    if op == "cum_diff":
        base = nf[args["col"]]
        ser = (base.diff(args["n"]) if args["fn"] == "diff"
               else getattr(base, args["fn"])())
        return {"vals": [enc_val(v) for v in ser]}
    if op == "pivot_table":
        pt = nf.pivot_table(index=args["index"], columns=args["columns"],
                            values=args["values"], aggfunc=args["aggfunc"])
        return {"pt_index": [enc_val(v) for v in pt.index],
                "pt_columns": [str(c) for c in pt.columns],
                "pt_rows": [[_enc_melt_value(pt[c].iloc[i])
                             for c in pt.columns]
                            for i in range(len(pt))]}
    if op == "dropna_nested":
        kw = {}
        if args["subset"]:
            kw["subset"] = args["subset"]
            if args["how"]:
                kw["how"] = args["how"]
        else:
            kw["on_nested"] = "n"
            if args["thresh"] is not None:
                kw["thresh"] = args["thresh"]
            elif args["how"]:
                kw["how"] = args["how"]
        return enc_frame(nf.dropna(**kw))
    if op == "dropna_base":
        if args.get("thresh") is not None:
            return enc_frame(nf.dropna(thresh=args["thresh"]))
        return enc_frame(nf.dropna(subset=args["subset"], how=args["how"]))
    if op == "fillna":
        return enc_frame(nf.fillna(args["values"]))
    if op == "count_nested":
        from nested_pandas.utils import count_nested
        return enc_frame(count_nested(nf, "n", by=args["by"],
                                      dropna=args.get("dropna", False)))
    if op == "split":
        return enc_frame(nf.split("n", args["by"]))
    if op == "sort_base":
        res = nf.sort_values(by=args["by"], ascending=args["asc"],
                             na_position=args["na_position"])
        return {"k_order": [int(i) for i in res.index]}
    if op == "sort_nested":
        return enc_frame(nf.sort_values(by=args["by"], ascending=args["asc"],
                                        na_position=args["na_position"]))
    if op == "minmax":
        kw = {"numeric_only": args.get("numeric_only", True)}
        if "skipna" in args:
            kw["skipna"] = args["skipna"]
        if args.get("exclude_nest"):
            kw["exclude_nest"] = True
        ser = getattr(nf, args["fn"])(**kw)
        return {"cols": {str(k): enc_val(v) for k, v in ser.items()}}
    if op == "explode":
        return enc_flat_like(nf.drop(columns=["m"]).explode("n"), nf)
    if op == "to_flat":
        return enc_flat_like(nf["n"].nest.to_flat(), nf)
    if op == "from_flat":
        # flat rows: index k, base a repeated, nested pos/x/y/t — the
        # reference re-nests by index; graft's fromFlat groups by k with
        # sortBy=pos for the order the reference gets for free
        import pandas as pd
        ks, As, poss, xs, ys, ts = [], [], [], [], [], []
        for k, a, cell in zip(nf.index, nf["a"], nf["n"]):
            if cell is None or not hasattr(cell, "columns"):
                continue
            for j in range(len(cell)):
                ks.append(k)
                As.append(a)
                poss.append(j)
                xs.append(cell["x"].iloc[j])
                ys.append(cell["y"].iloc[j])
                ts.append(cell["t"].iloc[j])
        flat = pd.DataFrame({"a": pd.array(As, dtype="int64"),
                             "pos": pd.array(poss, dtype="int64"),
                             "x": pd.array(xs, dtype="float64"),
                             "y": pd.array([None if pd.isna(v) else int(v)
                                            for v in ys], dtype="Int64"),
                             "t": ts}, index=ks)
        res = npd.NestedFrame.from_flat(npd.NestedFrame(flat),
                                        base_columns=["a"], name="nf")
        return enc_frame(res)
    if op == "pack":
        # construction parity: the Scala side REBUILDS the nest with
        # joinNested/packFlat from the flat child rows (keyed, pos-ordered)
        # and must reproduce the reference's add_nested frame exactly —
        # the expect is simply the input frame as the reference built it
        return enc_frame(nf)
    if op == "describe":
        d = nf.describe(**({"percentiles": args["percentiles"]}
                           if args.get("percentiles") else {}))
        return {"cols": {str(c): {str(stat): enc_val(d[c].loc[stat])
                                  for stat in d.index}
                         for c in d.columns}}
    if op == "to_lists":
        res = nf["n"].nest.to_lists()
        return {"k": [int(i) for i in nf.index],
                "lists": {f: [enc_val(res[f].loc[k])
                              if k in res.index else None
                              for k in nf.index]
                          for f in res.columns}}
    if op == "setitem":
        import numpy as np
        f2 = nf.copy()
        v = args["var"]
        if v == "scalar":
            f2["n.z"] = args["value"]
        elif v == "base":
            f2["n.z"] = f2["a"] * args["mul"]
        elif v == "modify":
            f2["n.x"] = f2["n.x"] + args["delta"]
        elif v == "field":
            f2["n.z"] = f2["n.y"] * args["mul"]
        elif v == "crossnest":
            # element-aligned flat series from the OTHER nest (same cell
            # lengths by construction) -> set_flat_column alignment path
            f2["n.z"] = f2["m.u"] + args["delta"]
        elif v == "newnest":
            f2["p.w"] = f2["n.x"] + args["delta"]
        elif v == "del_field":
            del f2["n.x"]
        elif v == "del_base":
            del f2["b"]
        return enc_frame(f2)
    if op == "reduce":
        import numpy as np
        k, c = args["kernel"], args["col"]
        fns = {"mean": np.mean, "sum": np.sum, "min": np.min,
               "max": np.max, "std": np.std}
        if k in fns:
            res = nf.reduce(lambda x: {"r": fns[k](x)}, c)
        elif k == "size":
            res = nf.reduce(lambda x: {"r": x.size}, c)
        elif k == "mean_minus_base":
            res = nf.reduce(lambda a, x: {"r": np.mean(x) - a}, "a", c)
        elif k == "offsets":
            res = nf.reduce(lambda a, x: {"off.d": x - a}, "a", c,
                            infer_nesting=True)
        else:  # append_max
            res = nf.reduce(lambda x: {"mx": np.max(x)}, c,
                            append_columns=True)
        return enc_frame(res)
    if op == "merge_base":
        import pandas as pd
        other = pd.DataFrame(args["other"])
        left = nf.drop(columns=["m"]).reset_index(names="k0")
        res = left.merge(other, on="a", how=args["how"],
                         suffixes=("_l", "_r"))
        res = res.sort_values(by=["k0", "a"], na_position="last") \
                 .reset_index(drop=True)
        return enc_frame(res)
    if op == "groupby_agg":
        spec = {out: tuple(src) for out, src in args["fns"].items()}
        g = nf.groupby("a").agg(**spec).reset_index()
        g = g.sort_values("a").reset_index(drop=True)
        return enc_frame(npd.NestedFrame(g))
    if op == "concat_axis1":
        import pandas as pd
        if args["mode"] == "split":
            return enc_frame(pd.concat([nf[["a", "n"]],
                                        nf[["b", "s", "m"]]], axis=1))
        ex = args["extra"]
        right = npd.NestedFrame(
            {"c": pd.Series(ex["c"], dtype="float64", index=ex["k"])},
            index=ex["k"])
        return enc_frame(pd.concat([nf, right], axis=1))
    if op == "rename_cols":
        return enc_frame(nf.rename(columns=args["mapping"]))
    if op == "astype_base":
        return enc_frame(nf.astype({args["col"]: args["dtype"]}))
    if op == "drop_dup":
        res = nf.drop_duplicates(subset=args["subset"], keep=args["keep"])
        return {"k_order": [int(i) for i in res.index]}
    if op == "nlargest":
        res = getattr(nf, args["fn"])(args["n"], args["cols"],
                                      keep=args["keep"])
        return {"k_order": [int(i) for i in res.index]}
    if op == "value_counts":
        import pandas as pd
        vc = nf.value_counts(subset=args["subset"],
                             normalize=args["normalize"],
                             dropna=args["dropna"])
        flat = vc.reset_index()
        valcol = "proportion" if args["normalize"] else "count"
        # CANONICAL order on both engines: count desc, keys asc, NaN keys
        # last — pandas' own tie order under sort_values(kind default) is
        # not a contract, so the corpus pins counts, not pandas tie order
        flat = flat.sort_values(
            by=[valcol] + args["subset"],
            ascending=[False] + [True] * len(args["subset"]),
            na_position="last", kind="stable").reset_index(drop=True)
        return enc_frame(npd.NestedFrame(flat))
    if op == "where_mask":
        ser = nf[args["col"]]
        cond = {">": ser > args["val"], ">=": ser >= args["val"],
                "<=": ser <= args["val"],
                "==": ser == args["val"]}[args["op2"]]
        return enc_frame(getattr(nf, args["fn"])(cond))
    if op == "replace_vals":
        m = args["mapping"]
        if args["col"] == "a":
            m = {int(k): int(v) for k, v in m.items()}
        return enc_frame(nf.replace({args["col"]: m}))
    if op == "round_base":
        d = args["decimals"]
        return enc_frame(nf.round(d))
    if op == "shift_rows":
        return enc_frame(nf.shift(args["n"]))
    if op == "fill_dir":
        return enc_frame(getattr(nf, args["fn"])())
    if op == "dup_filter":
        res = nf[nf.duplicated(args["subset"], keep=args["keep"])]
        return {"k_order": [int(i) for i in res.index]}
    if op == "prefix_suffix":
        return enc_frame(getattr(nf, args["fn"])(args["affix"]))
    if op == "head_tail":
        return enc_frame(getattr(nf, args["which"])(args["n"]))
    if op == "nest_query":
        # accessor query: element mask + DROP rows whose cell emptied
        # (query_flat drops absent keys too)
        res = nf["n"].nest.query_flat(args["flat_text"])
        nf2 = npd.NestedFrame({"a": nf["a"]}, index=nf.index)
        nf2 = nf2.loc[res.index]
        nf2["n"] = res
        return enc_frame(nf2)


def run_join_how(frame, child_keys, how):
    """join_nested(how=) alignment: the frame's BASE columns against a
    child whose per-cell keys are remapped (kept / shifted out of the
    base's key range / merged onto another row's key / dropped).
    Probe-pinned (2026-08-14): right = the packed child's keys with NaN
    base values, outer = sorted key union, left/inner as usual; a
    merged key concatenates cells in input row order."""
    import pandas as pd
    base = pd.DataFrame(
        {c: pd.Series(info["v"], index=frame["k"],
                      dtype={"i": "int64", "d": "float64",
                             "s": object}[info["t"]])
         for c, info in frame["base"].items()},
        index=frame["k"])
    nfb = npd.NestedFrame(base)
    ninfo = frame["nests"]["n"]
    fields = [f for f, _ in ninfo["fields"]]
    dtypes = {f: {"i": "Int64", "d": "float64", "s": object}[t]
              for f, t in ninfo["fields"]}
    rows, idx = [], []
    for ck, cell in zip(child_keys, ninfo["cells"]):
        if ck is None or cell is None:
            continue
        for el in cell:
            rows.append(el)
            idx.append(ck)
    child = pd.DataFrame(rows, columns=fields, index=idx)
    for f in fields:
        child[f] = child[f].astype(dtypes[f])
    return enc_frame(nfb.join_nested(child, "n", how=how))


def enc_frame_with(nf, name, series):
    """enc_frame with nest `name` read from `series` instead of nf[name].
    Direct encoding — reassigning the series through frame __setitem__
    would flat-repack MISSING cells into EMPTY ones (executed 2026-08-15),
    injecting the adjudicated representational divergence into goldens of
    accessor ops that never touch cell presence."""
    import pandas as pd
    out = enc_frame(nf)
    fields, cells = None, []
    for i in nf.index:
        cell = series[i]
        if cell is None or (not hasattr(cell, "columns") and pd.isna(cell)):
            cells.append(None)
            continue
        if fields is None:
            fields = list(cell.columns)
        cells.append([[enc_val(cell[f].iloc[j]) for f in fields]
                      for j in range(len(cell))])
    if fields is None:
        fields = list(series.dtype.fields.keys()) \
            if hasattr(series.dtype, "fields") else []
    out["nests"][name] = {"fields": fields, "cells": cells}
    return out


def run_take(nf, idx, allow_fill):
    """Positional take with the reference's ExtensionArray.take semantics,
    executed per column (nested arrays through NestedExtensionArray.take;
    base columns through their pandas arrays). Result is POSITIONAL —
    pos_k carries the taken source key (None for fill rows)."""
    import numpy as np
    import pandas as pd
    ind = np.asarray(idx, dtype=np.int64)
    out = {"pos_k": [enc_val(v) for v in
                     pd.Series(nf.index).array.take(ind, allow_fill=allow_fill)],
           "base": {}, "nests": {}}
    for c in nf.columns:
        if c in set(nf.nested_columns):
            cells = nf[c].array.take(ind, allow_fill=allow_fill)
            fields, enc_cells = None, []
            for cell in cells:
                if cell is None or (not hasattr(cell, "columns")
                                    and pd.isna(cell)):
                    enc_cells.append(None)
                    continue
                if fields is None:
                    fields = list(cell.columns)
                enc_cells.append([[enc_val(cell[f].iloc[j]) for f in fields]
                                  for j in range(len(cell))])
            if fields is None:
                fields = list(nf[c].dtype.fields.keys())
            out["nests"][c] = {"fields": fields, "cells": enc_cells}
        else:
            out["base"][c] = [enc_val(v) for v in
                              nf[c].array.take(ind, allow_fill=allow_fill)]
    return out


def gen_take_indices(r, n, allow_fill, raise_mode):
    """Random take indices; raise_mode plants one illegal index (oob, or
    a negative other than -1 under allow_fill)."""
    m = r.randint(1, 8)
    if allow_fill:
        idx = [-1 if r.random() < 0.3 else r.randrange(n) for _ in range(m)]
        if raise_mode:
            idx[r.randrange(m)] = \
                -r.randint(2, 5) if r.random() < 0.5 else n + r.randint(0, 3)
    else:
        idx = [r.randint(-n, n - 1) for _ in range(m)]
        if raise_mode:
            idx[r.randrange(m)] = \
                n + r.randint(0, 3) if r.random() < 0.5 \
                else -n - r.randint(1, 3)
    return idx


def gen_lists_frame(r, mismatch):
    """Frame with aligned list columns c (double, NaN elements) and
    d (int) for nest_lists; `mismatch` appends one extra element to a
    random d list (the reference RAISES on unequal lengths)."""
    nrows = r.randint(3, 7)
    cs, ds = [], []
    for _ in range(nrows):
        ln = r.randint(0, 3)
        cs.append([None if r.random() < 0.15 else round(r.uniform(-5, 9), 3)
                   for _ in range(ln)])
        ds.append([r.randint(-3, 9) for _ in range(ln)])
    if mismatch:
        ds[r.randrange(nrows)].append(7)
    return {"k": list(range(nrows)),
            "a": [r.randint(-5, 9) for _ in range(nrows)],
            "c": cs, "d": ds}


def run_nest_lists(spec):
    import pandas as pd
    nf = npd.NestedFrame(
        {"a": pd.array(spec["a"], dtype="int64"),
         "c": [[None if v is None else float(v) for v in cell]
               for cell in spec["c"]],
         "d": spec["d"]},
        index=spec["k"])
    return enc_frame(nf.nest_lists(["c", "d"], "n"))


def enc_flat_like(flat, nf):
    """Encode a flat (duplicated-index) result as per-parent-key ordered
    element lists over the flat columns."""
    fields = list(flat.columns)
    cells = []
    for k in nf.index:
        if k in flat.index:
            sub = flat.loc[[k]]
            cells.append([[enc_val(sub[f].iloc[j]) for f in fields]
                          for j in range(len(sub))])
        else:
            cells.append(None)
    return {"k": [int(i) for i in nf.index],
            "flat": {"fields": fields, "cells": cells}}


def gen_double_nest(r):
    """Doubly-nested frame spec for to_flatten_inner: outer keys with
    1-3 elements each; every element carries a scalar v and an INNER
    nest of 0-3 (t double, u int) rows. JSON shape:
    {"k": [...], "cells": [[{"v":f, "inner":[[t,u]...]|null}, ...], ...]}"""
    nkeys = r.randint(2, 4)
    cells = []
    for _ in range(nkeys):
        els = []
        for _ in range(r.randint(1, 3)):
            if r.random() < 0.1:
                inner = None
            else:
                inner = [[round(r.uniform(-5, 9), 3), r.randint(0, 9)]
                         for _ in range(r.randint(0, 3))]
            els.append({"v": round(r.uniform(-3, 8), 3), "inner": inner})
        cells.append(els)
    return {"k": list(range(nkeys)), "cells": cells}


def run_flatten_inner(spec):
    """Execute to_flatten_inner through the reference on the spec."""
    import pandas as pd
    gs, vs = [], []
    in_rows, in_idx = [], []
    row_id = 0
    for g, els in zip(spec["k"], spec["cells"]):
        for el in els:
            gs.append(g)
            vs.append(el["v"])
            if el["inner"] is not None:
                for t, u in el["inner"]:
                    in_rows.append((t, u))
                    in_idx.append(row_id)
            row_id += 1
    inner_child = pd.DataFrame(in_rows, columns=["t", "u"], index=in_idx)
    inner_child["t"] = inner_child["t"].astype("float64")
    inner_child["u"] = inner_child["u"].astype("Int64")
    nf = npd.NestedFrame({"g": pd.array(gs, dtype="int64"),
                          "v": pd.array(vs, dtype="float64")},
                         index=range(len(gs)))
    nf = nf.add_nested(inner_child, "inner")
    nnf = npd.NestedFrame.from_flat(nf, base_columns=[], on="g",
                                    name="outer")
    res = nnf["outer"].nest.to_flatten_inner("inner")
    fields = None
    cells = []
    for k in spec["k"]:
        cell = res[k] if k in res.index else None
        if cell is None or not hasattr(cell, "columns"):
            cells.append(None)
            continue
        if fields is None:
            fields = list(cell.columns)
        cells.append([[enc_val(cell[f].iloc[j]) for f in fields]
                      for j in range(len(cell))])
    return {"k": spec["k"],
            "flat": {"fields": fields or [], "cells": cells}}


def main():
    n_cases = int(sys.argv[1]) if len(sys.argv) > 1 else 1500
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 20260815
    out = Path(sys.argv[3]) if len(sys.argv) > 3 else \
        Path(__file__).parent.parent / "src/test/resources/fuzz/op_fuzz.jsonl"
    out.parent.mkdir(parents=True, exist_ok=True)
    kept, errors, attempts, i = [], [], 0, 0
    counts = {}
    while len(kept) < n_cases and attempts < n_cases * 4:
        attempts += 1
        r = random.Random(seed * 99991 + i)
        i += 1
        op, args = gen_op(r)
        if op == "concat":
            # pd.concat of two nested frames ≡ unionByName; distinct key
            # ranges keep the comparator's one-row-per-k contract.
            # Schema-drift variants (shard-merge reality, executed
            # 2026-08-15): a base column missing on one side NaN-fills;
            # a NEST column missing on one side yields missing cells and
            # KEEPS the nested dtype ≡ unionByName(allowMissingColumns).
            # (Mismatched nest FIELDS degrade to object dtype in the
            # reference — not representable in Spark, documented in
            # PARITY.md, not fuzzed.)
            import pandas as pd
            variant = r.choices(["same", "missing_base", "missing_nest"],
                                weights=[50, 25, 25])[0]
            f1 = gen_frame(r, allow_missing=True)
            f2 = gen_frame(r, allow_missing=True)
            f2["k"] = [k + 100 for k in f2["k"]]
            if variant == "missing_base":
                del f2["base"]["b"]
            elif variant == "missing_nest":
                del f2["nests"]["m"]
            try:
                expect = enc_frame(pd.concat([build_ref_frame(f1),
                                              build_ref_frame(f2)]))
            except Exception as e:  # noqa: BLE001
                errors.append({"op": op, "args": {"variant": variant},
                               "err": f"{type(e).__name__}: {e}"[:200]})
                continue
            kept.append({"id": len(kept), "op": op,
                         "args": {"variant": variant},
                         "frame": f1, "frame2": f2, "expect": expect})
            counts[op] = counts.get(op, 0) + 1
            continue
        if op == "join_how":
            frame = gen_frame(r, allow_missing=True)
            n = len(frame["k"])
            child_keys = []
            for k in frame["k"]:
                roll = r.random()
                if roll < 0.15:
                    child_keys.append(None)          # cell dropped
                elif roll < 0.35:
                    child_keys.append(k + 50)        # absent from base
                elif roll < 0.45 and n > 1:
                    child_keys.append(frame["k"][r.randrange(n)])  # merge
                else:
                    child_keys.append(k)
            how = r.choice(["left", "inner", "right", "outer"])
            try:
                expect = run_join_how(frame, child_keys, how)
            except Exception as e:  # noqa: BLE001
                errors.append({"op": op, "args": {"how": how},
                               "err": f"{type(e).__name__}: {e}"[:200]})
                continue
            kept.append({"id": len(kept), "op": op,
                         "args": {"how": how, "child_keys": child_keys},
                         "frame": frame, "expect": expect})
            counts[op] = counts.get(op, 0) + 1
            continue
        if op == "take":
            # ExtensionArray.take semantics: negative wrap / allow_fill /
            # raise contract — result is POSITIONAL (duplicate keys legal)
            frame = gen_frame(r, allow_missing=True)
            af = args["allow_fill"]
            idx = gen_take_indices(r, len(frame["k"]), af, args["raise"])
            try:
                nf = build_ref_frame(frame)
                expect = run_take(nf, idx, af)
                if args["raise"]:
                    errors.append({"op": op, "args": args,
                                   "err": "expected raise did not raise"})
                    continue
            except Exception as e:  # noqa: BLE001
                if not args["raise"]:
                    errors.append({"op": op, "args": args,
                                   "err": f"{type(e).__name__}: {e}"[:200]})
                    continue
                expect = {"raises": type(e).__name__}
            kept.append({"id": len(kept), "op": op,
                         "args": {"allow_fill": af, "indices": idx},
                         "frame": frame, "expect": expect})
            counts[op] = counts.get(op, 0) + 1
            continue
        if op == "zip_nests":
            # nf['z'] = nf[['n', 'm']] multi-nest combine: fields
            # flattened in source order (executed reference; missing
            # cells excluded — the flat-repack missing->empty divergence)
            frame = gen_frame(r, allow_missing=False)
            try:
                nf = build_ref_frame(frame)
                f2 = nf.copy()
                f2["z"] = f2[["n", "m"]]
                expect = enc_frame(f2)
            except Exception as e:  # noqa: BLE001
                errors.append({"op": op, "args": {},
                               "err": f"{type(e).__name__}: {e}"[:200]})
                continue
            kept.append({"id": len(kept), "op": op, "args": {},
                         "frame": frame, "expect": expect})
            counts[op] = counts.get(op, 0) + 1
            continue
        if op == "nest_lists":
            # list columns -> one nest; unequal per-row lengths RAISE in
            # the reference (graft's fromLists guard mirrors the raise)
            spec = gen_lists_frame(r, args["mismatch"])
            try:
                expect = run_nest_lists(spec)
                if args["mismatch"]:
                    errors.append({"op": op, "args": args,
                                   "err": "expected raise did not raise"})
                    continue
            except Exception as e:  # noqa: BLE001
                if not args["mismatch"]:
                    errors.append({"op": op, "args": args,
                                   "err": f"{type(e).__name__}: {e}"[:200]})
                    continue
                expect = {"raises": type(e).__name__}
            kept.append({"id": len(kept), "op": op, "args": args,
                         "frame": spec, "expect": expect})
            counts[op] = counts.get(op, 0) + 1
            continue
        if op == "set_filled":
            # accessor set_filled_column: one scalar per row broadcast into
            # every element of the row's cell; a None value broadcasts NaN
            # (executed 2026-08-15). Present cells only — the flat-repack
            # missing->empty divergence.
            frame = gen_frame(r, allow_missing=False)
            values = [None if r.random() < 0.15 else round(r.uniform(-6, 9), 3)
                      for _ in frame["k"]]
            try:
                nf = build_ref_frame(frame)
                res = nf["n"].nest.set_filled_column("z", values)
                expect = enc_frame_with(nf, "n", res)
            except Exception as e:  # noqa: BLE001
                errors.append({"op": op, "args": {},
                               "err": f"{type(e).__name__}: {e}"[:200]})
                continue
            kept.append({"id": len(kept), "op": op,
                         "args": {"values": values},
                         "frame": frame, "expect": expect})
            counts[op] = counts.get(op, 0) + 1
            continue
        if op == "set_list":
            # accessor set_list_column: one list per row, element i of the
            # list -> field of element i; a length mismatch OR a None row
            # entry raises ValueError (executed 2026-08-15). ~1 in 4
            # overwrites the EXISTING x field instead of adding w.
            frame = gen_frame(r, allow_missing=False)
            lists = [[None if r.random() < 0.1 else round(r.uniform(-5, 8), 3)
                      for _ in cell]
                     for cell in frame["nests"]["n"]["cells"]]
            if args["mismatch"]:
                v = r.randrange(len(lists))
                roll = r.random()
                if roll < 0.3:
                    lists[v] = None
                elif roll < 0.65:
                    lists[v] = lists[v] + [1.0]
                else:
                    lists[v] = lists[v][:-1]
            field = "x" if r.random() < 0.25 else "w"
            try:
                nf = build_ref_frame(frame)
                res = nf["n"].nest.set_list_column(field, lists)
                if args["mismatch"]:
                    errors.append({"op": op, "args": args,
                                   "err": "expected raise did not raise"})
                    continue
                expect = enc_frame_with(nf, "n", res)
            except Exception as e:  # noqa: BLE001
                if not args["mismatch"]:
                    errors.append({"op": op, "args": args,
                                   "err": f"{type(e).__name__}: {e}"[:200]})
                    continue
                expect = {"raises": type(e).__name__}
            kept.append({"id": len(kept), "op": op,
                         "args": {"mismatch": args["mismatch"],
                                  "field": field, "lists": lists},
                         "frame": frame, "expect": expect})
            counts[op] = counts.get(op, 0) + 1
            continue
        if op == "explode_multi":
            # nf.explode(["n", "m"]) — aligned multi-column explode: both
            # nests' fields flatten positionally; a MISSING-both row keeps
            # one all-NA row; mismatched element counts (incl. one side
            # missing) RAISE "different element counts" (executed
            # 2026-08-15). graft: explodeAligned(keepEmpty) + size guard.
            frame = gen_frame(r, allow_missing=True)
            if args["mismatch"]:
                cn = frame["nests"]["n"]["cells"]
                cm = frame["nests"]["m"]["cells"]
                v = r.randrange(len(cn))
                if cn[v] is None:
                    cn[v] = [[1.0, 1, "q"]]      # n present, m missing
                elif r.random() < 0.5:
                    cm[v] = None                 # m missing, n present
                else:
                    cm[v] = cm[v] + [[1.0]]      # m longer than n
            try:
                nf = build_ref_frame(frame)
                expect = enc_flat_like(nf.explode(["n", "m"]), nf)
                if args["mismatch"]:
                    errors.append({"op": op, "args": args,
                                   "err": "expected raise did not raise"})
                    continue
            except Exception as e:  # noqa: BLE001
                if not args["mismatch"]:
                    errors.append({"op": op, "args": args,
                                   "err": f"{type(e).__name__}: {e}"[:200]})
                    continue
                expect = {"raises": type(e).__name__}
            kept.append({"id": len(kept), "op": op, "args": args,
                         "frame": frame, "expect": expect})
            counts[op] = counts.get(op, 0) + 1
            continue
        if op == "drop_fields":
            # accessor drop: list form; dropping ALL fields raises
            # "Cannot delete all fields", an unknown name raises
            # "Some fields are not found" (executed 2026-08-15). Present
            # cells only: the reference's drop itself repacks a MISSING
            # cell into an EMPTY one (validity buffer probe 2026-08-15) —
            # the adjudicated flat-repack divergence; graft keeps missing.
            frame = gen_frame(r, allow_missing=False)
            pool = ["x", "y", "t"]
            v = args["variant"]
            if v == "one":
                fields = [r.choice(pool)]
            elif v == "two":
                fields = r.sample(pool, 2)
            elif v == "all":
                fields = list(pool)
            else:
                fields = [r.choice(pool), "nope"]
            try:
                nf = build_ref_frame(frame)
                res = nf["n"].nest.drop(fields)
                if v in ("all", "missing"):
                    errors.append({"op": op, "args": args,
                                   "err": "expected raise did not raise"})
                    continue
                expect = enc_frame_with(nf, "n", res)
            except Exception as e:  # noqa: BLE001
                if v not in ("all", "missing"):
                    errors.append({"op": op, "args": args,
                                   "err": f"{type(e).__name__}: {e}"[:200]})
                    continue
                expect = {"raises": type(e).__name__}
            kept.append({"id": len(kept), "op": op,
                         "args": {"variant": v, "fields": fields},
                         "frame": frame, "expect": expect})
            counts[op] = counts.get(op, 0) + 1
            continue
        if op == "flatten_inner":
            spec = gen_double_nest(r)
            try:
                expect = run_flatten_inner(spec)
            except Exception as e:  # noqa: BLE001
                errors.append({"op": op, "args": args,
                               "err": f"{type(e).__name__}: {e}"[:200]})
                continue
            kept.append({"id": len(kept), "op": op, "args": {},
                         "frame": spec, "expect": expect})
            counts[op] = counts.get(op, 0) + 1
            continue
        if op == "combine_update":
            # two-frame family: f2's index overlaps f1's partially and
            # f2 carries a SUBSET of f1's columns (the shard-merge
            # reality combine_first/update serve)
            f1 = gen_frame(r, allow_missing=True)
            f2 = gen_frame(r, allow_missing=True)
            lo = r.randint(-2, max(1, len(f1["k"]) - 2))
            f2["k"] = [lo + i for i in range(len(f2["k"]))]
            # r12 review: ~1 in 4 draws DUPLICATE a key in `other` — the
            # previously-unexercised path. pandas `update` RAISES
            # (ValueError, non-unique other index) → pinned as raise
            # parity; `combine_first` ACCEPTS and MULTIPLIES rows → the
            # duplicated-label output can't ride the k-keyed frame
            # comparator, so its golden is the output SHAPE (sorted index
            # labels), which pins exactly the multiplication behavior.
            dup = r.random() < 0.25 and len(f2["k"]) >= 2
            if dup:
                f2["k"][-1] = f2["k"][0]
            for c_ in r.sample(["a", "b", "s"], r.randint(0, 2)):
                del f2["base"][c_]
            if r.random() < 0.4:
                del f2["nests"]["m"]
            if r.random() < 0.25:
                del f2["nests"]["n"]
            try:
                nf1, nf2 = build_ref_frame(f1), build_ref_frame(f2)
                if args["fn"] == "combine_first":
                    res = nf1.combine_first(nf2)
                    if dup:
                        kept.append({"id": len(kept), "op": op,
                                     "args": args, "frame": f1,
                                     "frame2": f2,
                                     "expect": {"k_labels": sorted(
                                         int(v) for v in res.index)}})
                        counts[op] = counts.get(op, 0) + 1
                        continue
                    expect = enc_frame(res)
                else:
                    cpy = nf1.copy()
                    try:
                        cpy.update(nf2)
                    except ValueError:
                        if dup:  # pandas: non-unique other index raises
                            kept.append({"id": len(kept), "op": op,
                                         "args": args, "frame": f1,
                                         "frame2": f2,
                                         "expect_error": True})
                            counts[op] = counts.get(op, 0) + 1
                            continue
                        raise
                    expect = enc_frame(cpy)
            except Exception as e:  # noqa: BLE001
                errors.append({"op": op, "args": args,
                               "err": f"{type(e).__name__}: {e}"[:200]})
                continue
            kept.append({"id": len(kept), "op": op, "args": args,
                         "frame": f1, "frame2": f2, "expect": expect})
            counts[op] = counts.get(op, 0) + 1
            continue
        if op == "nlargest":
            # SINGLE column, n < len ONLY. Outside that box the tie order
            # is a pandas-internal artifact, not a contract: n >= len
            # falls to `sort_values()` with the default QUICKSORT (ties
            # unstable), and multi-column SelectNFrame can even return
            # MORE than n rows when a NaN pad becomes the border value
            # (nlargest(6) -> 7 rows, probed 2026-08-16). Inside the box
            # the rules are crisp (probed): keep='first' ties idx ASC +
            # NaN rows pad in idx-asc order, keep='last' ties idx DESC,
            # keep='all' extends the boundary tie group in idx-ASC order,
            # and when keep='all''s top-n runs INTO the NaN pad, ALL NaN
            # rows return in row-position order (n=5 of 6 -> 6 rows;
            # probed 2026-08-16 incl. shuffled labels). keep='last' draws
            # the never-NA column (its NaN-pad order stays unpinned);
            # keep='all' draws the NA column too — the null-boundary
            # branch is reference-verified (r11 ADVICE).
            frame = gen_frame(r, allow_missing=True)
            keep = r.choices(["first", "last", "all"],
                             weights=[60, 25, 15])[0]
            cols = r.choice([["a"], ["b"]]) if keep != "last" else ["a"]
            args = {"fn": r.choice(["nlargest", "nsmallest"]),
                    "n": r.randint(0, len(frame["k"]) - 1),
                    "cols": cols, "keep": keep}
            try:
                nf = build_ref_frame(frame)
                expect = run_reference(nf, op, args)
            except Exception as e:  # noqa: BLE001
                errors.append({"op": op, "args": args,
                               "err": f"{type(e).__name__}: {e}"[:200]})
                continue
            kept.append({"id": len(kept), "op": op, "args": args,
                         "frame": frame, "expect": expect})
            counts[op] = counts.get(op, 0) + 1
            continue
        allow_missing = not (
            op == "setitem" or
            (op == "reduce" and args["kernel"] in NO_MISSING_KERNELS))
        frame = gen_frame(r, allow_missing=allow_missing)
        if op in ("sort_base", "sort_nested"):
            fixup_for_sort(frame, r, nested=op == "sort_nested")
        if op == "clip_pct" and args.get("kind") == "pct":
            vs = frame["base"]["b"]["v"]
            if r.random() < 0.5:
                # regular draws keep exact zeros out of the denominator
                frame["base"]["b"]["v"] = [0.001 if v == 0.0 else v
                                           for v in vs]
            else:
                # r13 (r12 advice): PLANT exact zeros — x/0 exercises
                # the IEEE ±inf branch (golden encodes inf as the
                # string "inf"/"-inf"; json allow_nan=False), and a
                # zero RUN exercises 0/0, which pandas reads NaN (its
                # one missing marker) and graft reads NULL (its one
                # missing marker)
                for j in range(len(vs)):
                    if r.random() < 0.35:
                        vs[j] = 0.0
        if op == "interp" and args["method"] == "index":
            t, idx = 0.0, []
            for _ in range(len(frame["k"])):
                t += r.choice([0.5, 1.0, 1.5, 2.0, 3.5, 7.0])
                idx.append(round(t, 3))
            args["idx"] = idx
        if op == "ewm_cov":
            # the second series rides in args so both inputs draw
            # missing cells independently of the frame columns
            args["yv"] = [None if r.random() < 0.2
                          else round(r.uniform(-6, 10), 3)
                          for _ in range(len(frame["k"]))]
        if op == "roll_time" or op == "resample":
            # ascending integer-second offsets, duplicates allowed
            # (frame peers on both engines), irregular gaps so windows
            # and bins go empty
            n = len(frame["k"])
            t, ts = 0, []
            for _ in range(n):
                ts.append(t)
                t += r.choice([0, 1, 1, 2, 3, 5, 9])
            if op == "resample" and args["fn"] in ("first", "last"):
                # first/last tie-break on a duplicated timestamp is
                # stable arrival order in pandas but arbitrary in a
                # distributed min_by/max_by — draw duplicate-free
                # offsets for these fns (the documented contract);
                # every other fn keeps duplicates
                t, ts = 0, []
                for _ in range(n):
                    ts.append(t)
                    t += r.choice([1, 1, 2, 3, 5, 9])
            args["ts"] = ts
        if (op == "cut_qcut" and args["mode"] == "cut_int"
                and r.random() < 0.15):
            # constant column: pandas WIDENS the range before binning
            # (tile.py mn==mx branch) — r12 review caught the divergence
            const = (round(r.uniform(-3, 8), 3) if args["col"] == "b"
                     else r.randint(-5, 12))
            frame["base"][args["col"]]["v"] = \
                [const] * len(frame["k"])
        if (op == "col_stats" and args["fn"] in ("skew", "kurt", "sem")
                and r.random() < 0.12):
            # zero-variance column: pandas skew/kurt read 0.0 (their
            # m2 == 0 branch), Spark's population moments read NULL —
            # r12 review caught the divergence
            const = (round(r.uniform(-3, 8), 3) if args["col"] == "b"
                     else r.randint(-5, 12))
            frame["base"][args["col"]]["v"] = \
                [const] * len(frame["k"])
        if op == "cut_qcut" and args["mode"] == "qcut":
            # integer quantile positions only: q divides (non-NA count
            # - 1), so every edge IS a data value — bit-exact on both
            # engines regardless of interpolation formula (the
            # interpolated-quantile parity is the tranche-7 family's
            # job). Ensure >= 3 present values first.
            info = frame["base"][args["col"]]
            vs = info["v"]
            for j in range(len(vs)):
                if sum(v is not None for v in vs) >= 3:
                    break
                if vs[j] is None:
                    vs[j] = round(r.uniform(-3, 8), 3)
            cnt = sum(v is not None for v in vs)
            divisors = [d for d in range(2, 7) if (cnt - 1) % d == 0]
            args["q"] = r.choice(divisors) if divisors else cnt - 1
        try:
            nf = build_ref_frame(frame)
            expect = run_reference(nf, op, args)
        except Exception as e:  # noqa: BLE001
            errors.append({"op": op, "args": args,
                           "err": f"{type(e).__name__}: {e}"[:200]})
            continue
        kept.append({"id": len(kept), "op": op, "args": args,
                     "frame": frame, "expect": expect})
        counts[op] = counts.get(op, 0) + 1
    with out.open("w") as f:
        for c in kept:
            f.write(json.dumps(c, allow_nan=False) + "\n")
    out.with_suffix(".errors.json").write_text(json.dumps(
        {"n_reference_errors": len(errors), "sample": errors[:30]}, indent=1))
    print(f"wrote {len(kept)} cases ({attempts} attempts, "
          f"{len(errors)} reference-errored, ops={counts})")


if __name__ == "__main__":
    main()
