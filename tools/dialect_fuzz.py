#!/usr/bin/env python3
"""Differential-fuzz corpus generator: random dialect programs executed
through the REFERENCE engine (/root/reference/src, run in-sandbox via
ref_harness stubs), dumped as golden JSONL for graft.DialectFuzzSpec to
replay through NestedExpr and compare.

This is the generalization of the round-8 technique that caught the
5-round-old eval-reduction wrong golden: the reference EXECUTES, so the
goldens are computed, not hand-ported.

Usage: python3 tools/dialect_fuzz.py [n_cases] [seed] [out.jsonl]
Defaults: 1250 cases, seed 20260814, src/test/resources/fuzz/dialect_fuzz.jsonl
(the committed canonical corpus — bare invocation reproduces it exactly)

Encoding notes (mirrored by the Scala comparator):
 - pandas NaN/NA and SQL NULL are BOTH encoded as JSON null (the engines
   represent missing differently; value-level divergence in missingness
   still surfaces because present-vs-missing differs).
 - floats are emitted at full round-trip precision; the comparator uses
   abs+rel 1e-9 tolerance (distributed vs sequential summation order).
 - nest cells: null for a missing cell, else [[field values...] per
   element] in the nest's field order (recorded per result).

Dev tooling only — duckdb/pandas/numpy are driver-side deps, never
imported by the shipped Scala engine.
"""
import json
import math
import random
import re
import sys
from pathlib import Path

import numpy as np
import pandas as pd

sys.path.insert(0, str(Path(__file__).parent))
from ref_harness import load_reference  # noqa: E402

npd = load_reference()

STR_POOL = ["Abc", "de f", "", "aa", "xAbx", "Hello World", "zz9", "  pad  ",
            "Ab", "b", "CAse", "1a2b3", "na/n", "x,y,z", "aaab"]

# .str methods shared by both engines (graft strSupported ∩ what the
# fuzzer exercises). Value-returning vs predicate split matters only for
# where they are syntactically valid.
STR_VALUE = ["upper", "lower", "casefold", "strip", "lstrip", "rstrip",
             "title", "capitalize", "swapcase", "len"]
STR_VALUE_ARG = [("zfill", lambda r: str(r.randint(2, 8))),
                 ("get", lambda r: str(r.randint(-2, 3))),
                 ("count", lambda r: f"'{r.choice(['a', 'b', 'x'])}'"),
                 ("find", lambda r: f"'{r.choice(['a', 'b', 'x'])}'"),
                 ("removeprefix", lambda r: f"'{r.choice(['A', 'a', 'x'])}'"),
                 ("removesuffix", lambda r: f"'{r.choice(['b', 'x', 'f'])}'"),
                 ("repeat", lambda r: str(r.randint(0, 3))),
                 # negative python bounds + positive steps (r10: the
                 # reference accepts them; graft normalizes / gathers)
                 ("slice", lambda r: r.choice([
                     f"{r.randint(0, 2)}, {r.randint(2, 5)}",
                     f"{r.randint(-4, -1)}",
                     f"{r.randint(0, 1)}, {r.randint(-3, -1)}",
                     f"{r.randint(0, 2)}, {r.randint(3, 8)}, {r.randint(2, 3)}",
                 ])),
                 ("replace", lambda r: f"'a', '{r.choice(['X', ''])}'"),
                 # r9 long-tail: list-returning + slice_replace (goldens
                 # computed by the reference, list cells encoded as arrays)
                 ("findall", lambda r: f"'[{r.choice(['ab', 'xz', 'a-c'])}]'"),
                 ("rsplit", lambda r: "' '"),
                 ("slice_replace",
                  lambda r: f"{r.randint(0, 2)}, {r.randint(1, 4)}, "
                            f"'{r.choice(['ZZ', '#'])}'"),
                 # r11: char-join on plain strings ('abc' -> 'a-b-c');
                 # nested-layer draws raise in the reference (reindex
                 # artifact) and filter to generator errors
                 # '$' pinned: it broke the reverted regexp_replace
                 # rendering (Java Matcher group-reference layer)
                 ("join", lambda r: f"'{r.choice(['-', '+', '$', ' '])}'"),
                 # r11: textwrap defaults via the native TextWrap kernel
                 # (tools/wrap_fuzz.py pins the kernel itself on 400
                 # adversarial texts; this pins the dialect routing +
                 # regimes through the reference's own eval resolvers)
                 ("wrap", lambda r: str(r.randint(1, 8)))]
STR_PRED = [("contains", lambda r: f"'{r.choice(['a', 'b', 'x', ' '])}'"),
            ("startswith", lambda r: f"'{r.choice(['A', 'a', 'de'])}'"),
            ("endswith", lambda r: f"'{r.choice(['b', 'f', 'c'])}'"),
            ("isdigit", None), ("isalpha", None), ("isspace", None),
            ("isupper", None), ("islower", None), ("isalnum", None),
            ("match", lambda r: f"'[{r.choice(['Aa', 'a-d', 'xz'])}]'"),
            ("fullmatch", lambda r: f"'[{r.choice(['A-Za-z ', 'a-d'])}]*'")]

REDUCTIONS = ["mean", "sum", "min", "max", "count", "median", "std"]


def gen_frame(r, allow_missing=True):
    """Random small frame: base (a int, b double-with-NaN, s str) + nests
    n (x double-with-NaN, y int, t str) and m (u double) — m element-
    aligned with n per row (cross-nest exprs require alignment).

    allow_missing=False suppresses None cells: pandas' flat-repack on
    NESTED assignment turns a missing cell into an empty cell, and its
    index-union alignment on mixed base+element expressions injects a
    NaN element for missing keys — adjudicated representational
    divergences (graft keeps missing missing; PARITY.md §fuzz), so those
    families fuzz over present cells only.

    ~1 in 8 frames is LARGER (15-40 rows) so the Spark side spans
    multiple partitions (global reductions, joins, order contracts)."""
    nrows = r.randint(15, 40) if r.random() < 0.125 else r.randint(3, 7)
    a = [r.randint(-5, 12) for _ in range(nrows)]
    b = [None if r.random() < 0.15 else round(r.uniform(-3, 8), 3)
         for _ in range(nrows)]
    # s carries occasional None: pandas object-None comparisons are
    # 2-valued (None == 'x' → False) and .str methods yield NaN — both
    # already conflated/verified by the comparator
    s = [None if r.random() < 0.08 else r.choice(STR_POOL)
         for _ in range(nrows)]
    cells_n, cells_m = [], []
    for _ in range(nrows):
        if allow_missing and r.random() < 0.12:
            cells_n.append(None)
            cells_m.append(None)
            continue
        clen = r.randint(1, 4)
        cn = []
        cm = []
        for _ in range(clen):
            x = None if r.random() < 0.12 else round(r.uniform(-4, 9), 3)
            y = None if r.random() < 0.08 else r.randint(-3, 9)
            t = None if r.random() < 0.08 else r.choice(STR_POOL)
            cn.append([x, y, t])
            cm.append([round(r.uniform(-2, 5), 3)])
        cells_n.append(cn)
        cells_m.append(cm)
    return {"k": list(range(nrows)),
            "base": {"a": {"t": "i", "v": a}, "b": {"t": "d", "v": b},
                     "s": {"t": "s", "v": s}},
            "nests": {"n": {"fields": [["x", "d"], ["y", "i"], ["t", "s"]],
                            "cells": cells_n},
                      "m": {"fields": [["u", "d"]], "cells": cells_m}}}


def build_ref_frame(spec):
    nf = npd.NestedFrame(
        {c: pd.Series(info["v"], index=spec["k"],
                      dtype={"i": "int64", "d": "float64", "s": object}[info["t"]])
         for c, info in spec["base"].items()},
        index=spec["k"])
    for nest, ninfo in spec["nests"].items():
        fields = [f for f, _ in ninfo["fields"]]
        # nested ints use nullable Int64 (arrow int64-with-NA after
        # add_nested, same as non-null int64 when no NA present)
        dtypes = {f: {"i": "Int64", "d": "float64", "s": object}[t]
                  for f, t in ninfo["fields"]}
        rows, idx = [], []
        for k, cell in zip(spec["k"], ninfo["cells"]):
            if cell is None:
                continue
            for el in cell:
                rows.append(el)
                idx.append(k)
        child = pd.DataFrame(rows, columns=fields, index=idx)
        for f in fields:
            child[f] = child[f].astype(dtypes[f])
        nf = nf.add_nested(child, nest)
    return nf


def enc_val(v):
    if v is None:
        return None
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    if isinstance(v, (list, np.ndarray)):
        return [enc_val(e) for e in v]
    if isinstance(v, float) and (math.isnan(v) or pd.isna(v)):
        return None
    if isinstance(v, (np.floating,)):
        f = float(v)
        return None if math.isnan(f) else f
    if isinstance(v, (np.integer,)):
        return int(v)
    if isinstance(v, (np.bool_, bool)):
        return bool(v)
    if pd.isna(v):
        return None
    return v


def enc_frame(nf):
    """Encode a NestedFrame result: ks + flat base columns + nest cells."""
    out = {"k": [int(i) for i in nf.index], "base": {}, "nests": {}}
    nested_cols = set(nf.nested_columns)
    for c in nf.columns:
        if c in nested_cols:
            ser = nf[c]
            fields = None
            cells = []
            for i in nf.index:
                cell = ser[i]
                if cell is None or (not hasattr(cell, "columns")
                                    and pd.isna(cell)):
                    cells.append(None)
                    continue
                if fields is None:
                    fields = list(cell.columns)
                cells.append([[enc_val(cell[f].iloc[j]) for f in fields]
                              for j in range(len(cell))])
            if fields is None:  # every cell missing: recover from dtype
                fields = list(nf[c].dtype.fields.keys()) \
                    if hasattr(nf[c].dtype, "fields") else []
            out["nests"][c] = {"fields": fields, "cells": cells}
        else:
            out["base"][c] = [enc_val(v) for v in nf[c]]
    return out


def enc_series(ser, nf):
    """Non-assign eval result: base-aligned scalar series or element-level
    series on the child index (grouped to per-row lists). Element series
    are detected by TYPE (_SeriesFromNest), not index shape — a frame of
    all-1-element cells has an element series whose index coincides with
    the parent's."""
    is_elem = type(ser).__name__ == "_SeriesFromNest" \
        or getattr(ser, "nest_name", None) is not None
    if not is_elem and ser.index.is_unique and len(ser) == len(nf) \
            and list(ser.index) == list(nf.index):
        return {"series": [enc_val(v) for v in ser]}
    cells = []
    for k in nf.index:
        if k in ser.index:
            sub = ser.loc[[k]]
            cells.append([enc_val(v) for v in sub])
        else:
            cells.append(None)
    return {"cells": cells}


# ---------------------------------------------------------------------------
# program generators
# ---------------------------------------------------------------------------

def num_atom(r, atoms):
    # sqrt is drawn only over BASE atoms: np.sqrt over an ARROW element
    # series launders NA -> NaN and flips that comparison to 2-valued
    # until an arrow operand rehydrates it — a pandas dtype artifact
    # graft deliberately does not model (COVERAGE.md). abs is
    # arrow-native (__abs__) and stays Kleene, so it fuzzes both layers.
    sqrt_ok = not any("." in a for a in atoms)
    roll = r.random()
    if roll < 0.5:
        return r.choice(atoms)
    if roll < 0.56:
        return f"-{r.choice(atoms)}"
    if roll < 0.62:
        return f"abs({r.choice(atoms)} - {r.randint(0, 4)})"
    if roll < 0.66 and sqrt_ok:
        return f"sqrt(abs({r.choice(atoms)}))"
    if roll < 0.83:
        return str(r.randint(-3, 9))
    return f"{r.uniform(0.5, 4):.2f}"


def num_expr(r, atoms, depth, mod_ok=False):
    if depth <= 0:
        return num_atom(r, atoms)
    roll = r.random()
    if roll < 0.12:
        return f"({num_atom(r, atoms)} ** 2)"
    if roll < 0.24:
        return f"({num_expr(r, atoms, depth - 1)} // {r.randint(1, 4)})"
    if mod_ok and roll < 0.32:
        # r11: base-layer % is python modulo in the reference — the
        # divisor's sign wins on negative operands (graft renders the
        # pmod mirror). Negative divisors and dividends both drawn.
        return (f"({num_expr(r, atoms, depth - 1)} % "
                f"{r.choice(['2', '3', '-3', '4'])})")
    if roll < 0.38 and depth >= 2:
        # r11 AST parser: true python precedence — left-assoc * then //,
        # right-assoc ** (until r10 these raised "parenthesize")
        if r.random() < 0.5:
            return (f"{num_atom(r, atoms)} * {r.randint(1, 3)} // "
                    f"{r.randint(2, 4)}")
        # x ** 3 ** 2 = x^9 (right-assoc) vs (x^3)^2 = x^6 — asymmetric
        # exponents distinguish associativity; x^9 stays finite for every
        # atom incl. reduction scalars (sum ≲ 300 → 2e22)
        return f"{num_atom(r, atoms)} ** 3 ** 2"
    if roll < 0.44:
        inner = num_expr(r, atoms, depth - 1)
        if re.fullmatch(r"-[a-zA-Z_.0-9]+", inner):
            # adjudicated-divergence exclusion (r11 probe): a BARE
            # NEGATED nested ref directly under true division numpy-
            # launders arrow NA into float64 NaN in the reference
            # (2-valued regime), same family as the documented np.sqrt
            # laundering (PARITY.md); an un-negated bare ref RAISES
            # TypeError there. `+ 0` keeps the arithmetic identical and
            # the series arrow-backed (probe: `-n.y - 2` stays Kleene).
            inner = f"({inner} + 0)"
        return f"({inner} / {r.choice(['2', '4', '2.5'])})"
    op = r.choice(["+", "-", "*"])
    return f"({num_expr(r, atoms, depth - 1)} {op} {num_expr(r, atoms, depth - 1)})"


def cmp_expr(r, atoms, str_atom=None):
    roll = r.random()
    if str_atom is not None and roll < 0.2:
        if roll < 0.1:
            m, argf = r.choice(STR_PRED)
            arg = argf(r) if argf else ""
            return f"{str_atom}.str.{m}({arg})"
        if roll < 0.13:
            lits = ", ".join(f"'{v}'" for v in
                             r.sample(STR_POOL[:8], r.randint(2, 3)))
            if r.random() < 0.3:  # r10: None in the value list / vs None
                lits += ", None"
            return f"{str_atom} in [{lits}]"
        if roll < 0.155:
            # CHAINED string comparison: each conjunct keeps its own
            # operator's NA regime (ordering Kleene / equality 2-valued)
            a1, a2 = sorted(r.sample(STR_POOL[:8], 2))
            op2 = r.choice(["<", "<=", "=="])
            return f"'{a1}' <= {str_atom} {op2} '{a2}'"
        if roll < 0.105:
            # r11: concat-result comparisons are KLEENE (unlike .str
            # string results) — reference-executed probe
            return (f"{str_atom} + '!' "
                    f"{r.choice(['==', '!=', '<='])} "
                    f"'{r.choice(STR_POOL[:6])}!'")
        # orderings included since r10: string element ORDERING is
        # Kleene (NA drops under mask and ~mask) while equality is
        # 2-valued — reference-executed probe 2026-08-15
        return f"{str_atom} {r.choice(['==', '!=', '==', '!=', '<', '<=', '>', '>='])} '{r.choice(STR_POOL[:8])}'"
    if roll < 0.27:
        ints = ", ".join(str(r.randint(-3, 9)) for _ in range(r.randint(2, 4)))
        if r.random() < 0.25:  # r10: None as a list value
            ints += ", None"
        return f"{r.choice(atoms)} in [{ints}]"
    if roll < 0.3:
        # r10: comparison against the None literal (base 2-valued,
        # element forced Kleene)
        return f"{r.choice(atoms)} {r.choice(['==', '!='])} None"
    if roll < 0.4:
        lo, hi = sorted([r.randint(-3, 6), r.randint(-3, 9)])
        return f"{lo} < {r.choice(atoms)} <= {hi}"
    op = r.choice(["<", "<=", ">", ">=", "==", "!="])
    return f"{num_expr(r, atoms, r.randint(0, 2))} {op} {num_expr(r, atoms, r.randint(0, 1))}"


def _is_per_row(text):
    """True if the expression references a COLUMN element-wise (a bare
    column occurrence not immediately collapsed by a reduction call)."""
    reds = "|".join(REDUCTIONS)
    return re.search(
        rf"(?:\bn\.[xyt]|\bm\.u|\b[abs])\b(?!\.(?:{reds})\(\))",
        text) is not None


def bool_expr(r, atoms, depth, str_atom=None):
    if depth <= 0:
        return cmp_expr(r, atoms, str_atom)
    roll = r.random()
    if roll < 0.2:
        # mask tilde or the spelled-out python keyword — both dialects
        neg = r.choice(["~", "not "])
        inner = bool_expr(r, atoms, depth - 1, str_atom)
        if not _is_per_row(inner):
            # negating a SCALAR operand (all atoms reduced) is a pandas
            # eval-env artifact: `not`/`~` rewrites to python int invert
            # on the scalar (~True == -2), and that int then poisons any
            # enclosing bitwise combination truthy (found at case 1291,
            # r12; adjudicated in PARITY.md — graft keeps boolean
            # semantics). Negate a guaranteed per-row comparison instead.
            cols = [c for c in atoms if "(" not in c]
            inner = cmp_expr(r, cols, str_atom)
            if not _is_per_row(inner):
                return inner  # str-pool edge: drop the negation entirely
        return f"{neg}({inner})"
    op = r.choice(["&", "|", "and", "or"])
    return (f"({bool_expr(r, atoms, depth - 1, str_atom)}) {op} "
            f"({bool_expr(r, atoms, depth - 1, str_atom)})")


def reduction_atom(r):
    # base-column Series reductions (`a.mean()`) are plain pandas eval
    # surface too — reference-executed r9 session-3 probe
    if r.random() < 0.3:
        return f"{r.choice(['a', 'b'])}.{r.choice(REDUCTIONS)}()"
    field = r.choice(["n.x", "n.y"])
    return f"{field}.{r.choice(REDUCTIONS)}()"


def str_value_call(r, recv):
    roll = r.random()
    if roll < 0.15:
        # chained after split: get/len/join are list-capable in both
        # (r11: join — the reference itself raises join on the NESTED
        # layer, so element draws land in reference-errors, harmless)
        sep = r.choice(["' '", "','"])
        tail = r.choice([f"get({r.randint(0, 2)})", "len()",
                         f"join('{r.choice(['-', '_', ''])}')"])
        return f"{recv}.str.split({sep}).str.{tail}"
    if roll < 0.3:
        # scalar-to-scalar chain (reference-executed: strip().str.upper())
        m1 = r.choice(["strip", "lower", "upper", "swapcase"])
        m2 = r.choice(["upper", "lower", "capitalize", "len"])
        return f"{recv}.str.{m1}().str.{m2}()"
    if roll < 0.65:
        m = r.choice(STR_VALUE)
        return f"{recv}.str.{m}()"
    m, argf = r.choice(STR_VALUE_ARG)
    return f"{recv}.str.{m}({argf(r)})"


FAMS = ["query_base", "query_elem", "eval_base", "eval_nested",
        "eval_newnest", "eval_select", "eval_str", "query_str",
        "eval_multiline", "query_reject", "eval_frozen", "eval_both"]
FAM_WEIGHTS = [16, 16, 13, 13, 8, 10, 7, 5, 6, 4, 6, 8]
# Families whose program only reads/filters (missing cells flow through
# identically in both engines); nested-assignment and element-alignment
# families regenerate frames without missing cells (see gen_frame).
MISSING_OK = {"query_base", "query_elem", "query_str", "eval_base"}


def gen_program(r, fam):
    if fam == "query_base":
        # ~1 in 5 draws a global-reduction atom into the comparison pool
        # (query routes through eval, so `a > n.x.mean()` is legal
        # reference surface; stresses withReductions on the query path)
        atoms = ["a", "b"] + \
            ([reduction_atom(r)] if r.random() < 0.2 else [])
        return "query", bool_expr(r, atoms, r.randint(0, 2), "s")
    if fam == "query_elem":
        return "query", bool_expr(r, ["n.x", "n.y"], r.randint(0, 2), "n.t")
    if fam == "eval_base":
        atoms = ["a", "b"] + [reduction_atom(r) for _ in range(r.randint(1, 2))]
        return "eval", f"r = {num_expr(r, atoms, r.randint(1, 2), mod_ok=True)}"
    if fam == "eval_nested":
        atoms = ["n.x", "n.y", "a"] + (["m.u"] if r.random() < 0.4 else [])
        tgt = r.choice(["n.z", "n.x"])
        return "eval", f"{tgt} = {num_expr(r, atoms, r.randint(1, 2))}"
    if fam == "eval_newnest":
        atoms = ["n.x", "n.y"] + (["m.u"] if r.random() < 0.3 else [])
        return "eval", f"p.w = {num_expr(r, atoms, r.randint(1, 2))}"
    if fam == "eval_select":
        if r.random() < 0.5:
            atoms = ["a", "b", reduction_atom(r)]
        else:
            atoms = ["n.x", "n.y", "a"]
        return "eval_select", num_expr(r, atoms, r.randint(1, 2))
    if fam == "eval_str":
        recv = r.choice(["s", "n.t"])
        if r.random() < 0.15:
            # r11: string `+` is CONCAT (element: literal/prefix/field;
            # base: s + s — base s + 'lit' raises in the reference's
            # eval env and graft supports it as a documented extension)
            if recv == "s":
                return "eval", "r = s + s"
            form = r.choice([f"n.t + '{r.choice(['!', '#'])}'",
                             f"'{r.choice(['p_', 'x'])}' + n.t",
                             "n.t + n.t"])
            return "eval", f"n.w = {form}"
        if r.random() < 0.22:
            # r11: .str.cat() is a GLOBAL reduction (whole flat series
            # joined in index order; sep/na_rep kwargs)
            args = r.choice(["", "sep='-'", "sep=', '",
                             "sep='|', na_rep='NA'", "na_rep='?'"])
            return "eval", f"r = {recv}.str.cat({args})"
        tgt = "r" if recv == "s" else "n.w"
        return "eval", f"{tgt} = {str_value_call(r, recv)}"
    if fam == "query_reject":
        # ERROR-PARITY: programs the reference rejects for SEMANTIC
        # reasons (layer mixing / two nests in one query) must raise in
        # graft too. The generator keeps a case only when the reference
        # raises with the layer/nest message (env-level pyarrow errors
        # don't count).
        if r.random() < 0.5:
            text = (f"{r.choice(['a', 'b'])} "
                    f"{r.choice(['<', '>', '<=', '>='])} n.x")
        else:
            text = (f"(n.x > {r.randint(-2, 5)}) "
                    f"{r.choice(['&', '|'])} (m.u < {r.randint(0, 6)})")
        return "query_reject", text
    if fam == "eval_multiline":
        # line N sees the column line N-1 created (reference GH#159):
        # first a base column from base atoms (+ optional reduction),
        # then a second statement CONSUMING it — either another base
        # column or a nested field broadcast-mixing it in. Reduction
        # variants stress the engine's cross-line hoist (r9 session 4):
        # independent reductions batch into one agg; a reduction over a
        # column an earlier line writes must see the written values.
        roll = r.random()
        if roll < 0.18:
            # cross-line INDEPENDENT reductions (engine batches them)
            l1 = f"r1 = {num_expr(r, ['a', 'b', reduction_atom(r)], r.randint(1, 2))}"
            l2 = f"r2 = {num_expr(r, ['a', reduction_atom(r)], r.randint(1, 2))}"
            return "eval", l1 + "\n" + l2
        if roll < 0.32:
            # line 2 reduces the column line 1 CREATED (not hoistable).
            # The RHS must reference a real column: a CONSTANT-only
            # assignment stays a SCALAR in the reference's eval env, so
            # `r1.sum()` returns the scalar itself rather than the
            # column sum (same env-artifact family as the inplace=False
            # nested freeze — PARITY.md r9 s4; graft keeps the column
            # semantics, which is also what the reference gives across
            # two separate eval calls)
            body = num_expr(r, ["a", "b"], r.randint(1, 2))
            import re as _re
            if not _re.search(r"\b[ab]\b", body):
                body = f"a + {body}"
            l1 = f"r1 = {body}"
            l2 = f"r2 = a - r1.{r.choice(REDUCTIONS)}()"
            return "eval", l1 + "\n" + l2
        if roll < 0.45:
            # line 1 MODIFIES a nested field, line 2 reduces it — the
            # reduction must see the modified elements, not the original
            l1 = f"n.x = {num_expr(r, ['n.x', 'n.y'], r.randint(0, 1))}"
            l2 = f"r2 = a + n.x.{r.choice(['mean', 'sum', 'min', 'max'])}()"
            return "eval", l1 + "\n" + l2
        atoms1 = ["a", "b"] + ([reduction_atom(r)] if r.random() < 0.4 else [])
        l1 = f"r1 = {num_expr(r, atoms1, r.randint(1, 2))}"
        if r.random() < 0.5:
            l2 = f"r2 = {num_expr(r, ['r1', 'a'], r.randint(1, 2))}"
        else:
            l2 = f"n.z = {num_expr(r, ['n.x', 'n.y', 'r1'], r.randint(1, 2))}"
        return "eval", l1 + "\n" + l2
    if fam == "eval_frozen":
        # r11: the reference's DEFAULT (inplace=False) multiline mode —
        # the NESTED layer is frozen per-line (reads see pre-eval
        # values), base columns stay sequential, new-nest fields
        # accumulate. Read-after-write is the distinguishing shape.
        roll = r.random()
        if roll < 0.3:
            # modify a nested field, then read it (frozen) on line 2
            l1 = f"n.x = {num_expr(r, ['n.x', 'n.y'], r.randint(0, 1))}"
            l2 = ("n.z = " if r.random() < 0.6 else "n.x = ") + \
                num_expr(r, ["n.x", "a"], r.randint(0, 1))
            return "eval_frozen", l1 + "\n" + l2
        if roll < 0.5:
            # new-nest fields accumulate across lines
            l1 = f"p.w = {num_expr(r, ['n.x', 'n.y'], r.randint(0, 1))}"
            l2 = f"p.v = {num_expr(r, ['n.x'], r.randint(0, 1))}"
            return "eval_frozen", l1 + "\n" + l2
        if roll < 0.7:
            # frozen reductions: a write between two reductions of the
            # same nested column must NOT change the second one
            l1 = f"r1 = a + n.x.{r.choice(['mean', 'sum', 'max'])}()"
            l2 = f"n.x = {num_expr(r, ['n.x'], r.randint(0, 1))}"
            l3 = f"r2 = a + n.x.{r.choice(['mean', 'sum', 'max'])}()"
            return "eval_frozen", l1 + "\n" + l2 + "\n" + l3
        # base columns sequential even in frozen mode
        l1 = f"r1 = {num_expr(r, ['a', 'b'], r.randint(1, 2))}"
        l2 = f"r2 = {num_expr(r, ['r1', 'a'], r.randint(0, 1))}"
        return "eval_frozen", l1 + "\n" + l2
    if fam == "eval_both":
        # r12 (VERDICT item 5): cross-MODE differential — ONE program,
        # BOTH inplace modes executed on the reference; the replay diffs
        # graft's sequential eval AND frozen eval against their own
        # goldens. Programs where the modes AGREE catch mode-dispatch
        # bugs; where they DIVERGE they pin the per-line freeze. Adds
        # .str chains and string reductions inside frozen programs
        # (the r11 eval_frozen family was numeric-only).
        roll = r.random()
        if roll < 0.2:
            # nested read-after-write: line 2's read diverges by mode
            l1 = f"n.x = {num_expr(r, ['n.x', 'n.y'], r.randint(0, 1))}"
            l2 = ("n.z = " if r.random() < 0.6 else "n.x = ") + \
                num_expr(r, ["n.x", "a"], r.randint(0, 1))
            return "eval_both", l1 + "\n" + l2
        if roll < 0.36:
            # created-nest-field read-back: frozen RAISES (the pre-eval
            # frame has no p), sequential succeeds — the error shape
            # that exposes a mode-dispatch bug instantly
            l1 = f"p.w = {num_expr(r, ['n.x', 'n.y'], r.randint(0, 1))}"
            if r.random() < 0.5:
                l2 = f"n.z = p.w + {r.randint(0, 4)}"
            else:
                l2 = f"r = a + p.w.{r.choice(['sum', 'mean', 'max'])}()"
            return "eval_both", l1 + "\n" + l2
        if roll < 0.56:
            # reduction sandwich: the write between two reductions of
            # the same nested column moves r2 ONLY in sequential mode
            l1 = f"r1 = a + n.x.{r.choice(['mean', 'sum', 'max'])}()"
            l2 = f"n.x = {num_expr(r, ['n.x'], r.randint(0, 1))}"
            l3 = f"r2 = a + n.x.{r.choice(['mean', 'sum', 'min'])}()"
            return "eval_both", l1 + "\n" + l2 + "\n" + l3
        if roll < 0.8:
            # .str chain write then read-back: frozen line 2 sees the
            # PRE-eval strings (string-typed freeze + a string reduction)
            m1 = r.choice(["strip()", "lower()", "upper()",
                           "swapcase()", "capitalize()"])
            l1 = f"n.t = n.t.str.{m1}"
            if r.random() < 0.3:
                l2 = "r = n.t.str.cat(sep='-')"
            else:
                m2 = r.choice(["len()", "upper()", "count('a')"])
                l2 = f"n.w = n.t.str.{m2}"
            return "eval_both", l1 + "\n" + l2
        # base sequential chain — modes AGREE (pure dispatch check)
        l1 = f"r1 = {num_expr(r, ['a', 'b'], r.randint(1, 2))}"
        l2 = f"r2 = {num_expr(r, ['r1', 'a'], r.randint(0, 1))}"
        return "eval_both", l1 + "\n" + l2
    # query_str
    recv, lay = (("s", ["a", "b"]) if r.random() < 0.5
                 else ("n.t", ["n.x", "n.y"]))
    m, argf = r.choice(STR_PRED)
    arg = argf(r) if argf else ""
    return "query", f"{recv}.str.{m}({arg})"


def run_reference(nf, kind, text):
    if kind == "query":
        return enc_frame(nf.query(text))
    if kind == "eval":
        # inplace=True: the SEQUENTIAL multiline contract the reference's
        # own GH#159 test pins (each line sees every prior line's nested
        # creations AND modifications). The inplace=False default freezes
        # the NESTED layer per-line — created fields raise AttributeError
        # on later lines, modified fields evaluate against pre-eval
        # values — a pandas-env artifact graft does not mirror
        # (PARITY.md, r9 session-4 probe).
        res = nf.copy()
        res.eval(text, inplace=True)
        return enc_frame(res)
    if kind == "eval_frozen":
        # the reference's DEFAULT mode: returns a new frame, nested
        # layer frozen per-line (expr.py:77-128)
        return enc_frame(nf.eval(text))
    # eval_select: non-assign eval returns a Series
    return enc_series(nf.eval(text), nf)


def main():
    n_cases = int(sys.argv[1]) if len(sys.argv) > 1 else 1250
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 20260814
    out = Path(sys.argv[3]) if len(sys.argv) > 3 else \
        Path(__file__).parent.parent / "src/test/resources/fuzz/dialect_fuzz.jsonl"
    out.parent.mkdir(parents=True, exist_ok=True)
    kept, errors, attempts = [], [], 0
    fam_counts = {}
    i = 0
    while len(kept) < n_cases and attempts < n_cases * 4:
        attempts += 1
        r = random.Random(seed * 100003 + i)
        i += 1
        fam = r.choices(FAMS, weights=FAM_WEIGHTS)[0]
        frame = gen_frame(r, allow_missing=fam in MISSING_OK)
        kind, text = gen_program(r, fam)
        if kind == "query_reject":
            nf = build_ref_frame(frame)
            try:
                nf.query(text)
                errors.append({"kind": kind, "text": text,
                               "err": "reference ACCEPTED a reject-case"})
                continue
            except ValueError as e:
                msg = str(e)
                if not ("struct" in msg or "layer" in msg or "nest" in msg):
                    errors.append({"kind": kind, "text": text,
                                   "err": f"non-semantic: {msg[:120]}"})
                    continue
            except Exception as e:  # noqa: BLE001
                errors.append({"kind": kind, "text": text,
                               "err": f"{type(e).__name__}: {e}"[:150]})
                continue
            kept.append({"id": len(kept), "seed_i": i - 1,
                         "kind": "query", "text": text, "frame": frame,
                         "expect_error": True})
            fam_counts[kind] = fam_counts.get(kind, 0) + 1
            continue
        if kind == "eval_both":
            # both modes on the SAME program: sequential golden is
            # required (a seq failure is a generator artifact — drop);
            # frozen may legitimately RAISE (created-field read) — pin
            # the raise itself, but only for the semantic error classes
            # the reference's resolver produces (env errors drop).
            try:
                nf = build_ref_frame(frame)
                seqf = nf.copy()
                seqf.eval(text, inplace=True)
                expect_seq = enc_frame(seqf)
            except Exception as e:  # noqa: BLE001
                errors.append({"kind": kind, "text": text,
                               "err": f"seq {type(e).__name__}: {e}"[:200]})
                continue
            rec = {"id": len(kept), "seed_i": i - 1, "kind": kind,
                   "text": text, "frame": frame, "expect_seq": expect_seq}
            try:
                rec["expect_frozen"] = enc_frame(nf.eval(text))
            except (AttributeError, KeyError) as e:
                rec["frozen_error"] = type(e).__name__
            except Exception as e:  # noqa: BLE001
                # pandas raises UndefinedVariableError when the created
                # field is read through a REDUCTION ('p' is not in the
                # frozen env) — same semantic signal, different class
                if type(e).__name__ == "UndefinedVariableError":
                    rec["frozen_error"] = type(e).__name__
                else:
                    errors.append({"kind": kind, "text": text,
                                   "err": f"frozen {type(e).__name__}: "
                                          f"{e}"[:200]})
                    continue
            kept.append(rec)
            fam_counts[kind] = fam_counts.get(kind, 0) + 1
            continue
        try:
            nf = build_ref_frame(frame)
            result = run_reference(nf, kind, text)
        except Exception as e:  # noqa: BLE001
            errors.append({"kind": kind, "text": text,
                           "err": f"{type(e).__name__}: {e}"[:200]})
            continue
        kept.append({"id": len(kept), "seed_i": i - 1, "kind": kind,
                     "text": text, "frame": frame, "expect": result})
        fam_counts[kind] = fam_counts.get(kind, 0) + 1
    with out.open("w") as f:
        for c in kept:
            f.write(json.dumps(c, allow_nan=False) + "\n")
    err_path = out.with_suffix(".errors.json")
    err_path.write_text(json.dumps(
        {"n_reference_errors": len(errors), "sample": errors[:40]}, indent=1))
    print(f"wrote {len(kept)} cases to {out} "
          f"({attempts} attempts, {len(errors)} reference-errored, "
          f"families={fam_counts})")


if __name__ == "__main__":
    main()
