#!/usr/bin/env python3
"""Differential corpus for graft's TextWrap kernel vs CPython textwrap.

pandas Series.str.wrap(width) is '\n'.join(textwrap.wrap(s, width)) with
every TextWrapper knob at its default — so the golden here is textwrap
itself (same interpreter the reference runs under). Generates adversarial
texts (hyphen chains, em-dashes, long unbreakable words, tabs that expand
column-aware, leading/trailing whitespace, unicode letters and NBSP) at
widths 1-13 and writes {text, width, expect} JSONL replayed by
WrapFuzzSpec through TextWrap.wrap.
"""
import json
import random
import sys
import textwrap
from pathlib import Path

WORDS = ["hello", "world", "a", "ab", "The", "quick9", "fox", "x,y,z",
         "don't", "naïve", "Ärger", "über", "_und_", "end.", "why?",
         "yes!", "1a2b3", "42", "CAse",
         # code-point fidelity: astral chars (len 1 in python, 2 UTF-16
         # units) and No/Nl numerics ('½' IS a python \w / "letter")
         "😀😀", "a😀b", "𝕏ray", "x½--ab", "½-cup", "Ⅻnl"]
HYPHENATED = ["a-very-long-hyphenated-word", "cd-ef", "re-do", "x-1-y",
              "a-b-c-d-e", "--dash", "em--dash", "tri---ple", "-lead",
              "trail-", "1-2", "a--", "self-e-steem", "anti-aging-cream"]
LONG = ["superlongunbreakableword", "abcdefghijklmnopqrstuvwxyz",
        "no-hyphen-breaks-here-at-all-ever", "wwwwwwwwwwww-w",
        "-" * 9, "a" + "-" * 7 + "b", "ab" + "-" * 5 + "cdef",
        "😀" * 9, "e😀mo-ji😀-long😀word", "½½½½½½½½½-½½½½"]
SPACES = [" ", "  ", "   ", "\t", "\n", "\r", "\x0b", "\x0c", " \t ",
          " "]  # NBSP is NOT textwrap whitespace: part of the word


def gen_text(r):
    n = r.randint(0, 9)
    parts = []
    if r.random() < 0.25:
        parts.append(r.choice(SPACES))
    for _ in range(n):
        roll = r.random()
        if roll < 0.5:
            parts.append(r.choice(WORDS))
        elif roll < 0.75:
            parts.append(r.choice(HYPHENATED))
        else:
            parts.append(r.choice(LONG))
        parts.append(r.choice(SPACES) if r.random() < 0.9 else "")
    if r.random() < 0.25 and parts:
        parts[-1] = r.choice(SPACES)
    return "".join(parts)


def main():
    n_cases = int(sys.argv[1]) if len(sys.argv) > 1 else 400
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 20260816
    out = Path(sys.argv[3]) if len(sys.argv) > 3 else \
        Path(__file__).parent.parent / "src/test/resources/fuzz/wrap_fuzz.jsonl"
    cases = []
    for i in range(n_cases):
        r = random.Random(seed * 7919 + i)
        text = gen_text(r)
        width = r.randint(1, 13)
        expect = "\n".join(textwrap.wrap(text, width))
        cases.append({"id": i, "text": text, "width": width,
                      "expect": expect})
    with out.open("w") as f:
        for c in cases:
            f.write(json.dumps(c, ensure_ascii=False) + "\n")
    print(f"wrote {len(cases)} cases to {out}")


if __name__ == "__main__":
    main()
