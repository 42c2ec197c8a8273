"""Micro-A/B for the digit-shape NER scans (OPTIMIZATION_r08 'not yet
optimized' item 1): RE_DATE / RE_VALUE_UNIT / RE_PAREN_VALUE and their
fuzzy twins currently run full char-by-char finditer passes behind
near-useless gates (the _RE_ANY_DIGIT gate passes 89-98% of texts and its
.search is itself a scan).  Every one of these patterns is anchorable:

* value-unit shapes: every match contains ' <unit>' verbatim, and the
  boundary guard forces the match start to be the start of the maximal
  value-char run immediately before that space -> C-level str.find on the
  space+unit literals, back-scan the run, run the regex anchored;
* date shapes: every match contains '/', and the match start is the start
  of the maximal value-char run before a '/';
* paren values: the match starts with the literal '(' (existing
  _anchored_matches applies directly).

This script verifies match-set identity on the kernel's own unique
paragraph set, OCR-corrupted copies, and adversarial forms, then times the
shipped scan (gates + finditer) against the anchored variant interleaved.

Usage: python tools/exp_digit_scan.py [n_docs] [rounds]
"""

from __future__ import annotations

import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from exp_ner_loops import capture_texts  # noqa: E402
from grobid_medical_report_spark.corpus import corrupt_text, noise_rng  # noqa: E402
from grobid_medical_report_spark.operators import ner  # noqa: E402

#: the shipped r7 gate (removed from ner in r8 - kept here so the
#: before-state stays reproducible)
_RE_ANY_DIGIT = re.compile(r"\d")

_DIG = frozenset("0123456789")
_FUZZ = frozenset("0123456789oOlIzZsSbB")

VU_UNITS = tuple(" " + u for u in ("ans", "SA", "mg", "ml", "cm", "kg"))
VU_UNITS_F = tuple(" " + u for u in
                   ("ans", "ons", "ams", "SA", "mg", "ml", "m1", "cm", "kg"))


def _backscan_matches(text, lits, rx, valchars):
    """Replicate ``rx.finditer(text)`` for value-run-then-literal shapes:
    every match contains one of ``lits`` verbatim, immediately preceded by
    the match's trailing value-char run; the pattern's leading boundary
    guard means a match can only START where that run starts (valchars are
    all \\w, so interior positions fail the boundary)."""
    pos: list[int] = []
    find = text.find
    for lit in lits:
        i = find(lit)
        while i != -1:
            pos.append(i)
            i = find(lit, i + 1)
    if not pos:
        return
    pos.sort()
    last = 0
    prev = -1
    rxm = rx.match
    for p in pos:
        # back-scan over a SUPERSET of the pattern's value class that stays
        # inside \w (str.isdigit() covers every \d char incl. Unicode
        # digits): sound because a true match's start has a non-\w char
        # before it, so the superset run start lands exactly on it, and
        # extra positions just fail the anchored match
        j = p - 1
        while j >= 0 and (text[j] in valchars or text[j].isdigit()):
            j -= 1
        s = j + 1
        if s == p or s < last or s == prev:
            continue
        prev = s
        m = rxm(text, s)
        if m:
            yield m
            last = m.end()


# ---- shipped vs anchored scan, per pattern ---------------------------------

def date_cur(t):
    if _RE_ANY_DIGIT.search(t) and "/" in t:
        return [m.span() for m in ner.RE_DATE.finditer(t)]
    return []


def date_new(t):
    return [m.span()
            for m in _backscan_matches(t, ("/",), ner.RE_DATE, _DIG)]


def datef_cur(t):
    if "/" in t:
        return [m.span() for m in ner.RE_DATE_FUZZY.finditer(t)]
    return []


def datef_new(t):
    return [m.span()
            for m in _backscan_matches(t, ("/",), ner.RE_DATE_FUZZY, _FUZZ)]


def vu_cur(t):
    if _RE_ANY_DIGIT.search(t):
        return [(m.span(1), m.span(2)) for m in ner.RE_VALUE_UNIT.finditer(t)]
    return []


def vu_new(t):
    return [(m.span(1), m.span(2))
            for m in _backscan_matches(t, VU_UNITS, ner.RE_VALUE_UNIT, _DIG)]


def vuf_cur(t):
    if _RE_ANY_DIGIT.search(t):
        return [(m.span(1), m.span(2))
                for m in ner.RE_VALUE_UNIT_FUZZY.finditer(t)]
    return []


def vuf_new(t):
    return [(m.span(1), m.span(2))
            for m in _backscan_matches(t, VU_UNITS_F,
                                       ner.RE_VALUE_UNIT_FUZZY, _FUZZ)]


def paren_cur(t):
    if _RE_ANY_DIGIT.search(t) and "(" in t:
        return [m.span(1) for m in ner.RE_PAREN_VALUE.finditer(t)]
    return []


def paren_new(t):
    return [m.span(1)
            for m in ner._anchored_matches(t, ("(",), ner.RE_PAREN_VALUE)]


PAIRS = [("date", date_cur, date_new), ("date_fuzzy", datef_cur, datef_new),
         ("value_unit", vu_cur, vu_new),
         ("value_unit_fuzzy", vuf_cur, vuf_new),
         ("paren_value", paren_cur, paren_new)]

ADVERSARIAL = [
    "", "/", "//", "a/b", "1/", "/1", "1/2", "12/3/45", "123/4", "a23/4",
    "1/2/3/45", "xo12 mg", "12  mg", "a12 mg", "sans ans", "une anse",
    "12 m1", "3 ans.", "(12 mg)", "(12mg)", "(007", "x(12", "((8))",
    "l2/o3/1985", "12/o3", "o/o", "5 SA", "b8 kg", "12 ons", "12 ams",
    "12 ansx", "12/34/5678/90", "1/2 3/4", "9/9/99", "(1)(2)(3)",
    "dose 1000 mg * 2", "Zl/lZ/ZOZl", "12 mg", "١٢/3",
    "12/13 14 ans (15", "fin.", "Tension 12/8", "(" * 50 + "9",
    "9 " + "mg" * 30, "1" * 300 + "/2", "m1 m1 1 m1",
]


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1500
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    texts = capture_texts(n_docs)
    print(f"{len(texts)} unique paragraph texts from {n_docs} docs")
    corrupted = [corrupt_text(t, noise_rng(i), 0.4)
                 for i, t in enumerate(texts)]
    allt = texts + corrupted + ADVERSARIAL

    for name, cur, new in PAIRS:
        n_hits = 0
        for t in allt:
            a, b = cur(t), new(t)
            assert a == b, (name, t, a, b)
            n_hits += len(a)
        print(f"{name}: identical on {len(allt)} texts ({n_hits} hits)")

    times: dict[str, list[float]] = {}
    for _ in range(rounds):
        for name, cur, new in PAIRS:
            for tag, fn in (("cur", cur), ("new", new)):
                t0 = time.perf_counter()
                for t in texts:
                    fn(t)
                times.setdefault(f"{name}:{tag}", []).append(
                    time.perf_counter() - t0)
    # the gate cost itself, once (shared by several shipped sites)
    for _ in range(rounds):
        t0 = time.perf_counter()
        for t in texts:
            _RE_ANY_DIGIT.search(t)
        times.setdefault("any_digit_gate", []).append(
            time.perf_counter() - t0)
    for name, ts in sorted(times.items()):
        print(f"{name}: best={min(ts):.3f}s trials="
              f"{[round(x, 3) for x in ts]}")


if __name__ == "__main__":
    main()
