"""Pins for the r8 find-anchored literal scans: the anchored helpers must
reproduce the exact finditer/search semantics of the patterns they
accelerate, on generated corpus lines (clean + corrupted) and on
adversarial boundary forms."""

import random

from grobid_medical_report_spark.corpus import corrupt_text, generate_doc
from grobid_medical_report_spark.functions.textnorm import (anchored_search,
                                                            ocr_fold)
from grobid_medical_report_spark.operators import header as H
from grobid_medical_report_spark.operators import ner as N
from grobid_medical_report_spark.operators import segmenter as S

_ADV = [
    "Dr", "Dr.", "DrX", "xDr Y", "Dr Dupont Dr Martin", "Docteur Dr",
    "MadameMonsieur", "Madame Monsieur Dupont", "Le Dr A le Pr B",
    "Dramatique Dr A", "Pr", " Pr X", "Madame X. Docteur Y", "",
    "PrPr Pr Zz", "Monsieur Pr Abc", "Dr  A", "Patient Patiente",
    "PatientePatiente", "xPatiente", "Patiente.", "Opérateur : Dr X",
    "Anesthésiste Anesthésiste", "le Patient", "SurPatiente",
    "Madame Patiente", "Dr Opérateur", "Madame ROUX.", "Monsieur 0livier",
]
_ADV_F = [
    "dr", "adr", "dr x", "xdr", "doeteur", "doeteurx", "pr", "spr", "pr.",
    "protesseur y", "ons", "bons", "ons x", "x ons", "onsx", "", "d",
    "ehu", "ghu", "hu", "chu", "aehu", "ehu x", "pr dr ons ehu", "ehu5",
]


def _lines(n_docs=300):
    rng = random.Random(8)
    out = []
    for i in range(n_docs):
        for sp in generate_doc(i)["spans"]:
            t = sp.get("text") or ""
            if t:
                out.append(t)
                out.append(corrupt_text(t, rng, 0.4))
    return out


def test_ner_anchored_matches_equals_finditer():
    lines = _lines() + _ADV
    for t in lines:
        assert ([(m.start(), m.end()) for m in
                 N._anchored_matches(t, N._PERSNAME_LITS, N.RE_PERSNAME)]
                == [(m.start(), m.end())
                    for m in N.RE_PERSNAME.finditer(t)]), t
        assert ([(m.start(), m.end()) for m in
                 N._anchored_matches(t, N._ROLENAME_LITS, N.RE_ROLENAME)]
                == [(m.start(), m.end())
                    for m in N.RE_ROLENAME.finditer(t)]), t
        f = N._fold(t)
        assert ([(m.start(), m.end()) for m in
                 N._anchored_matches(f, N._title_folds(),
                                     N._persname_title_fuzzy())]
                == [(m.start(), m.end())
                    for m in N._persname_title_fuzzy().finditer(f)]), t
        assert ([(m.start(), m.end()) for m in
                 N._anchored_matches(f, N._role_folds(), N._rolename_fuzzy())]
                == [(m.start(), m.end())
                    for m in N._rolename_fuzzy().finditer(f)]), t


_ADV_D = [
    "", "/", "//", "a/b", "1/", "/1", "1/2", "12/3/45", "123/4", "a23/4",
    "1/2/3/45", "xo12 mg", "12  mg", "a12 mg", "sans ans", "une anse",
    "12 m1", "3 ans.", "(12 mg)", "(12mg)", "(007", "x(12", "((8))",
    "l2/o3/1985", "12/o3", "o/o", "5 SA", "b8 kg", "12 ons", "12 ams",
    "12 ansx", "12/34/5678/90", "1/2 3/4", "9/9/99", "(1)(2)(3)",
    "dose 1000 mg * 2", "Zl/lZ/ZOZl", "12 mg", "١٢/3", "²12/3", "1²2/3",
    "12/13 14 ans (15", "Tension 12/8", "(" * 50 + "9",
    "9 " + "mg" * 30, "1" * 300 + "/2", "m1 m1 1 m1",
]


def test_backscan_matches_equals_finditer():
    """The r8 digit-shape anchored scans (date / value-unit / paren and
    fuzzy twins) must reproduce finditer exactly — including Unicode
    digits, overlap-resume and boundary edge forms."""
    lines = _lines() + _ADV_D
    cases = [
        (("/",), N.RE_DATE, N._VAL_DIGITS),
        (("/",), N.RE_DATE_FUZZY, N._VAL_FUZZY),
        (N._VU_UNIT_LITS, N.RE_VALUE_UNIT, N._VAL_DIGITS),
        (N._VU_UNIT_LITS_F, N.RE_VALUE_UNIT_FUZZY, N._VAL_FUZZY),
    ]
    for t in lines:
        for lits, rx, chars in cases:
            assert ([m.span() for m in N._backscan_matches(t, lits, rx,
                                                           chars)]
                    == [m.span() for m in rx.finditer(t)]), (t, rx.pattern)
        assert ([m.span() for m in
                 N._anchored_matches(t, ("(",), N.RE_PAREN_VALUE)]
                == [m.span() for m in N.RE_PAREN_VALUE.finditer(t)]), t


def test_probe_anchored_search_equals_search():
    folds = [ocr_fold(t) for t in _lines()] + _ADV_F
    for ft in folds:
        assert (anchored_search(ft, H._DR_LITS, H._RE_DR_TOK_F)
                == (H._RE_DR_TOK_F.search(ft) is not None)), ft
        assert (anchored_search(ft, H._ANS_LITS, H._RE_ANS_TOK_F)
                == (H._RE_ANS_TOK_F.search(ft) is not None)), ft
        assert (anchored_search(ft, S._DRTOK_LITS, S._RE_DRTOK_F)
                == (S._RE_DRTOK_F.search(ft) is not None)), ft
        assert (anchored_search(ft, S._ANS_LITS, S._RE_ANS_F)
                == (S._RE_ANS_F.search(ft) is not None)), ft
        assert S._has_chu(ft) == (S._RE_CHU_F.search(ft) is not None), ft
