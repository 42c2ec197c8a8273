"""Header-zone field extraction + sub-entity cascade.

Re-expresses the reference's `header-medical-report` model and its cascade
(HeaderMedicalParser.processingHeaderLeftNoteSection:239-389,
resultExtraction:1229-1349; child parsers DatelineParser.java:104-199,
MedicParser.java:57-233, PatientParser.java:58-222,
PersonNameParser.java:56-...): label each header-zone line with a field,
pivot label->field with ``"; "`` concat-dedup merges (A1), keep-longest date /
keep-first time (A2), ISO date normalization (X5), and run the sub-entity
parsers (dateline -> place/date/time, medic -> persname/role, patient ->
idno/persname/birth/age/address, person-name -> title/forename/surname).
"""

from __future__ import annotations

from functools import lru_cache

import re
from typing import Any

from ..functions.dates import parse_date_iso
from ..functions.textnorm import (anchored_search, merge_field,
                                  normalize_space, ocr_fold)
from .segmenter import (RE_AGE, RE_BIRTH, RE_DATELINE, RE_DOCNUM, RE_DOCTYPE,
                        RE_IDNO, RE_MEDIC_LINE, RE_PADDR, RE_PATIENT_NAME,
                        RE_SEX)

_EMPTY_HEADER: dict[str, Any] = {k: "" for k in (
    "docnum", "doctype", "title", "date_iso", "time", "dateline",
    "affiliation", "address", "org", "email", "phone", "fax", "web", "note")}

RE_MEDIC_SPLIT = re.compile(r"^((?:Dr|Docteur|Pr)\.? .+?), (.+)$")
_TITLES = ("Dr", "Docteur", "Pr", "Professeur", "Madame", "Monsieur", "Mme", "M.")


def parse_person_name(persname: str) -> dict[str, str]:
    """PersonNameParser analog (reference PersonName.java:26-33) — RULE
    split, the A/B twin of :func:`parse_person_name_fitted`."""
    toks = persname.split(" ")
    title = toks[0] if toks and toks[0].rstrip(".") in [t.rstrip(".") for t in _TITLES] else ""
    rest = toks[1:] if title else toks
    surname = rest[-1] if rest else ""
    forename = rest[0] if len(rest) >= 2 else ""
    middle = " ".join(rest[1:-1]) if len(rest) >= 3 else ""
    return {"title": title, "forename": forename, "middlename": middle,
            "surname": surname, "suffix": ""}


def parse_person_name_fitted(persname: str) -> dict[str, str]:
    """FITTED person-name split (name-person-medical token tagger,
    operators/subentity.py) — same output shape as the rule twin."""
    from .subentity import tag_segments

    segs = tag_segments("name-person-medical", persname)
    return {"title": segs.get("title", ""),
            "forename": segs.get("forename", ""),
            "middlename": segs.get("middlename", ""),
            "surname": segs.get("surname", ""), "suffix": ""}


# --------------------------------------------------------------------------
# header line-field model (the reference's header-medical-report is a
# trained CRF, HeaderMedicalParser.java:239-389): per-line pattern/layout
# features -> learned multiclass weights (tools/train_fields.py), with the
# rule cascade kept as the A/B twin. The field ACTIONS (merge semantics,
# sub-entity cascade) are shared by both paths — mirroring the reference's
# model -> resultExtraction split.
# --------------------------------------------------------------------------

import json as _json
import os as _os

HEADER_LABELS = ("docnum", "dateline", "medic", "idno", "sex", "patient",
                 "birthdate", "age", "patient_address", "doctype", "note")
HEADER_FEATURES = ("bias", "r_docnum", "r_dateline", "r_medic", "r_idno",
                   "r_sex", "r_patient", "r_birth", "r_age", "r_paddr",
                   "r_doctype", "largest_font",
                   # r5 damage-tolerant twins: keyword/shape evidence on
                   # OCR-folded text that survives the substitutions which
                   # break the exact fullmatch patterns (EVAL.md noisy
                   # tier: docnum precision 0.41 came from corrupted lines
                   # collapsing to bias-only vectors)
                   "f_numsign", "f_ipp", "f_sex", "f_birth", "f_age",
                   "f_paddr", "f_patient", "f_medic", "f_dateline",
                   "f_mostly_upper",
                   # r5 CONTENT features (format-shift tier): label-intrinsic
                   # evidence that fires in family A (so training weights it)
                   # and survives a reshaped template — a date token, the age
                   # unit, a civility, a praticien title, a long digit run
                   "c_date_tok", "c_ans_tok", "c_title_tok", "c_dr_tok",
                   "c_digits_run",
                   # r5b format-transfer features: label-intrinsic shapes
                   # that SEPARATE the date-bearing and address-bearing
                   # labels without the family-A keyword — a dateline's
                   # date travels with an ALL-CAPS placename, a birthdate's
                   # does not, and a patient address carries a street
                   # keyword + number whatever the label prefix says
                   "c_date_place", "c_date_noplace", "c_street_tok",
                   # r6: the line's OWN doctype-keyword fold probe (closed
                   # reference vocabulary, lexicon.DOCTYPES) — family B's
                   # capitalize()d doctype is otherwise a bias-only vector
                   "c_doctype_kw",
                   # r6 NEIGHBOR-context features (VERDICT r5 item 1): the
                   # reference disambiguates docnum vs idno POSITIONALLY
                   # (docnum leads the header, idno rides with the patient
                   # block — HeaderMedicalParser.resultExtraction:1229-1349).
                   # Two bare 9-digit runs are indistinguishable line-local
                   # once a second grammar family drops the A keywords;
                   # their NEIGHBORS are not: docnum's next line is the
                   # doctype, idno's prev is a praticien line and its next
                   # the sex/patient block. Neighbor CONTENT probes (not
                   # absolute positions) survive family B's cyclic block
                   # rotation, which preserves all but one adjacency.
                   "n_prev_doctype", "n_next_doctype",
                   "n_prev_dr", "n_next_dr",
                   "n_prev_patientish", "n_next_patientish")
_HL = {b: i for i, b in enumerate(HEADER_LABELS)}
_HF = {f: i for i, f in enumerate(HEADER_FEATURES)}

HEADER_MODEL_PATH = _os.path.join(
    _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))),
    "models", "header_model.json")


#: folded '<n> ans' — digits without a confusion twin stay digits
_RE_AGE_F = re.compile(r"[0-9oizsb]{1,3} ons")

#: content probes on folded text (see HEADER_FEATURES c_* comment)
_RE_DATE_TOK_F = re.compile(
    r"(?<![0-9oizsb])[0-9oizsb]{1,2}/[0-9oizsb]{1,2}/[0-9oizsb]{2,4}"
    r"(?![0-9oizsb])")
_RE_DR_TOK_F = re.compile(r"\b(?:dr|doeteur|pr|protesseur)\b")
_RE_DIGITS_RUN_F = re.compile(r"[0-9oizsb]{6,}")
_RE_ANS_TOK_F = re.compile(r"\bons\b")
#: start literals anchoring the two probes above (textnorm.anchored_search
#: replaces the char-by-char scans with C find passes, r8)
_DR_LITS = ("dr", "doeteur", "pr", "protesseur")
_ANS_LITS = ("ons",)
_RE_DIGIT = re.compile(r"\d")
#: ALL-CAPS run of >= 2 letters on the RAW line (placenames: 'DIJON');
#: case survives OCR substitution classes, so raw is the right side
_RE_CAPS_RUN = re.compile(r"\b[A-ZÀ-ÖØ-Þ]{2,}\b")
#: caps-damage twin (r7): one OCR substitution inside an ALLCAPS word can
#: only produce the digits 0/1 (the images of O/I in the confusion table),
#: and it breaks the pure-caps run ('V1LLEJUIF'). A \b-token of caps and
#: 0/1 digits with >= 2 letters and >= 1 digit keeps the caps evidence;
#: no clean family-A/B header line carries such a token (pinned).
_RE_CAPS_DMG = re.compile(r"\b[A-ZÀ-ÖØ-Þ01]{4,}\b")


def _caps_run(t: str) -> bool:
    if _RE_CAPS_RUN.search(t):
        return True
    for m in _RE_CAPS_DMG.finditer(t):
        w = m.group()
        if any(c in "01" for c in w) \
                and sum(c.isalpha() for c in w) >= 2:
            return True
    return False
#: street keywords on the OCR fold (computed, not hand-folded)
_F_STREET_TOK = tuple(ocr_fold(w) for w in
                      ("avenue", "rue", "boulevard", "place", "chemin",
                       "allée", "impasse"))
#: civility folds DERIVED from the corpus civility lexicon (ADVICE r5:
#: hard-coded 'nonsieur'/'nodone' literals would silently miss any
#: civility added to the grammar later, reopening the
#: patient-vs-patient_address confusion c_street_tok exists to prevent)
from ..functions.lexicon import CIVILITIES as _CIVILITIES  # noqa: E402

_F_CIVILITY = tuple(ocr_fold(w) for w in _CIVILITIES)
_F_CIVILITY_PREFIX = tuple(c + " " for c in _F_CIVILITY)
#: transpose signatures (r7): an adjacent transpose inside a civility
#: ('Mdaame') defeats the fold; the signature (first + last fold char +
#: sorted interior — a transpose never touches either end) survives. Only
#: civilities long enough to BE transposable (len >= 5) are listed, and
#: the probes below try the signature only when the fold tier missed —
#: zero family-A/B tokens reach it (pinned), so clean vectors and the
#: committed weights are untouched.
_CIV_SIGS = frozenset(c[0] + "".join(sorted(c[1:-1])) + c[-1]
                      for c in _F_CIVILITY if len(c) >= 5)
#: spacing-damage tier (r7): corrupt_text's spacing mode inserts ONE
#: mid-token space and applies no other damage to that token, so the two
#: folded pieces joined equal the clean fold EXACTLY ('Mon sieur' ->
#: 'monsieur'). Equality against the civility-fold set is therefore the
#: tight check — tried only when the contiguous tiers missed; zero clean
#: family-A/B lines reach it (pinned in test_noise_eval).
_F_CIVILITY_SET = frozenset(_F_CIVILITY)


def _civ_sig_token(ft: str) -> bool:
    for w in ft.split(" "):
        if len(w) >= 5 and w[0] + "".join(sorted(w[1:-1])) + w[-1] \
                in _CIV_SIGS:
            return True
    return False


def _civ_split_token(ft: str) -> bool:
    ws = ft.split(" ")
    return any(a and b and a + b in _F_CIVILITY_SET
               for a, b in zip(ws, ws[1:]))


@lru_cache(maxsize=131072)
def _has_civility(ft: str) -> bool:
    # memoized (r8): header_line_features probes the SAME fold three times
    # per line (c_title_tok, the c_street_tok guard, _neighbor_probe), and
    # the split/sig tiers re-tokenize on every call — one cached result per
    # distinct fold serves all three probes (pure function of ft)
    return any(c in ft for c in _F_CIVILITY) or _civ_sig_token(ft) \
        or _civ_split_token(ft)


def _civility_prefix(ft: str) -> bool:
    if ft.startswith(_F_CIVILITY_PREFIX):
        return True
    w0 = ft.split(" ", 1)[0]
    if len(w0) >= 5 and \
            w0[0] + "".join(sorted(w0[1:-1])) + w0[-1] in _CIV_SIGS:
        return True
    ws = ft.split(" ", 2)
    return len(ws) >= 2 and ws[0] + ws[1] in _F_CIVILITY_SET


#: folded doctype phrases (closed reference vocabulary, lexicon.DOCTYPES) —
#: the fold is case-insensitive and OCR-damage-tolerant, so the probe fires
#: on family A's ALL-CAPS doctype, family B's capitalize()d form, and the
#: noise tier's substituted characters alike
from ..functions.lexicon import DOCTYPES as _DOCTYPES  # noqa: E402

_F_DOCTYPE = tuple(ocr_fold(w) for w in _DOCTYPES)

_PROBE_DOCTYPE, _PROBE_DR, _PROBE_PATIENTISH = 1, 2, 4


@lru_cache(maxsize=131072)
def _neighbor_probe(t: str) -> int:
    """Content bitmask of a header-zone line, read by its NEIGHBORS'
    feature vectors (n_prev_*/n_next_*). Cached per distinct line text —
    each line is folded once however many neighbors read it."""
    if not t:
        return 0
    ft = ocr_fold(t)
    bits = 0
    if any(d in ft for d in _F_DOCTYPE):
        bits |= _PROBE_DOCTYPE
    if anchored_search(ft, _DR_LITS, _RE_DR_TOK_F):
        bits |= _PROBE_DR
    if _has_civility(ft) or ft.startswith("sexe") or "ne(e)" in ft:
        bits |= _PROBE_PATIENTISH
    return bits


def header_line_features(t: str, largest: bool = False,
                         prev: str = "", nxt: str = "") -> list[int]:
    """``prev``/``nxt`` are the neighboring header-ZONE lines ('' at the
    zone boundary) — see the n_* feature comment."""
    f = [_HF["bias"]]
    pb, nb = _neighbor_probe(prev), _neighbor_probe(nxt)
    if pb & _PROBE_DOCTYPE:
        f.append(_HF["n_prev_doctype"])
    if nb & _PROBE_DOCTYPE:
        f.append(_HF["n_next_doctype"])
    if pb & _PROBE_DR:
        f.append(_HF["n_prev_dr"])
    if nb & _PROBE_DR:
        f.append(_HF["n_next_dr"])
    if pb & _PROBE_PATIENTISH:
        f.append(_HF["n_prev_patientish"])
    if nb & _PROBE_PATIENTISH:
        f.append(_HF["n_next_patientish"])
    if RE_DOCNUM.fullmatch(t):
        f.append(_HF["r_docnum"])
    if RE_DATELINE.fullmatch(t):
        f.append(_HF["r_dateline"])
    if RE_MEDIC_SPLIT.fullmatch(t) and RE_MEDIC_LINE.fullmatch(t):
        f.append(_HF["r_medic"])
    if RE_IDNO.fullmatch(t):
        f.append(_HF["r_idno"])
    if RE_SEX.fullmatch(t):
        f.append(_HF["r_sex"])
    if RE_PATIENT_NAME.fullmatch(t):
        f.append(_HF["r_patient"])
    if RE_BIRTH.fullmatch(t):
        f.append(_HF["r_birth"])
    if RE_AGE.fullmatch(t):
        f.append(_HF["r_age"])
    if RE_PADDR.fullmatch(t):
        f.append(_HF["r_paddr"])
    if RE_DOCTYPE.fullmatch(t):
        f.append(_HF["r_doctype"])
    if largest:
        f.append(_HF["largest_font"])
    # damage-tolerant evidence (folded keywords / raw robust chars) — 'N°'
    # and '@'/'/' are outside every OCR confusion class, folded keywords
    # match through in-class substitutions
    ft = ocr_fold(t)
    if t.startswith("N°"):
        f.append(_HF["f_numsign"])
    if ft.startswith("ipp"):
        f.append(_HF["f_ipp"])
    if ft.startswith("sexe"):
        f.append(_HF["f_sex"])
    if ft.startswith("ne(e) ie"):
        f.append(_HF["f_birth"])
    if _RE_AGE_F.fullmatch(ft):
        f.append(_HF["f_age"])
    if ft.startswith("deneuront"):
        f.append(_HF["f_paddr"])
    if _civility_prefix(ft):
        f.append(_HF["f_patient"])
    if ft.startswith(("dr ", "dr. ", "doeteur ", "pr ", "pr. ")) \
            and "," in t:
        f.append(_HF["f_medic"])
    if ", ie " in ft and "/" in t:
        f.append(_HF["f_dateline"])
    # filter/map: exact per-char predicates, C-level loop dispatch (r8)
    alpha = list(filter(str.isalpha, t))
    if len(alpha) >= 8 and sum(map(str.isupper, alpha)) >= 0.8 * len(alpha):
        f.append(_HF["f_mostly_upper"])
    has_digit = _RE_DIGIT.search(t) is not None
    # one DATE_TOK scan for both the c_date_tok and c_date_place/_noplace
    # features (the probe ran twice per line before r8)
    date_tok = has_digit and _RE_DATE_TOK_F.search(ft) is not None
    if date_tok:
        f.append(_HF["c_date_tok"])
    if anchored_search(ft, _ANS_LITS, _RE_ANS_TOK_F):
        f.append(_HF["c_ans_tok"])
    if _has_civility(ft):
        f.append(_HF["c_title_tok"])
    if anchored_search(ft, _DR_LITS, _RE_DR_TOK_F):
        f.append(_HF["c_dr_tok"])
    if has_digit and _RE_DIGITS_RUN_F.search(ft):
        f.append(_HF["c_digits_run"])
    if date_tok:
        if _caps_run(t):
            f.append(_HF["c_date_place"])
        else:
            f.append(_HF["c_date_noplace"])
    # street shape WITHOUT a civility token: family-A mixed patient lines
    # ('Madame X ... demeurant 609, Rue ...') also carry street keywords,
    # so the bare street fact cannot separate an address-only line from a
    # full patient line — the compound can, and it is label-intrinsic (a
    # patient_address line never names the patient, whatever the prefix)
    if has_digit and any(kw in ft for kw in _F_STREET_TOK) \
            and not _has_civility(ft):
        f.append(_HF["c_street_tok"])
    if any(d in ft for d in _F_DOCTYPE):
        f.append(_HF["c_doctype_kw"])
    return f


def label_header_line_rules(t: str, largest: bool = False) -> str:
    """Rule cascade label — first-match order, the A/B twin."""
    if RE_DOCNUM.fullmatch(t):
        return "docnum"
    if RE_DATELINE.fullmatch(t):
        return "dateline"
    if RE_MEDIC_SPLIT.fullmatch(t) and RE_MEDIC_LINE.fullmatch(t):
        return "medic"
    if RE_IDNO.fullmatch(t):
        return "idno"
    if RE_SEX.fullmatch(t):
        return "sex"
    if RE_PATIENT_NAME.fullmatch(t):
        return "patient"
    if RE_BIRTH.fullmatch(t):
        return "birthdate"
    if RE_AGE.fullmatch(t):
        return "age"
    if RE_PADDR.fullmatch(t):
        return "patient_address"
    if RE_DOCTYPE.fullmatch(t) or largest:
        return "doctype"
    return "note"


_HEADER_WL: list[list[float]] | None = None


def _header_weights() -> list[list[float]]:
    global _HEADER_WL
    if _HEADER_WL is None:
        from ..models import load_model
        m = load_model("header_model.json")      # zip-safe (--py-files)
        assert tuple(m["labels"]) == HEADER_LABELS \
            and tuple(m["features"]) == HEADER_FEATURES, \
            "header_model.json is stale — rerun tools/train_fields.py"
        _HEADER_WL = m["W"]
    return _HEADER_WL


@lru_cache(maxsize=131072)
def label_header_line_fitted(t: str, largest: bool = False,
                             prev: str = "", nxt: str = "") -> str:
    # pure in (t, largest, prev, nxt): the committed weights load once per
    # process (tests/test_packaging.py pins that) and header-zone lines
    # draw from a finite grammar that repeats heavily across documents
    WL = _header_weights()
    feats = header_line_features(t, largest, prev, nxt)
    best, arg = None, 0
    for j in range(len(HEADER_LABELS)):
        s = 0.0
        row = WL[j]
        for f in feats:
            s += row[f]
        if best is None or s > best:
            best, arg = s, j
    return HEADER_LABELS[arg]


def parse_header_zone(lines: list[str],
                      sizes: list[float] | None = None,
                      use_rules: bool = False) -> dict[str, Any]:
    """Header lines -> (header struct, medics, patients, datelines, person_names).

    ``sizes`` optionally carries per-line font sizes: a line whose font is
    the zone's largest (by >= 3 pt over the smallest) is the title/doctype
    even without the all-caps textual shape — the reference's font
    statistics over the header zone (A5, HeaderMedicalParser.java:434-467:
    largest-font block -> title candidate)."""
    h = dict(_EMPTY_HEADER)
    largest: set[int] = set()
    if sizes:
        mx, mn = max(sizes), min(sizes)
        if mx - mn >= 3.0:
            largest = {i for i, s in enumerate(sizes) if s == mx}
    medics: list[dict[str, Any]] = []
    patients: list[dict[str, Any]] = []
    datelines: list[dict[str, Any]] = []
    person_names: list[dict[str, Any]] = []
    medic_names: list[str] = []
    patient_names: list[str] = []
    cur_patient: dict[str, Any] | None = None

    def patient() -> dict[str, Any]:
        nonlocal cur_patient
        if cur_patient is None:
            cur_patient = {
                "idx": len(patients), "id": "", "idtype": "", "persname": "",
                "sex": "", "birthdate": "", "age": "", "birthplace": "",
                "deathdate": "", "address": "", "country": "", "town": "",
                "phone": "", "email": "", "note": ""}
            patients.append(cur_patient)
        return cur_patient

    from .subentity import tag_segments

    label_fn = label_header_line_rules if use_rules else label_header_line_fitted
    name_fn = parse_person_name if use_rules else parse_person_name_fitted
    # every field action below assumes its separator/regex is present; a
    # fitted-model mispredict on an out-of-distribution line must DEGRADE
    # to the 'note' action (like the rules cascade), not raise and fail the
    # whole doc row (ADVICE r2: IndexError/AttributeError -> S3 error)
    norm = [normalize_space(r) for r in lines]
    for li, t in enumerate(norm):
        if use_rules:
            lab = label_fn(t, li in largest)
        else:
            lab = label_fn(t, li in largest,
                           norm[li - 1] if li else "",
                           norm[li + 1] if li + 1 < len(norm) else "")
        if lab == "docnum" and "°" in t:
            h["docnum"] = merge_field(h["docnum"], t.split("°", 1)[1].strip())
            continue
        if lab == "dateline":
            # sub-entity cascade: dateline -> place/date/time (fitted token
            # tagger by default; regex-group twin under use_rules)
            if use_rules:
                m = RE_DATELINE.fullmatch(t)
                if m is None:
                    h["note"] = merge_field(h["note"], t)
                    continue
                place, date, time = m.group(1), m.group(2), m.group(3) or ""
            else:
                segs = tag_segments("dateline", t)
                place = segs.get("placename", "")
                date = segs.get("date", "")
                time = segs.get("time", "")
            h["dateline"] = merge_field(h["dateline"], t)
            iso = parse_date_iso(date) or ""
            if len(iso) > len(h["date_iso"]):        # keep-longest (A2)
                h["date_iso"] = iso
            if time and not h["time"]:                # keep-first (A2)
                h["time"] = time
            datelines.append({"idx": len(datelines), "doctype": "",
                              "placename": place, "date": date,
                              "time": time, "note": ""})
            continue
        if lab == "medic":
            if use_rules:
                m = RE_MEDIC_SPLIT.fullmatch(t)
                if m is None:
                    h["note"] = merge_field(h["note"], t)
                    continue
                pers, role = m.group(1), m.group(2)
            else:
                segs = tag_segments("medic", t)
                pers = segs.get("persname", "")
                role = segs.get("role", "")
            medic_names.append(pers)
            medics.append({"idx": len(medics), "idno": "", "role": role,
                           "persname": pers, "affiliation": "", "organisation": "",
                           "institution": "", "address": "", "country": "",
                           "town": "", "email": "", "phone": "", "fax": "",
                           "web": "", "note": ""})
            pn = name_fn(pers)
            person_names.append({"idx": len(person_names), **pn})
            continue
        if lab == "idno" and ":" in t:
            # idno/idtype through the patient token tagger (reference
            # PatientParser <idno>/<idType>, writeField :473-478)
            p = patient()
            if use_rules:
                p["id"] = merge_field(p["id"], t.split(":", 1)[1].strip())
                p["idtype"] = "IPP"
            else:
                segs = tag_segments("patient", t)
                p["id"] = merge_field(p["id"], segs.get("idno", ""))
                p["idtype"] = segs.get("idtype", "")
            continue
        if lab == "sex" and ":" in t:
            p = patient()
            if use_rules:
                p["sex"] = t.split(":", 1)[1].strip()
            else:
                p["sex"] = tag_segments("patient", t).get("sex", "")
            continue
        if lab == "patient":
            # sub-entity cascade: the patient TOKEN tagger separates
            # name / birthdate / birthplace / death / address / settlement
            # / country / phone / email / note when the line mixes them
            # (reference PatientParser.java:58-222, FULL writeField set
            # since r4); on a pure-name line every token tags persname and
            # the behavior is unchanged
            from .subentity import parse_patient_line
            seg = parse_patient_line(t, use_rules)
            pers = seg["persname"] or t
            p = patient()
            p["persname"] = merge_field(p["persname"], pers)
            if seg["birthdate"]:
                p["birthdate"] = seg["birthdate"]
            if seg["address"]:
                p["address"] = merge_field(p["address"], seg["address"])
            for src, dst in (("birthplace", "birthplace"),
                             ("death", "deathdate"),
                             ("settlement", "town"), ("country", "country"),
                             ("phone", "phone"), ("email", "email"),
                             ("note", "note")):
                if seg[src]:
                    p[dst] = seg[src]
            patient_names.append(pers)
            pn = name_fn(pers)
            person_names.append({"idx": len(person_names), **pn})
            continue
        if lab == "birthdate" and "le" in t:
            patient()["birthdate"] = t.split("le", 1)[1].strip()
            continue
        if lab == "age":
            patient()["age"] = t
            continue
        if lab == "patient_address" and ":" in t:
            p = patient()
            p["address"] = merge_field(p["address"], t.split(":", 1)[1].strip())
            continue
        if lab == "doctype":
            h["doctype"] = merge_field(h["doctype"], t)
            h["title"] = h["doctype"]
            continue
        h["note"] = merge_field(h["note"], t)   # unrecognized -> note

    h["medics"] = medic_names
    h["patients"] = patient_names
    return {"header": h, "medics": medics, "patients": patients,
            "datelines": datelines, "person_names": person_names}
