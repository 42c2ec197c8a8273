"""Left-note (hospital letterhead) field extraction.

Re-expresses the reference's `left-note-medical-report` model
(LeftNoteMedicalParser.java:75-173, resultExtraction:981-... and the
organization cascade OrganizationParser.java:58-...): org hierarchy lines,
postal address, phone/fax, settlement. Merge semantics follow the reference's
space-joined affiliation style (see fixture processLeftNoteFromPDF.xml.xml:
"Pôle Femmes -Adolescents ... SERVICE DE GYNECOLOGIE...").
"""

from __future__ import annotations

from functools import lru_cache

import re as _re
from typing import Any

from ..functions.textnorm import normalize_space, ocr_fold
from .segmenter import (RE_ADDR_MORE, RE_CONTACT, RE_EMAIL, RE_FAX,
                        RE_ORG_INST, RE_POLE, RE_POSTCODE, RE_SERVICE,
                        RE_STAFF_NAME, RE_STAFF_ORG_PHONE, RE_STAFF_ROLE,
                        RE_STAFF_ROLE_NAME, RE_STREET, RE_TEL, RE_WEB)

_EMPTY: dict[str, Any] = {
    "idno": "", "org": "", "address": "", "country": "", "settlement": "",
    "phone": "", "fax": "", "email": "", "web": "", "note": ""}

# Staff-block parsing (reference fixture processLeftNoteFromPDF.xml.xml:
# "Chef de Service : Pr. A. Gautier ...", "Secrétariat : 01 41 12 34 56")
# — the left-note medics cascade (LeftNoteMedicalItem.medics +
# MedicParser/OrganizationParser over the org block). Each staff line
# becomes one encoded entry "field=value|field=value" in ``medics``
# (array<string> per FIXTURES.md); the TEI renderer turns entries back
# into the fixture's mixed content.


# --------------------------------------------------------------------------
# left-note line-field model (the reference's left-note-medical-report is a
# trained CRF): fitted multiclass weights over the letterhead patterns
# (tools/train_fields.py), rules kept as the A/B twin; shared field actions.
# --------------------------------------------------------------------------

import json as _json
import os as _os

LEFTNOTE_LABELS = ("org", "phone", "fax", "staff_org_phone",
                   "staff_role_name", "staff_name", "staff_role",
                   "address_pc", "address_street", "address_more",
                   "contact", "web", "email", "note")
LEFTNOTE_FEATURES = ("bias", "r_pole", "r_service", "r_tel", "r_fax",
                     "r_staff_org_phone", "r_staff_role_name",
                     "r_staff_name", "r_staff_role", "r_postcode",
                     "r_street", "r_org_inst", "r_addr_more", "r_contact",
                     "r_web", "r_email",
                     # r5 damage-tolerant twins on OCR-folded text — the
                     # noisy tier's web 0.29 F1 came from corrupted lines
                     # collapsing to bias-only vectors, which the model
                     # dumped into low-support labels
                     "f_org_kw", "f_tel", "f_fax", "f_contact", "f_web",
                     "f_email", "f_street", "f_postcode", "f_addr_more",
                     "f_staff_kw")
_LL = {b: i for i, b in enumerate(LEFTNOTE_LABELS)}
_LF = {f: i for i, f in enumerate(LEFTNOTE_FEATURES)}

LEFTNOTE_MODEL_PATH = _os.path.join(
    _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))),
    "models", "leftnote_model.json")

_RX_FEATS = (
    (RE_POLE, "r_pole"), (RE_SERVICE, "r_service"), (RE_TEL, "r_tel"),
    (RE_FAX, "r_fax"), (RE_STAFF_ORG_PHONE, "r_staff_org_phone"),
    (RE_STAFF_ROLE_NAME, "r_staff_role_name"),
    (RE_STAFF_NAME, "r_staff_name"), (RE_STAFF_ROLE, "r_staff_role"),
    (RE_POSTCODE, "r_postcode"), (RE_STREET, "r_street"),
    (RE_ORG_INST, "r_org_inst"), (RE_ADDR_MORE, "r_addr_more"),
    (RE_CONTACT, "r_contact"), (RE_WEB, "r_web"), (RE_EMAIL, "r_email"),
)


#: folded keyword probes (see textnorm.ocr_fold): each literal is the fold
#: of the clean keyword, so it matches clean AND substitution-damaged text
_F_ORG_KW = ("ehu", "ghu", "dnu", "poie ", "seruiee", "hopitoi",
             "uniuersite", "institut", "eentre", "site ", "unite",
             "deportenent", "ossoeiotion")
_F_ADDR_KW = ("botinent", "inneubie", "bp ", "quortier", "eonnune")
_F_STAFF_KW = ("kinesitheropeute", "soge-tenne", "intirniere",
               "seeretoriot")
#: comma optional and an optional folded 'F-' postal prefix ('f'->'t'):
#: the same street/postcode CONTENT through either family's separators.
#: The comma-free form demands at least one REAL digit — fold maps b/o/i
#: etc. to themselves, so a space-split word head like 'Bâ ' ('bo ') is
#: all confusion-class letters and must not read as a street number.
_RE_STREET_F = _re.compile(r"^(?:[0-9oizsb]{1,4}, "
                           r"|(?=[oizsb]{0,3}[0-9])[0-9oizsb]{1,4} )")
#: comma-free street number on the RAW line: a true leading digit run is
#: certain evidence (digits in raw text are not fold artifacts), and the
#: fold probe's true-digit lookahead misses numbers whose digits ALL have
#: confusion twins ('810' folds to 'bio', '12' to 'iz' — family B's
#: comma-dropped street lines fell to bias-only vectors, the last
#: leftnote format-shift residual). Zero family-A lines match (A streets
#: carry the comma; postcodes are 5 digits), so A vectors are unchanged
#: and the committed weights stand without retraining.
_RE_STREET_RAW = _re.compile(r"^\d{1,4} ")
_RE_POSTCODE_F = _re.compile(r"^(?:t-)?[0-9oizsb]{5} ")


def _kw_rx(probes: tuple[str, ...]) -> "_re.Pattern":
    """Damage-tolerant keyword matcher, applied to the SPACE-STRIPPED fold:
    accepts each long probe (>= 5 chars — short ones stay exact to keep
    their word-boundary conventions) or any single adjacent-transposition
    variant of it. fold(transpose(x)) == transpose(fold(x)) (fold is
    char-wise), so folding first and transposing the probes covers raw-text
    transposition damage ('Hôpiatl', 'Asscoiation'), while space-stripping
    covers insertion splits ('SE RVICE', 'Uni versité') — the two noisy-
    tier failure modes that dumped org letterhead lines into staff_name."""
    vs = set()
    for p in probes:
        p = p.strip()
        if len(p) < 5:
            continue
        vs.add(p)
        for i in range(len(p) - 1):
            if p[i] != p[i + 1]:
                vs.add(p[:i] + p[i + 1] + p[i] + p[i + 2:])
    alt = "|".join(_re.escape(v) for v in sorted(vs, key=len, reverse=True))
    return _re.compile(rf"^(?:{alt})")


_F_ORG_KW_RX = _kw_rx(_F_ORG_KW)
_F_ADDR_KW_RX = _kw_rx(_F_ADDR_KW)
_F_STAFF_KW_RX = _kw_rx(_F_STAFF_KW)


def leftnote_line_features(t: str) -> list[int]:
    f = [_LF["bias"]]
    for rx, name in _RX_FEATS:
        if rx.fullmatch(t):
            f.append(_LF[name])
    ft = ocr_fold(t)
    ds = ft.replace(" ", "")
    if ft.startswith(_F_ORG_KW) or _F_ORG_KW_RX.match(ds):
        f.append(_LF["f_org_kw"])
    # 'Téléphone' folds to 'teiephone' but 'Télécopie' folds to 'teieeopie'
    # — both start 'tei', so the fax probe must win that prefix
    if ft.startswith("tei") and not ft.startswith("teieeopie"):
        f.append(_LF["f_tel"])
    if ft.startswith(("tox", "teieeopie")):
        f.append(_LF["f_fax"])
    if ft.startswith("tei") and (" - tox" in ft or "teieeopie" in ft[3:]):
        f.append(_LF["f_contact"])
    if "www" in ft or "http" in ft or ft.endswith((".tr", ".eon", ".net")):
        f.append(_LF["f_web"])
    if "@" in t:                      # '@' has no confusion twin
        f.append(_LF["f_email"])
    if _RE_STREET_F.match(ft) or _RE_STREET_RAW.match(t):
        f.append(_LF["f_street"])
    if _RE_POSTCODE_F.match(ft):
        f.append(_LF["f_postcode"])
    if ft.startswith(_F_ADDR_KW) or _F_ADDR_KW_RX.match(ds):
        f.append(_LF["f_addr_more"])
    if ft.startswith(_F_STAFF_KW) or _F_STAFF_KW_RX.match(ds):
        f.append(_LF["f_staff_kw"])
    return f


def label_leftnote_line_rules(t: str) -> str:
    """First-match cascade label — the A/B twin."""
    if RE_POLE.fullmatch(t) or RE_SERVICE.fullmatch(t) \
            or RE_ORG_INST.fullmatch(t):
        return "org"
    if RE_CONTACT.fullmatch(t):     # before phone: RE_TEL also matches
        return "contact"
    if RE_TEL.fullmatch(t):
        return "phone"
    if RE_FAX.fullmatch(t):
        return "fax"
    if RE_ADDR_MORE.fullmatch(t):
        return "address_more"
    if RE_WEB.fullmatch(t):
        return "web"
    if RE_EMAIL.fullmatch(t):
        return "email"
    if RE_STAFF_ORG_PHONE.fullmatch(t):
        return "staff_org_phone"
    if RE_STAFF_ROLE_NAME.fullmatch(t):
        return "staff_role_name"
    if RE_STAFF_NAME.fullmatch(t):
        return "staff_name"
    if RE_STAFF_ROLE.fullmatch(t):
        return "staff_role"
    if RE_POSTCODE.fullmatch(t):
        return "address_pc"
    if RE_STREET.fullmatch(t):
        return "address_street"
    return "note"


_LN_WL: list[list[float]] | None = None


def _leftnote_weights() -> list[list[float]]:
    global _LN_WL
    if _LN_WL is None:
        from ..models import load_model
        m = load_model("leftnote_model.json")    # zip-safe (--py-files)
        assert tuple(m["labels"]) == LEFTNOTE_LABELS \
            and tuple(m["features"]) == LEFTNOTE_FEATURES, \
            "leftnote_model.json is stale — rerun tools/train_fields.py"
        _LN_WL = m["W"]
    return _LN_WL


@lru_cache(maxsize=131072)
def label_leftnote_line_fitted(t: str) -> str:
    # pure in t: weights load once per process; letterhead lines draw from
    # the finite institution grammar and repeat across documents
    WL = _leftnote_weights()
    feats = leftnote_line_features(t)
    best, arg = None, 0
    for j in range(len(LEFTNOTE_LABELS)):
        s = 0.0
        row = WL[j]
        for f in feats:
            s += row[f]
        if best is None or s > best:
            best, arg = s, j
    return LEFTNOTE_LABELS[arg]


def parse_leftnote_zone(lines: list[str],
                        use_rules: bool = False) -> dict[str, Any]:
    ln = dict(_EMPTY)
    ln["medics"] = []
    label_fn = (label_leftnote_line_rules if use_rules
                else label_leftnote_line_fitted)
    # a fitted mispredict must degrade to the 'note' action, never raise on
    # a missing separator/regex group (ADVICE r2) — mirror header.py
    for raw in lines:
        t = normalize_space(raw)
        lab = label_fn(t)
        if lab in ("phone", "fax", "staff_org_phone", "staff_role_name",
                   "staff_name"):
            m = None
            if lab in ("phone", "fax"):
                if ":" not in t:
                    lab = "note"
            elif lab == "staff_org_phone":
                m = RE_STAFF_ORG_PHONE.fullmatch(t)
            elif lab == "staff_role_name":
                m = RE_STAFF_ROLE_NAME.fullmatch(t)
            else:
                m = RE_STAFF_NAME.fullmatch(t)
            if lab.startswith("staff") and m is None:
                lab = "note"
        if lab == "contact" and ":" not in t:
            lab = "note"               # fitted-mispredict degradation
        if lab == "org":
            ln["org"] = (ln["org"] + " " + t).strip()
        elif lab == "phone":           # "Tél : 01 ..." is the org's own line
            ln["phone"] = t.split(":", 1)[1].strip()
        elif lab == "fax":
            ln["fax"] = t.split(":", 1)[1].strip()
        elif lab == "contact":
            # mixed "Tél : A - Fax : B [ (note)]" line -> the organization
            # token tagger decomposes it (reference OrganizationParser
            # <phone>/<fax>/<note>)
            from .subentity import parse_org_fields
            segs = parse_org_fields(t, use_rules)
            if segs.get("phone"):
                ln["phone"] = segs["phone"]
            if segs.get("fax"):
                ln["fax"] = segs["fax"]
            if segs.get("note"):
                ln["note"] = (ln["note"] + " " + segs["note"]).strip()
        elif lab == "web":
            from .subentity import parse_org_fields
            ln["web"] = parse_org_fields(t, use_rules).get("web", t)
        elif lab == "email":
            from .subentity import parse_org_fields
            ln["email"] = parse_org_fields(t, use_rules).get("email", t)
        elif lab == "address_more":
            ln["address"] = (ln["address"] + " " + t).strip()
        elif lab == "staff_org_phone":
            ln["medics"].append(f"orgName={m.group(1)}|phone={m.group(2)}")
        elif lab == "staff_role_name":
            ln["medics"].append(f"roleName={m.group(1)}|persName={m.group(2)}")
        elif lab == "staff_name":
            ln["medics"].append(f"persName={m.group(1)}")
        elif lab == "staff_role":
            ln["medics"].append(f"roleName={t}")
        elif lab == "address_pc":
            ln["address"] = (ln["address"] + " " + t).strip()
            city = t[6:]
            if city.endswith(" Cedex"):
                city = city[: -len(" Cedex")]
            ln["settlement"] = city
            ln["country"] = "France"
        elif lab == "address_street":
            ln["address"] = (ln["address"] + " " + t).strip()
            # a COMBINED address line ("17, Avenue ..., 22000 CITY Cedex")
            # embeds the settlement — only the address token tagger
            # (reference AddressParser.java:57-...) can recover it; a pure
            # street line yields no city segment and nothing changes
            from .subentity import parse_address_fields
            city = parse_address_fields(t, use_rules).get("city", "")
            if city:
                if city.endswith(" Cedex"):
                    city = city[: -len(" Cedex")]
                ln["settlement"] = city
                ln["country"] = "France"
        else:
            ln["note"] = (ln["note"] + " " + t).strip()
    return ln
