"""Fitted sub-entity token taggers: all SIX reference child models —
dateline, medic, person-name, patient, address, organization.

The reference's child models are trained CRFs over short strings routed by
the cascade (DatelineParser.java:104-199, MedicParser.java:57-233,
PersonNameParser.java:56-..., PatientParser.java:58-222,
AddressParser.java:57-..., OrganizationParser.java:58-...). Here each is a
token-level multiclass perceptron over shape/position/context features
(tools/train_subentity.py, zero train errors, committed as
models/subentity_models.json); consecutive same-field tokens merge into
segments. Regex-group splitters remain as the A/B twins — both paths feed
the same field actions in operators/header.py / leftnote.py, and equality
is pinned on the golden corpora and the reference fixtures
(tests/test_fitted_subentity.py).

The patient tagger is LOAD-BEARING: ~35% of corpus docs carry a mixed
patient line ("Madame X Y Z, né(e) le 12/03/1985, demeurant : 5, rue ...")
whose name/birthdate/address can only be separated token-level — a
line-granularity field model cannot split it (the reason the reference has
FeaturesVectorPatient.java:164-427). Likewise the address tagger recovers
the settlement from combined address lines, and the organization tagger
decomposes the letterhead org string into pole/service.
"""

from __future__ import annotations

import json
import os
import re

SUB_FEATURES = ("bias", "idx0", "idx1", "last", "title_lex", "post_comma",
                "endcomma", "allcaps", "titlecase", "date_shape",
                "time_shape", "has_digit", "is_le", "is_a",
                # patient / address / organization context features (the
                # FeaturesVectorPatient/Address/Organization analogs:
                # keyword lexicons + prefix-context flags + number shapes)
                "is_ne", "is_demeurant", "is_colon", "after_ne",
                "after_demeurant", "after_colon", "is_ans", "five_digit",
                "street_kw", "after_streetkw", "after_postcode", "is_cedex",
                "is_dash", "is_pole_kw", "is_service_kw", "after_polekw",
                "after_servicekw", "next_service_kw")
_SF = {f: i for i, f in enumerate(SUB_FEATURES)}

SUB_LABELS = {
    "dateline": ("O", "placename", "date", "time"),
    "medic": ("O", "persname", "role"),
    "name-person-medical": ("O", "title", "forename", "middlename",
                            "surname"),
    # reference label subsets that this corpus grammar exercises
    # (PatientParser: idno/persname/birthdate/age/address of the full
    # 15-label set; AddressParser: streetnumber/streetname/postcode/city;
    # OrganizationParser: pole/service of the org hierarchy)
    "patient": ("O", "id", "persname", "birthdate", "age", "address"),
    "address": ("O", "streetnumber", "streetname", "postcode", "city"),
    "organization": ("O", "pole", "service"),
}

SUB_MODEL_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "models", "subentity_models.json")

_TITLES = {"Dr", "Dr.", "Docteur", "Pr", "Pr.", "Professeur", "Madame",
           "Monsieur", "Mme", "M."}
RE_DATE_SHAPE = re.compile(r"\d{1,2}/\d{1,2}(/\d{2,4})?,?")
RE_TIME_SHAPE = re.compile(r"\d{1,2}h\d{2},?")

_STREET_KW = {"Avenue", "Rue", "Boulevard", "Allée", "Place", "Impasse",
              "avenue", "rue", "boulevard", "allée", "place", "impasse"}
_NE_FORMS = {"né(e)", "née", "né"}


def tokens_of(text: str) -> list[tuple[int, str]]:
    """(char_start, token) for whitespace tokens — the reference sub-model
    corpora tokenize the same way (training.py:_seg_token_rows)."""
    out = []
    pos = 0
    for tok in text.split(" "):
        if tok:
            out.append((pos, tok))
        pos += len(tok) + 1
    return out


def token_features(toks: list[tuple[int, str]]) -> list[list[int]]:
    n = len(toks)
    rows = []
    post_comma = False
    # prefix-context flags: set once the trigger token has been SEEN —
    # the per-token analog of the reference featurizers' block context
    # (FeaturesVectorPatient/Address/Organization carry lexicon + relative-
    # position features; a pure per-token shape can't tell 'DUPONT' the
    # surname from 'DIJON' the city, the prefix context can)
    after_ne = after_dem = after_colon = False
    after_streetkw = after_postcode = False
    after_polekw = after_servicekw = False
    for i, (_s, tok) in enumerate(toks):
        f = [_SF["bias"]]
        if i == 0:
            f.append(_SF["idx0"])
        if i == 1:
            f.append(_SF["idx1"])
        if i == n - 1:
            f.append(_SF["last"])
        if tok.rstrip(",") in _TITLES:
            f.append(_SF["title_lex"])
        if post_comma:
            f.append(_SF["post_comma"])
        if tok.endswith(","):
            f.append(_SF["endcomma"])
            post_comma = True
        core = tok.rstrip(",.")
        if core.isupper() and core.isalpha():
            f.append(_SF["allcaps"])
        elif core[:1].isupper() and core[1:].islower():
            f.append(_SF["titlecase"])
        if RE_DATE_SHAPE.fullmatch(tok):
            f.append(_SF["date_shape"])
        if RE_TIME_SHAPE.fullmatch(tok):
            f.append(_SF["time_shape"])
        if any(c.isdigit() for c in tok):
            f.append(_SF["has_digit"])
        if tok == "le":
            f.append(_SF["is_le"])
        if tok == "à":
            f.append(_SF["is_a"])
        low = core.lower()
        if low in _NE_FORMS:
            f.append(_SF["is_ne"])
        if low == "demeurant":
            f.append(_SF["is_demeurant"])
        if tok == ":":
            f.append(_SF["is_colon"])
        if low == "ans":
            f.append(_SF["is_ans"])
        if re.fullmatch(r"\d{5}", core):
            f.append(_SF["five_digit"])
        if tok in _STREET_KW:
            f.append(_SF["street_kw"])
        if core == "Cedex":
            f.append(_SF["is_cedex"])
        if tok == "-":
            f.append(_SF["is_dash"])
        if core == "Pôle":
            f.append(_SF["is_pole_kw"])
        if core == "SERVICE":
            f.append(_SF["is_service_kw"])
        if after_ne:
            f.append(_SF["after_ne"])
        if after_dem:
            f.append(_SF["after_demeurant"])
        if after_colon:
            f.append(_SF["after_colon"])
        if after_streetkw:
            f.append(_SF["after_streetkw"])
        if after_postcode:
            f.append(_SF["after_postcode"])
        if after_polekw:
            f.append(_SF["after_polekw"])
        if after_servicekw:
            f.append(_SF["after_servicekw"])
        if i + 1 < n and toks[i + 1][1].rstrip(",") == "SERVICE":
            f.append(_SF["next_service_kw"])
        rows.append(f)
        # update prefix context AFTER emitting the current token's row
        if low in _NE_FORMS:
            after_ne = True
        if low == "demeurant":
            after_dem = True
        if tok == ":":
            after_colon = True
        if tok in _STREET_KW:
            after_streetkw = True
        if re.fullmatch(r"\d{5}", core):
            after_postcode = True
        if core == "Pôle":
            after_polekw = True
        if core == "SERVICE":
            after_servicekw = True
    return rows


_W: dict[str, list[list[float]]] | None = None


def _weights() -> dict[str, list[list[float]]]:
    global _W
    if _W is None:
        from ..models import load_model
        m = load_model("subentity_models.json")  # zip-safe (--py-files)
        for name, labels in SUB_LABELS.items():
            assert tuple(m[name]["labels"]) == labels \
                and tuple(m[name]["features"]) == SUB_FEATURES, \
                f"subentity_models.json[{name}] stale — rerun " \
                "tools/train_subentity.py"
        _W = {name: m[name]["W"] for name in SUB_LABELS}
        # the memo below is keyed on (model, text) only: any (re)load of
        # the weights invalidates it, so an in-process retrain + reload
        # (tools/train_subentity.py then evaluation) can't serve tags from
        # the previous model (ADVICE r3)
        _tag_segments_cached.cache_clear()
    return _W


def invalidate_model_cache() -> None:
    """Force the next tag to reload models/subentity_models.json (call
    after retraining in-process)."""
    global _W
    _W = None
    _tag_segments_cached.cache_clear()


def tag_segments(model: str, text: str,
                 W: list[list[float]] | None = None) -> dict[str, str]:
    """field -> surface text. Consecutive same-field tokens merge; a field's
    surface is the ORIGINAL char span (commas between its tokens kept,
    trailing separator comma stripped — the regex twins' group semantics).

    Memoized per worker for the committed weights (the hot path runs this
    6-9x per doc and letterhead/medic surfaces repeat heavily at scale);
    CALLERS MUST NOT MUTATE the returned dict."""
    if W is None:
        return _tag_segments_cached(model, text)
    return _tag_segments(model, text, W)


from functools import lru_cache as _lru_cache  # noqa: E402


@_lru_cache(maxsize=65536)
def _tag_segments_cached(model: str, text: str) -> dict[str, str]:
    return _tag_segments(model, text, None)


def _tag_segments(model: str, text: str,
                  W: list[list[float]] | None) -> dict[str, str]:
    toks = tokens_of(text)
    if not toks:
        return {}
    labels = SUB_LABELS[model]
    WL = W if W is not None else _weights()[model]
    feats = token_features(toks)
    tags = []
    for f in feats:
        best, arg = None, 0
        for j in range(len(labels)):
            s = 0.0
            row = WL[j]
            for k in f:
                s += row[k]
            if best is None or s > best:
                best, arg = s, j
        tags.append(labels[arg])
    out: dict[str, str] = {}
    i, n = 0, len(toks)
    while i < n:
        lab = tags[i]
        j = i + 1
        while j < n and tags[j] == lab:
            j += 1
        if lab != "O" and lab not in out:
            s0 = toks[i][0]
            s1 = toks[j - 1][0] + len(toks[j - 1][1])
            seg = text[s0:s1]
            if seg.endswith(","):          # trailing separator comma
                seg = seg[:-1]
            out[lab] = seg
        i = j
    return out


# --------------------------------------------------------------------------
# parse helpers: fitted tagger by default, regex-group A/B twin under
# use_rules — the same split the reference's resultExtraction methods do
# after the CRF labels come back (PatientParser.java:129-222,
# AddressParser / OrganizationParser resultExtraction)
# --------------------------------------------------------------------------

RE_PATIENT_MIXED = re.compile(
    r"^((?:Madame|Monsieur) .+?), né\(e\) le (\d{1,2}/\d{1,2}/\d{2,4}), "
    r"demeurant ?: (.+)$")
RE_ADDR_FULL = re.compile(r"^(\d+), (.+?),? (\d{5}) (.+)$")
RE_ADDR_STREET = re.compile(r"^(\d+), (.+)$")
RE_ADDR_PC = re.compile(r"^(\d{5}) (.+)$")


def parse_patient_line(t: str, use_rules: bool = False) -> dict[str, str]:
    """One 'patient'-labeled header line -> persname / birthdate / address.
    Handles BOTH the pure-name shape ('Madame X Y Z') and the mixed shape
    ('Madame X Y Z, né(e) le d/m/y, demeurant : addr')."""
    if use_rules:
        m = RE_PATIENT_MIXED.fullmatch(t)
        if m:
            return {"persname": m.group(1), "birthdate": m.group(2),
                    "address": m.group(3)}
        return {"persname": t, "birthdate": "", "address": ""}
    segs = tag_segments("patient", t)
    return {"persname": segs.get("persname", t if not segs else ""),
            "birthdate": segs.get("birthdate", ""),
            "address": segs.get("address", "")}


def parse_address_fields(t: str, use_rules: bool = False) -> dict[str, str]:
    """An address string (street line, postcode line, or a combined full
    address) -> streetnumber / streetname / postcode / city segments."""
    if use_rules:
        m = RE_ADDR_FULL.fullmatch(t)
        if m:
            return {"streetnumber": m.group(1), "streetname": m.group(2),
                    "postcode": m.group(3), "city": m.group(4)}
        m = RE_ADDR_PC.fullmatch(t)
        if m:
            return {"postcode": m.group(1), "city": m.group(2)}
        m = RE_ADDR_STREET.fullmatch(t)
        if m:
            return {"streetnumber": m.group(1), "streetname": m.group(2)}
        return {}
    return tag_segments("address", t)


def parse_org_fields(t: str, use_rules: bool = False) -> dict[str, str]:
    """A letterhead organization string -> pole / service segments
    ('Pôle Femmes - Mères - Enfants - SERVICE DE GYNECOLOGIE' must split at
    the LAST dash, which only sequence context can decide)."""
    if use_rules:
        i = t.find("SERVICE")
        if i > 0:
            return {"pole": t[:i].rstrip(" -"), "service": t[i:]}
        if i == 0:
            return {"service": t}
        return {"pole": t} if t else {}
    return tag_segments("organization", t)
