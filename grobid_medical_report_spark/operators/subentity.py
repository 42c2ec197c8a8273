"""Fitted sub-entity token taggers: all SIX reference child models —
dateline, medic, person-name, patient, address, organization.

The reference's child models are trained CRFs over short strings routed by
the cascade (DatelineParser.java:104-199, MedicParser.java:57-233,
PersonNameParser.java:56-..., PatientParser.java:58-222,
AddressParser.java:57-..., OrganizationParser.java:58-...). Here each is a
token-level multiclass perceptron over shape/position/context features
(tools/train_subentity.py, zero train errors, committed as
models/subentity_models.json); consecutive same-field tokens merge into
segments. Deterministic keyword scanners remain as the A/B twins — both
paths feed the same field actions in operators/header.py / leftnote.py,
and equality is pinned on the golden corpora and the reference fixtures
(tests/test_fitted_subentity.py).

Since r4 the patient / address / organization label sets are the
reference's FULL writeField vocabularies (VERDICT r3 "Next round" item 1):

* patient — 15 labels incl. idno/idtype/sex/birthplace/death/settlement/
  country/phone/email/note (PatientParser.java:473-514);
* address — 15 labels incl. pobox/country/region/district/community/
  buildingname/buildingnumber/departmentname/departmentnumber/note
  (AddressParser.java writeField set);
* organization — 22 labels incl. chu/ghu/dmu/hospital/university/
  institution/center/site/unit/department/organization/address/
  settlement/country/phone/fax/email/web/note
  (OrganizationParser.java writeField set).

The feature machinery adds a LAST-KEYWORD CONTEXT: a categorical state
that switches at each keyword token ("CHU", "Hôpital", "demeurant",
"Tél", "BP", ...) — the per-token analog of the reference featurizers'
block/position context. Sticky prefix flags from r3 are retained for the
already-fitted models.

The patient tagger is LOAD-BEARING: ~35% of corpus docs carry a mixed
patient line ("Madame X Y Z, né(e) le 12/03/1985 à DIJON, demeurant :
5, rue ... , Tél : ...") whose fields can only be separated token-level —
a line-granularity field model cannot split it (the reason the reference
has FeaturesVectorPatient.java:164-427). Likewise the organization tagger
decomposes the full letterhead block (institution lines + pole/service)
and the address tagger the joined postal block.
"""

from __future__ import annotations

import re

SUB_FEATURES = (
    "bias", "idx0", "idx1", "last", "title_lex", "post_comma",
    "endcomma", "allcaps", "titlecase", "date_shape",
    "time_shape", "has_digit", "is_le", "is_a",
    # r3 patient / address / organization context features (the
    # FeaturesVectorPatient/Address/Organization analogs: keyword lexicons
    # + sticky prefix flags + number shapes)
    "is_ne", "is_demeurant", "is_colon", "after_ne",
    "after_demeurant", "after_colon", "is_ans", "five_digit",
    "street_kw", "after_streetkw", "after_postcode", "is_cedex",
    "is_dash", "is_pole_kw", "is_service_kw", "after_polekw",
    "after_servicekw", "next_service_kw",
    # r4 token-shape features for the full reference vocabularies
    "is_france", "paren_digit", "next_paren_digit", "paren_open",
    "single_upper", "short_upper", "pure_digit", "has_at", "has_www",
    "seg_post_comma",
    # r4 keyword self flags
    "kw_chu", "kw_ghu", "kw_dmu", "kw_hosp", "kw_univ", "kw_inst",
    "kw_center", "kw_site", "kw_unit", "kw_odept", "kw_assoc",
    "kw_tel", "kw_fax", "kw_courriel", "kw_sexe", "kw_building",
    "kw_bp", "kw_quartier", "kw_commune", "kw_decede", "kw_ipp",
    # r4 last-keyword categorical context (resets at each keyword)
    "ctx_chu", "ctx_ghu", "ctx_dmu", "ctx_hosp", "ctx_univ", "ctx_inst",
    "ctx_center", "ctx_site", "ctx_unit", "ctx_odept", "ctx_assoc",
    "ctx_tel", "ctx_fax", "ctx_courriel", "ctx_sexe", "ctx_building",
    "ctx_bp", "ctx_quartier", "ctx_commune", "ctx_decede", "ctx_ipp",
    "ctx_birth", "ctx_birthplace", "ctx_addr", "ctx_addrplace",
    "ctx_dept", "ctx_region", "ctx_pc", "ctx_paren",
    # r5: gazetteer membership via OCR fold — city tokens keep their
    # identity through character damage (birthplace/settlement recall)
    "city_lex",
    # r6 (VERDICT r5 items 6+7): digit-LENGTH classes — an age ('47'), a
    # street number ('609,'), and a patient id ('443217716') are all
    # has_digit/pure_digit, which is exactly the confusion the family-B
    # tier exposed once its label keywords went out-of-vocabulary; the
    # length class is label-intrinsic and fires in family A. Plus a
    # sticky after-separator flag (standalone '-'/'/'/'•' seen — fires in
    # A on the contact dash) and a next-is-long-digit-run lookahead (the
    # structural cue that a type phrase precedes its id).
    "d_len12", "d_len34", "d_len6p", "after_sep", "next_digitrun",
    # r6: a label-prefix word is followed by ':' (A template invariant) —
    # a type phrase before an id run is not; without this the two twin
    # families assert opposite tags on identical feature vectors
    "next_colon",
    # r6: LINE-level long-digit-run presence (emitted on every token of a
    # line containing a >=6-digit run — A's idno lines and nothing else in
    # the patient line space): the type-phrase tokens of an id line are
    # otherwise indistinguishable from a renamed field prefix two tokens
    # before its value ('Date de naissance :' vs 'Identifiant patient N')
    "line_digitrun",
)
_SF = {f: i for i, f in enumerate(SUB_FEATURES)}

SUB_LABELS = {
    "dateline": ("O", "placename", "date", "time"),
    "medic": ("O", "persname", "role"),
    "name-person-medical": ("O", "title", "forename", "middlename",
                            "surname"),
    # FULL reference label vocabularies (r4): PatientParser.java:473-514,
    # AddressParser.java / OrganizationParser.java writeField sets ("O" =
    # the reference's <other>)
    "patient": ("O", "idno", "idtype", "sex", "persname", "birthdate",
                "birthplace", "age", "death", "address", "country",
                "settlement", "phone", "email", "note"),
    "address": ("O", "streetnumber", "streetname", "buildingname",
                "buildingnumber", "city", "community", "country",
                "departmentname", "departmentnumber", "district", "note",
                "pobox", "postcode", "region"),
    "organization": ("O", "address", "center", "chu", "country",
                     "department", "dmu", "email", "fax", "ghu",
                     "hospital", "institution", "note", "organization",
                     "phone", "pole", "service", "settlement", "site",
                     "university", "unit", "web"),
}

import os

SUB_MODEL_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "models", "subentity_models.json")

_TITLES = {"Dr", "Dr.", "Docteur", "Pr", "Pr.", "Professeur", "Madame",
           "Monsieur", "Mme", "M."}
RE_DATE_SHAPE = re.compile(r"\d{1,2}/\d{1,2}(/\d{2,4})?,?")
RE_TIME_SHAPE = re.compile(r"\d{1,2}h\d{2},?")
RE_PAREN_DIGIT = re.compile(r"\(\d{1,3}\),?")
#: damage twin (late r7): one substitution inside '(59)' yields an
#: UPPERCASE letter image ('(S9)') — without it the token flips to
#: paren_open and corrupts the context machine. >= 1 true digit required,
#: so no clean parenthesized word ever matches (pinned corpus-wide).
RE_PAREN_DIGIT_F = re.compile(r"\((?=[^)\d]*\d)[0-9oOlIzZsSbB]{1,3}\),?")

_STREET_KW = {"Avenue", "Rue", "Boulevard", "Allée", "Place", "Impasse",
              "avenue", "rue", "boulevard", "allée", "place", "impasse"}
_NE_FORMS = {"né(e)", "née", "né"}
_DECEDE_FORMS = {"décédé(e)", "décédée", "décédé"}
_BUILDING_KW = {"Bâtiment", "Immeuble", "Bât."}
_POBOX_KW = {"BP", "CS"}
_ASSOC_KW = {"Association", "EHPAD"}

#: self-labeled org keywords -> context name (the keyword token BELONGS to
#: the org-name segment: "CHU de Dijon" is all <chu>)
_ORG_SELF_KW = {"CHU": "chu", "GHU": "ghu", "DMU": "dmu",
                "Hôpital": "hosp", "Université": "univ",
                "Institut": "inst", "Centre": "center", "Site": "site",
                "Unité": "unit", "Département": "odept"}

# --------------------------------------------------------------------------
# OCR-fold fallback (r5): every keyword test below also accepts the token
# whose ocr_fold matches the keyword's fold, so in-class character damage
# ('Hôpital' -> 'Hopital' -> 'H0pital', 'né(e)' -> 'ne(e)'/'n(ée)') keeps
# the context machine running — the noisy tier's birthplace/site/settlement
# misses all traced to a dead keyword. Exact tests stay first; folds only
# widen. The fuzzy digit class covers digits with confusion twins.
# --------------------------------------------------------------------------
from ..functions.textnorm import ocr_fold as _fold

_NE_FOLDS = {_fold(x) for x in _NE_FORMS} | {"n(ee)", "nee()"}  # + transposes
_DECEDE_FOLDS = {_fold(x) for x in _DECEDE_FORMS}
_STREET_FOLDS = {_fold(x) for x in _STREET_KW}
_BUILDING_FOLDS = {_fold(x) for x in _BUILDING_KW}
_ASSOC_FOLDS = {_fold(x) for x in _ASSOC_KW}
_ORG_SELF_FOLDS = {_fold(k): v for k, v in _ORG_SELF_KW.items()}
_TITLE_FOLDS = {_fold(x) for x in _TITLES}
#: fuzzy postcode; the optional 'F-' head is the international French
#: postal prefix ('F-75001') — a real-world convention, and its fold is
#: 't-' (both accepted so the probe survives OCR damage too). The char
#: class carries the UPPERCASE confusables too (late r7): the digit-side
#: substitutions produce uppercase letters (5->S, 8->B, 2->Z), so
#: '5S000' must still read as a postcode; >= 1 true digit required.
_FD5 = re.compile(r"(?:[Ff]-|t-)?(?=[^\d]*\d)[0-9oOlIzZsSbB]{5}")


# --------------------------------------------------------------------------
# transpose-signature fallback (r7): corrupt_text's adjacent transpose
# (tokens >= 5 chars, interior positions only) reorders characters the
# fold cannot repair ('SERVCIE', 'Insttiut', 'Untié' — the organization
# noisy tier's remaining misses all traced to transposed keywords). The
# signature keeps the FIRST and LAST fold chars (a transpose never touches
# either end) and sorts the interior — invariant under any number of
# interior transposes, and closed over fold (accent/sub damage) too.
# Tables hold only keywords long enough to BE transposable (len >= 5);
# the probe chain stays exact -> fold -> signature, so clean behavior is
# unchanged wherever the earlier tiers fire.
# --------------------------------------------------------------------------

def _tsig(fl: str) -> str:
    if len(fl) < 3:
        return fl
    return fl[0] + "".join(sorted(fl[1:-1])) + fl[-1]


def _sig_set(folds) -> frozenset:
    return frozenset(_tsig(f) for f in folds if len(f) >= 5)


_NE_SIGS = _sig_set(_NE_FOLDS)
_DECEDE_SIGS = _sig_set(_DECEDE_FOLDS)
_STREET_SIGS = _sig_set(_STREET_FOLDS)
_BUILDING_SIGS = _sig_set(_BUILDING_FOLDS)
_ASSOC_SIGS = _sig_set(_ASSOC_FOLDS)
_ORG_SELF_SIGS = {_tsig(f): v for f, v in _ORG_SELF_FOLDS.items()
                  if len(f) >= 5}
_TITLE_SIGS = _sig_set(_TITLE_FOLDS)
_SERVICE_SIG = _tsig(_fold("SERVICE"))
_DEMEURANT_SIG = _tsig(_fold("Demeurant"))
_CEDEX_SIG = _tsig(_fold("Cedex"))
_FRANCE_SIG = _tsig(_fold("France"))
_COURRIEL_SIG = _tsig(_fold("courriel"))
_QUARTIER_SIG = _tsig(_fold("Quartier"))
_COMMUNE_SIG = _tsig(_fold("Commune"))


def _city_sigs():
    global _CITY_SIGS
    if _CITY_SIGS is None:
        _CITY_SIGS = _sig_set(_city_folds())
    return _CITY_SIGS


_CITY_SIGS = None
RE_DATE_SHAPE_F = re.compile(
    r"(?=[^\d]*\d)[0-9oizsb]{1,2}/[0-9oizsb]{1,2}(/[0-9oizsb]{2,4})?,?")
RE_TIME_SHAPE_F = re.compile(r"(?=[^\d]*\d)[0-9oizsb]{1,2}h[0-9oizsb]{2},?")
#: transpose-tolerant date/time shapes (r7): an adjacent transpose can
#: drag a digit across the '/' or 'h' ('29/04' -> '2/904'), which no
#: positional pattern survives — but the CHARACTER MULTISET does: only
#: fold-digits and the separator, separator count 1-2 (date) / exactly 1
#: (time), at least one true digit. Positional tiers stay first; these
#: only widen (extensional identity on family A verified corpus-wide).
_RE_DATE_CHARS_F = re.compile(
    r"(?=[^\d]*\d)[0-9oOlIzZsSbB/]{3,10},?")
_RE_TIME_CHARS_F = re.compile(
    r"(?=[^\d]*\d)[0-9oOlIzZsSbBh]{4,5},?")


def _city_folds():
    global _CITY_FOLDS
    if _CITY_FOLDS is None:
        from ..functions import lexicon as _lex
        _CITY_FOLDS = {_fold(c) for c in _lex.CITIES}
    return _CITY_FOLDS


_CITY_FOLDS = None


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


from functools import lru_cache


@lru_cache(maxsize=65536)
def _token_shape(tok: str):
    """Context-free per-token work, memoized across calls (tokens repeat
    heavily across documents — keyword tokens almost always, value tokens
    within letterhead lexicons): the static feature-index tuple plus the
    classification traits the context machine consumes."""
    core = tok.rstrip(",.")
    low = core.lower()
    fl = _fold(core)               # fold-fallback key (see tables above)
    ts = _tsig(fl) if len(fl) >= 5 else ""   # transpose signature (r7)
    is_paren_digit = bool(RE_PAREN_DIGIT.fullmatch(tok)
                          or RE_PAREN_DIGIT_F.fullmatch(tok))
    paren_open = tok.startswith("(") and not is_paren_digit
    f = [_SF["bias"]]
    if core in _TITLES or tok.rstrip(",") in _TITLES \
            or fl in _TITLE_FOLDS or ts in _TITLE_SIGS:
        f.append(_SF["title_lex"])
    if tok.endswith(","):
        f.append(_SF["endcomma"])
    if core.isupper() and core.isalpha():
        f.append(_SF["allcaps"])
    elif (len(core) >= 3 and core.isalnum()
          and not any(c.islower() for c in core)
          and sum(c.isalpha() for c in core) >= 2
          and all(c in "01258" for c in core if c.isdigit())):
        # damage twin of allcaps (r7): an in-class substitution turns a
        # letter of an ALLCAPS placename into its digit image
        # ('BICETRE' -> 'B1CETRE', 'IPP' -> '1PP') and .isalpha() drops
        # the evidence; a caps-only token whose every digit has a letter
        # twin and that keeps >= 2 caps letters retains it. Never fires
        # on family A/B (clean caps tokens are pure alpha; clean
        # digit-bearing tokens are pure digits or carry lowercase or
        # non-twin digits) — identity pinned corpus-wide.
        f.append(_SF["allcaps"])
    elif core[:1].isupper() and core[1:].islower():
        f.append(_SF["titlecase"])
    if RE_DATE_SHAPE.fullmatch(tok) or RE_DATE_SHAPE_F.fullmatch(tok) \
            or (1 <= core.count("/") <= 2
                and _RE_DATE_CHARS_F.fullmatch(tok)):
        f.append(_SF["date_shape"])
    if RE_TIME_SHAPE.fullmatch(tok) or RE_TIME_SHAPE_F.fullmatch(tok) \
            or (core.count("h") == 1 and "/" not in core
                and _RE_TIME_CHARS_F.fullmatch(tok)):
        f.append(_SF["time_shape"])
    if any(c.isdigit() for c in tok):
        f.append(_SF["has_digit"])
    if tok == "le" or (len(core) == 2 and fl == "ie"):
        f.append(_SF["is_le"])
    if tok in ("\u00e0", "a"):        # accent-stripped '\u00e0' stays the marker
        f.append(_SF["is_a"])
    if low in _NE_FORMS or fl in _NE_FOLDS or ts in _NE_SIGS:
        f.append(_SF["is_ne"])
    if low == "demeurant" or fl == "deneuront" \
            or ts == _DEMEURANT_SIG:
        f.append(_SF["is_demeurant"])
    if tok == ":":
        f.append(_SF["is_colon"])
    if low == "ans" or (len(core) == 3 and fl == "ons"):
        f.append(_SF["is_ans"])
    five_digit = bool(re.fullmatch(r"\d{5}", core)
                      or _FD5.fullmatch(core))
    if five_digit:
        f.append(_SF["five_digit"])
    digitrun = False
    if core.isdigit():
        ln = len(core)
        if ln <= 2:
            f.append(_SF["d_len12"])
        elif ln <= 4:
            f.append(_SF["d_len34"])
        elif ln >= 6:
            f.append(_SF["d_len6p"])
            digitrun = True
    if tok in _STREET_KW or fl in _STREET_FOLDS \
            or ts in _STREET_SIGS:
        f.append(_SF["street_kw"])
    if core == "Cedex" or fl == "eedex" or ts == _CEDEX_SIG:
        f.append(_SF["is_cedex"])
    if tok in ("-", "/", "\u2022"):
        # standalone separator glyph — '-' in family A's contact line,
        # '/' or '\u2022' in a second template's; no A line ever tokenizes
        # a bare '/' so widening the class leaves A decode untouched
        f.append(_SF["is_dash"])
    if core == "P\u00f4le" or fl == "poie":
        f.append(_SF["is_pole_kw"])
    if core == "SERVICE" or fl == "seruiee" or ts == _SERVICE_SIG:
        f.append(_SF["is_service_kw"])
    if core in ("France", "FRANCE") or fl == "tronee" \
            or ts == _FRANCE_SIG:
        f.append(_SF["is_france"])
    if is_paren_digit:
        f.append(_SF["paren_digit"])
    if paren_open:
        f.append(_SF["paren_open"])
    if len(core) == 1 and core.isupper():
        f.append(_SF["single_upper"])
    if 1 <= len(core) <= 2 and core[:1].isupper():
        f.append(_SF["short_upper"])
    if core.isdigit():
        f.append(_SF["pure_digit"])
    if "@" in tok:
        f.append(_SF["has_at"])
    if low.startswith("www."):
        f.append(_SF["has_www"])
    org_ctx = (_ORG_SELF_KW.get(core) or _ORG_SELF_FOLDS.get(fl)
               or (_ORG_SELF_SIGS.get(ts) if ts else None))
    if org_ctx:
        f.append(_SF["kw_" + org_ctx])
    is_assoc = core in _ASSOC_KW or fl in _ASSOC_FOLDS \
        or ts in _ASSOC_SIGS
    if is_assoc:
        f.append(_SF["kw_assoc"])
    if core == "T\u00e9l" or fl == "tei":
        f.append(_SF["kw_tel"])
    if core == "Fax" or fl == "tox":
        f.append(_SF["kw_fax"])
    if low == "courriel" or fl == "eourriei" or ts == _COURRIEL_SIG:
        f.append(_SF["kw_courriel"])
    if core == "Sexe" or fl == "sexe":
        f.append(_SF["kw_sexe"])
    if core in _BUILDING_KW or tok in _BUILDING_KW \
            or fl in _BUILDING_FOLDS or ts in _BUILDING_SIGS:
        f.append(_SF["kw_building"])
    if core in _POBOX_KW:
        f.append(_SF["kw_bp"])
    if core == "Quartier" or fl == "quortier" or ts == _QUARTIER_SIG:
        f.append(_SF["kw_quartier"])
    if core == "Commune" or fl == "eonnune" or ts == _COMMUNE_SIG:
        f.append(_SF["kw_commune"])
    if low in _DECEDE_FORMS or fl in _DECEDE_FOLDS \
            or ts in _DECEDE_SIGS:
        f.append(_SF["kw_decede"])
    if core == "IPP" or fl == "ipp":
        f.append(_SF["kw_ipp"])
    if fl in _city_folds() or ts in _city_sigs():
        f.append(_SF["city_lex"])
    # value-after keyword classification (context switch applied AFTER the
    # token emits) — "" when the token is not a value-after keyword
    if core == "T\u00e9l" or fl == "tei":
        vkw = "tel"
    elif core == "Fax" or fl == "tox":
        vkw = "fax"
    elif low == "courriel" or fl == "eourriei" or ts == _COURRIEL_SIG:
        vkw = "courriel"
    elif core == "Sexe" or fl == "sexe":
        vkw = "sexe"
    elif core in _BUILDING_KW or tok in _BUILDING_KW \
            or fl in _BUILDING_FOLDS or ts in _BUILDING_SIGS:
        vkw = "building"
    elif core in _POBOX_KW:
        vkw = "bp"
    elif core == "Quartier" or fl == "quortier" or ts == _QUARTIER_SIG:
        vkw = "quartier"
    elif core == "Commune" or fl == "eonnune" or ts == _COMMUNE_SIG:
        vkw = "commune"
    elif low in _DECEDE_FORMS or fl in _DECEDE_FOLDS \
            or ts in _DECEDE_SIGS:
        vkw = "decede"
    elif core == "IPP" or fl == "ipp":
        vkw = "ipp"
    else:
        vkw = ""
    # extended shape tuple (r5): the resolved fold-aware classifications
    # ride along so the context machine never re-tests raw literals
    return (tuple(f), core, low, is_paren_digit, paren_open, five_digit,
            vkw, org_ctx, is_assoc,
            low in _NE_FORMS or fl in _NE_FOLDS or ts in _NE_SIGS,
            low == "demeurant" or fl == "deneuront"
            or ts == _DEMEURANT_SIG,
            tok in _STREET_KW or fl in _STREET_FOLDS
            or ts in _STREET_SIGS,
            core == "P\u00f4le" or fl == "poie",
            core == "SERVICE" or fl == "seruiee" or ts == _SERVICE_SIG,
            digitrun)


def token_features(toks: list[tuple[int, str]]) -> list[list[int]]:
    n = len(toks)
    rows = []
    post_comma = False
    # sticky prefix flags (r3): set once the trigger token has been SEEN
    after_ne = after_dem = after_colon = False
    after_streetkw = after_postcode = False
    after_polekw = after_servicekw = False
    after_sep = False
    # last-keyword categorical context (r4): switches at each keyword;
    # "" = no context. paren context remembers what to restore.
    ctx = ""
    prev_ctx = ""
    seg_post_comma = False
    shapes = [_token_shape(t) for _s, t in toks]
    line_digitrun = any(sh[14] for sh in shapes)
    for i, (_s, tok) in enumerate(toks):
        (static, core, low, is_paren_digit, paren_open, five_digit,
         vkw, org_ctx, is_assoc, is_ne_tok, is_dem_tok, is_street_tok,
         is_pole_tok, is_service_tok, _digitrun) = shapes[i]
        # ---- SELF-INCLUSIVE context switches (before emitting) ----------
        if org_ctx:
            ctx = org_ctx
            seg_post_comma = False
        elif is_assoc:
            ctx = "assoc"
            seg_post_comma = False
        elif is_pole_tok or is_service_tok:
            ctx = ""            # pole/service ride the r3 sticky flags
            seg_post_comma = False
        elif paren_open:
            prev_ctx = ctx
            ctx = "paren"

        f = list(static)
        if i == 0:
            f.append(_SF["idx0"])
        if i == 1:
            f.append(_SF["idx1"])
        if i == n - 1:
            f.append(_SF["last"])
        if post_comma:
            f.append(_SF["post_comma"])
        if tok.endswith(","):
            post_comma = True
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
        if i + 1 < n:
            if shapes[i + 1][13]:               # next is SERVICE (fold-ok)
                f.append(_SF["next_service_kw"])
            if shapes[i + 1][3]:
                f.append(_SF["next_paren_digit"])
            if shapes[i + 1][14]:               # next is a long digit run
                f.append(_SF["next_digitrun"])
            if toks[i + 1][1] == ":":
                f.append(_SF["next_colon"])
        if after_sep:
            f.append(_SF["after_sep"])
        if line_digitrun:
            f.append(_SF["line_digitrun"])
        if seg_post_comma:
            f.append(_SF["seg_post_comma"])
        if ctx:
            f.append(_SF["ctx_" + ctx])
        rows.append(f)
        # ---- post-emission updates --------------------------------------
        if is_ne_tok:
            after_ne = True
            ctx, seg_post_comma = "birth", False
        if is_dem_tok:
            after_dem = True
            ctx, seg_post_comma = "addr", False
        if tok == ":":
            after_colon = True
        if tok in ("-", "/", "\u2022"):
            after_sep = True
        if is_street_tok:
            after_streetkw = True
        if five_digit:
            after_postcode = True
            ctx, seg_post_comma = "pc", False
        if is_pole_tok:
            after_polekw = True
        if is_service_tok:
            after_servicekw = True
        # value-after keyword switches ('à' accepts its accent-stripped
        # twin 'a': inside birth/addr context the bare form is unambiguous)
        if vkw:
            ctx, seg_post_comma = vkw, False
        elif tok in ("à", "a") and ctx == "birth":
            ctx = "birthplace"
        elif tok in ("à", "a") and ctx == "addr":
            ctx = "addrplace"
        elif is_paren_digit:
            ctx, seg_post_comma = "dept", False
        elif tok == "-" and ctx == "dept":
            ctx = "region"
        elif ctx == "paren" and tok.endswith(")"):
            ctx = prev_ctx
        elif ctx == "building" and core.isdigit():
            ctx = ""       # building value run ends at the street number
        if tok.endswith(","):
            seg_post_comma = True
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
    trailing separator comma stripped — the scanner twins' semantics).

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
    return segments_to_fields(text, toks, tags)


def segments_to_fields(text: str, toks: list[tuple[int, str]],
                       tags: list[str]) -> dict[str, str]:
    """Merge consecutive same-tag tokens into segments; keep the FIRST
    segment per field; strip one trailing separator comma."""
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
# Deterministic scanner twins (A/B): the same split the reference's
# resultExtraction methods do after the CRF labels come back
# (PatientParser.java:129-222, AddressParser / OrganizationParser
# resultExtraction). Each returns per-token gold TAGS — the training
# pre-annotation (createTraining analog) AND the rules path, so the fitted
# tagger and the scanner stay field-for-field comparable by construction.
# --------------------------------------------------------------------------

#: composed mixed-patient-line shape (all optional parts in corpus order);
#: kept for shape checks — the token scanner below is the authoritative twin
RE_PATIENT_MIXED = re.compile(
    r"^((?:Madame|Monsieur) .+?), né\(e\) le (\d{1,2}/\d{1,2}/\d{2,4})"
    r"(?: à ([A-ZÀ-ÖØ-Þ ]+?))?"
    r"(?:, décédé\(e\) le (\d{1,2}/\d{1,2}/\d{2,4}))?"
    r", demeurant (?:: .+?|à [A-ZÀ-ÖØ-Þ ]+?)"
    r"(?:, France)?(?:, Tél : [\d ]+?)?(?:, courriel : \S+)?"
    r"(?: \(sous tutelle\))?$")
RE_ADDR_FULL = re.compile(r"^(\d+), (.+?),? (\d{5}) (.+)$")
RE_ADDR_STREET = re.compile(r"^(\d+), (.+)$")
RE_ADDR_PC = re.compile(r"^(\d{5}) (.+)$")


def patient_rule_tags(toks: list[tuple[int, str]]) -> list[str]:
    """Keyword-scanner gold tags for the patient model (15 labels)."""
    tags: list[str] = []
    ctx = "persname" if toks and toks[0][1].rstrip(",") in (
        "Madame", "Monsieur") else ""
    n = len(toks)
    text_has_kw = any(
        t.rstrip(",.").lower() in (_NE_FORMS | _DECEDE_FORMS
                                   | {"demeurant", "sexe", "ipp", "tél",
                                      "courriel"})
        or t.rstrip(",.") in ("IPP", "Tél", "Sexe")
        for _s, t in toks)
    if not text_has_kw and ctx == "":
        # age line ("45 ans") or bare persname line
        if toks and toks[-1][1].rstrip(",.").lower() == "ans":
            return ["age"] * n
        return ["persname"] * n
    for _s, tok in toks:
        core = tok.rstrip(",.")
        low = core.lower()
        if low in _NE_FORMS or low == "demeurant" or low in _DECEDE_FORMS \
                or core in ("Sexe", "Tél") or low == "courriel" \
                or tok == ":" or tok == "le":
            tags.append("O")
            if low in _NE_FORMS:
                ctx = "birth"
            elif low in _DECEDE_FORMS:
                ctx = "death"
            elif low == "demeurant":
                ctx = "address"
            elif core == "Sexe":
                ctx = "sex"
            elif core == "Tél":
                ctx = "phone"
            elif low == "courriel":
                ctx = "email"
            continue
        if core == "IPP":
            tags.append("idtype")
            ctx = "idno"
            continue
        if tok == "à" and ctx == "birth":
            tags.append("O")
            ctx = "birthplace"
            continue
        if tok == "à" and ctx == "address":
            tags.append("O")
            ctx = "settlement"
            continue
        if tok.startswith("(") and not RE_PAREN_DIGIT.fullmatch(tok):
            ctx = "note"
        if core in ("France", "FRANCE") and ctx in ("address", "settlement"):
            tags.append("country")
            continue
        if ctx == "birth":
            tags.append("birthdate" if RE_DATE_SHAPE.fullmatch(tok) else "O")
            continue
        if ctx == "death":
            tags.append("death" if RE_DATE_SHAPE.fullmatch(tok) else "O")
            continue
        tags.append(ctx if ctx else "O")
    return tags


def address_rule_tags(toks: list[tuple[int, str]]) -> list[str]:
    """Keyword-scanner gold tags for the address model (15 labels)."""
    tags: list[str] = []
    ctx = ""
    n = len(toks)
    for i, (_s, tok) in enumerate(toks):
        core = tok.rstrip(",.")
        if core in _BUILDING_KW or tok in _BUILDING_KW:
            tags.append("O")
            ctx = ("buildingname" if core == "Immeuble"
                   else "buildingnumber")
            continue
        if core in _POBOX_KW:
            tags.append("O")
            ctx = "pobox"
            continue
        if core == "Quartier":
            tags.append("O")
            ctx = "district"
            continue
        if core == "Commune":
            tags.append("O")
            ctx = "community"
            continue
        if RE_PAREN_DIGIT.fullmatch(tok):
            tags.append("departmentnumber")
            ctx = "dept"
            continue
        if tok == "-":
            tags.append("O")
            if ctx == "dept":
                ctx = "region"
            continue
        if tok.startswith("(") and not RE_PAREN_DIGIT.fullmatch(tok):
            ctx = "note"
        if ctx == "note":
            tags.append("note")
            if tok.endswith(")"):
                ctx = ""
            continue
        if core in ("France", "FRANCE"):
            tags.append("country")
            continue
        if i + 1 < n and RE_PAREN_DIGIT.fullmatch(toks[i + 1][1]):
            tags.append("departmentname")
            continue
        if re.fullmatch(r"\d{5}", core):
            tags.append("postcode")
            ctx = "city"
            continue
        if ctx == "community" and tok == "de":
            tags.append("O")
            continue
        if ctx == "pobox" and core.isdigit():
            tags.append("pobox")
            ctx = ""
            continue
        if ctx in ("buildingname", "buildingnumber", "pobox", "district",
                   "community", "city", "region"):
            if core[:1].isdigit():
                # the value run ends when a digit-led token starts (the
                # next joined line's street number takes over) — release
                # the context and fall through to the street shapes
                ctx = ""
            else:
                tags.append(ctx)
                if ctx in ("buildingnumber", "pobox"):
                    ctx = ""     # one-token values release immediately
                continue
        # default street shapes
        if core.isdigit():
            tags.append("streetnumber")
            continue
        tags.append("streetname")
    return tags


def org_rule_tags(toks: list[tuple[int, str]]) -> list[str]:
    """Keyword-scanner gold tags for the organization model (22 labels)."""
    tags: list[str] = []
    ctx = ""
    seg_comma = False
    label_of = {"chu": "chu", "ghu": "ghu", "dmu": "dmu",
                "hosp": "hospital", "univ": "university",
                "inst": "institution", "center": "center", "site": "site",
                "unit": "unit", "odept": "department",
                "assoc": "organization"}
    n = len(toks)
    prev_comma = False
    for i, (_s, tok) in enumerate(toks):
        if prev_comma:
            seg_comma = True
        prev_comma = tok.endswith(",")
        core = tok.rstrip(",.")
        low = core.lower()
        if core in _ORG_SELF_KW:
            ctx = _ORG_SELF_KW[core]
            seg_comma = False
            tags.append(label_of[ctx])
            continue
        if core in _ASSOC_KW:
            ctx, seg_comma = "assoc", False
            tags.append("organization")
            continue
        if core == "Pôle":
            ctx, seg_comma = "pole", False
            tags.append("pole")
            continue
        if core == "SERVICE":
            ctx, seg_comma = "service", False
            tags.append("service")
            continue
        if core == "Tél":
            ctx, seg_comma = "tel", False
            tags.append("O")
            continue
        if core == "Fax":
            ctx, seg_comma = "fax", False
            tags.append("O")
            continue
        if low == "courriel":
            ctx, seg_comma = "courriel", False
            tags.append("O")
            continue
        if tok == ":":
            tags.append("O")
            continue
        if tok.startswith("(") and not RE_PAREN_DIGIT.fullmatch(tok):
            ctx = "paren"
        if ctx == "paren":
            tags.append("note")
            if tok.endswith(")"):
                ctx = ""
            continue
        if "@" in tok:
            tags.append("email")
            continue
        if low.startswith("www."):
            tags.append("web")
            continue
        if core in ("France", "FRANCE"):
            tags.append("country")
            continue
        if tok == "-":
            # the LAST dash before SERVICE separates pole from service;
            # inner dashes belong to the pole name — decided by lookahead
            if ctx == "pole" and i + 1 < n \
                    and toks[i + 1][1].rstrip(",") == "SERVICE":
                tags.append("O")
            elif ctx == "pole":
                tags.append("pole")
            else:
                tags.append("O")
            continue
        if ctx == "tel":
            tags.append("phone" if any(c.isdigit() for c in tok) else "O")
            continue
        if ctx == "fax":
            tags.append("fax" if any(c.isdigit() for c in tok) else "O")
            continue
        if ctx == "site" and (core.isdigit() or tok in _STREET_KW
                              or (seg_comma and any(
                                  c.isdigit() for c in tok))):
            # site-line street address: "Site Sud, 6, Avenue des Lilas"
            ctx = "siteaddr"
        if ctx == "siteaddr":
            tags.append("address")
            continue
        if seg_comma and ctx in ("hosp", "univ", "inst"):
            tags.append("settlement")
            continue
        if ctx in label_of:
            tags.append(label_of[ctx])
        elif ctx in ("pole", "service"):
            tags.append(ctx)
        else:
            tags.append("O")
    return tags


def _rule_fields(model: str, text: str) -> dict[str, str]:
    toks = tokens_of(text)
    if not toks:
        return {}
    fn = {"patient": patient_rule_tags, "address": address_rule_tags,
          "organization": org_rule_tags}[model]
    return segments_to_fields(text, toks, fn(toks))


def rule_tags(model: str, text: str) -> list[str]:
    """Per-token gold tags from the scanner twin (training pre-annotation)."""
    toks = tokens_of(text)
    fn = {"patient": patient_rule_tags, "address": address_rule_tags,
          "organization": org_rule_tags}[model]
    return fn(toks)


def parse_patient_line(t: str, use_rules: bool = False) -> dict[str, str]:
    """One 'patient'-labeled header line -> full patient field dict.
    Handles the pure-name shape ('Madame X Y Z') and every mixed shape
    ('Madame X Y Z, né(e) le d/m/y[ à CITY][, décédé(e) le d/m/y],
    demeurant : addr | demeurant à CITY[, France][, Tél : ...]
    [, courriel : ...][ (sous tutelle)]')."""
    segs = _rule_fields("patient", t) if use_rules \
        else tag_segments("patient", t)
    return {"persname": segs.get("persname",
                                 t if not segs else ""),
            "birthdate": segs.get("birthdate", ""),
            "birthplace": segs.get("birthplace", ""),
            "death": segs.get("death", ""),
            "address": segs.get("address", ""),
            "settlement": segs.get("settlement", ""),
            "country": segs.get("country", ""),
            "phone": segs.get("phone", ""),
            "email": segs.get("email", ""),
            "note": segs.get("note", ""),
            "sex": segs.get("sex", ""),
            "idno": segs.get("idno", ""),
            "idtype": segs.get("idtype", "")}


def parse_address_fields(t: str, use_rules: bool = False) -> dict[str, str]:
    """An address string (street / postcode / building / BP / district /
    commune / department lines, or the kernel-joined block) -> the full
    AddressParser field set."""
    return _rule_fields("address", t) if use_rules \
        else tag_segments("address", t)


def parse_org_fields(t: str, use_rules: bool = False) -> dict[str, str]:
    """A letterhead organization block -> the full OrganizationParser
    field set ('Pôle Femmes - Mères - Enfants - SERVICE DE GYNECOLOGIE'
    must split at the LAST dash, which only sequence context can decide;
    'CHU de Dijon Hôpital Bocage, Dijon Pôle ...' decomposes into
    chu/hospital/settlement/pole/service segments)."""
    return _rule_fields("organization", t) if use_rules \
        else tag_segments("organization", t)
