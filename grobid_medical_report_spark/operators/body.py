"""Body structuring: fine-grained labels over body-zone lines.

Re-expresses the reference's `full-medical-text` model
(FullMedicalTextParser.java:106-206, getBodyTextFeatured:319-723) which labels
body content as title/section/subsection/paragraph/item/figure/table/medic.
Here the labeling is a deterministic rule cascade over line content, followed
by the same cluster semantics (contiguous same-label runs merge — reference
TaggingTokenClusteror, SURVEY.md C2) applied at assembly time.

Figure/table handling mirrors the reference's graphics assignment
(FullMedicalTextParser.processFigures:5429-5467, processTables:5599-5647 and
doc.assignGraphicObjectsToFigures at :5465): a media span followed by a
caption line fuses into one figure/table span carrying the media_ref.
"""

from __future__ import annotations

import re
from functools import lru_cache

from ..functions.lexicon import SECTIONS, SUBSECTIONS

RE_SECTION = re.compile(r"^[A-ZÀ-ÖØ-Þ][A-ZÀ-ÖØ-Þ' ]{2,} ?:$")
RE_SUBSECTION = re.compile(r"^[A-ZÀ-ÖØ-Þ][a-zà-öø-ÿ' ]+ ?:$")
RE_ITEM = re.compile(r"^- ")
RE_FIGURE_CAP = re.compile(r"^Figure \d+ ?:")
RE_TABLE_CAP = re.compile(r"^Tableau \d+ ?:")
#: "Dr Martinez" / "Docteur Margo COCO" — optional ALLCAPS surname
RE_MEDIC_BODY = re.compile(
    r"^(?:Docteur|Dr|Pr)\.? [A-ZÀ-ÖØ-Þ][a-zà-öø-ÿ]+(?: [A-ZÀ-ÖØ-Þ]{2,})?$")
#: titleless short name line ("Margo COCO" after a dash separator, see the
#: reference full-text fixture) — Titlecase + ALLCAPS only, max 3 tokens
RE_MEDIC_BARE = re.compile(
    r"^[A-ZÀ-ÖØ-Þ][a-zà-öø-ÿ]+ [A-ZÀ-ÖØ-Þ]{2,}$")
#: dash-rule separator starts a new paragraph cluster (the I- begin-marker
#: analog; keeps "<p>le 29/04/2000</p><p>--------------Docteur</p>" split)
RE_SEPARATOR = re.compile(r"^-{4,}")
#: label-shaped prose line ("Gestes effectués :") — its own one-line cluster,
#: not merged into neighbours (fixture keeps it a separate <p>)
RE_LABEL_LINE = re.compile(r"^[A-Za-zà-öø-ÿÀ-ÖØ-Þ' ]+ ?:$")

#: known heading lexicons (F9 feature deciding heading level, the fixture's
#: "Histoire de la maladie :" -> level 1 despite titlecase)
_SECTION_UPPER = {s.upper() for s in SECTIONS}
_SUBSECTION_SET = set(SUBSECTIONS)

#: one-pass alternation over every body shape (hot path; branch order =
#: the original cascade order, branches mutually exclusive by shape)
RE_BODY = re.compile(
    r"^(?:(?P<figure>Figure \d+ ?:.*)"
    r"|(?P<table>Tableau \d+ ?:.*)"
    r"|(?P<item>- .*)"
    r"|(?P<medic>(?:Docteur|Dr|Pr)\.? [A-ZÀ-ÖØ-Þ][a-zà-öø-ÿ]+"
    r"(?: [A-ZÀ-ÖØ-Þ]{2,})?"
    r"|[A-ZÀ-ÖØ-Þ][a-zà-öø-ÿ]+ [A-ZÀ-ÖØ-Þ]{2,})"
    r"|(?P<section>[A-ZÀ-ÖØ-Þ][A-ZÀ-ÖØ-Þ' ]{2,} ?:)"
    r"|(?P<subsection>[A-ZÀ-ÖØ-Þ][a-zà-öø-ÿ' ]+ ?:))$")


@lru_cache(maxsize=65536)
def label_body_line(text: str, is_media: bool, prev_is_media: bool) -> str:
    """Fine label for one body-zone line — RULE cascade, the engineered twin
    of the FITTED classifier (:func:`label_body_line_fitted`); both are
    asserted label-identical on the golden corpora
    (tests/test_fitted_body.py). Memoized per worker (pure; body lines
    repeat across documents)."""
    if is_media:
        return "media"
    m = RE_BODY.match(text)
    if not m:
        return "paragraph"
    g = m.lastgroup
    if g == "subsection":
        stem = text.rstrip(" :")
        if stem.upper() in _SECTION_UPPER:
            return "section"          # lexicon feature overrides case shape
        if stem in _SUBSECTION_SET:
            return "subsection"
        return "paragraph"            # "Gestes effectués :" stays prose
    return g


# --------------------------------------------------------------------------
# fitted body-line classifier (the reference's full-medical-text model is a
# trained CRF, FullMedicalTextParser.java:106-206): per-line shape/lexicon/
# layout features -> learned multiclass weights (tools/train_body.py,
# perceptron to zero train errors), argmax with first-index tie-break.
# --------------------------------------------------------------------------

import json as _json
import os as _os

BODY_LABELS = ("paragraph", "section", "subsection", "item", "medic",
               "figure", "table")
BODY_FEATURES = ("bias", "g_figure", "g_table", "g_item", "g_medic",
                 "g_section", "g_subsection", "sec_lex", "sub_lex",
                 "lay_heading", "lay_sub", "lay_indent",
                 # r5 CONTENT features (format-shift tier): bullet-ish line
                 # start and an all-caps short heading — fire in family A
                 # ('- item', 'TITRE :') so training weights them, and keep
                 # firing on family B's '• item' / '1. TITRE' renderings
                 "c_bullet", "c_caps_head",
                 # r7 DAMAGE-INVARIANT features (noisy tier, VERDICT r6
                 # item 7): keyword/lexicon membership probed through the
                 # damage signature (_dmg_sig) — the OCR fold with spaces
                 # dropped and chars sorted. Every corrupt_text mode maps a
                 # line to the SAME signature (accent strip + OCR sub fold
                 # to one class rep, adjacent transpose permutes the
                 # multiset, spacing insertion only adds a dropped space),
                 # so these features are EQUAL on a line and its corrupted
                 # twin: evidence the exact g_* templates lose under noise
                 "fz_figure", "fz_table", "fz_medic", "fz_sec_lex",
                 "fz_sub_lex")
_BL = {b: i for i, b in enumerate(BODY_LABELS)}
_BF = {f: i for i, f in enumerate(BODY_FEATURES)}

BODY_MODEL_PATH = _os.path.join(
    _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))),
    "models", "body_model.json")


from ..functions.textnorm import ocr_fold as _ocr_fold  # noqa: E402


def _dmg_sig(s: str) -> tuple[str, str]:
    """Damage signature: (first fold char, sorted fold chars, spaces
    dropped). Invariant under EVERY corrupt_text mode — ocr_fold closes
    over the _OCR_SUBS/_ACCENTS pairs (one class representative per
    confusion set), transpose permutes the multiset without touching the
    first char, and spacing damage only inserts the char this drops."""
    f = _ocr_fold(s).replace(" ", "")
    return (f[:1], "".join(sorted(f)))


def _sigs(words) -> frozenset:
    return frozenset(_dmg_sig(w) for w in words)


_SIG_SECTIONS = _sigs(SECTIONS)
_SIG_SUBSECTIONS = _sigs(SUBSECTIONS)
_SIG_MEDIC_TITLES = _sigs(("Docteur", "Dr", "Pr"))
_SIG_FIGURE = _dmg_sig("Figure")
_SIG_TABLE = _dmg_sig("Tableau")
#: fold images of the digits 0-9 (digit confusables fold to letters);
#: the str form drives C-level strip() membership tests on the hot path
_FOLD_DIGITS = frozenset(_ocr_fold("0123456789"))
_FOLD_DIGITS_STR = "".join(_FOLD_DIGITS)
#: heading enumeration token ('1.' / '12)') — family-B numbered headings
_RE_ENUM = re.compile(r"^\d{1,2}[.)]$")


def _fz_flags(text: str) -> tuple[bool, bool, bool, bool, bool]:
    """(figure, table, medic, sec_lex, sub_lex) via damage signatures.
    Self-gated on cheap shape tests so multi-hundred-char paragraphs skip
    the signature work: captions/heads need a colon in the first 40 chars,
    name lines need a short colon-free line."""
    fig = tab = med = sec = sub = False
    ci = text.find(":", 0, 40)
    if ci >= 0:
        head = text[:ci]
        htoks = head.split()
        # caption head '<KW> <num> :': last head token all fold-digits,
        # the rest (joined, so a spacing-split 'Fig ure' rejoins)
        # sig-matches the caption keyword
        if len(htoks) >= 2 and htoks[-1] and \
                not _ocr_fold(htoks[-1]).strip(_FOLD_DIGITS_STR):
            kw = _dmg_sig("".join(htoks[:-1]))
            fig = kw == _SIG_FIGURE
            tab = kw == _SIG_TABLE
        if not text[ci + 1:].strip():
            # colon-TERMINATED line: heading-lexicon membership decides
            # the level (the fixture's level rule), probed by signature
            stem = _dmg_sig(head)
            sec = stem in _SIG_SECTIONS
            sub = stem in _SIG_SUBSECTIONS
    elif ":" not in text and len(text) <= 40:
        toks = text.split()
        # colon-FREE section head: a second grammar family numbers its
        # headings ('1. DIAGNOSTIC') instead of colon-terminating them —
        # strip the enumeration and probe the same lexicon signature.
        # ZERO family-A lines hit this branch (A sections always carry
        # ' :'), so clean vectors are untouched (the r5/r6 extensional-
        # identity rule) while the retrained weight that moved from
        # c_caps_head onto fz_sec_lex keeps firing on family B.
        if toks and _RE_ENUM.match(toks[0]):
            if _dmg_sig("".join(toks[1:])) in _SIG_SECTIONS:
                sec = True
        if 2 <= len(toks) <= 4:
            t0 = toks[0].rstrip(".")
            if _dmg_sig(t0) in _SIG_MEDIC_TITLES:
                med = True                      # 'Docteur X ...' titled
            elif len(toks) >= 3 and \
                    _dmg_sig(t0 + toks[1].rstrip(".")) in _SIG_MEDIC_TITLES:
                # spacing-split title ('Doc teur Abba ROUX'): the spacing
                # mode applies no other damage to the split token, so the
                # joined pieces signature-match the clean title; no clean
                # family-A/B line joins to a title (pinned)
                med = True
            elif (len(toks) <= 3 and toks[0][:1].isupper()
                  and not toks[0].isupper()
                  and len(toks[-1]) >= 2
                  and not any(c.islower() for c in toks[-1])
                  and _ocr_fold("".join(toks)).isalpha()):
                med = True                      # bare 'Margo COCO' name
    return fig, tab, med, sec, sub


def body_line_features(text: str, lay_heading: bool = False,
                       lay_sub: bool = False,
                       lay_indent: bool = False) -> list[int]:
    """Active feature ids for one body text line. Layout flags are the
    font-delta-band / indentation signals computed by the kernel
    (assemble.py) when the input carries layout attrs."""
    f = [_BF["bias"]]
    m = RE_BODY.match(text)
    if m:
        f.append(_BF[f"g_{m.lastgroup}"])
        if m.lastgroup == "subsection":
            stem = text.rstrip(" :")
            if stem.upper() in _SECTION_UPPER:
                f.append(_BF["sec_lex"])
            if stem in _SUBSECTION_SET:
                f.append(_BF["sub_lex"])
    if lay_heading:
        f.append(_BF["lay_heading"])
    if lay_sub:
        f.append(_BF["lay_sub"])
    if lay_indent:
        f.append(_BF["lay_indent"])
    if text.startswith(("- ", "• ", "* ")):
        f.append(_BF["c_bullet"])
    # word-count gate FIRST with maxsplit (cold-path cost: the alpha scan
    # over long paragraph lines was ~10% of the cold kernel's body stage;
    # split(None, 8) yields <= 9 pieces, so len <= 8 iff word count <= 8 —
    # semantics identical, but multi-hundred-char paragraphs skip the
    # per-char scan entirely)
    if len(text.split(None, 8)) <= 8:
        # filter/map keep the exact per-char isalpha/isupper predicates but
        # run the loop dispatch in C (~20% on this check, r8)
        alpha = list(filter(str.isalpha, text))
        if (4 <= len(alpha)
                and sum(map(str.isupper, alpha)) >= 0.8 * len(alpha)):
            f.append(_BF["c_caps_head"])
    fig, tab, med, sec, sub = _fz_flags(text)
    if fig:
        f.append(_BF["fz_figure"])
    if tab:
        f.append(_BF["fz_table"])
    if med:
        f.append(_BF["fz_medic"])
    if sec:
        f.append(_BF["fz_sec_lex"])
    if sub:
        f.append(_BF["fz_sub_lex"])
    return f


_BODY_WL: list[list[float]] | None = None


def _body_weights() -> list[list[float]]:
    global _BODY_WL
    if _BODY_WL is None:
        from ..models import load_model
        m = load_model("body_model.json")        # zip-safe (--py-files)
        assert tuple(m["labels"]) == BODY_LABELS \
            and tuple(m["features"]) == BODY_FEATURES, \
            "body_model.json is stale — rerun tools/train_body.py"
        _BODY_WL = m["W"]
    return _BODY_WL


@lru_cache(maxsize=65536)
def label_body_line_fitted(text: str, is_media: bool,
                           lay_heading: bool = False, lay_sub: bool = False,
                           lay_indent: bool = False) -> str:
    """FITTED body-line label (the default path in assemble.py)."""
    if is_media:
        return "media"
    WL = _body_weights()
    feats = body_line_features(text, lay_heading, lay_sub, lay_indent)
    best, arg = None, 0
    for j in range(len(BODY_LABELS)):
        row = WL[j]
        s = 0.0
        for f in feats:
            s += row[f]
        if best is None or s > best:
            best, arg = s, j
    return BODY_LABELS[arg]
