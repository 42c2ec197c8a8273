"""Fitted sub-entity token taggers: dateline, medic, person-name.

The reference's child models are trained CRFs over short strings routed by
the cascade (DatelineParser.java:104-199, MedicParser.java:57-233,
PersonNameParser.java:56-...). Here each is a token-level multiclass
perceptron over shape/position features (tools/train_subentity.py, zero
train errors, committed as models/subentity_models.json); consecutive
same-field tokens merge into segments. The regex-group splitters remain as
the A/B twins — both paths feed the same field actions in
operators/header.py, and equality is pinned on the golden corpora and the
reference fixtures (tests/test_fitted_subentity.py).

The other three reference sub-models (patient, address, organization) are
field-labeled at LINE granularity by the fitted header/left-note
classifiers — their sub-fields arrive on distinct lines in this corpus, so
the line model IS the field model for them.
"""

from __future__ import annotations

import json
import os
import re

SUB_FEATURES = ("bias", "idx0", "idx1", "last", "title_lex", "post_comma",
                "endcomma", "allcaps", "titlecase", "date_shape",
                "time_shape", "has_digit", "is_le", "is_a")
_SF = {f: i for i, f in enumerate(SUB_FEATURES)}

SUB_LABELS = {
    "dateline": ("O", "placename", "date", "time"),
    "medic": ("O", "persname", "role"),
    "name-person-medical": ("O", "title", "forename", "middlename",
                            "surname"),
}

SUB_MODEL_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "models", "subentity_models.json")

_TITLES = {"Dr", "Dr.", "Docteur", "Pr", "Pr.", "Professeur", "Madame",
           "Monsieur", "Mme", "M."}
RE_DATE_SHAPE = re.compile(r"\d{1,2}/\d{1,2}(/\d{2,4})?,?")
RE_TIME_SHAPE = re.compile(r"\d{1,2}h\d{2},?")


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
        rows.append(f)
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
    return _W


def tag_segments(model: str, text: str,
                 W: list[list[float]] | None = None) -> dict[str, str]:
    """field -> surface text. Consecutive same-field tokens merge; a field's
    surface is the ORIGINAL char span (commas between its tokens kept,
    trailing separator comma stripped — the regex twins' group semantics)."""
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
