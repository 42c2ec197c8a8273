"""Fit the header and left-note line-field classifiers.

The reference's header-medical-report / left-note-medical-report models are
trained CRFs (HeaderMedicalParser.java:239-389, LeftNoteMedicalParser.java:
75-173); these are the engine's analogs: multiclass perceptrons over the
pattern/layout features (operators/header.py HEADER_FEATURES,
operators/leftnote.py LEFTNOTE_FEATURES), trained to zero line errors on
the golden corpus field truth (corpus line_fields) plus the reference
left-note fixture's staff-block annotations, committed as
models/header_model.json and models/leftnote_model.json. The field ACTIONS
(merge semantics, sub-entity cascade) stay shared between the fitted and
rule paths — the reference's model -> resultExtraction split.

Run from the repo root:  python tools/train_fields.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from grobid_medical_report_spark.corpus import ZONE_OF, generate_doc  # noqa: E402
from grobid_medical_report_spark.functions.textnorm import \
    normalize_space  # noqa: E402
from grobid_medical_report_spark.operators import header, leftnote  # noqa: E402

N_TRAIN = 300
MAX_EPOCHS = 60

#: reference left-note fixture staff-block annotations
#: (processLeftNoteFromPDF.xml.xml) — shapes the corpus does not generate
LEFTNOTE_FIXTURE = (
    ("Chef de Service : Pr. A. Gautier Pr Robin HOOD", "staff_role_name"),
    ("Secrétariat : 01 41 12 34 56", "staff_org_phone"),
    ("Secrétariat : 01 41 12 34 57", "staff_org_phone"),
    ("Dr Caroline GENTILE", "staff_name"),
    ("Mme Pauline", "staff_name"),
    ("Kinésithérapeute Rééducation périnéale et abdominale", "staff_role"),
)


def header_examples(lo: int, hi: int):
    for mode in (False, True):
        for i in range(lo, hi):
            d = generate_doc(i, layout=mode)
            idx = [j for j, lab in enumerate(d["line_labels"])
                   if ZONE_OF[lab] == "header"]
            largest: set[int] = set()
            if mode:
                sizes = [d["spans"][j]["font_size"] for j in idx]
                if sizes and max(sizes) - min(sizes) >= 3.0:
                    mx = max(sizes)
                    largest = {k for k, s in enumerate(sizes) if s == mx}
            texts = [normalize_space(d["spans"][j]["text"]) for j in idx]
            for k, j in enumerate(idx):
                gold = d["line_fields"][j]
                assert gold in header.HEADER_LABELS, (i, j, gold)
                yield (header.header_line_features(
                           texts[k], k in largest,
                           texts[k - 1] if k else "",
                           texts[k + 1] if k + 1 < len(texts) else ""),
                       header._HL[gold])


def leftnote_examples(lo: int, hi: int):
    for i in range(lo, hi):
        d = generate_doc(i)
        for j, lab in enumerate(d["line_labels"]):
            if ZONE_OF[lab] != "leftnote":
                continue
            t = normalize_space(d["spans"][j]["text"])
            gold = d["line_fields"][j]
            assert gold in leftnote.LEFTNOTE_LABELS, (i, j, gold)
            yield leftnote.leftnote_line_features(t), leftnote._LL[gold]
    for t, gold in LEFTNOTE_FIXTURE:
        yield leftnote.leftnote_line_features(t), leftnote._LL[gold]


def _margin_pass(W, data, n_labels, margin):
    """One epoch; margin=None means classic update-on-error only (used by
    the clean-repair loop — a margin-0 pass would churn on exact ties)."""
    errors = updates = 0
    for feats, gold in data:
        scores = [sum(W[j][f] for f in feats) for j in range(n_labels)]
        arg = max(range(n_labels), key=scores.__getitem__)
        if arg != gold:
            errors += 1
        if margin is None:
            violated = arg != gold
        else:
            runner = max((scores[j] for j in range(n_labels) if j != gold),
                         default=float("-inf"))
            violated = scores[gold] <= runner + margin
        if violated:
            updates += 1
            loser = arg if arg != gold else max(
                (j for j in range(n_labels) if j != gold),
                key=scores.__getitem__)
            for f in feats:
                W[gold][f] += 1.0
                W[loser][f] -= 1.0
    return errors, updates


def _errors(W, data, n_labels):
    n = 0
    for feats, gold in data:
        scores = [sum(W[j][f] for f in feats) for j in range(n_labels)]
        if max(range(n_labels), key=scores.__getitem__) != gold:
            n += 1
    return n


def train(data, n_labels, n_feats, margin: float = 1.0,
          masked=frozenset(), mask_epochs: int = 12):
    """Margin perceptron (update while score(gold) <= score(runner-up) +
    margin). Zero-error stopping leaves co-adapted weights arbitrary — any
    separator is accepted, so a feature that is redundant IN TRAINING
    (e.g. a content feature that co-fires with an exact template match)
    can end up with no weight of its own and carry nothing when the
    template evidence dies (noise / format-shift tiers). The unit margin
    forces a centered separator that spreads weight over all firing
    evidence. Data is separable, so margin training converges too.

    ``masked`` feature ids drive an optional best-effort phase 2 over
    exact-template-masked dropout twins (same pattern as tools/
    train_body.py: updates run over clean + twins, kept weights are the
    best snapshot whose CLEAN decode is error-free) — the training
    pressure that gives content evidence standalone weight."""
    W = [[0.0] * n_feats for _ in range(n_labels)]
    for epoch in range(MAX_EPOCHS):
        errors, updates = _margin_pass(W, data, n_labels, margin)
        print(f"  epoch {epoch}: {errors} line errors, {updates} updates")
        if updates == 0:
            break
    else:
        if errors:
            raise SystemExit(f"did not converge in {MAX_EPOCHS} epochs")
        print(f"  stopping at {MAX_EPOCHS} epochs with 0 errors")
        epoch = MAX_EPOCHS

    twins = []
    for feats, gold in data:
        kept = [f for f in feats if f not in masked]
        if len(kept) < len(feats):
            twins.append((kept, gold))
    if not twins:
        return W, epoch
    best = [row[:] for row in W]
    best_twin = _errors(W, twins, n_labels)
    print(f"  mask baseline: {best_twin} twin errors of {len(twins)}")
    for mepoch in range(mask_epochs):
        _, updates = _margin_pass(W, list(data) + twins, n_labels, margin)
        for _ in range(MAX_EPOCHS):
            cerr, _u = _margin_pass(W, data, n_labels, None)
            if cerr == 0:
                break
        twin_errs = _errors(W, twins, n_labels)
        print(f"  mask epoch {mepoch}: {updates} updates, "
              f"{cerr} clean / {twin_errs} twin errors")
        if cerr == 0 and twin_errs < best_twin:
            best = [row[:] for row in W]
            best_twin = twin_errs
            epoch += 1
        if updates == 0:
            break
    print(f"  kept snapshot: 0 clean / {best_twin} twin errors")
    return best, epoch


def header_mask() -> frozenset:
    """Dropout-twin feature set for the header model: the exact templates
    (r_*) AND the prefix-anchored fold probes — both die when a second
    grammar family changes the line prefix ('Patient(e) : Madame ...'), so
    the twin must look like the family-B vector. Content features (c_*)
    and prefix-free shapes (f_sex fires on 'Sexe féminin', f_mostly_upper,
    largest_font) stay. Shared with tools/evaluate_models.py so the eval
    refits the SAME recipe the committed artifact was trained with."""
    prefix_probes = {"f_numsign", "f_ipp", "f_birth", "f_age", "f_paddr",
                     "f_patient", "f_medic", "f_dateline"}
    return frozenset(header._HF[f] for f in header.HEADER_FEATURES
                     if f.startswith("r_") or f in prefix_probes)


def leftnote_mask() -> frozenset:
    """Dropout-twin feature set for the left-note model (exact templates
    only — the f_* probes there are keyword-content probes that survive a
    reshaped template)."""
    return frozenset(leftnote._LF[f] for f in leftnote.LEFTNOTE_FEATURES
                     if f.startswith("r_"))


def main() -> None:
    os.makedirs(os.path.dirname(header.HEADER_MODEL_PATH), exist_ok=True)

    data = list(header_examples(0, N_TRAIN))
    print(f"header: {len(data)} lines")
    h_masked = header_mask()
    W, ep = train(data, len(header.HEADER_LABELS), len(header.HEADER_FEATURES),
                  masked=h_masked)
    with open(header.HEADER_MODEL_PATH, "w") as f:
        json.dump({"labels": list(header.HEADER_LABELS),
                   "features": list(header.HEADER_FEATURES), "W": W,
                   "meta": {"algorithm": "multiclass perceptron",
                            "train_docs": N_TRAIN, "train_lines": len(data),
                            "epochs_to_zero_errors": ep}}, f, indent=1)
    print(f"wrote {header.HEADER_MODEL_PATH}")

    data = list(leftnote_examples(0, N_TRAIN))
    print(f"leftnote: {len(data)} lines")
    W, ep = train(data, len(leftnote.LEFTNOTE_LABELS),
                  len(leftnote.LEFTNOTE_FEATURES), masked=leftnote_mask())
    with open(leftnote.LEFTNOTE_MODEL_PATH, "w") as f:
        json.dump({"labels": list(leftnote.LEFTNOTE_LABELS),
                   "features": list(leftnote.LEFTNOTE_FEATURES), "W": W,
                   "meta": {"algorithm": "multiclass perceptron",
                            "train_docs": N_TRAIN, "train_lines": len(data),
                            "fixture_lines": len(LEFTNOTE_FIXTURE),
                            "epochs_to_zero_errors": ep}}, f, indent=1)
    print(f"wrote {leftnote.LEFTNOTE_MODEL_PATH}")


if __name__ == "__main__":
    main()
