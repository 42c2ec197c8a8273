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
            for k, j in enumerate(idx):
                t = normalize_space(d["spans"][j]["text"])
                gold = d["line_fields"][j]
                assert gold in header.HEADER_LABELS, (i, j, gold)
                yield (header.header_line_features(t, k in largest),
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


def train(data, n_labels, n_feats):
    W = [[0.0] * n_feats for _ in range(n_labels)]
    for epoch in range(MAX_EPOCHS):
        errors = 0
        for feats, gold in data:
            best, arg = None, 0
            for j in range(n_labels):
                s = sum(W[j][f] for f in feats)
                if best is None or s > best:
                    best, arg = s, j
            if arg != gold:
                errors += 1
                for f in feats:
                    W[gold][f] += 1.0
                    W[arg][f] -= 1.0
        print(f"  epoch {epoch}: {errors} line errors")
        if errors == 0:
            return W, epoch
    raise SystemExit(f"did not converge in {MAX_EPOCHS} epochs")


def main() -> None:
    os.makedirs(os.path.dirname(header.HEADER_MODEL_PATH), exist_ok=True)

    data = list(header_examples(0, N_TRAIN))
    print(f"header: {len(data)} lines")
    W, ep = train(data, len(header.HEADER_LABELS), len(header.HEADER_FEATURES))
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
                  len(leftnote.LEFTNOTE_FEATURES))
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
