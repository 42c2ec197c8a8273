"""Fitted body-line classifier (the full-medical-text model half of the
train-don't-hand-code story): learned multiclass weights vs the rule twin.
"""

from __future__ import annotations

import json
import os
import sys

from grobid_medical_report_spark.corpus import generate_doc
from grobid_medical_report_spark.operators import body

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
import train_body as tb  # noqa: E402


def test_artifact_schema():
    with open(body.BODY_MODEL_PATH) as f:
        m = json.load(f)
    assert tuple(m["labels"]) == body.BODY_LABELS
    assert tuple(m["features"]) == body.BODY_FEATURES


def test_fitted_matches_gold_held_out():
    """Held-out docs (>= trainer's N_TRAIN), both corpora: fitted label ==
    generator truth for every body-zone line."""
    checked = 0
    for mode in (False, True):
        for i in range(300, 420):
            d = generate_doc(i, layout=mode)
            for j, lab in enumerate(d["line_labels"]):
                if lab not in tb._BODY_SET:
                    continue
                lh, ls, li = tb._layout_flags(d, j)
                got = body.label_body_line_fitted(
                    d["spans"][j]["text"], False, lh, ls, li)
                assert got == lab, (i, j, d["spans"][j]["text"][:60])
                checked += 1
    assert checked > 3000


def test_fitted_equals_rules_without_layout():
    """On the text-only corpus the fitted classifier and the rule cascade
    must agree line-for-line (layout flags all False)."""
    for i in range(300, 380):
        d = generate_doc(i)
        for j, lab in enumerate(d["line_labels"]):
            if lab not in tb._BODY_SET:
                continue
            t = d["spans"][j]["text"]
            assert (body.label_body_line_fitted(t, False)
                    == body.label_body_line(t, False, False)), t[:60]


def test_retraining_converges_smoke():
    data = list(tb.examples(0, 30))
    W, _ = tb.train(data)
    for feats, gold in data:
        scores = [sum(W[j][f] for f in feats)
                  for j in range(len(body.BODY_LABELS))]
        assert scores.index(max(scores)) == gold
