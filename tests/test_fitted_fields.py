"""Fitted header/left-note line-field classifiers vs their rule twins
(tools/train_fields.py artifacts) — held-out equality with the generator's
field truth, rules-equality on fixture shapes, artifact schemas."""

from __future__ import annotations

import json
import os
import sys

from grobid_medical_report_spark.corpus import ZONE_OF, generate_doc
from grobid_medical_report_spark.functions.textnorm import normalize_space
from grobid_medical_report_spark.operators import header, leftnote

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
import train_fields as tf  # noqa: E402


def test_artifact_schemas():
    with open(header.HEADER_MODEL_PATH) as f:
        m = json.load(f)
    assert tuple(m["labels"]) == header.HEADER_LABELS
    with open(leftnote.LEFTNOTE_MODEL_PATH) as f:
        m = json.load(f)
    assert tuple(m["labels"]) == leftnote.LEFTNOTE_LABELS


def test_header_fitted_matches_truth_held_out():
    checked = 0
    for mode in (False, True):
        for i in range(300, 420):
            d = generate_doc(i, layout=mode)
            idx = [j for j, lab in enumerate(d["line_labels"])
                   if ZONE_OF[lab] == "header"]
            largest = set()
            if mode:
                sizes = [d["spans"][j]["font_size"] for j in idx]
                if sizes and max(sizes) - min(sizes) >= 3.0:
                    mx = max(sizes)
                    largest = {k for k, s in enumerate(sizes) if s == mx}
            for k, j in enumerate(idx):
                t = normalize_space(d["spans"][j]["text"])
                got = header.label_header_line_fitted(t, k in largest)
                rules = header.label_header_line_rules(t, k in largest)
                assert got == d["line_fields"][j] == rules, (i, t[:50])
                checked += 1
    assert checked > 2000


def test_leftnote_fitted_matches_truth_and_fixture():
    for i in range(300, 420):
        d = generate_doc(i)
        for j, lab in enumerate(d["line_labels"]):
            if ZONE_OF[lab] != "leftnote":
                continue
            t = normalize_space(d["spans"][j]["text"])
            assert (leftnote.label_leftnote_line_fitted(t)
                    == d["line_fields"][j]
                    == leftnote.label_leftnote_line_rules(t)), t[:50]
    for t, gold in tf.LEFTNOTE_FIXTURE:
        assert leftnote.label_leftnote_line_fitted(t) == gold, t[:50]
        assert leftnote.label_leftnote_line_rules(t) == gold, t[:50]


def test_parse_zone_fitted_equals_rules():
    """End-to-end parser outputs identical under both label paths."""
    for i in range(300, 340):
        d = generate_doc(i)
        hdr_lines = [d["spans"][j]["text"]
                     for j, lab in enumerate(d["line_labels"])
                     if ZONE_OF[lab] == "header"]
        ln_lines = [d["spans"][j]["text"]
                    for j, lab in enumerate(d["line_labels"])
                    if ZONE_OF[lab] == "leftnote"]
        assert (header.parse_header_zone(hdr_lines)
                == header.parse_header_zone(hdr_lines, use_rules=True))
        assert (leftnote.parse_leftnote_zone(ln_lines)
                == leftnote.parse_leftnote_zone(ln_lines, use_rules=True))


def test_retraining_converges_smoke():
    data = list(tf.header_examples(0, 25))
    W, _ = tf.train(data, len(header.HEADER_LABELS),
                    len(header.HEADER_FEATURES))
    for feats, gold in data:
        scores = [sum(W[j][f] for f in feats)
                  for j in range(len(header.HEADER_LABELS))]
        assert scores.index(max(scores)) == gold
