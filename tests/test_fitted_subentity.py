"""Fitted sub-entity token taggers (dateline / medic / name-person) vs
their regex-group twins — segment equality on held-out strings, end-to-end
parse equality under both paths, artifact schema."""

from __future__ import annotations

import json
import os
import sys

from grobid_medical_report_spark.corpus import ZONE_OF, generate_doc
from grobid_medical_report_spark.operators import header
from grobid_medical_report_spark.operators import subentity as se

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
import train_subentity as ts  # noqa: E402


def test_artifact_schema():
    with open(se.SUB_MODEL_PATH) as f:
        m = json.load(f)
    for name, labels in se.SUB_LABELS.items():
        assert tuple(m[name]["labels"]) == labels
        assert tuple(m[name]["features"]) == se.SUB_FEATURES


def test_fitted_segments_equal_regex_twins_held_out():
    checked = 0
    for model in se.SUB_LABELS:
        for text, _feats, _gold in ts.examples(model, 300, 460):
            exp = {}
            for s0, s1, f in ts._segments_for(model, text):
                if f not in exp:
                    exp[f] = text[s0:s1]
            assert se.tag_segments(model, text) == exp, (model, text)
            checked += 1
    assert checked > 800


def test_parse_header_zone_fitted_equals_rules_subentities():
    """datelines / medics / person_names identical under both paths."""
    for i in range(300, 360):
        d = generate_doc(i)
        hdr = [d["spans"][j]["text"]
               for j, lab in enumerate(d["line_labels"])
               if ZONE_OF[lab] == "header"]
        a = header.parse_header_zone(hdr)
        b = header.parse_header_zone(hdr, use_rules=True)
        assert a == b, d["doc_id"]


def test_fixture_shapes():
    segs = se.tag_segments("dateline", "CRETEIL, le 29/04/2000")
    assert segs == {"placename": "CRETEIL", "date": "29/04/2000"}
    segs = se.tag_segments("medic", "Dr Mathieu MERLIN, Opérateur")
    assert segs == {"persname": "Dr Mathieu MERLIN", "role": "Opérateur"}
    assert header.parse_person_name_fitted("Madame Abba Voletta DUPONT") == \
        header.parse_person_name("Madame Abba Voletta DUPONT")


def test_retraining_converges_smoke():
    for model in se.SUB_LABELS:
        data = list(ts.examples(model, 0, 40))
        W, _ = ts.train(data, len(se.SUB_LABELS[model]))
        for _text, feats, gold in data:
            for f, g in zip(feats, gold):
                scores = [sum(W[j][k] for k in f)
                          for j in range(len(se.SUB_LABELS[model]))]
                assert scores.index(max(scores)) == g
