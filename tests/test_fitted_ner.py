"""Fitted NER tagger (the trained half of VERDICT r1 item 6): BIO weights
learned from annotated text (tools/train_ner.py), not hand-coded resolution.

Validation:
* fitted path == rule twin on HELD-OUT corpus paragraphs (docs >= trainer's
  N_TRAIN) and on both reference NER fixtures, entity-for-entity;
* the artifact's schema matches the code;
* retraining a small subset converges to zero token errors (train loop
  health).
The fixture tests (test_ner_fixture.py / test_ner_pdf_fixture.py) and the
whole golden suite also exercise the fitted path, since it is the default
``extract_entities``.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

from grobid_medical_report_spark.operators import ner

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
import train_ner as tn  # noqa: E402


def test_artifact_schema():
    with open(ner.NER_MODEL_PATH) as f:
        m = json.load(f)
    assert tuple(m["states"]) == ner.NER_STATES
    assert tuple(m["features"]) == ner.NER_FEATURES
    assert np.array(m["W"]).shape == (len(ner.NER_STATES),
                                      len(ner.NER_FEATURES))


def test_fitted_equals_rules_and_gold_held_out():
    checked = 0
    for text, ents in tn.corpus_examples(300, 380):
        fitted = [(e["type"], e["start"], e["end"])
                  for e in ner.extract_entities(text)]
        rules = [(e["type"], e["start"], e["end"])
                 for e in ner.extract_entities_rules(text)]
        gold = sorted(((e["type"], e["start"], e["end"]) for e in ents),
                      key=lambda x: x[1])
        assert fitted == rules == gold, text[:80]
        checked += 1
    assert checked > 300


def test_fitted_matches_both_fixtures():
    n = 0
    for text, ents in tn.fixture_examples():
        fitted = [(e["type"], e["start"], e["end"])
                  for e in ner.extract_entities(text)]
        gold = sorted(((e["type"], e["start"], e["end"]) for e in ents),
                      key=lambda x: x[1])
        assert fitted == gold, text[:80]
        n += 1
    assert n >= 25


def test_segment_restricted_decode_equals_full():
    """The hot-path decode (per merged candidate interval) must equal the
    whole-sequence decode the model was trained with."""
    n = 0
    for text, _ents in list(tn.corpus_examples(380, 420)) \
            + list(tn.fixture_examples()):
        if ner._shortcut(text) is not None:
            continue
        seg = [(e["type"], e["start"], e["end"])
               for e in ner.decode_entities(text)]
        full = [(e["type"], e["start"], e["end"])
                for e in ner.decode_entities_full(text)]
        assert seg == full, text[:80]
        n += 1
    assert n > 150


def test_retraining_converges_smoke():
    examples = []
    for text, ents in list(tn.corpus_examples(0, 25)):
        if ner._shortcut(text) is not None:
            continue
        toks = ner.tokenize(text)
        cands = ner.candidates(text)
        if not toks or not cands:
            continue
        gold = tn.gold_path(text, toks, ents)
        assert gold is not None
        examples.append((ner.token_features(text, toks, cands), gold))
    W, _ = tn.train(examples)
    for X, gold in examples:
        assert (np.array(ner._bio_decode(X @ W.T)) == gold).all()


def test_single_cache_key_distinguishes_candidate_placement():
    """ADVICE r5 (medium): since r5 fuzzy-only spans can widen a merged
    interval past its single exact candidate, so (cat, shapes, fmarks) no
    longer pins the cb_/ci_ placement — two intervals identical in shapes
    and fuzzy marks but with the candidate at different token offsets must
    NOT share a _SINGLE_CACHE entry.  '(03/0z' puts the value candidate at
    token 0 of a (digit,punct,digit) fuzzy-date interval; '0z/03 mg' puts
    it at token 2 of an interval with the same shapes and fuzzy marks."""
    t_a, t_b = "(03/0z", "0z/03 mg"
    ner._SINGLE_CACHE.clear()
    seq_a = ner.decode_entities(t_a)          # seeds the cache
    seq_b = ner.decode_entities(t_b)          # must not replay t_a's tags
    # decode == memo-free whole-sequence decode, in cache-polluted order
    for t, seq in ((t_a, seq_a), (t_b, seq_b)):
        full = ner.decode_entities_full(t)
        assert [(e["type"], e["start"], e["end"]) for e in seq] == \
               [(e["type"], e["start"], e["end"]) for e in full], t
    # the two value intervals hash to DISTINCT cache entries (general
    # single-candidate keys carry the 1 marker; the r6 mirror fast path
    # uses marker 0 and a disjoint key space)
    value_keys = [k for k in ner._SINGLE_CACHE
                  if k[0] == 1 and k[1] == "value"]
    assert len(value_keys) == 2, value_keys
    # and the key carries the candidate's token-relative placement
    placements = {(k[2], k[3]) for k in value_keys}
    assert placements == {(0, 1), (2, 1)}, placements
