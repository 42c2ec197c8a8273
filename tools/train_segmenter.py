"""Fit the segmenter's emission weights from the golden training set.

The reference trains its models from annotated corpora
(MedicalReportTrainerRunner.java:19-80, gradle train_* tasks,
build.gradle:192-338); this is the engine's analog: a STRUCTURED PERCEPTRON
over the per-line feature matrix (segmenter.line_features), decoded with the
SAME Viterbi + B-I transition constraints used at inference, updated until
zero training errors, and committed as a model artifact
(grobid_medical_report_spark/models/segmenter_model.json).

Training set = golden corpus docs 0..299 in three views:
  * text-only full docs (first_chunk=True)
  * layout-enriched full docs (font/size/bold/x features active)
  * page-2+ suffix chunks (first_chunk=False — the giant-doc chunk path,
    where the front-matter gate is closed)
Gold labels come from the generator's truth line labels (annex lines map to
the B-/I- states by the ANNEXE marker).

Run from the repo root:  python tools/train_segmenter.py
Held-out validation (docs 300..499 + the reference fixtures) lives in
tests/test_fitted_segmenter.py and the standing golden suites.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from grobid_medical_report_spark.corpus import ZONE_OF, generate_doc  # noqa: E402
from grobid_medical_report_spark.operators import segmenter as seg  # noqa: E402

N_TRAIN = 300
MAX_EPOCHS = 60


def _doc_views(i: int):
    """(texts, is_media, first_chunk, layout, gold_states) views of doc i."""
    for layout_mode in (False, True):
        d = generate_doc(i, layout=layout_mode)
        texts = [s["text"] for s in d["spans"]]
        is_media = np.array([s["kind"] == "media" for s in d["spans"]])
        lay = None
        if layout_mode:
            lay = {"size": np.array([s["font_size"] for s in d["spans"]]),
                   "bold": np.array([s["bold"] for s in d["spans"]]),
                   "x": np.array([s["x"] for s in d["spans"]]),
                   "font": np.array([s["font"] for s in d["spans"]],
                                    dtype=object)}
        gold = []
        for j, lab in enumerate(d["line_labels"]):
            z = ZONE_OF[lab]
            if z == "annex":
                z = ("annex_b" if not is_media[j]
                     and seg.RE_ANNEX_START.match(texts[j]) else "annex_i")
            gold.append(seg._Z[z])
        yield texts, is_media, True, lay, np.array(gold)
        # page-2+ suffix chunk (first_chunk=False): no front matter
        pages = [j for j, lab in enumerate(d["line_labels"]) if lab == "page"]
        if len(pages) >= 2 and not layout_mode:
            s0 = pages[0] + 1
            sub_lay = None
            yield (texts[s0:], is_media[s0:], False, sub_lay,
                   np.array(gold[s0:]))


def build_training_set():
    out = []
    for i in range(N_TRAIN):
        for texts, is_media, fc, lay, gold in _doc_views(i):
            X = seg.line_features(texts, is_media, fc, lay)
            gate = seg.annex_marker_mask(texts, is_media)
            out.append((X, gate, gold))
    return out


def decode(X: np.ndarray, gate: np.ndarray, W: np.ndarray) -> np.ndarray:
    em = X @ W.T
    em[~gate, seg._Z["annex_b"]] = -1e9
    if em[:, seg._Z["annex_b"]].max() < 0:
        return np.argmax(em, axis=1)
    return seg.viterbi(em)


def train(examples) -> tuple[np.ndarray, int]:
    k, d = len(seg.STATES), len(seg.FEATURES)
    W = np.zeros((k, d))
    for epoch in range(MAX_EPOCHS):
        errors = 0
        for X, gate, gold in examples:
            pred = decode(X, gate, W)
            bad = pred != gold
            if bad.any():
                errors += int(bad.sum())
                np.add.at(W, gold[bad], X[bad])
                np.subtract.at(W, pred[bad], X[bad])
        print(f"epoch {epoch}: {errors} line errors")
        if errors == 0:
            return W, epoch
    raise SystemExit(f"did not converge in {MAX_EPOCHS} epochs")


def main() -> None:
    examples = build_training_set()
    n_lines = sum(len(g) for _, _, g in examples)
    print(f"training on {len(examples)} doc views, {n_lines} lines")
    W, epochs = train(examples)
    path = seg.MODEL_PATH
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump({
            "states": seg.STATES,
            "features": list(seg.FEATURES),
            "W": W.tolist(),
            "meta": {"algorithm": "structured perceptron, fixed B-I "
                                  "transition constraints",
                     "train_docs": N_TRAIN,
                     "views": "text + layout + page2+ chunks",
                     "epochs_to_zero_errors": epochs,
                     "train_lines": n_lines},
        }, f, indent=1)
    print(f"wrote {path} (converged after epoch {epochs})")


if __name__ == "__main__":
    main()
