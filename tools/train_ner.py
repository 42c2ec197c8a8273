"""Fit the NER tagger's BIO emission weights from annotated text.

The reference's fr-medical-ner is a trained CRF
(FrenchMedicalNERParser.java:79-271, trainer build.gradle train_* set);
this is the engine's analog: a token-level structured perceptron over
candidate-derived features (operators/ner.py: NER_FEATURES), decoded with
the same structural-BIO Viterbi used at inference, trained to zero token
errors and committed as models/ner_model.json.

Training annotations:
  * golden corpus paragraph clusters of docs 0..299 (generator truth);
  * the reference's two NER fixture files (FromText / FromPDF) — the
    reference's own annotated corpus, read at train time like the fixture
    tests read them.
Held-out validation (docs 300..499 + fixture verbatim equality + rules-twin
equality) lives in tests/test_fitted_ner.py.

Run from the repo root:  python tools/train_ner.py
"""

from __future__ import annotations

import json
import os
import re
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from grobid_medical_report_spark.corpus import generate_doc  # noqa: E402
from grobid_medical_report_spark.operators import ner  # noqa: E402

N_TRAIN = 300
MAX_EPOCHS = 80

FIXTURES = (
    "/root/reference/resources/test/processFrenchMedicalNERFromText.xml",
    "/root/reference/resources/test/processFrenchMedicalNERFromPDF.xml",
)
_TAG = re.compile(r"<(/?)(\w+)>")


def fixture_examples():
    """(text, entities) pairs from the reference's annotated fixtures."""
    for path in FIXTURES:
        xml = open(path, encoding="utf-8").read()
        body = xml.split("<listEntity>")[1].split("</listEntity>")[0]
        for raw in (line.strip() for line in body.split("\n")):
            if not raw:
                continue
            plain, ents, stack = "", [], []
            for part in re.split(r"(<[^>]+>)", raw):
                m = _TAG.fullmatch(part)
                if m:
                    if m.group(1):
                        t, s = stack.pop()
                        ents.append({"type": t.lower(), "start": s,
                                     "end": len(plain)})
                    else:
                        stack.append((m.group(2), len(plain)))
                else:
                    plain += part
            yield plain, ents


def corpus_examples(lo: int, hi: int):
    """(paragraph text, entities) per merged paragraph cluster."""
    for i in range(lo, hi):
        d = generate_doc(i)
        per_span: dict[int, list] = {}
        for e in d["entities"]:
            per_span.setdefault(e["span_order"], []).append(e)
        for sp in d["expected_spans"]:
            if sp["kind"] == "paragraph":
                yield sp["text"], per_span.get(sp["order"], [])


def gold_path(text: str, toks, ents) -> np.ndarray | None:
    """Token-level gold BIO state sequence; None if spans don't align."""
    path = np.zeros(len(toks), dtype=np.int64)     # O
    starts = {s: i for i, (s, _e) in enumerate(toks)}
    ends = {e: i for i, (_s, e) in enumerate(toks)}
    for ent in ents:
        i0 = starts.get(ent["start"])
        i1 = ends.get(ent["end"])
        if i0 is None or i1 is None:
            return None
        path[i0] = ner._NS[f"B-{ent['type']}"]
        path[i0 + 1:i1 + 1] = ner._NS[f"I-{ent['type']}"]
    return path


def build_training_set(lo: int = 0, hi: int = N_TRAIN,
                       fixtures: bool = True):
    out = []
    skipped = 0
    examples = list(corpus_examples(lo, hi))
    if fixtures:
        examples += list(fixture_examples())
    for text, ents in examples:
        if ner._shortcut(text) is not None:
            continue                       # handled by structural pre-rules
        toks = ner.tokenize(text)
        cands = ner.candidates(text)
        if not toks or not cands:
            continue
        gold = gold_path(text, toks, ents)
        if gold is None:
            skipped += 1
            continue
        X = ner.token_features(text, toks, cands)
        out.append((X, gold))
    if skipped:
        raise SystemExit(f"{skipped} examples had non-token-aligned spans")
    return out


def _fuzzy_twins(examples):
    """Exact-mark-masked dropout twins (same paradigm as train_body's
    template-masked twins): for every category whose example carries BOTH
    the exact cb_/ci_ candidate marks and their fuzzy fb_/fi_ mirrors, emit
    a twin with the exact columns zeroed. On clean text the two channels
    always co-fire, so the perceptron never has to give the fuzzy channel
    standalone weight — and under OCR corruption, where only the fuzzy
    channel survives (fold-matched lexicon terms, RE_DATE_FUZZY shapes),
    the decode collapsed to the default state (observed: corrupted slash
    dates cascading to B-perstype, noisy-tier B-perstype precision 0.31).
    Twins whose category has no fuzzy mirror in the example are not
    emitted: masking those would be inherently ambiguous, which is why
    the phase is best-effort like train_body's (zero CLEAN errors
    required, twin errors minimized). As of late r7 every category has a
    mirror — the persname channel (fold-matched title + raw-cap tail)
    and the fuzzy dose extension joined value/unit/rolename/date and the
    lexicon folds — so the masked set now spans the full inventory."""
    twins = []
    for X, gold in examples:
        cols = []
        for t in ner.NER_TYPES:
            cb, ci = ner._NF[f"cb_{t}"], ner._NF[f"ci_{t}"]
            fb, fi = ner._NF[f"fb_{t}"], ner._NF[f"fi_{t}"]
            if (X[:, [cb, ci]].any() and X[:, [fb, fi]].any()):
                cols += [cb, ci]
        if cols:
            X2 = X.copy()
            X2[:, cols] = 0.0
            twins.append((X2, gold))
    return twins


def _digit_damage_twins(examples):
    """Digit-image twins (late r7): an l->1 / o->0 substitution can put a
    digit inside ANY word ('locale' -> '1ocale', 'otite' -> '0tite')
    without changing its meaning, but the resulting vector (the clean
    token's features plus the digit bit) rarely occurs in clean training,
    so its decode was a sequence-level knife edge (observed: '1ocale' ->
    B-location dragging the following punctuation into I-location;
    '0tite' -> O breaking the BIO chain so 'moyenne' fell to B-value).
    For every example, emit a twin with the digit bit set on every token
    and the gold unchanged: under the substitution model a digit image
    adds no meaning GIVEN the other features. Phased like the fuzzy
    twins — clean-zero is required, twin errors are minimized, so a
    genuinely digit-discriminated pair would simply keep its twin error
    rather than corrupt the clean decode."""
    digit = ner._NF["digit"]
    twins = []
    for X, gold in examples:
        lacking = X[:, digit] == 0.0
        if lacking.any():
            X2 = X.copy()
            X2[:, digit] = 1.0
            twins.append((X2, gold))
    return twins


def _pass(W, examples):
    errors = 0
    for X, gold in examples:
        em = X @ W.T
        pred = np.array(ner._bio_decode(em))
        bad = pred != gold
        if bad.any():
            errors += int(bad.sum())
            np.add.at(W, gold[bad], X[bad])
            np.subtract.at(W, pred[bad], X[bad])
    return errors


def _count_errors(W, examples):
    n = 0
    for X, gold in examples:
        em = X @ W.T
        n += int((np.array(ner._bio_decode(em)) != gold).sum())
    return n


def train(examples, mask_epochs: int = 10):
    k, d = len(ner.NER_STATES), len(ner.NER_FEATURES)
    W = np.zeros((k, d))
    for epoch in range(MAX_EPOCHS):
        errors = _pass(W, examples)
        print(f"epoch {epoch}: {errors} token errors")
        if errors == 0:
            break
    else:
        raise SystemExit(f"did not converge in {MAX_EPOCHS} epochs")

    twins = _fuzzy_twins(examples) + _digit_damage_twins(examples)
    if not twins:
        return W, epoch
    best, best_twin = W.copy(), _count_errors(W, twins)
    print(f"fuzzy-twin baseline: {best_twin} twin errors "
          f"({len(twins)} twins)")
    for mepoch in range(mask_epochs):
        updates = _pass(W, examples + twins)
        for _ in range(MAX_EPOCHS):
            cerr = _pass(W, examples)   # zero errors ⇒ no updates made
            if cerr == 0:
                break
        twin_errs = _count_errors(W, twins)
        print(f"fuzzy epoch {mepoch}: {updates} updates, "
              f"{cerr} clean / {twin_errs} twin errors")
        if cerr == 0 and twin_errs < best_twin:
            best, best_twin = W.copy(), twin_errs
            epoch += 1
        if updates == 0:
            break
    print(f"kept snapshot: 0 clean / {best_twin} twin errors")
    return best, epoch


def main() -> None:
    examples = build_training_set()
    n_toks = sum(len(g) for _, g in examples)
    print(f"training on {len(examples)} annotated lines, {n_toks} tokens")
    W, epochs = train(examples)
    os.makedirs(os.path.dirname(ner.NER_MODEL_PATH), exist_ok=True)
    with open(ner.NER_MODEL_PATH, "w") as f:
        json.dump({
            "states": list(ner.NER_STATES),
            "features": list(ner.NER_FEATURES),
            "W": W.tolist(),
            "meta": {"algorithm": "structured perceptron, structural BIO "
                                  "transitions",
                     "train_docs": N_TRAIN,
                     "train_lines": len(examples),
                     "train_tokens": n_toks,
                     "epochs_to_zero_errors": epochs},
        }, f, indent=1)
    print(f"wrote {ner.NER_MODEL_PATH} (converged after epoch {epochs})")


if __name__ == "__main__":
    main()
