"""Fit ALL SIX sub-entity token taggers (dateline / medic / name-person /
patient / address / organization).

Gold token labels come from the same segment specs the rule twins use —
the reference's createTraining pre-annotation semantics (regex groups for
dateline/medic/patient-mixed/address, header.parse_person_name's split for
names, the SERVICE-anchored org split) — over the golden corpus
front-matter lines of docs 0..N_TRAIN plus the reference header fixture's
shapes. The patient/address/organization sets include the MIXED-field line
shapes (one line carrying name+birthdate+address; combined org / address
letterhead lines) that motivate token granularity. Multiclass perceptron
per model to zero token errors; committed as models/subentity_models.json.

Run from the repo root:  python tools/train_subentity.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from grobid_medical_report_spark.corpus import ZONE_OF, generate_doc  # noqa: E402
from grobid_medical_report_spark.functions.textnorm import \
    normalize_space  # noqa: E402
from grobid_medical_report_spark.operators import subentity as se  # noqa: E402
from grobid_medical_report_spark.operators.header import (  # noqa: E402
    RE_MEDIC_SPLIT, parse_person_name)
from grobid_medical_report_spark.operators.segmenter import \
    RE_DATELINE  # noqa: E402

N_TRAIN = 500
MAX_EPOCHS = 60

#: reference header-fixture shapes (processHeaderFromPDF.xml content)
FIXTURE_LINES = {
    "dateline": ["CRETEIL, le 29/04/2000"],
    "medic": ["Dr Mathieu MERLIN, Opérateur", "Dr Leroy BLANC, Assistant",
              "Dr Jolie MASSON, Anesthésiste"],
    "name-person-medical": ["Dr Mathieu MERLIN",
                            "Madame Abba Voletta DUPONT"],
}


def _gold_tags(model: str, text: str,
               segments: list[tuple[int, int, str]]) -> list[str]:
    toks = se.tokens_of(text)
    tags = []
    for s, _tok in toks:
        lab = "O"
        for s0, s1, field in segments:
            if s0 <= s < s1:
                lab = field
                break
        tags.append(lab)
    return tags


def _segments_for(model: str, text: str) -> list[tuple[int, int, str]]:
    if model == "dateline":
        m = RE_DATELINE.fullmatch(text)
        segs = [(m.start(1), m.end(1), "placename"),
                (m.start(2), m.end(2), "date")]
        if m.group(3):
            segs.append((m.start(3), m.end(3), "time"))
        return segs
    if model == "medic":
        m = RE_MEDIC_SPLIT.fullmatch(text)
        return [(m.start(1), m.end(1), "persname"),
                (m.start(2), m.end(2), "role")]
    pn = parse_person_name(text)
    segs = []
    pos = 0
    for tok in text.split(" "):
        if tok:
            if tok == pn["title"] and not any(f == "title" for *_, f in segs):
                segs.append((pos, pos + len(tok), "title"))
            elif tok == pn["surname"] and pos + len(tok) == len(text):
                segs.append((pos, pos + len(tok), "surname"))
            elif tok == pn["forename"] \
                    and all(f != "forename" for *_, f in segs):
                segs.append((pos, pos + len(tok), "forename"))
            else:
                segs.append((pos, pos + len(tok), "middlename"))
        pos += len(tok) + 1
    return segs


def pae_examples(model: str, lo: int, hi: int):
    """(text, gold tags) pairs for patient / address / organization: the
    per-line shapes the kernel routes to each tagger PLUS the joined
    strings the decomposition queries run on. Gold token tags come from
    the deterministic scanner twins (subentity.rule_tags) — the reference
    createTraining pre-annotation analog, now covering the FULL label
    vocabularies (r4)."""
    lines: list[str] = []
    for i in range(lo, hi):
        d = generate_doc(i)
        if model == "patient":
            for j, lab in enumerate(d["line_labels"]):
                if ZONE_OF[lab] != "header":
                    continue
                if d["line_fields"][j] in ("patient", "idno", "sex",
                                           "birthdate", "age",
                                           "patient_address"):
                    lines.append(normalize_space(d["spans"][j]["text"]))
        elif model == "address":
            for j, lab in enumerate(d["line_labels"]):
                if ZONE_OF[lab] == "leftnote" \
                        and d["line_fields"][j].startswith("address"):
                    lines.append(normalize_space(d["spans"][j]["text"]))
            lines.append(d["leftnote"]["address"])   # kernel-joined form
        else:
            for j, lab in enumerate(d["line_labels"]):
                if ZONE_OF[lab] == "leftnote" \
                        and d["line_fields"][j] in ("org", "contact",
                                                    "web", "email"):
                    lines.append(normalize_space(d["spans"][j]["text"]))
            lines.append(d["leftnote"]["org"])       # joined block form
    for text in lines:
        if not text:
            continue
        yield text, se.rule_tags(model, text)


def examples(model: str, lo: int, hi: int):
    if model in ("patient", "address", "organization"):
        for text, gold in pae_examples(model, lo, hi):
            toks = se.tokens_of(text)
            yield text, se.token_features(toks), \
                [se.SUB_LABELS[model].index(g) for g in gold]
        return
    lines: list[str] = list(FIXTURE_LINES[model])
    for i in range(lo, hi):
        d = generate_doc(i)
        for j, lab in enumerate(d["line_labels"]):
            if ZONE_OF[lab] != "header":
                continue
            t = normalize_space(d["spans"][j]["text"])
            fld = d["line_fields"][j]
            if model == "dateline" and fld == "dateline":
                lines.append(t)
            elif model == "medic" and fld == "medic":
                lines.append(t)
            elif model == "name-person-medical":
                if fld == "medic":
                    m = RE_MEDIC_SPLIT.fullmatch(t)
                    if m:
                        lines.append(m.group(1))
                elif fld == "patient":
                    m = se.RE_PATIENT_MIXED.fullmatch(t)
                    lines.append(m.group(1) if m else t)
    for text in lines:
        toks = se.tokens_of(text)
        gold = _gold_tags(model, text, _segments_for(model, text))
        yield text, se.token_features(toks), \
            [se.SUB_LABELS[model].index(g) for g in gold]


def _token_errors(W, data, n_labels):
    n = 0
    for _text, feats, gold in data:
        for f, g in zip(feats, gold):
            best, arg = None, 0
            for j in range(n_labels):
                s = sum(W[j][k] for k in f)
                if best is None or s > best:
                    best, arg = s, j
            if arg != g:
                n += 1
    return n


def train(data, n_labels, margin: float = 1.0):
    """Margin perceptron (update while score(gold) <= score(runner-up) +
    margin). Plain zero-error stopping leaves unseen-signature behavior
    underdetermined — any weight vector that separates the training set is
    accepted, and which one you get shifts with feature-set changes
    (observed r5: a retrain flipped 'France' on a held-out signature).
    Forcing a unit margin picks a centered separator, so decode on
    signatures near the training set stays stable across retrains. The
    data is separable, so margin training converges too."""
    W = [[0.0] * len(se.SUB_FEATURES) for _ in range(n_labels)]
    for epoch in range(MAX_EPOCHS):
        errors = updates = 0
        for _text, feats, gold in data:
            for f, g in zip(feats, gold):
                best, arg = None, 0
                for j in range(n_labels):
                    s = sum(W[j][k] for k in f)
                    if best is None or s > best:
                        best, arg = s, j
                s_gold = sum(W[g][k] for k in f)
                runner = max((sum(W[j][k] for k in f)
                              for j in range(n_labels) if j != g),
                             default=float("-inf"))
                if arg != g:
                    errors += 1
                if s_gold <= runner + margin:
                    updates += 1
                    loser = arg if arg != g else max(
                        (j for j in range(n_labels) if j != g),
                        key=lambda j: sum(W[j][k] for k in f))
                    for k in f:
                        W[g][k] += 1.0
                        W[loser][k] -= 1.0
        print(f"  epoch {epoch}: {errors} token errors, {updates} updates")
        if updates == 0:
            return W, epoch
    if errors == 0:
        # separable and error-free but a few margins stay tight: accept
        print(f"  stopping at {MAX_EPOCHS} epochs with 0 errors")
        return W, MAX_EPOCHS
    raise SystemExit(f"{MAX_EPOCHS} epochs without convergence")


def train_masked(data, n_labels, masked: frozenset = frozenset(),
                 margin: float = 1.0, mask_epochs: int = 8,
                 twins=None, extra_twins=None):
    """train() plus the template-dropout phase of tools/train_fields.py:
    phase 2 trains over twins — either dropout twins with the ``masked``
    feature ids removed (e.g. the case-class features allcaps/titlecase,
    which a second grammar family's re-cased letterhead flips wholesale)
    or explicitly supplied ``twins`` (e.g. the label-prefix invariance
    twins) — keeping the best snapshot whose CLEAN token decode stays
    error-free. Robustness evidence gains standalone weight; family-A
    decode is unchanged by construction (EVAL.md noisy / format-shift
    tiers)."""
    W, ep = train(data, n_labels, margin)
    if twins is None:
        twins = []
        for text, feats, gold in data:
            kept = [[k for k in f if k not in masked] for f in feats]
            if any(len(a) != len(b) for a, b in zip(kept, feats)):
                twins.append((text, kept, gold))
    if extra_twins:
        twins = list(twins) + list(extra_twins)
    if not twins:
        return W, ep
    best = [row[:] for row in W]
    best_twin = _token_errors(W, twins, n_labels)
    print(f"  mask baseline: {best_twin} twin token errors")
    for mepoch in range(mask_epochs):
        updates, _ = _one_margin_pass(W, list(data) + twins, n_labels,
                                      margin)
        for _ in range(MAX_EPOCHS):      # restore clean zero-error
            if _token_errors(W, data, n_labels) == 0:
                break
            _one_margin_pass(W, data, n_labels, margin)
        cerr = _token_errors(W, data, n_labels)
        terr = _token_errors(W, twins, n_labels)
        print(f"  mask epoch {mepoch}: {cerr} clean / {terr} twin errors")
        if cerr == 0 and terr < best_twin:
            best = [row[:] for row in W]
            best_twin = terr
        if updates == 0:
            break
    print(f"  kept snapshot: 0 clean / {best_twin} twin errors")
    return best, ep


def _one_margin_pass(W, data, n_labels, margin):
    updates = 0
    for _text, feats, gold in data:
        for f, g in zip(feats, gold):
            s_gold = sum(W[g][k] for k in f)
            scores = [(sum(W[j][k] for k in f), j)
                      for j in range(n_labels) if j != g]
            runner, loser = max(scores)
            if s_gold <= runner + margin:
                updates += 1
                for k in f:
                    W[g][k] += 1.0
                    W[loser][k] -= 1.0
    return updates, None


def prefix_twins(data, model):
    """Label-prefix invariance augmentation (r5): hospital templates often
    write a value behind a 'Label : ' prefix ('Âge : 74 ans' where another
    template says just '74 ans'). Train on neutral '"Champ : " + line'
    twins with gold ``O O + original`` so the context machine learns that
    a leading titlecase-word + colon does not change the value tags. The
    placeholder word is not any grammar family's label vocabulary — this
    encodes a template-shape prior, not family-B knowledge."""
    labels = se.SUB_LABELS[model]
    o = labels.index("O")
    out = []
    for text, feats, gold in data:
        t2 = "Champ : " + text
        toks2 = se.tokens_of(t2)
        g2 = [o, o] + list(gold)
        if len(toks2) != len(g2):
            continue
        out.append((t2, se.token_features(toks2), g2))
    out.extend(keyword_mask_twins(data, model))
    return out


def _twin_of(text, gold, model, replace: dict[str, str]):
    """Token-preserving keyword-masked twin: family-A label keywords
    swapped for neutral placeholders, gold unchanged — the training
    pressure that forces the VALUE-shape evidence (digit-length class,
    street keyword, postcode, city gazetteer, separator position) to
    carry its tags without the family-A keyword."""
    toks = text.split(" ")
    if not any(t in replace for t in toks):
        return None
    t2 = " ".join(replace.get(t, t) for t in toks)
    toks2 = se.tokens_of(t2)
    if len(toks2) != len(gold):
        return None
    labels_g = gold
    return (t2, se.token_features(toks2), list(labels_g))


def keyword_mask_twins(data, model):
    """r6 (VERDICT r5 items 6+7) keyword-masked twins, per model:

    * patient — the address-block prefix ('Demeurant'/'demeurant' ->
      placeholder) so the address VALUE tokens keep their tags when a
      second template renames the prefix; the sex value shape
      ('Sexe : F' -> 'Sexe : champx', gold unchanged) so a WORD-shaped
      value in sexe-context stays <sex>; and the id type-phrase shape
      ('IPP : <n>' -> 'Champx champy <n>' with gold idtype idtype idno —
      the structural prior that the tokens before a long id run are its
      type phrase, exactly A's own 'IPP'-before-digits structure).
    * organization — the contact keywords ('Tél'/'Fax' -> placeholders)
      so the phone/fax split rides the separator position (after_sep)
      and digit shapes instead of the keyword identity.

    Placeholders are no grammar family's vocabulary; every twin's gold is
    the unchanged family-A gold except the idno shape, whose 2-token twin
    mirrors the generator-authored family-B-native convention
    (corpus.b_native_token_gold)."""
    labels = se.SUB_LABELS[model]
    out = []
    if model == "patient":
        o = labels.index("O")
        for text, feats, gold in data:
            tw = _twin_of(text, gold, model,
                          {"Demeurant": "Champx", "demeurant": "champx"})
            if tw is not None:
                out.append(tw)
            toks = text.split(" ")
            if text.startswith("Sexe : ") and len(toks) == 3:
                tw = _twin_of(text, gold, model, {toks[2]: "champx"})
                if tw is not None:
                    out.append(tw)
                # colon-free variant: a second template fuses type+value
                t2 = "Sexe champx"
                out.append((t2, se.token_features(se.tokens_of(t2)),
                            [o, labels.index("sex")]))
            if text.startswith("IPP : ") and len(toks) == 3 \
                    and toks[2].isdigit():
                t2 = f"Champx champy {toks[2]}"
                toks2 = se.tokens_of(t2)
                g2 = [labels.index("idtype"), labels.index("idtype"),
                      labels.index("idno")]
                out.append((t2, se.token_features(toks2), g2))
                # 1-token phrase variant keeps the A arity covered too
                t3 = f"Champx {toks[2]}"
                out.append((t3, se.token_features(se.tokens_of(t3)),
                            [labels.index("idtype"), labels.index("idno")]))
    elif model == "organization":
        o = labels.index("O")
        for text, feats, gold in data:
            tw = _twin_of(text, gold, model,
                          {"Tél": "Champx", "Fax": "Champy"})
            if tw is not None:
                out.append(tw)
            # colon-FREE contact twin ('Champx <a> - Champy <b>'): a
            # second template drops the colons, so the keyword-masked
            # evidence must carry without next_colon/after_colon; built
            # from the A line's own digit groups, gold unchanged minus
            # the colon positions
            toks = text.split(" ")
            if text.startswith("Tél : ") and " - Fax : " in text:
                keep = [(t, g) for t, g in zip(toks, gold)
                        if t != ":"]
                t2 = " ".join("Champx" if t == "Tél" else
                              "Champy" if t == "Fax" else t
                              for t, _g in keep)
                toks2 = se.tokens_of(t2)
                g2 = [g for _t, g in keep]
                if len(toks2) == len(g2):
                    out.append((t2, se.token_features(toks2), g2))
    return out


def case_swap_twins(data):
    """Case-SWAP twins (r6): the case-mask dropout says case evidence may
    VANISH; a recased letterhead actually FLIPS it ('Pôle Imagerie' ->
    'PÔLE IMAGERIE' swaps titlecase for allcaps while every keyword/fold/
    context feature survives). Swapping the two case-class feature ids in
    each token vector — gold unchanged — covers the flipped vectors the
    live family-B lines present. Pure shape prior, no vocabulary."""
    ac, tc = se._SF["allcaps"], se._SF["titlecase"]
    out = []
    for text, feats, gold in data:
        swapped = []
        changed = False
        for f in feats:
            g = [tc if k == ac else ac if k == tc else k for k in f]
            changed = changed or g != f
            swapped.append(g)
        if changed:
            out.append((text, swapped, gold))
    return out


def case_mask() -> frozenset:
    """Case-class feature ids for the organization mask phase: a second
    hospital's letterhead re-cases the SAME lines ('SERVICE DE X' ->
    'Service de X', 'Pôle Y' -> upper), flipping allcaps/titlecase
    wholesale while every keyword/fold/context feature survives. Shared
    with tools/evaluate_models.py's refit."""
    return frozenset({se._SF["allcaps"], se._SF["titlecase"]})


def comma_mask() -> frozenset:
    """Comma-derived feature ids for the address mask phase: commas are
    the most fragile glyphs — OCR drops them, and a second hospital's
    template writes '79 Avenue' for '79, Avenue' — while the digit shape
    and the street keyword survive. Dropout twins without the comma
    evidence keep streetnumber/streetname decodable either way. Shared
    with tools/evaluate_models.py's refit."""
    return frozenset({se._SF["endcomma"], se._SF["post_comma"],
                      se._SF["seg_post_comma"]})


def main() -> None:
    out = {}
    for model in se.SUB_LABELS:
        data = list(examples(model, 0, N_TRAIN))
        print(f"{model}: {len(data)} strings")
        if model == "organization":
            W, ep = train_masked(data, len(se.SUB_LABELS[model]),
                                 case_mask(),
                                 extra_twins=keyword_mask_twins(data, model)
                                 + case_swap_twins(data))
        elif model == "patient":
            W, ep = train_masked(data, len(se.SUB_LABELS[model]),
                                 twins=prefix_twins(data, model))
        elif model == "address":
            W, ep = train_masked(data, len(se.SUB_LABELS[model]),
                                 comma_mask())
        else:
            W, ep = train(data, len(se.SUB_LABELS[model]))
        out[model] = {"labels": list(se.SUB_LABELS[model]),
                      "features": list(se.SUB_FEATURES), "W": W,
                      "meta": {"train_strings": len(data),
                               "epochs_to_zero_errors": ep}}
    os.makedirs(os.path.dirname(se.SUB_MODEL_PATH), exist_ok=True)
    with open(se.SUB_MODEL_PATH, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {se.SUB_MODEL_PATH}")


if __name__ == "__main__":
    main()
