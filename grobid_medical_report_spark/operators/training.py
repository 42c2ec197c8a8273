"""Training-data generation (SURVEY.md S7): featurized line+label tables.

The reference's ``createTraining*`` paths (FullMedicalTextParser.
createTraining:1232, segmenter createTrainingMedicalSegmentation:1122-1252)
emit paired files per model: a featurized raw file and a pre-annotated
label file — pre-annotated BY THE CURRENT MODELS, for human correction.
Here both halves are columns of ONE table — per-line features (the F2
line-feature subset that drives the segmenter) next to the model's label —
written ``partitionBy("model")`` so each model's training set is one
partition subtree. Models emitted (the reference's trainer set,
build.gradle:192-338):

* ``medical-report-segmenter``  — one row per line, zone label;
* ``full-medical-text``         — one row per body line, structure label;
* ``header-medical-report``     — one row per header-zone line, field label
                                  (the cascade order mirrors
                                  header.parse_header_zone — consistency is
                                  asserted in tests/test_training.py);
* ``left-note-medical-report``  — one row per leftnote-zone line;
* ``fr-medical-ner``            — one row per TOKEN of body paragraphs with
                                  a BIO label derived from the NER char
                                  spans (``tok_idx`` carries the position);
* the six sub-entity trainers   — ``medic``, ``patient``, ``dateline``,
  ``address``, ``organization``, ``name-person-medical`` (reference
  build.gradle:179-189): B-/I- token rows over the short strings the
  cascade routes to each child model, with segments derived from the SAME
  regex groups the parsers use (consistency asserted in
  tests/test_training.py). This completes the reference's 11-trainer set.

Feature semantics mirror SURVEY.md F2: uppercase profile, punctuation,
digit content, position bins, repetition counts (F3), length bins.
"""

from __future__ import annotations

from typing import Any, Iterator

from pyspark.sql import DataFrame

from ..functions.textnorm import normalize_space, punctuation_profile
from ..operators.body import label_body_line
from ..operators.header import RE_MEDIC_SPLIT
from ..operators.ner import extract_entities
from ..operators.segmenter import (RE_AGE, RE_BIRTH, RE_DATELINE, RE_DOCNUM,
                                   RE_DOCTYPE, RE_FAX, RE_IDNO, RE_MEDIC_LINE,
                                   RE_PADDR, RE_PATIENT_NAME, RE_POLE,
                                   RE_POSTCODE, RE_SERVICE, RE_STAFF_NAME,
                                   RE_STAFF_ORG_PHONE, RE_STAFF_ROLE,
                                   RE_STAFF_ROLE_NAME, RE_STREET, RE_TEL,
                                   segment_doc)

TRAINING_SCHEMA = (
    "model string, doc_id string, line_idx int, tok_idx int, text string, "
    "label string, "
    "features struct<n_chars:int,n_tokens:int,upper_ratio:double,"
    "digit_ratio:double,punct_profile:string,ends_colon:boolean,"
    "starts_dash:boolean,rel_pos_bin:int,repeat_count:int,is_media:boolean>"
)

TRAINING_MODELS = ("medical-report-segmenter", "full-medical-text",
                   "header-medical-report", "left-note-medical-report",
                   "fr-medical-ner",
                   # sub-entity trainers (reference build.gradle:179-189:
                   # train_medic/patient/dateline/address/organization/
                   # name_person_medical) — token rows over the short
                   # strings the cascade routes to each child model
                   "medic", "patient", "dateline", "address",
                   "organization", "name-person-medical")


def label_header_line(t: str) -> str:
    """Field label of one header-zone line — same regexes, same cascade
    order as header.parse_header_zone (the pre-annotation the reference's
    createTraining writes for correction)."""
    if RE_DOCNUM.fullmatch(t):
        return "docnum"
    if RE_DATELINE.fullmatch(t):
        return "dateline"
    if RE_MEDIC_SPLIT.fullmatch(t) and RE_MEDIC_LINE.fullmatch(t):
        return "medic"
    if RE_IDNO.fullmatch(t):
        return "idno"
    if RE_PATIENT_NAME.fullmatch(t):
        return "patient"
    if RE_BIRTH.fullmatch(t):
        return "birthdate"
    if RE_AGE.fullmatch(t):
        return "age"
    if RE_PADDR.fullmatch(t):
        return "patient_address"
    if RE_DOCTYPE.fullmatch(t):
        return "doctype"
    return "note"


def label_leftnote_line(t: str) -> str:
    """Field label of one leftnote-zone line — mirrors
    leftnote.parse_leftnote_zone."""
    if RE_POLE.fullmatch(t) or RE_SERVICE.fullmatch(t):
        return "org"
    if RE_TEL.fullmatch(t):
        return "phone"
    if RE_FAX.fullmatch(t):
        return "fax"
    if (RE_STAFF_ORG_PHONE.fullmatch(t) or RE_STAFF_ROLE_NAME.fullmatch(t)
            or RE_STAFF_NAME.fullmatch(t) or RE_STAFF_ROLE.fullmatch(t)):
        return "medic"
    if RE_POSTCODE.fullmatch(t) or RE_STREET.fullmatch(t):
        return "address"
    return "note"


def bio_labels(t: str) -> list[tuple[str, str]]:
    """(token, BIO-label) pairs for one paragraph line: whitespace tokens,
    labeled by the NER entity covering the token's start char."""
    ents = extract_entities(t)
    out: list[tuple[str, str]] = []
    pos = 0
    for tok in t.split(" "):
        start = pos
        pos += len(tok) + 1
        if not tok:
            continue
        label = "O"
        for e in ents:
            if e["start"] <= start < e["end"]:
                label = ("B-" if start == e["start"] else "I-") + e["type"]
                break
        out.append((tok, label))
    return out


def _featurize_line(t: str, i: int, n: int, counts: dict[str, int],
                    is_media: bool) -> dict[str, Any]:
    letters = sum(1 for c in t if c.isalpha())
    upper = sum(1 for c in t if c.isupper())
    digit = sum(1 for c in t if c.isdigit())
    return {
        "n_chars": len(t),
        "n_tokens": len(t.split(" ")) if t else 0,
        "upper_ratio": round(upper / letters, 4) if letters else 0.0,
        "digit_ratio": round(digit / len(t), 4) if t else 0.0,
        "punct_profile": punctuation_profile(t)[:16],
        "ends_colon": t.rstrip().endswith(":"),
        "starts_dash": t.startswith("- "),
        "rel_pos_bin": min(int(10 * i / n), 9) if n else 0,  # linearScaling
        "repeat_count": counts.get(t, 0),
        "is_media": is_media,
    }


def _seg_token_rows(model: str, doc_id: str, line_idx: int, text: str,
                    segments: list[tuple[int, int, str]],
                    out: list[dict[str, Any]]) -> None:
    """Token rows for a sub-entity model: whitespace tokens of ``text``
    labeled B-/I-<field> by char-range membership in ``segments`` (the
    begin-marker convention the reference's sub-model corpora use), 'O'
    outside every segment (separator commas, 'le' prefixes, ...)."""
    toks: list[tuple[int, str]] = []
    pos = 0
    for tok in text.split(" "):
        if tok:
            toks.append((pos, tok))
        pos += len(tok) + 1
    nt = len(toks)
    begun: set[int] = set()
    for ti, (start, tok) in enumerate(toks):
        label = "O"
        for si, (s0, s1, field) in enumerate(segments):
            if s0 <= start < s1:
                label = ("I-" if si in begun else "B-") + field
                begun.add(si)
                break
        out.append({"model": model, "doc_id": doc_id, "line_idx": line_idx,
                    "tok_idx": ti, "text": tok, "label": label,
                    "features": _featurize_line(tok, ti, nt, {}, False)})


def _person_name_segments(persname: str, base: int) -> list[tuple[int, int, str]]:
    """(start, end, field) segments of a person-name string at offset
    ``base`` — mirrors header.parse_person_name's split exactly."""
    from .header import parse_person_name

    pn = parse_person_name(persname)
    segs: list[tuple[int, int, str]] = []
    pos = base
    for tok in persname.split(" "):
        if tok:
            if tok == pn["title"] and not any(f == "title" for *_, f in segs):
                segs.append((pos, pos + len(tok), "title"))
            elif tok == pn["surname"] and pos + len(tok) == base + len(persname):
                segs.append((pos, pos + len(tok), "surname"))
            elif tok == pn["forename"] and all(f != "forename" for *_, f in segs):
                segs.append((pos, pos + len(tok), "forename"))
            else:
                segs.append((pos, pos + len(tok), "middlename"))
        pos += len(tok) + 1
    return segs


def _sub_entity_rows(doc_id: str, line_idx: int, t: str, zone: str,
                     header_label: str, out: list[dict[str, Any]]) -> None:
    """Training rows for the six sub-entity models from one front-matter
    line (the cascade's child-model routing, SURVEY.md C3)."""
    if zone == "header":
        if header_label == "medic":
            m = RE_MEDIC_SPLIT.fullmatch(t)
            if m:
                _seg_token_rows("medic", doc_id, line_idx, t,
                                [(m.start(1), m.end(1), "persname"),
                                 (m.start(2), m.end(2), "role")], out)
                _seg_token_rows("name-person-medical", doc_id, line_idx,
                                m.group(1),
                                _person_name_segments(m.group(1), 0), out)
        elif header_label == "dateline":
            m = RE_DATELINE.fullmatch(t)
            if m:
                segs = [(m.start(1), m.end(1), "placename"),
                        (m.start(2), m.end(2), "date")]
                if m.group(3):
                    segs.append((m.start(3), m.end(3), "time"))
                _seg_token_rows("dateline", doc_id, line_idx, t, segs, out)
        elif header_label == "idno":
            i = t.index(":") + 1
            while i < len(t) and t[i] == " ":
                i += 1
            _seg_token_rows("patient", doc_id, line_idx, t,
                            [(i, len(t), "id")], out)
        elif header_label == "patient":
            from .subentity import RE_PATIENT_MIXED
            m = RE_PATIENT_MIXED.fullmatch(t)
            if m:
                # mixed line: name + birthdate + address in one string —
                # the token-granularity case (PatientParser.java:58-222)
                _seg_token_rows("patient", doc_id, line_idx, t,
                                [(m.start(1), m.end(1), "persname"),
                                 (m.start(2), m.end(2), "birthdate"),
                                 (m.start(3), m.end(3), "address")], out)
                _seg_token_rows("name-person-medical", doc_id, line_idx,
                                m.group(1),
                                _person_name_segments(m.group(1), 0), out)
            else:
                _seg_token_rows("patient", doc_id, line_idx, t,
                                [(0, len(t), "persname")], out)
                _seg_token_rows("name-person-medical", doc_id, line_idx, t,
                                _person_name_segments(t, 0), out)
        elif header_label == "birthdate":
            i = t.index("le ") + 3
            _seg_token_rows("patient", doc_id, line_idx, t,
                            [(i, len(t), "birthdate")], out)
        elif header_label == "age":
            _seg_token_rows("patient", doc_id, line_idx, t,
                            [(0, len(t), "age")], out)
        elif header_label == "patient_address":
            i = t.index(":") + 1
            while i < len(t) and t[i] == " ":
                i += 1
            _seg_token_rows("patient", doc_id, line_idx, t,
                            [(i, len(t), "address")], out)
    elif zone == "leftnote":
        if header_label == "org":
            # pole/service hierarchy split (OrganizationParser labels);
            # a combined line splits at the SERVICE keyword, the dash
            # separator (mixed shape) stays O
            i = t.find("SERVICE")
            if i > 0:
                _seg_token_rows("organization", doc_id, line_idx, t,
                                [(0, len(t[:i].rstrip(" -")), "pole"),
                                 (i, len(t), "service")], out)
            else:
                _seg_token_rows("organization", doc_id, line_idx, t,
                                [(0, len(t),
                                  "service" if i == 0 else "pole")], out)
        elif header_label == "address":
            from .subentity import RE_ADDR_FULL
            m = RE_ADDR_FULL.fullmatch(t)
            if m:
                _seg_token_rows("address", doc_id, line_idx, t,
                                [(m.start(1), m.end(1), "streetnumber"),
                                 (m.start(2), m.end(2), "streetname"),
                                 (m.start(3), m.end(3), "postcode"),
                                 (m.start(4), m.end(4), "city")], out)
            elif RE_POSTCODE.fullmatch(t):
                sp = t.index(" ")
                _seg_token_rows("address", doc_id, line_idx, t,
                                [(0, sp, "postcode"),
                                 (sp + 1, len(t), "city")], out)
            elif RE_STREET.fullmatch(t):
                comma = t.index(",")
                _seg_token_rows("address", doc_id, line_idx, t,
                                [(0, comma, "streetnumber"),
                                 (comma + 1, len(t), "streetname")], out)


def _training_batches(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
    import numpy as np
    import pandas as pd

    for pdf in batches:
        out: list[dict[str, Any]] = []
        for doc_id, spans in zip(pdf["doc_id"], pdf["spans"]):
            spans = sorted(spans, key=lambda s: s["offset"])
            texts = [normalize_space(s["text"] or "") for s in spans]
            is_media = np.array([s["kind"] == "media" for s in spans], bool)
            counts: dict[str, int] = {}
            for t in texts:
                if t:
                    counts[t] = counts.get(t, 0) + 1
            zones = segment_doc(texts, is_media)
            n = len(texts)
            for i, (t, z) in enumerate(zip(texts, zones)):
                feats = _featurize_line(t, i, n, counts, bool(is_media[i]))
                out.append({"model": "medical-report-segmenter",
                            "doc_id": doc_id, "line_idx": i, "tok_idx": -1,
                            "text": t, "label": z, "features": feats})
                if z == "header":
                    hl = label_header_line(t)
                    out.append({"model": "header-medical-report",
                                "doc_id": doc_id, "line_idx": i, "tok_idx": -1,
                                "text": t, "label": hl, "features": feats})
                    _sub_entity_rows(doc_id, i, t, "header", hl, out)
                elif z == "leftnote":
                    ll = label_leftnote_line(t)
                    out.append({"model": "left-note-medical-report",
                                "doc_id": doc_id, "line_idx": i, "tok_idx": -1,
                                "text": t, "label": ll, "features": feats})
                    _sub_entity_rows(doc_id, i, t, "leftnote", ll, out)
                elif z == "body":
                    prev_media = bool(i > 0 and is_media[i - 1]
                                      and zones[i - 1] == "body")
                    fine = label_body_line(t, bool(is_media[i]), prev_media)
                    out.append({"model": "full-medical-text",
                                "doc_id": doc_id, "line_idx": i, "tok_idx": -1,
                                "text": t, "label": fine, "features": feats})
                    if fine == "paragraph":
                        toks = bio_labels(t)
                        nt = len(toks)
                        for ti, (tok, lab) in enumerate(toks):
                            out.append({
                                "model": "fr-medical-ner", "doc_id": doc_id,
                                "line_idx": i, "tok_idx": ti, "text": tok,
                                "label": lab,
                                "features": _featurize_line(tok, ti, nt, {},
                                                            False)})
        yield pd.DataFrame(out, columns=["model", "doc_id", "line_idx",
                                         "tok_idx", "text", "label",
                                         "features"])


def training_data(df: DataFrame) -> DataFrame:
    """(doc_id, spans) -> per-line training rows for both line models."""
    return df.mapInPandas(_training_batches, schema=TRAINING_SCHEMA)


def write_training_data(df: DataFrame, path: str) -> None:
    """S7 sink: one partition subtree per model."""
    training_data(df).write.mode("overwrite").partitionBy("model").parquet(path)
