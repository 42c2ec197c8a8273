"""Training-data sink: labels must agree with the golden truth labels."""

from grobid_medical_report_spark.corpus import (ZONE_OF, corpus_df,
                                                expected_docs, generate_doc)
from grobid_medical_report_spark.operators.training import (training_data,
                                                            write_training_data)


def test_segmenter_labels_match_truth(spark):
    n = 25
    rows = (training_data(corpus_df(spark, n))
            .filter("model = 'medical-report-segmenter'").collect())
    truth = {d["doc_id"]: [ZONE_OF[lab] for lab in d["line_labels"]]
             for d in expected_docs(n)}
    assert rows
    for r in rows:
        assert r["label"] == truth[r["doc_id"]][r["line_idx"]]


def test_body_labels_match_truth(spark):
    n = 25
    rows = (training_data(corpus_df(spark, n))
            .filter("model = 'full-medical-text'").collect())
    truth = {d["doc_id"]: d["line_labels"] for d in expected_docs(n)}
    for r in rows:
        want = truth[r["doc_id"]][r["line_idx"]]
        want = {"media_figure": "media", "media_table": "media"}.get(want, want)
        assert r["label"] == want


def test_features_sane():
    import pandas as pd

    from grobid_medical_report_spark.operators.training import _training_batches

    d = generate_doc(3)
    pdf = pd.DataFrame({"doc_id": [d["doc_id"]], "spans": [d["spans"]]})
    out = next(_training_batches(iter([pdf])))
    seg = out[out["model"] == "medical-report-segmenter"]
    assert len(seg) == len(d["spans"])
    f0 = seg.iloc[0]["features"]
    assert 0.0 <= f0["upper_ratio"] <= 1.0
    assert 0 <= f0["rel_pos_bin"] <= 9


def test_write_partitioned_by_model(spark, tmp_path):
    from grobid_medical_report_spark.operators.training import TRAINING_MODELS
    out = str(tmp_path / "train")
    write_training_data(corpus_df(spark, 8), out)
    got = spark.read.parquet(out)
    assert {r["model"] for r in got.select("model").distinct().collect()} == \
        set(TRAINING_MODELS)


def test_header_labels_consistent_with_parser():
    """The training labeler and the production header parser must agree:
    a line labeled `docnum`/`dateline`/`medic`/`patient` must surface in the
    corresponding parsed field — drift between the two cascades fails here."""
    from grobid_medical_report_spark.functions.textnorm import normalize_space
    from grobid_medical_report_spark.operators.header import parse_header_zone
    from grobid_medical_report_spark.operators.training import \
        label_header_line

    checked = 0
    for d in expected_docs(40):
        doc = generate_doc(int(d["doc_id"].split("_")[1]))
        header_lines = [normalize_space(s["text"]) for s, lab in
                        zip(sorted(doc["spans"], key=lambda s: s["offset"]),
                            d["line_labels"])
                        if ZONE_OF[lab] == "header"]
        if not header_lines:
            continue
        parsed = parse_header_zone(header_lines)
        for t in header_lines:
            lab = label_header_line(t)
            if lab == "docnum":
                assert t.split("°", 1)[1].strip() in parsed["header"]["docnum"]
            elif lab == "dateline":
                assert t in parsed["header"]["dateline"]
            elif lab == "medic":
                assert any(m["persname"] in t for m in parsed["medics"])
            elif lab == "patient":
                # a mixed line carries name+birthdate+address; the parsed
                # patient entry is the extracted persname segment
                from grobid_medical_report_spark.operators.subentity import \
                    parse_patient_line
                want = parse_patient_line(t)["persname"] or t
                assert any(want == p for p in parsed["header"]["patients"])
            checked += 1
    assert checked > 50


def test_ner_bio_roundtrip():
    """BIO token labels must reconstruct the entity surfaces: for every
    entity whose boundaries align to whitespace tokens, joining its B-/I-
    tokens yields the entity text."""
    from grobid_medical_report_spark.operators.ner import extract_entities
    from grobid_medical_report_spark.operators.training import bio_labels

    texts = [
        "Patiente admise pour pneumopathie. Traitement par Daptomycine "
        "1500 mg et surveillance.",
        "Madame Anne ROUX opérée le 13/03/1992 par Docteur Paul MARTIN.",
    ]
    for t in texts:
        toks = bio_labels(t)
        ents = extract_entities(t)
        assert any(lab != "O" for _, lab in toks)
        # recompute the same token offsets and check label-per-offset
        offsets, pos = [], 0
        for tok in t.split(" "):
            offsets.append(pos)
            pos += len(tok) + 1
        by_start = dict(zip(offsets, toks))
        for e in ents:
            for start, (tok, lab) in by_start.items():
                if e["start"] <= start < e["end"]:
                    want = ("B-" if start == e["start"] else "I-") + e["type"]
                    assert lab == want, (e, tok, lab, want)
            # the entity start must align to a token start (B- anchor exists)
            assert by_start[e["start"]][1] == "B-" + e["type"]


def test_sub_entity_models_emitted_and_consistent(spark):
    """The six sub-entity trainers (reference build.gradle:179-189) emit
    token rows whose B-/I- segments agree with the cascade's own parses."""
    from grobid_medical_report_spark.corpus import corpus_df
    from grobid_medical_report_spark.operators.header import parse_person_name
    from grobid_medical_report_spark.operators.training import (
        TRAINING_MODELS, training_data)

    td = training_data(corpus_df(spark, 80)).cache()
    models = {r["model"] for r in td.select("model").distinct().collect()}
    assert set(TRAINING_MODELS) <= models, models

    # medic: per line exactly one B-persname, before exactly one B-role
    rows = (td.filter("model = 'medic'")
              .orderBy("doc_id", "line_idx", "tok_idx").collect())
    by_line: dict = {}
    for r in rows:
        by_line.setdefault((r["doc_id"], r["line_idx"]), []).append(r)
    assert by_line
    for toks in by_line.values():
        labs = [t["label"] for t in toks]
        assert labs.count("B-persname") == 1
        assert labs.count("B-role") == 1
        assert labs.index("B-persname") < labs.index("B-role")

    # name-person-medical: re-derive fields from the labeled tokens and
    # compare with parse_person_name of the reassembled name
    rows = (td.filter("model = 'name-person-medical'")
              .orderBy("doc_id", "line_idx", "tok_idx").collect())
    by_line = {}
    for r in rows:
        by_line.setdefault((r["doc_id"], r["line_idx"]), []).append(r)
    assert by_line
    for toks in by_line.values():
        name = " ".join(t["text"] for t in toks)
        pn = parse_person_name(name)
        got = {f: " ".join(t["text"] for t in toks
                           if t["label"].endswith(f))
               for f in ("title", "forename", "middlename", "surname")}
        for f in ("title", "forename", "middlename", "surname"):
            assert got[f] == pn[f], (name, f, got[f], pn[f])

    # dateline: every line has one B-placename and one B-date
    rows = td.filter("model = 'dateline'").collect()
    by_line = {}
    for r in rows:
        by_line.setdefault((r["doc_id"], r["line_idx"]), []).append(r)
    assert by_line
    for toks in by_line.values():
        labs = [t["label"] for t in toks]
        assert labs.count("B-placename") == 1 and labs.count("B-date") == 1

    # address: streetnumber/streetname/postcode/city labels only
    rows = td.filter("model = 'address'").collect()
    assert rows
    for r in rows:
        assert r["label"] == "O" or r["label"].split("-", 1)[1] in (
            "streetnumber", "streetname", "postcode", "city")
    # organization: pole/service hierarchy labels
    rows = td.filter("model = 'organization'").collect()
    assert rows
    for r in rows:
        assert r["label"] == "O" or r["label"].split("-", 1)[1] in (
            "pole", "service")
    td.unpersist()
