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
    out = str(tmp_path / "train")
    write_training_data(corpus_df(spark, 8), out)
    got = spark.read.parquet(out)
    assert {r["model"] for r in got.select("model").distinct().collect()} == \
        {"medical-report-segmenter", "full-medical-text"}
