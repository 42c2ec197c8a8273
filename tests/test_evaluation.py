"""Evaluation harness: P/R/F math and the engine's own score on its corpus."""

import pyspark.sql.functions as F

from grobid_medical_report_spark.corpus import ZONE_OF, corpus_df, expected_docs
from grobid_medical_report_spark.operators.evaluation import (
    evaluate_labels, split_column, summary)
from grobid_medical_report_spark.operators.training import training_data


def test_prf_math(spark):
    # hand-computable case: truth = a a a b b, pred = a a b b c
    pairs = spark.createDataFrame(
        [("a", "a"), ("a", "a"), ("b", "a"), ("b", "b"), ("c", "b")],
        "predicted string, label string")
    rows = {r["label"]: r for r in evaluate_labels(pairs).collect()}
    assert rows["a"]["support"] == 3
    assert rows["a"]["precision"] == 1.0          # 2 predicted 'a', both right
    assert rows["a"]["recall"] == round(2 / 3, 4)
    assert rows["b"]["precision"] == 0.5
    assert rows["c"]["precision"] == 0.0 and rows["c"]["support"] == 0


def test_engine_scores_perfect_on_golden_corpus(spark):
    n = 20
    pred = (training_data(corpus_df(spark, n))
            .filter("model = 'medical-report-segmenter'")
            .select("doc_id", "line_idx", F.col("label").alias("predicted")))
    truth_rows = []
    for d in expected_docs(n):
        for i, lab in enumerate(d["line_labels"]):
            truth_rows.append((d["doc_id"], i, ZONE_OF[lab]))
    truth = spark.createDataFrame(truth_rows, "doc_id string, line_idx int, label string")
    pairs = pred.join(truth, ["doc_id", "line_idx"])
    per_label = evaluate_labels(pairs)
    s = summary(per_label)
    assert s["micro_recall"] == 1.0
    assert s["macro_f1"] == 1.0


def test_split_deterministic_and_disjoint(spark):
    df = split_column(corpus_df(spark, 50))
    a = {r["doc_id"]: r["split"] for r in df.select("doc_id", "split").collect()}
    b = {r["doc_id"]: r["split"] for r in df.select("doc_id", "split").collect()}
    assert a == b
    frac = sum(1 for v in a.values() if v == "train") / len(a)
    assert 0.6 < frac < 0.95


def test_ner_eval_perfect_on_golden(spark):
    """x_eval_ner must score 1.0 on every entity type: the kernel equals the
    golden oracle by construction, so any sub-1.0 score is a regression in
    either the NER stage or the eval join itself."""
    import __spark_entry__ as entrymod

    rows = entrymod.x_eval_ner(spark, "/root/testdata/sf0.001").collect()
    assert rows and all(r["f1"] == 1.0 for r in rows), \
        [(r["label"], r["f1"]) for r in rows if r["f1"] != 1.0]


def test_eval_body_and_header_fields_perfect(spark):
    """The fitted body/header/left-note models score P/R/F1 = 1.0 on the
    golden annotations through the distributed eval joins."""
    import __spark_entry__ as entry

    for q in ("x_eval_body", "x_eval_header_fields"):
        rows = entry.queries()[q](spark, "/root/testdata/sf0.001").collect()
        assert rows and all(r["f1"] == 1.0 for r in rows), q


def test_split_and_nfold_harness():
    """The reference trainer runner's split / n-fold modes
    (MedicalReportTrainerRunner.java:26-28): refit on a doc-disjoint train
    partition, score held-out docs, report per-label P/R/F1."""
    import os
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "tools"))
    import evaluate_models as ev

    r = ev.eval_split("header-medical-report", n_docs=60,
                      train_fraction=0.75)
    assert r["train_docs"] == 45 and r["eval_docs"] == 15
    assert 0.0 <= r["micro_accuracy"] <= 1.0
    assert r["n_decisions"] > 100
    from grobid_medical_report_spark.operators.header import HEADER_LABELS
    assert set(r["per_label"]) <= set(HEADER_LABELS)
    # this corpus is perfectly regular -> held-out must stay perfect; a
    # drop means the features no longer separate the grammar
    assert r["micro_accuracy"] == 1.0

    r = ev.eval_nfold("dateline", n_docs=40, folds=4)
    assert len(r["per_fold"]) == 4
    assert sum(f["eval_docs"] for f in r["per_fold"]) == 40
    assert r["micro_accuracy"] == 1.0
