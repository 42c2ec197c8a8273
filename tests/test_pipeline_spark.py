"""Distributed pipeline correctness: Spark mapInPandas output == golden oracle."""

import pyspark.sql.functions as F

from grobid_medical_report_spark.corpus import corpus_df, expected_docs
from grobid_medical_report_spark.plans.pipeline import extract, result_spans

N = 60


def test_spark_span_sequence_equality(spark):
    ext = extract(corpus_df(spark, N)).collect()
    exp = {d["doc_id"]: d for d in expected_docs(N)}
    assert len(ext) == N
    for r in ext:
        e = exp[r["doc_id"]]
        assert r["status"] == "ok"
        got = [(s.kind, s.text, s.media_ref, s.order) for s in r.spans]
        want = [(s["kind"], s["text"], s["media_ref"], s["order"])
                for s in e["expected_spans"]]
        assert got == want, f"span mismatch for {r['doc_id']}"
        assert r["header"]["docnum"] == e["header"]["docnum"]
        assert list(r["header"]["medics"]) == e["header"]["medics"]
        ents = [(x["type"], x["text"], x["start"], x["end"], x["span_order"])
                for x in r["entities"]]
        wents = [(x["type"], x["text"], x["start"], x["end"], x["span_order"])
                 for x in e["entities"]]
        assert ents == wents, f"entity mismatch for {r['doc_id']}"


def test_repartitioned_path_equivalence(spark):
    df = corpus_df(spark, 30)
    a = {r["doc_id"]: [tuple(s) for s in r.spans]
         for r in extract(df, repartition_to=16).collect()}
    b = {r["doc_id"]: [tuple(s) for s in r.spans]
         for r in extract(df).collect()}
    assert a == b


def test_oversize_quarantine_spark(spark):
    ext = extract(corpus_df(spark, 30), max_spans=40)
    agg = (ext.groupBy("status").count().collect())
    statuses = {r["status"]: r["count"] for r in agg}
    assert statuses.get("ok", 0) > 0
    assert statuses.get("oversize", 0) > 0  # big docs routed to quarantine
    # quarantined docs keep their identity for the resume path
    q = ext.filter(F.col("status") == "oversize").select("doc_id").collect()
    assert all(r["doc_id"].startswith("doc_") for r in q)


def test_result_spans_flat_contract(spark):
    flat = result_spans(extract(corpus_df(spark, 10)))
    assert flat.columns == ["doc_id", "order", "kind", "text", "media_ref"]
    n = flat.count()
    exp = sum(len(d["expected_spans"]) for d in expected_docs(10))
    assert n == exp
