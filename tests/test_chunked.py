"""Page-chunked giant-doc processing must be span-identical to the
whole-doc kernel (the skew path cannot change results)."""

import pyspark.sql.functions as F

from grobid_medical_report_spark.corpus import corpus_df, expected_docs
from grobid_medical_report_spark.plans.chunked import (
    extract_chunked, size_bucketed_repartition)
from grobid_medical_report_spark.plans.pipeline import extract

N = 40


def _span_map(rows):
    return {r["doc_id"]: [(s.kind, s.text, s.media_ref, s.order)
                          for s in r.spans] for r in rows}


def test_chunked_equals_unchunked(spark):
    df = corpus_df(spark, N)
    # low threshold + small chunks => even medium docs take the chunk path
    chunked = extract_chunked(df, giant_threshold=60, pages_per_chunk=2).collect()
    plain = extract(df).collect()
    assert _span_map(chunked) == _span_map(plain)

    ents = {r["doc_id"]: [tuple(e) for e in r.entities] for r in chunked}
    ents_plain = {r["doc_id"]: [tuple(e) for e in r.entities] for r in plain}
    assert ents == ents_plain

    zones = {r["doc_id"]: [tuple(z) for z in r.zones] for r in chunked}
    zones_plain = {r["doc_id"]: [tuple(z) for z in r.zones] for r in plain}
    assert zones == zones_plain

    hdr = {r["doc_id"]: r.header for r in chunked}
    hdr_plain = {r["doc_id"]: r.header for r in plain}
    assert hdr == hdr_plain

    # cross-chunk marker resolution: a chunk-2 callout citing a chunk-0
    # figure must still resolve to its media_ref
    mks = {r["doc_id"]: [tuple(m) for m in r.markers] for r in chunked}
    mks_plain = {r["doc_id"]: [tuple(m) for m in r.markers] for r in plain}
    assert mks == mks_plain
    assert any(m for ms in mks.values() for m in ms), "no markers exercised"


def test_chunked_matches_golden_oracle(spark):
    exp = {d["doc_id"]: d for d in expected_docs(N)}
    rows = extract_chunked(corpus_df(spark, N), giant_threshold=100,
                           pages_per_chunk=3).collect()
    assert len(rows) == N
    for r in rows:
        want = [(s["kind"], s["text"], s["media_ref"], s["order"])
                for s in exp[r["doc_id"]]["expected_spans"]]
        got = [(s.kind, s.text, s.media_ref, s.order) for s in r.spans]
        assert got == want, r["doc_id"]


def test_chunked_preserves_layout_attrs(spark):
    """Layout-enriched giant docs must produce the SAME spans chunked or
    not — i.e. the layout attrs survive the explode/group round-trip and
    the chunk kernel still sees font/bold/x (marker-less headings resolve)."""
    from grobid_medical_report_spark.corpus import generate_doc

    df = corpus_df(spark, N, layout=True)
    chunked = extract_chunked(df, giant_threshold=60,
                              pages_per_chunk=2).collect()
    assert _span_map(chunked) == {
        d["doc_id"]: [(s["kind"], s["text"], s["media_ref"], s["order"])
                      for s in d["expected_spans"]]
        for d in (generate_doc(i, layout=True) for i in range(N))}


def test_size_bucketed_repartition_preserves_results(spark):
    df = size_bucketed_repartition(corpus_df(spark, 20), parallelism=16)
    rows = extract(df).collect()
    assert len(rows) == 20
    assert all(r["status"] == "ok" for r in rows)
    exp = {d["doc_id"]: d for d in expected_docs(20)}
    for r in rows:
        assert len(r.spans) == len(exp[r["doc_id"]]["expected_spans"])
