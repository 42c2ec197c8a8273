"""Feature composition: chunked giant-doc extraction UNDER the resumable
checkpoint runner, killed mid-run — the strategies must compose without
duplicating or losing documents."""

from grobid_medical_report_spark.corpus import corpus_df, expected_docs
from grobid_medical_report_spark.plans.checkpoint import (read_results,
                                                          run_with_checkpoint)
from grobid_medical_report_spark.plans.chunked import extract_chunked

N = 30


def test_chunked_resumable_kill_restart(spark, tmp_path):
    out = str(tmp_path / "out")
    df = corpus_df(spark, N)

    def chunked_fn(d, max_spans=None):
        return extract_chunked(d, giant_threshold=80, pages_per_chunk=2,
                               max_spans=max_spans)

    done = run_with_checkpoint(spark, df, out, run_id="c1", n_parts=4,
                               chunk_size=1, max_chunks=2,
                               extract_fn=chunked_fn)
    assert done == 2
    partial = read_results(spark, out).count()
    assert 0 < partial < N

    run_with_checkpoint(spark, df, out, run_id="c1", n_parts=4,
                        chunk_size=1, extract_fn=chunked_fn)
    res = read_results(spark, out)
    assert res.count() == N
    assert res.select("doc_id").distinct().count() == N

    exp = {d["doc_id"]: d for d in expected_docs(N)}
    for r in res.collect():
        want = [(s["kind"], s["text"], s["media_ref"], s["order"])
                for s in exp[r["doc_id"]]["expected_spans"]]
        got = [(s.kind, s.text, s.media_ref, s.order) for s in r.spans]
        assert got == want, r["doc_id"]


def test_driver_contract_registry_consistent(spark):
    """Every oracle key must name a registered query, and every query must
    build a DataFrame with non-empty schema (catches registry drift and
    lazily-broken imports without running the data)."""
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    os_ = entrymod.oracle_sql()
    assert set(os_) <= set(qs), sorted(set(os_) - set(qs))
    # spot-build a handful across modules (full build of all 82 is the
    # oracle gate's job; this guards imports and signatures)
    for name in ("q1_pricing_summary", "q21_waiting_suppliers",
                 "q_doc_decontaminate", "q_event_funnel",
                 "q_doc_tfidf_top_terms", "q_emb_near_dup"):
        df = qs[name](spark, "/root/testdata/sf0.001")
        assert df.schema.fields, name
