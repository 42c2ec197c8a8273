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
