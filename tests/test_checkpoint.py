"""Kill/restart resumability (BASELINE.md target: exact resume mid-run)."""

import json

import pyspark.sql.functions as F

from grobid_medical_report_spark.corpus import corpus_df, expected_docs
from grobid_medical_report_spark.plans.checkpoint import (
    completed_parts, read_results, run_with_checkpoint)

N = 40
N_PARTS = 6


def test_resume_after_kill_is_exact(spark, tmp_path):
    out = str(tmp_path / "out")
    df = corpus_df(spark, N)

    # simulated crash: only 1 chunk (2 parts) commits
    done = run_with_checkpoint(spark, df, out, run_id="r1",
                               n_parts=N_PARTS, chunk_size=2, max_chunks=1)
    assert done == 1
    assert len(completed_parts(spark, out, "r1")) == 2
    partial = read_results(spark, out).count()
    assert 0 < partial < N

    # restart with same run_id: processes only the remainder
    run_with_checkpoint(spark, df, out, run_id="r1",
                        n_parts=N_PARTS, chunk_size=2)
    assert len(completed_parts(spark, out, "r1")) == N_PARTS

    res = read_results(spark, out)
    assert res.count() == N
    assert res.select("doc_id").distinct().count() == N  # no duplicates

    # results identical to golden oracle despite the mid-run kill
    exp = {d["doc_id"]: d for d in expected_docs(N)}
    for r in res.collect():
        want = [(s["kind"], s["text"], s["media_ref"], s["order"])
                for s in exp[r["doc_id"]]["expected_spans"]]
        got = [(s.kind, s.text, s.media_ref, s.order) for s in r.spans]
        assert got == want


def test_checkpoint_lineage_metrics(spark, tmp_path):
    out = str(tmp_path / "out2")
    run_with_checkpoint(spark, corpus_df(spark, 20), out, run_id="r2",
                        n_parts=4, chunk_size=4)
    ckpt = spark.read.parquet(out + "/_checkpoint")
    rows = ckpt.filter(F.col("run_id") == "r2").collect()
    assert {r["part_id"] for r in rows} == {0, 1, 2, 3}
    assert sum(r["docs"] for r in rows) == 20
    total_spans = sum(r["rows_out"] for r in rows)
    hist_total = sum(sum(json.loads(r["label_histogram"]).values()) for r in rows)
    assert total_spans == hist_total > 0
    # histogram carries real zone labels
    kinds = set()
    for r in rows:
        kinds |= set(json.loads(r["label_histogram"]))
    assert {"header", "leftnote", "section", "paragraph"} <= kinds


def test_staged_input_reused_on_resume(spark, tmp_path):
    """The keyed input is staged ONCE: a resumed run must reuse the staged
    parquet (same files, same mtimes), not re-run the upstream — the fix
    for the n_chunks x source re-read (r3)."""
    import os

    out = str(tmp_path / "out3")
    run_with_checkpoint(spark, corpus_df(spark, 16), out, run_id="r3",
                        n_parts=4, chunk_size=2, max_chunks=1)  # kill at 1/2
    staged = out + "/_staged_input"
    assert os.path.exists(os.path.join(staged, "_SUCCESS"))
    before = {f: os.path.getmtime(os.path.join(dp, f))
              for dp, _dn, fns in os.walk(staged) for f in fns}
    run_with_checkpoint(spark, corpus_df(spark, 16), out, run_id="r3",
                        n_parts=4, chunk_size=2)                # resume
    after = {f: os.path.getmtime(os.path.join(dp, f))
             for dp, _dn, fns in os.walk(staged) for f in fns}
    assert before == after                   # stage untouched by resume
    res = read_results(spark, out)
    assert res.select("doc_id").distinct().count() == 16


def test_staged_manifest_blocks_mismatched_resume(spark, tmp_path):
    """A resume whose n_parts disagrees with the staging run's manifest
    must FAIL FAST: silently reusing the stage would never process staged
    part_ids beyond the old range while still reporting success (ADVICE
    r3). Same out_dir + same n_parts keeps working."""
    import pytest

    out = str(tmp_path / "out4")
    run_with_checkpoint(spark, corpus_df(spark, 12), out, run_id="m1",
                        n_parts=4, chunk_size=2, max_chunks=1)
    with pytest.raises(ValueError, match="n_parts"):
        run_with_checkpoint(spark, corpus_df(spark, 12), out, run_id="m1",
                            n_parts=8, chunk_size=2)
    # matching arguments still resume fine
    run_with_checkpoint(spark, corpus_df(spark, 12), out, run_id="m1",
                        n_parts=4, chunk_size=2)
    assert read_results(spark, out).select("doc_id").distinct().count() == 12
