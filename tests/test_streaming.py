"""Streaming ingest: incremental file pickup with exactly-once progress."""

from grobid_medical_report_spark.corpus import corpus_df
from grobid_medical_report_spark.streaming.stream import stream_extract


def test_stream_processes_incrementally(spark, tmp_path):
    inp = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    # wave 1: 15 docs land
    corpus_df(spark, 15).write.mode("append").parquet(inp)
    stream_extract(spark, inp, out, ckpt)
    n1 = spark.read.parquet(out).count()
    assert n1 == 15

    # wave 2: 10 more docs land; rerun processes only the delta
    corpus_df(spark, 25).filter("doc_id > 'doc_000014'") \
        .write.mode("append").parquet(inp)
    stream_extract(spark, inp, out, ckpt)
    res = spark.read.parquet(out)
    assert res.count() == 25
    assert res.select("doc_id").distinct().count() == 25  # no reprocessing


def test_stream_layout_corpus(spark, tmp_path):
    """Layout-enriched schema streams through the same cascade; the layout
    attrs reach the kernel (marker-less headings resolve as sections)."""
    from grobid_medical_report_spark.corpus import generate_doc

    inp = str(tmp_path / "lin")
    out = str(tmp_path / "lout")
    ckpt = str(tmp_path / "lckpt")
    corpus_df(spark, 20, layout=True).write.mode("append").parquet(inp)
    stream_extract(spark, inp, out, ckpt, layout=True)
    rows = spark.read.parquet(out).collect()
    exp = {d["doc_id"]: [(s["kind"], s["text"]) for s in d["expected_spans"]]
           for d in (generate_doc(i, layout=True) for i in range(20))}
    got = {r["doc_id"]: [(s["kind"], s["text"]) for s in r["spans"]]
           for r in rows}
    assert got == exp
