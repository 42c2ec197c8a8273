"""Corpus generator invariants (FIXTURES.md §1)."""

from grobid_medical_report_spark.corpus import doc_id_str, generate_doc


def test_deterministic():
    assert generate_doc(7) == generate_doc(7)
    assert generate_doc(7)["doc_id"] == doc_id_str(7)


def test_input_schema_shape():
    d = generate_doc(3)
    for i, s in enumerate(d["spans"]):
        assert set(s) == {"kind", "text", "media_ref", "offset"}
        assert s["offset"] == i  # dense reading order
        assert s["kind"] in ("text", "media")
        if s["kind"] == "media":
            assert s["media_ref"] and s["text"] == ""
        else:
            assert s["media_ref"] == ""


def test_interleaved_media_present():
    found = any(
        any(s["kind"] == "media" for s in generate_doc(i)["spans"])
        for i in range(50)
    )
    assert found, "corpus must interleave media spans"


def test_size_buckets_skewed_tail():
    buckets = {generate_doc(i)["bucket"] for i in range(200)}
    assert buckets == {"small", "medium", "giant"}


def test_expected_span_order_dense():
    d = generate_doc(11)
    orders = [s["order"] for s in d["expected_spans"]]
    assert orders == list(range(len(orders)))


def test_stratified_sample_invariant_under_repartition(spark):
    # the modulo-based sample must pick identical rows regardless of
    # physical layout — the reproducibility property sampleBy lacks
    from grobid_medical_report_spark.operators.curation import \
        q_doc_stratified_sample

    sf = "/root/testdata/sf0.001"
    import os
    import tempfile

    a = {tuple(r) for r in q_doc_stratified_sample(spark, sf).collect()}
    # same computation over a repartitioned copy written elsewhere
    out = os.path.join(tempfile.mkdtemp(), "docs")
    (spark.read.parquet(f"{sf}/documents.parquet").repartition(17)
          .write.parquet(f"{out}/documents.parquet"))
    b = {tuple(r) for r in q_doc_stratified_sample(spark, out).collect()}
    assert a == b
