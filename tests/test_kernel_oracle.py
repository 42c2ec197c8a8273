"""Golden-oracle parity of the pure-Python extraction kernel.

The per-row invariant (north rule / BASELINE.json): span-sequence equality
``(kind, text, media_ref, order)`` per doc_id, plus every stage-level fixture
table (zones / header / left-note / sub-entities / NER entities), across all
size buckets.
"""

import pytest

from grobid_medical_report_spark.corpus import generate_doc
from grobid_medical_report_spark.operators.assemble import extract_doc

N_DOCS = 300
FIELDS = ["zones", "header", "leftnote", "medics", "patients",
          "datelines", "person_names", "entities", "sentences", "markers"]


@pytest.mark.parametrize("chunk", range(0, N_DOCS, 50))
def test_full_parity(chunk):
    for i in range(chunk, chunk + 50):
        d = generate_doc(i)
        r = extract_doc(d["doc_id"], d["spans"])
        assert r["status"] == "ok"
        assert r["spans"] == d["expected_spans"], f"doc {i} span sequence"
        for f in FIELDS:
            assert r[f] == d[f], f"doc {i} field {f}"


def test_oversize_quarantine():
    d = generate_doc(0)
    r = extract_doc(d["doc_id"], d["spans"], max_spans=5)
    assert r["status"] == "oversize"
    assert r["spans"] == []


def test_empty_doc():
    r = extract_doc("doc_x", [])
    assert r["status"] == "empty"


def test_failure_isolation():
    # malformed span dicts must not raise (S3 per-row isolation)
    r = extract_doc("doc_y", [{"kind": "text"}])
    assert r["status"].startswith("error:")


def test_viterbi_fast_path_equals_generic_dp():
    # the O(n*k) _viterbi_annex specialization must reproduce the generic
    # O(n*k^2) DP bit-for-bit, including np.argmax first-index tie-breaking
    import numpy as np

    from grobid_medical_report_spark.operators import segmenter as seg

    rng = np.random.RandomState(7)
    k = len(seg.STATES)
    for trial in range(200):
        n = rng.randint(1, 60)
        em = rng.choice([0.0, 0.9, 1.0, 4.0, 8.0, 10.0], size=(n, k))
        em[:, seg._Z["annex_b"]] = np.where(rng.random(n) < 0.1, 10.0, -1e9)
        generic = seg.viterbi(em, seg._TRANS.copy())   # copy defeats dispatch
        fast = seg._viterbi_annex(em)
        assert (generic == fast).all(), f"trial {trial}"
