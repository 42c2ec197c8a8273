"""Winnowing fingerprints: the MOSS guarantee (shared substrings of length
>= w+k-1 share a fingerprint), determinism, overlap behavior, and the Spark
mapInPandas path."""

import hashlib
import random

import numpy as np

from grobid_medical_report_spark.operators.dedup import (WINNOW_K, WINNOW_W,
                                                         winnow_fingerprints)


def _rand_text(rng, n):
    return "".join(rng.choice("abcdefghijklmnopqrstuvwxyz ") for _ in range(n))


def test_deterministic_and_case_insensitive():
    t = "Le Patient Présente Une Toux Sèche."
    a = winnow_fingerprints(t)
    assert np.array_equal(a, winnow_fingerprints(t))
    assert np.array_equal(a, winnow_fingerprints(t.lower()))


def test_winnowing_guarantee_on_shared_block():
    rng = random.Random(3)
    a = _rand_text(rng, 800)
    block = a[300:520]                      # 220 chars >> w + k - 1 = 23
    b = _rand_text(rng, 250) + block + _rand_text(rng, 250)
    fa, fb = winnow_fingerprints(a), winnow_fingerprints(b)
    shared = np.intersect1d(fa, fb)
    # the shared block alone must contribute multiple fingerprints
    fblock = winnow_fingerprints(block)
    assert len(np.intersect1d(fblock, fa)) > 0
    assert len(np.intersect1d(fblock, fb)) > 0
    assert len(shared) >= len(fblock) // 2


def test_unrelated_texts_low_overlap():
    rng = random.Random(9)
    a = winnow_fingerprints(_rand_text(rng, 1000))
    b = winnow_fingerprints(_rand_text(rng, 1000))
    inter = len(np.intersect1d(a, b))
    union = len(np.union1d(a, b))
    assert inter / union < 0.05


def test_density_and_short_inputs():
    rng = random.Random(11)
    t = _rand_text(rng, 2000)
    f = winnow_fingerprints(t)
    n_hashes = len(t) - WINNOW_K + 1
    # expected density ~ 2/(w+1) before dedup; allow generous bounds
    assert n_hashes / (WINNOW_W * 2) < len(f) < n_hashes
    assert winnow_fingerprints("").size == 0
    assert winnow_fingerprints("ab").size == 0          # shorter than k
    assert winnow_fingerprints("abcdefgh").size == 1    # exactly one k-gram


def test_winnow_pairs_recall_vs_lsh_truth(spark):
    """The winnow bucket-join must recover the exact-verified near-dup
    pairs (minus at most the ultra-boilerplate tail) at its default
    thresholds, with bounded candidate volume."""
    import __spark_entry__ as e
    from grobid_medical_report_spark.operators.dedup import \
        x_doc_winnow_pairs

    sf = "/root/testdata/sf0.01"
    truth = {(r.doc_a, r.doc_b)
             for r in e.queries()["q_doc_minhash_lsh"](spark, sf).collect()}
    got = {(r.a, r.b) for r in x_doc_winnow_pairs(spark, sf).collect()}
    assert truth
    recall = len(got & truth) / len(truth)
    assert recall >= 0.9
    # candidate volume stays bucket-bounded, not quadratic (500 docs)
    assert len(got) < 100


def test_spark_winnowing_path(spark):
    import __spark_entry__ as e

    rows = e.queries()["x_doc_winnowing"](
        spark, "/root/testdata/sf0.001").collect()
    assert rows
    d = {r.doc_id: r for r in rows}
    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    for sample in df.orderBy("doc_id").limit(5).collect():
        sel = winnow_fingerprints(sample.text)
        r = d[sample.doc_id]
        assert r.n_fingerprints == sel.size
        assert r.fp_digest == hashlib.md5(sel.tobytes()).hexdigest()
        assert r.min_fingerprint == (int(sel[0]) if sel.size else -1)


def test_winnow_pairs_golden_matches(spark):
    """Drift guard for golden/n500/expected_winnow_pairs.parquet (the
    x_doc_winnow_pairs value oracle, r5): the committed pair blocks for
    sf0.001 and sf0.01 must equal what the Spark query computes today, and
    every tier's block must be keyed and non-trivially present. Regenerate
    with tools/make_winnow_golden.py after any fingerprinting change."""
    import os

    import pyarrow.parquet as pq

    from grobid_medical_report_spark.operators.dedup import x_doc_winnow_pairs

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "golden", "n500",
        "expected_winnow_pairs.parquet")
    golden = pq.read_table(path).to_pydict()
    by_key = {}
    for key, a, b, n in zip(golden["corpus_md5"], golden["a"],
                            golden["b"], golden["shared_fps"]):
        by_key.setdefault(key, set()).add((a, b, n))
    assert len(by_key) == 3          # one block per SF tier corpus
    import duckdb
    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        key = duckdb.sql(
            "SELECT md5(string_agg(doc_id || chr(31) || text, chr(30) "
            "ORDER BY doc_id)) FROM "
            f"read_parquet('{sf}/documents.parquet') WHERE doc_id < 500"
        ).fetchone()[0]
        assert key in by_key, f"no golden block for {sf}"
        got = {(r.a, r.b, r.shared_fps)
               for r in x_doc_winnow_pairs(spark, sf).collect()}
        assert got == by_key[key], sf
