"""Drift guards for the r6 promoted-query goldens (VERDICT r5 items 3+8).

tools/make_query_goldens.py freezes INDEPENDENT (non-Spark) reference
outputs for the formerly rows-only deterministic queries into
golden/n500/expected_*.parquet, keyed by a content hash of the input
table. These tests regenerate the sf0.01 block from the same independent
reference and compare it cell-for-cell against the committed parquet —
the analog of tests/test_golden_files.py for the extraction truths.

(The two ANN goldens are Spark-frozen determinism pins, exercised by the
oracle sweep itself — tests/test_sweep.py — and their recall is covered
by tests/test_similarity_ann.py, so they need no extra guard here.)
"""

from __future__ import annotations

import os
import sys

import pyarrow.parquet as pq
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
import make_query_goldens as mg  # noqa: E402

SF = "/root/testdata/sf0.01"


def _committed(stem: str, key: str):
    path = os.path.join(mg.OUT_DIR, f"{stem}.parquet")
    t = pq.read_table(path).to_pylist()
    block = [r for r in t if r["corpus_md5"] == key]
    assert block, f"{stem}: no golden block for corpus key {key}"
    return block


@pytest.mark.parametrize("stem", sorted(mg.SPECS))
def test_keyed_golden_matches_independent_reference(stem):
    import duckdb

    spec = mg.SPECS[stem]
    con = duckdb.connect()
    src = f"read_parquet('{SF}/documents.parquet')"
    key = con.execute(spec["key_sql"].format(src=src)).fetchone()[0]
    fresh = spec["build"](con, SF)
    names = [c for c, _t in spec["cols"]]
    committed = [tuple(r[c] for c in names) for r in _committed(stem, key)]
    assert sorted(map(repr, committed)) == \
        sorted(repr(tuple(r)) for r in fresh), stem


def test_training_golden_matches_independent_reference():
    """expected_training is the per-doc training-row logic driven by a
    plain pandas loop over generate_doc fixtures (r7, VERDICT r6 item 2) —
    regenerate and compare cell-for-cell, like the extraction truths."""
    fresh = mg.expected_training()
    t = pq.read_table(
        os.path.join(mg.OUT_DIR, "expected_training.parquet")).to_pylist()
    cols = ["model", "doc_id", "line_idx", "tok_idx", "text", "label",
            "n_chars", "n_tokens", "upper_ratio", "digit_ratio",
            "punct_profile", "ends_colon", "starts_dash", "rel_pos_bin",
            "repeat_count", "is_media"]
    committed = [tuple(r[c] for c in cols) for r in t]
    assert len(committed) == len(fresh)
    assert sorted(map(repr, committed)) == sorted(map(repr, map(tuple, fresh)))


def test_anonymize_golden_matches_generator_truth():
    fresh = mg.expected_anonymize()
    t = pq.read_table(
        os.path.join(mg.OUT_DIR, "expected_anonymize.parquet")).to_pylist()
    cols = ["doc_id", "docnum_anon", "date_anon", "medics_anon",
            "patient_anon", "patient_id_anon", "address_anon"]
    committed = [tuple(r[c] for c in cols) for r in t]
    assert sorted(committed) == sorted(map(tuple, fresh))
