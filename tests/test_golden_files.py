"""Drift guard for the committed golden parquet (golden/n500/*.parquet).

The x_extract_* DuckDB oracles read these files; if the corpus generator
ever changes, the committed truth must be regenerated (tools/make_golden.py)
or the driver's correctness gate would silently compare against a stale
expected table. This test regenerates ALL 500 docs (driver-side, ~2 s) and
asserts value equality with the committed files.
"""

from __future__ import annotations

import os
import sys

import pyarrow.parquet as pq

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from make_golden import N_DOCS, OUT_DIR, golden_tables  # noqa: E402


def test_golden_parquet_matches_generator():
    live = golden_tables(N_DOCS)
    for name, fresh in live.items():
        path = os.path.join(OUT_DIR, f"{name}.parquet")
        assert os.path.exists(path), f"missing {path} — run tools/make_golden.py"
        committed = pq.read_table(path)
        assert committed.schema.equals(fresh.schema), name
        assert committed.num_rows == fresh.num_rows, name
        assert committed.equals(fresh), f"{name} drifted — rerun tools/make_golden.py"


def test_golden_oracles_registered():
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    import __spark_entry__ as entry

    oracles = entry.oracle_sql()
    queries = entry.queries()
    for name in ("x_extract_spans", "x_extract_layout_spans",
                 "x_extract_header", "x_extract_entities",
                 "x_extract_zones", "x_extract_sentences", "x_extract_markers",
                 "x_extract_tei", "x_extract_patients",
                 "x_extract_org_fields", "x_extract_address_fields"):
        assert name in oracles and name in queries
        assert "read_parquet" in oracles[name]
    # the golden-backed extraction oracles must LEAD the queries() dict so
    # a prefix-sampled correctness gate always includes them
    lead = list(queries)[:11]
    assert all(n.startswith("x_extract_") for n in lead), lead
