"""Materialize the expected winnowing partial-overlap pair table.

Winnowing fingerprints are a pure function of the document text
(``dedup.winnow_fingerprints``), so the expected (a, b, shared_fps) pair
set for a fixed corpus can be frozen as golden parquet the same way the
x_extract_* truth tables are (VERDICT r4 next-round item 6) — promoting
``x_doc_winnow_pairs`` from rows-only to a value oracle.

Unlike the extraction goldens (generated corpus, identical at every SF
tier), the winnow query reads the driver's ``documents`` parquet, whose
first 500 docs DIFFER per tier. The golden therefore stores one pair set
per corpus, keyed by a ``corpus_md5`` of the (doc_id, text) content, and
the oracle SQL selects the block whose key matches the corpus it is
running against — self-validating: a drifted corpus matches no block and
the compare fails loudly rather than against stale truth.

Run from the repo root:  python tools/make_winnow_golden.py
Drift guard: tests/test_winnowing.py::test_winnow_pairs_golden_matches.
"""

from __future__ import annotations

import os
import sys
from collections import Counter, defaultdict

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from grobid_medical_report_spark.operators.dedup import (  # noqa: E402
    WINNOW_MAX_DF, WINNOW_MIN_SHARED, winnow_fingerprints)

TIERS = ("/root/testdata/sf0.001", "/root/testdata/sf0.01",
         "/root/testdata/sf0.1")
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "golden", "n500", "expected_winnow_pairs.parquet")

#: the corpus identity key — MUST stay textually identical to the subquery
#: in __spark_entry__._X_ORACLES["x_doc_winnow_pairs"], which recomputes it
#: over the gate's `documents` view at compare time
CORPUS_MD5_SQL = ("SELECT md5(string_agg(doc_id || chr(31) || text, chr(30) "
                  "ORDER BY doc_id)) FROM {src} WHERE doc_id < 500")


def expected_pairs(docs: list[tuple[int, str]],
                   max_df: int = WINNOW_MAX_DF,
                   min_shared: int = WINNOW_MIN_SHARED):
    """Reference pairing: distinct fingerprint sets, drop fingerprints with
    document frequency > max_df, count shared rare fingerprints per pair."""
    fps = {did: set(winnow_fingerprints(t).tolist()) for did, t in docs}
    df = Counter(f for s in fps.values() for f in s)
    inv = defaultdict(list)
    for did in sorted(fps):
        for f in fps[did]:
            if df[f] <= max_df:
                inv[f].append(did)
    shared = Counter()
    for members in inv.values():
        for i, a in enumerate(members):
            for b in members[i + 1:]:
                shared[(a, b)] += 1
    return sorted((a, b, n) for (a, b), n in shared.items()
                  if n >= min_shared)


def main() -> None:
    import duckdb

    cols = {"corpus_md5": [], "a": [], "b": [], "shared_fps": []}
    for tier in TIERS:
        src = f"read_parquet('{tier}/documents.parquet')"
        key = duckdb.sql(CORPUS_MD5_SQL.format(src=src)).fetchone()[0]
        docs = duckdb.sql(f"SELECT doc_id, text FROM {src} "
                          "WHERE doc_id < 500 ORDER BY doc_id").fetchall()
        pairs = expected_pairs(docs)
        print(f"{tier}: corpus_md5={key} pairs={len(pairs)}")
        for a, b, n in pairs:
            cols["corpus_md5"].append(key)
            cols["a"].append(a)
            cols["b"].append(b)
            cols["shared_fps"].append(n)
    table = pa.table({
        "corpus_md5": pa.array(cols["corpus_md5"], pa.string()),
        "a": pa.array(cols["a"], pa.int64()),
        "b": pa.array(cols["b"], pa.int64()),
        "shared_fps": pa.array(cols["shared_fps"], pa.int64()),
    })
    pq.write_table(table, OUT)
    print(f"wrote {OUT} ({table.num_rows} rows)")


if __name__ == "__main__":
    main()
