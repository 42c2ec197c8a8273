"""Brute-force baselines vs the standing scalable near-dup queries.

The brute twins (shingle self-join, all-pairs broadcast cosine) are
deliberately NOT in the driver query surface — they are scale-killers at
100x data. They remain here as the exactness contract: the banded/blocked
implementations must produce the identical pair set.
"""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_minhash_lsh_equals_brute_jaccard(spark):
    from grobid_medical_report_spark.operators import dedup

    brute = _rows(dedup.brute_ngram_jaccard(spark, SF))
    lsh = _rows(dedup.q_doc_minhash_lsh(spark, SF))
    assert brute == lsh
    assert len(lsh) > 0


def test_blocked_gemm_near_dup_equals_brute(spark):
    from grobid_medical_report_spark.operators import similarity

    brute = _rows(similarity.brute_emb_near_dup(spark, SF))
    blocked = _rows(similarity.q_emb_near_dup(spark, SF))
    assert brute == blocked
    assert len(blocked) > 0


def test_blocked_gemm_block_count_invariance(spark):
    """The pair set must not depend on the block parameter."""
    from grobid_medical_report_spark.operators import similarity

    b4 = _rows(similarity.q_emb_near_dup(spark, SF, n_blocks=4))
    b13 = _rows(similarity.q_emb_near_dup(spark, SF, n_blocks=13))
    assert b4 == b13


def test_dedup_groups_are_connected_components(spark):
    """Group resolution properties: both endpoints of every verified pair
    share a canon; each canon is the MIN member of its own component; label
    propagation converged (transitivity holds across chained pairs)."""
    from collections import defaultdict

    from grobid_medical_report_spark.operators.dedup import (
        q_doc_dedup_groups, q_doc_minhash_lsh)

    pairs = q_doc_minhash_lsh(spark, SF).collect()
    canon = {r["doc_id"]: r["canon_id"]
             for r in q_doc_dedup_groups(spark, SF).collect()}
    assert pairs and canon
    for p in pairs:
        assert canon[p["doc_a"]] == canon[p["doc_b"]], p
    comp = defaultdict(set)
    for d, c in canon.items():
        comp[c].add(d)
    for c, members in comp.items():
        assert c == min(members)
    # every paired doc got a component row, nothing else did
    in_pairs = {p["doc_a"] for p in pairs} | {p["doc_b"] for p in pairs}
    assert set(canon) == in_pairs
