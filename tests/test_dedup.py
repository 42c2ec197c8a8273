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


def test_dedup_groups_star_chain_and_equality(spark):
    """Large-star/small-star CC: (a) on an adversarial 1000-doc PATH graph
    it converges in logarithmically many rounds (min-label propagation
    would need 999) and labels the whole chain into one component; (b) on
    the standard corpus pair graph it returns exactly the same
    (doc_id, canon_id) table as the propagation path; (c) the propagation
    entry point FALLS BACK to it instead of returning wrong components
    when max_iters is exhausted."""
    from grobid_medical_report_spark.operators.dedup import (
        dedup_groups_from_pairs, dedup_groups_star, q_doc_minhash_lsh)

    # (a) adversarial chain: d0000-d0001-...-d0999 (diameter 999)
    chain = spark.createDataFrame(
        [(f"d{i:04d}", f"d{i + 1:04d}") for i in range(999)],
        schema="doc_a string, doc_b string")
    got = {r["doc_id"]: r["canon_id"]
           for r in dedup_groups_star(chain, max_rounds=24).collect()}
    assert len(got) == 1000
    assert set(got.values()) == {"d0000"}

    # (b) equality with propagation on the real corpus pair graph
    pairs = q_doc_minhash_lsh(spark, SF).cache()
    prop = sorted((r["doc_id"], r["canon_id"])
                  for r in dedup_groups_from_pairs(pairs).collect())
    star = sorted((r["doc_id"], r["canon_id"])
                  for r in dedup_groups_star(pairs).collect())
    assert prop == star

    # (c) exhausting propagation's max_iters on the chain falls back to the
    # star variant and still returns CORRECT components (no silent wrong
    # answer — ADVICE r3)
    short = spark.createDataFrame(
        [(f"c{i:02d}", f"c{i + 1:02d}") for i in range(30)],
        schema="doc_a string, doc_b string")
    got2 = {r["doc_id"]: r["canon_id"]
            for r in dedup_groups_from_pairs(short, max_iters=3).collect()}
    assert set(got2.values()) == {"c00"} and len(got2) == 31


def test_dedup_groups_star_non_monotone_path(spark):
    """ADVICE r4 regression: on the non-monotone-ID path 1-10-3-20-2 the
    old fixpoint test (no node on both sides of the edge list) accepted a
    state where node 3 kept edges to TWO candidate minima — one component
    split into two canon groups and doc 3 emitted twice. The tightened
    fixpoint (each child has exactly one parent) must keep iterating until
    the true star: every node -> 1, one row per node."""
    from collections import Counter
    from grobid_medical_report_spark.operators.dedup import (
        dedup_groups_from_pairs, dedup_groups_star)

    path = spark.createDataFrame(
        [(1, 10), (10, 3), (3, 20), (20, 2)],
        schema="doc_a int, doc_b int")
    rows = dedup_groups_star(path).collect()
    counts = Counter(r["doc_id"] for r in rows)
    assert max(counts.values()) == 1, f"duplicate doc rows: {counts}"
    assert {r["doc_id"]: r["canon_id"] for r in rows} == {
        1: 1, 2: 1, 3: 1, 10: 1, 20: 1}

    # and a denser scramble: two components with interleaved, shuffled IDs
    # — star must agree with min-label propagation exactly
    import random
    rng = random.Random(7)
    ids = list(range(1, 41))
    rng.shuffle(ids)
    a, b = ids[:20], ids[20:]
    edges = ([(a[i], a[i + 1]) for i in range(19)]
             + [(b[i], b[i + 1]) for i in range(19)])
    rng.shuffle(edges)
    df = spark.createDataFrame(edges, schema="doc_a int, doc_b int")
    prop = sorted((r["doc_id"], r["canon_id"])
                  for r in dedup_groups_from_pairs(df, max_iters=50).collect())
    star = sorted((r["doc_id"], r["canon_id"])
                  for r in dedup_groups_star(df).collect())
    assert prop == star
