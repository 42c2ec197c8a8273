"""ANN LSH path: measured recall vs the exact brute-force top-k."""

from grobid_medical_report_spark.operators.similarity import (
    q_emb_topk_cosine, x_emb_ann_lsh)

SF = "/root/testdata/sf0.001"


def test_ann_recall_against_brute_force(spark):
    exact = q_emb_topk_cosine(spark, SF).collect()
    ann = x_emb_ann_lsh(spark, SF).collect()
    exact_sets = {}
    for r in exact:
        exact_sets.setdefault(r["query_id"], set()).add(r["vec_id"])
    ann_sets = {}
    for r in ann:
        ann_sets.setdefault(r["query_id"], set()).add(r["vec_id"])
    recalls = [len(exact_sets[q] & ann_sets.get(q, set())) / len(exact_sets[q])
               for q in exact_sets]
    avg = sum(recalls) / len(recalls)
    assert avg >= 0.5, f"ANN recall too low: {avg:.2f} ({recalls})"


def test_ann_sims_are_exact_on_candidates(spark):
    """LSH approximates the candidate set, never the similarity values."""
    exact = {(r["query_id"], r["vec_id"]): r["sim"]
             for r in q_emb_topk_cosine(spark, SF).collect()}
    for r in x_emb_ann_lsh(spark, SF).collect():
        key = (r["query_id"], r["vec_id"])
        if key in exact:
            assert abs(r["sim"] - exact[key]) < 1e-9
