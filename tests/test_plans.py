"""Physical-plan regression guards: the scale properties PLANS.md documents
must survive refactors. Each assertion pins a property of the optimized plan
(broadcast vs shuffle join, pushdown, single Python stage), not timings —
plan shape is what predicts 100 TB behavior, and a silent regression to a
sort-merge join or a second Python stage is exactly the kind of change the
test suite would otherwise miss."""

from __future__ import annotations

import pytest

SF = "/root/testdata/sf0.01"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def queries():
    import __spark_entry__ as entrymod
    return entrymod.queries()


def test_star_join_broadcasts_every_dim(spark, queries):
    p = _plan(queries["q5_local_supplier_volume"](spark, SF))
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p, "a dim fell back to sort-merge"
    assert "CartesianProduct" not in p


def test_minhash_lsh_no_cartesian_no_sortmerge(spark, queries):
    p = _plan(queries["q_doc_minhash_lsh"](spark, SF))
    assert "CartesianProduct" not in p, "all-pairs join leaked into the plan"
    assert "BroadcastNestedLoopJoin" not in p
    # verify joins on candidates are broadcastable at this SF
    assert "BroadcastHashJoin" in p


def test_minhash_signature_stage_is_codegen_agg(spark, queries):
    """r8: the K minhashes must come from partial-min AGGREGATES over the
    exploded int64 shingle hashes (whole-stage codegen, map-side partial
    agg), not from K interpreted array_min(transform(...)) passes that
    re-hash every shingle string per pass (measured 35% slower)."""
    p = _plan(queries["q_doc_minhash_lsh"](spark, SF))
    assert "partial_min(xxhash64(0" in p, \
        "signature stage lost its map-side partial min aggregates"
    assert "array_min" not in p, "HOF signature pass is back"


def test_near_dup_blocked_gemm_no_pair_join(spark, queries):
    """q_emb_near_dup must stay a blocked GEMM: no row-pair join of any
    kind — the pair work lives inside the grouped Python stage."""
    p = _plan(queries["q_emb_near_dup"](spark, SF))
    assert "BroadcastNestedLoopJoin" not in p, "all-pairs broadcast is back"
    assert "CartesianProduct" not in p
    assert "SortMergeJoin" not in p
    assert "FlatMapGroupsInPandas" in p, "applyInPandas stage missing"


def test_tfidf_broadcasts_df_table_and_group_limits(spark, queries):
    p = _plan(queries["q_doc_tfidf_top_terms"](spark, SF))
    assert "BroadcastHashJoin" in p, "document-frequency table not broadcast"
    assert "WindowGroupLimit" in p, \
        "per-doc top-3 not pushed below the window exchange"


def test_q16_anti_join_is_broadcast(spark, queries):
    p = _plan(queries["q16_supplier_part_counts"](spark, SF))
    assert "BroadcastHashJoin LeftAnti" in p or \
        ("LeftAnti" in p and "Broadcast" in p), \
        "supplier exclusion shuffles the fact table"


def test_q1_pushes_date_filter_to_scan(spark, queries):
    p = _plan(queries["q1_pricing_summary"](spark, SF))
    assert "PushedFilters: [" in p
    assert "l_shipdate" in p.split("PushedFilters")[1][:200], \
        "date predicate not pushed to the parquet scan"


def test_extraction_is_one_python_stage_no_shuffle(spark):
    from grobid_medical_report_spark.corpus import corpus_df
    from grobid_medical_report_spark.plans.pipeline import extract

    p = _plan(extract(corpus_df(spark, 50)))
    # corpus generation + extraction = exactly two Python stages, no exchange
    assert p.count("MapInPandas") == 2, p
    assert "Exchange" not in p, "a shuffle crept into the extraction hot path"


def test_extraction_from_parquet_prunes_unused_flats(spark, tmp_path):
    from grobid_medical_report_spark.corpus import corpus_df
    from grobid_medical_report_spark.plans.pipeline import extract
    from pyspark.sql import functions as F

    path = str(tmp_path / "c")
    corpus_df(spark, 50).write.parquet(path)
    # selecting only the span table must not carry the entity flats through
    out = extract(spark.read.parquet(path)).select(
        "doc_id", F.size("spans").alias("n"))
    p = _plan(out)
    assert p.count("MapInPandas") == 1
    assert "Exchange" not in p


def test_checkpoint_chunk_scan_is_partition_pruned(spark, tmp_path):
    """The staged checkpoint input must serve each chunk via PARTITION
    pruning — the per-chunk part_id predicate reads only its slice, never
    the whole stage (the r3 fix for n_chunks x source re-reads)."""
    from pyspark.sql import functions as F

    from grobid_medical_report_spark.corpus import corpus_df
    from grobid_medical_report_spark.plans.checkpoint import \
        run_with_checkpoint

    out = str(tmp_path / "out")
    run_with_checkpoint(spark, corpus_df(spark, 12), out, run_id="p",
                        n_parts=4, chunk_size=4)
    staged = spark.read.parquet(out + "/_staged_input")
    p = _plan(staged.filter(F.col("part_id").isin([0, 1])))
    assert "PartitionFilters" in p
    seg = p.split("PartitionFilters", 1)[1][:200]
    assert "part_id" in seg, seg
    # and the data predicate section must NOT carry it (it is partition-only)
    assert "Batched: true" in p        # columnar scan of the pruned slice


def test_prescriptions_is_span_local_no_shuffle(spark, queries):
    """The italic-drug x bold-dose pairing must stay span-local column
    expressions (PLANS.md r5): no Exchange, no join, and no second
    Generate for the dose side — doses remain an array whose argmin is
    array_sort(...)[0], so the drug x dose cross product never
    materializes as rows."""
    p = _plan(queries["x_extract_prescriptions"](spark, SF))
    assert "Exchange" not in p, "span-local decision acquired a shuffle"
    assert "Join" not in p
    assert p.count("Generate") == 2, \
        "expected exactly explode(spans) + explode(drugs)"
