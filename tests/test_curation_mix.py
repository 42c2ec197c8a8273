"""Curation scoring + mix-assembly kernels (the stages run_curation.py
chains after dedup/quality): rarity frequencies reflect the input frame,
budgets bind per stratum, priority order and tiebreaks are total."""

from pyspark.sql import functions as F

from grobid_medical_report_spark.operators.curation import (token_rarity,
                                                            training_mix)

SF = "/root/testdata/sf0.001"


def test_rarity_scores_reflect_input_frame(spark):
    d = spark.read.parquet(f"{SF}/documents.parquet")
    full = {r.doc_id: r.mean_rarity for r in token_rarity(d).collect()}
    # rarity over a SUBSET must differ (frequencies come from the frame,
    # not a global table) — drop half the corpus and rare words get rarer
    half = d.filter(F.col("doc_id") % 2 == 0)
    sub = {r.doc_id: r.mean_rarity for r in token_rarity(half).collect()}
    assert set(sub) == {k for k in full if k % 2 == 0}
    assert any(sub[k] != full[k] for k in sub)
    # every token contributes >= the minimum possible rarity (scale factor)
    assert all(v >= 10000 for v in full.values())


def test_training_mix_budget_and_order(spark):
    d = spark.read.parquet(f"{SF}/documents.parquet")
    budgets = {r.lang: 400 for r in d.select("lang").distinct().collect()}
    mix = training_mix(d, budgets).collect()
    assert mix
    by_lang = {}
    for r in mix:
        by_lang.setdefault(r.lang, []).append(r)
    toks = {r.doc_id: r.n_tokens for r in
            d.select("doc_id",
                     F.size(F.split(F.trim("text"), " "))
                      .alias("n_tokens")).collect()}
    chars = {r.doc_id: r.n_chars
             for r in d.select("doc_id", "n_chars").collect()}
    for lang, rows in by_lang.items():
        # budget binds: selected tokens fit, and the NEXT candidate would
        # not have (the corpus has more docs per lang than the budget holds)
        assert rows[-1].cum_tokens <= 400
        # cum_tokens is the running sum of n_tokens in priority order
        running = 0
        for r in sorted(rows, key=lambda r: r.cum_tokens):
            running += toks[r.doc_id]
            assert r.cum_tokens == running
        # best-first: every selected doc's (n_chars, -doc_id) dominates
        # every unselected doc of the same lang OR the unselected doc
        # simply did not fit the remaining budget
        sel = {r.doc_id for r in rows}
        lang_docs = [r.doc_id for r in d.filter(F.col("lang") == lang)
                     .select("doc_id").collect()]
        worst_sel = min((chars[i], -i) for i in sel)
        for other in lang_docs:
            if other in sel:
                continue
            if (chars[other], -other) > worst_sel:
                # skipped only because it appears earlier in priority
                # order than some selected doc -> impossible by
                # construction of the cumulative-sum filter
                raise AssertionError(
                    f"{other} outranks a selected doc in {lang}")


def test_training_mix_priority_col_switch(spark):
    d = spark.read.parquet(f"{SF}/documents.parquet")
    scored = d.join(token_rarity(d).select("doc_id", "mean_rarity"),
                    "doc_id")
    budgets = {r.lang: 300 for r in d.select("lang").distinct().collect()}
    by_chars = {r.doc_id for r in training_mix(scored, budgets).collect()}
    by_rarity = {r.doc_id for r in
                 training_mix(scored, budgets,
                              priority_col="mean_rarity").collect()}
    # different quality keys select different docs (the job's knob is real)
    assert by_chars != by_rarity
