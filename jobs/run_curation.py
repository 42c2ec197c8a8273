"""spark-submit entrypoint: training-data corpus curation.

Chains the curation operators into one shippable job over a documents table
(doc_id, text, lang, source, n_chars):

  1. exact dedup        keep min doc_id per normalized-text fingerprint
  2. near-dup removal   MinHash-LSH candidates + exact Jaccard verify ->
                        connected components over the pair graph -> keep
                        ONE canonical doc (min id) per component, so
                        transitive chains (A~B~C) collapse to one keeper
  3. quality gate       stopword ratio + length bounds + Gopher-style
                        repetition gates (dup-word / dup-bigram /
                        top-word fractions, Rae et al. 2021)
  4. rarity scoring     unigram-LM rarity per surviving doc (the
                        perplexity-filter analog, integer-exact)
  5. mix assembly       per-language token-budgeted best-first fill,
                        ranked by the rarity score -> <output>_mix
  6. overlap report     (--overlap-report) winnowed-fingerprint partial-
                        overlap pairs over the curated corpus ->
                        <output>_overlap — quotation/section reuse that
                        whole-doc near-dup cannot see (kept docs that
                        share long runs), for provenance review
  7. outputs            curated corpus parquet + mix parquet + a stats
                        JSON line

    spark-submit --py-files engine.zip jobs/run_curation.py \
        --input <sf_dir> --output /path/out [--jaccard 0.8] [--min-chars 100]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="sf_dir with documents.parquet")
    ap.add_argument("--output", required=True)
    ap.add_argument("--jaccard", type=float, default=0.8)
    ap.add_argument("--min-chars", type=int, default=100)
    ap.add_argument("--max-stop-ratio", type=float, default=0.5)
    ap.add_argument("--max-dup-word-frac", type=float, default=0.9)
    ap.add_argument("--max-dup-bigram-frac", type=float, default=0.75)
    ap.add_argument("--max-top-word-frac", type=float, default=0.3)
    ap.add_argument("--budget-scale", type=float, default=1.0,
                    help="multiplier on the per-language MIX_BUDGETS token "
                         "budgets for the final mix assembly")
    ap.add_argument("--overlap-report", action="store_true",
                    help="also write winnowed-fingerprint partial-overlap "
                         "pairs over the CURATED corpus to <output>_overlap")
    args = ap.parse_args(argv)

    from pyspark.sql import functions as F

    from grobid_medical_report_spark.operators.dedup import (
        dedup_groups_from_pairs, q_doc_dedup_exact, q_doc_minhash_lsh)
    from grobid_medical_report_spark.operators.textstats import (
        q_doc_quality, q_doc_repetition)
    from grobid_medical_report_spark.session import get_spark

    spark = get_spark("run_curation")
    spark.sparkContext.setLogLevel("WARN")
    docs = spark.read.parquet(f"{args.input}/documents.parquet")
    n_in = docs.count()

    # 1. exact dedup survivors
    survivors = q_doc_dedup_exact(spark, args.input).select("doc_id")
    n_exact = survivors.count()

    # 2. near-dup components -> drop every non-canonical member (the
    # standard corpus-dedup policy: one keeper per connected component)
    pairs = q_doc_minhash_lsh(spark, args.input).filter(
        F.col("jaccard") >= args.jaccard)
    groups = dedup_groups_from_pairs(pairs)
    losers = (groups.filter(F.col("doc_id") != F.col("canon_id"))
                    .select("doc_id"))
    survivors = survivors.join(losers, "doc_id", "left_anti")
    n_near = survivors.count()

    # 3. quality gate: basic stats + Gopher repetition filters
    quality = q_doc_quality(spark, args.input)
    good = quality.filter(
        (F.col("stop_ratio") <= args.max_stop_ratio)
        & (F.col("len_ok") == 1)).select("doc_id")
    rep = q_doc_repetition(spark, args.input)
    unrepetitive = rep.filter(
        (F.col("dup_word_frac") <= args.max_dup_word_frac)
        & (F.col("dup_bigram_frac") <= args.max_dup_bigram_frac)
        & (F.col("top_word_frac") <= args.max_top_word_frac)
    ).select("doc_id")
    survivors = (survivors.join(good, "doc_id", "left_semi")
                 .join(unrepetitive, "doc_id", "left_semi"))

    curated = docs.join(survivors, "doc_id", "left_semi")
    curated.write.mode("overwrite").parquet(args.output)

    # 4.-5. rarity scoring over the CURATED corpus (frequencies from what
    # survived, not what was removed), then the token-budgeted mix with
    # rarity as the per-stratum quality key
    from grobid_medical_report_spark.operators.curation import (
        MIX_BUDGETS, token_rarity, training_mix)

    curated_df = spark.read.parquet(args.output)
    scored = curated_df.join(
        token_rarity(curated_df).select("doc_id", "mean_rarity"), "doc_id")
    budgets = {lg: int(b * args.budget_scale)
               for lg, b in MIX_BUDGETS.items()}
    mix = training_mix(scored, budgets, priority_col="mean_rarity")
    mix_out = args.output.rstrip("/") + "_mix"
    mix.write.mode("overwrite").parquet(mix_out)
    mix_stats = {r["lang"]: {"docs": r["docs"], "tokens": r["tokens"]}
                 for r in (spark.read.parquet(mix_out).groupBy("lang")
                           .agg(F.count(F.lit(1)).alias("docs"),
                                F.max("cum_tokens").alias("tokens"))
                           .collect())}

    overlap_stats = None
    if args.overlap_report:
        from grobid_medical_report_spark.operators.dedup import winnow_pairs

        overlap = winnow_pairs(curated_df)
        overlap_out = args.output.rstrip("/") + "_overlap"
        overlap.write.mode("overwrite").parquet(overlap_out)
        overlap_stats = spark.read.parquet(overlap_out).count()

    n_out = curated_df.count()
    stats = {"docs_in": n_in,
             "exact_dup_removed": n_in - n_exact,
             "near_dup_removed": n_exact - n_near,
             "quality_removed": n_near - n_out,
             "docs_out": n_out,
             "kept_fraction": round(n_out / n_in, 4) if n_in else 0.0,
             "mix": mix_stats}
    if overlap_stats is not None:
        stats["overlap_pairs"] = overlap_stats
    print(json.dumps(stats))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
