"""spark-submit entrypoint: resumable batch extraction over a span corpus.

North-rule packaging ("ships as spark-submit --py-files jobs"):

    zip -r engine.zip grobid_medical_report_spark
    spark-submit --master <cluster> --py-files engine.zip \
        jobs/run_extraction.py \
        --input  /path/to/corpus_parquet   (or synth:<n_docs>) \
        --output /path/to/out \
        --run-id run1 [--n-parts 64] [--chunk-size 8] \
        [--max-spans 200000] [--giant-threshold 2000] [--tei]

Resumable: re-running with the same --run-id/--output skips completed
partitions (plans/checkpoint.py). ``synth:<n>`` inputs generate the seeded
corpus distributed — handy for scale rehearsal without staging data.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True,
                    help="parquet dir / iceberg:<table> / synth:<n_docs>")
    ap.add_argument("--layout", action="store_true",
                    help="synth inputs carry the SURVEY §1.1 layout attrs "
                         "(font/size/bold/italic/x/y per span)")
    ap.add_argument("--output", required=True)
    ap.add_argument("--run-id", required=True)
    ap.add_argument("--n-parts", type=int, default=64)
    ap.add_argument("--chunk-size", type=int, default=0,
                    help="checkpoint chunk width in partitions; 0 (default) "
                         "= the core count, so the resumability granularity "
                         "never leaves cores idle (a chunk narrower than "
                         "the cluster starves it: 8-wide chunks on 32 cores "
                         "measured 1.7x slower at 200k docs)")
    ap.add_argument("--max-spans", type=int, default=200_000)
    ap.add_argument("--tei", action="store_true",
                    help="also render TEI strings next to the span table")
    ap.add_argument("--chunked", action="store_true",
                    help="page-chunk giant documents (plans/chunked.py) so a "
                         "single huge doc parallelizes instead of stalling")
    ap.add_argument("--giant-threshold", type=int, default=2000,
                    help="span count above which --chunked page-chunks a doc")
    args = ap.parse_args(argv)

    from grobid_medical_report_spark.corpus import corpus_df
    from grobid_medical_report_spark.plans.checkpoint import (
        read_results, run_with_checkpoint)
    from grobid_medical_report_spark.plans.pipeline import render_tei_df
    from grobid_medical_report_spark.session import get_spark
    from grobid_medical_report_spark.sources.tables import read_corpus

    spark = get_spark("run_extraction")
    spark.sparkContext.setLogLevel("WARN")
    if args.input.startswith("synth:"):
        src = corpus_df(spark, int(args.input.split(":", 1)[1]),
                        layout=args.layout)
    else:
        src = read_corpus(spark, args.input)

    extract_fn = None
    if args.chunked:
        import functools

        from grobid_medical_report_spark.plans.chunked import extract_chunked
        extract_fn = functools.partial(extract_chunked,
                                       giant_threshold=args.giant_threshold)
    chunk_size = args.chunk_size or spark.sparkContext.defaultParallelism
    chunks = run_with_checkpoint(
        spark, src, args.output, run_id=args.run_id, n_parts=args.n_parts,
        chunk_size=chunk_size, max_spans=args.max_spans,
        extract_fn=extract_fn)

    results = read_results(spark, args.output)
    if args.tei:
        (render_tei_df(results)
         .write.mode("overwrite").parquet(args.output.rstrip("/") + "/tei"))

    stats = {r["status"]: r["count"]
             for r in results.groupBy("status").count().collect()}
    print(json.dumps({"run_id": args.run_id, "chunks_executed": chunks,
                      "docs": sum(stats.values()), "status_counts": stats}))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
