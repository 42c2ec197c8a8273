"""Interleaved A/B timing of query variants in ONE Spark session.

Usage: python tools/ab_query.py <module:function> [<module:function> ...]
Each function has signature (spark, sf_dir) -> DataFrame. Variants are timed
interleaved (A, B, A, B, ...) with a warm lap first, best-of-N reported, so
one noisy window cannot poison a single variant. Collect is used (matching
bench.py's methodology).

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), AB_TRIALS (default 4).
"""

from __future__ import annotations

import importlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
TRIALS = int(os.environ.get("AB_TRIALS", "4"))


def main() -> None:
    from grobid_medical_report_spark.session import get_spark

    fns = []
    for spec in sys.argv[1:]:
        mod, name = spec.rsplit(":", 1)
        fns.append((spec, getattr(importlib.import_module(mod), name)))

    spark = get_spark("ab-query", master=f"local[{CPUS}]",
                      shuffle_partitions=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    times: dict[str, list[float]] = {spec: [] for spec, _ in fns}
    rows: dict[str, int] = {}
    # warm lap (JIT + python workers + parquet footers)
    for spec, fn in fns:
        rows[spec] = len(fn(spark, SF_DIR).collect())
    for _ in range(TRIALS):
        for spec, fn in fns:
            spark.sparkContext.setJobDescription(spec)
            t0 = time.time()
            fn(spark, SF_DIR).collect()
            times[spec].append(round(time.time() - t0, 3))
    for spec, _ in fns:
        ts = times[spec]
        print(f"{spec}: best={min(ts):.3f}s rows={rows[spec]} trials={ts}")
    spark.stop()


if __name__ == "__main__":
    main()
