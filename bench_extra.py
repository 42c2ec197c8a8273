"""Supplementary benchmarks (bench.py is FROZEN for measurement — this file
holds the extra instrumentation OPTIMIZATION_r08.md cites).

* noop-sink isolation (optimization guide §1.4): every bench headline query
  timed with ``df.write.format("noop")`` so the computation is measured
  without the collect/driver transfer, best-of-3, labeled via
  setJobDescription;
* prints one JSON line {"queries_noop": {...}, "sf": ...}.

Usage: python bench_extra.py  (env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

from bench import BENCH_QUERIES  # noqa: E402


def main() -> None:
    import __spark_entry__ as entrymod
    from grobid_medical_report_spark.session import get_spark

    spark = get_spark("bench-extra", master=f"local[{CPUS}]",
                      shuffle_partitions=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    queries = entrymod.queries()
    out: dict[str, float] = {}
    for name in BENCH_QUERIES:
        fn = queries[name]

        def run() -> None:
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()

        run()                                   # warm (JIT + workers)
        trials = []
        for _ in range(3):
            spark.sparkContext.setJobDescription(f"noop:{name}")
            t0 = time.time()
            run()
            trials.append(time.time() - t0)
        spark.sparkContext.setJobDescription(None)
        out[name] = round(min(trials), 3)
    spark.stop()
    sf = float(SF_DIR.rstrip("/").rsplit("sf", 1)[-1])
    print(json.dumps({"queries_noop": out, "sf": sf}))


if __name__ == "__main__":
    main()
