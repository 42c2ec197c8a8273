"""Launch the REST service (S8) with a live SparkSession attached.

spark-submit entry point — the serving analog of jobs/run_extraction.py:

    spark-submit --py-files grobid_medical_report_spark.zip \
        jobs/run_service.py --port 8070 --cpus 8

Single-doc endpoints answer from the in-process kernel (request latency);
/processBatch routes through the same ``plans.pipeline.extract`` stage as
the batch jobs, on this session.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from grobid_medical_report_spark.service import serve  # noqa: E402
from grobid_medical_report_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--port", type=int, default=8070)
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    args = ap.parse_args()
    spark = get_spark("medical-report-service",
                      master=f"local[{args.cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    print(f"serving on http://127.0.0.1:{args.port} (GET /isalive)")
    serve(port=args.port, spark=spark)


if __name__ == "__main__":
    main()
