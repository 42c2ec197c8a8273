"""Structured Streaming ingest: continuous extraction over an arriving corpus.

The reference is pure batch (SURVEY.md §2.12) and the north rule requires
resumability, not streaming — plans/checkpoint.py covers that. This module
adds the Spark-native continuous-ingest path on top: new corpus files landing
in a directory are picked up incrementally (``availableNow`` micro-batches, or
a continuous trigger in service mode), run through the same fused extraction
cascade, and appended to the results table. Spark's streaming checkpoint
(source offsets + file log) gives exactly-once file-level progress across
restarts — the streaming twin of the checkpoint table's part-level resume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..corpus import INPUT_SCHEMA, INPUT_SCHEMA_LAYOUT
from ..plans.pipeline import extract


def stream_extract(spark: SparkSession, input_dir: str, out_dir: str,
                   checkpoint_dir: str, max_spans: int | None = 200_000,
                   available_now: bool = True, layout: bool = False):
    """Start (and by default drain) a streaming extraction job.

    Returns the StreamingQuery; with ``available_now`` the call blocks until
    all currently-available input files are processed, then stops — re-running
    after new files arrive processes only the delta (file-log checkpointing).
    ``layout=True`` reads the layout-enriched span schema (SURVEY §1.1
    attrs), which the extraction stage consumes automatically.
    """
    src: DataFrame = (spark.readStream
                      .schema(INPUT_SCHEMA_LAYOUT if layout else INPUT_SCHEMA)
                      .option("maxFilesPerTrigger", 64)
                      .parquet(input_dir))
    ext = extract(src, max_spans=max_spans)
    writer = (ext.writeStream
              .format("parquet")
              .option("path", out_dir)
              .option("checkpointLocation", checkpoint_dir)
              .outputMode("append"))
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return writer.trigger(processingTime="10 seconds").start()
