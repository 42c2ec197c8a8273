"""Resumable batch execution: checkpoint table + exact mid-run resume.

North-rule requirement: "resumable from checkpoint with per-partition lineage
+ metrics". The reference has no such facility (its batch driver swallows
per-file errors and restarts from scratch, ProcessEngineMedical:214-270);
this is an engine feature mandated by BASELINE.json.

Design (SURVEY.md §2.12 / §7.6):

* work is keyed by a **stable logical partition id**
  ``part_id = pmod(xxhash64(doc_id), n_parts)`` — independent of physical
  partitioning, so resume is exact under any cluster size;
* the keyed input is **staged once**, written ``partitionBy(part_id)``:
  ``part_id`` is a DERIVED column, so a per-chunk filter on it can never
  push below the upstream scan/generator — without staging, every chunk
  job re-reads (or re-generates) the ENTIRE source and discards all but
  its slice, an ``n_chunks×`` read amplification (measured 16× corpus
  regeneration at synth:1M). Staged, each chunk is a partition-PRUNED
  scan of exactly its slice; total source cost is one read + one write
  regardless of chunk count, and a resumed run reuses the stage;
* the run proceeds in **chunks** of part_ids; each chunk is one Spark write
  job. Spark's commit protocol makes the chunk's parquet write atomic (files
  land only at job commit), so a kill leaves either a fully-committed chunk
  or nothing;
* after each chunk commits, one checkpoint row per part_id is appended with
  lineage + metrics (docs, output rows, span-kind histogram). Metrics are
  computed **from the written data** (read-back aggregation), not from
  ``Observation`` — observe double-counts when a stage re-executes;
* on restart with the same ``run_id``, completed part_ids are anti-joined
  away and only the remainder runs.
"""

from __future__ import annotations

import json
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .pipeline import extract

CHECKPOINT_SCHEMA = ("run_id string, part_id int, docs bigint, rows_out bigint, "
                     "label_histogram string, committed_at double")


def _ckpt_path(out_dir: str) -> str:
    return out_dir.rstrip("/") + "/_checkpoint"


def completed_parts(spark: SparkSession, out_dir: str, run_id: str) -> set[int]:
    try:
        rows = (spark.read.parquet(_ckpt_path(out_dir))
                .filter(F.col("run_id") == run_id)
                .select("part_id").distinct().collect())
        return {r["part_id"] for r in rows}
    except Exception:  # first run: checkpoint table doesn't exist yet
        return set()


def run_with_checkpoint(spark: SparkSession, df: DataFrame, out_dir: str,
                        run_id: str, n_parts: int = 8, chunk_size: int = 2,
                        max_chunks: int | None = None,
                        max_spans: int | None = 200_000,
                        extract_fn=None) -> int:
    """Extract ``df`` into ``out_dir`` resumably. Returns #chunks executed.

    ``max_chunks`` exists for the kill/restart test (simulated crash after N
    committed chunks). ``extract_fn`` swaps the extraction strategy (e.g.
    plans.chunked.extract_chunked for giant-heavy corpora).

    The staged input under ``out_dir/_staged_input`` is keyed to the OUT
    DIR: rerunning with the same ``out_dir`` but a different input reuses
    the existing stage by design (that is what makes resume exact); point a
    new input at a new ``out_dir``. A manifest written at staging time
    records ``n_parts`` and the input schema, and a resume whose arguments
    disagree with it FAILS FAST instead of silently pruning part_ids out
    of (or into) the staged range.
    """
    if extract_fn is None:
        extract_fn = extract
    data_dir = out_dir.rstrip("/") + "/data"
    done = completed_parts(spark, out_dir, run_id)
    # stage the keyed input ONCE (skipped when a prior run already staged
    # it): the per-chunk part_id predicate then partition-prunes instead of
    # re-running the whole upstream per chunk (see module docstring)
    staged_dir = out_dir.rstrip("/") + "/_staged_input"
    jvm = spark._jvm
    success = jvm.org.apache.hadoop.fs.Path(staged_dir + "/_SUCCESS")
    fs = success.getFileSystem(spark._jsc.hadoopConfiguration())
    manifest_path = jvm.org.apache.hadoop.fs.Path(
        out_dir.rstrip("/") + "/staged-manifest.json")
    manifest = {"n_parts": int(n_parts),
                "input_schema": df.schema.simpleString()}
    if not fs.exists(success):   # _SUCCESS gates: a killed staging re-runs
        (df.withColumn("part_id",
                       F.pmod(F.xxhash64("doc_id"),
                              F.lit(n_parts)).cast("int"))
           .write.mode("overwrite").partitionBy("part_id")
           .parquet(staged_dir))
        out_stream = fs.create(manifest_path, True)
        out_stream.write(bytearray(json.dumps(manifest).encode("utf-8")))
        out_stream.close()
    elif fs.exists(manifest_path):
        # read through spark.read.text (FS-agnostic; py4j can't mutate a
        # Python bytearray through Hadoop's readFully)
        staged = json.loads(spark.read.text(
            out_dir.rstrip("/") + "/staged-manifest.json",
            wholetext=True).head()["value"])
        if staged.get("n_parts") != manifest["n_parts"]:
            raise ValueError(
                f"staged input at {staged_dir} was keyed with n_parts="
                f"{staged.get('n_parts')} but this run asked for "
                f"{n_parts}; resuming would silently drop or duplicate "
                f"part_ids — rerun with the staging n_parts or use a new "
                f"out_dir")
        if staged.get("input_schema") != manifest["input_schema"]:
            raise ValueError(
                f"staged input at {staged_dir} has schema "
                f"{staged.get('input_schema')} but this run's input has "
                f"{manifest['input_schema']}; a different input must go "
                f"to a new out_dir")
    keyed = spark.read.parquet(staged_dir)
    todo = sorted(set(range(n_parts)) - done)
    chunks = [todo[i:i + chunk_size] for i in range(0, len(todo), chunk_size)]
    executed = 0
    for chunk in chunks:
        if max_chunks is not None and executed >= max_chunks:
            break
        part = keyed.filter(F.col("part_id").isin([int(c) for c in chunk]))
        extracted = extract_fn(part.drop("part_id"), max_spans=max_spans)
        out = extracted.withColumn(
            "part_id", F.pmod(F.xxhash64("doc_id"), F.lit(n_parts)).cast("int"))
        # chunk write = one atomic job commit
        out.write.mode("append").partitionBy("part_id").parquet(data_dir)

        # lineage metrics from the *written* data (exactly-once by read-back)
        written = (spark.read.parquet(data_dir)
                   .filter(F.col("part_id").isin([int(c) for c in chunk])))
        # histogram + doc counts per part (small — collect is fine)
        hist_rows = (written
                     .select("part_id", F.explode_outer("spans").alias("s"))
                     .groupBy("part_id", F.col("s.kind").alias("kind"))
                     .count().collect())
        doc_rows = written.groupBy("part_id").count().collect()
        docs_by_part = {r["part_id"]: r["count"] for r in doc_rows}
        hist_by_part: dict[int, dict[str, int]] = {}
        rows_by_part: dict[int, int] = {}
        for r in hist_rows:
            hist_by_part.setdefault(r["part_id"], {})[r["kind"] or "∅"] = r["count"]
            rows_by_part[r["part_id"]] = rows_by_part.get(r["part_id"], 0) + r["count"]
        now = time.time()
        ckpt_rows = [(run_id, int(p), int(docs_by_part.get(p, 0)),
                      int(rows_by_part.get(p, 0)),
                      json.dumps(hist_by_part.get(p, {}), sort_keys=True,
                                 ensure_ascii=False), now)
                     for p in chunk]
        (spark.createDataFrame(ckpt_rows, schema=CHECKPOINT_SCHEMA)
         .write.mode("append").parquet(_ckpt_path(out_dir)))
        executed += 1
    return executed


def read_results(spark: SparkSession, out_dir: str) -> DataFrame:
    return spark.read.parquet(out_dir.rstrip("/") + "/data")
