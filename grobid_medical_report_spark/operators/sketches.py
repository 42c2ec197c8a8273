"""Sketch aggregates: approximate distinct counts and quantiles.

At 100 TB, exact COUNT(DISTINCT) and exact percentiles over high-cardinality
keys are shuffle-heavy; HyperLogLog++ (`approx_count_distinct`) and the
Greenwald-Khanna quantile sketch (`percentile_approx`) are the mergeable,
bounded-memory replacements. Sketch outputs are algorithm-specific, so there
is no cross-engine value oracle — correctness is pinned as relative-error
bounds against the exact computation (tests/test_sketches.py), the standard
way to verify sketches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def x_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-table sketch vs exact cardinalities + value quantiles."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    a = li.agg(
        F.lit("lineitem").alias("table_name"),
        F.approx_count_distinct("l_partkey", 0.02).alias("approx_keys"),
        F.countDistinct("l_partkey").alias("exact_keys"),
        F.percentile_approx("l_extendedprice", 0.5, 10_000).alias("approx_p50"),
        F.expr("percentile(l_extendedprice, 0.5)").alias("exact_p50"),
        F.percentile_approx("l_extendedprice", 0.95, 10_000).alias("approx_p95"),
        F.expr("percentile(l_extendedprice, 0.95)").alias("exact_p95"))
    b = ev.agg(
        F.lit("events").alias("table_name"),
        F.approx_count_distinct("user_id", 0.02).alias("approx_keys"),
        F.countDistinct("user_id").alias("exact_keys"),
        F.percentile_approx("value", 0.5, 10_000).alias("approx_p50"),
        F.expr("percentile(value, 0.5)").alias("exact_p50"),
        F.percentile_approx("value", 0.95, 10_000).alias("approx_p95"),
        F.expr("percentile(value, 0.95)").alias("exact_p95"))
    return a.unionByName(b)


QUERIES = {}
ROWS_ONLY_QUERIES = {"x_sketches": x_sketches}
ORACLES: dict[str, str] = {}
