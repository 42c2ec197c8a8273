"""Bucketed tables: co-located joins without a shuffle.

At 100 TB the recurring join key (doc_id for extraction outputs joined back
to inputs/metrics; orderkey for the relational surface) should be bucketed at
write time so every subsequent equi-join on it is exchange-free: both sides
read pre-hashed buckets and zip them (SortMergeJoin with no Exchange — the
Spark analog of co-partitioned storage). Verified by plan inspection in
tests/test_bucketing.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str, key: str, buckets: int = 8) -> None:
    (df.write.mode("overwrite")
       .bucketBy(buckets, key).sortBy(key)
       .format("parquet")
       .saveAsTable(table))


def join_bucketed(spark: SparkSession, left: str, right: str,
                  left_key: str, right_key: str) -> DataFrame:
    """Sort-merge join over co-bucketed tables: the `merge` hint keeps the
    planner from broadcasting at toy scale (at 100 TB neither side fits a
    broadcast anyway), and bucketing removes both shuffle exchanges."""
    l = spark.table(left).hint("merge")
    r = spark.table(right)
    return l.join(r, l[left_key] == r[right_key])


def plan_has_shuffle(df: DataFrame) -> bool:
    """True if the executed plan repartitions data (shuffle exchange);
    broadcast exchanges don't count — they move the small side only."""
    plan = df._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001
    return "Exchange hashpartitioning" in plan
