"""Temporal/non-equi join operators Spark lacks as primitives (task list:
"as-of join, range join"), composed from existing DataFrame ops.

* as-of join — for each left row, the latest right row at-or-before it.
  Spark has no ASOF JOIN; the scalable composition is union-tag + window
  (one shuffle on the key, no range explosion): tag both sides, sort by
  (key, ts), carry the last right row forward with ``last(ignorenulls)``
  over an unbounded-preceding window, keep left rows. DuckDB has native
  ASOF JOIN — the oracle.

* range join — non-equi band join against a small ranges dimension. The
  small side broadcasts (BroadcastNestedLoopJoin); at scale the left side
  is pre-binned to turn it into an equi-join (bin = floor(x / band_width))
  — both shapes produce identical rows; the binned one is used here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

PRICE_BAND = 20_000.0
N_BANDS = 6


def q_asof_error_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every 'error' event: the same user's most recent purchase
    at-or-before it (value + how long before)."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    err = ev.filter(F.col("event_type") == "error").select(
        "user_id", F.col("event_id").alias("error_id"),
        F.col("ts").alias("error_ts"))
    pur = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"))

    # union-tag + carry-forward window (the shuffle-lean as-of composition)
    left = err.select("user_id", F.col("error_ts").alias("ts"),
                      "error_id", F.lit(None).cast("timestamp").alias("purchase_ts"),
                      F.lit(None).cast("double").alias("purchase_value"),
                      F.lit(1).alias("is_left"))
    right = pur.select("user_id", F.col("purchase_ts").alias("ts"),
                       F.lit(None).cast("bigint").alias("error_id"),
                       "purchase_ts", "purchase_value", F.lit(0).alias("is_left"))
    # right rows sort before left rows at equal ts so "at-or-before" includes
    # a purchase at the exact error timestamp
    w = (W.partitionBy("user_id").orderBy("ts", "is_left")
          .rowsBetween(W.unboundedPreceding, 0))
    merged = (left.unionByName(right)
              .withColumn("last_purchase_ts",
                          F.last("purchase_ts", ignorenulls=True).over(w))
              .withColumn("last_purchase_value",
                          F.last("purchase_value", ignorenulls=True).over(w)))
    return (merged.filter(F.col("is_left") == 1)
            .select("user_id", "error_id",
                    F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS")
                     .alias("error_ts"),
                    # no-prior-purchase rows carry a -1.0 sentinel instead of
                    # NULL: pandas renders nullable doubles as NaN, which the
                    # driver's value hash distinguishes from None
                    F.coalesce(F.round("last_purchase_value", 2), F.lit(-1.0))
                     .alias("purchase_value"),
                    # TIMESTAMP_NTZ has no double cast; microsecond diff
                    F.coalesce(
                        F.round(F.expr(
                            "timestampdiff(MICROSECOND, last_purchase_ts, ts)")
                            / 1e6, 3), F.lit(-1.0))
                     .alias("secs_since_purchase")))


def q_range_join_price_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lineitem revenue per price band — the band join expressed as an
    equi-join on the precomputed bin (the 100 TB-safe shape of a range
    join against a static interval dimension)."""
    l = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    bands = spark.createDataFrame(
        [(i, i * PRICE_BAND, (i + 1) * PRICE_BAND if i < N_BANDS - 1 else 1e18,
          f"band_{i}") for i in range(N_BANDS)],
        "band_id int, lo double, hi double, band string")
    binned = l.withColumn(
        "band_id",
        F.least(F.floor(F.col("l_extendedprice") / PRICE_BAND),
                F.lit(N_BANDS - 1)).cast("int"))
    return (binned.join(F.broadcast(bands), "band_id")
            .groupBy("band")
            .agg(F.count(F.lit(1)).alias("n_items"),
                 F.round(F.sum("l_extendedprice"), 2).alias("band_revenue")))


ORACLES: dict[str, str] = {
    "q_asof_error_purchase": """
        SELECT e.user_id, e.event_id AS error_id,
               strftime(e.ts, '%Y-%m-%d %H:%M:%S.%f') AS error_ts,
               coalesce(round(p.value, 2), -1.0) AS purchase_value,
               -- exact integer microseconds (epoch() doubles lose
               -- sub-microsecond precision at 1.7e9-second magnitudes)
               coalesce(round(date_diff('microseconds', p.ts, e.ts) / 1e6,
                     3), -1.0) AS secs_since_purchase
        FROM (SELECT * FROM events WHERE event_type = 'error') e
        ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
        ON e.user_id = p.user_id AND e.ts >= p.ts
    """,
    "q_range_join_price_bands": f"""
        WITH bands AS (
          SELECT i AS band_id, i * {PRICE_BAND} AS lo,
                 CASE WHEN i < {N_BANDS - 1} THEN (i + 1) * {PRICE_BAND}
                      ELSE 1e18 END AS hi,
                 'band_' || i AS band
          FROM range({N_BANDS}) t(i))
        SELECT band, count(*) AS n_items,
               round(sum(l_extendedprice), 2) AS band_revenue
        FROM lineitem JOIN bands
          ON l_extendedprice >= lo AND l_extendedprice < hi
        GROUP BY band
    """,
}

QUERIES = {
    "q_asof_error_purchase": q_asof_error_purchase,
    "q_range_join_price_bands": q_range_join_price_bands,
}
