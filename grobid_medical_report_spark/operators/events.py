"""Sequence/window operators over the events stream table.

These are the relational twins of the reference's sequence machinery
(SURVEY.md §2.7): gap-based sessionization is exactly the
``TaggingTokenClusteror`` cluster operator (C2/W7 — lag + change-flag +
running sum), the running window is W1/W6's cumulative scan, and the pivot is
the A1 label->field accumulation. Expressing them over ``events`` proves the
primitives at shuffle scale (partitionBy user_id), where the extraction
pipeline runs them doc-locally inside the Arrow kernel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

SESSION_GAP_MIN = 30


def _ev(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/events.parquet")


def q_sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30 min), per-user session stats."""
    ev = _ev(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    # fractional-second timestamps on both sides (duckdb epoch() is fractional;
    # unix_timestamp() truncates and would disagree at exact gap boundaries)
    sess = (ev.withColumn("prev_ts", F.lag("ts").over(w))
              .withColumn("new_sess",
                          F.when(F.col("prev_ts").isNull(), 1)
                           .when(F.expr("timestampdiff(MICROSECOND, prev_ts, ts)")
                                 > SESSION_GAP_MIN * 60 * 1_000_000, 1)
                           .otherwise(0))
              .withColumn("session_id", F.sum("new_sess").over(
                  w.rowsBetween(W.unboundedPreceding, 0))))
    return (sess.groupBy("user_id", "session_id")
                .agg(F.count(F.lit(1)).alias("n_events"),
                     F.round(F.sum("value"), 2).alias("session_value"))
                .groupBy("user_id")
                .agg(F.count(F.lit(1)).alias("n_sessions"),
                     F.round(F.avg("n_events"), 4).alias("avg_session_events"),
                     F.round(F.max("session_value"), 2).alias("max_session_value")))


def q_running_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative sum per user ordered by time (W6 analog)."""
    ev = _ev(spark, sf_dir)
    w = (W.partitionBy("user_id").orderBy("ts", "event_id")
          .rowsBetween(W.unboundedPreceding, 0))
    return (ev.select("user_id", "event_id",
                      F.round(F.sum("value").over(w), 2).alias("running_value")))


def q_event_type_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide per-user event-type counts (A1 pivot analog)."""
    ev = _ev(spark, sf_dir)
    aggs = [F.sum(F.when(F.col("event_type") == t, 1).otherwise(0)).alias(f"n_{t}")
            for t in ("click", "view", "signup", "error", "purchase")]
    return ev.groupBy("user_id").agg(*aggs)


def q_event_daily_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date bucketing + scalar date functions (X5 analog at table scale),
    including regex extraction from the JSON props column (F10 analog)."""
    ev = _ev(spark, sf_dir)
    return (ev.withColumn("day", F.date_format("ts", "yyyy-MM-dd"))
              .withColumn("k", F.regexp_extract("props", "[0-9]+", 0).cast("int"))
              .groupBy("day")
              .agg(F.count(F.lit(1)).alias("n_events"),
                   # decimal avg: double partial sums are ORDER-dependent,
                   # and the partial order follows the partition count — an
                   # 8-core run can flip the 4th decimal vs a 32-core run
                   # (seen once at sf0.001). Decimal sums are exact, so the
                   # result is engine- and parallelism-independent.
                   F.round(F.avg(F.col("value").cast("decimal(18,6)")), 4)
                    .cast("double").alias("avg_value"),
                   F.round(F.avg("k"), 4).alias("avg_k"),
                   F.countDistinct("user_id").alias("n_users")))


def q_event_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON path extraction from the props column (semi-structured column
    handling — the engine's opaque-payload idiom applied to JSON)."""
    ev = _ev(spark, sf_dir)
    k = F.get_json_object("props", "$.k").cast("int")
    return (ev.withColumn("k", k)
              .groupBy((F.col("k") % 10).alias("k_mod"))
              .agg(F.count(F.lit(1)).alias("n"),
                   F.min("k").alias("min_k"), F.max("k").alias("max_k"),
                   F.round(F.avg(F.col("value").cast("decimal(18,6)")), 4)
                    .cast("double").alias("avg_value")))


def q_topk_users_by_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic top-10 (O4 top-k with key tie-break)."""
    ev = _ev(spark, sf_dir)
    return (ev.groupBy("user_id")
              .agg(F.round(F.sum("value"), 2).alias("total_value"))
              .orderBy(F.desc("total_value"), F.asc("user_id"))
              .limit(10))


def q_event_sliding_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-1-hour activity per event: a RANGE window frame (value
    bounds, not row counts) over epoch-microsecond order — the frame spec
    the other window queries don't exercise. The sum is DECIMAL so frame
    evaluation order (Spark running-scan vs DuckDB segment tree) cannot
    flip rounded doubles."""
    # ts is TIMESTAMP_NTZ; the session timezone is pinned to UTC
    # (session.py), so the cast to TIMESTAMP preserves the wall time
    ev = _ev(spark, sf_dir).withColumn(
        "ts_us", F.unix_micros(F.col("ts").cast("timestamp")))
    w = (W.partitionBy("user_id").orderBy("ts_us")
          .rangeBetween(-3_600_000_000, 0))
    return (ev.select(
                "event_id", "user_id",
                F.count(F.lit(1)).over(w).alias("events_1h"),
                F.round(F.sum(F.col("value").cast("decimal(18,6)")).over(w), 2)
                 .cast("double").alias("value_1h")))


def q_event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-sequence funnel: users whose first 'click' is followed by a
    'purchase' within 7 days. One lazy plan — two branches of the same DAG
    union'd into the result; no event-level self-join (the join carries one
    row per user) and no driver-side actions."""
    ev = _ev(spark, sf_dir)
    first_click = (ev.filter(F.col("event_type") == "click")
                   .groupBy("user_id").agg(F.min("ts").alias("click_ts")))
    clicks = (first_click
              .agg(F.count(F.lit(1)).alias("n_users"))
              .select(F.lit("click").alias("step"), "n_users"))
    conv = (ev.filter(F.col("event_type") == "purchase")
            .select("user_id", "ts")
            .join(first_click, "user_id")
            .filter((F.col("ts") >= F.col("click_ts"))
                    & (F.col("ts") <= F.col("click_ts")
                       + F.expr("INTERVAL 7 DAYS")))
            .agg(F.countDistinct("user_id").alias("n_users"))
            .select(F.lit("click_then_purchase_7d").alias("step"), "n_users"))
    # one lazy plan: both funnel steps are branches of the same DAG, union'd
    # into the result frame — no driver-side .count() actions
    return clicks.unionAll(conv)


def q_event_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-seen week, counted
    in each later week they were active. Two aggregates + one broadcast
    join on the (small) per-user first-week table — no event self-join."""
    ev = _ev(spark, sf_dir).select(
        "user_id", F.date_trunc("week", "ts").alias("week"))
    first = ev.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    active = ev.distinct()
    return (active.join(F.broadcast(first), "user_id")
            .groupBy("cohort_week", "week")
            .agg(F.countDistinct("user_id").alias("users"))
            .withColumn("cohort_week",
                        F.date_format("cohort_week", "yyyy-MM-dd"))
            .withColumn("week", F.date_format("week", "yyyy-MM-dd")))


ORACLES: dict[str, str] = {
    "q_event_retention": """
        WITH weeks AS (
          SELECT DISTINCT user_id, date_trunc('week', ts) AS week
          FROM events),
        first AS (
          SELECT user_id, min(week) AS cohort_week FROM weeks
          GROUP BY user_id)
        SELECT strftime(cohort_week, '%Y-%m-%d') AS cohort_week,
               strftime(week, '%Y-%m-%d') AS week,
               count(DISTINCT user_id) AS users
        FROM weeks JOIN first USING (user_id)
        GROUP BY 1, 2
    """,
    "q_event_funnel": """
        WITH first_click AS (
          SELECT user_id, min(ts) AS click_ts FROM events
          WHERE event_type = 'click' GROUP BY user_id),
        conv AS (
          SELECT e.user_id
          FROM events e JOIN first_click USING (user_id)
          WHERE e.event_type = 'purchase'
            AND e.ts >= click_ts AND e.ts <= click_ts + INTERVAL 7 DAY
          GROUP BY e.user_id)
        SELECT 'click' AS step, count(*)::BIGINT AS n_users FROM first_click
        UNION ALL
        SELECT 'click_then_purchase_7d', count(*)::BIGINT FROM conv
    """,
    "q_event_sliding_value": """
        SELECT event_id, user_id,
               count(*) OVER w AS events_1h,
               CAST(round(sum(CAST(value AS DECIMAL(18,6))) OVER w, 2)
                    AS DOUBLE) AS value_1h
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                     RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
    """,
    "q_sessionize_events": f"""
        WITH flagged AS (
          SELECT user_id, ts, event_id, value,
                 CASE WHEN lag(ts) OVER w IS NULL THEN 1
                      WHEN epoch(ts) - epoch(lag(ts) OVER w) > {SESSION_GAP_MIN * 60}
                      THEN 1 ELSE 0 END AS new_sess
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        sess AS (
          SELECT user_id, value,
                 sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS UNBOUNDED PRECEDING) AS session_id
          FROM flagged),
        per_sess AS (
          SELECT user_id, session_id, count(*) AS n_events,
                 round(sum(value), 2) AS session_value
          FROM sess GROUP BY user_id, session_id)
        SELECT user_id, count(*) AS n_sessions,
               round(avg(n_events), 4) AS avg_session_events,
               round(max(session_value), 2) AS max_session_value
        FROM per_sess GROUP BY user_id
    """,
    "q_running_user_value": """
        SELECT user_id, event_id,
               round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS UNBOUNDED PRECEDING), 2) AS running_value
        FROM events
    """,
    "q_event_type_pivot": """
        SELECT user_id,
               CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_click,
               CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_view,
               CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_signup,
               CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_error,
               CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_purchase
        FROM events GROUP BY user_id
    """,
    "q_event_daily_stats": """
        SELECT strftime(ts, '%Y-%m-%d') AS day,
               count(*) AS n_events,
               CAST(round(avg(CAST(value AS DECIMAL(18,6))), 4) AS DOUBLE) AS avg_value,
               round(avg(CAST(regexp_extract(props, '[0-9]+', 0) AS INT)), 4) AS avg_k,
               count(DISTINCT user_id) AS n_users
        FROM events GROUP BY day
    """,
    "q_event_json_props": """
        SELECT CAST(json_extract_string(props, '$.k') AS INT) % 10 AS k_mod,
               count(*) AS n,
               min(CAST(json_extract_string(props, '$.k') AS INT)) AS min_k,
               max(CAST(json_extract_string(props, '$.k') AS INT)) AS max_k,
               CAST(round(avg(CAST(value AS DECIMAL(18,6))), 4) AS DOUBLE) AS avg_value
        FROM events GROUP BY 1
    """,
    "q_topk_users_by_value": """
        SELECT user_id, round(sum(value), 2) AS total_value
        FROM events GROUP BY user_id
        ORDER BY total_value DESC, user_id ASC LIMIT 10
    """,
}

QUERIES = {
    "q_sessionize_events": q_sessionize_events,
    "q_running_user_value": q_running_user_value,
    "q_event_type_pivot": q_event_type_pivot,
    "q_event_daily_stats": q_event_daily_stats,
    "q_event_json_props": q_event_json_props,
    "q_topk_users_by_value": q_topk_users_by_value,
    "q_event_sliding_value": q_event_sliding_value,
    "q_event_funnel": q_event_funnel,
    "q_event_retention": q_event_retention,
}
