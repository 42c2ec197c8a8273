"""Relational operator demonstrations over the TPC-H-ish testdata tables.

These exercise the engine's general query surface — scans with pushed-down
predicates, hash aggregation, broadcast vs shuffle joins, windows, top-k,
set operations, pivot — the Spark primitives SURVEY.md §2 maps the reference
onto. Every query here has a matching DuckDB oracle (ORACLES) with identical
column aliases; floats are rounded in both engines so order-of-addition noise
cannot flip the value hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: filter + hash agg (map-side partial agg, no join)."""
    l = _t(spark, sf_dir, "lineitem")
    return (l.filter(F.col("l_shipdate") <= "1998-09-02")
            .groupBy("l_returnflag", "l_linestatus")
            .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
                 F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
                 F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
                  .alias("sum_disc_price"),
                 F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
                 F.round(F.avg("l_discount"), 4).alias("avg_disc"),
                 F.count(F.lit(1)).alias("count_order")))


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-way join (broadcast dim x fact) + agg + deterministic top-10."""
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < "1998-01-01")
    l = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > "1997-01-01")
    return (l.join(o, l.l_orderkey == o.o_orderkey)
             .join(F.broadcast(c), o.o_custkey == c.c_custkey)
             .groupBy("l_orderkey",
                      F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"))
             .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
                   .alias("revenue"))
             .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
             .limit(10))


def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star join across all dims; small sides broadcast (SURVEY.md J1 analog)."""
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    n = _t(spark, sf_dir, "nation")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1997-01-01"))
    l = _t(spark, sf_dir, "lineitem")
    return (l.join(o, l.l_orderkey == o.o_orderkey)
             .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
             .join(c, (o.o_custkey == c.c_custkey)
                   & (c.c_nationkey == s.s_nationkey))
             .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
             .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
             .groupBy("n_name")
             .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
                   .alias("revenue")))


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure filter + scalar agg — the predicate-pushdown showcase."""
    l = _t(spark, sf_dir, "lineitem")
    return (l.filter((F.col("l_shipdate") >= "1996-01-01")
                     & (F.col("l_shipdate") < "1997-01-01")
                     & (F.col("l_discount").between(0.03, 0.07))
                     & (F.col("l_quantity") < 24))
            .agg(F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2)
                  .alias("revenue")))


def q_top_suppliers_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window ranking (row_number with deterministic tie-break)."""
    s = _t(spark, sf_dir, "supplier")
    l = _t(spark, sf_dir, "lineitem")
    n = _t(spark, sf_dir, "nation")
    rev = (l.join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
            .groupBy("s_suppkey", "s_nationkey")
            .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
                  .alias("supp_revenue")))
    w = W.partitionBy("s_nationkey").orderBy(F.desc("supp_revenue"), F.asc("s_suppkey"))
    return (rev.withColumn("rnk", F.row_number().over(w))
               .filter(F.col("rnk") <= 3)
               .join(F.broadcast(n), rev.s_nationkey == n.n_nationkey)
               .select("n_name", "s_suppkey", "supp_revenue", "rnk"))


def q_setop_customer_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi/anti join set split: customers with vs without orders, per nation."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    n = _t(spark, sf_dir, "nation")
    active = (c.join(o, c.c_custkey == o.o_custkey, "left_semi")
               .groupBy("c_nationkey").agg(F.count(F.lit(1)).alias("active"))
               .withColumnRenamed("c_nationkey", "a_nationkey"))
    idle = (c.join(o, c.c_custkey == o.o_custkey, "left_anti")
             .groupBy("c_nationkey").agg(F.count(F.lit(1)).alias("idle"))
             .withColumnRenamed("c_nationkey", "i_nationkey"))
    return (F.broadcast(n)
            .join(active, n.n_nationkey == active.a_nationkey, "left")
            .join(idle, n.n_nationkey == idle.i_nationkey, "left")
            .select("n_name",
                    F.coalesce("active", F.lit(0)).alias("active"),
                    F.coalesce(F.col("idle"), F.lit(0)).alias("idle")))


def q_part_type_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot analog of the reference's label->field accumulation (A1):
    brand x size-class counts as wide conditional aggregates."""
    p = _t(spark, sf_dir, "part")
    return (p.groupBy("p_brand")
             .agg(F.sum(F.when(F.col("p_size") < 10, 1).otherwise(0)).alias("n_small"),
                  F.sum(F.when((F.col("p_size") >= 10) & (F.col("p_size") < 30), 1)
                         .otherwise(0)).alias("n_medium"),
                  F.sum(F.when(F.col("p_size") >= 30, 1).otherwise(0)).alias("n_large"),
                  F.round(F.avg("p_retailprice"), 2).alias("avg_price")))


ORACLES: dict[str, str] = {
    "q1_pricing_summary": """
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2) AS sum_qty,
               round(sum(l_extendedprice), 2) AS sum_base_price,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
               round(avg(l_quantity), 4) AS avg_qty,
               round(avg(l_discount), 4) AS avg_disc,
               count(*) AS count_order
        FROM lineitem WHERE l_shipdate <= '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
    """,
    "q3_shipping_priority": """
        SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             JOIN customer ON o_custkey = c_custkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < '1998-01-01' AND l_shipdate > '1997-01-01'
        GROUP BY l_orderkey, strftime(o_orderdate, '%Y-%m-%d')
        ORDER BY revenue DESC, o_orderdate, l_orderkey LIMIT 10
    """,
    "q5_local_supplier_volume": """
        SELECT n_name,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             JOIN supplier ON l_suppkey = s_suppkey
             JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
             JOIN nation ON s_nationkey = n_nationkey
             JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'EUROPE'
          AND o_orderdate >= '1996-01-01' AND o_orderdate < '1997-01-01'
        GROUP BY n_name
    """,
    "q6_forecast_revenue": """
        SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
        FROM lineitem
        WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1997-01-01'
          AND l_discount BETWEEN 0.03 AND 0.07 AND l_quantity < 24
    """,
    "q_top_suppliers_per_nation": """
        WITH rev AS (
          SELECT s_suppkey, s_nationkey,
                 round(sum(l_extendedprice * (1 - l_discount)), 2) AS supp_revenue
          FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
          GROUP BY s_suppkey, s_nationkey),
        ranked AS (
          SELECT *, row_number() OVER (PARTITION BY s_nationkey
                       ORDER BY supp_revenue DESC, s_suppkey ASC) AS rnk
          FROM rev)
        SELECT n_name, s_suppkey, supp_revenue, rnk
        FROM ranked JOIN nation ON s_nationkey = n_nationkey
        WHERE rnk <= 3
    """,
    "q_setop_customer_activity": """
        SELECT n_name,
               CAST(coalesce(sum(CASE WHEN has_order THEN 1 ELSE 0 END), 0)
                    AS BIGINT) AS active,
               CAST(coalesce(sum(CASE WHEN has_order = false THEN 1 ELSE 0 END), 0)
                    AS BIGINT) AS idle
        FROM nation LEFT JOIN (
          SELECT c_nationkey,
                 EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey) AS has_order
          FROM customer) c
        ON c_nationkey = n_nationkey
        GROUP BY n_name
    """,
    "q_part_type_pivot": """
        SELECT p_brand,
               CAST(sum(CASE WHEN p_size < 10 THEN 1 ELSE 0 END) AS BIGINT) AS n_small,
               CAST(sum(CASE WHEN p_size >= 10 AND p_size < 30 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_medium,
               CAST(sum(CASE WHEN p_size >= 30 THEN 1 ELSE 0 END) AS BIGINT) AS n_large,
               round(avg(p_retailprice), 2) AS avg_price
        FROM part GROUP BY p_brand
    """,
}

QUERIES = {
    "q1_pricing_summary": q1_pricing_summary,
    "q3_shipping_priority": q3_shipping_priority,
    "q5_local_supplier_volume": q5_local_supplier_volume,
    "q6_forecast_revenue": q6_forecast_revenue,
    "q_top_suppliers_per_nation": q_top_suppliers_per_nation,
    "q_setop_customer_activity": q_setop_customer_activity,
    "q_part_type_pivot": q_part_type_pivot,
}
