"""Grouping-set / distinct / subquery / set-operation coverage.

The reference needs none of these (SURVEY.md §2.5/§2.9: no cube/rollup/
distinct/set-ops), but a user of the engine gets them from Spark for free —
these queries pin their semantics against DuckDB so the whole relational
surface is oracle-checked, not just the paths the extraction cascade uses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def q_rollup_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP over (priority, status) with grand total row."""
    o = _t(spark, sf_dir, "orders")
    return (o.rollup("o_orderpriority", "o_orderstatus")
             .agg(F.count(F.lit(1)).alias("n_orders"),
                  F.round(F.sum("o_totalprice"), 2).alias("total")))


def q_cube_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (returnflag, linestatus)."""
    l = _t(spark, sf_dir, "lineitem")
    return (l.cube("l_returnflag", "l_linestatus")
             .agg(F.count(F.lit(1)).alias("n"),
                  F.round(F.sum("l_quantity"), 2).alias("qty")))


def q_distinct_parts_per_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT aggregation: distinct parts and suppliers per order, top-20
    orders by distinct-part count (deterministic tie-break)."""
    l = _t(spark, sf_dir, "lineitem")
    return (l.groupBy("l_orderkey")
             .agg(F.countDistinct("l_partkey").alias("n_parts"),
                  F.countDistinct("l_suppkey").alias("n_supps"))
             .orderBy(F.desc("n_parts"), F.desc("n_supps"), F.asc("l_orderkey"))
             .limit(20))


def q_exists_big_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS-style correlated predicate: customers holding at least one
    order above 400k, per mktsegment."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400_000)
    return (c.join(o, c.c_custkey == o.o_custkey, "left_semi")
             .groupBy("c_mktsegment")
             .agg(F.count(F.lit(1)).alias("n_customers"),
                  F.round(F.avg("c_acctbal"), 4).alias("avg_acctbal")))


def q_setops_brands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT: brands sold in both tiny and huge sizes, minus
    brands with any mid-range price."""
    p = _t(spark, sf_dir, "part")
    small = p.filter(F.col("p_size") <= 5).select("p_brand")
    large = p.filter(F.col("p_size") >= 45).select("p_brand")
    mid_price = p.filter(F.col("p_retailprice").between(1000, 1100)).select("p_brand")
    return (small.intersect(large).exceptAll(mid_price.distinct())
            .withColumnRenamed("p_brand", "brand"))


ORACLES: dict[str, str] = {
    "q_rollup_orders": """
        SELECT o_orderpriority, o_orderstatus,
               count(*) AS n_orders, round(sum(o_totalprice), 2) AS total
        FROM orders GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
    """,
    "q_cube_lineitem": """
        SELECT l_returnflag, l_linestatus,
               count(*) AS n, round(sum(l_quantity), 2) AS qty
        FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    "q_distinct_parts_per_order": """
        SELECT l_orderkey,
               count(DISTINCT l_partkey) AS n_parts,
               count(DISTINCT l_suppkey) AS n_supps
        FROM lineitem GROUP BY l_orderkey
        ORDER BY n_parts DESC, n_supps DESC, l_orderkey ASC LIMIT 20
    """,
    "q_exists_big_customers": """
        SELECT c_mktsegment, count(*) AS n_customers,
               round(avg(c_acctbal), 4) AS avg_acctbal
        FROM customer
        WHERE EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_totalprice > 400000)
        GROUP BY c_mktsegment
    """,
    "q_setops_brands": """
        SELECT brand FROM (
          (SELECT p_brand AS brand FROM part WHERE p_size <= 5
           INTERSECT
           SELECT p_brand FROM part WHERE p_size >= 45)
          EXCEPT ALL
          SELECT DISTINCT p_brand FROM part
          WHERE p_retailprice BETWEEN 1000 AND 1100)
    """,
}

QUERIES = {
    "q_rollup_orders": q_rollup_orders,
    "q_cube_lineitem": q_cube_lineitem,
    "q_distinct_parts_per_order": q_distinct_parts_per_order,
    "q_exists_big_customers": q_exists_big_customers,
    "q_setops_brands": q_setops_brands,
}
