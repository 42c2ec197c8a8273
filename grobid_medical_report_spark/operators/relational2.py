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


def q_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated per-part average via a broadcast self-agg
    (the 'compare each row to its group's aggregate' pattern)."""
    l = _t(spark, sf_dir, "lineitem")
    avg_qty = (l.groupBy("l_partkey")
                .agg((F.avg("l_quantity") * 0.5).alias("half_avg")))
    return (l.join(F.broadcast(avg_qty), "l_partkey")
             .filter(F.col("l_quantity") < F.col("half_avg"))
             .agg(F.round(F.sum("l_extendedprice") / 7.0, 2)
                   .alias("avg_yearly")))


def q_full_outer_brands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join: brands selling tiny sizes vs huge sizes."""
    p = _t(spark, sf_dir, "part")
    tiny = (p.filter(F.col("p_size") <= 3).groupBy("p_brand")
             .agg(F.count(F.lit(1)).alias("n_tiny"))
             .withColumnRenamed("p_brand", "b1"))
    huge = (p.filter(F.col("p_size") >= 47).groupBy("p_brand")
             .agg(F.count(F.lit(1)).alias("n_huge"))
             .withColumnRenamed("p_brand", "b2"))
    return (tiny.join(huge, tiny.b1 == huge.b2, "full_outer")
            .select(F.coalesce("b1", "b2").alias("brand"),
                    F.coalesce("n_tiny", F.lit(0)).alias("n_tiny"),
                    F.coalesce("n_huge", F.lit(0)).alias("n_huge")))


def q_array_hof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions (the span-array manipulation idiom of
    the whole engine, SURVEY §2.10): transform / filter / aggregate / exists
    over the token array, all JVM-side."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = F.split(F.trim("text"), " ")
    total_chars = F.aggregate(F.transform(toks, F.length),
                              F.lit(0), lambda acc, x: acc + x)
    n_long = F.size(F.filter(toks, lambda x: F.length(x) > 4))
    has_spark = F.exists(toks, lambda x: x == "spark").cast("int")
    return d.select("doc_id", total_chars.alias("total_chars"),
                    n_long.alias("n_long_tokens"),
                    has_spark.alias("has_spark"))


ORACLES: dict[str, str] = {
    "q_small_quantity_revenue": """
        SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
        FROM lineitem l
        WHERE l_quantity < (SELECT 0.5 * avg(l_quantity) FROM lineitem
                            WHERE l_partkey = l.l_partkey)
    """,
    "q_full_outer_brands": """
        SELECT coalesce(b1, b2) AS brand,
               coalesce(n_tiny, 0) AS n_tiny, coalesce(n_huge, 0) AS n_huge
        FROM (SELECT p_brand AS b1, count(*) AS n_tiny FROM part
              WHERE p_size <= 3 GROUP BY p_brand) t
        FULL OUTER JOIN
             (SELECT p_brand AS b2, count(*) AS n_huge FROM part
              WHERE p_size >= 47 GROUP BY p_brand) h
        ON b1 = b2
    """,
    "q_array_hof": """
        SELECT doc_id,
               CAST(list_aggregate(list_transform(string_split(trim(text), ' '),
                              x -> length(x)), 'sum') AS INT) AS total_chars,
               len(list_filter(string_split(trim(text), ' '),
                   x -> length(x) > 4)) AS n_long_tokens,
               CAST(len(list_filter(string_split(trim(text), ' '),
                   x -> x = 'spark')) > 0 AS INT) AS has_spark
        FROM documents
    """,
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
    "q_small_quantity_revenue": q_small_quantity_revenue,
    "q_full_outer_brands": q_full_outer_brands,
    "q_array_hof": q_array_hof,
    "q_rollup_orders": q_rollup_orders,
    "q_cube_lineitem": q_cube_lineitem,
    "q_distinct_parts_per_order": q_distinct_parts_per_order,
    "q_exists_big_customers": q_exists_big_customers,
    "q_setops_brands": q_setops_brands,
}
