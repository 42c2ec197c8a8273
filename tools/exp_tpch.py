"""r8 experiment variants for the TPC-H bench heads (A/B via ab_query.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from grobid_medical_report_spark.operators.relational import (
    _t, q3_shipping_priority, q5_local_supplier_volume)
from grobid_medical_report_spark.operators.relational3 import q9_product_profit

q3_base = q3_shipping_priority
q5_base = q5_local_supplier_volume
q9_base = q9_product_profit


def q3_shj(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q3 with the orders side of the fact join built as a shuffled hash
    table (no sort of either side)."""
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < "1998-01-01")
    l = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > "1997-01-01")
    return (l.join(o.hint("shuffle_hash"), l.l_orderkey == o.o_orderkey)
             .join(F.broadcast(c), o.o_custkey == c.c_custkey)
             .groupBy("l_orderkey",
                      F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"))
             .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
                   .alias("revenue"))
             .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
             .limit(10))


def q5_shj(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    n = _t(spark, sf_dir, "nation")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1997-01-01"))
    l = _t(spark, sf_dir, "lineitem")
    return (l.join(o.hint("shuffle_hash"), l.l_orderkey == o.o_orderkey)
             .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
             .join(c.hint("shuffle_hash"), (o.o_custkey == c.c_custkey)
                   & (c.c_nationkey == s.s_nationkey))
             .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
             .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
             .groupBy("n_name")
             .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
                   .alias("revenue")))


def q9_shj(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part").filter(F.col("p_name").contains("widget")) \
        .select("p_partkey", "p_retailprice")
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    l = _t(spark, sf_dir, "lineitem")
    profit = (F.col("l_extendedprice") * (1 - F.col("l_discount"))
              - F.lit(0.1) * F.col("p_retailprice") * F.col("l_quantity")
              ).cast("decimal(18,6)")
    return (l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
             .join(o.hint("shuffle_hash"), l.l_orderkey == o.o_orderkey)
             .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
             .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
             .groupBy(F.col("n_name").alias("nation"),
                      F.year("o_orderdate").alias("o_year"))
             .agg(F.round(F.sum(profit), 2).cast("double").alias("sum_profit")))


def q5_shj_o(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q5 with only the orders side hinted; customer join left to the
    planner."""
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    n = _t(spark, sf_dir, "nation")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1997-01-01"))
    l = _t(spark, sf_dir, "lineitem")
    return (l.join(o.hint("shuffle_hash"), l.l_orderkey == o.o_orderkey)
             .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
             .join(c, (o.o_custkey == c.c_custkey)
                   & (c.c_nationkey == s.s_nationkey))
             .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
             .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
             .groupBy("n_name")
             .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
                   .alias("revenue")))
