"""TPC-H-adapted relational coverage, part 3: the canonical query shapes not
yet exercised by relational.py/relational2.py, adapted to the testdata's
column subset (no partsupp, no ship/commit/receipt-date triple, no phone).

Shapes covered here and why they matter at 100 TB:

- semi-join existence agg (Q4)           -> left_semi, no row explosion
- nation-pair volume (Q7)                -> two broadcast dims on one fact pass
- market share via conditional agg (Q8)  -> case-when instead of self-join
- profit by nation x year (Q9)           -> mid-size dim join + derived measure
- returned-item top-k (Q10)              -> agg-then-topk, WindowGroupLimit
- order-count histogram (Q13)            -> left outer + double aggregation
- promo ratio (Q14)                      -> single-pass conditional ratio
- argmax supplier (Q15)                  -> agg + global-max filter, no re-scan
- large-volume join-back (Q18)           -> HAVING pre-filter *before* the join,
                                            so the join input is already tiny
- OR-of-ANDs pushdown (Q19)              -> disjunctive predicate still pruned
- min-cost supplier per part (Q2 analog) -> deterministic argmin via
                                            row_number on (value, key)
- idle rich customers (Q22)              -> scalar subquery + anti-join

Reference context: the reference engine has no relational joins at all
(SURVEY.md §2.6); these queries document the general query surface of the
Spark engine that hosts the extraction cascade.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS -> left_semi join, then count by priority.
    The semi-join keeps the orders row-width and never duplicates rows."""
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1996-07-01"))
    ret = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R") \
        .select("l_orderkey")
    return (o.join(ret, o.o_orderkey == ret.l_orderkey, "left_semi")
             .groupBy("o_orderpriority")
             .agg(F.count(F.lit(1)).alias("order_count")))


def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: revenue flows between two nations, both directions,
    by year. supplier+customer are both broadcast; the fact table is read
    once."""
    n1, n2 = "NATION_1", "NATION_2"
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    s = (_t(spark, sf_dir, "supplier")
         .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
         .select("s_suppkey", F.col("n_name").alias("supp_nation")))
    c = (_t(spark, sf_dir, "customer")
         .join(F.broadcast(n), F.col("c_nationkey") == n.n_nationkey)
         .select("c_custkey", F.col("n_name").alias("cust_nation")))
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    l = _t(spark, sf_dir, "lineitem")
    joined = (l.join(o, l.l_orderkey == o.o_orderkey)
               .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
               .join(F.broadcast(c), o.o_custkey == c.c_custkey)
               .filter(((F.col("supp_nation") == n1) & (F.col("cust_nation") == n2))
                       | ((F.col("supp_nation") == n2) & (F.col("cust_nation") == n1))))
    return (joined.groupBy("supp_nation", "cust_nation",
                           F.year("o_orderdate").alias("l_year"))
            .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
                  .alias("revenue")))


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: NATION_3's share of EUROPE-customer revenue per year —
    a conditional aggregate over one joined pass, not a self-join."""
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    eur_nations = n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey) \
        .select("n_nationkey")
    c = _t(spark, sf_dir, "customer") \
        .join(F.broadcast(eur_nations), F.col("c_nationkey") == F.col("n_nationkey")) \
        .select("c_custkey")
    s = (_t(spark, sf_dir, "supplier")
         .join(F.broadcast(n.select("n_nationkey", "n_name")),
               F.col("s_nationkey") == F.col("n_nationkey"))
         .select("s_suppkey", F.col("n_name").alias("supp_nation")))
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    l = _t(spark, sf_dir, "lineitem")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (l.join(o, l.l_orderkey == o.o_orderkey)
             .join(F.broadcast(c), o.o_custkey == c.c_custkey)
             .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
             .groupBy(F.year("o_orderdate").alias("o_year"))
             .agg(F.round(
                 F.sum(F.when(F.col("supp_nation") == "NATION_3", vol).otherwise(0.0))
                 / F.sum(vol), 4).alias("mkt_share")))


def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit (revenue minus a retail-price cost proxy — the
    testdata has no partsupp.ps_supplycost) by supplier nation and year for
    parts named like '%widget%'."""
    p = _t(spark, sf_dir, "part").filter(F.col("p_name").contains("widget")) \
        .select("p_partkey", "p_retailprice")
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    l = _t(spark, sf_dir, "lineitem")
    # money maths in exact decimal: the per-row profit is a <=4dp-exact value,
    # so summing DECIMAL(18,6) is order-independent — float sums can flip the
    # final cent between engines (see test_differential.py), decimals cannot
    profit = (F.col("l_extendedprice") * (1 - F.col("l_discount"))
              - F.lit(0.1) * F.col("p_retailprice") * F.col("l_quantity")
              ).cast("decimal(18,6)")
    return (l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
             .join(o, l.l_orderkey == o.o_orderkey)
             .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
             .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
             .groupBy(F.col("n_name").alias("nation"),
                      F.year("o_orderdate").alias("o_year"))
             .agg(F.round(F.sum(profit), 2).cast("double").alias("sum_profit")))


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: top-20 customers by revenue lost to returns in a
    quarter. Aggregate first, top-k after — the sort sees 1.5k rows, not 60k."""
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_acctbal")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1996-04-01"))
    l = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (l.join(o, l.l_orderkey == o.o_orderkey)
             .join(c, o.o_custkey == c.c_custkey)
             .groupBy("c_custkey", "c_name",
                      F.round("c_acctbal", 2).alias("c_acctbal"))
             .agg(F.round(F.sum((F.col("l_extendedprice")
                                 * (1 - F.col("l_discount"))).cast("decimal(18,6)")),
                          2).cast("double").alias("revenue"))
             .orderBy(F.desc("revenue"), "c_custkey")
             .limit(20))


def q13_order_count_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: distribution of order counts per customer, zero
    included — left outer join then aggregate the aggregate."""
    c = _t(spark, sf_dir, "customer").select("c_custkey")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "1-URGENT") \
        .select("o_custkey", "o_orderkey")
    per_cust = (c.join(o, c.c_custkey == o.o_custkey, "left")
                 .groupBy("c_custkey")
                 .agg(F.count("o_orderkey").alias("c_count")))
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


def q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: percentage of a month's revenue from PROMO parts —
    a single-pass conditional ratio with the part dim broadcast."""
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_type")
    l = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-03-01") & (F.col("l_shipdate") < "1996-04-01"))
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
             .agg(F.round(
                 F.lit(100.0)
                 * F.sum(F.when(F.col("p_type") == "PROMO", vol).otherwise(0.0))
                 / F.sum(vol), 4).alias("promo_revenue_pct")))


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: supplier(s) with the maximum quarterly revenue. The
    global max is a window over the 100-row aggregate, not a fact re-scan."""
    l = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-04-01"))
    rev = (l.groupBy("l_suppkey")
            .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
                  .alias("total_revenue")))
    mx = W.partitionBy()
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (rev.withColumn("max_rev", F.max("total_revenue").over(mx))
               .filter(F.col("total_revenue") == F.col("max_rev"))
               .drop("max_rev")
               .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
               .select("s_suppkey", "s_name", "total_revenue"))


def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: orders whose total quantity exceeds 250 — the HAVING
    runs before any join, so only the qualifying handful reaches the joins."""
    l = _t(spark, sf_dir, "lineitem")
    big = (l.groupBy("l_orderkey")
            .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
            .filter(F.col("total_qty") > 250))
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey",
                                           "o_orderdate", "o_totalprice")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (big.join(o, big.l_orderkey == o.o_orderkey)
               .join(F.broadcast(c), o.o_custkey == c.c_custkey)
               .select("c_name", "c_custkey", F.col("l_orderkey").alias("o_orderkey"),
                       F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
                       F.round("o_totalprice", 2).alias("o_totalprice"),
                       "total_qty")
               .orderBy(F.desc("total_qty"), "o_orderkey")
               .limit(100))


def q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: OR-of-ANDs join predicate. The common part (join key)
    stays an equi-join; the disjunction is a post-join filter Catalyst can
    still partially push to both scans (brand/size to part, qty to lineitem)."""
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    l = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount")
    j = l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
    cond = (
        ((F.col("p_brand") == "Brand#12") & (F.col("p_size").between(1, 10))
         & (F.col("l_quantity").between(1, 15)))
        | ((F.col("p_brand") == "Brand#23") & (F.col("p_size").between(1, 20))
           & (F.col("l_quantity").between(10, 25)))
        | ((F.col("p_brand") == "Brand#3") & (F.col("p_size").between(1, 30))
           & (F.col("l_quantity").between(20, 35))))
    return (j.filter(cond)
             .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
                   .alias("revenue")))


def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 analog (no partsupp in the testdata): per large part, the
    supplier offering the lowest observed unit price. Deterministic argmin:
    row_number over (unit_price, suppkey) — ties cannot flip the winner."""
    p = _t(spark, sf_dir, "part").filter(F.col("p_size") >= 45) \
        .select("p_partkey", "p_name")
    l = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey",
                                             "l_extendedprice", "l_quantity")
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    # integer-scaled unit price: cents*100 div quantity. Rounding the double
    # quotient to 4 dp flipped last digits between engines (Spark rounds the
    # shortest decimal repr HALF_UP, DuckDB rounds the scaled double) —
    # integer arithmetic is exact and identical everywhere.
    unit_scaled = F.expr(
        "(CAST(round(l_extendedprice * 100) AS BIGINT) * 100)"
        " div CAST(l_quantity AS BIGINT)")
    offers = (l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
               .withColumn("unit_price_e4", unit_scaled))
    w = W.partitionBy("p_partkey").orderBy("unit_price_e4", "l_suppkey")
    return (offers.withColumn("rn", F.row_number().over(w))
                  .filter(F.col("rn") == 1)
                  .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
                  .select("p_partkey", "p_name", "s_suppkey", "s_name",
                          "unit_price_e4"))


def q22_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: positive-balance customers above the average balance
    who never placed a large (>300k) order — scalar subquery + anti-join,
    counted by nation."""
    c = _t(spark, sf_dir, "customer")
    avg_bal = (c.filter(F.col("c_acctbal") > 0)
                .agg(F.avg("c_acctbal").alias("a")))
    o = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000) \
        .select("o_custkey")
    rich = (c.join(F.broadcast(avg_bal))
             .filter(F.col("c_acctbal") > F.col("a"))
             .join(o, c.c_custkey == o.o_custkey, "left_anti"))
    return (rich.groupBy("c_nationkey")
                .agg(F.count(F.lit(1)).alias("numcust"),
                     F.round(F.sum("c_acctbal"), 2).alias("totacctbal")))


ORACLES: dict[str, str] = {
    "q4_order_priority": """
        SELECT o_orderpriority, count(*) AS order_count
        FROM orders
        WHERE o_orderdate >= '1996-01-01' AND o_orderdate < '1996-07-01'
          AND EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
        GROUP BY o_orderpriority
    """,
    "q7_volume_shipping": """
        SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
               CAST(year(o_orderdate) AS INT) AS l_year,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM lineitem
          JOIN orders   ON l_orderkey = o_orderkey
          JOIN supplier ON l_suppkey = s_suppkey
          JOIN customer ON o_custkey = c_custkey
          JOIN nation sn ON s_nationkey = sn.n_nationkey
          JOIN nation cn ON c_nationkey = cn.n_nationkey
        WHERE (sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
           OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1')
        GROUP BY sn.n_name, cn.n_name, CAST(year(o_orderdate) AS INT)
    """,
    "q8_market_share": """
        SELECT CAST(year(o_orderdate) AS INT) AS o_year,
               round(sum(CASE WHEN sn.n_name = 'NATION_3'
                              THEN l_extendedprice * (1 - l_discount)
                              ELSE 0.0 END)
                     / sum(l_extendedprice * (1 - l_discount)), 4) AS mkt_share
        FROM lineitem
          JOIN orders   ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
          JOIN nation cn ON c_nationkey = cn.n_nationkey
          JOIN region   ON cn.n_regionkey = r_regionkey
          JOIN supplier ON l_suppkey = s_suppkey
          JOIN nation sn ON s_nationkey = sn.n_nationkey
        WHERE r_name = 'EUROPE'
        GROUP BY CAST(year(o_orderdate) AS INT)
    """,
    "q9_product_profit": """
        SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
               CAST(round(sum(CAST(l_extendedprice * (1 - l_discount)
                                   - 0.1 * p_retailprice * l_quantity
                                   AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_profit
        FROM lineitem
          JOIN part     ON l_partkey = p_partkey
          JOIN orders   ON l_orderkey = o_orderkey
          JOIN supplier ON l_suppkey = s_suppkey
          JOIN nation   ON s_nationkey = n_nationkey
        WHERE p_name LIKE '%widget%'
        GROUP BY n_name, CAST(year(o_orderdate) AS INT)
    """,
    "q10_returned_items": """
        SELECT c_custkey, c_name, round(c_acctbal, 2) AS c_acctbal,
               CAST(round(sum(CAST(l_extendedprice * (1 - l_discount)
                                   AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue
        FROM lineitem
          JOIN orders   ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
        WHERE l_returnflag = 'R'
          AND o_orderdate >= '1996-01-01' AND o_orderdate < '1996-04-01'
        GROUP BY c_custkey, c_name, round(c_acctbal, 2)
        ORDER BY revenue DESC, c_custkey LIMIT 20
    """,
    "q13_order_count_histogram": """
        SELECT c_count, count(*) AS custdist
        FROM (SELECT c_custkey, count(o_orderkey) AS c_count
              FROM customer LEFT JOIN orders
                ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
              GROUP BY c_custkey)
        GROUP BY c_count
    """,
    "q14_promo_effect": """
        SELECT round(100.0 * sum(CASE WHEN p_type = 'PROMO'
                                      THEN l_extendedprice * (1 - l_discount)
                                      ELSE 0.0 END)
                     / sum(l_extendedprice * (1 - l_discount)), 4)
               AS promo_revenue_pct
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= '1996-03-01' AND l_shipdate < '1996-04-01'
    """,
    "q15_top_supplier": """
        WITH rev AS (
          SELECT l_suppkey,
                 round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
          FROM lineitem
          WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1996-04-01'
          GROUP BY l_suppkey)
        SELECT s_suppkey, s_name, total_revenue
        FROM rev JOIN supplier ON l_suppkey = s_suppkey
        WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
    """,
    "q18_large_volume_customers": """
        SELECT c_name, c_custkey, o_orderkey,
               strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
               round(o_totalprice, 2) AS o_totalprice, total_qty
        FROM (SELECT l_orderkey, round(sum(l_quantity), 2) AS total_qty
              FROM lineitem GROUP BY l_orderkey
              HAVING sum(l_quantity) > 250) big
          JOIN orders   ON big.l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
        ORDER BY total_qty DESC, o_orderkey LIMIT 100
    """,
    "q19_discounted_revenue": """
        SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 10
               AND l_quantity BETWEEN 1 AND 15)
           OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 20
               AND l_quantity BETWEEN 10 AND 25)
           OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 30
               AND l_quantity BETWEEN 20 AND 35)
    """,
    "q2_min_cost_supplier": """
        WITH offers AS (
          SELECT p_partkey, p_name, l_suppkey,
                 (CAST(round(l_extendedprice * 100) AS BIGINT) * 100)
                   // CAST(l_quantity AS BIGINT) AS unit_price_e4,
                 row_number() OVER (PARTITION BY p_partkey
                   ORDER BY (CAST(round(l_extendedprice * 100) AS BIGINT)
                             * 100) // CAST(l_quantity AS BIGINT),
                            l_suppkey) AS rn
          FROM lineitem JOIN part ON l_partkey = p_partkey
          WHERE p_size >= 45)
        SELECT p_partkey, p_name, s_suppkey, s_name, unit_price_e4
        FROM offers JOIN supplier ON l_suppkey = s_suppkey
        WHERE rn = 1
    """,
    "q22_idle_rich_customers": """
        SELECT c_nationkey, count(*) AS numcust,
               round(sum(c_acctbal), 2) AS totacctbal
        FROM customer
        WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer
                           WHERE c_acctbal > 0)
          AND NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey AND o_totalprice > 300000)
        GROUP BY c_nationkey
    """,
}

QUERIES = {
    "q4_order_priority": q4_order_priority,
    "q7_volume_shipping": q7_volume_shipping,
    "q8_market_share": q8_market_share,
    "q9_product_profit": q9_product_profit,
    "q10_returned_items": q10_returned_items,
    "q13_order_count_histogram": q13_order_count_histogram,
    "q14_promo_effect": q14_promo_effect,
    "q15_top_supplier": q15_top_supplier,
    "q18_large_volume_customers": q18_large_volume_customers,
    "q19_discounted_revenue": q19_discounted_revenue,
    "q2_min_cost_supplier": q2_min_cost_supplier,
    "q22_idle_rich_customers": q22_idle_rich_customers,
}
