"""Bucketed co-located join: the equi-join plan must contain no Exchange."""

import pyspark.sql.functions as F

from grobid_medical_report_spark.sources.bucketing import (
    join_bucketed, plan_has_shuffle, write_bucketed)


def test_bucketed_join_is_shuffle_free(spark, tmp_path):
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS od_b")
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    od = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    write_bucketed(li, "li_b", "l_orderkey", buckets=4)
    write_bucketed(od, "od_b", "o_orderkey", buckets=4)

    joined = join_bucketed(spark, "li_b", "od_b", "l_orderkey", "o_orderkey")
    agg = joined.groupBy("o_orderstatus").agg(F.count(F.lit(1)).alias("n"))
    # force planning, then inspect: join itself must not shuffle either side
    assert joined.count() > 0
    assert not plan_has_shuffle(joined), (
        "bucketed equi-join should read co-located buckets without a shuffle")

    # sanity: the same merge join over plain parquet DOES shuffle both sides
    plain = li.hint("merge").join(od, li.l_orderkey == od.o_orderkey)
    plain.count()
    assert plan_has_shuffle(plain)

    # results identical either way
    a = {(r["o_orderstatus"], r["n"]) for r in agg.collect()}
    plain_agg = plain.groupBy("o_orderstatus").agg(F.count(F.lit(1)).alias("n"))
    b = {(r["o_orderstatus"], r["n"]) for r in plain_agg.collect()}
    assert a == b
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS od_b")
