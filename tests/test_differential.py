"""Differential property testing: Spark and DuckDB must agree on randomly
generated filter+aggregate queries over lineitem — beyond the fixed oracle
set, the engines are compared across a sampled predicate space."""

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"

_env = {}


@pytest.fixture(autouse=True)
def _bind(spark):
    if "duck" not in _env:
        con = duckdb.connect()
        con.sql(f"CREATE VIEW lineitem AS SELECT * FROM '{SF}/lineitem.parquet'")
        _env["duck"] = con
    _env["spark"] = spark
    yield


@settings(max_examples=12, deadline=None)
@given(
    qty=st.integers(min_value=1, max_value=50),
    disc_lo=st.sampled_from([0.0, 0.01, 0.02, 0.03, 0.05]),
    flag=st.sampled_from(["A", "N", "R"]),
)
def test_random_filter_agg_agrees(qty, disc_lo, flag):
    spark, duck = _env["spark"], _env["duck"]
    l = spark.read.parquet(f"{SF}/lineitem.parquet")
    got = (l.filter((F.col("l_quantity") <= qty)
                    & (F.col("l_discount") >= disc_lo)
                    & (F.col("l_returnflag") == flag))
           .agg(F.count(F.lit(1)).alias("n"),
                F.round(F.sum(F.col("l_extendedprice")
                              * (1 - F.col("l_discount"))), 2).alias("rev"))
           .collect()[0])
    want = duck.sql(f"""
        SELECT count(*) AS n,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS rev
        FROM lineitem
        WHERE l_quantity <= {qty} AND l_discount >= {disc_lo}
          AND l_returnflag = '{flag}'""").fetchone()
    assert got["n"] == want[0]
    if want[0] > 0:
        # float sums are order-dependent; when the true value sits within an
        # ulp of a .005 boundary, round(x, 2) can legitimately differ by one
        # cent between engines (hypothesis found such a predicate). Allow
        # exactly that boundary flip and nothing more.
        assert abs(got["rev"] - want[1]) <= 0.01 + 1e-9
