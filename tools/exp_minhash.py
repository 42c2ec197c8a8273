"""r8 experiment variants for q_doc_minhash_lsh (A/B'd via tools/ab_query.py;
the winner gets folded into operators/dedup.py, losers recorded in
OPTIMIZATION_r08.md)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from grobid_medical_report_spark.operators.dedup import (
    JACCARD_THRESHOLD, MINHASH_K, _docs, _shingle_arrays, q_doc_minhash_lsh)

baseline = q_doc_minhash_lsh


def _verify(cand: DataFrame, docs: DataFrame) -> DataFrame:
    a = docs.select(F.col("doc_id").alias("doc_a"),
                    F.col("sh").alias("sh_a"), F.col("n").alias("n_a"))
    b = docs.select(F.col("doc_id").alias("doc_b"),
                    F.col("sh").alias("sh_b"), F.col("n").alias("n_b"))
    return (cand.join(a, "doc_a").join(b, "doc_b")
                .withColumn("common",
                            F.size(F.array_intersect("sh_a", "sh_b")))
                .withColumn("jaccard",
                            F.round(F.col("common")
                                    / (F.col("n_a") + F.col("n_b")
                                       - F.col("common")), 4))
                .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
                .select("doc_a", "doc_b", "jaccard"))


def prehash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Variant A: hash each shingle to int64 ONCE, derive the K minhashes
    from the int array (fixed-width xxhash64 instead of K string hashes)."""
    docs = (_shingle_arrays(_docs(spark, sf_dir))
            .withColumn("hv", F.transform("sh", lambda s: F.xxhash64(s)))
            .cache())

    def mh(i: int):
        return F.array_min(F.transform(
            "hv", lambda h: F.xxhash64(F.lit(i), h)))

    n_bands = MINHASH_K // 2
    bands = docs.select(
        "doc_id",
        F.explode(F.array(*[
            F.struct(F.lit(i).alias("band"),
                     mh(2 * i).alias("h1"), mh(2 * i + 1).alias("h2"))
            for i in range(n_bands)])).alias("bh"))
    grp = (bands.groupBy("bh")
                .agg(F.sort_array(F.collect_set("doc_id")).alias("ds"))
                .filter(F.size("ds") >= 2))
    sz = F.size("ds")
    cand = (grp.select(F.explode(F.flatten(F.transform(
                F.sequence(F.lit(1), sz - 1),
                lambda i: F.transform(
                    F.slice("ds", i + 1, sz - i),
                    lambda b: F.struct(
                        F.element_at(F.col("ds"), i).alias("doc_a"),
                        b.alias("doc_b")))))).alias("p"))
               .select("p.doc_a", "p.doc_b")
               .distinct())
    return _verify(cand, docs)


def explode_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Variant B: explode the (pre-hashed) shingles and take the K minima
    via groupBy min aggregates — whole-stage codegen instead of interpreted
    HOF lambdas, at the cost of one (tiny, partial-agg'd) exchange."""
    docs = _shingle_arrays(_docs(spark, sf_dir)).cache()
    hv = docs.select("doc_id", F.explode("sh").alias("s")) \
             .withColumn("h", F.xxhash64("s"))
    mins = hv.groupBy("doc_id").agg(*[
        F.min(F.xxhash64(F.lit(i), "h")).alias(f"m{i}")
        for i in range(MINHASH_K)])
    n_bands = MINHASH_K // 2
    bands = mins.select(
        "doc_id",
        F.explode(F.array(*[
            F.struct(F.lit(i).alias("band"),
                     F.col(f"m{2 * i}").alias("h1"),
                     F.col(f"m{2 * i + 1}").alias("h2"))
            for i in range(n_bands)])).alias("bh"))
    grp = (bands.groupBy("bh")
                .agg(F.sort_array(F.collect_set("doc_id")).alias("ds"))
                .filter(F.size("ds") >= 2))
    sz = F.size("ds")
    cand = (grp.select(F.explode(F.flatten(F.transform(
                F.sequence(F.lit(1), sz - 1),
                lambda i: F.transform(
                    F.slice("ds", i + 1, sz - i),
                    lambda b: F.struct(
                        F.element_at(F.col("ds"), i).alias("doc_a"),
                        b.alias("doc_b")))))).alias("p"))
               .select("p.doc_a", "p.doc_b")
               .distinct())
    return _verify(cand, docs)


def explode_agg_hv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Variant C: like B, but the int64 shingle hashes are part of the
    cached stage (computed once with the shingles), so the per-call work
    explodes bigints only."""
    docs = (_shingle_arrays(_docs(spark, sf_dir))
            .withColumn("hv", F.transform("sh", lambda s: F.xxhash64(s)))
            .cache())
    hv = docs.select("doc_id", F.explode("hv").alias("h"))
    mins = hv.groupBy("doc_id").agg(*[
        F.min(F.xxhash64(F.lit(i), "h")).alias(f"m{i}")
        for i in range(MINHASH_K)])
    n_bands = MINHASH_K // 2
    bands = mins.select(
        "doc_id",
        F.explode(F.array(*[
            F.struct(F.lit(i).alias("band"),
                     F.col(f"m{2 * i}").alias("h1"),
                     F.col(f"m{2 * i + 1}").alias("h2"))
            for i in range(n_bands)])).alias("bh"))
    grp = (bands.groupBy("bh")
                .agg(F.sort_array(F.collect_set("doc_id")).alias("ds"))
                .filter(F.size("ds") >= 2))
    sz = F.size("ds")
    cand = (grp.select(F.explode(F.flatten(F.transform(
                F.sequence(F.lit(1), sz - 1),
                lambda i: F.transform(
                    F.slice("ds", i + 1, sz - i),
                    lambda b: F.struct(
                        F.element_at(F.col("ds"), i).alias("doc_a"),
                        b.alias("doc_b")))))).alias("p"))
               .select("p.doc_a", "p.doc_b")
               .distinct())
    return _verify(cand, docs)
