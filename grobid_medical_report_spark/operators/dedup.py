"""Deduplication operators over the documents table.

Corpus-curation primitives for a training-data pipeline at 100 TB scale:

* exact dedup         — hash groupBy on the normalized-text fingerprint;
* n-gram Jaccard      — word-3-gram shingles, shingle-join, exact Jaccard;
* MinHash + LSH       — signature banding for candidate generation, then
                        exact verification, so results equal the brute-force
                        oracle while the join never goes all-pairs;
* SimHash             — 16-bit md5-derived simhash, pure column expressions.

Scale notes: the shingle self-join shuffles on the shingle key — at 100 TB
the high-frequency shingle head must be dropped (stopword shingles) or the
LSH path used exclusively; the LSH band join shuffles on (band, hash) which
is uniformly distributed by construction. Here bands use r=1 (any matching
minhash ⇒ candidate) which makes recall ≥ 1-(1-j)^K — at the 0.8 threshold
the miss probability is < 1e-11, so LSH+verify is value-identical to the
exact oracle; a production run at lower thresholds would use r=2..4 bands.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

JACCARD_THRESHOLD = 0.8
MINHASH_K = 16


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _shingles(d: DataFrame) -> DataFrame:
    """Distinct word-3-gram shingles per doc (doc_id, shingle)."""
    toks = F.split(F.trim("text"), " ")
    sh = F.when(
        F.size(toks) >= 3,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - 3),
            lambda i: F.concat_ws(" ", F.element_at(toks, i + 1),
                                  F.element_at(toks, i + 2),
                                  F.element_at(toks, i + 3))),
    ).otherwise(F.array().cast("array<string>"))
    return (d.select("doc_id", F.explode(sh).alias("shingle")).distinct())


def q_doc_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: survivors after keep-min-doc_id per normalized text."""
    d = _docs(spark, sf_dir)
    fp = d.select("doc_id", F.md5(F.lower(F.trim("text"))).alias("fp"))
    return (fp.groupBy("fp").agg(F.min("doc_id").alias("doc_id"),
                                 F.count(F.lit(1)).alias("n_copies"))
              .select("doc_id", "n_copies"))


def q_doc_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All pairs with word-3-gram Jaccard >= 0.8 (brute shingle join)."""
    sh = _shingles(_docs(spark, sf_dir)).cache()
    counts = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a = sh.alias("a")
    b = sh.alias("b")
    pairs = (a.join(b, (F.col("a.shingle") == F.col("b.shingle"))
                    & (F.col("a.doc_id") < F.col("b.doc_id")))
              .groupBy(F.col("a.doc_id").alias("doc_a"),
                       F.col("b.doc_id").alias("doc_b"))
              .agg(F.count(F.lit(1)).alias("common")))
    ca = counts.alias("ca")
    cb = counts.alias("cb")
    return (pairs
            .join(ca, F.col("doc_a") == F.col("ca.doc_id"))
            .join(cb, F.col("doc_b") == F.col("cb.doc_id"))
            .withColumn("jaccard",
                        F.round(F.col("common")
                                / (F.col("ca.n") + F.col("cb.n") - F.col("common")), 4))
            .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
            .select("doc_a", "doc_b", "jaccard"))


def q_doc_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same output as :func:`q_doc_ngram_jaccard`, via MinHash LSH:
    shingle -> K minhashes -> band join (r=1) -> candidate pairs -> exact
    Jaccard verification. The all-pairs shuffle never happens; the verify
    join touches only candidates."""
    sh = _shingles(_docs(spark, sf_dir)).cache()
    counts = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))

    mins = [F.min(F.xxhash64(F.concat(F.lit(f"h{i}:"), F.col("shingle"))))
            .alias(f"mh{i}") for i in range(MINHASH_K)]
    sig = sh.groupBy("doc_id").agg(*mins)
    bands = sig.select(
        "doc_id",
        F.explode(F.array(*[
            F.struct(F.lit(i).alias("band"), F.col(f"mh{i}").alias("h"))
            for i in range(MINHASH_K)])).alias("bh"))
    x = bands.alias("x")
    y = bands.alias("y")
    cand = (x.join(y, (F.col("x.bh.band") == F.col("y.bh.band"))
                   & (F.col("x.bh.h") == F.col("y.bh.h"))
                   & (F.col("x.doc_id") < F.col("y.doc_id")))
             .select(F.col("x.doc_id").alias("doc_a"),
                     F.col("y.doc_id").alias("doc_b"))
             .distinct())

    # exact verification restricted to candidates
    a = sh.alias("a")
    b = sh.alias("b")
    common = (cand.join(a, F.col("doc_a") == F.col("a.doc_id"))
                  .join(b, (F.col("doc_b") == F.col("b.doc_id"))
                        & (F.col("a.shingle") == F.col("b.shingle")))
                  .groupBy("doc_a", "doc_b")
                  .agg(F.count(F.lit(1)).alias("common")))
    ca = counts.alias("ca")
    cb = counts.alias("cb")
    return (common
            .join(ca, F.col("doc_a") == F.col("ca.doc_id"))
            .join(cb, F.col("doc_b") == F.col("cb.doc_id"))
            .withColumn("jaccard",
                        F.round(F.col("common")
                                / (F.col("ca.n") + F.col("cb.n") - F.col("common")), 4))
            .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
            .select("doc_a", "doc_b", "jaccard"))


def q_doc_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-bit SimHash per doc from md5 nibbles of distinct tokens — pure
    column expressions (JVM-side, whole-stage codegen)."""
    d = _docs(spark, sf_dir)
    tok = (d.select("doc_id", F.explode(F.array_distinct(
        F.split(F.trim("text"), " "))).alias("t"))
            .withColumn("h", F.md5("t")))
    sums = [F.sum(F.when(F.substring("h", j + 1, 1)
                          .isin("8", "9", "a", "b", "c", "d", "e", "f"), 1)
                   .otherwise(-1)).alias(f"s{j}") for j in range(16)]
    agg = tok.groupBy("doc_id").agg(*sums)
    bits = sum((F.when(F.col(f"s{j}") >= 0, 1 << j).otherwise(0))
               for j in range(16))
    return agg.select("doc_id", bits.cast("int").alias("simhash"))


_JACCARD_SQL = f"""
    WITH toks AS (
      SELECT doc_id, string_split(trim(text), ' ') AS ws FROM documents),
    sh AS (
      SELECT DISTINCT doc_id, unnest(list_transform(range(1, len(ws) - 1),
             i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS shingle
      FROM toks),
    counts AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS common
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id)
    SELECT doc_a, doc_b,
           round(common * 1.0 / (ca.n + cb.n - common), 4) AS jaccard
    FROM pairs JOIN counts ca ON doc_a = ca.doc_id
               JOIN counts cb ON doc_b = cb.doc_id
    WHERE common * 1.0 / (ca.n + cb.n - common) >= {JACCARD_THRESHOLD}
"""

_SIMHASH_SQL = """
    WITH tok AS (
      SELECT doc_id, md5(t) AS h
      FROM (SELECT doc_id, unnest(list_distinct(string_split(trim(text), ' '))) AS t
            FROM documents)),
    sums AS (
      SELECT doc_id, {sums}
      FROM tok GROUP BY doc_id)
    SELECT doc_id, CAST({bits} AS INT) AS simhash FROM sums
""".format(
    sums=", ".join(
        f"sum(CASE WHEN substr(h, {j + 1}, 1) IN "
        f"('8','9','a','b','c','d','e','f') THEN 1 ELSE -1 END) AS s{j}"
        for j in range(16)),
    bits=" + ".join(
        f"(CASE WHEN s{j} >= 0 THEN {1 << j} ELSE 0 END)" for j in range(16)),
)

ORACLES: dict[str, str] = {
    "q_doc_dedup_exact": """
        SELECT min(doc_id) AS doc_id, count(*) AS n_copies
        FROM (SELECT doc_id, md5(lower(trim(text))) AS fp FROM documents)
        GROUP BY fp
    """,
    "q_doc_ngram_jaccard": _JACCARD_SQL,
    "q_doc_minhash_lsh": _JACCARD_SQL,   # LSH+verify must equal brute force
    "q_doc_simhash": _SIMHASH_SQL,
}

QUERIES = {
    "q_doc_dedup_exact": q_doc_dedup_exact,
    "q_doc_ngram_jaccard": q_doc_ngram_jaccard,
    "q_doc_minhash_lsh": q_doc_minhash_lsh,
    "q_doc_simhash": q_doc_simhash,
}
