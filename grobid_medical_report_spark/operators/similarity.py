"""Similarity search over the embeddings table (array<float> column).

* brute-force cosine top-k — the exactness baseline: broadcast the (small)
  query set against the full embedding scan; dot products via higher-order
  functions ``zip_with``/``aggregate`` in **double** precision (float32 math
  would diverge from the DuckDB oracle);
* k-NN label vote — majority label of the top-5 neighbors;
* per-label norm stats — vectorized array math, no UDF.

Determinism: similarities are rounded to 9 dp and ranking orders by
(rounded sim desc, vec_id asc), so both engines rank identically even when
two raw doubles differ only in the last ulp.

Scale path: at 10^9+ vectors the brute-force scan becomes a per-query
O(N) pass — the LSH-bucketed variant reuses dedup.py's band-join shape
(hash embedding sign-patterns into buckets, verify exactly inside buckets);
an IVF variant (k-means coarse quantizer as a broadcast dimension) is the
next step and composes from the same primitives.
"""

from __future__ import annotations

import pandas as pd  # module-level: pandas_udf type hints resolve globals

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

QUERY_IDS = (0, 1, 2, 3, 4)
TOP_K = 10
KNN_K = 5


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return e.select("vec_id", "label",
                    F.transform("embedding", lambda x: x.cast("double"))
                    .alias("emb"))


def _l2(col) -> F.Column:
    return F.sqrt(F.aggregate(F.transform(col, lambda x: x * x),
                              F.lit(0.0), lambda acc, x: acc + x))


def _emb_n(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embeddings with the L2 norm hoisted to a per-vector column: computed
    once per vector BEFORE any pairwise join, instead of twice per pair.
    Same fold, same operand order — bitwise-identical sims, ~3x less HOF
    work on the pair side (the dominant cost of all-pairs similarity)."""
    return _emb(spark, sf_dir).withColumn("l2", _l2(F.col("emb")))


def _scored_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(query_id, vec_id, label, sim) for all queries x corpus."""
    e = _emb_n(spark, sf_dir)
    q = (e.filter(F.col("vec_id").isin(*QUERY_IDS))
          .select(F.col("vec_id").alias("query_id"), F.col("emb").alias("qemb"),
                  F.col("l2").alias("ql2")))
    dot = F.aggregate(F.zip_with("emb", "qemb", lambda a, b: a * b),
                      F.lit(0.0), lambda acc, x: acc + x)
    return (e.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
             .withColumn("sim", F.round(dot / (F.col("l2") * F.col("ql2")), 9))
             .select("query_id", "vec_id", "label", "sim"))


def q_emb_topk_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = W.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("vec_id"))
    return (_scored_pairs(spark, sf_dir)
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= TOP_K)
            .select("query_id", "vec_id", "sim", "rank"))


def q_emb_knn_label_vote(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Majority label among top-5 neighbors (ties: higher count, then lower
    label)."""
    w = W.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("vec_id"))
    top = (_scored_pairs(spark, sf_dir)
           .withColumn("rank", F.row_number().over(w))
           .filter(F.col("rank") <= KNN_K))
    counts = top.groupBy("query_id", "label").agg(F.count(F.lit(1)).alias("votes"))
    w2 = W.partitionBy("query_id").orderBy(F.desc("votes"), F.asc("label"))
    return (counts.withColumn("rn", F.row_number().over(w2))
                  .filter(F.col("rn") == 1)
                  .select("query_id", F.col("label").alias("predicted_label"),
                          "votes"))


def q_emb_label_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _emb(spark, sf_dir)
    nrm = F.sqrt(F.aggregate(F.transform("emb", lambda x: x * x),
                             F.lit(0.0), lambda acc, x: acc + x))
    return (e.withColumn("l2", nrm)
             .groupBy("label")
             .agg(F.count(F.lit(1)).alias("n_vectors"),
                  F.round(F.avg("l2"), 6).alias("avg_norm"),
                  F.round(F.min("l2"), 6).alias("min_norm"),
                  F.round(F.max("l2"), 6).alias("max_norm")))


NEAR_DUP_TAU = 0.4
NEAR_DUP_BLOCKS = 8


def brute_emb_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TEST-ONLY exactness baseline: all-pairs broadcast join with
    higher-order-function dot products. One executor's row-pair loop per
    broadcast partner — a scale-killer at 100x, kept out of QUERIES; the
    standing entry is the blocked-GEMM :func:`q_emb_near_dup`, asserted
    pair-identical in tests/test_dedup.py."""
    e = _emb_n(spark, sf_dir)
    a = e.select(F.col("vec_id").alias("id_a"), F.col("emb").alias("emb_a"),
                 F.col("l2").alias("l2_a"))
    b = e.select(F.col("vec_id").alias("id_b"), F.col("emb").alias("emb_b"),
                 F.col("l2").alias("l2_b"))
    dot = F.aggregate(F.zip_with("emb_a", "emb_b", lambda x, y: x * y),
                      F.lit(0.0), lambda acc, x: acc + x)
    return (a.join(F.broadcast(b), F.col("id_a") < F.col("id_b"))
             .withColumn("sim", F.round(dot / (F.col("l2_a") * F.col("l2_b")), 9))
             .filter(F.col("sim") >= NEAR_DUP_TAU)
             .select("id_a", "id_b", "sim"))


def q_emb_near_dup(spark: SparkSession, sf_dir: str,
                   n_blocks: int = NEAR_DUP_BLOCKS) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: all pairs with cosine >= tau,
    EXACT, as a distributed blocked GEMM.

    Why not LSH candidates here: tau=0.4 is a ~66-degree angle, and the
    embeddings table is isotropic — measured on this corpus, the loosest
    sign-LSH parameters that lose zero qualifying pairs still keep >=77%
    of ALL pairs as candidates, and angular k-means cell bounds prune
    nothing (cell radii ~1.4 rad). An exact low-threshold cosine join over
    isotropic vectors is O(N^2) by necessity, so the scalable shape is the
    *right* O(N^2): hash vectors into B blocks, make each of the
    B(B+1)/2 block-pairs one ``applyInPandas`` task running a single numpy
    matmul (BLAS-rate, Arrow-batched), and re-score only the pairs that
    cross ``tau - eps`` with the exact sequential fold so reported sims are
    bit-identical to the HOF/DuckDB computation. Each vector is shuffled
    ~B times (vs broadcasting a full side everywhere); work spreads over
    B^2/2 independent tasks, so a 1000-executor run scales by raising B.
    The approximate top-k paths (x_emb_ann_*) remain the cheap option when
    exactness isn't required."""
    e = _emb_n(spark, sf_dir)
    B = n_blocks
    blk = (F.col("vec_id") % B).cast("int")
    # replicate each vector to every block-pair (bi<=bj) containing its
    # block: pair (u,v) lands in exactly one group, so no distinct needed
    rep = (e.withColumn("block", blk)
            .select("vec_id", "emb", "l2", "block",
                    F.explode(F.transform(
                        F.sequence(F.lit(0), F.lit(B - 1)),
                        lambda j: F.struct(
                            F.least("block", j).alias("bi"),
                            F.greatest("block", j).alias("bj"))))
                    .alias("bp"))
            .select("vec_id", "emb", "l2", "block",
                    F.col("bp.bi").alias("bi"), F.col("bp.bj").alias("bj")))

    def score_block(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np
        bi, bj = int(pdf["bi"].iat[0]), int(pdf["bj"].iat[0])
        A = pdf[pdf["block"] == bi]
        Bv = pdf if bi == bj else pdf[pdf["block"] == bj]
        if not len(A) or not len(Bv):
            return pd.DataFrame({"id_a": [], "id_b": [], "sim": []}) \
                .astype({"id_a": "int64", "id_b": "int64", "sim": "float64"})
        XA = np.stack(A["emb"].to_numpy()).astype(np.float64)
        XB = np.stack(Bv["emb"].to_numpy()).astype(np.float64)
        la = A["l2"].to_numpy(dtype=np.float64)
        lb = Bv["l2"].to_numpy(dtype=np.float64)
        S = (XA / la[:, None]) @ (XB / lb[:, None]).T
        ia, ib = np.nonzero(S >= NEAR_DUP_TAU - 1e-7)
        ids_a = A["vec_id"].to_numpy()
        ids_b = Bv["vec_id"].to_numpy()
        ua, ub = ids_a[ia], ids_b[ib]
        keep = ua < ub if bi == bj else np.ones(len(ia), dtype=bool)
        ia, ib, ua, ub = ia[keep], ib[keep], ua[keep], ub[keep]
        u = np.minimum(ua, ub)           # pair appears once: order it
        v = np.maximum(ua, ub)
        # vectorized re-score: ONE einsum over the surviving pairs (a
        # dense-dup corpus could make this set large — a per-pair Python
        # loop here would dominate the block matmul). einsum's pairwise/FMA
        # summation can differ from the HOF/DuckDB sequential fold in the
        # last ulp, which round(.,9) could expose — so only pairs whose
        # value lands within 1e-13 of a 0.5e-9 rounding grid point are
        # re-folded sequentially (exact IEEE op-order parity), everything
        # else is provably round-stable
        d = np.einsum("ij,ij->i", XA[ia], XB[ib])
        sim = d / (la[ia] * lb[ib])
        simr = np.round(sim, 9)
        b = sim * 1e9
        for k in np.nonzero(np.abs(b - np.round(b * 2) / 2) < 1e-4)[0]:
            acc = 0.0
            for x, y in zip(XA[ia[k]], XB[ib[k]]):
                acc += x * y
            simr[k] = round(acc / (la[ia[k]] * lb[ib[k]]), 9)
        m = simr >= NEAR_DUP_TAU
        return pd.DataFrame({"id_a": u[m], "id_b": v[m], "sim": simr[m]}) \
            .astype({"id_a": "int64", "id_b": "int64", "sim": "float64"})

    return (rep.groupBy("bi", "bj")
               .applyInPandas(score_block,
                              schema="id_a long, id_b long, sim double"))


def x_emb_ann_lsh(spark: SparkSession, sf_dir: str,
                  n_tables: int = 12, n_bits: int = 4) -> DataFrame:
    """Approximate top-k via sign-random-projection LSH.

    Scale path for the brute-force scan: seeded hyperplanes (driver-side
    numpy, broadcast as literal arrays) hash every vector into
    ``n_tables`` buckets of ``n_bits`` sign bits; candidates are bucket
    collisions in ANY table; exact cosine re-ranks candidates only. The
    per-query cost drops from O(N) to O(N / 2^bits * tables); recall is
    tunable via (bits, tables) and measured in tests/test_similarity_ann.py.
    Approximate by design => rows-only (no SQL oracle can reproduce it)."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, IntegerType

    rng = np.random.RandomState(42)
    # one (dim x n_tables*n_bits) matrix: ALL sign bits in a single matmul
    planes = rng.standard_normal((n_tables * n_bits, 64)).round(6)
    bc_planes = spark.sparkContext.broadcast(planes.T.copy())
    bit_weights = (1 << np.arange(n_bits)).astype(np.int64)

    @pandas_udf(ArrayType(IntegerType()))
    def lsh_buckets(emb: pd.Series) -> pd.Series:
        # (batch, dim) @ (dim, tables*bits) -> sign bits -> per-table codes;
        # one matmul per Arrow batch — the scale path for 48 projections
        import numpy as np
        X = np.stack(emb.to_numpy()).astype(np.float64)
        bits = (X @ bc_planes.value) >= 0          # (batch, tables*bits)
        codes = (bits.reshape(len(X), n_tables, n_bits) * bit_weights) \
            .sum(axis=2).astype("int32")            # (batch, tables)
        return pd.Series(list(codes))

    e = _emb_n(spark, sf_dir)
    hashed = (e.withColumn("buckets", lsh_buckets("emb"))
               .select("vec_id", "emb", "l2",
                       F.posexplode("buckets").alias("table", "bucket")))
    # candidate ids only — keep the wide emb arrays OUT of the
    # bucket-collision join and the distinct
    qids = (hashed.filter(F.col("vec_id").isin(*QUERY_IDS))
            .select(F.col("vec_id").alias("query_id"), "table", "bucket"))
    cand_ids = (hashed.select("vec_id", "table", "bucket")
                .join(F.broadcast(qids), ["table", "bucket"])
                .filter(F.col("vec_id") != F.col("query_id"))
                .select("query_id", "vec_id")
                .distinct())
    q = (e.filter(F.col("vec_id").isin(*QUERY_IDS))
          .select(F.col("vec_id").alias("query_id"),
                  F.col("emb").alias("qemb"), F.col("l2").alias("ql2")))
    cand = (cand_ids.join(e.select("vec_id", "emb", "l2"), "vec_id")
                    .join(F.broadcast(q), "query_id"))
    dot = F.aggregate(F.zip_with("emb", "qemb", lambda a, b: a * b),
                      F.lit(0.0), lambda acc, x: acc + x)
    w = W.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("vec_id"))
    return (cand.withColumn("sim", F.round(dot / (F.col("l2") * F.col("ql2")), 9))
                .select("query_id", "vec_id", "sim")
                .withColumn("rank", F.row_number().over(w))
                .filter(F.col("rank") <= TOP_K))


def x_emb_ann_ivf(spark: SparkSession, sf_dir: str,
                  n_list: int = 16, n_probe: int = 4) -> DataFrame:
    """Approximate top-k via an IVF (inverted-file) index — the second scale
    path next to the sign-LSH buckets of :func:`x_emb_ann_lsh`.

    A spherical k-means coarse quantizer is trained driver-side on a seeded,
    deterministic sample (ordered by vec_id — cheap: the codebook needs
    thousands of rows, not the corpus), broadcast, and applied as an
    Arrow-batched pandas UDF (one matmul per batch — no per-row Python).
    Each vector lands in exactly ONE cell (vs LSH's n_tables copies), so the
    index adds no storage amplification; queries probe the ``n_probe``
    nearest cells and re-rank candidates with exact cosine. Per-query cost
    O(N * n_probe / n_list). Approximate by design => rows-only gate:
    recall vs the brute-force baseline is measured in
    tests/test_similarity_ann.py."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import IntegerType

    e = _emb_n(spark, sf_dir)

    # --- train the codebook (driver-side numpy, seeded: stable across runs)
    samp = (e.orderBy("vec_id").limit(2048).select("emb").collect())
    X = np.array([r["emb"] for r in samp], dtype=np.float64)
    Xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    k = min(n_list, len(Xn))
    rng = np.random.RandomState(42)
    C = Xn[rng.choice(len(Xn), size=k, replace=False)].copy()
    for _ in range(10):
        assign = np.argmax(Xn @ C.T, axis=1)
        for j in range(k):
            members = Xn[assign == j]
            if len(members):
                c = members.mean(axis=0)
                C[j] = c / max(np.linalg.norm(c), 1e-12)
    bc = spark.sparkContext.broadcast(C)

    @pandas_udf(IntegerType())
    def ivf_cell(emb: pd.Series) -> pd.Series:
        Xb = np.stack(emb.to_numpy()).astype(np.float64)
        Xb /= np.maximum(np.linalg.norm(Xb, axis=1, keepdims=True), 1e-12)
        return pd.Series(np.argmax(Xb @ bc.value.T, axis=1).astype("int32"))

    cells = e.withColumn("cell", ivf_cell("emb"))

    # --- probe lists: n_probe nearest cells per query vector (query set is
    # tiny by definition; computed driver-side, shipped as a broadcast dim)
    qrows = (e.filter(F.col("vec_id").isin(*QUERY_IDS))
              .select("vec_id", "emb").collect())
    probes = []
    for r in qrows:
        v = np.asarray(r["emb"], dtype=np.float64)
        v /= max(np.linalg.norm(v), 1e-12)
        for cidx in np.argsort(-(bc.value @ v))[:n_probe]:
            probes.append((int(r["vec_id"]), int(cidx)))
    probe_df = spark.createDataFrame(probes, "query_id bigint, cell int")
    q = (e.filter(F.col("vec_id").isin(*QUERY_IDS))
          .select(F.col("vec_id").alias("query_id"), F.col("emb").alias("qemb"),
                  F.col("l2").alias("ql2")))

    cand = (cells.join(F.broadcast(probe_df), "cell")
                 .filter(F.col("vec_id") != F.col("query_id"))
                 .join(F.broadcast(q), "query_id"))
    dot = F.aggregate(F.zip_with("emb", "qemb", lambda a, b: a * b),
                      F.lit(0.0), lambda acc, x: acc + x)
    w = W.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("vec_id"))
    return (cand.withColumn("sim", F.round(dot / (F.col("l2") * F.col("ql2")), 9))
                .select("query_id", "vec_id", "sim")
                .withColumn("rank", F.row_number().over(w))
                .filter(F.col("rank") <= TOP_K))


_PAIRS_SQL = f"""
    WITH q AS (
      SELECT vec_id AS query_id, embedding::DOUBLE[] AS qemb
      FROM embeddings WHERE vec_id IN {QUERY_IDS}),
    scored AS (
      SELECT q.query_id, e.vec_id, e.label,
             round(list_dot_product(e.embedding::DOUBLE[], q.qemb)
                   / (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))
                      * sqrt(list_dot_product(q.qemb, q.qemb))), 9) AS sim
      FROM embeddings e, q WHERE e.vec_id <> q.query_id)
"""

ORACLES: dict[str, str] = {
    "q_emb_near_dup": f"""
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               round(list_cosine_similarity(a.embedding::DOUBLE[],
                                            b.embedding::DOUBLE[]), 9) AS sim
        FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        WHERE round(list_cosine_similarity(a.embedding::DOUBLE[],
                                           b.embedding::DOUBLE[]), 9)
              >= {NEAR_DUP_TAU}
    """,
    "q_emb_topk_cosine": _PAIRS_SQL + f"""
        SELECT query_id, vec_id, sim, rank FROM (
          SELECT query_id, vec_id, sim,
                 row_number() OVER (PARTITION BY query_id
                   ORDER BY sim DESC, vec_id ASC) AS rank
          FROM scored)
        WHERE rank <= {TOP_K}
    """,
    "q_emb_knn_label_vote": _PAIRS_SQL + f"""
        , top AS (
          SELECT query_id, label FROM (
            SELECT query_id, label,
                   row_number() OVER (PARTITION BY query_id
                     ORDER BY sim DESC, vec_id ASC) AS rank
            FROM scored)
          WHERE rank <= {KNN_K}),
        counts AS (
          SELECT query_id, label, count(*) AS votes
          FROM top GROUP BY query_id, label)
        SELECT query_id, label AS predicted_label, votes FROM (
          SELECT *, row_number() OVER (PARTITION BY query_id
                   ORDER BY votes DESC, label ASC) AS rn
          FROM counts)
        WHERE rn = 1
    """,
    "q_emb_label_norms": """
        SELECT label, count(*) AS n_vectors,
               round(avg(l2), 6) AS avg_norm,
               round(min(l2), 6) AS min_norm,
               round(max(l2), 6) AS max_norm
        FROM (SELECT label,
                     sqrt(list_dot_product(embedding::DOUBLE[],
                                           embedding::DOUBLE[])) AS l2
              FROM embeddings)
        GROUP BY label
    """,
}

QUERIES = {
    "q_emb_near_dup": q_emb_near_dup,
    "q_emb_topk_cosine": q_emb_topk_cosine,
    "q_emb_knn_label_vote": q_emb_knn_label_vote,
    "q_emb_label_norms": q_emb_label_norms,
}
