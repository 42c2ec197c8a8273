"""Deduplication operators over the documents table.

Corpus-curation primitives for a training-data pipeline at 100 TB scale:

* exact dedup         — hash groupBy on the normalized-text fingerprint;
* MinHash + LSH       — signature banding for candidate generation, then
                        exact verification, so results equal the brute-force
                        oracle while the join never goes all-pairs;
* n-gram Jaccard      — brute shingle-join twin, TEST-ONLY (the DuckDB
                        oracle of the LSH entry is this computation);
* SimHash             — 16-bit md5-derived simhash, pure column expressions.

Scale notes: the brute shingle self-join shuffles on the shingle key and is
quadratic in shingle frequency — it is deliberately NOT a standing query;
the LSH band join shuffles on (band, hash) which is uniformly distributed
by construction. Bands use r=2 (AND of two minhashes per band, b=K/2
bands — see :func:`q_doc_minhash_lsh` for the recall arithmetic), and
LSH+verify is checked value-identical to the exact brute-force oracle at
every SF tier.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

JACCARD_THRESHOLD = 0.8
MINHASH_K = 16


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _shingle_arrays(d: DataFrame) -> DataFrame:
    """(doc_id, sh: distinct word-3-gram array, n: size) — shuffle-free.

    The token array is materialized as a column FIRST: referencing the
    ``split()`` expression directly inside ``element_at`` would re-run the
    full-text split for every shingle element (measured 6x slower)."""
    t = d.select("doc_id", F.split(F.trim("text"), " ").alias("w"))
    w = F.col("w")
    sh = F.when(
        F.size(w) >= 3,
        F.array_distinct(F.transform(
            F.sequence(F.lit(0), F.size(w) - 3),
            lambda i: F.concat_ws(" ", F.element_at(w, i + 1),
                                  F.element_at(w, i + 2),
                                  F.element_at(w, i + 3)))),
    ).otherwise(F.array().cast("array<string>"))
    return t.select("doc_id", sh.alias("sh")).withColumn("n", F.size("sh"))


def _shingles(d: DataFrame) -> DataFrame:
    """Distinct word-3-gram shingles per doc (doc_id, shingle)."""
    return _shingle_arrays(d).select("doc_id", F.explode("sh").alias("shingle"))


def q_doc_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: survivors after keep-min-doc_id per normalized text."""
    d = _docs(spark, sf_dir)
    fp = d.select("doc_id", F.md5(F.lower(F.trim("text"))).alias("fp"))
    return (fp.groupBy("fp").agg(F.min("doc_id").alias("doc_id"),
                                 F.count(F.lit(1)).alias("n_copies"))
              .select("doc_id", "n_copies"))


def brute_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All pairs with word-3-gram Jaccard >= 0.8 (brute shingle join).

    TEST-ONLY baseline (not in QUERIES): the shingle self-join is quadratic
    in shingle frequency — a scale-killer at 100x data. The standing
    oracle-backed entry is :func:`q_doc_minhash_lsh`, whose banded candidate
    generation + exact verify produces the identical pair set
    (cross-checked in tests/test_dedup.py and by the DuckDB oracle, which
    is itself this brute-force computation)."""
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


def minhash_band_rows(docs: DataFrame, k: int = MINHASH_K) -> DataFrame:
    """(doc_id, band, h1, h2, sig) — the r=2 banded minhash signature rows
    shared by the batch LSH join and the STREAMING candidate detector.
    ``sig`` carries the full K-signature (comma-joined, for the streaming
    state store) so collided docs can estimate Jaccard from signature
    agreement without keeping shingle sets in state."""
    def mh(i: int):
        return F.array_min(F.transform(
            "sh", lambda s: F.xxhash64(F.lit(i), s)))

    sig = F.concat_ws(",", *[mh(i).cast("string") for i in range(k)])
    n_bands = k // 2
    return docs.select(
        "doc_id", sig.alias("sig"),
        F.explode(F.array(*[
            F.struct(F.lit(i).alias("band"),
                     mh(2 * i).alias("h1"), mh(2 * i + 1).alias("h2"))
            for i in range(n_bands)])).alias("bh")) \
        .select("doc_id", "sig", "bh.band", "bh.h1", "bh.h2")


def q_doc_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same output as :func:`brute_ngram_jaccard`, via MinHash LSH.
    Exact verification is ``size(array_intersect(...))`` on the two docs'
    shingle arrays instead of an exploded shingle⋈shingle join. Banding
    uses r=2 (AND of 2 minhashes per band, b=K/2 bands): a random non-dup
    pair must collide on BOTH hashes of some band, which empirically cuts
    candidates from ~157k (r=1) to ~the true-pair count at sf0.1, while a
    j>=0.8 pair is missed with probability (1-j^2)^8 <= 4e-4 per pair —
    and the seeded corpus is verified pair-identical to the brute-force
    oracle at every SF tier (tools/check_oracles.py).

    r8 signature stage: each shingle is hashed to int64 ONCE and the K
    minhashes are ``min`` aggregates of ``xxhash64(i, h)`` over the
    exploded hash rows — whole-stage codegen end to end, where the old
    per-row ``array_min(transform(sh, xxhash64(i, s)))`` paid K
    interpreted-HOF passes re-hashing every shingle STRING per pass
    (measured −35% interleaved same-session; same A/B shape as the
    q_doc_simhash HOF-vs-explode result). The added exchange carries one
    partial-agg'd row per doc (K bigints) — the map-side partial min
    keeps it tiny at any scale.

    Scale note: the shuffles are the per-doc signature exchange, the tiny
    (band, h1, h2) exchange (b rows/doc) and the candidate joins back to
    the doc table — exactly the pieces that must shuffle on a
    1000-executor run."""
    docs = _shingle_arrays(_docs(spark, sf_dir)).cache()

    mins = (docs.select("doc_id", F.explode("sh").alias("s"))
                .withColumn("h", F.xxhash64("s"))
                .groupBy("doc_id")
                .agg(*[F.min(F.xxhash64(F.lit(i), "h")).alias(f"m{i}")
                       for i in range(MINHASH_K)]))
    n_bands = MINHASH_K // 2
    bands = mins.select(
        "doc_id",
        F.explode(F.array(*[
            F.struct(F.lit(i).alias("band"),
                     F.col(f"m{2 * i}").alias("h1"),
                     F.col(f"m{2 * i + 1}").alias("h2"))
            for i in range(n_bands)])).alias("bh"))
    # candidates via groupBy + in-bucket pair expansion: ONE pass over the
    # minhash stage and one shuffle, where a self-join would recompute all
    # K transforms on both sides (measured 2.5x slower); bucket sizes are
    # near-dup cluster sizes (tiny) by the r=2 construction, so the
    # collect_set and the quadratic in-bucket expansion are bounded
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

    # exact verification: one array_intersect per candidate pair
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


def q_doc_dedup_groups(spark: SparkSession, sf_dir: str,
                       max_iters: int = 20) -> DataFrame:
    """Near-dup GROUP resolution: connected components over the verified
    MinHash-LSH pair graph, canonical = min doc_id per component — the step
    an actual corpus dedup needs after pair generation (pairs alone don't
    say which docs to drop when A~B and B~C but A!~C).

    Distributed min-label propagation (the GraphX/Pregel CC shape): each
    round joins the symmetric edge list to the current labels, takes the
    min neighbor label per vertex, and stops when no label changed. Rounds
    are bounded by component DIAMETER — near-dup clusters are tiny, so 2-3
    rounds in practice and ``max_iters`` is a backstop; each round
    localCheckpoints to cut lineage. The per-round driver-side convergence
    count is one tiny agg job (the canonical iterate-until-converged
    pattern, not a per-row collect); a 100-TB run with adversarial chain
    components would swap in large-star/small-star, which this edge/label
    layout is already shaped for."""
    return dedup_groups_from_pairs(
        q_doc_minhash_lsh(spark, sf_dir), max_iters)


def dedup_groups_from_pairs(pairs: DataFrame,
                            max_iters: int = 20) -> DataFrame:
    """Connected components of an undirected (doc_a, doc_b) pair table ->
    (doc_id, canon_id). See :func:`q_doc_dedup_groups` for the algorithm
    and scale notes; callers (jobs/run_curation.py) can pre-filter the
    pair table to a stricter threshold before grouping.

    Min-label propagation converges in O(component diameter) rounds —
    right for the tiny clusters near-dup graphs actually have. If a
    pathological chain component exhausts ``max_iters`` without
    converging, the remaining work is handed to the O(log n)-round
    large-star/small-star variant (:func:`dedup_groups_star`) instead of
    silently returning wrong components (ADVICE r3)."""
    pairs = pairs.select("doc_a", "doc_b")
    edges = (pairs.union(pairs.select(F.col("doc_b"), F.col("doc_a")))
                  .toDF("src", "dst").cache())
    labels = (edges.select(F.col("src").alias("doc_id")).distinct()
                   .withColumn("label", F.col("doc_id")).cache())
    converged = False
    for _ in range(max_iters):
        prop = (edges.join(labels, edges.src == labels.doc_id)
                     .groupBy(F.col("dst").alias("doc_id"))
                     .agg(F.min("label").alias("nbr_min")))
        new_labels = (labels.join(prop, "doc_id", "left")
                      .select("doc_id",
                              F.least("label", F.coalesce("nbr_min", "label"))
                               .alias("label"))
                      .localCheckpoint())
        changed = (new_labels.join(labels.withColumnRenamed("label", "old"),
                                   "doc_id")
                   .filter(F.col("label") != F.col("old")).count())
        labels = new_labels
        if changed == 0:
            converged = True
            break
    edges.unpersist()
    if not converged:
        # diameter > max_iters: fall through to the logarithmic-round
        # algorithm rather than return incorrect components
        return dedup_groups_star(pairs)
    # labels is localCheckpointed (materialized), safe to return directly
    return labels.select("doc_id", F.col("label").alias("canon_id"))


def dedup_groups_star(pairs: DataFrame, max_rounds: int = 60) -> DataFrame:
    """Connected components via alternating large-star / small-star
    (Kiveris et al., "Connected Components in MapReduce and Beyond") —
    O(log n) rounds even on adversarial CHAIN components where min-label
    propagation needs O(n) rounds (a 1000-doc path graph converges in
    ~10 alternations here vs 999 propagation rounds).

    Each operation is one groupBy per round over the current edge set:

    * large-star: for every node u, hook every neighbor v > u onto
      m = min(N(u) ∪ {u});
    * small-star: hook every neighbor v <= u (plus u itself) onto m.

    Fixpoint = every node points directly at its component minimum (a
    star); ``canon_id`` is then the star center. Same output contract as
    :func:`dedup_groups_from_pairs` (asserted equal on the standard corpus
    in tests/test_dedup.py)."""
    # edge list kept directed child -> parent between rounds; each star
    # operation works on the SYMMETRIC view of it (Γ(u) is undirected)
    e0 = pairs.select(F.col("doc_a").alias("u"), F.col("doc_b").alias("v"))
    nodes = (e0.select(F.col("u").alias("doc_id"))
               .union(e0.select(F.col("v").alias("doc_id"))).distinct()
               .localCheckpoint())
    edges = e0.filter(F.col("u") != F.col("v")).distinct().localCheckpoint()

    def _sym(e):
        return e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))

    for _ in range(max_rounds):
        # ---- large-star: m_u = min(Γ(u) ∪ {u}); (v, m_u) for v > u ------
        sym = _sym(edges)
        m = (sym.groupBy("u")
                .agg(F.least(F.min("v"), F.first("u")).alias("m")))
        edges = (sym.filter(F.col("v") > F.col("u"))
                 .join(m, "u")
                 .select(F.col("v").alias("u"), F.col("m").alias("v"))
                 .filter(F.col("u") != F.col("v")).distinct()
                 .localCheckpoint())
        # ---- small-star: m_u = min(Γ⁻(u) ∪ {u}); hook Γ⁻(u) and u onto m
        low = _sym(edges).filter(F.col("v") < F.col("u"))
        m = (low.groupBy("u").agg(F.min("v").alias("m")))
        hooked = (low.join(m, "u")
                  .select(F.col("v").alias("u"), F.col("m").alias("v"))
                  .union(m.select(F.col("u"), F.col("m").alias("v")))
                  .filter(F.col("u") != F.col("v")).distinct()
                  .localCheckpoint())
        # fixpoint: already a star — every edge points at a component min
        # (no node appears on both sides of the directed edge list) AND
        # every child has exactly ONE parent. The second clause matters:
        # on non-monotone-ID paths (e.g. 1-10-3-20-2) a round can leave a
        # child hooked onto two different candidate minima with no u/v
        # overlap — stopping there splits one component into two canon
        # groups and duplicates the child's row (ADVICE r4).
        non_star = (hooked.select(F.col("v").alias("x")).distinct()
                    .join(hooked.select(F.col("u").alias("x")).distinct(),
                          "x").count())
        edges = hooked
        if non_star == 0:
            multi_parent = (hooked.groupBy("u").count()
                            .filter(F.col("count") > 1).count())
            if multi_parent == 0:
                break
    else:
        raise RuntimeError(
            f"dedup_groups_star: no fixpoint after {max_rounds} rounds")
    return (nodes.join(edges.select(F.col("u").alias("doc_id"),
                                    F.col("v").alias("canon")),
                       "doc_id", "left")
            .select("doc_id",
                    F.coalesce("canon", "doc_id").alias("canon_id")))


def q_doc_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-bit SimHash per doc from md5 nibbles of distinct tokens — pure
    column expressions (JVM-side, whole-stage codegen).

    r8 per-token kernel: the md5 hex prefix is parsed ONCE into two
    63-bit-safe integers (``conv(hex, 16, 10)`` over 8 chars each) and the
    per-nibble high bit comes from a shift+mask — integer codegen — in
    place of 16 ``substring(...).isin(8 literals)`` string probes per
    token (measured −19% same-session; results bit-identical: the high
    bit of hex digit j IS bit ``(7-j)*4+3`` of the parsed word, and
    ``2*bit-1`` reproduces the ±1 sum exactly). An r8 experiment that
    moved the whole sum per-row via higher-order ``filter``/``aggregate``
    lambdas measured +24% — HOF lambdas evaluate interpreted, outside
    whole-stage codegen, while this explode + partial-agg path stays fully
    codegen'd and its exchange carries only one pre-aggregated row per doc."""
    d = _docs(spark, sf_dir)
    tok = (d.select("doc_id", F.explode(F.array_distinct(
        F.split(F.trim("text"), " "))).alias("t"))
            .withColumn("h", F.md5("t"))
            .withColumn("v1", F.conv(F.substring("h", 1, 8), 16, 10)
                        .cast("bigint"))
            .withColumn("v2", F.conv(F.substring("h", 9, 8), 16, 10)
                        .cast("bigint")))

    def bit(j: int):
        word, r = ("v1", 7 - j) if j < 8 else ("v2", 15 - j)
        return F.shiftright(word, r * 4 + 3).bitwiseAND(F.lit(1))

    sums = [F.sum(bit(j) * 2 - 1).alias(f"s{j}") for j in range(16)]
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

#: connected components via transitive closure (WITH RECURSIVE) over the
#: same brute-force pair graph — component id = min reachable doc_id
_GROUPS_SQL = f"""
    WITH RECURSIVE p AS ({_JACCARD_SQL}),
    edges AS (SELECT doc_a AS a, doc_b AS b FROM p
              UNION SELECT doc_b, doc_a FROM p),
    reach(a, b) AS (
        SELECT a, b FROM edges
        UNION
        SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
    closure AS (SELECT DISTINCT a, a AS b FROM edges
                UNION SELECT a, b FROM reach)
    SELECT a AS doc_id, min(b) AS canon_id FROM closure GROUP BY a
"""

WINNOW_K = 8          # k-gram length (chars), MOSS-style
WINNOW_W = 16         # winnowing window: guarantee = one fingerprint per
                      # (w + k - 1)-char stretch, matches >= w+k-1 chars found
_WINNOW_B = np.uint64(257)
_WINNOW_MASK = np.uint64(0xFFFFFFFF)


def winnow_fingerprints(text: str, k: int = WINNOW_K,
                        w: int = WINNOW_W) -> np.ndarray:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, MOSS):
    Karp-Rabin rolling hashes of every k-gram (base-257 poly mod 2^32,
    vectorized — the sliding dot product with the power weights fits
    uint64), then the leftmost-minimum of each w-hash window. Pure numpy;
    returns the sorted distinct selected hashes. The winnowing guarantee:
    any shared substring of length >= w + k - 1 yields at least one shared
    fingerprint, which is what makes the digest a local (partial-overlap)
    dedup signal where whole-doc md5 is all-or-nothing."""
    b = np.frombuffer(text.lower().encode("utf-8"), dtype=np.uint8)
    n = b.size - k + 1
    if n <= 0:
        return np.empty(0, dtype=np.uint64)
    weights = _WINNOW_B ** np.arange(k - 1, -1, -1, dtype=np.uint64)
    win = np.lib.stride_tricks.sliding_window_view(b, k).astype(np.uint64)
    hashes = (win * weights).sum(axis=1) & _WINNOW_MASK
    if hashes.size <= w:
        return np.unique(hashes.min(keepdims=True))
    mins = np.lib.stride_tricks.sliding_window_view(hashes, w).min(axis=1)
    return np.unique(mins)


def x_doc_winnowing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-hash document fingerprinting as an engine operator:
    winnowed fingerprint sets per doc plus a set digest — the
    partial-overlap dedup/provenance signal next to the all-or-nothing
    md5 of q_doc_dedup_exact (a doc quoting 200 chars of another shares
    fingerprints; their md5s never match). Numpy inside Arrow batches;
    at 100 TB the (doc_id, fingerprint) explode feeds the same
    bucket-join machinery as MinHash banding. Rows-only: the rolling-hash
    + windowed-minimum pipeline has no SQL analog; pytest pins the
    winnowing guarantee and overlap behavior."""
    from typing import Iterator

    import hashlib

    import pandas as pd

    d = _docs(spark, sf_dir)

    def fp(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            rows = []
            for did, t in zip(pdf["doc_id"], pdf["text"]):
                sel = winnow_fingerprints(t)
                digest = hashlib.md5(sel.tobytes()).hexdigest()
                rows.append((did, int(len(t)), int(sel.size), digest,
                             int(sel[0]) if sel.size else -1))
            yield pd.DataFrame(rows, columns=[
                "doc_id", "n_chars", "n_fingerprints", "fp_digest",
                "min_fingerprint"])

    return d.select("doc_id", "text").mapInPandas(
        fp, schema="doc_id bigint, n_chars int, n_fingerprints int, "
                   "fp_digest string, min_fingerprint bigint")


WINNOW_MAX_DF = 100   # drop boilerplate fingerprints shared by > max_df
                      # docs (MOSS "stop fingerprints") BEFORE pairing, so
                      # bucket sizes are bounded and template text can't
                      # create quadratic buckets
WINNOW_MIN_SHARED = 12  # measured at sf0.01 against the exact-verified LSH
                        # truth: (100, 12) -> recall 0.96 / 33 candidates;
                        # surviving extras are genuine PARTIAL overlap
                        # (shared sentences), which md5/MinHash-whole-doc
                        # cannot express — downstream exact verification
                        # decides, as with the LSH band candidates


def winnow_fingerprint_rows(d: DataFrame) -> DataFrame:
    """(doc_id, fp) distinct fingerprint rows — numpy winnowing inside
    Arrow batches, exploded JVM-side."""
    from typing import Iterator

    import pandas as pd

    def fp(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "fps": [winnow_fingerprints(t).astype("int64")
                        for t in pdf["text"]]})

    rows = d.select("doc_id", "text").mapInPandas(
        fp, schema="doc_id bigint, fps array<bigint>")
    return rows.select("doc_id", F.explode("fps").alias("fp"))


def x_doc_winnow_pairs(spark: SparkSession, sf_dir: str,
                       max_df: int = WINNOW_MAX_DF,
                       min_shared: int = WINNOW_MIN_SHARED) -> DataFrame:
    """Near-dup candidate pairs from winnowed fingerprints — the MOSS
    pairing step as a bounded bucket-join: fingerprints appearing in more
    than ``max_df`` docs are dropped (template/boilerplate runs — the
    analog of stopword removal, and the bound that keeps every bucket's
    quadratic expansion <= max_df^2), the rest self-join on the
    fingerprint, and a pair survives with ``min_shared`` or more shared
    rare fingerprints. Same scale shape as the MinHash band join
    (q_doc_minhash_lsh); recall vs that verified truth is pinned in
    tests/test_winnowing.py.

    Measured trade-off (sf0.01, 500 docs, template-heavy corpus): the
    defaults give recall 0.96 at 33 candidates; driving recall to 1.0
    requires (max_df=300, min_shared=3) which floods 34k candidates (27%
    of all pairs) because the last truth pair is similar only through
    corpus-common phrasing. So for WHOLE-document near-dup, MinHash-LSH
    banding stays the production path; winnowing earns its place on
    PARTIAL overlap (quotation/section reuse), which banding over
    whole-doc signatures cannot see at all.

    Oracle-backed as of r5: clamped to the first 500 doc_ids — the golden
    scale, mirroring the x_extract_* clamp — against the frozen pair
    table golden/n500/expected_winnow_pairs.parquet (one block per SF
    tier's corpus, keyed by corpus_md5; tools/make_winnow_golden.py).
    Full-corpus pairing stays available through the :func:`winnow_pairs`
    kernel (run_curation --overlap-report)."""
    return winnow_pairs(_docs(spark, sf_dir).filter(F.col("doc_id") < 500),
                        max_df, min_shared)


def winnow_pairs(d: DataFrame, max_df: int = WINNOW_MAX_DF,
                 min_shared: int = WINNOW_MIN_SHARED) -> DataFrame:
    """DataFrame-level kernel behind x_doc_winnow_pairs (run_curation's
    --overlap-report composes it over the curated corpus)."""
    from pyspark.storagelevel import StorageLevel

    # three consumers (df table + both self-join sides): persist, or the
    # numpy winnowing stage re-runs per branch (three MapInPandas nodes
    # observed in the unpersisted formatted plan)
    fps = (winnow_fingerprint_rows(d)
           .persist(StorageLevel.MEMORY_AND_DISK))
    try:
        df_tbl = fps.groupBy("fp").agg(F.count(F.lit(1)).alias("df"))
        rare = fps.join(df_tbl.filter(F.col("df") <= max_df), "fp")
        a = rare.select(F.col("fp"), F.col("doc_id").alias("a"))
        b = rare.select(F.col("fp"), F.col("doc_id").alias("b"))
        # eager-materialize the (small, min_shared-filtered) pair table,
        # then drop the cached fingerprint blocks so they don't outlive
        # the call and pile up across a long session (ADVICE r4)
        return (a.join(b, "fp")
                 .filter(F.col("a") < F.col("b"))
                 .groupBy("a", "b")
                 .agg(F.count(F.lit(1)).alias("shared_fps"))
                 .filter(F.col("shared_fps") >= min_shared)
                 .orderBy("a", "b")
                 .localCheckpoint(eager=True))
    finally:
        fps.unpersist()


ROWS_ONLY_QUERIES = {
    "x_doc_winnowing": x_doc_winnowing,
    "x_doc_winnow_pairs": x_doc_winnow_pairs,
}


ORACLES: dict[str, str] = {
    "q_doc_dedup_exact": """
        SELECT min(doc_id) AS doc_id, count(*) AS n_copies
        FROM (SELECT doc_id, md5(lower(trim(text))) AS fp FROM documents)
        GROUP BY fp
    """,
    "q_doc_minhash_lsh": _JACCARD_SQL,   # LSH+verify must equal brute force
    "q_doc_dedup_groups": _GROUPS_SQL,
    "q_doc_simhash": _SIMHASH_SQL,
}

QUERIES = {
    "q_doc_dedup_exact": q_doc_dedup_exact,
    "q_doc_minhash_lsh": q_doc_minhash_lsh,
    "q_doc_dedup_groups": q_doc_dedup_groups,
    "q_doc_simhash": q_doc_simhash,
}
