"""Distributed BPE tokenizer TRAINING (the classic Sennrich et al. 2016
merge-learning loop) — a training-data pipeline needs to learn its
tokenizer from the corpus, not only count tokens.

Shape per merge round (the canonical distributed form):

  word-frequency table (ONE groupBy over the corpus, computed once)
    -> adjacent symbol-pair counts  (per-row array math + one groupBy(pair))
    -> argmax pair                  (tiny driver-side top-1: the merge table
                                     IS driver-state by definition — it is
                                     the model being learned)
    -> apply the merge to every word's symbol array (Arrow-batched pandas
       stage; a sequential adjacent-merge scan is not expressible in pure
       column HOFs without quadratic slicing)

Each round shuffles only (pair, count) rows — the word table itself never
reshuffles (it is mapped in place and localCheckpointed to cut lineage).
At 100 TB the word-frequency table is orders of magnitude smaller than the
corpus (Heaps' law), so the per-round cost is bounded by vocabulary size,
not corpus size — exactly why production BPE trainers also run on the
word-count table.

Correctness: asserted equal, merge for merge, to a pure-Python reference
implementation of the textbook algorithm (tests/test_bpe.py), with the
same deterministic tie-break (max count, then lexicographic pair).
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

END = "</w>"


def word_counts(spark: SparkSession, sf_dir: str,
                limit_docs: int | None = None) -> DataFrame:
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    if limit_docs:
        # doc_id predicate, NOT .limit(): limit without an ordering is
        # partition-layout-dependent — on a real cluster two runs may train
        # on different subsets. The predicate pushes to the parquet scan
        # and makes the learned merge table a pure function of the corpus
        # (required by the r6 golden-parquet oracle for x_bpe_train).
        d = d.filter(F.col("doc_id") < limit_docs)
    words = d.select(F.explode(F.split(F.trim("text"), r"\s+")).alias("w")) \
             .filter(F.col("w") != "")
    return words.groupBy("w").agg(F.count(F.lit(1)).alias("n"))


def _init_symbols(wc: DataFrame) -> DataFrame:
    """word -> array of single-char symbols + end-of-word marker."""
    syms = F.concat(F.split(F.col("w"), ""), F.array(F.lit(END)))
    return wc.select("w", "n", syms.alias("syms"))


def _pair_counts(tbl: DataFrame) -> DataFrame:
    pairs = F.when(
        F.size("syms") >= 2,
        F.transform(F.sequence(F.lit(0), F.size("syms") - 2),
                    lambda i: F.concat_ws("\x00",
                                          F.element_at("syms", i + 1),
                                          F.element_at("syms", i + 2)))
    ).otherwise(F.array().cast("array<string>"))
    return (tbl.select(F.explode(pairs).alias("pair"), "n")
               .groupBy("pair").agg(F.sum("n").alias("count")))


def _apply_merge(tbl: DataFrame, a: str, b: str) -> DataFrame:
    """Merge every adjacent (a, b) into one symbol — left-to-right,
    non-overlapping (the textbook scan), Arrow-batched."""
    import pandas as pd

    merged = a + b

    def fn(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            out = []
            for syms in pdf["syms"]:
                syms = list(syms)
                res = []
                i = 0
                while i < len(syms):
                    if (i + 1 < len(syms) and syms[i] == a
                            and syms[i + 1] == b):
                        res.append(merged)
                        i += 2
                    else:
                        res.append(syms[i])
                        i += 1
                out.append(res)
            yield pd.DataFrame({"w": pdf["w"], "n": pdf["n"], "syms": out})

    return tbl.mapInPandas(fn, schema="w string, n bigint, "
                                      "syms array<string>")


def train_bpe(spark: SparkSession, sf_dir: str, n_merges: int = 8,
              limit_docs: int | None = 200) -> list[dict]:
    """Learn ``n_merges`` BPE merges; returns the ranked merge table
    [(rank, left, right, new_symbol, count)]."""
    tbl = _init_symbols(word_counts(spark, sf_dir, limit_docs)) \
        .localCheckpoint()
    merges: list[dict] = []
    for rank in range(n_merges):
        top = (_pair_counts(tbl)
               .orderBy(F.desc("count"), F.asc("pair")).limit(1).collect())
        if not top or top[0]["count"] < 2:
            break
        a, b = top[0]["pair"].split("\x00")
        merges.append({"rank": rank, "left": a, "right": b,
                       "new_symbol": a + b, "count": int(top[0]["count"])})
        tbl = _apply_merge(tbl, a, b).localCheckpoint()
    return merges


def x_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver entry: the learned merge table as a DataFrame. Rows-only —
    the iterative argmax loop has no SQL oracle; equality with the
    pure-Python textbook implementation is pinned in tests/test_bpe.py."""
    rows = train_bpe(spark, sf_dir)
    return spark.createDataFrame(
        rows, schema="rank int, left string, right string, "
                     "new_symbol string, count bigint")


ROWS_ONLY_QUERIES = {
    "x_bpe_train": x_bpe_train,
}
