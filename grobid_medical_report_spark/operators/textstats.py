"""Text-analysis operators over the documents table (training-data pipeline).

Large-scale corpus curation primitives: token counting, quality scoring,
language identification and document fingerprinting — all pure JVM-side
column expressions (no Python UDFs), so they stay inside whole-stage codegen
and scale linearly with the scan. Each has an exact DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: tiny per-language stopword gazetteers (broadcast-join scale)
LANG_STOPWORDS = {
    "en": ("the", "a", "of"),
    "de": ("der", "die", "und"),
    "es": ("el", "los", "una"),
    "fr": ("le", "les", "une"),
    "zh": ("de5", "le5", "shi4"),   # romanized placeholders
}


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def q_doc_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace tokenization + per-language aggregates (F1 analog at corpus
    scale)."""
    d = _docs(spark, sf_dir)
    toks = d.withColumn("n_tokens", F.size(F.split(F.trim("text"), r"\s+")))
    return (toks.groupBy("lang")
                .agg(F.count(F.lit(1)).alias("n_docs"),
                     F.sum("n_tokens").alias("total_tokens"),
                     F.round(F.avg("n_tokens"), 4).alias("avg_tokens"),
                     F.round(F.avg("n_chars"), 4).alias("avg_chars")))


#: BPE-ish pre-tokenization: letter runs | digit runs | single punct marks
#: (the standard byte-pair pre-split shape; shared verbatim with the oracle)
BPE_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def q_doc_bpe_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting, both whitespace and BPE-ish-regex flavors — the
    per-document cost accounting of a training-data pipeline."""
    d = _docs(spark, sf_dir)
    ws = F.size(F.split(F.trim("text"), r"\s+"))
    bpe = F.regexp_count(F.col("text"), F.lit(BPE_PATTERN))
    return (d.select("doc_id", ws.alias("n_ws_tokens"),
                     bpe.alias("n_bpe_tokens"))
             .withColumn("tokens_per_word",
                         F.round(F.col("n_bpe_tokens") / F.col("n_ws_tokens"), 4)))


def q_doc_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: stopword ratio + mean word length + length gate
    (the reference's P2/P3 sanitization mapped to corpus curation)."""
    d = _docs(spark, sf_dir)
    toks = F.split(F.trim("text"), " ")
    stop = F.size(F.filter(toks, lambda x: x.isin("the", "a", "of")))
    scored = (d.withColumn("n_tokens", F.size(toks))
               .withColumn("stop_ratio", F.round(stop / F.size(toks), 4))
               .withColumn("mean_word_len",
                           F.round((F.length(F.regexp_replace(F.trim("text"), " ", "")))
                                   / F.size(toks), 4))
               .withColumn("len_ok", (F.col("n_chars") >= 100).cast("int")))
    return scored.select("doc_id", "n_tokens", "stop_ratio", "mean_word_len", "len_ok")


def q_doc_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic language ID: argmax of per-language stopword hits with a
    fixed tie-break order (X7 analog — deterministic by construction)."""
    d = _docs(spark, sf_dir)
    toks = F.split(F.trim("text"), " ")
    def hit_counter(words):
        # closure (not default-arg lambda: a 2-arity lambda would receive the
        # element index as its second argument)
        return F.size(F.filter(toks, lambda x: x.isin(*words)))

    hit_cols = [hit_counter(words).alias(f"hits_{lg}")
                for lg, words in LANG_STOPWORDS.items()]
    hits = d.select("doc_id", "lang", *hit_cols)
    pred = F.lit("und")
    best = F.lit(0)
    for lg in LANG_STOPWORDS:  # fixed order = deterministic tie-break
        c = F.col(f"hits_{lg}")
        pred = F.when(c > best, F.lit(lg)).otherwise(pred)
        best = F.when(c > best, c).otherwise(best)
    return (hits.withColumn("predicted", pred)
                .groupBy("lang", "predicted")
                .agg(F.count(F.lit(1)).alias("n_docs")))


def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content fingerprint: md5 of the normalized text (X2 normalization +
    hashing), plus duplicate-group size per fingerprint.

    Window form (r8): count/min over ``partitionBy(fingerprint)`` replaces
    the old groupBy + join-back — ONE scan (md5 computed once, not twice)
    and ONE Exchange instead of two scans plus a join whose build side was
    the full-cardinality fingerprint aggregate (broadcast at small SF, but
    unbroadcastable — a second full shuffle — at corpus scale)."""
    from pyspark.sql.window import Window as W

    d = _docs(spark, sf_dir)
    fp = d.select("doc_id",
                  F.md5(F.lower(F.trim(F.col("text")))).alias("fingerprint"))
    w = W.partitionBy("fingerprint")
    return fp.select("doc_id", "fingerprint",
                     F.count(F.lit(1)).over(w).alias("group_size"),
                     F.min("doc_id").over(w).alias("keeper"))


def q_doc_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition signals (Rae et al. 2021 quality filters —
    the standard pre-training dedup-adjacent gates): duplicate-word
    fraction, duplicate-bigram fraction (both pure per-row array math, no
    shuffle), and top-word fraction (most frequent word's share — one
    explode + two-level agg, shuffling only (doc_id, word) pairs)."""
    d = _docs(spark, sf_dir)
    toks = F.split(F.trim("text"), " ")
    n = F.size(toks)
    two = F.when(n >= 2, F.transform(
        F.sequence(F.lit(0), n - 2),
        lambda i: F.concat_ws(" ", F.element_at(toks, i + 1),
                              F.element_at(toks, i + 2)))
    ).otherwise(F.array().cast("array<string>"))
    base = (d.select("doc_id", toks.alias("w"), two.alias("bg"))
             .select("doc_id",
                     F.size("w").alias("n_words"),
                     (1 - F.size(F.array_distinct("w")) / F.size("w"))
                     .alias("dwf"),
                     F.when(F.size("bg") > 0,
                            1 - F.size(F.array_distinct("bg")) / F.size("bg"))
                     .otherwise(0.0).alias("dbf"),
                     F.col("w")))
    top = (base.select("doc_id", F.explode("w").alias("word"))
           .groupBy("doc_id", "word").count()
           .groupBy("doc_id").agg(F.max("count").alias("top_count")))
    return (base.drop("w").join(top, "doc_id")
            .select("doc_id", "n_words",
                    F.round("dwf", 4).alias("dup_word_frac"),
                    F.round("dbf", 4).alias("dup_bigram_frac"),
                    F.round(F.col("top_count") / F.col("n_words"), 4)
                    .alias("top_word_frac")))


def x_doc_compression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """zlib compression-ratio quality signal (r4) — the cheap
    redundancy/entropy heuristic LLM curation pipelines run next to the
    Gopher gates (highly repetitive or low-entropy documents compress far
    below natural prose). Ratio is scaled to an integer per mille so
    downstream thresholds are engine-stable; the deflate stream itself is
    standard zlib level 6, computed inside Arrow batches (stdlib zlib
    releases the GIL, so executor cores stay busy). Rows-only: SQL has no
    deflate, so the oracle gate records row counts and pytest pins the
    ordering property (repetitive text < natural text < random-ish)."""
    from typing import Iterator

    import pandas as pd

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")

    def comp(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        import zlib

        for pdf in batches:
            raw = [t.encode("utf-8") for t in pdf["text"]]
            clen = [len(zlib.compress(b, 6)) for b in raw]
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "raw_bytes": [len(b) for b in raw],
                "zlib_bytes": clen,
                "ratio_permille": [
                    (c * 1000) // r if r else 1000
                    for c, r in zip(clen, (len(b) for b in raw))],
            })

    return d.select("doc_id", "text").mapInPandas(
        comp, schema="doc_id bigint, raw_bytes int, zlib_bytes int, "
                     "ratio_permille int")


ROWS_ONLY_QUERIES = {
    "x_doc_compression": x_doc_compression,
}


ORACLES: dict[str, str] = {
    "q_doc_repetition": """
        WITH base AS (
          SELECT doc_id, string_split(trim(text), ' ') AS ws FROM documents),
        perdoc AS (
          SELECT doc_id, len(ws) AS n_words,
                 round(1 - len(list_distinct(ws)) * 1.0 / len(ws), 4)
                   AS dup_word_frac,
                 round(CASE WHEN len(ws) >= 2 THEN
                   1 - len(list_distinct(list_transform(
                         range(1, len(ws)),
                         i -> ws[i] || ' ' || ws[i+1]))) * 1.0
                       / (len(ws) - 1)
                   ELSE 0.0 END, 4) AS dup_bigram_frac
          FROM base),
        top AS (
          SELECT doc_id, max(c) AS top_count FROM (
            SELECT doc_id, count(*) AS c
            FROM (SELECT doc_id, unnest(ws) AS w FROM base)
            GROUP BY doc_id, w) GROUP BY doc_id)
        SELECT p.doc_id, n_words, dup_word_frac, dup_bigram_frac,
               round(top_count * 1.0 / n_words, 4) AS top_word_frac
        FROM perdoc p JOIN top USING (doc_id)
    """,
    "q_doc_bpe_tokens": rf"""
        SELECT doc_id,
               len(string_split_regex(trim(text), '\s+')) AS n_ws_tokens,
               len(regexp_extract_all(text, '{BPE_PATTERN}')) AS n_bpe_tokens,
               round(len(regexp_extract_all(text, '{BPE_PATTERN}')) * 1.0
                     / len(string_split_regex(trim(text), '\s+')), 4)
                 AS tokens_per_word
        FROM documents
    """,
    "q_doc_token_stats": r"""
        SELECT lang, count(*) AS n_docs,
               CAST(sum(len(string_split_regex(trim(text), '\s+')))
                    AS BIGINT) AS total_tokens,
               round(avg(len(string_split_regex(trim(text), '\s+'))), 4) AS avg_tokens,
               round(avg(n_chars), 4) AS avg_chars
        FROM documents GROUP BY lang
    """,
    "q_doc_quality": """
        SELECT doc_id,
               len(string_split(trim(text), ' ')) AS n_tokens,
               round(len(list_filter(string_split(trim(text), ' '),
                     x -> x IN ('the', 'a', 'of')))
                     * 1.0 / len(string_split(trim(text), ' ')), 4) AS stop_ratio,
               round(length(replace(trim(text), ' ', ''))
                     * 1.0 / len(string_split(trim(text), ' ')), 4) AS mean_word_len,
               CASE WHEN n_chars >= 100 THEN 1 ELSE 0 END AS len_ok
        FROM documents
    """,
    "q_doc_langid": """
        WITH hits AS (
          SELECT lang,
            len(list_filter(string_split(trim(text),' '), x -> x IN ('the','a','of'))) AS h_en,
            len(list_filter(string_split(trim(text),' '), x -> x IN ('der','die','und'))) AS h_de,
            len(list_filter(string_split(trim(text),' '), x -> x IN ('el','los','una'))) AS h_es,
            len(list_filter(string_split(trim(text),' '), x -> x IN ('le','les','une'))) AS h_fr,
            len(list_filter(string_split(trim(text),' '), x -> x IN ('de5','le5','shi4'))) AS h_zh
          FROM documents),
        pred AS (
          SELECT lang, CASE
            WHEN h_zh > greatest(h_en, h_de, h_es, h_fr, 0) THEN 'zh'
            WHEN h_fr > greatest(h_en, h_de, h_es, 0) THEN 'fr'
            WHEN h_es > greatest(h_en, h_de, 0) THEN 'es'
            WHEN h_de > greatest(h_en, 0) THEN 'de'
            WHEN h_en > 0 THEN 'en'
            ELSE 'und' END AS predicted
          FROM hits)
        SELECT lang, predicted, count(*) AS n_docs
        FROM pred GROUP BY lang, predicted
    """,
    "q_doc_fingerprint": """
        WITH fp AS (
          SELECT doc_id, md5(lower(trim(text))) AS fingerprint FROM documents),
        groups AS (
          SELECT fingerprint, count(*) AS group_size, min(doc_id) AS keeper
          FROM fp GROUP BY fingerprint)
        SELECT doc_id, fp.fingerprint, group_size, keeper
        FROM fp JOIN groups ON fp.fingerprint = groups.fingerprint
    """,
}

QUERIES = {
    "q_doc_bpe_tokens": q_doc_bpe_tokens,
    "q_doc_token_stats": q_doc_token_stats,
    "q_doc_quality": q_doc_quality,
    "q_doc_repetition": q_doc_repetition,
    "q_doc_langid": q_doc_langid,
    "q_doc_fingerprint": q_doc_fingerprint,
}
