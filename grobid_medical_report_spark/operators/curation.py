"""Corpus-curation operators for a training-data pipeline: vocabulary
building, inverse-document-frequency term weighting, deterministic
stratified sampling, and per-stratum quality top-k.

Scale shapes (the reason these exist as first-class operators):

- vocabulary build      -> the classic heavy-shuffle word count: explode +
                           two-level aggregate (term x doc -> term), top-k
                           at the end so only the head leaves the cluster;
- tf-idf top terms      -> per-doc term frequencies joined against the
                           (small, broadcastable) document-frequency head;
                           the weighting is integer-scaled (tf*1e6/df with
                           integer division) so Spark and DuckDB agree
                           EXACTLY — no float-log rounding at tie edges;
- stratified sample     -> deterministic modulo-based rates per stratum
                           (a broadcast rates dim), the reproducible analog
                           of df.sampleBy: same rows on every run, every
                           engine, any partitioning;
- quality top-k/stratum -> WindowGroupLimit per language: only each
                           partition's local top-k reaches the shuffle.

Reference context: the reference has no corpus-level operators (it is a
per-document engine, SURVEY.md §2.5 "distinct/grouping: absent"); these are
the engine-side additions the 100 TB training-data mandate asks for.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

VOCAB_TOP_K = 100
TFIDF_DOC_LIMIT = 40          # report terms for the first N docs only
TOPK_PER_LANG = 20

#: per-language sampling rates (percent), deliberately uneven — the
#: training-mix knob
SAMPLE_RATES = {"en": 10, "fr": 50, "de": 30, "es": 20, "zh": 5}

#: per-language TOKEN budgets for the mix assembler — sized so each stratum
#: is genuinely cut (sf0.01 carries ~3.5-12k tokens per language)
MIX_BUDGETS = {"en": 5000, "fr": 2500, "de": 1500, "es": 2000, "zh": 800}


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _words(d: DataFrame) -> DataFrame:
    """(doc_id, word) with one row per occurrence (not distinct)."""
    return d.select("doc_id",
                    F.explode(F.split(F.trim("text"), " ")).alias("word"))


def q_doc_vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary head: top-100 words by total occurrences, with
    document frequency. Two-level aggregate — (word, doc) partial counts
    first, so the second shuffle carries one row per distinct pair, and the
    global sort only ever sees the aggregated vocabulary."""
    wd = (_words(_docs(spark, sf_dir))
          .groupBy("word", "doc_id")
          .agg(F.count(F.lit(1)).alias("tf")))
    return (wd.groupBy("word")
              .agg(F.sum("tf").alias("occurrences"),
                   F.count(F.lit(1)).alias("doc_freq"))
              .orderBy(F.desc("occurrences"), "word")
              .limit(VOCAB_TOP_K))


def q_doc_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 most characteristic terms per doc (first 40 docs): tf weighted
    by integer-scaled inverse document frequency, score = tf * 1_000_000
    `div` df. The df table is aggregated once and broadcast into the
    per-doc join; integer arithmetic keeps both engines bit-identical."""
    d = _docs(spark, sf_dir)
    words = _words(d)
    df_tbl = (words.select("doc_id", "word").distinct()
              .groupBy("word").agg(F.count(F.lit(1)).alias("df")))
    tf_tbl = (words.filter(F.col("doc_id") < TFIDF_DOC_LIMIT)
              .groupBy("doc_id", "word")
              .agg(F.count(F.lit(1)).alias("tf")))
    scored = (tf_tbl.join(F.broadcast(df_tbl), "word")
              .withColumn("score",
                          F.expr("(tf * CAST(1000000 AS BIGINT)) div df")))
    w = W.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("word"))
    return (scored.withColumn("rank", F.row_number().over(w))
                  .filter(F.col("rank") <= 3)
                  .select("doc_id", "word", "tf", "df", "score", "rank"))


def q_doc_token_rarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM rarity score per document — the integer-exact stand-in
    for the perplexity filtering every LLM curation pipeline runs (CCNet/
    Gopher/DCLM shape): a token's rarity is the scaled inverse of its
    corpus unigram probability (``total_tokens * 10_000 div count``,
    integer division so Spark and DuckDB agree EXACTLY — same rule as
    tf-idf above; 1e4 scale keeps ``total * scale`` inside bigint at
    10^13-token corpora), and a document scores the tf-weighted sum and
    mean over its tokens. High mean = rare/unusual vocabulary, low = stock
    boilerplate. Shape: one (doc, word) partial agg feeds BOTH the corpus
    frequency table and the per-doc join, so the join carries distinct
    pairs, not occurrences; the 1-row total is broadcast."""
    return token_rarity(_docs(spark, sf_dir))


def token_rarity(d: DataFrame) -> DataFrame:
    """DataFrame-level kernel behind q_doc_token_rarity (jobs compose it
    over an already-curated corpus).

    The (doc, word) partial aggregate feeds three consumers (the per-doc
    join, the frequency table, and through it the corpus total), so it is
    persisted: without the cache Spark re-derives it per branch and the
    corpus is scanned three times (observed in the formatted plan); with
    it there is exactly one scan + explode, and the recomputed branches
    read the spilled aggregate instead."""
    from pyspark.storagelevel import StorageLevel

    wd = (_words(d)
          .groupBy("doc_id", "word")
          .agg(F.count(F.lit(1)).alias("tf"))
          .persist(StorageLevel.MEMORY_AND_DISK))
    try:
        freq = wd.groupBy("word").agg(F.sum("tf").alias("cnt"))
        total = freq.agg(F.sum("cnt").cast("bigint").alias("total"))
        scored = (wd.join(freq, "word")
                  .join(F.broadcast(total))
                  .withColumn("rar",
                              F.expr("(total * CAST(10000 AS BIGINT))"
                                     " div cnt")))
        # eagerly materialize the per-doc result (tiny vs the (doc, word)
        # aggregate), then release the cached intermediate — without this
        # the MEMORY_AND_DISK blocks outlive the call and accumulate
        # executor memory across a 100+-query session (ADVICE r4)
        return (scored.groupBy("doc_id")
                .agg(F.sum("tf").cast("bigint").alias("n_tokens"),
                     F.sum(F.expr("tf * rar")).cast("bigint")
                      .alias("rarity_sum"))
                .withColumn("mean_rarity",
                            F.expr("rarity_sum div n_tokens"))
                .orderBy("doc_id")
                .localCheckpoint(eager=True))
    finally:
        wd.unpersist()


def q_doc_training_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budgeted training-mix assembly — the step after scoring in
    every LLM data pipeline: each language stratum is filled best-first
    (n_chars as the quality key, doc_id the tiebreak — a TOTAL order, so
    the cumulative sum is deterministic on any engine/partitioning) until
    its token budget is exhausted. One scan, one window shuffle keyed by
    lang, budgets broadcast; the greedy prefix-by-budget is exactly
    ``sum(tokens) over (stratum order)`` <= budget, so no driver loop and
    no second pass. At 100 TB the window partitions by (lang, salt) with
    per-salt sub-budgets if one language dominates a single reducer."""
    return training_mix(_docs(spark, sf_dir), MIX_BUDGETS)


def training_mix(d: DataFrame, budgets: dict[str, int],
                 priority_col: str = "n_chars") -> DataFrame:
    """DataFrame-level kernel behind q_doc_training_mix. ``priority_col``
    is the quality key that ranks docs within a stratum (jobs pass a model
    score such as mean_rarity; the oracle uses n_chars); ties always break
    on doc_id so the order is total and the cumulative sum deterministic."""
    budgets_df = d.sparkSession.createDataFrame(
        sorted(budgets.items()), "lang string, token_budget int")
    t = d.select("doc_id", "lang", priority_col,
                 F.size(F.split(F.trim("text"), " ")).alias("n_tokens"))
    w = (W.partitionBy("lang")
          .orderBy(F.desc(priority_col), F.asc("doc_id")))
    return (t.withColumn("cum_tokens",
                         F.sum("n_tokens").over(w).cast("bigint"))
             .join(F.broadcast(budgets_df), "lang")
             .filter(F.col("cum_tokens") <= F.col("token_budget"))
             .select("lang", "doc_id", "n_tokens", "cum_tokens")
             .orderBy("lang", "cum_tokens"))


def q_doc_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sample: per-language percentage rates from a
    broadcast dim, membership decided by ``doc_id % 100 < rate``. Unlike
    df.sampleBy this is exactly reproducible across runs, engines, and
    repartitionings — the property a resumable curation pipeline needs."""
    rates = spark.createDataFrame(
        sorted(SAMPLE_RATES.items()), "lang string, rate int")
    d = _docs(spark, sf_dir)
    return (d.join(F.broadcast(rates), "lang")
             .filter(F.col("doc_id") % 100 < F.col("rate"))
             .groupBy("lang")
             .agg(F.count(F.lit(1)).alias("sampled_docs"),
                  F.sum("n_chars").alias("sampled_chars")))


def q_doc_quality_topk_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep the top-20 largest documents per language — the per-stratum
    quality gate of a training mix. Window row_number per lang: Spark plans
    a WindowGroupLimit, so each map task forwards at most k rows per lang
    into the shuffle."""
    d = _docs(spark, sf_dir)
    w = W.partitionBy("lang").orderBy(F.desc("n_chars"), F.asc("doc_id"))
    return (d.withColumn("rank", F.row_number().over(w))
             .filter(F.col("rank") <= TOPK_PER_LANG)
             .select("lang", "doc_id", "n_chars", "rank"))


DECON_NGRAM = 5
DECON_BENCH_DOCS = 5      # doc_id < N form the held-out "benchmark" set


def q_doc_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag corpus documents sharing any word
    5-gram with a held-out evaluation set (here: the first 5 docs). The
    benchmark n-gram set is tiny by definition -> broadcast; the corpus
    side explodes its n-grams once and semi-joins, so contamination
    checking is one scan + one broadcast join no matter the corpus size —
    the shape of real eval-set decontamination at 100 TB."""
    # tokens materialized as a column FIRST (see dedup._shingle_arrays: an
    # inline split() expression re-runs per element_at)
    t = _docs(spark, sf_dir).select(
        "doc_id", "lang", F.split(F.trim("text"), " ").alias("w"))
    w = F.col("w")
    grams = F.when(
        F.size(w) >= DECON_NGRAM,
        F.array_distinct(F.transform(
            F.sequence(F.lit(0), F.size(w) - DECON_NGRAM),
            lambda i: F.concat_ws(
                " ", *[F.element_at(w, i + k + 1)
                       for k in range(DECON_NGRAM)]))),
    ).otherwise(F.array().cast("array<string>"))
    with_grams = t.select("doc_id", "lang", grams.alias("grams"))
    bench = (with_grams.filter(F.col("doc_id") < DECON_BENCH_DOCS)
             .select(F.explode("grams").alias("gram")).distinct())
    corpus = (with_grams.filter(F.col("doc_id") >= DECON_BENCH_DOCS)
              .select("doc_id", "lang", F.explode("grams").alias("gram")))
    return (corpus.join(F.broadcast(bench), "gram", "left_semi")
            .groupBy("doc_id", "lang")
            .agg(F.count(F.lit(1)).alias("contaminated_ngrams"))
            .orderBy("doc_id"))


_RATES_SQL = "VALUES " + ", ".join(
    f"('{lg}', {r})" for lg, r in sorted(SAMPLE_RATES.items()))

_BUDGETS_SQL = "VALUES " + ", ".join(
    f"('{lg}', {b})" for lg, b in sorted(MIX_BUDGETS.items()))

ORACLES: dict[str, str] = {
    "q_doc_decontaminate": f"""
        WITH grams AS (
          SELECT doc_id, lang,
                 unnest(list_distinct(list_transform(
                   range(1, len(string_split(trim(text), ' '))
                            - {DECON_NGRAM - 2}),
                   i -> array_to_string(
                     string_split(trim(text), ' ')[i : i + {DECON_NGRAM - 1}],
                     ' ')))) AS gram
          FROM documents
          WHERE len(string_split(trim(text), ' ')) >= {DECON_NGRAM}),
        bench AS (
          SELECT DISTINCT gram FROM grams
          WHERE doc_id < {DECON_BENCH_DOCS})
        SELECT doc_id, lang, count(*) AS contaminated_ngrams
        FROM (SELECT * FROM grams WHERE doc_id >= {DECON_BENCH_DOCS})
          JOIN bench USING (gram)
        GROUP BY doc_id, lang
        ORDER BY doc_id
    """,
    "q_doc_vocab_topk": f"""
        SELECT word, count(*) AS occurrences,
               count(DISTINCT doc_id) AS doc_freq
        FROM (SELECT doc_id, unnest(string_split(trim(text), ' ')) AS word
              FROM documents)
        GROUP BY word
        ORDER BY occurrences DESC, word
        LIMIT {VOCAB_TOP_K}
    """,
    "q_doc_tfidf_top_terms": f"""
        WITH words AS (
          SELECT doc_id, unnest(string_split(trim(text), ' ')) AS word
          FROM documents),
        df_tbl AS (
          SELECT word, count(DISTINCT doc_id) AS df FROM words GROUP BY word),
        tf_tbl AS (
          SELECT doc_id, word, count(*) AS tf FROM words
          WHERE doc_id < {TFIDF_DOC_LIMIT} GROUP BY doc_id, word),
        scored AS (
          SELECT doc_id, tf_tbl.word, tf, df, (tf * 1000000) // df AS score
          FROM tf_tbl JOIN df_tbl ON tf_tbl.word = df_tbl.word)
        SELECT doc_id, word, tf, df, score, rank FROM (
          SELECT *, row_number() OVER (PARTITION BY doc_id
                    ORDER BY score DESC, word ASC) AS rank
          FROM scored)
        WHERE rank <= 3
    """,
    "q_doc_token_rarity": """
        WITH words AS (
          SELECT doc_id, unnest(string_split(trim(text), ' ')) AS word
          FROM documents),
        wd AS (SELECT doc_id, word, count(*) AS tf FROM words GROUP BY 1, 2),
        freq AS (SELECT word, sum(tf) AS cnt FROM wd GROUP BY 1),
        total AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM freq)
        SELECT doc_id,
               CAST(sum(tf) AS BIGINT) AS n_tokens,
               CAST(sum(tf * ((total * 10000) // cnt)) AS BIGINT)
                 AS rarity_sum,
               CAST(sum(tf * ((total * 10000) // cnt)) // sum(tf) AS BIGINT)
                 AS mean_rarity
        FROM wd JOIN freq USING (word) CROSS JOIN total
        GROUP BY doc_id
        ORDER BY doc_id
    """,
    "q_doc_training_mix": f"""
        WITH t AS (
          SELECT doc_id, lang, n_chars,
                 len(string_split(trim(text), ' ')) AS n_tokens
          FROM documents),
        c AS (
          SELECT lang, doc_id, n_tokens,
                 CAST(sum(n_tokens) OVER (PARTITION BY lang
                      ORDER BY n_chars DESC, doc_id ASC) AS BIGINT)
                   AS cum_tokens
          FROM t)
        SELECT lang, doc_id, CAST(n_tokens AS INT) AS n_tokens, cum_tokens
        FROM c JOIN (SELECT * FROM ({_BUDGETS_SQL}) b(lang, token_budget))
          USING (lang)
        WHERE cum_tokens <= token_budget
        ORDER BY lang, cum_tokens
    """,
    "q_doc_stratified_sample": f"""
        SELECT lang, count(*) AS sampled_docs,
               CAST(sum(n_chars) AS BIGINT) AS sampled_chars
        FROM documents JOIN (SELECT * FROM ({_RATES_SQL}) t(lang, rate))
          USING (lang)
        WHERE doc_id % 100 < rate
        GROUP BY lang
    """,
    "q_doc_quality_topk_per_lang": f"""
        SELECT lang, doc_id, n_chars, rank FROM (
          SELECT lang, doc_id, n_chars,
                 row_number() OVER (PARTITION BY lang
                   ORDER BY n_chars DESC, doc_id ASC) AS rank
          FROM documents)
        WHERE rank <= {TOPK_PER_LANG}
    """,
}

QUERIES = {
    "q_doc_decontaminate": q_doc_decontaminate,
    "q_doc_vocab_topk": q_doc_vocab_topk,
    "q_doc_tfidf_top_terms": q_doc_tfidf_top_terms,
    "q_doc_token_rarity": q_doc_token_rarity,
    "q_doc_training_mix": q_doc_training_mix,
    "q_doc_stratified_sample": q_doc_stratified_sample,
    "q_doc_quality_topk_per_lang": q_doc_quality_topk_per_lang,
}
