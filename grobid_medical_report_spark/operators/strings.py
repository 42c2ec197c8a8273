"""Scalar/string function demonstrations (SURVEY.md §2.10 X1-X9).

Each reference scalar function re-expressed as a JVM-side column expression
over the documents table, with an exact DuckDB oracle:

* X1 prefix/suffix 1-4     -> q_str_affixes
* X2 lower/trim/space-norm -> folded into every query here
* X3 punctuation profile   -> q_str_charclass (char-class counts)
* X6 title-case            -> q_str_titlecase
* X9 anonymizers           -> q_doc_anonymize (digit masking + seeded
                              pseudonym, AnonymizeData.java:21-349 analog)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def q_str_affixes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-token prefix/suffix features (the FeaturesVector X1 columns),
    aggregated to keep output compact."""
    d = _docs(spark, sf_dir)
    w1 = F.element_at(F.split(F.trim("text"), " "), 1)
    return (d.select(
                F.substring(w1, 1, 1).alias("prefix1"),
                F.substring(w1, 1, 2).alias("prefix2"),
                w1.substr(F.length(w1), F.lit(1)).alias("suffix1"),
                w1.substr(F.greatest(F.length(w1) - 1, F.lit(1)),
                          F.lit(2)).alias("suffix2"))
            .groupBy("prefix1", "prefix2", "suffix1", "suffix2")
            .agg(F.count(F.lit(1)).alias("n")))


def q_str_titlecase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Title-case normalization (X6 toTitleCase analog) on the first 5 words."""
    d = _docs(spark, sf_dir)
    head = F.slice(F.split(F.trim("text"), " "), 1, 5)
    titled = F.array_join(
        F.transform(head, lambda w: F.concat(
            F.upper(F.substring(w, 1, 1)), F.lower(F.substring(w, 2, 1000)))),
        " ")
    return d.select("doc_id", titled.alias("title_head"))


def q_str_charclass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Char-class profile (X3 punctuationProfile / F10 isDigit analogs):
    per-doc counts of vowels, digits and spaces via regexp surgery."""
    d = _docs(spark, sf_dir)
    n_vowel = F.length("text") - F.length(F.regexp_replace("text", "[aeiou]", ""))
    n_digit = F.length("text") - F.length(F.regexp_replace("text", "[0-9]", ""))
    n_space = F.length("text") - F.length(F.regexp_replace("text", " ", ""))
    return d.select("doc_id", n_vowel.alias("n_vowel"),
                    n_digit.alias("n_digit"), n_space.alias("n_space"))


def q_doc_anonymize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic anonymization (X9): digits masked, source pseudonymized
    via seeded hash — reversible-by-nobody but stable across runs."""
    d = _docs(spark, sf_dir)
    return d.select(
        "doc_id",
        F.regexp_replace(F.col("text"), "[0-9]", "#").alias("masked_text"),
        F.substring(F.md5(F.concat(F.lit("seed42:"), F.col("source"))), 1, 12)
         .alias("source_pseudonym"))


ORACLES: dict[str, str] = {
    "q_str_affixes": """
        WITH w AS (SELECT string_split(trim(text), ' ')[1] AS w1 FROM documents)
        SELECT substr(w1, 1, 1) AS prefix1,
               substr(w1, 1, 2) AS prefix2,
               substr(w1, length(w1), 1) AS suffix1,
               substr(w1, greatest(length(w1) - 1, 1), 2) AS suffix2,
               count(*) AS n
        FROM w GROUP BY 1, 2, 3, 4
    """,
    "q_str_titlecase": """
        SELECT doc_id,
               array_to_string(list_transform(
                 string_split(trim(text), ' ')[1:5],
                 w -> upper(substr(w, 1, 1)) || lower(substr(w, 2, 1000))),
                 ' ') AS title_head
        FROM documents
    """,
    "q_str_charclass": """
        SELECT doc_id,
               length(text) - length(regexp_replace(text, '[aeiou]', '', 'g')) AS n_vowel,
               length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS n_digit,
               length(text) - length(regexp_replace(text, ' ', '', 'g')) AS n_space
        FROM documents
    """,
    "q_doc_anonymize": """
        SELECT doc_id,
               regexp_replace(text, '[0-9]', '#', 'g') AS masked_text,
               substr(md5('seed42:' || source), 1, 12) AS source_pseudonym
        FROM documents
    """,
}

def x_anonymize_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full X9 anonymizer family (functions/anonymize.py, the six
    AnonymizeData.java variants, deterministic) applied to EXTRACTED header
    PII — the reference's anonymization use-case: docnum/idno masking,
    patient+medic name substitution, address rewriting, ISO-date re-basing
    (patient mode for birthdates). Arrow-batched; rows-only (the seeded
    draws have no SQL equivalent)."""
    from typing import Iterator

    import pandas as pd

    from ..corpus import corpus_df
    from ..functions.anonymize import (anonymize_address, anonymize_date_iso,
                                       anonymize_number,
                                       anonymize_person_name)
    from ..plans.pipeline import extract

    n = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    ext = extract(corpus_df(spark, min(n, 200)))

    def anon(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for did, hdr, pats in zip(pdf["doc_id"], pdf["header"],
                                      pdf["patients"]):
                if hdr is None:
                    continue
                p0 = pats[0] if len(pats) else None
                rows.append({
                    "doc_id": did,
                    "docnum_anon": anonymize_number(hdr["docnum"]),
                    "date_anon": anonymize_date_iso(hdr["date_iso"]),
                    "medics_anon": "; ".join(anonymize_person_name(m)
                                             for m in hdr["medics"]),
                    "patient_anon": (anonymize_person_name(p0["persname"])
                                     if p0 is not None else ""),
                    "patient_id_anon": (anonymize_number(p0["id"])
                                        if p0 is not None else ""),
                    "address_anon": (anonymize_address(p0["address"])
                                     if p0 is not None else ""),
                })
            yield pd.DataFrame(rows, columns=[
                "doc_id", "docnum_anon", "date_anon", "medics_anon",
                "patient_anon", "patient_id_anon", "address_anon"])

    return ext.select("doc_id", "header", "patients").mapInPandas(
        anon, schema="doc_id string, docnum_anon string, date_anon string, "
                     "medics_anon string, patient_anon string, "
                     "patient_id_anon string, address_anon string")


QUERIES = {
    "q_str_affixes": q_str_affixes,
    "q_str_titlecase": q_str_titlecase,
    "q_str_charclass": q_str_charclass,
    "q_doc_anonymize": q_doc_anonymize,
}

ROWS_ONLY_QUERIES = {
    "x_anonymize_extraction": x_anonymize_extraction,
}
