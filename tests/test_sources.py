"""Source/sink helpers (S3/S5/S6 analogs)."""

from grobid_medical_report_spark.corpus import corpus_df
from grobid_medical_report_spark.plans.pipeline import extract
from grobid_medical_report_spark.sources.tables import (
    iceberg_available, read_corpus, write_raw_text_corpus, write_results)


def test_roundtrip_parquet(spark, tmp_path):
    p = str(tmp_path / "corpus")
    corpus_df(spark, 10).write.parquet(p)
    back = read_corpus(spark, p)
    assert back.count() == 10
    assert back.columns == ["doc_id", "spans"]


def test_iceberg_gating(spark):
    # sandbox has no Iceberg jar: the probe must degrade, not raise
    assert iceberg_available(spark) in (True, False)


def test_csv_corpus_sink(spark, tmp_path):
    p = str(tmp_path / "rawtext")
    ext = extract(corpus_df(spark, 6))
    write_raw_text_corpus(ext, p)
    back = spark.read.option("header", True).csv(p)
    assert back.count() == 6
    row = back.filter("doc_id = 'doc_000000'").collect()[0]
    assert "COMPTE RENDU" in row["raw_text"]


def test_write_results_partitioned(spark, tmp_path):
    p = str(tmp_path / "res")
    write_results(extract(corpus_df(spark, 6)), p, partition_cols=("status",))
    assert spark.read.parquet(p).count() == 6
