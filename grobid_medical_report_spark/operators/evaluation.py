"""Model evaluation harness (SURVEY.md §5.2 analog).

The reference evaluates each model with token/field-level precision/recall/F1
via upstream AbstractTrainer (`./gradlew eval_*`, build.gradle:192-338;
MedicalReportTrainerRunner.java:26-28 — modes train/evaluate/split/n-fold).
Here evaluation is a DataFrame aggregation over (predicted, truth) label
pairs — one shuffle on the label key, scales to any corpus:

    per label:  tp / fp / fn -> precision, recall, f1
    corpus:     micro-avg (pooled counts) + macro-avg (mean of per-label)

Also provides the split-train-eval shape: a seeded doc-level split column so
train/eval partitions are deterministic and disjoint (the reference's 0.8
default split).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def split_column(df: DataFrame, train_fraction: float = 0.8,
                 key: str = "doc_id") -> DataFrame:
    """Deterministic doc-level train/eval split (seeded hash, not random):
    the same doc always lands in the same partition of the split."""
    bucket = F.pmod(F.abs(F.xxhash64(key)), F.lit(100))
    return df.withColumn(
        "split", F.when(bucket < int(train_fraction * 100), "train")
                  .otherwise("eval"))


def evaluate_labels(pairs: DataFrame, pred_col: str = "predicted",
                    truth_col: str = "label") -> DataFrame:
    """Per-label P/R/F1 from a (predicted, truth) pair table."""
    tp = F.sum(F.when(F.col(pred_col) == F.col(truth_col), 1).otherwise(0))
    labels = (pairs.select(F.col(truth_col).alias("lab"))
              .union(pairs.select(F.col(pred_col).alias("lab"))).distinct())
    per_truth = (pairs.groupBy(F.col(truth_col).alias("lab"))
                 .agg(F.count(F.lit(1)).alias("support"), tp.alias("tp_t")))
    per_pred = (pairs.groupBy(F.col(pred_col).alias("lab"))
                .agg(F.count(F.lit(1)).alias("predicted_n"), tp.alias("tp_p")))
    return (labels.join(per_truth, "lab", "left").join(per_pred, "lab", "left")
            .select(
                F.col("lab").alias("label"),
                F.coalesce("support", F.lit(0)).alias("support"),
                F.round(F.coalesce(F.col("tp_p") / F.col("predicted_n"),
                                   F.lit(0.0)), 4).alias("precision"),
                F.round(F.coalesce(F.col("tp_t") / F.col("support"),
                                   F.lit(0.0)), 4).alias("recall"))
            .withColumn(
                "f1",
                F.round(F.when(F.col("precision") + F.col("recall") > 0,
                               2 * F.col("precision") * F.col("recall")
                               / (F.col("precision") + F.col("recall")))
                        .otherwise(0.0), 4)))


def summary(per_label: DataFrame) -> dict:
    """Micro + macro averages (driver-side; the per-label table is tiny)."""
    rows = per_label.collect()
    total = sum(r["support"] for r in rows) or 1
    micro_r = sum(r["recall"] * r["support"] for r in rows) / total
    macro_f = sum(r["f1"] for r in rows) / (len(rows) or 1)
    return {"labels": len(rows), "micro_recall": round(micro_r, 4),
            "macro_f1": round(macro_f, 4)}
