"""Training-data generation (SURVEY.md S7): featurized line+label tables.

The reference's ``createTraining*`` paths (FullMedicalTextParser.
createTraining:1232, segmenter createTrainingMedicalSegmentation:1122-1252)
emit paired files per model: a featurized raw file and a pre-annotated
label file, used by the Wapiti trainers (MedicalReportSegmenterTrainer.
addFeaturesMedical:70-120). Here both halves are columns of ONE table —
per-line features (the F2 line-feature subset that drives the segmenter)
next to the model's label — written ``partitionBy("model")`` so each model's
training set is one partition subtree.

Feature semantics mirror SURVEY.md F2: uppercase profile, punctuation,
digit content, position bins, repetition counts (F3), length bins.
"""

from __future__ import annotations

from typing import Any, Iterator

from pyspark.sql import DataFrame

from ..functions.textnorm import normalize_space, punctuation_profile
from ..operators.body import label_body_line
from ..operators.segmenter import segment_doc

TRAINING_SCHEMA = (
    "model string, doc_id string, line_idx int, text string, label string, "
    "features struct<n_chars:int,n_tokens:int,upper_ratio:double,"
    "digit_ratio:double,punct_profile:string,ends_colon:boolean,"
    "starts_dash:boolean,rel_pos_bin:int,repeat_count:int,is_media:boolean>"
)


def _featurize_line(t: str, i: int, n: int, counts: dict[str, int],
                    is_media: bool) -> dict[str, Any]:
    letters = sum(1 for c in t if c.isalpha())
    upper = sum(1 for c in t if c.isupper())
    digit = sum(1 for c in t if c.isdigit())
    return {
        "n_chars": len(t),
        "n_tokens": len(t.split(" ")) if t else 0,
        "upper_ratio": round(upper / letters, 4) if letters else 0.0,
        "digit_ratio": round(digit / len(t), 4) if t else 0.0,
        "punct_profile": punctuation_profile(t)[:16],
        "ends_colon": t.rstrip().endswith(":"),
        "starts_dash": t.startswith("- "),
        "rel_pos_bin": min(int(10 * i / n), 9) if n else 0,  # linearScaling
        "repeat_count": counts.get(t, 0),
        "is_media": is_media,
    }


def _training_batches(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
    import numpy as np
    import pandas as pd

    for pdf in batches:
        out: list[dict[str, Any]] = []
        for doc_id, spans in zip(pdf["doc_id"], pdf["spans"]):
            spans = sorted(spans, key=lambda s: s["offset"])
            texts = [normalize_space(s["text"] or "") for s in spans]
            is_media = np.array([s["kind"] == "media" for s in spans], bool)
            counts: dict[str, int] = {}
            for t in texts:
                if t:
                    counts[t] = counts.get(t, 0) + 1
            zones = segment_doc(texts, is_media)
            n = len(texts)
            for i, (t, z) in enumerate(zip(texts, zones)):
                feats = _featurize_line(t, i, n, counts, bool(is_media[i]))
                out.append({"model": "medical-report-segmenter",
                            "doc_id": doc_id, "line_idx": i, "text": t,
                            "label": z, "features": feats})
                if z == "body":
                    prev_media = bool(i > 0 and is_media[i - 1]
                                      and zones[i - 1] == "body")
                    fine = label_body_line(t, bool(is_media[i]), prev_media)
                    out.append({"model": "full-medical-text",
                                "doc_id": doc_id, "line_idx": i, "text": t,
                                "label": fine, "features": feats})
        yield pd.DataFrame(out, columns=["model", "doc_id", "line_idx",
                                         "text", "label", "features"])


def training_data(df: DataFrame) -> DataFrame:
    """(doc_id, spans) -> per-line training rows for both line models."""
    return df.mapInPandas(_training_batches, schema=TRAINING_SCHEMA)


def write_training_data(df: DataFrame, path: str) -> None:
    """S7 sink: one partition subtree per model."""
    training_data(df).write.mode("overwrite").partitionBy("model").parquet(path)
