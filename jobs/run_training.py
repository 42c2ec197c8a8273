"""spark-submit entrypoint: the train/evaluate loop of the reference's
trainer runner (MedicalReportTrainerRunner.java:19-80, modes
train/evaluate; gradle train_* tasks, build.gradle:192-338).

    spark-submit --py-files engine.zip jobs/run_training.py \
        --mode train    --n-docs 300 --output /path/to/training_out
    spark-submit --py-files engine.zip jobs/run_training.py \
        --mode evaluate --n-docs 200

* ``train``: writes the 11-trainer training-data table
  (operators/training.py, partitionBy model — the createTraining sink),
  then fits the two sequence models driver-side (tools/train_segmenter.py,
  tools/train_ner.py: structured perceptrons to zero train errors) and
  writes the model artifacts next to the package
  (models/segmenter_model.json, models/ner_model.json).
* ``evaluate``: distributed P/R/F1 of the fitted segmenter and NER against
  the golden annotations (the eval_* harness analog) — prints one JSON
  line per model.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=("train", "evaluate", "split", "nfold"),
                    required=True)
    ap.add_argument("--n-docs", type=int, default=300)
    ap.add_argument("--output", help="training-data parquet dir (train mode)")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01",
                    help="scale-factor data dir for evaluate mode "
                         "(sizes the eval corpus like --input in "
                         "run_extraction.py)")
    ap.add_argument("--split", type=float, default=0.8,
                    help="train fraction for --mode split (the reference's "
                         "build.gradle default)")
    ap.add_argument("--folds", type=int, default=5,
                    help="fold count for --mode nfold")
    ap.add_argument("--models", default=None,
                    help="comma-separated model subset for split/nfold "
                         "(default: all 11)")
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    args = ap.parse_args(argv)

    if args.mode in ("split", "nfold"):
        # held-out evaluation (MedicalReportTrainerRunner modes split /
        # n-fold): driver-side refit on doc-disjoint partitions — no Spark
        # session needed, the training sets are bounded by --n-docs
        import evaluate_models as ev
        models = (args.models.split(",") if args.models
                  else list(ev.FAMILIES))
        for model in models:
            if args.mode == "split":
                r = ev.eval_split(model, args.n_docs, args.split)
            else:
                r = ev.eval_nfold(model, args.n_docs, args.folds)
            print(json.dumps(r, ensure_ascii=False))
        return 0

    from grobid_medical_report_spark.session import get_spark
    spark = get_spark("medical-report-training",
                      master=f"local[{args.cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    if args.mode == "train":
        if not args.output:
            ap.error("--output required in train mode")
        from grobid_medical_report_spark.corpus import corpus_df
        from grobid_medical_report_spark.operators.training import \
            write_training_data

        write_training_data(corpus_df(spark, args.n_docs), args.output)
        import train_body
        import train_fields
        import train_ner
        import train_segmenter
        import train_subentity

        train_segmenter.main()
        train_ner.main()
        train_body.main()
        train_fields.main()
        train_subentity.main()
        print(json.dumps({"mode": "train", "n_docs": args.n_docs,
                          "training_data": args.output,
                          "models": ["segmenter_model.json", "ner_model.json",
                                     "body_model.json", "header_model.json",
                                     "leftnote_model.json",
                                     "subentity_models.json"]}))
        return 0

    # evaluate: distributed prediction-vs-annotation joins
    import __spark_entry__ as entry

    sf_dir = args.sf_dir
    seg = entry.x_eval_segmenter(spark, sf_dir).collect()
    nr = entry.x_eval_ner(spark, sf_dir).collect()
    for model, rows in (("medical-report-segmenter", seg),
                        ("fr-medical-ner", nr)):
        print(json.dumps({"mode": "evaluate", "model": model,
                          "per_label": [r.asDict() for r in rows]},
                         ensure_ascii=False))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
