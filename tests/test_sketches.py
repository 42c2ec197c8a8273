"""Sketch error bounds vs exact computation (the standard sketch contract)."""

from grobid_medical_report_spark.operators.sketches import x_sketches


def test_sketch_error_bounds(spark):
    for r in x_sketches(spark, "/root/testdata/sf0.01").collect():
        assert abs(r["approx_keys"] - r["exact_keys"]) / r["exact_keys"] < 0.05, r
        for q in ("p50", "p95"):
            rel = abs(r[f"approx_{q}"] - r[f"exact_{q}"]) / abs(r[f"exact_{q}"])
            assert rel < 0.02, (r["table_name"], q, rel)
