"""North-rule packaging: the engine must work when shipped as a
``spark-submit --py-files engine.zip`` archive — in particular the fitted
model artifacts must load through zipimport (plain ``open()`` on a package
path raises NotADirectoryError inside a zip; caught in r2)."""

from __future__ import annotations

import os
import subprocess
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_PROBE = """
import sys
sys.path.insert(0, sys.argv[1])
from grobid_medical_report_spark.operators.segmenter import _model_weights
from grobid_medical_report_spark.operators.ner import _ner_weights
from grobid_medical_report_spark.operators.body import _body_weights
from grobid_medical_report_spark.operators.header import _header_weights
from grobid_medical_report_spark.operators.leftnote import _leftnote_weights
from grobid_medical_report_spark.operators.subentity import _weights
assert _model_weights().shape[0] > 0
assert _ner_weights().shape[0] > 0
assert len(_body_weights()) > 0
assert len(_header_weights()) > 0
assert len(_leftnote_weights()) > 0
assert len(_weights()) == 6
# and a real kernel run from the zip
from grobid_medical_report_spark.corpus import generate_doc
from grobid_medical_report_spark.operators.assemble import extract_doc
d = generate_doc(3)
r = extract_doc(d["doc_id"], d["spans"])
assert r["status"] == "ok" and len(r["spans"]) > 0
print("ZIP_OK")
"""


def test_models_load_from_zip(tmp_path):
    zpath = str(tmp_path / "engine.zip")
    with zipfile.ZipFile(zpath, "w") as z:
        pkg = os.path.join(REPO, "grobid_medical_report_spark")
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in files:
                full = os.path.join(root, f)
                z.write(full, os.path.relpath(full, REPO))
    out = subprocess.run(
        [sys.executable, "-c", _PROBE, zpath],
        capture_output=True, text=True,
        cwd=str(tmp_path),          # away from the repo checkout
        env={**os.environ, "PYTHONPATH": ""})
    assert out.returncode == 0, out.stderr[-2000:]
    assert "ZIP_OK" in out.stdout
