"""REST service (S8) — endpoint surface and parity with the kernel paths."""

from __future__ import annotations

import json
import urllib.request

import pytest

from grobid_medical_report_spark.corpus import generate_doc
from grobid_medical_report_spark.functions.tei import render_tei
from grobid_medical_report_spark.operators.assemble import extract_doc
from grobid_medical_report_spark.service import serve


@pytest.fixture(scope="module")
def server():
    srv = serve(port=0, background=True)   # ephemeral port
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def _get(url: str) -> tuple[int, str]:
    with urllib.request.urlopen(url) as r:
        return r.status, r.read().decode()


def _post(url: str, payload, content_type="application/json"):
    data = (json.dumps(payload).encode() if content_type.endswith("json")
            else payload.encode())
    req = urllib.request.Request(url, data=data,
                                 headers={"Content-Type": content_type})
    try:
        with urllib.request.urlopen(req) as r:
            return r.status, r.read().decode()
    except urllib.error.HTTPError as e:
        return e.code, e.read().decode()


def test_isalive_version_description(server):
    assert _get(f"{server}/isalive") == (200, "true")
    status, v = _get(f"{server}/version")
    assert status == 200 and v
    status, d = _get(f"{server}/grobidMedicalReport")
    assert status == 200 and "medical" in d


def test_process_full_medical_text_matches_kernel_tei(server):
    d = generate_doc(3)
    status, tei = _post(f"{server}/processFullMedicalText",
                        {"doc_id": d["doc_id"], "spans": d["spans"]})
    assert status == 200
    assert tei == render_tei(extract_doc(d["doc_id"], d["spans"]))
    assert tei.startswith("<?xml")


def test_process_header_document(server):
    d = generate_doc(11)
    status, body = _post(f"{server}/processHeaderDocument",
                         {"doc_id": d["doc_id"], "spans": d["spans"]})
    out = json.loads(body)
    assert status == 200 and out["status"] == "ok"
    assert out["header"]["docnum"] == d["header"]["docnum"]
    assert out["header"]["doctype"] == d["header"]["doctype"]


def test_process_ner_text(server):
    status, body = _post(
        f"{server}/processFrenchMedicalNER",
        {"text": "Patiente adressée aux urgences pour surveillance "
                 "clinique."})
    ents = json.loads(body)["entities"]
    assert status == 200
    assert ("rolename", "Patiente") in [(e["type"], e["text"]) for e in ents]


def test_process_dateline_form_encoded(server):
    status, body = _post(f"{server}/processDateline",
                         "dateline=DIJON, le 13/03/1992, à 15h12",
                         content_type="application/x-www-form-urlencoded")
    dl = json.loads(body)["datelines"]
    assert status == 200 and dl[0]["placename"] == "DIJON"
    assert dl[0]["date"] == "13/03/1992" and dl[0]["time"] == "15h12"


def test_batch_kernel_path(server):
    docs = [generate_doc(i) for i in range(3)]
    status, body = _post(
        f"{server}/processBatch",
        {"docs": [{"doc_id": d["doc_id"], "spans": d["spans"]}
                  for d in docs]})
    spans = json.loads(body)["spans"]
    assert status == 200
    exp = [(d["doc_id"], s["order"], s["kind"], s["text"], s["media_ref"])
           for d in docs for s in d["expected_spans"]]
    got = [(s["doc_id"], s["order"], s["kind"], s["text"], s["media_ref"])
           for s in spans]
    assert got == exp


def test_pdf_endpoints_are_501(server):
    status, _ = _post(f"{server}/annotatePDF", {})
    assert status == 501


def test_batch_spark_path(spark):
    srv = serve(port=0, spark=spark, background=True)
    try:
        base = f"http://127.0.0.1:{srv.server_address[1]}"
        docs = [generate_doc(i) for i in range(2)]
        status, body = _post(
            f"{base}/processBatch",
            {"docs": [{"doc_id": d["doc_id"], "spans": d["spans"]}
                      for d in docs]})
        assert status == 200
        spans = json.loads(body)["spans"]
        exp = {(d["doc_id"], s["order"], s["kind"], s["text"])
               for d in docs for s in d["expected_spans"]}
        got = {(s["doc_id"], s["order"], s["kind"], s["text"])
               for s in spans}
        assert got == exp
    finally:
        srv.shutdown()


def test_out_of_distribution_lines_degrade_not_500(server):
    """ADVICE r2: a fitted mispredict on a weird line must degrade to the
    'note' action, not raise through the kernel into an HTTP 500. These
    lines are shaped to match field patterns loosely while missing the
    separators the actions split on."""
    weird = ["N degree only, no separator",
             "IPP without any colon 12345",
             "Né(e) sans la particule attendue",
             "Demeurant sans deux-points 5 rue X",
             "Tél sans deux-points 01 02 03",
             "DIAGNOSTIC :",
             "1/1"]
    spans = [{"kind": "text", "text": t, "media_ref": "", "offset": i}
             for i, t in enumerate(weird)]
    status, tei = _post(f"{server}/processFullMedicalText",
                        {"doc_id": "weird", "spans": spans})
    assert status == 200
    assert tei.startswith("<?xml")


def test_process_patient_mixed_string(server):
    """The reference's processPatient endpoint over a MIXED patient string:
    the fitted patient token tagger splits name/birthdate/address."""
    status, body = _post(
        f"{server}/processPatient",
        {"patient": "Madame Anne Marie DUPONT, né(e) le 12/03/1985, "
                    "demeurant : 5, Rue des Lilas DIJON"})
    out = json.loads(body)
    assert status == 200
    p = out["patients"][0]
    assert p["persname"] == "Madame Anne Marie DUPONT"
    assert p["birthdate"] == "12/03/1985"
    assert p["address"] == "5, Rue des Lilas DIJON"
    pn = out["person_names"][0]
    assert pn["surname"] == "DUPONT" and pn["title"] == "Madame"
