"""Reference-fixture parity #5: French medical NER over the reference's
PDF-path test document.

Expected output = /root/reference/resources/test/processFrenchMedicalNERFromPDF.xml
(the `<listEntity>` inline markup over Example.pdf's extracted text). The
plain text is reconstructed by stripping the entity tags — the same
round-trip the FromText fixture test uses — and every line's entity
sequence must match verbatim, including the reference model's context
quirks (period-adjacent terms untagged, "Échographie du <date>" untagged,
the all-dash separator tagged as pathology, end-of-text period folds).
"""

from __future__ import annotations

import re

from grobid_medical_report_spark.operators.ner import extract_entities

FIXTURE = ("/root/reference/resources/test/"
           "processFrenchMedicalNERFromPDF.xml")
TAG = re.compile(r"<(/?)(\w+)>")


def _lines():
    xml = open(FIXTURE, encoding="utf-8").read()
    body = xml.split("<listEntity>")[1].split("</listEntity>")[0]
    for raw in (line.strip() for line in body.split("\n")):
        if not raw:
            continue
        plain, exp, stack = "", [], []
        for part in re.split(r"(<[^>]+>)", raw):
            m = TAG.fullmatch(part)
            if m:
                if m.group(1):
                    t, s = stack.pop()
                    exp.append((t.lower(), plain[s:], s, len(plain)))
                else:
                    stack.append((m.group(2), len(plain)))
            else:
                plain += part
        assert not stack, raw
        yield plain, exp


def test_reference_ner_pdf_fixture_verbatim():
    n_lines = n_entities = 0
    for plain, exp in _lines():
        got = [(e["type"], e["text"], e["start"], e["end"])
               for e in extract_entities(plain)]
        assert got == exp, plain
        n_lines += 1
        n_entities += len(exp)
    assert n_lines >= 25 and n_entities >= 30
