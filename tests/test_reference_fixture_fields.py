"""Reference-fixture-derived field assertions — expected values PARSED AT
RUNTIME from /root/reference/resources/test/*, never from the synthetic
corpus generator (the standing golden-circularity watch item: these checks
hold even if corpus.generate_doc and the kernel drifted together).

The fixture XMLs are the reference engine's own expected outputs for
Example.pdf; each test decomposes one structure (header fields, medics,
patient block, letterhead org/address, NER entities) into unit assertions
against the kernel / sub-entity taggers.
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET

import pytest

FIXDIR = "/root/reference/resources/test"
TEI_NS = {"t": "http://www.tei-c.org/ns/1.0"}


@pytest.fixture(scope="module")
def header_fixture():
    root = ET.parse(f"{FIXDIR}/processHeaderFromPDF.xml").getroot()

    def one(path):
        el = root.find(path, TEI_NS)
        return (el.text or "") if el is not None else ""

    medic = root.find(".//t:listPerson[@type='medics']/t:medic", TEI_NS)
    patient = root.find(".//t:listPerson[@type='patients']/t:patient", TEI_NS)
    return {
        "title": one(".//t:titleStmt/t:title"),
        "date_iso": root.find(".//t:publicationStmt/t:date", TEI_NS)
                        .get("when"),
        "affiliation": one(".//t:publisher/t:affiliation"),
        "addr_line": one(".//t:publisher/t:address/t:addrLine"),
        "medic_names": medic.find("t:persName", TEI_NS).text.split("; "),
        "medic_roles": medic.find("t:roleName", TEI_NS).text.split("\t"),
        "patient": {
            "idno": patient.find("t:idno", TEI_NS).text,
            "idtype": patient.find("t:idType", TEI_NS).text,
            "persname": patient.find("t:persName", TEI_NS).text,
            "birth": patient.find("t:birth", TEI_NS).get("when"),
            "age": patient.find("t:age", TEI_NS).text,
            "address": patient.find("t:address", TEI_NS).text.rstrip(";"),
        },
    }


def _doc_from(fx):
    """Reconstruct the input line stream FROM the parsed fixture values."""
    y, m, d = fx["date_iso"].split("-")
    city = fx["addr_line"].split()[-2]           # '… 94010 CRETEIL Cedex'
    svc = fx["affiliation"].find("SERVICE")
    lines = [fx["title"], f"{city}, le {d}/{m}/{y}"]
    lines += [f"{p}, {r}" for p, r in zip(fx["medic_names"],
                                          fx["medic_roles"])]
    lines += [f"IPP : {i}" for i in fx["patient"]["idno"].split("; ")]
    lines += [fx["patient"]["persname"],
              f"Né(e) le {fx['patient']['birth']}",
              fx["patient"]["age"],
              f"Demeurant : {fx['patient']['address']}",
              fx["affiliation"][:svc].strip(),
              fx["affiliation"][svc:]]
    lines += fx["addr_line"].rsplit(" ", 3)[0:1] \
        + [" ".join(fx["addr_line"].rsplit(" ", 3)[1:])]
    lines += ["DIAGNOSTIC :", "Texte du compte rendu.", "1/1"]
    return [{"kind": "text", "text": t, "media_ref": "", "offset": i}
            for i, t in enumerate(lines)]


def test_header_fields_from_parsed_fixture(header_fixture):
    from grobid_medical_report_spark.operators.assemble import extract_doc

    fx = header_fixture
    r = extract_doc("fixture", _doc_from(fx))
    assert r["status"] == "ok"
    h = r["header"]
    assert h["title"] == fx["title"]
    assert h["date_iso"] == fx["date_iso"]
    assert h["medics"] == fx["medic_names"]
    assert [m["role"] for m in r["medics"]] == fx["medic_roles"]
    p = r["patients"][0]
    assert p["id"] == fx["patient"]["idno"]        # '; '-merged idnos
    assert p["idtype"] == fx["patient"]["idtype"]
    assert p["persname"] == fx["patient"]["persname"]
    assert p["birthdate"] == fx["patient"]["birth"]
    assert p["age"] == fx["patient"]["age"]
    assert p["address"] == fx["patient"]["address"]
    # letterhead: org joins back to the fixture affiliation; the address
    # joins to the fixture addrLine; settlement comes from the postcode line
    assert r["leftnote"]["org"] == fx["affiliation"]
    assert r["leftnote"]["address"] == fx["addr_line"]
    assert r["leftnote"]["settlement"] == \
        fx["addr_line"].split()[-2]


def test_org_tagger_decomposes_fixture_affiliation(header_fixture):
    """The organization token tagger must split the FIXTURE's affiliation
    (dash-glued pole tokens like '-Adolescents') at the SERVICE boundary."""
    from grobid_medical_report_spark.operators.subentity import \
        parse_org_fields

    aff = header_fixture["affiliation"]
    svc = aff.find("SERVICE")
    for ur in (False, True):
        got = parse_org_fields(aff, use_rules=ur)
        assert got == {"pole": aff[:svc].strip(), "service": aff[svc:]}, ur


def test_address_tagger_decomposes_fixture_addrline(header_fixture):
    from grobid_medical_report_spark.operators.subentity import \
        parse_address_fields

    line = header_fixture["addr_line"]
    num, rest = line.split(", ", 1)
    m = re.match(r"^(.+?) (\d{5}) (.+)$", rest)
    for ur in (False, True):
        got = parse_address_fields(line, use_rules=ur)
        assert got == {"streetnumber": num, "streetname": m.group(1),
                       "postcode": m.group(2),
                       "city": m.group(3)}, ur


def _parse_entity_lines(path):
    """(plain_text, [(type, start, end, surface)]) per annotated fixture
    line — offsets recovered from the inline tags."""
    tag = re.compile(r"<(/?)(\w+)>")
    xml = open(path, encoding="utf-8").read()
    body = xml.split("<listEntity>")[1].split("</listEntity>")[0]
    for raw in (line.strip() for line in body.split("\n")):
        if not raw:
            continue
        plain, ents, stack = "", [], []
        for part in re.split(r"(<[^>]+>)", raw):
            m = tag.fullmatch(part)
            if m:
                if m.group(1):
                    t, s = stack.pop()
                    ents.append((t.lower(), s, len(plain), plain[s:]))
                else:
                    stack.append((m.group(2), len(plain)))
            else:
                plain += part
        ents = [(t, s, e, plain[s:e]) for t, s, e, _ in ents]
        yield plain, ents


@pytest.mark.parametrize("fixture", [
    "processFrenchMedicalNERFromText.xml",
    "processFrenchMedicalNERFromPDF.xml",
])
def test_ner_entities_match_parsed_fixture(fixture):
    """Every annotated line of both NER fixtures: the extracted (type,
    start, end, surface) set equals the fixture's inline annotations."""
    from grobid_medical_report_spark.operators.ner import extract_entities

    n_lines = n_ents = 0
    for text, want in _parse_entity_lines(f"{FIXDIR}/{fixture}"):
        got = sorted((e["type"], e["start"], e["end"], e["text"])
                     for e in extract_entities(text))
        assert got == sorted(want), (fixture, text)
        n_lines += 1
        n_ents += len(want)
    # FromText carries one long annotated block (19 entities); FromPDF has
    # one annotated line per report line
    assert n_lines >= 1 and n_ents > 15, (n_lines, n_ents)
