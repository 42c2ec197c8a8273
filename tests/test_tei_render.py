"""TEI serialization: fixture-shaped fragments from the reference's expected
outputs (processHeaderFromPDF.xml / processFullMedicalText.xml)."""

import xml.etree.ElementTree as ET

from grobid_medical_report_spark.functions.tei import render_tei
from grobid_medical_report_spark.operators.assemble import extract_doc
from tests.test_header_fixture import DOC


def test_header_fragments_match_fixture():
    xml = render_tei(extract_doc("example", DOC))
    assert '<title type="main">COMPTE RENDU OPÉRATOIRE</title>' in xml
    assert '<date type="issued" when="2000-04-29">2000-04-29</date>' in xml
    assert ("<persName>Dr Mathieu MERLIN; Dr Leroy BLANC; Dr Jolie MASSON"
            "</persName>") in xml
    assert "<idno>800099001; 231456001</idno>" in xml
    assert ("<affiliation>Pôle Femmes -Adolescents -Mères -Enfants SERVICE DE "
            "GYNECOLOGIEOBSTETRIQUE ET MEDECINE DE LA REPRODUCTION"
            "</affiliation>") in xml


def test_body_structure():
    xml = render_tei(extract_doc("example", DOC))
    assert '<div><head level="1">DIAGNOSTIC :</head>' in xml
    assert "<p>Injection in situ de Methotrexate sur cicatrice de césarienne." in xml


def test_renders_well_formed_xml_for_corpus_docs():
    from grobid_medical_report_spark.corpus import generate_doc

    for i in range(30):
        d = generate_doc(i)
        xml = render_tei(extract_doc(d["doc_id"], d["spans"]))
        root = ET.fromstring(xml)  # raises on malformed XML
        assert root.tag.endswith("TEI")


def test_media_refs_survive_to_graphics():
    from grobid_medical_report_spark.corpus import generate_doc

    for i in range(60):
        d = generate_doc(i)
        refs = [s["media_ref"] for s in d["expected_spans"] if s["media_ref"]]
        if not refs:
            continue
        xml = render_tei(extract_doc(d["doc_id"], d["spans"]))
        for ref in refs:
            assert f'<graphic url="{ref}"/>' in xml
        break
    else:
        raise AssertionError("no doc with media found in first 60")
