"""Reference-fixture parity: header + left-note field extraction.

Field values are taken from the reference's expected outputs
/root/reference/resources/test/processHeaderFromPDF.xml and
processLeftNoteFromPDF.xml.xml (the Example.pdf golden fixtures): title,
issued date, the three medics with the ``"; "`` persName merge, the patient
(IPP idno merge "800099001; 231456001", birth, age, address) and the
left-note affiliation/address block.
"""

from grobid_medical_report_spark.operators.assemble import extract_doc


def _spans(lines):
    return [{"kind": "text", "text": t, "media_ref": "", "offset": i}
            for i, t in enumerate(lines)]


DOC = _spans([
    # header zone (content from the processHeaderFromPDF.xml fixture)
    "N° 202200001",
    "COMPTE RENDU OPÉRATOIRE",
    "CRETEIL, le 29/04/2000",
    "Dr Mathieu MERLIN, Opérateur",
    "Dr Leroy BLANC, Assistant",
    "Dr Jolie MASSON, Anesthésiste",
    "IPP : 800099001",
    "IPP : 231456001",
    "Madame Abba Voletta DUPONT",
    "Né(e) le 01/01/1990",
    "27 ans",
    "Demeurant : 666, Avenue de la République 94270 LE KREMLIN BICETRE",
    # left-note zone (processLeftNoteFromPDF.xml.xml letterhead)
    "Pôle Femmes -Adolescents -Mères -Enfants",
    "SERVICE DE GYNECOLOGIEOBSTETRIQUE ET MEDECINE DE LA REPRODUCTION",
    "51, Avenue du Mal de Lattre de Tassigny",
    "94010 CRETEIL Cedex",
    # body
    "DIAGNOSTIC :",
    "Injection in situ de Methotrexate sur cicatrice de césarienne.",
    "1/1",
])


def test_header_fields_match_reference_fixture():
    r = extract_doc("example", DOC)
    h = r["header"]
    assert h["title"] == "COMPTE RENDU OPÉRATOIRE"
    assert h["doctype"] == "COMPTE RENDU OPÉRATOIRE"
    assert h["date_iso"] == "2000-04-29"          # <date type="issued" when=...>
    assert h["docnum"] == "202200001"
    # <persName>Dr Mathieu MERLIN; Dr Leroy BLANC; Dr Jolie MASSON</persName>
    assert "; ".join(h["medics"]) == "Dr Mathieu MERLIN; Dr Leroy BLANC; Dr Jolie MASSON"
    assert [m["role"] for m in r["medics"]] == ["Opérateur", "Assistant", "Anesthésiste"]


def test_patient_fields_match_reference_fixture():
    r = extract_doc("example", DOC)
    p = r["patients"][0]
    assert p["idtype"] == "IPP"
    assert p["id"] == "800099001; 231456001"      # "; " concat-merge (A1)
    assert p["persname"] == "Madame Abba Voletta DUPONT"
    assert p["birthdate"] == "01/01/1990"
    assert p["age"] == "27 ans"
    assert p["address"] == "666, Avenue de la République 94270 LE KREMLIN BICETRE"


def test_leftnote_fields_match_reference_fixture():
    r = extract_doc("example", DOC)
    ln = r["leftnote"]
    # fixture <affiliation> (space-joined org hierarchy)
    assert ln["org"] == ("Pôle Femmes -Adolescents -Mères -Enfants "
                         "SERVICE DE GYNECOLOGIEOBSTETRIQUE ET MEDECINE DE LA REPRODUCTION")
    # fixture <addrLine>
    assert ln["address"] == "51, Avenue du Mal de Lattre de Tassigny 94010 CRETEIL Cedex"
    assert ln["settlement"] == "CRETEIL"


def test_person_name_decomposition():
    r = extract_doc("example", DOC)
    pn = r["person_names"][0]
    assert pn == {"idx": 0, "title": "Dr", "forename": "Mathieu",
                  "middlename": "", "surname": "MERLIN", "suffix": ""}
