"""Reference-fixture parity: French medical NER over the reference's own
test input.

Input text = /root/reference/resources/test/MedicalTextExample.txt (verbatim).
Expected entities = the span decomposition of the reference's expected output
/root/reference/resources/test/processFrenchMedicalNERFromText.xml
(the `<listEntity>` inline markup), i.e. the corpus the north rule's
span-sequence equality refers to (SURVEY.md §5.1).
"""

from grobid_medical_report_spark.operators.ner import extract_entities

FIXTURE_TEXT = (
    "Madame Belle Joseline DUPONT, origine alsacienne, âgée de 50 ans, "
    "née le 07/08/1970.\n"
    "Patient ayant présenté une arthrite septique du genou droit à "
    "Corynebacterium documentée sur fonction de genou traitée par "
    "Daptomycine 1500 mg puis relais par Linézolide 600 mg *2.\n"
    "Lavage articulaire arthroscopique et synovectomie le 14/08/2000 devant "
    "la mauvaise évolution locale, poursuite de l'antibiothérapie adaptée "
    "par Daptomycine jusqu'au 9/09/2000.\n"
    "Ordonnance validée électroniquement par Docteur Hakuna Matata ROUX."
)

# (type, surface) sequence exactly as marked in
# processFrenchMedicalNERFromText.xml, in reading order
EXPECTED = [
    ("persname", "Madame Belle Joseline DUPONT"),
    ("perstype", "origine alsacienne"),
    ("value", "50"),
    ("unit", "ans"),
    ("date", "07/08/1970"),
    ("rolename", "Patient"),
    ("pathology", "arthrite septique"),
    ("anatomy", "genou droit"),
    ("substance", "Corynebacterium"),
    ("anatomy", "genou"),
    ("medicament", "Daptomycine 1500 mg"),
    ("medicament", "Linézolide 600 mg *2"),
    ("procedure", "Lavage articulaire arthroscopique"),
    ("procedure", "synovectomie"),
    ("date", "14/08/2000"),
    ("procedure", "antibiothérapie adaptée"),
    ("medicament", "Daptomycine"),
    ("date", "9/09/2000"),
    ("persname", "Docteur Hakuna Matata ROUX."),
]


def test_reference_ner_text_fixture():
    got = [(e["type"], e["text"]) for e in extract_entities(FIXTURE_TEXT)]
    assert got == EXPECTED


def test_offsets_are_exact():
    for e in extract_entities(FIXTURE_TEXT):
        assert FIXTURE_TEXT[e["start"]:e["end"]] == e["text"]


def test_inline_tei_matches_reference_fixture_verbatim():
    """Full inline-markup parity with processFrenchMedicalNERFromText.xml
    (whitespace-normalized): same tags, same boundaries, same <lb/>s."""
    import re

    from grobid_medical_report_spark.functions.tei import render_ner_tei

    got = render_ner_tei(FIXTURE_TEXT, extract_entities(FIXTURE_TEXT))
    with open("/root/reference/resources/test/"
              "processFrenchMedicalNERFromText.xml", encoding="utf-8") as f:
        want = f.read()

    norm = lambda s: re.sub(r"\s+", " ", s).strip()  # noqa: E731
    assert norm(got) == norm(want)
