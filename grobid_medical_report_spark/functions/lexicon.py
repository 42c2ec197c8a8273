"""Gazetteers / lexicons for the medical-report extraction engine.

The reference loads term sets (ANAT, CHEM, DISO, ... plus first/last names,
locations, titles) into in-memory ``FastMatcher`` tries
(reference: core/lexicon/MedicalNERLexicon.java:26-101, singleton at :49-67)
and consumes them as token-position features.  Here the same role is played by
frozen Python sets that are broadcast to executors and consumed inside Arrow
UDF batches (SURVEY.md F9/J1: broadcast-set membership, the Spark analog of a
broadcast hash join against a small dimension table).

These lists are the engine's *model resources* (the analog of grobid-home
lexicon files): both the synthetic-corpus generator and the extractor read
them, exactly as the reference's training data and its runtime share
grobid-home lexicons.
"""

from __future__ import annotations

CITIES = [
    "PARIS", "CRETEIL", "LYON", "MARSEILLE", "TOULOUSE",
    "NANTES", "LILLE", "BORDEAUX", "RENNES", "DIJON",
    "LE KREMLIN BICETRE", "VILLEJUIF",
]

FIRST_NAMES = [
    "Mathieu", "Leroy", "Jolie", "Caroline", "Margo", "Abba", "Belle",
    "Hakuna", "Robin", "Pauline", "Lucie", "Antoine", "Camille", "Hugo",
    "Joseline", "Voletta", "Matata", "Claire", "Julien", "Sophie",
]

LAST_NAMES = [
    "MERLIN", "BLANC", "MASSON", "GENTILE", "COCO", "DUPONT", "ROUX",
    "HOOD", "GAUTIER", "MARTIN", "BERNARD", "PETIT", "DURAND", "LEROY",
    "MOREAU", "SIMON", "LAURENT", "MICHEL", "GARCIA", "MARTINEZ",
]

PERSON_TITLES = ["Dr", "Docteur", "Pr", "Professeur", "Madame", "Monsieur", "Mme", "M."]

#: patient civility words the corpus grammar draws from — the single
#: source of truth for every fold-based civility probe (the header
#: featurizer derives its suppression set from THIS list via ocr_fold, so
#: adding a civility here keeps the patient-vs-patient_address compound
#: feature sound instead of silently reopening the confusion; ADVICE r5).
#: BYTE-STABILITY CONSTRAINT (ADVICE r6): corpus.generate_doc draws
#: rng.choice from THIS list, so resizing it shifts every subsequent rng
#: draw and breaks the committed goldens and every corpus-hash-keyed
#: oracle. Scanner-only civility coverage goes in a separate extension
#: list that featurizers union in (the NER_EXTRA_TERMS pattern) — never
#: here.
CIVILITIES = ["Madame", "Monsieur"]

ROLES = [
    "Opérateur", "Assistant", "Anesthésiste", "Chirurgien", "Interne",
    "Chef de Service", "Sage-femme", "Kinésithérapeute",
]

SPECIALTIES = [
    "GYNECOLOGIE", "CARDIOLOGIE", "NEUROLOGIE", "PEDIATRIE",
    "ONCOLOGIE", "UROLOGIE", "RADIOLOGIE", "CHIRURGIE ORTHOPEDIQUE",
]

DOCTYPES = [
    "COMPTE RENDU OPÉRATOIRE",
    "COMPTE RENDU D'HOSPITALISATION",
    "COMPTE RENDU DE CONSULTATION",
    "ORDONNANCE",
]

STREETS = [
    "Avenue de la République", "Rue de la Paix", "Boulevard Voltaire",
    "Avenue du Général Leclerc", "Rue Pasteur",
    "Avenue du Mal de Lattre de Tassigny", "Rue des Lilas",
]

# --- letterhead / address sub-entity lexicons (reference grobid-home
# lexicon analogs for the PatientParser/AddressParser/OrganizationParser
# label vocabularies — PatientParser.java:473-514, AddressParser.java,
# OrganizationParser.java writeField sets) ---------------------------------

#: (departmentname, departmentnumber, region) rows for address lines like
#: "Côtes-d'Armor (22) - Bretagne"
DEPARTMENTS = [
    ("Côtes-d'Armor", "22", "Bretagne"),
    ("Val-de-Marne", "94", "Île-de-France"),
    ("Rhône", "69", "Auvergne-Rhône-Alpes"),
    ("Nord", "59", "Hauts-de-France"),
    ("Gironde", "33", "Nouvelle-Aquitaine"),
]

BUILDING_NUMBERS = ["A", "B2", "C3", "D"]
BUILDING_NAMES = ["Les Lilas", "Rosa Parks", "Jean Minjoz"]
DISTRICTS = ["Saint-Michel", "Bellevue", "La Gare"]
COMMUNES = ["Trégueux", "Langueux", "Plérin"]

HOSPITAL_NAMES = ["Pontchaillou", "Saint-Louis", "Henri Mondor",
                  "Pitié-Salpêtrière", "Bocage"]
INSTITUTE_NAMES = ["Gustave Roussy", "Curie", "Pasteur"]
DMU_NAMES = ["Neurosciences", "CARE", "Polyvalent"]
CENTER_NAMES = ["Maladies Rares", "Mucoviscidose", "Sommeil"]
SITE_NAMES = ["Sud", "Nord", "Pasteur"]
UNIT_NAMES = ["soins intensifs", "réanimation néonatale",
              "chirurgie ambulatoire"]
ORG_DEPT_NAMES = ["d'Anesthésie", "de Pédiatrie", "d'Imagerie Médicale"]
ASSOCIATION_NAMES = ["Croix-Rouge", "Solidarité Malades"]

SECTIONS = [
    "DIAGNOSTIC", "RAPPEL CLINIQUE", "HISTOIRE DE LA MALADIE",
    "DESCRIPTION DETAILLEE", "COMPTE RENDU OPÉRATOIRE", "CONCLUSION",
    "EXAMENS COMPLEMENTAIRES", "TRAITEMENT",
]

SUBSECTIONS = [
    "Antécédents", "Traitement en cours", "Examen clinique",
    "Suites opératoires", "Mode de vie", "Allergies",
]

# --- NER term sets (analog of MedicalNERLexicon's 10 categories) ------------

PATHOLOGY = [
    "arthrite septique", "fracture du col", "pneumopathie aiguë",
    "appendicite aiguë", "otite moyenne", "embolie pulmonaire",
]

ANATOMY = [
    "genou droit", "genou", "abdomen", "col du fémur", "poumon gauche",
    "épaule droite", "cicatrice", "guide",
]

MEDICAMENT = [
    "Daptomycine", "Linézolide", "Methotrexate", "Amoxicilline",
    "Paracétamol", "bétadine", "Ibuprofène", "Héparine",
]

PROCEDURE = [
    "synovectomie", "césarienne", "échographie", "arthroscopie",
    "ponction lombaire", "sondage vésical", "injection in situ",
    "lavage articulaire arthroscopique", "antibiothérapie adaptée",
    "antibiothérapie", "anesthésie", "diagnostic",
]

SYMPTOM = [
    "douleurs pelviennes", "fièvre persistante", "abdomen souple",
    "toux sèche", "cicatrice de césarienne",
]

PHYSIOLOGY = ["grossesse isthmique", "grossesse ectopique", "cycle menstruel"]

SUBSTANCE = ["Corynebacterium", "staphylocoque doré", "potassium"]

DEVICE = ["cathéter veineux", "sonde urinaire", "prothèse totale de hanche"]

LOCATION = ["urgences", "bloc opératoire", "salle de réveil"]

PERSTYPE = ["origine alsacienne", "origine bretonne", "origine normande"]

ROLENAMES_NER = ["Patient", "Patiente", "Opérateur", "Anesthésiste"]

UNITS = ["ans", "mg", "SA", "ml", "cm", "kg"]

#: scanner-only terms mirroring the reference's expected NER outputs
#: (processFrenchMedicalNERFromPDF.xml) — kept OUT of the generation lists
#: above so corpus rng draws stay byte-stable across rounds
NER_EXTRA_TERMS: dict[str, list[str]] = {
    "procedure": ["césariennes", "Injection de 120mg"],
    "device": ["aspiration du sac gestationnel."],
}

#: NER entity categories -> term list (multi-word terms matched longest-first)
NER_TERM_SETS: dict[str, list[str]] = {
    "pathology": PATHOLOGY,
    "anatomy": ANATOMY,
    "medicament": MEDICAMENT,
    "procedure": PROCEDURE,
    "symptom": SYMPTOM,
    "physiology": PHYSIOLOGY,
    "substance": SUBSTANCE,
    "device": DEVICE,
    "location": LOCATION,
    "perstype": PERSTYPE,
}

FR_MONTHS = {
    "janvier": 1, "février": 2, "fevrier": 2, "mars": 3, "avril": 4,
    "mai": 5, "juin": 6, "juillet": 7, "août": 8, "aout": 8,
    "septembre": 9, "octobre": 10, "novembre": 11, "décembre": 12,
    "decembre": 12,
}


def lexicon_rows() -> list[tuple[str, str]]:
    """Flatten every gazetteer into (category, term) rows.

    Used to materialize the broadcast-join-able lexicon dimension table
    (FIXTURES.md §4) and for the pure-SQL membership path (SURVEY.md J1).
    """
    out: list[tuple[str, str]] = []
    for cat, terms in NER_TERM_SETS.items():
        out += [(cat, t) for t in terms]
    out += [("first_names", t) for t in FIRST_NAMES]
    out += [("last_names", t) for t in LAST_NAMES]
    out += [("locations", t) for t in CITIES]
    out += [("titles", t) for t in PERSON_TITLES]
    out += [("months", t) for t in FR_MONTHS]
    return out
