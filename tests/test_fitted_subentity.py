"""Fitted sub-entity token taggers (dateline / medic / name-person) vs
their regex-group twins — segment equality on held-out strings, end-to-end
parse equality under both paths, artifact schema."""

from __future__ import annotations

import json
import os
import sys

from grobid_medical_report_spark.corpus import ZONE_OF, generate_doc
from grobid_medical_report_spark.operators import header
from grobid_medical_report_spark.operators import subentity as se

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
import train_subentity as ts  # noqa: E402


def test_artifact_schema():
    with open(se.SUB_MODEL_PATH) as f:
        m = json.load(f)
    for name, labels in se.SUB_LABELS.items():
        assert tuple(m[name]["labels"]) == labels
        assert tuple(m[name]["features"]) == se.SUB_FEATURES


def test_fitted_segments_equal_regex_twins_held_out():
    checked = 0
    for model in se.SUB_LABELS:
        pae = model in ("patient", "address", "organization")
        for text, _feats, _gold in ts.examples(model, 300, 460):
            if pae:
                toks = se.tokens_of(text)
                exp = se.segments_to_fields(text, toks,
                                            se.rule_tags(model, text))
            else:
                exp = {}
                for s0, s1, f in ts._segments_for(model, text):
                    if f not in exp:
                        seg = text[s0:s1]
                        if seg.endswith(","):
                            seg = seg[:-1]
                        exp[f] = seg
            assert se.tag_segments(model, text) == exp, (model, text)
            checked += 1
    assert checked > 800


def test_parse_header_zone_fitted_equals_rules_subentities():
    """datelines / medics / person_names identical under both paths."""
    for i in range(300, 360):
        d = generate_doc(i)
        hdr = [d["spans"][j]["text"]
               for j, lab in enumerate(d["line_labels"])
               if ZONE_OF[lab] == "header"]
        a = header.parse_header_zone(hdr)
        b = header.parse_header_zone(hdr, use_rules=True)
        assert a == b, d["doc_id"]


def test_fixture_shapes():
    segs = se.tag_segments("dateline", "CRETEIL, le 29/04/2000")
    assert segs == {"placename": "CRETEIL", "date": "29/04/2000"}
    segs = se.tag_segments("medic", "Dr Mathieu MERLIN, Opérateur")
    assert segs == {"persname": "Dr Mathieu MERLIN", "role": "Opérateur"}
    assert header.parse_person_name_fitted("Madame Abba Voletta DUPONT") == \
        header.parse_person_name("Madame Abba Voletta DUPONT")


def test_retraining_converges_smoke():
    for model in se.SUB_LABELS:
        data = list(ts.examples(model, 0, 40))
        W, _ = ts.train(data, len(se.SUB_LABELS[model]))
        for _text, feats, gold in data:
            for f, g in zip(feats, gold):
                scores = [sum(W[j][k] for k in f)
                          for j in range(len(se.SUB_LABELS[model]))]
                assert scores.index(max(scores)) == g


def test_patient_mixed_line_decodes_token_level():
    """The load-bearing case for token granularity: one line mixing
    name + birthdate + address (reference PatientParser.java:58-222).
    A line-granularity field model cannot produce these splits."""
    t = ("Madame Anne Marie DUPONT, né(e) le 12/03/1985, "
         "demeurant : 5, Rue des Lilas DIJON")
    for ur in (False, True):
        seg = se.parse_patient_line(t, use_rules=ur)
        assert seg["persname"] == "Madame Anne Marie DUPONT", ur
        assert seg["birthdate"] == "12/03/1985", ur
        assert seg["address"] == "5, Rue des Lilas DIJON", ur
        assert not any(seg[k] for k in ("birthplace", "death", "settlement",
                                        "country", "phone", "email",
                                        "note", "sex")), (ur, seg)
    # pure-name shape: everything is the persname, nothing else fires
    for ur in (False, True):
        seg = se.parse_patient_line("Monsieur Jean Luc MARTIN", use_rules=ur)
        assert seg["persname"] == "Monsieur Jean Luc MARTIN"
        assert seg["birthdate"] == "" and seg["address"] == ""


def test_patient_full_vocabulary_line():
    """r4: the FULL PatientParser label set on one line — birthplace,
    death date, settlement, country, phone, email and the guardianship
    note all decode token-level, under both the fitted tagger and the
    scanner twin (reference writeField set, PatientParser.java:473-514)."""
    t = ("Monsieur Jean Luc MARTIN, né(e) le 12/03/1985 à LYON, "
         "décédé(e) le 02/05/2021, demeurant : 5, Rue des Lilas 69000 "
         "LYON, France, Tél : 06 12 34 56 78, "
         "courriel : jean.martin@exemple.fr (sous tutelle)")
    for ur in (False, True):
        seg = se.parse_patient_line(t, use_rules=ur)
        assert seg["persname"] == "Monsieur Jean Luc MARTIN", ur
        assert seg["birthdate"] == "12/03/1985", ur
        assert seg["birthplace"] == "LYON", ur
        assert seg["death"] == "02/05/2021", ur
        assert seg["address"] == "5, Rue des Lilas 69000 LYON", ur
        assert seg["country"] == "France", ur
        assert seg["phone"] == "06 12 34 56 78", ur
        assert seg["email"] == "jean.martin@exemple.fr", ur
        assert seg["note"] == "(sous tutelle)", ur
    # 'demeurant à CITY' -> settlement, not address
    t2 = "Madame Anne DUPONT, né(e) le 01/01/1990, demeurant à DIJON"
    for ur in (False, True):
        seg = se.parse_patient_line(t2, use_rules=ur)
        assert seg["settlement"] == "DIJON" and seg["address"] == "", ur
    # idno/idtype and sex lines route through the same tagger
    for ur in (False, True):
        segs = (se._rule_fields("patient", "IPP : 800099001") if ur
                else se.tag_segments("patient", "IPP : 800099001"))
        assert segs == {"idtype": "IPP", "idno": "800099001"}, ur
        segs = (se._rule_fields("patient", "Sexe : F") if ur
                else se.tag_segments("patient", "Sexe : F"))
        assert segs == {"sex": "F"}, ur


def test_org_and_address_full_vocabulary():
    """r4: institution stack / extra address lines decompose into the full
    OrganizationParser / AddressParser label sets under both paths."""
    org = ("CHU de Dijon Hôpital Bocage, Dijon DMU Neurosciences "
           "Université de Dijon, France Institut Curie "
           "Centre de Référence Maladies Rares Site Sud, 6, Avenue de la "
           "République Unité de soins intensifs Département de Pédiatrie "
           "Association Croix-Rouge Pôle Urgences - SERVICE DE CARDIOLOGIE")
    for ur in (False, True):
        got = se.parse_org_fields(org, use_rules=ur)
        assert got == {
            "chu": "CHU de Dijon", "hospital": "Hôpital Bocage",
            "settlement": "Dijon", "dmu": "DMU Neurosciences",
            "university": "Université de Dijon", "country": "France",
            "institution": "Institut Curie",
            "center": "Centre de Référence Maladies Rares",
            "site": "Site Sud", "address": "6, Avenue de la République",
            "unit": "Unité de soins intensifs",
            "department": "Département de Pédiatrie",
            "organization": "Association Croix-Rouge",
            "pole": "Pôle Urgences", "service": "SERVICE DE CARDIOLOGIE",
        }, (ur, got)
    contact = "Tél : 01 23 45 67 89 - Fax : 01 98 76 54 32 (standard)"
    for ur in (False, True):
        got = se.parse_org_fields(contact, use_rules=ur)
        assert got == {"phone": "01 23 45 67 89",
                       "fax": "01 98 76 54 32",
                       "note": "(standard)"}, (ur, got)
    for ur in (False, True):
        assert se.parse_org_fields("www.chu-dijon.fr",
                                   use_rules=ur) == {"web": "www.chu-dijon.fr"}
        assert se.parse_org_fields("secretariat@chu-dijon.fr",
                                   use_rules=ur) == {
            "email": "secretariat@chu-dijon.fr"}
    addr = ("Bâtiment B2 (2ème étage) 6, Rue Pasteur BP 308 21000 DIJON "
            "Cedex Quartier Bellevue Commune de Plérin "
            "Côtes-d'Armor (22) - Bretagne")
    for ur in (False, True):
        got = se.parse_address_fields(addr, use_rules=ur)
        assert got == {
            "buildingnumber": "B2", "note": "(2ème étage)",
            "streetnumber": "6", "streetname": "Rue Pasteur",
            "pobox": "308", "postcode": "21000", "city": "DIJON Cedex",
            "district": "Bellevue", "community": "Plérin",
            "departmentname": "Côtes-d'Armor", "departmentnumber": "(22)",
            "region": "Bretagne",
        }, (ur, got)
    for ur in (False, True):
        got = se.parse_address_fields("Immeuble Les Lilas", use_rules=ur)
        assert got == {"buildingname": "Les Lilas"}, (ur, got)


def test_org_mixed_splits_at_last_dash():
    """'Pôle Femmes - Mères - Enfants - SERVICE DE X' must split at the
    LAST dash (inner dashes belong to the pole name) — sequence context."""
    t = "Pôle Femmes - Mères - Enfants - SERVICE DE GYNECOLOGIE"
    for ur in (False, True):
        assert se.parse_org_fields(t, use_rules=ur) == {
            "pole": "Pôle Femmes - Mères - Enfants",
            "service": "SERVICE DE GYNECOLOGIE"}, ur
    # space-joined form (no separator dash at all)
    t2 = "Pôle Urgences SERVICE DE CARDIOLOGIE"
    for ur in (False, True):
        assert se.parse_org_fields(t2, use_rules=ur) == {
            "pole": "Pôle Urgences", "service": "SERVICE DE CARDIOLOGIE"}


def test_address_combined_line_recovers_all_fields():
    t = "17, Avenue de la République, 22000 LE KREMLIN BICETRE Cedex"
    for ur in (False, True):
        assert se.parse_address_fields(t, use_rules=ur) == {
            "streetnumber": "17", "streetname": "Avenue de la République",
            "postcode": "22000", "city": "LE KREMLIN BICETRE Cedex"}, ur
    # street-only line: no hallucinated city
    for ur in (False, True):
        got = se.parse_address_fields("8, Boulevard Voltaire", use_rules=ur)
        assert got == {"streetnumber": "8", "streetname": "Boulevard Voltaire"}


def test_kernel_patient_struct_from_mixed_docs():
    """End-to-end: docs whose patient line is MIXED must still yield the
    full patient struct (persname/birthdate/address) through the kernel."""
    from grobid_medical_report_spark.operators.assemble import extract_doc

    n_mixed = 0
    for i in range(300, 420):
        d = generate_doc(i)
        mixed = any("demeurant" in (s["text"] or "")
                    and (s["text"] or "").startswith(("Madame", "Monsieur"))
                    for s in d["spans"])
        if not mixed:
            continue
        n_mixed += 1
        r = extract_doc(d["doc_id"], d["spans"])
        assert r["status"] == "ok"
        want = d["patients"][0]
        got = r["patients"][0]
        for k in ("id", "persname", "birthdate", "age", "address"):
            assert got[k] == want[k], (i, k, got[k], want[k])
        assert r["leftnote"]["settlement"] == d["leftnote"]["settlement"]
    assert n_mixed > 20
