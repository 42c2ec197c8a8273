"""Left-note (hospital letterhead) field extraction.

Re-expresses the reference's `left-note-medical-report` model
(LeftNoteMedicalParser.java:75-173, resultExtraction:981-... and the
organization cascade OrganizationParser.java:58-...): org hierarchy lines,
postal address, phone/fax, settlement. Merge semantics follow the reference's
space-joined affiliation style (see fixture processLeftNoteFromPDF.xml.xml:
"Pôle Femmes -Adolescents ... SERVICE DE GYNECOLOGIE...").
"""

from __future__ import annotations

from typing import Any

from ..functions.textnorm import normalize_space
from .segmenter import (RE_FAX, RE_POLE, RE_POSTCODE, RE_SERVICE,
                        RE_STAFF_NAME, RE_STAFF_ORG_PHONE, RE_STAFF_ROLE,
                        RE_STAFF_ROLE_NAME, RE_STREET, RE_TEL)

_EMPTY: dict[str, Any] = {
    "idno": "", "org": "", "address": "", "country": "", "settlement": "",
    "phone": "", "fax": "", "email": "", "web": "", "note": ""}

# Staff-block parsing (reference fixture processLeftNoteFromPDF.xml.xml:
# "Chef de Service : Pr. A. Gautier ...", "Secrétariat : 01 41 12 34 56")
# — the left-note medics cascade (LeftNoteMedicalItem.medics +
# MedicParser/OrganizationParser over the org block). Each staff line
# becomes one encoded entry "field=value|field=value" in ``medics``
# (array<string> per FIXTURES.md); the TEI renderer turns entries back
# into the fixture's mixed content.


def parse_leftnote_zone(lines: list[str]) -> dict[str, Any]:
    ln = dict(_EMPTY)
    ln["medics"] = []
    for raw in lines:
        t = normalize_space(raw)
        if RE_POLE.fullmatch(t) or RE_SERVICE.fullmatch(t):
            ln["org"] = (ln["org"] + " " + t).strip()
            continue
        if RE_TEL.fullmatch(t):            # before staff: "Tél : 01 ..." is
            ln["phone"] = t.split(":", 1)[1].strip()   # the org's own line
            continue
        if RE_FAX.fullmatch(t):
            ln["fax"] = t.split(":", 1)[1].strip()
            continue
        m = RE_STAFF_ORG_PHONE.fullmatch(t)
        if m:
            ln["medics"].append(f"orgName={m.group(1)}|phone={m.group(2)}")
            continue
        m = RE_STAFF_ROLE_NAME.fullmatch(t)
        if m:
            ln["medics"].append(f"roleName={m.group(1)}|persName={m.group(2)}")
            continue
        m = RE_STAFF_NAME.fullmatch(t)
        if m:
            ln["medics"].append(f"persName={m.group(1)}")
            continue
        if RE_STAFF_ROLE.fullmatch(t):
            ln["medics"].append(f"roleName={t}")
            continue
        if RE_POSTCODE.fullmatch(t):
            ln["address"] = (ln["address"] + " " + t).strip()
            city = t[6:]
            if city.endswith(" Cedex"):
                city = city[: -len(" Cedex")]
            ln["settlement"] = city
            ln["country"] = "France"
        elif RE_STREET.fullmatch(t):
            ln["address"] = (ln["address"] + " " + t).strip()
        else:
            ln["note"] = (ln["note"] + " " + t).strip()
    return ln
