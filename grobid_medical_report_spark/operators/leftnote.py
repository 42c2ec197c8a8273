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
from .segmenter import RE_FAX, RE_POLE, RE_POSTCODE, RE_SERVICE, RE_STREET, RE_TEL

_EMPTY: dict[str, Any] = {
    "idno": "", "org": "", "address": "", "country": "", "settlement": "",
    "phone": "", "fax": "", "email": "", "web": "", "note": ""}


def parse_leftnote_zone(lines: list[str]) -> dict[str, Any]:
    ln = dict(_EMPTY)
    ln["medics"] = []
    for raw in lines:
        t = normalize_space(raw)
        if RE_POLE.fullmatch(t) or RE_SERVICE.fullmatch(t):
            ln["org"] = (ln["org"] + " " + t).strip()
        elif RE_TEL.fullmatch(t):
            ln["phone"] = t.split(":", 1)[1].strip()
        elif RE_FAX.fullmatch(t):
            ln["fax"] = t.split(":", 1)[1].strip()
        elif RE_POSTCODE.fullmatch(t):
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
