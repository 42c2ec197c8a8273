"""TEI-XML rendering of extraction results (SURVEY.md §2.11 T1-T7).

A pure function of the extracted struct columns — the ordered span array IS
the document (north-rule contract); the XML string is its deterministic
serialization, mirroring the reference's TEIFormatter:

* header  -> <teiHeader><fileDesc>... (TEIFormatter.toTEIHeader:115-300)
* leftnote-> <listOrg> publisher block (toTEILeftNote:301-392)
* body    -> <div>/<head>/<p>/<item>/<medic>/<figure>/<table> elements from
             the span kinds (toTEIBody:595-619 -> toTEITextPiece:766-1024)
* annex/acknowledgement tails (toTEIAcknowledgement:718-746, toTEIAnnex:747)

Element shapes follow the reference's expected-output fixtures
(resources/test/processFullMedicalText.xml / processHeaderFromPDF.xml).
"""

from __future__ import annotations

from typing import Any
from xml.sax.saxutils import escape


def _tag(name: str, content: str, **attrs: str) -> str:
    a = "".join(f' {k}="{escape(v)}"' for k, v in attrs.items() if v)
    return f"<{name}{a}>{content}</{name}>"


def render_tei_header(header: dict[str, Any], leftnote: dict[str, Any] | None,
                      patients: list[dict[str, Any]] | None = None) -> str:
    """<teiHeader> block (fixture shape: titleStmt / publicationStmt /
    sourceDesc with medics + patients lists)."""
    parts: list[str] = []
    if header.get("title"):
        parts.append(_tag("title", escape(header["title"]), type="main"))
    if header.get("date_iso"):
        parts.append(_tag("date", escape(header["date_iso"]),
                          type="issued", when=header["date_iso"]))
    pub: list[str] = []
    if leftnote:
        if leftnote.get("org"):
            pub.append(_tag("affiliation", escape(leftnote["org"])))
        if leftnote.get("address"):
            pub.append(_tag("address",
                            _tag("addrLine", escape(leftnote["address"]))))
    if pub:
        parts.append(_tag("publisher", "".join(pub)))
    src: list[str] = []
    medics = header.get("medics")
    if medics is not None and len(medics) > 0:  # Arrow hands numpy arrays
        medic = _tag("medic",
                     _tag("persName", escape("; ".join(list(medics)))))
        src.append(_tag("listPerson", medic, type="medics"))
    pts: list[str] = []
    for p in patients or []:
        fields = []
        if p.get("idtype"):
            fields.append(_tag("idType", escape(p["idtype"])))
        if p.get("id"):
            fields.append(_tag("idno", escape(p["id"])))
        if p.get("persname"):
            fields.append(_tag("persName", escape(p["persname"])))
        if p.get("birthdate"):
            fields.append(_tag("birth", escape(p["birthdate"]),
                               when=p["birthdate"]))
        if p.get("age"):
            fields.append(_tag("age", escape(p["age"])))
        if p.get("address"):
            fields.append(_tag("address", escape(p["address"])))
        pts.append(_tag("patient", "".join(fields)))
    if pts:
        src.append(_tag("listPerson", "".join(pts), type="patients"))
    if src:
        parts.append(_tag("sourceDesc", "".join(src)))
    return _tag("teiHeader", _tag("fileDesc", "".join(parts)), **{"xml:lang": "fr"})


_BODY_OPEN = {"section": ("head", {"level": "1"}),
              "subsection": ("head", {"level": "2"}),
              "paragraph": ("p", {}), "item": ("item", {}),
              "medic": ("medic", {}), "patient": ("patient", {})}


def render_tei_body(spans: list[dict[str, Any]]) -> str:
    """<body> from the ordered span sequence: sections open <div>s; figures
    and tables carry their media_ref as facsimile pointers."""
    out: list[str] = []
    open_div = False
    for s in spans:
        kind, text = s["kind"], s.get("text", "")
        if kind in ("headnote", "footnote", "page"):
            continue  # marginalia are not body content (segmenter fixtures)
        if kind in ("header", "leftnote"):
            continue  # rendered in the teiHeader
        if kind in ("section", "subsection"):
            # every heading opens its own <div> (fixture shape:
            # <div><head level="2">Antécédents :</head>...)
            if open_div:
                out.append("</div>")
            level = "1" if kind == "section" else "2"
            out.append("<div>" + _tag("head", escape(text), level=level))
            open_div = True
            continue
        if kind in ("figure", "table"):
            inner = _tag("figDesc", escape(text)) + \
                (f'<graphic url="{escape(s.get("media_ref", ""))}"/>'
                 if s.get("media_ref") else "")
            out.append(_tag("figure", inner,
                            **({"type": "table"} if kind == "table" else {})))
            continue
        if kind == "acknowledgement":
            out.append(_tag("div", _tag("p", escape(text)),
                            type="acknowledgement"))
            continue
        if kind == "annex":
            out.append(_tag("div", _tag("p", escape(text)), type="annex"))
            continue
        tag, attrs = _BODY_OPEN.get(kind, ("p", {}))
        out.append(_tag(tag, escape(text), **attrs))
    if open_div:
        out.append("</div>")
    return _tag("body", "".join(out))


#: NER entity type -> TEI element name (reference toTEIFrenchNER:1448-...,
#: content via trainingExtractionWithoutEnamex)
_NER_TAG = {
    "persname": "persName", "perstype": "persType", "rolename": "roleName",
    "orgname": "orgName", "anatomy": "anatomy", "pathology": "pathology",
    "symptom": "symptom", "physiology": "physiology", "procedure": "procedure",
    "medicament": "medicament", "substance": "substance", "device": "device",
    "location": "location", "date": "date", "time": "time", "value": "value",
    "unit": "unit", "dose": "dose", "email": "email", "phone": "phone",
    "web": "web", "idno": "idno", "measure": "measure", "object": "object",
    "living": "living",
}


def render_ner_tei(text: str, entities: list[dict[str, Any]]) -> str:
    """Inline `<listEntity>` markup (T6): entity spans wrapped in their typed
    elements in place, newlines as <lb/> — the shape of the reference fixture
    processFrenchMedicalNERFromText.xml."""
    out: list[str] = []
    pos = 0
    for e in sorted(entities, key=lambda x: x["start"]):
        out.append(escape(text[pos:e["start"]]))
        tag = _NER_TAG.get(e["type"], e["type"])
        out.append(_tag(tag, escape(text[e["start"]:e["end"]])))
        pos = e["end"]
    out.append(escape(text[pos:]))
    body = "".join(out).replace("\n", "<lb/>")
    return f"<listEntity>\n\t{body}\n</listEntity>"


_TEI_OPEN = ('<?xml version="1.0" encoding="UTF-8"?>\n'
             '<TEI xml:space="preserve" xmlns="http://www.tei-c.org/ns/1.0" \n'
             'xmlns:xsi="http://www.w3.org/2001/XMLSchema-instance" \n'
             'xmlns:xlink="http://www.w3.org/1999/xlink">\n')

_APP_INFO = (
    '<encodingDesc><appInfo>'
    '<application version="0.0.1" name="grobid-medical-report" access="{access}">'
    "<desc>grobid-medical-report is a GROBID (https://github.com/kermitt2/grobid) "
    "module for extracting and structuring French medical reports into "
    "structured XML/TEI encoded documents.</desc>"
    '<ref target="https://github.com/tantikristanti/grobid-medical-report"/>'
    "</application></appInfo></encodingDesc>")

_AVAILABILITY = ("<availability><p>Copyright : "
                 "©grobid-medical-report (INRIA-Project)</p></availability>")


def _staff_mixed_content(entries: list[str]) -> str:
    """Encoded left-note staff entries -> the fixture's mixed-content
    <medic> body ("<roleName>..</roleName> : <persName>..</persName> ...")."""
    chunks: list[str] = []
    for entry in entries:
        parts = [p.split("=", 1) for p in entry.split("|")]
        chunks.append(" : ".join(_tag(k, escape(v)) for k, v in parts))
    return " ".join(chunks)


def _tei_header_xml(header: dict[str, Any], leftnote: dict[str, Any],
                    patients: list[dict[str, Any]],
                    medics: list[dict[str, Any]], n_pages: int,
                    access: str, with_listorg: bool) -> str:
    parts = [_APP_INFO.format(access=access), "<fileDesc>"]
    title = _tag("title", escape(header.get("title", "")), type="main")
    extent = _tag("extent", _tag("measure", str(n_pages), unit="pages"))
    parts.append(_tag("titleStmt", title + extent))
    parts.append(_AVAILABILITY)
    pub = ""
    if header.get("date_iso"):
        pub += _tag("date", escape(header["date_iso"]), type="issued",
                    when=header["date_iso"])
    publisher = ""
    if leftnote.get("org"):
        publisher += _tag("affiliation", escape(leftnote["org"]))
    if leftnote.get("address"):
        publisher += _tag("address", _tag("addrLine", escape(leftnote["address"])))
    if publisher:
        pub += _tag("publisher", publisher)
    parts.append(_tag("publicationStmt", pub))
    src = ""
    names = header.get("medics")
    if names is not None and len(names) > 0:
        roles = "\t".join(m.get("role", "") for m in medics)
        medic = _tag("medic", _tag("persName", escape("; ".join(list(names))))
                     + _tag("roleName", escape(roles)))
        src += _tag("listPerson", medic, type="medics")
    staff = list(leftnote.get("medics") or [])
    if with_listorg and staff:
        src += _tag("listOrg", _tag("medic", _staff_mixed_content(staff)))
    pts = []
    for p in patients:
        fields = ""
        if p.get("idtype"):
            fields += _tag("idType", escape(p["idtype"]))
        if p.get("id"):
            fields += _tag("idno", escape(p["id"]))
        if p.get("persname"):
            fields += _tag("persName", escape(p["persname"]))
        if p.get("birthdate"):
            fields += _tag("birth", escape(p["birthdate"]), when=p["birthdate"])
        if p.get("age"):
            fields += _tag("age", escape(p["age"]))
        if p.get("address"):
            fields += _tag("address", escape(p["address"]))
        pts.append(_tag("patient", fields))
    if pts:
        src += _tag("listPerson", "".join(pts), type="patients")
    parts.append(_tag("sourceDesc", src))
    parts.append("</fileDesc>")
    return _tag("teiHeader", "".join(parts), **{"xml:lang": "fr"})


def render_tei_header_doc(header: dict[str, Any], leftnote: dict[str, Any],
                          patients: list[dict[str, Any]],
                          medics: list[dict[str, Any]],
                          n_pages: int = 1,
                          access: str = "1970-01-01T00:00+0000") -> str:
    """Complete header TEI document, shaped exactly like the reference's
    processHeaderFromPDF.xml (TEIFormatter.toTEIHeader:115-300); compared
    whitespace-normalized with the access timestamp factored out."""
    return (_TEI_OPEN
            + _tei_header_xml(header, leftnote, patients, medics, n_pages,
                              access, with_listorg=False)
            + "\n</TEI>")


def render_tei_fulltext_doc(doc: dict[str, Any], n_pages: int = 1,
                            access: str = "1970-01-01T00:00+0000") -> str:
    """Complete full-text TEI document shaped like processFullMedicalText.xml
    (FullMedicalTextParser.toTEI:5867-5922): teiHeader (with the letterhead
    listOrg between the medics and patients lists) followed directly by
    <body> built from the ordered span sequence."""
    hdr = _tei_header_xml(doc.get("header") or {}, doc.get("leftnote") or {},
                          doc.get("patients") or [], doc.get("medics") or [],
                          n_pages, access, with_listorg=True)
    return _TEI_OPEN + hdr + render_tei_body(doc.get("spans") or []) + "\n</TEI>"


def render_tei_leftnote_doc(leftnote: dict[str, Any], n_pages: int = 1,
                            access: str = "1970-01-01T00:00+0000") -> str:
    """Complete left-note TEI document, shaped like
    processLeftNoteFromPDF.xml.xml (TEIFormatter.toTEILeftNote:301-392)."""
    parts = [_APP_INFO.format(access=access), "<fileDesc>"]
    extent = _tag("extent", _tag("measure", str(n_pages), unit="pages"))
    parts.append(_tag("titleStmt", extent))
    parts.append(_AVAILABILITY)
    medic_entries = list(leftnote.get("medics") or [])
    listorg = _tag("listOrg", _tag("medic", _staff_mixed_content(medic_entries)))
    parts.append(_tag("sourceDesc", listorg))
    parts.append("</fileDesc>")
    return (_TEI_OPEN
            + _tag("note", "".join(parts), place="left",
                   type="hospital-structure", **{"xml:lang": "fr"})
            + "\n</TEI>")


def render_tei(doc: dict[str, Any]) -> str:
    """Full TEI document string for one extracted doc."""
    hdr = render_tei_header(doc.get("header") or {}, doc.get("leftnote"),
                            doc.get("patients"))
    body = render_tei_body(doc.get("spans") or [])
    return ('<?xml version="1.0" encoding="UTF-8"?>'
            '<TEI xml:space="preserve" xmlns="http://www.tei-c.org/ns/1.0">'
            + hdr + _tag("text", body) + "</TEI>")
