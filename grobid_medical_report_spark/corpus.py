"""Deterministic synthetic corpus of interleaved text+media medical reports.

This module plays the role of the reference's golden-fixture corpus
(`/root/reference/resources/test/Example.pdf` + expected TEI outputs,
see SURVEY.md §5): a *generator* that emits, for each ``doc_id``, both

* the **input** row ``(doc_id, spans array<struct<kind,text,media_ref,offset>>)``
  (the authoritative input shape from BASELINE.json ``input_hint``), and
* the **expected** extraction results (golden oracle): zone ranges, the final
  ``(kind, text, media_ref, order)`` span sequence, header/left-note fields,
  sub-entities and NER entities — the per-row invariant the engine must match.

Generation is a pure function of ``(SEED, doc index)`` — no I/O, no global
state — so it can run distributed inside ``mapInPandas`` at any scale and
always produce the same corpus (FIXTURES.md §1 "generation pure function of
(seed, doc_id)").

Document shape mirrors the reference fixture ``processFullMedicalText.xml``:
headnote, header block (doc number / doctype / dateline / medics / patients),
left-note letterhead block, body with sections / subsections / paragraphs /
items / figure+table captions adjacent to media spans / inline medic mentions,
footnote + page-number lines, optional annex & acknowledgement tail.

The extractor (operators/*) never reads the ``expected_*`` fields — it works
from the input span text alone, exactly as the reference's CRF features do.
"""

from __future__ import annotations

import random
import re
from typing import Any, Iterator

from .functions import lexicon as lex
from .functions.dates import parse_date_iso
from .functions.textnorm import dehyphenize_join, normalize_space

SEED = 42

#: fine-grained truth label -> coarse segmentation zone (SURVEY.md §2.4 C2/C3)
ZONE_OF = {
    "headnote": "headnote", "footnote": "footnote", "page": "page",
    "header": "header", "leftnote": "leftnote",
    "acknowledgement": "acknowledgement", "annex": "annex",
    "section": "body", "subsection": "body", "paragraph": "body",
    "item": "body", "medic": "body", "figure": "body", "table": "body",
    "media_figure": "body", "media_table": "body",
}

#: output kinds whose contiguous runs merge into one span (cluster semantics,
#: reference TaggingTokenClusteror — SURVEY.md C2); all other kinds are
#: one-span-per-line elements (<item>, <medic>, headings, ...).
MERGE_KINDS = {"header", "leftnote", "paragraph", "acknowledgement", "annex"}

_SIZE_BUCKETS = [("small", 0.60), ("medium", 0.35), ("giant", 0.05)]


def doc_id_str(i: int) -> str:
    return f"doc_{i:06d}"


# --------------------------------------------------------------------------
# sentence/paragraph construction with tracked NER entities
# --------------------------------------------------------------------------

class _Para:
    """Builds one paragraph string while recording entity offsets."""

    def __init__(self) -> None:
        self.text = ""
        self.entities: list[dict[str, Any]] = []

    def lit(self, s: str) -> "_Para":
        self.text += s
        return self

    def ent(self, etype: str, surface: str) -> "_Para":
        self.entities.append(
            {"type": etype, "text": surface,
             "start": len(self.text), "end": len(self.text) + len(surface)}
        )
        self.text += surface
        return self


def _sentence(rng: random.Random, p: _Para) -> None:
    """Append one French medical sentence with NER entities to ``p``."""
    t = rng.randrange(8)
    if t == 0:
        role = rng.choice(["Patient", "Patiente"])
        p.ent("rolename", role).lit(" ayant présenté une ")
        p.ent("pathology", rng.choice(lex.PATHOLOGY)).lit(" du ")
        p.ent("anatomy", rng.choice(lex.ANATOMY)).lit(" traitée par ")
        med = rng.choice(lex.MEDICAMENT)
        dose = f"{rng.choice([150, 500, 600, 1000, 1500])} mg"
        p.ent("medicament", f"{med} {dose}").lit(".")
    elif t == 1:
        proc = rng.choice(lex.PROCEDURE)
        p.ent("procedure", proc[:1].upper() + proc[1:]).lit(" le ")
        p.ent("date", _rand_date(rng)).lit(" devant la mauvaise évolution locale.")
    elif t == 2:
        p.lit("Poursuite de l'")
        p.ent("procedure", "antibiothérapie adaptée").lit(" par ")
        p.ent("medicament", rng.choice(lex.MEDICAMENT)).lit(" jusqu'au ")
        p.ent("date", _rand_date(rng)).lit(".")
    elif t == 3:
        title = rng.choice(lex.CIVILITIES)
        name = f"{title} {rng.choice(lex.FIRST_NAMES)} {rng.choice(lex.FIRST_NAMES)} {rng.choice(lex.LAST_NAMES)}"
        p.ent("persname", name).lit(", ")
        p.ent("perstype", rng.choice(lex.PERSTYPE)).lit(", âgée de ")
        p.ent("value", str(rng.randrange(18, 95))).lit(" ")
        p.ent("unit", "ans").lit(", née le ")
        p.ent("date", _rand_date(rng)).lit(".")
    elif t == 4:
        # "Échographie du <date>" is NOT tagged by the reference model
        # (processFrenchMedicalNERFromPDF.xml) — mirror in the golden corpus
        p.lit("Échographie du ")
        p.ent("date", f"{rng.randrange(1, 29):02d}/{rng.randrange(1, 13):02d}").lit(" (")
        p.ent("persname", f"Dr {rng.choice(lex.LAST_NAMES).title()}").lit(") : ")
        p.ent("procedure", "diagnostic").lit(" de ")
        p.ent("physiology", rng.choice(lex.PHYSIOLOGY)).lit(" à ")
        p.ent("value", str(rng.randrange(2, 40))).lit(" ")
        p.ent("unit", "SA").lit(".")
    elif t == 5:
        sym = rng.choice(lex.SYMPTOM)
        p.ent("symptom", sym[:1].upper() + sym[1:]).lit(
            " intermittentes en regard du point de ponction.")
    elif t == 6:
        role = rng.choice(["Patiente", "Patient"])
        p.ent("rolename", role).lit(" adressée aux ")
        p.ent("location", "urgences").lit(" pour surveillance clinique.")
    else:
        p.lit("Vérification de l'absence de vaisseaux avec documentation sur ")
        p.ent("substance", rng.choice(lex.SUBSTANCE)).lit(" en regard du site.")


def _rand_date(rng: random.Random) -> str:
    return f"{rng.randrange(1, 29):02d}/{rng.randrange(1, 13):02d}/{rng.randrange(1985, 2023)}"


def _split_lines(rng: random.Random, text: str) -> list[str]:
    """Split a paragraph into layout lines (the input spans), occasionally
    hyphenating a word across lines — exactly invertible by
    :func:`...textnorm.dehyphenize_join` (reference X4 semantics)."""
    words = text.split(" ")
    lines: list[str] = []
    cur: list[str] = []
    budget = rng.randrange(48, 80)
    for w in words:
        cur.append(w)
        if sum(len(x) + 1 for x in cur) >= budget:
            lines.append(" ".join(cur))
            cur = []
            budget = rng.randrange(48, 80)
    if cur:
        lines.append(" ".join(cur))
    # hyphen-split: move a lowercase tail of the last word to the next line
    if len(lines) >= 2 and rng.random() < 0.35:
        k = rng.randrange(len(lines) - 1)
        lw = lines[k].split(" ")
        w = lw[-1]
        if len(w) >= 7 and w.isalpha() and w[3:].islower() and "-" not in w:
            cut = 3
            lw[-1] = w[:cut] + "-"
            lines[k] = " ".join(lw)
            lines[k + 1] = w[cut:] + " " + lines[k + 1]
    return lines


# --------------------------------------------------------------------------
# whole-document generation
# --------------------------------------------------------------------------

#: layout style constants (SURVEY §1.1 LayoutToken attrs). Body prose sits at
#: x=BODY_X; items indent by ITEM_INDENT; the doctype/title renders at
#: body+TITLE_DSIZE pt, section headings at +SECTION_DSIZE, subsections at
#: +SUBSECTION_DSIZE — the font-delta signals the reference's featurizers
#: consume (FeaturesVectorMedical.java:56-226 font/size/bold features).
BODY_X = 72.0
LEFTNOTE_X = 40.0
HEADER_X = 320.0
PAGE_X = 510.0
ITEM_INDENT = 28.0
TITLE_DSIZE = 4.0
SECTION_DSIZE = 2.0
SUBSECTION_DSIZE = 1.0
LINE_DY = 14.0
TOP_Y = 72.0

#: probability that a layout-mode heading/item/doctype drops its textual
#: marker (colon / dash / all-caps) and is recognizable ONLY by its layout
#: attributes — the phenomena that make the layout features load-bearing
P_LAYOUT_ONLY = 0.35


#: dosage shape for the derived bold typesetting runs (layout mode)
_RE_DOSE = re.compile(r"\b\d+ mg\b")


def _derive_style_runs(label: str, text: str, bf: int,
                       bt: int) -> list[tuple[int, int, str]]:
    """ARBITRARY per-token style runs for a layout-mode line (r5, closes
    SURVEY §2 F1): the document's typesetting conventions render drug names
    in ITALIC and dosages in BOLD in body text, on top of the explicit bold
    run (signing medic) the generator may have placed. Everything here is
    DERIVED from the already-drawn text — no RNG — so the text corpus stays
    byte-stable; only layout metadata widens. One line can carry several
    runs of mixed styles ('Paracétamol 500 mg' = italic + bold), which is
    exactly the reference's LayoutToken granularity (per-token bold/italic,
    MedicalReportSegmenterParser.java:392-558) that a single bold_from/
    bold_to pair cannot represent."""
    runs: list[tuple[int, int, str]] = []
    if bf >= 0:
        runs.append((bf, bt, "bold"))
    if label in ("paragraph", "item"):
        for m in _RE_DOSE.finditer(text):
            runs.append((m.start(), m.end(), "bold"))
        for term in lex.MEDICAMENT:
            start = 0
            while True:
                k = text.find(term, start)
                if k < 0:
                    break
                end = k + len(term)
                if ((k == 0 or not text[k - 1].isalnum())
                        and (end >= len(text) or not text[end].isalnum())):
                    runs.append((k, end, "italic"))
                start = k + 1
    runs.sort()
    return runs


def _pair_prescriptions(runs: list[tuple[int, int, str]],
                        text: str) -> list[tuple[str, str]]:
    """Golden truth for the style-run decision: pair every ITALIC drug run
    with the NEAREST BOLD dosage run in the same span (distance = |dose
    start − drug end|, ties to the earlier dose). Needs the full run list —
    a one-run-per-span schema loses every second drug and every mixed
    bold+italic line (tests/test_layout.py pins both)."""
    doses = [(b0, b1) for b0, b1, st in runs
             if st == "bold" and _RE_DOSE.fullmatch(text[b0:b1])]
    out = []
    for i0, i1, st in runs:
        if st != "italic" or not doses:
            continue
        b0, b1 = min(doses, key=lambda d: (abs(d[0] - i1), d[0], d[1]))
        out.append((text[i0:i1], text[b0:b1]))
    return out


def generate_doc(i: int, layout: bool = False) -> dict[str, Any]:
    """Pure deterministic generator: index -> input + golden expected outputs.

    ``layout=False`` (default) is the authoritative text-only corpus from
    BASELINE.json's input_hint — byte-stable across rounds. ``layout=True``
    generates the layout-enriched twin: every line carries
    (font, font_size, bold, italic, x, y) token attrs, and a fraction of
    headings/items/doctypes drop their textual markers so that zone and
    body-structure decisions REQUIRE the layout signals (title by
    largest-font, heading by bold+font-delta, item by indentation)."""
    rng = random.Random((SEED << 32) ^ i)
    doc_id = doc_id_str(i)

    r = rng.random()
    bucket = "small" if r < 0.60 else ("medium" if r < 0.95 else "giant")
    n_pages = {"small": rng.randrange(1, 3),
               "medium": rng.randrange(3, 7),
               "giant": rng.randrange(8, 25)}[bucket]
    paras_per_page = {"small": (1, 3), "medium": (2, 5), "giant": (8, 30)}[bucket]

    city = rng.choice(lex.CITIES)
    spec = rng.choice(lex.SPECIALTIES)
    headnote = f"CHU {city} - Service de {spec.title()}"
    footnote = (f"CHU {city} - {rng.randrange(1, 99)}, "
                f"{rng.choice(lex.STREETS)} - {rng.randrange(10, 96) * 1000:05d} {city}")

    # truth-labeled line stream: (label, text, media_ref, para_seq)
    lines: list[tuple[str, str, str, int]] = []
    #: per-line FIELD truth for the header/left-note zone models (the
    #: reference's header-medical-report / left-note-medical-report labels);
    #: "" for lines outside those zones
    line_fields: list[str] = []
    #: parallel per-line style tuples (font, size, bold, italic, x,
    #: bold_from, bold_to) — layout mode only; y is assigned in a post-pass
    #: (resets at page breaks). bold_from/bold_to carry a TOKEN-LEVEL bold
    #: run inside the line (char range, -1/-1 = none) — the SURVEY §1.1
    #: LayoutToken per-token style granularity (r4, VERDICT item 5)
    styles: list[tuple[str, float, bool, bool, float, int, int]] = []
    #: truth: bold inline medic names (layout mode; the one decision that
    #: NEEDS per-token styles — a plain 'Validé par Docteur X' line is
    #: textually identical)
    bold_medics: list[str] = []
    para_texts: list[str] = []                      # per generated paragraph
    para_entities: list[list[dict[str, Any]]] = []  # offsets into para text
    para_sentences: list[list[tuple[int, int]]] = []  # sentence char ranges
    para_markers: list[list[dict[str, Any]]] = []   # figure/table callouts
    media_kinds: list[str] = []                     # kind per media index (1-based)
    media_count = 0

    body_font = rng.choice(["Times", "Garamond", "Helvetica"]) if layout else ""
    body_size = float(rng.choice([10, 11])) if layout else 0.0

    #: default per-label style: (dsize, bold, italic, x)
    _LABEL_STYLE = {
        "headnote": (-2.0, False, True, BODY_X),
        "footnote": (-2.0, False, True, BODY_X),
        "page": (-2.0, False, False, PAGE_X),
        "header": (0.0, False, False, HEADER_X),
        "leftnote": (-1.0, False, False, LEFTNOTE_X),
        "section": (SECTION_DSIZE, True, False, BODY_X),
        "subsection": (SUBSECTION_DSIZE, True, False, BODY_X),
        "figure": (-1.0, False, True, BODY_X + 48.0),
        "table": (-1.0, False, True, BODY_X + 48.0),
        "item": (0.0, False, False, BODY_X + ITEM_INDENT),
        "annex": (0.0, False, False, BODY_X),
    }

    def emit_section() -> None:
        sec = rng.choice(lex.SECTIONS)
        if layout and rng.random() < P_LAYOUT_ONLY:
            # no colon, no all-caps: bold + font-delta is the only cue
            emit("section", sec.title())
        else:
            emit("section", f"{sec} :")

    def emit_subsection() -> None:
        sub = rng.choice(lex.SUBSECTIONS)
        if layout and rng.random() < P_LAYOUT_ONLY:
            emit("subsection", sub)
        else:
            emit("subsection", f"{sub} :")

    def emit(label: str, text: str, ref: str = "", pseq: int = -1,
             dsize: float | None = None, bold: bool | None = None,
             x: float | None = None, field: str = "",
             bold_run: tuple[int, int] | None = None) -> None:
        lines.append((label, text, ref, pseq))
        line_fields.append(field)
        if layout:
            d, b, it, xx = _LABEL_STYLE.get(label, (0.0, False, False, BODY_X))
            bf, bt = bold_run if bold_run else (-1, -1)
            styles.append((body_font,
                           body_size + (d if dsize is None else dsize),
                           b if bold is None else bold, it,
                           xx if x is None else x, bf, bt))

    # ---- page 1 front matter -------------------------------------------
    emit("headnote", headnote)

    header: dict[str, Any] = {k: "" for k in (
        "docnum", "doctype", "title", "date_iso", "time", "dateline",
        "affiliation", "address", "org", "email", "phone", "fax", "web", "note")}
    header["medics"], header["patients"] = [], []
    medics_fix: list[dict[str, Any]] = []
    patients_fix: list[dict[str, Any]] = []
    datelines_fix: list[dict[str, Any]] = []
    person_names: list[dict[str, Any]] = []

    docnum = str(rng.randrange(10**8, 10**9))
    emit("header", f"N° {docnum}", field="docnum")
    header["docnum"] = docnum

    doctype = rng.choice(lex.DOCTYPES)
    if layout and rng.random() < P_LAYOUT_ONLY:
        # title-case doctype: largest-font-in-header is the only title cue
        # (reference A5 font statistics, HeaderMedicalParser.java:434-467)
        doctype = doctype.capitalize()
    emit("header", doctype, dsize=TITLE_DSIZE, bold=True,
         field="doctype")
    header["doctype"] = doctype
    header["title"] = doctype

    issued = _rand_date(rng)
    dl_time = f"{rng.randrange(8, 19)}h{rng.randrange(0, 60):02d}" if rng.random() < 0.3 else ""
    dateline = f"{city}, le {issued}" + (f", à {dl_time}" if dl_time else "")
    emit("header", dateline, field="dateline")
    header["dateline"] = dateline
    header["date_iso"] = parse_date_iso(issued) or ""
    header["time"] = dl_time
    datelines_fix.append({"idx": 0, "doctype": "", "placename": city,
                          "date": issued, "time": dl_time, "note": ""})

    for midx in range(rng.randrange(1, 4)):
        fn, ln = rng.choice(lex.FIRST_NAMES), rng.choice(lex.LAST_NAMES)
        role = rng.choice(lex.ROLES)
        pers = f"Dr {fn} {ln}"
        emit("header", f"{pers}, {role}", field="medic")
        header["medics"].append(pers)
        medics_fix.append({"idx": midx, "idno": "", "role": role, "persname": pers,
                           "affiliation": "", "organisation": "", "institution": "",
                           "address": "", "country": "", "town": "", "email": "",
                           "phone": "", "fax": "", "web": "", "note": ""})
        person_names.append({"idx": len(person_names), "title": "Dr", "forename": fn,
                             "middlename": "", "surname": ln, "suffix": ""})

    ipp = str(rng.randrange(10**8, 10**9))
    emit("header", f"IPP : {ipp}", field="idno")
    # explicit sex line (PatientParser <sex>, r4)
    psex = rng.choice(["F", "M"]) if rng.random() < 0.6 else ""
    if psex:
        emit("header", f"Sexe : {psex}", field="sex")
    ptitle = rng.choice(lex.CIVILITIES)
    pf, pm, pl = (rng.choice(lex.FIRST_NAMES), rng.choice(lex.FIRST_NAMES),
                  rng.choice(lex.LAST_NAMES))
    ppers = f"{ptitle} {pf} {pm} {pl}"
    birth = _rand_date(rng)
    age = f"{rng.randrange(1, 99)} ans"
    # MIXED patient line (~35% of docs): name + birthdate (+ birthplace,
    # death date, phone, email, guardianship note) + address in ONE line —
    # the shape real documents have and the reason the reference runs a
    # dedicated token-level CRF over the patient block
    # (PatientParser.java:58-222, FeaturesVectorPatient.java:164-427).
    # Since r4 the optional parts exercise the FULL PatientParser label
    # set (writeField :473-514). A line-granularity field model cannot
    # split any of this.
    pbplace = pdeath = ptown = pcountry = pphone = pemail = pnote = ""
    if rng.random() < 0.35:
        if rng.random() < 0.30:
            pbplace = rng.choice(lex.CITIES)
        if rng.random() < 0.15:
            pdeath = _rand_date(rng)
        if rng.random() < 0.70:      # demeurant : full postal address
            paddr_val = (f"{rng.randrange(1, 999)}, "
                         f"{rng.choice(lex.STREETS)} ")
            if rng.random() < 0.40:  # fixture shape: pc + city inline
                paddr_val += f"{rng.randrange(10, 96) * 1000:05d} "
            paddr_val += rng.choice(lex.CITIES)
            dem = f"demeurant : {paddr_val}"
        else:                        # demeurant à CITY -> <settlement>
            paddr_val = ""
            ptown = rng.choice(lex.CITIES)
            dem = f"demeurant à {ptown}"
        if rng.random() < 0.25:
            pcountry = "France"
        if rng.random() < 0.30:
            pphone = (f"0{rng.randrange(6, 8)} {rng.randrange(10, 100)} "
                      f"{rng.randrange(10, 100)} {rng.randrange(10, 100)} "
                      f"{rng.randrange(10, 100)}")
        if rng.random() < 0.20:
            pemail = f"{pf.lower()}.{pl.lower()}@exemple.fr"
        if rng.random() < 0.12:
            pnote = "(sous tutelle)"
        line = f"{ppers}, né(e) le {birth}"
        if pbplace:
            line += f" à {pbplace}"
        if pdeath:
            line += f", décédé(e) le {pdeath}"
        line += f", {dem}"
        if pcountry:
            line += ", France"
        if pphone:
            line += f", Tél : {pphone}"
        if pemail:
            line += f", courriel : {pemail}"
        if pnote:
            line += f" {pnote}"
        emit("header", line, field="patient")
        emit("header", age, field="age")
    else:
        paddr_val = (f"{rng.randrange(1, 999)}, {rng.choice(lex.STREETS)} "
                     f"{rng.choice(lex.CITIES)}")
        emit("header", ppers, field="patient")
        emit("header", f"Né(e) le {birth}", field="birthdate")
        emit("header", age, field="age")
        emit("header", f"Demeurant : {paddr_val}", field="patient_address")
    header["patients"].append(ppers)
    patients_fix.append({"idx": 0, "id": ipp, "idtype": "IPP", "persname": ppers,
                         "sex": psex, "birthdate": birth, "age": age,
                         "birthplace": pbplace, "deathdate": pdeath,
                         "address": paddr_val,
                         "country": pcountry, "town": ptown, "phone": pphone,
                         "email": pemail, "note": pnote})
    person_names.append({"idx": len(person_names), "title": ptitle, "forename": pf,
                         "middlename": pm, "surname": pl, "suffix": ""})

    # ---- left-note letterhead -------------------------------------------
    # Since r4 the letterhead exercises the FULL OrganizationParser /
    # AddressParser label vocabularies (VERDICT r3 item 1): an institution
    # stack above pole/service (chu/ghu/hospital/dmu/university/institut/
    # center/site/unit/department/association, some with inline
    # settlement / country / street address), building/BP/district/
    # commune/department address lines, and mixed contact / web / email
    # lines — all decomposed by the fitted org / address token taggers.
    city_t = city.title()
    org_fields: list[dict[str, str]] = []
    front: list[tuple[str, str]] = []
    if rng.random() < 0.70:
        t = f"CHU de {city_t}"
        front.append((t, "org"))
        org_fields.append({"field": "chu", "value": t})
    if rng.random() < 0.12:
        t = f"GHU {city_t}"
        front.append((t, "org"))
        org_fields.append({"field": "ghu", "value": t})
    if rng.random() < 0.35:
        hosp = f"Hôpital {rng.choice(lex.HOSPITAL_NAMES)}"
        if rng.random() < 0.35:      # inline settlement after comma
            front.append((f"{hosp}, {city_t}", "org"))
            org_fields.append({"field": "hospital", "value": hosp})
            org_fields.append({"field": "settlement", "value": city_t})
        else:
            front.append((hosp, "org"))
            org_fields.append({"field": "hospital", "value": hosp})
    if rng.random() < 0.12:
        t = f"DMU {rng.choice(lex.DMU_NAMES)}"
        front.append((t, "org"))
        org_fields.append({"field": "dmu", "value": t})
    if rng.random() < 0.15:
        univ = f"Université de {city_t}"
        if rng.random() < 0.30:
            front.append((f"{univ}, France", "org"))
            org_fields.append({"field": "university", "value": univ})
            org_fields.append({"field": "country", "value": "France"})
        else:
            front.append((univ, "org"))
            org_fields.append({"field": "university", "value": univ})
    if rng.random() < 0.12:
        t = f"Institut {rng.choice(lex.INSTITUTE_NAMES)}"
        front.append((t, "org"))
        org_fields.append({"field": "institution", "value": t})
    if rng.random() < 0.12:
        t = f"Centre de Référence {rng.choice(lex.CENTER_NAMES)}"
        front.append((t, "org"))
        org_fields.append({"field": "center", "value": t})
    if rng.random() < 0.12:
        site = f"Site {rng.choice(lex.SITE_NAMES)}"
        if rng.random() < 0.30:      # inline street address
            saddr = f"{rng.randrange(1, 99)}, {rng.choice(lex.STREETS)}"
            front.append((f"{site}, {saddr}", "org"))
            org_fields.append({"field": "site", "value": site})
            org_fields.append({"field": "address", "value": saddr})
        else:
            front.append((site, "org"))
            org_fields.append({"field": "site", "value": site})
    if rng.random() < 0.12:
        t = f"Unité de {rng.choice(lex.UNIT_NAMES)}"
        front.append((t, "org"))
        org_fields.append({"field": "unit", "value": t})
    if rng.random() < 0.12:
        t = f"Département {rng.choice(lex.ORG_DEPT_NAMES)}"
        front.append((t, "org"))
        org_fields.append({"field": "department", "value": t})
    if rng.random() < 0.08:
        t = f"Association {rng.choice(lex.ASSOCIATION_NAMES)}"
        front.append((t, "org"))
        org_fields.append({"field": "organization", "value": t})

    pole = f"Pôle {rng.choice(['Femmes - Mères - Enfants', 'Urgences', 'Chirurgie', 'Imagerie'])}"
    service = f"SERVICE DE {spec}"
    ln_street = f"{rng.randrange(1, 99)}, {rng.choice(lex.STREETS)}"
    ln_pc = f"{rng.randrange(10, 96) * 1000:05d} {city} Cedex"
    ln_tel = (f"Tél : 01 {rng.randrange(10, 100)} {rng.randrange(10, 100)} "
              f"{rng.randrange(10, 100)} {rng.randrange(10, 100)}")
    ln_fax = (f"Fax : 01 {rng.randrange(10, 100)} {rng.randrange(10, 100)} "
              f"{rng.randrange(10, 100)} {rng.randrange(10, 100)}")
    # MIXED letterhead shapes (~35% each): the org hierarchy on one line
    # ("Pôle X - SERVICE DE Y") and the full postal address on one line
    # ("17, Avenue ..., 22000 CITY Cedex[, France]") — decomposing them
    # requires the fitted organization / address token taggers (the
    # reference's OrganizationParser.java:58-… / AddressParser.java:57-…);
    # in particular the settlement must be recovered from INSIDE the
    # combined address line.
    mixed_org = rng.random() < 0.35
    mixed_addr = rng.random() < 0.35
    if mixed_org:
        front.append((f"{pole} - {service}", "org"))
    else:
        front.extend(((pole, "org"), (service, "org")))
    org_fields.append({"field": "pole", "value": pole})
    org_fields.append({"field": "service", "value": service})

    address_fields: list[dict[str, str]] = []
    addr_front: list[tuple[str, str]] = []
    if rng.random() < 0.25:          # building line (+ optional note)
        if rng.random() < 0.5:
            bnum = rng.choice(lex.BUILDING_NUMBERS)
            t = f"Bâtiment {bnum}"
            address_fields.append({"field": "buildingnumber", "value": bnum})
        else:
            bname = rng.choice(lex.BUILDING_NAMES)
            t = f"Immeuble {bname}"
            address_fields.append({"field": "buildingname", "value": bname})
        if rng.random() < 0.35:
            t += " (2ème étage)"
            address_fields.append({"field": "note", "value": "(2ème étage)"})
        addr_front.append((t, "address_more"))
    _st_num, _st_name = ln_street.split(", ", 1)
    addr_country = ""
    if mixed_addr:
        combined = f"{ln_street}, {ln_pc}"
        if rng.random() < 0.25:
            combined += ", France"
            addr_country = "France"
        addr_front.append((combined, "address_street"))
    else:
        addr_front.append((ln_street, "address_street"))
        if rng.random() < 0.20:      # post-office box between street and pc
            bp = str(rng.randrange(100, 1000))
            addr_front.append((f"BP {bp}", "address_more"))
            address_fields.append({"field": "pobox", "value": bp})
        addr_front.append((ln_pc, "address_pc"))
    address_fields.append({"field": "streetnumber", "value": _st_num})
    address_fields.append({"field": "streetname", "value": _st_name})
    address_fields.append({"field": "postcode", "value": ln_pc.split(" ", 1)[0]})
    address_fields.append({"field": "city", "value": ln_pc.split(" ", 1)[1]})
    if addr_country:
        address_fields.append({"field": "country", "value": addr_country})
    if rng.random() < 0.15:
        dist = rng.choice(lex.DISTRICTS)
        addr_front.append((f"Quartier {dist}", "address_more"))
        address_fields.append({"field": "district", "value": dist})
    if rng.random() < 0.12:
        com = rng.choice(lex.COMMUNES)
        addr_front.append((f"Commune de {com}", "address_more"))
        address_fields.append({"field": "community", "value": com})
    if rng.random() < 0.20:
        dn, dd, dr = rng.choice(lex.DEPARTMENTS)
        addr_front.append((f"{dn} ({dd}) - {dr}", "address_more"))
        address_fields.append({"field": "departmentname", "value": dn})
        address_fields.append({"field": "departmentnumber",
                               "value": f"({dd})"})
        address_fields.append({"field": "region", "value": dr})
    front.extend(addr_front)

    ln_note = ""
    if rng.random() < 0.30:          # mixed contact line -> org tagger
        contact = f"{ln_tel} - {ln_fax}"
        if rng.random() < 0.25:
            contact += " (standard)"
            ln_note = "(standard)"
        front.append((contact, "contact"))
    else:
        front.extend(((ln_tel, "phone"), (ln_fax, "fax")))
    ln_web = ln_email = ""
    _slug = city.lower().replace(" ", "-")
    if rng.random() < 0.25:
        ln_web = f"www.chu-{_slug}.fr"
        front.append((ln_web, "web"))
    if rng.random() < 0.20:
        ln_email = f"secretariat@chu-{_slug}.fr"
        front.append((ln_email, "email"))
    for t, fld in front:
        emit("leftnote", t, field=fld)
    leftnote = {
        "idno": "",
        "org": " ".join(t for t, fld in front if fld == "org"),
        "address": " ".join(t for t, fld in front
                            if fld.startswith("address")),
        "country": "France",
        "settlement": city, "phone": ln_tel.split(": ", 1)[1],
        "fax": ln_fax.split(": ", 1)[1], "email": ln_email, "web": ln_web,
        "medics": [], "note": ln_note,
    }

    # ---- body pages -------------------------------------------------------
    for page in range(1, n_pages + 1):
        if page > 1:
            emit("headnote", headnote)
        n_paras = rng.randrange(*paras_per_page)
        emit_section()
        for _ in range(n_paras):
            roll = rng.random()
            if roll < 0.12:
                emit_subsection()
            elif roll < 0.20 and page == n_pages:
                emit_section()
            p = _Para()
            sent_spans: list[tuple[int, int]] = []
            for _ in range(rng.randrange(1, 4)):
                if p.text:
                    p.lit(" ")
                s0 = len(p.text)
                _sentence(rng, p)
                sent_spans.append((s0, len(p.text)))
            markers: list[dict[str, Any]] = []
            if media_count >= 1 and rng.random() < 0.3:
                # figure/table callout marker (reference J4/T7: markers
                # resolved against figure/table objects)
                k = rng.randrange(1, media_count + 1)
                # lowercase callout: "cf. Figure" would read as a sentence
                # boundary (period + uppercase) to any segmenter
                word = "figure" if media_kinds[k - 1] == "figure" else "tableau"
                m0 = len(p.text) + 1
                p.lit(f" (cf. {word} {k})")
                markers.append({"start": m0, "end": len(p.text),
                                "marker_kind": media_kinds[k - 1],
                                "target": f"img_{doc_id}_{k}"})
                sent_spans[-1] = (sent_spans[-1][0], len(p.text))
            pseq = len(para_texts)
            para_texts.append(p.text)
            para_entities.append(p.entities)
            para_sentences.append(sent_spans)
            para_markers.append(markers)
            for text_line in _split_lines(rng, p.text):
                emit("paragraph", text_line, pseq=pseq)
            if layout and rng.random() < 0.22:
                # inline signature line: 'Validé par Docteur X Y.' — the
                # name is BOLD in ~60% of cases (a per-token style run
                # inside the span). Only the bold ones are signing medics;
                # the plain variant is a textually-identical distractor,
                # so the decision REQUIRES token-level layout attrs
                # (reference LayoutToken per-token styles,
                # MedicalReportSegmenterParser.java:392-558)
                sig_name = (f"Docteur {rng.choice(lex.FIRST_NAMES)} "
                            f"{rng.choice(lex.LAST_NAMES)}")
                sig_line = f"Validé par {sig_name}."
                if rng.random() < 0.6:
                    run = (len("Validé par "),
                           len("Validé par ") + len(sig_name))
                    emit("paragraph", sig_line, bold_run=run)
                    bold_medics.append(sig_name)
                else:
                    emit("paragraph", sig_line)
            extra = rng.random()
            if extra < 0.15:
                # a bare item list drops the dash marker: indentation (x)
                # is the only list cue — layout-mode-only phenomenon
                bare = layout and rng.random() < P_LAYOUT_ONLY
                for _ in range(rng.randrange(2, 5)):
                    t = (f"{rng.choice(lex.MEDICAMENT)} "
                         f"{rng.choice([150, 250, 500, 1000])} mg")
                    emit("item", t if bare else f"- {t}")
            elif extra < 0.25:
                media_count += 1
                ref = f"img_{doc_id}_{media_count}"
                kind = rng.choice(["figure", "table"])
                media_kinds.append(kind)
                emit(f"media_{kind}", "", ref)
                word = "Figure" if kind == "figure" else "Tableau"
                cap = rng.choice(["coupe échographique", "bilan biologique",
                                  "cliché thoracique", "évolution de la CRP"])
                emit(kind, f"{word} {media_count} : {cap}", ref)
            elif extra < 0.32:
                emit("medic", f"Docteur {rng.choice(lex.FIRST_NAMES)} "
                              f"{rng.choice(lex.LAST_NAMES)}")
        if page == n_pages:
            if rng.random() < 0.25:
                emit("acknowledgement",
                     "Remerciements : à l'équipe soignante du service.")
            if rng.random() < 0.25:
                emit("annex", "ANNEXE :")
                for _ in range(rng.randrange(1, 3)):
                    emit("annex",
                         f"Résultats complémentaires transmis le {_rand_date(rng)}.")
        emit("footnote", footnote)
        emit("page", f"{page}/{n_pages}")

    # ---- input spans -------------------------------------------------------
    ys: list[float] = []
    if layout:
        y = TOP_Y
        for lab, _t, _r, _p in lines:
            ys.append(y)
            y += LINE_DY
            if lab == "page":      # page-number line closes the page
                y = TOP_Y
    spans = []
    prescriptions: list[tuple[int, str, str]] = []
    for off, (label, text, ref, _pseq) in enumerate(lines):
        is_media = label.startswith("media_")
        sp = {"kind": "media" if is_media else "text",
              "text": "" if is_media else text,
              "media_ref": ref if is_media else "",
              "offset": off}
        if layout:
            f, s, b, it, xx, bf, bt = styles[off]
            runs = ([] if is_media
                    else _derive_style_runs(label, text, bf, bt))
            sp.update({"font": f, "font_size": s, "bold": b, "italic": it,
                       "x": xx, "y": ys[off], "bold_from": bf,
                       "bold_to": bt,
                       "style_runs": [{"r_from": a, "r_to": z, "style": st}
                                      for a, z, st in runs]})
            for drug, dose in _pair_prescriptions(runs, text):
                prescriptions.append((off, drug, dose))
        spans.append(sp)

    # ---- expected outputs (golden oracle) ----------------------------------
    expected_spans: list[dict[str, Any]] = []
    expected_entities: list[dict[str, Any]] = []
    expected_sentences: list[dict[str, Any]] = []
    expected_markers: list[dict[str, Any]] = []
    zones: list[dict[str, Any]] = []
    j = 0
    while j < len(lines):
        label, text, ref, pseq = lines[j]
        if label.startswith("media_"):
            # media + caption fuse into one figure/table span (reference T5:
            # doc.assignGraphicObjectsToFigures, FullMedicalTextParser:5465)
            cap_label, cap_text, cap_ref, _ = lines[j + 1]
            expected_spans.append({"kind": cap_label,
                                   "text": normalize_space(cap_text),
                                   "media_ref": ref})
            j += 2
            continue
        if label in MERGE_KINDS:
            k = j
            run: list[str] = []
            pseqs: list[int] = []
            while k < len(lines) and lines[k][0] == label:
                run.append(lines[k][1])
                if lines[k][3] >= 0 and lines[k][3] not in pseqs:
                    pseqs.append(lines[k][3])
                k += 1
            merged = dehyphenize_join(run)
            if label == "paragraph":
                # adjacent generated paragraphs fuse into one cluster; entity
                # offsets shift by the preceding paragraphs' lengths + joiner
                base = 0
                sent_idx = 0
                for ps in pseqs:
                    for e in para_entities[ps]:
                        expected_entities.append(
                            {"type": e["type"], "text": e["text"],
                             "start": e["start"] + base, "end": e["end"] + base,
                             "span_order": len(expected_spans)})
                    for s0, s1 in para_sentences[ps]:
                        expected_sentences.append(
                            {"span_order": len(expected_spans), "idx": sent_idx,
                             "start": s0 + base, "end": s1 + base})
                        sent_idx += 1
                    for mk in para_markers[ps]:
                        expected_markers.append(
                            {"span_order": len(expected_spans),
                             "start": mk["start"] + base, "end": mk["end"] + base,
                             "marker_kind": mk["marker_kind"],
                             "target": mk["target"]})
                    base += len(para_texts[ps]) + 1
            expected_spans.append({"kind": label, "text": merged, "media_ref": ""})
            j = k
            continue
        expected_spans.append({"kind": label, "text": normalize_space(text),
                               "media_ref": ""})
        j += 1
    for order, sp in enumerate(expected_spans):
        sp["order"] = order

    # coarse zone ranges via RLE over span indices (half-open)
    zlabels = [ZONE_OF[lab] for lab, _, _, _ in lines]
    start = 0
    for k in range(1, len(zlabels) + 1):
        if k == len(zlabels) or zlabels[k] != zlabels[start]:
            zones.append({"zone": zlabels[start], "start": start, "end": k,
                          "order": len(zones)})
            start = k

    return {
        "doc_id": doc_id, "bucket": bucket, "n_pages": n_pages,
        "spans": spans, "expected_spans": expected_spans, "zones": zones,
        "header": header, "leftnote": leftnote,
        "org_fields": org_fields, "address_fields": address_fields,
        "medics": medics_fix, "patients": patients_fix,
        "datelines": datelines_fix, "person_names": person_names,
        "entities": expected_entities, "sentences": expected_sentences,
        "markers": expected_markers,
        "line_labels": [lab for lab, _, _, _ in lines],
        "line_fields": line_fields,
        "line_styles": styles if layout else [],
        "bold_medics": bold_medics,
        "prescriptions": prescriptions,
    }


# --------------------------------------------------------------------------
# OCR-noise tier (r4): seeded corruption for model evaluation. The clean
# corpus (noise=0) is byte-stable and authoritative; the noisy twin exists
# so the held-out eval harness DISCRIMINATES (VERDICT r3 item 2: every
# model scored 1.0 on the perfectly regular grammar). Corruption uses its
# OWN rng stream — the clean corpus draws are untouched.
# --------------------------------------------------------------------------

#: classic OCR confusions (bidirectional subsets chosen to stay plausible)
_OCR_SUBS = {"o": "0", "O": "0", "l": "1", "I": "1", "e": "c", "a": "o",
             "n": "m", "u": "v", "t": "f", "0": "o", "1": "l", "5": "S",
             "8": "B", "2": "Z"}
_ACCENTS = {"é": "e", "è": "e", "ê": "e", "ë": "e", "à": "a", "â": "a",
            "ô": "o", "î": "i", "ï": "i", "û": "u", "ù": "u", "ç": "c",
            "É": "E", "À": "A", "Ô": "O"}


def noise_rng(i: int) -> random.Random:
    """Corruption stream for doc ``i`` — independent of the generation
    stream, so noisy twins never shift the clean corpus bytes."""
    return random.Random(((SEED ^ 0x4E4F4953) << 32) ^ i)


def corrupt_text(text: str, rng: random.Random, noise: float,
                 spacing: bool = False, subs_only: bool = False) -> str:
    """OCR-style corruption: per TOKEN, with probability ``noise``, apply
    one of accent-strip / character substitution / adjacent transpose.
    Token count (and thus token alignment with clean gold tags) is
    preserved unless ``spacing=True``, which additionally allows an
    inserted mid-token space (line-level evaluation only).

    ``subs_only=True`` restricts to the two in-place substitutions (accent
    strip, OCR char sub) — both map one char to one char of the SAME
    \\w/punct class, so every char offset AND every regex token span
    survives corruption (transpose can drag a punctuation char across a
    \\w boundary: 'né(e)' -> 'n(ée)' re-tokenizes). This is the mode that
    lets char-offset NER gold ride corrupted text (VERDICT r4 item 2);
    invariant pinned in tests/test_noise_eval.py."""
    toks = text.split(" ")
    out = []
    for tok in toks:
        if not tok or rng.random() >= noise:
            out.append(tok)
            continue
        kind = rng.randrange(2 if subs_only else (4 if spacing else 3))
        chars = list(tok)
        if kind == 0:      # accent strip (whole token)
            chars = [_ACCENTS.get(c, c) for c in chars]
        elif kind == 1:    # OCR character substitution
            idxs = [k for k, c in enumerate(chars) if c in _OCR_SUBS]
            if idxs:
                k = idxs[rng.randrange(len(idxs))]
                chars[k] = _OCR_SUBS[chars[k]]
        elif kind == 2:    # adjacent transpose inside longer tokens
            if len(chars) >= 5:
                k = rng.randrange(1, len(chars) - 2)
                chars[k], chars[k + 1] = chars[k + 1], chars[k]
        else:              # spacing damage (token-splitting; line eval only)
            if len(chars) >= 6:
                k = rng.randrange(2, len(chars) - 2)
                chars.insert(k, " ")
        out.append("".join(chars))
    return " ".join(out)


# --------------------------------------------------------------------------
# Spark-side corpus materialization (distributed; scales to any n_docs)
# --------------------------------------------------------------------------

INPUT_SCHEMA = (
    "doc_id string, "
    "spans array<struct<kind:string,text:string,media_ref:string,offset:int>>"
)

#: layout-enriched input: the same contract plus the SURVEY §1.1 LayoutToken
#: attrs on every span (superset — consumers of the 4-field shape still work)
INPUT_SCHEMA_LAYOUT = (
    "doc_id string, "
    "spans array<struct<kind:string,text:string,media_ref:string,offset:int,"
    "font:string,font_size:double,bold:boolean,italic:boolean,"
    "x:double,y:double,bold_from:int,bold_to:int,"
    "style_runs:array<struct<r_from:int,r_to:int,style:string>>>>"
)


# --------------------------------------------------------------------------
# FORMAT-SHIFT family "B" (r5, VERDICT r4 next-round item 1): a second
# document grammar for the generalization tier of the evaluation harness.
# Family B is a LABEL-AWARE post-transform of a family-A doc — the kind of
# variance between two real hospitals: reordered header/letterhead blocks,
# alternate field spellings/separators, different pagination and heading
# styles. Because every rewrite is keyed on the line's TRUE (label, field),
# the gold labels remain authoritative; the surface form the models see is
# one they never trained on. The transform draws from its own seeded
# stream, so the family-A corpus stays byte-stable. EVAL.md format-shift
# tier trains on A and scores B; tests/test_format_shift.py pins it.
# --------------------------------------------------------------------------

_SEX_WORD = {"F": "Sexe féminin", "M": "Sexe masculin"}


def _shift_line(t: str, lab: str, fld: str, counters: dict) -> str:
    """Family-B surface form of one line, given its truth (label, field)."""
    import re as _re
    if fld == "docnum" and t.startswith("N°"):
        return "Dossier n° " + t[2:].strip()
    if fld == "doctype":
        return t.capitalize()
    if fld == "dateline":
        m = _re.fullmatch(
            r"([A-ZÀ-ÖØ-Þ ]+), le (\d{1,2}/\d{1,2}/\d{2,4})"
            r"(?:, à (\d{1,2}h\d{2}))?", t)
        if m:
            out = f"Fait à {m.group(1)} le {m.group(2)}"
            if m.group(3):
                out += f" ({m.group(3)})"
            return out
    if fld == "sex":
        m = _re.fullmatch(r"Sexe ?: ?([FM])", t)
        if m:
            return _SEX_WORD[m.group(1)]
    if fld == "idno" and t.startswith("IPP"):
        return "Identifiant patient " + t.split(":", 1)[1].strip()
    if fld == "age":
        return "Âge : " + t
    if fld == "medic":
        return "Praticien : " + t
    if fld == "patient":
        return "Patient(e) : " + t
    if fld == "birthdate" and t.startswith("Né(e) le"):
        return "Date de naissance : " + t[len("Né(e) le"):].strip()
    if fld == "patient_address" and t.startswith("Demeurant"):
        return "Adresse : " + t.split(":", 1)[1].strip()
    if fld == "org":
        if t.startswith("SERVICE DE "):
            return "Service de " + t[len("SERVICE DE "):].title()
        if t.startswith("Pôle "):
            return t.upper()
        return t
    if fld == "phone" and t.startswith("Tél"):
        return "Téléphone : " + t.split(":", 1)[1].strip()
    if fld == "fax" and t.startswith("Fax"):
        return "Télécopie : " + t.split(":", 1)[1].strip()
    if fld == "contact" and t.startswith("Tél"):
        m = _re.fullmatch(r"Tél ?: (.+) - Fax ?: (.+)", t)
        if m:
            return f"Téléphone {m.group(1)} / Télécopie {m.group(2)}"
    if fld == "address_pc":
        return "F-" + t
    if fld == "address_street":
        return t.replace(",", "", 1)
    if lab == "page":
        m = _re.fullmatch(r"(\d+)\s*/\s*(\d+)", t)
        if m:
            return f"Page {m.group(1)} sur {m.group(2)}"
    if lab == "headnote":
        m = _re.fullmatch(r"CHU ([A-ZÀ-ÖØ-Þ ]+) - (Service de .+)", t)
        if m:
            return f"{m.group(2)} — CHU {m.group(1)}"
    if lab == "footnote":
        return t.replace(" - ", " • ")
    if lab == "section" and t.endswith(" :"):
        counters["sec"] = counters.get("sec", 0) + 1
        return f"{counters['sec']}. {t[:-2]}"
    if lab == "item" and t.startswith("- "):
        return "• " + t[2:]
    return t


def b_native_token_gold(model: str, fld: str, tb: str) -> list[str] | None:
    """GENERATOR-authored token gold for the family-B line shapes whose
    rewrite changes the token count (VERDICT r5 item 6) — the shapes the
    r5 token-tagger tiers had to SKIP because transferring family-A gold
    positionally would be impossible and inventing it in the eval would
    beg the question. The generator owns both the A truth and the B
    template, so it can author the B-native tags by construction,
    following the A-convention analogs:

    * idno  'Identifiant patient <n>': the type PHRASE plays the role A's
      single 'IPP' token plays (idtype), the digits stay idno;
    * sex   'Sexe féminin'/'Sexe masculin': A tags 'Sexe' O and the value
      token sex — the fused B value word keeps that split;
    * contact 'Téléphone <a> / Télécopie <b>': keyword and separator
      tokens are O exactly as A's 'Tél :'/'-'/'Fax :' are, digit groups
      keep phone/fax.

    Returns None for (model, field) pairs this function does not author —
    callers fall back to the positional-transfer path."""
    toks = tb.split(" ")
    if model == "patient" and fld == "idno" \
            and tb.startswith("Identifiant patient "):
        return ["idtype", "idtype"] + ["idno"] * (len(toks) - 2)
    if model == "patient" and fld == "sex" and tb.startswith("Sexe ") \
            and ":" not in tb:
        # the ':' guard keeps this author from ever mislabeling an
        # UNSHIFTED family-A line ('Sexe : F' — where ':' must stay O):
        # it only fires on the fused B shape 'Sexe féminin/masculin'
        # (_shift_line's fullmatch rewrites every generator sex line, but
        # the guard holds even if grammar and shift regex diverge;
        # ADVICE r6)
        return ["O"] + ["sex"] * (len(toks) - 1)
    if model == "organization" and fld == "contact" \
            and tb.startswith("Téléphone ") and " / Télécopie " in tb:
        cut = toks.index("/")
        out = []
        for k, tok in enumerate(toks):
            if tok in ("Téléphone", "Télécopie", "/"):
                out.append("O")
            elif tok == "(standard)":
                out.append("note")       # A convention: the qualifier is
            else:                        # <note>, not part of the number
                out.append("phone" if k < cut else "fax")
        return out
    return None


def shift_format(d: dict, i: int) -> dict:
    """Family-B twin of a generated doc: same keys, same gold labels/fields,
    reshaped surface text + rotated header/letterhead blocks."""
    rng = random.Random(((SEED ^ 0x0F0F) << 32) ^ i)
    labels = list(d["line_labels"])
    fields = list(d["line_fields"])
    spans = [dict(sp) for sp in d["spans"]]
    counters: dict = {}
    for j, sp in enumerate(spans):
        if sp.get("kind") == "media":
            continue
        sp["text"] = _shift_line(sp["text"], labels[j], fields[j], counters)

    def _rotate(zone: str) -> None:
        idx = [j for j, lab in enumerate(labels)
               if ZONE_OF.get(lab) == zone and spans[j].get("kind") != "media"]
        if len(idx) >= 3:
            k = rng.randrange(1, len(idx))
            order = idx[k:] + idx[:k]
            new_spans = [spans[j] for j in order]
            new_fields = [fields[j] for j in order]
            for j, sp, fl in zip(idx, new_spans, new_fields):
                spans[j] = sp
                fields[j] = fl

    _rotate("header")
    _rotate("leftnote")
    out = dict(d)
    out["spans"] = spans
    out["line_labels"] = labels
    out["line_fields"] = fields
    return out


def corpus_df(spark, n_docs: int, partitions: int | None = None,
              layout: bool = False):
    """Input table ``(doc_id, spans)`` generated distributed via mapInPandas.

    ``spark.range`` gives a splittable seed column; generation happens on
    executors, so a 10^12-doc corpus is as partitionable as its id range
    (no driver-side materialization).
    """
    import pandas as pd

    # oversplit vs cores: the generated corpus is partitioned by doc COUNT
    # (unlike a parquet scan, which is byte-bounded), so smaller tasks
    # amortize the giant-doc tail across the schedule — but only once there
    # are enough docs per task to amortize the per-task Python-stage
    # round-trip (~25 ms each; a 3x oversplit of a 500-doc corpus measured
    # 2.5x SLOWER than cores-sized tasks)
    cores = spark.sparkContext.defaultParallelism
    parts = partitions or max(cores, min(cores * 3, n_docs // 50))
    rng_df = spark.range(0, n_docs, 1, parts)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            docs = [generate_doc(int(i), layout=layout) for i in pdf["id"]]
            yield pd.DataFrame({
                "doc_id": [d["doc_id"] for d in docs],
                "spans": [d["spans"] for d in docs],
            })

    return rng_df.mapInPandas(
        gen, schema=INPUT_SCHEMA_LAYOUT if layout else INPUT_SCHEMA)


def expected_docs(n_docs: int) -> list[dict[str, Any]]:
    """Driver-side golden fixtures for test-scale corpora."""
    return [generate_doc(i) for i in range(n_docs)]


def truth_zone_lines_df(spark, n_docs: int):
    """Distributed golden truth table (doc_id, line_idx, label) of coarse
    zone labels — the annotated side of the eval harness (SURVEY §5.2)."""
    import pandas as pd

    parts = spark.sparkContext.defaultParallelism
    rng_df = spark.range(0, n_docs, 1, parts)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                d = generate_doc(int(i))
                for j, lab in enumerate(d["line_labels"]):
                    rows.append((d["doc_id"], j, ZONE_OF[lab]))
            yield pd.DataFrame(rows, columns=["doc_id", "line_idx", "label"])

    return rng_df.mapInPandas(gen, schema="doc_id string, line_idx int, label string")


def truth_fine_lines_df(spark, n_docs: int):
    """Distributed golden truth of FINE line labels (doc_id, line_idx,
    label, field): the annotated side for the body / header-field /
    left-note-field model evals (label = generator line label; field = the
    header/left-note field truth, '' elsewhere)."""
    import pandas as pd

    parts = spark.sparkContext.defaultParallelism
    rng_df = spark.range(0, n_docs, 1, parts)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                d = generate_doc(int(i))
                for j, lab in enumerate(d["line_labels"]):
                    rows.append((d["doc_id"], j, lab, d["line_fields"][j]))
            yield pd.DataFrame(rows, columns=["doc_id", "line_idx",
                                              "label", "field"])

    return rng_df.mapInPandas(
        gen, schema="doc_id string, line_idx int, label string, field string")


def truth_entities_df(spark, n_docs: int):
    """Distributed golden truth table of NER entity spans
    (doc_id, span_order, start, end, label) — the annotated side of the NER
    eval harness (the reference's eval_french_medical_ner analog)."""
    import pandas as pd

    parts = spark.sparkContext.defaultParallelism
    rng_df = spark.range(0, n_docs, 1, parts)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                d = generate_doc(int(i))
                for e in d["entities"]:
                    rows.append((d["doc_id"], e["span_order"], e["start"],
                                 e["end"], e["type"]))
            yield pd.DataFrame(rows, columns=["doc_id", "span_order",
                                              "start", "end", "label"])

    return rng_df.mapInPandas(
        gen, schema="doc_id string, span_order int, start int, end int, "
                    "label string")
