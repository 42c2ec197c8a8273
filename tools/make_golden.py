"""Materialize the golden expected-extraction tables as parquet.

The corpus generator (grobid_medical_report_spark/corpus.py) is a pure
function of (SEED, doc index) that emits both the input spans and the
expected extraction results. This tool freezes the expected side for the
driver-gate corpus size (n=500 docs — the documents-table count at sf0.001
and sf0.01) into ``golden/n500/*.parquet`` so the DuckDB oracle of each
``x_extract_*`` query can read a *materialized* truth table instead of the
queries being rows-only (VERDICT r1 §Next-round item 3).

Column names and integer widths match the Spark query output exactly —
the driver's compare hashes values through pandas, so int32 stays int32.

Run from the repo root:  python tools/make_golden.py
A drift guard lives in tests/test_golden_files.py (regenerates all 500
docs and compares against the committed parquet).
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from grobid_medical_report_spark.corpus import (expected_docs,  # noqa: E402
                                                generate_doc)

N_DOCS = 500
OUT_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "golden", f"n{N_DOCS}")

_str = pa.string()
_i32 = pa.int32()


def golden_tables(n_docs: int = N_DOCS) -> dict[str, pa.Table]:
    """Expected tables keyed by file stem; schemas mirror the x_* queries."""
    docs = expected_docs(n_docs)

    spans = {"doc_id": [], "order": [], "kind": [], "text": [], "media_ref": []}
    header = {"doc_id": [], "docnum": [], "doctype": [], "date_iso": [],
              "time": [], "dateline": [], "medics": [], "patients": []}
    ents = {"doc_id": [], "etype": [], "text": [], "start_char": [],
            "end_char": [], "span_order": []}
    zones = {"doc_id": [], "zone": [], "start_span": [], "end_span": [],
             "zone_order": []}
    sents = {"doc_id": [], "span_order": [], "sent_idx": [], "start_char": [],
             "end_char": []}
    marks = {"doc_id": [], "span_order": [], "marker_kind": [], "target": []}
    pats = {"doc_id": [], "patient_idx": [], "id": [], "idtype": [],
            "persname": [], "sex": [], "birthdate": [], "age": [],
            "birthplace": [], "deathdate": [], "address": [],
            "country": [], "town": [], "phone": [], "email": [],
            "note": []}
    orgf = {"doc_id": [], "field": [], "value": []}
    addrf = {"doc_id": [], "field": [], "value": []}
    lnote = {"doc_id": [], "org": [], "address": [], "settlement": [],
             "country": [], "phone": [], "fax": [], "email": [],
             "web": [], "note": []}

    for d in docs:
        did = d["doc_id"]
        for sp in d["expected_spans"]:
            spans["doc_id"].append(did)
            spans["order"].append(sp["order"])
            spans["kind"].append(sp["kind"])
            spans["text"].append(sp["text"])
            spans["media_ref"].append(sp["media_ref"])
        h = d["header"]
        header["doc_id"].append(did)
        for k in ("docnum", "doctype", "date_iso", "time", "dateline"):
            header[k].append(h[k])
        header["medics"].append("; ".join(h["medics"]))
        header["patients"].append("; ".join(h["patients"]))
        for e in d["entities"]:
            ents["doc_id"].append(did)
            ents["etype"].append(e["type"])
            ents["text"].append(e["text"])
            ents["start_char"].append(e["start"])
            ents["end_char"].append(e["end"])
            ents["span_order"].append(e["span_order"])
        for z in d["zones"]:
            zones["doc_id"].append(did)
            zones["zone"].append(z["zone"])
            zones["start_span"].append(z["start"])
            zones["end_span"].append(z["end"])
            zones["zone_order"].append(z["order"])
        for s in d["sentences"]:
            sents["doc_id"].append(did)
            sents["span_order"].append(s["span_order"])
            sents["sent_idx"].append(s["idx"])
            sents["start_char"].append(s["start"])
            sents["end_char"].append(s["end"])
        for m in d["markers"]:
            marks["doc_id"].append(did)
            marks["span_order"].append(m["span_order"])
            marks["marker_kind"].append(m["marker_kind"])
            marks["target"].append(m["target"])
        # sub-entity decomposition truth (patient / organization / address
        # token taggers — x_extract_patients / _org_fields / _address_fields)
        for p in d["patients"]:
            pats["doc_id"].append(did)
            pats["patient_idx"].append(p["idx"])
            for k in ("id", "idtype", "persname", "sex", "birthdate",
                      "age", "birthplace", "address", "country", "town",
                      "phone", "email", "note"):
                pats[k].append(p[k])
            pats["deathdate"].append(p["deathdate"])
        ln = d["leftnote"]
        lnote["doc_id"].append(did)
        for k in ("org", "address", "settlement", "country", "phone",
                  "fax", "email", "web", "note"):
            lnote[k].append(ln[k])
        for r in d["org_fields"]:
            orgf["doc_id"].append(did)
            orgf["field"].append(r["field"])
            orgf["value"].append(r["value"])
        for r in d["address_fields"]:
            addrf["doc_id"].append(did)
            addrf["field"].append(r["field"])
            addrf["value"].append(r["value"])

    # expected TEI strings: the S5 sink's golden side, rendered from the
    # GENERATOR's expected extraction (not the kernel's), so the oracle
    # checks extraction equality through the TEI serialization
    from grobid_medical_report_spark.functions.tei import render_tei
    tei = {"doc_id": [], "tei": []}
    for d in docs:
        tei["doc_id"].append(d["doc_id"])
        tei["tei"].append(render_tei({
            "header": d["header"], "leftnote": d["leftnote"],
            "patients": d["patients"], "spans": d["expected_spans"]}))

    # layout-corpus twin: the expected span sequence when extraction runs
    # over the layout-enriched input (marker-less headings/items/doctypes
    # resolvable only via font/bold/indent attrs — tests/test_layout.py)
    lspans = {"doc_id": [], "order": [], "kind": [], "text": [],
              "media_ref": []}
    bmed = {"doc_id": [], "persname": []}
    presc = {"doc_id": [], "offset": [], "drug": [], "dose": []}
    for i in range(n_docs):
        d = generate_doc(i, layout=True)
        for sp in d["expected_spans"]:
            lspans["doc_id"].append(d["doc_id"])
            lspans["order"].append(sp["order"])
            lspans["kind"].append(sp["kind"])
            lspans["text"].append(sp["text"])
            lspans["media_ref"].append(sp["media_ref"])
        for name in d["bold_medics"]:
            bmed["doc_id"].append(d["doc_id"])
            bmed["persname"].append(name)
        for off, drug, dose in d["prescriptions"]:
            presc["doc_id"].append(d["doc_id"])
            presc["offset"].append(off)
            presc["drug"].append(drug)
            presc["dose"].append(dose)

    def tbl(cols: dict, int_cols: set[str]) -> pa.Table:
        return pa.table({k: pa.array(v, type=_i32 if k in int_cols else _str)
                         for k, v in cols.items()})

    return {
        "expected_tei": tbl(tei, set()),
        "expected_spans_layout": tbl(lspans, {"order"}),
        "expected_bold_medics": tbl(bmed, set()),
        "expected_prescriptions": tbl(presc, {"offset"}),
        "expected_spans": tbl(spans, {"order"}),
        "expected_header": tbl(header, set()),
        "expected_entities": tbl(ents, {"start_char", "end_char", "span_order"}),
        "expected_zones": tbl(zones, {"start_span", "end_span", "zone_order"}),
        "expected_sentences": tbl(sents, {"span_order", "sent_idx",
                                          "start_char", "end_char"}),
        "expected_markers": tbl(marks, {"span_order"}),
        "expected_patients": tbl(pats, {"patient_idx"}),
        "expected_leftnote": tbl(lnote, set()),
        "expected_org_fields": tbl(orgf, set()),
        "expected_address_fields": tbl(addrf, set()),
    }


def main() -> None:
    os.makedirs(OUT_DIR, exist_ok=True)
    for name, table in golden_tables().items():
        path = os.path.join(OUT_DIR, f"{name}.parquet")
        pq.write_table(table, path, compression="zstd")
        print(f"wrote {path}: {table.num_rows} rows")


if __name__ == "__main__":
    main()
