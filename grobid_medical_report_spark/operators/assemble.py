"""Per-document fused extraction kernel: spans in -> full extraction out.

This is the engine's hot path: one pure-Python/numpy function per document,
called from ``mapInPandas`` over Arrow batches (plans/pipeline.py). It fuses
the reference's whole cascade (SURVEY.md §3.1 steps 4-7) into one pass, per
the north star ("PDF/layout parse and DOM-heuristic boilerplate stripping
fused into one mapInPandas pass"):

  segmenter decode (zones)           MedicalReportSegmenterParser.java:104-149
  -> header + left-note parse        HeaderMedicalParser.java:239-389
  -> body structuring                FullMedicalTextParser.java:106-206
  -> NER over paragraphs             FrenchMedicalNERParser.java:79-271
  -> ordered span-sequence assembly  TEIFormatter.toTEIBody:595-619 /
                                     toTEITextPiece:766-1024

Output span contract: ``(kind, text, media_ref, order)`` per doc — the
north-rule per-row invariant. Cluster merging (contiguous same-label lines ->
one span, with de-hyphenization repair, reference X4
LayoutTokensUtil.normalizeDehyphenizeText) follows SURVEY.md C2.
"""

from __future__ import annotations

import re
from typing import Any

import numpy as np

from ..functions.sentences import split_sentences
from ..functions.textnorm import dehyphenize_join, normalize_space
from .body import RE_LABEL_LINE, RE_SEPARATOR, label_body_line_fitted
from .header import parse_header_zone
from .leftnote import parse_leftnote_zone
from .ner import extract_entities
from .segmenter import (HEADING_DSIZE_HI, HEADING_DSIZE_LO, modal_size,
                        segment_doc)

#: sub-heading font-delta band (bold, below the section band) and the
#: indentation threshold marking list items (reference indentation features,
#: HeaderMedicalParser.java:550-563 lineStartX tracking)
SUBSECTION_DSIZE_LO = 0.5
ITEM_INDENT_MIN = 15.0

#: output kinds whose contiguous runs merge into one span (corpus.MERGE_KINDS)
MERGE_KINDS = {"header", "leftnote", "paragraph", "acknowledgement", "annex"}

#: figure/table callout marker inside body prose (J4/T7 analog: reference
#: markReferencesFigureTEI/TableTEI, TEIFormatter.java:1295-1404)
RE_MARKER = re.compile(r"\(cf\. (figure|tableau) (\d+)\)")
RE_CAPTION_NUM = re.compile(r"^(?:Figure|Tableau) (\d+) ?:")


def extract_doc(doc_id: str, spans: list[dict[str, Any]],
                max_spans: int | None = None,
                first_chunk: bool = True) -> dict[str, Any]:
    """Full extraction for one document from struct-shaped spans. Thin
    adapter over :func:`extract_doc_arrays` — the distributed stage feeds
    the array form directly (the input crosses the Python boundary as
    parallel primitive arrays, plans/pipeline.py). Layout token attrs
    (font_size/bold/x) are forwarded when the spans carry them."""
    spans = [] if spans is None else list(spans)  # Arrow hands a numpy array
    try:
        kinds = [s["kind"] for s in spans]
        texts = [s["text"] for s in spans]
        refs = [s["media_ref"] for s in spans]
        offsets = [s["offset"] for s in spans]
        has_layout = bool(spans) and "font_size" in spans[0]
        sizes = [s["font_size"] for s in spans] if has_layout else None
        bolds = [s["bold"] for s in spans] if has_layout else None
        xs = [s["x"] for s in spans] if has_layout else None
        fonts = [s.get("font", "") for s in spans] if has_layout else None
    except Exception as exc:  # malformed span dicts (S3 isolation)
        return {
            "doc_id": doc_id, "spans": [], "zones": [], "header": None,
            "leftnote": None, "medics": [], "patients": [], "datelines": [],
            "person_names": [], "entities": [], "sentences": [],
            "markers": [], "n_spans": len(spans),
            "status": f"error: {type(exc).__name__}: {exc}",
        }
    return extract_doc_arrays(doc_id, kinds, texts, refs, offsets,
                              max_spans=max_spans, first_chunk=first_chunk,
                              sizes=sizes, bolds=bolds, xs=xs, fonts=fonts)


def extract_doc_arrays(doc_id: str, kinds: list[str], texts_raw: list[str],
                       refs_raw: list[str], offsets: list[int],
                       max_spans: int | None = None,
                       first_chunk: bool = True,
                       sizes: list[float] | None = None,
                       bolds: list[bool] | None = None,
                       xs: list[float] | None = None,
                       fonts: list[str] | None = None) -> dict[str, Any]:
    """Full extraction for one document. Never raises: failures and oversize
    docs are routed to ``status`` (per-row failure isolation, SURVEY.md S3;
    oversize guard P3 analog of getPdfTokensMax)."""
    n_in = len(kinds)
    base = {
        "doc_id": doc_id, "spans": [], "zones": [], "header": None,
        "leftnote": None, "medics": [], "patients": [], "datelines": [],
        "person_names": [], "entities": [], "sentences": [], "markers": [],
        "n_spans": n_in, "status": "ok",
    }
    try:
        if not n_in:
            base["status"] = "empty"
            return base
        if max_spans is not None and n_in > max_spans:
            base["status"] = "oversize"
            return base

        order = sorted(range(n_in), key=offsets.__getitem__)  # reading (O1)
        texts = [normalize_space(texts_raw[i] or "") for i in order]
        refs = [refs_raw[i] or "" for i in order]
        is_media = np.array([kinds[i] == "media" for i in order], dtype=bool)

        # optional layout attrs (SURVEY §1.1), reading-ordered like texts
        lay = None
        if sizes is not None:
            lay = {
                "size": np.array([float(sizes[i] or 0.0) for i in order]),
                "bold": np.array([bool(bolds[i]) for i in order]),
                "x": np.array([float(xs[i] or 0.0) for i in order]),
            }
            if fonts is not None:
                lay["font"] = np.array([fonts[i] or "" for i in order],
                                       dtype=object)

        # stage 1: segmentation (coarse zones per line)
        zone_labels = segment_doc(texts, is_media, first_chunk, layout=lay)
        base["zones"] = _rle(zone_labels)

        # stage 2: body model -> fine label per line; with layout attrs,
        # marker-less headings/items resolve via bold+font-delta bands and
        # indentation vs the body margin (the reference's font/position
        # features, FeaturesVectorMedical.java:56-226)
        if lay is not None:
            modal = modal_size(lay["size"], is_media)
            body_tx = [i for i, z in enumerate(zone_labels)
                       if z == "body" and not is_media[i]]
            # the body LEFT MARGIN is the minimum x over body text lines
            # (headings/paragraphs sit on it; items indent off it) — a
            # median would drift into the indent when items dominate a page
            body_x = (float(np.min(lay["x"][body_tx])) if body_tx else 0.0)
        fine = list(zone_labels)
        for i, z in enumerate(zone_labels):
            if z == "body":
                if lay is not None and not is_media[i]:
                    d = lay["size"][i] - modal
                    lh = bool(lay["bold"][i]
                              and HEADING_DSIZE_LO <= d <= HEADING_DSIZE_HI)
                    ls = bool(lay["bold"][i]
                              and SUBSECTION_DSIZE_LO <= d < HEADING_DSIZE_LO)
                    li = bool(lay["x"][i] - body_x >= ITEM_INDENT_MIN)
                else:
                    lh = ls = li = False
                fine[i] = label_body_line_fitted(
                    texts[i], bool(is_media[i]), lh, ls, li)

        # stage 3: header / left-note field models + sub-entity cascade
        hdr_idx = [i for i, z in enumerate(zone_labels) if z == "header"]
        hdr = parse_header_zone(
            [texts[i] for i in hdr_idx],
            sizes=[float(lay["size"][i]) for i in hdr_idx] if lay is not None
            else None)
        base["header"] = hdr["header"]
        base["medics"] = hdr["medics"]
        base["patients"] = hdr["patients"]
        base["datelines"] = hdr["datelines"]
        base["person_names"] = hdr["person_names"]
        base["leftnote"] = parse_leftnote_zone(
            [texts[i] for i, z in enumerate(zone_labels) if z == "leftnote"])

        # stage 4: span-sequence assembly + NER + sentence segmentation over
        # paragraph clusters
        out_spans: list[dict[str, Any]] = []
        entities: list[dict[str, Any]] = []
        sentences: list[dict[str, Any]] = []
        n = len(texts)
        j = 0
        while j < n:
            lab = fine[j]
            if lab == "media":
                # fuse media + caption into figure/table span (T5)
                if j + 1 < n and fine[j + 1] in ("figure", "table"):
                    out_spans.append({"kind": fine[j + 1],
                                      "text": texts[j + 1],
                                      "media_ref": refs[j]})
                    j += 2
                else:
                    out_spans.append({"kind": "figure", "text": "",
                                      "media_ref": refs[j]})
                    j += 1
                continue
            if lab in MERGE_KINDS:
                k = j
                while k < n and fine[k] == lab:
                    if lab == "paragraph":
                        # dash separators and label-lines begin/stand as
                        # their own clusters (I- begin-marker analog)
                        if k > j and (RE_SEPARATOR.match(texts[k])
                                      or RE_LABEL_LINE.fullmatch(texts[k])):
                            break
                        if k == j and RE_LABEL_LINE.fullmatch(texts[k]):
                            k += 1
                            break
                    k += 1
                merged = dehyphenize_join(texts[j:k])
                if lab == "paragraph":
                    for e in extract_entities(merged):
                        entities.append({**e, "span_order": len(out_spans)})
                    for idx, (s0, s1) in enumerate(split_sentences(merged)):
                        sentences.append({"span_order": len(out_spans),
                                          "idx": idx, "start": s0, "end": s1})
                out_spans.append({"kind": lab, "text": merged, "media_ref": ""})
                j = k
                continue
            out_spans.append({"kind": lab, "text": texts[j], "media_ref": ""})
            j += 1
        for order, sp in enumerate(out_spans):
            sp["order"] = order
        # stage 5: marker resolution — callouts in prose resolved against the
        # figure/table objects by caption number (J4 id match; the doc-local
        # "join" of markers to media assets)
        num_to = {}
        for sp in out_spans:
            if sp["kind"] in ("figure", "table"):
                m = RE_CAPTION_NUM.match(sp["text"])
                if m:
                    num_to[m.group(1)] = (sp["kind"], sp["media_ref"])
        markers: list[dict[str, Any]] = []
        for sp in out_spans:
            if sp["kind"] != "paragraph":
                continue
            for m in RE_MARKER.finditer(sp["text"]):
                word_kind = "table" if m.group(1) == "tableau" else "figure"
                kind, ref = num_to.get(m.group(2), (word_kind, ""))
                markers.append({"span_order": sp["order"],
                                "start": m.start(), "end": m.end(),
                                "marker_kind": kind, "target": ref})
        base["markers"] = markers

        base["spans"] = out_spans
        base["entities"] = entities
        base["sentences"] = sentences
        return base
    except Exception as exc:  # per-row isolation: never poison the partition
        base["status"] = f"error: {type(exc).__name__}: {exc}"
        return base


def _rle(labels: list[str]) -> list[dict[str, Any]]:
    out: list[dict[str, Any]] = []
    start = 0
    for k in range(1, len(labels) + 1):
        if k == len(labels) or labels[k] != labels[start]:
            out.append({"zone": labels[start], "start": start, "end": k,
                        "order": len(out)})
            start = k
    return out
