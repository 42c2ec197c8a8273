"""Layout-attribute corpus + layout-consuming kernel (VERDICT r1 item 5).

The layout corpus (``generate_doc(i, layout=True)``) carries the SURVEY
§1.1 LayoutToken attrs (font, font_size, bold, italic, x, y) on every span,
and a fraction of headings / items / doctypes drop their textual markers so
the zone and body-structure decisions REQUIRE the layout signals:

* section headings in title-case without a colon  -> bold + font-delta band
* list items without the dash marker              -> x indentation
* title-case doctype                              -> largest font in header

Reference analogs: FeaturesVectorMedical.java:56-226 (font/size/bold
features), HeaderMedicalParser.java:434-467 (largest-font title candidate),
:550-563 (lineStartX indentation tracking).
"""

from __future__ import annotations

import pytest

from grobid_medical_report_spark.corpus import corpus_df, generate_doc
from grobid_medical_report_spark.operators.assemble import (extract_doc,
                                                            extract_doc_arrays)

N_DOCS = 120


def _expected_tuples(d):
    return [(s["kind"], s["text"], s["media_ref"], s["order"])
            for s in d["expected_spans"]]


def _got_tuples(r):
    return [(s["kind"], s["text"], s["media_ref"], s["order"])
            for s in r["spans"]]


@pytest.fixture(scope="module")
def layout_docs():
    return [generate_doc(i, layout=True) for i in range(N_DOCS)]


def test_layout_kernel_full_parity(layout_docs):
    """With layout attrs, every doc reproduces the golden extraction."""
    for d in layout_docs:
        r = extract_doc(d["doc_id"], d["spans"])
        assert r["status"] == "ok"
        assert _got_tuples(r) == _expected_tuples(d), d["doc_id"]
        assert r["zones"] == d["zones"], d["doc_id"]
        assert r["header"]["doctype"] == d["header"]["doctype"], d["doc_id"]
        assert r["header"]["docnum"] == d["header"]["docnum"], d["doc_id"]


def test_layout_signals_are_load_bearing(layout_docs):
    """The text-only kernel must FAIL on a large share of layout docs —
    otherwise the layout phenomena would be decidable by regex alone and
    the layout features would be decorative."""
    mismatches = 0
    with_phenomena = 0
    for d in layout_docs:
        kinds = [s["kind"] for s in d["spans"]]
        texts = [s["text"] for s in d["spans"]]
        refs = [s["media_ref"] for s in d["spans"]]
        offs = [s["offset"] for s in d["spans"]]
        r = extract_doc_arrays(d["doc_id"], kinds, texts, refs, offs)
        if _got_tuples(r) != _expected_tuples(d) \
                or r["header"]["doctype"] != d["header"]["doctype"]:
            mismatches += 1
        labs = d["line_labels"]
        sp_texts = [s["text"] for s in d["spans"]]
        if any(lab == "section" and not t.endswith(":")
               for lab, t in zip(labs, sp_texts)) \
                or any(lab == "item" and not t.startswith("- ")
                       for lab, t in zip(labs, sp_texts)) \
                or not d["header"]["doctype"].isupper():
            with_phenomena += 1
    assert with_phenomena >= N_DOCS // 2
    assert mismatches >= with_phenomena * 3 // 4


def test_layout_title_by_largest_font(layout_docs):
    """A title-case doctype is detected by largest-font, not regex."""
    seen = 0
    for d in layout_docs:
        if d["header"]["doctype"].isupper():
            continue
        seen += 1
        r = extract_doc(d["doc_id"], d["spans"])
        assert r["header"]["doctype"] == d["header"]["doctype"]
        assert r["header"]["title"] == d["header"]["doctype"]
    assert seen >= 10


def test_layout_heading_without_colon(layout_docs):
    """Marker-less bold headings land as section spans, and marker-less
    indented lines land as items."""
    sec_seen = item_seen = 0
    for d in layout_docs:
        labs = d["line_labels"]
        sp_texts = [s["text"] for s in d["spans"]]
        bare_secs = {t for lab, t in zip(labs, sp_texts)
                     if lab == "section" and not t.endswith(":")}
        bare_items = {t for lab, t in zip(labs, sp_texts)
                      if lab == "item" and not t.startswith("- ")}
        if not bare_secs and not bare_items:
            continue
        r = extract_doc(d["doc_id"], d["spans"])
        got_secs = {s["text"] for s in r["spans"] if s["kind"] == "section"}
        got_items = {s["text"] for s in r["spans"] if s["kind"] == "item"}
        assert bare_secs <= got_secs, d["doc_id"]
        assert bare_items <= got_items, d["doc_id"]
        sec_seen += bool(bare_secs)
        item_seen += bool(bare_items)
    assert sec_seen >= 10 and item_seen >= 10


def test_layout_default_corpus_unchanged():
    """layout=False stays byte-identical (the authoritative input shape)."""
    d = generate_doc(7)
    assert "font_size" not in d["spans"][0]
    assert d["line_styles"] == []


def test_layout_spark_end_to_end(spark):
    """corpus_df(layout=True) -> extract -> result_spans equals golden."""
    from pyspark.sql import functions as F

    from grobid_medical_report_spark.plans.pipeline import (extract,
                                                            result_spans)

    n = 40
    out = (result_spans(extract(corpus_df(spark, n, layout=True)))
           .orderBy("doc_id", "order").collect())
    exp = []
    for i in range(n):
        d = generate_doc(i, layout=True)
        for s in d["expected_spans"]:
            exp.append((d["doc_id"], s["order"], s["kind"], s["text"],
                        s["media_ref"]))
    assert [tuple(r) for r in out] == exp


def test_bold_medic_mentions_need_token_level_styles(spark):
    """r4 per-token layout attrs: the signing-medic decision is possible
    ONLY with the in-span bold char runs — plain 'Validé par Docteur X.'
    distractor lines are textually identical and must NOT be returned."""
    from grobid_medical_report_spark.corpus import corpus_df, generate_doc
    from grobid_medical_report_spark.plans.pipeline import \
        bold_medic_mentions

    N = 120
    got = {(r["doc_id"], r["persname"])
           for r in bold_medic_mentions(
               corpus_df(spark, N, layout=True)).collect()}
    want = set()
    n_plain = n_bold = 0
    for i in range(N):
        d = generate_doc(i, layout=True)
        for name in d["bold_medics"]:
            want.add((d["doc_id"], name))
            n_bold += 1
        # count textually-identical PLAIN distractor lines
        bolded = {f"Validé par {m}." for m in d["bold_medics"]}
        plain = [s for s in d["spans"]
                 if (s["text"] or "").startswith("Validé par Docteur")
                 and s["text"] not in bolded]
        n_plain += len(plain)
    assert got == want
    assert n_bold > 20 and n_plain > 10   # both variants exist; only bold returned
    # the text-only corpus carries no bold runs at all — the decision is
    # structurally impossible there (schema has no bold_from column)
    d = generate_doc(3)
    assert "bold_from" not in d["spans"][0]


def test_style_runs_are_arbitrary_per_token_runs(layout_docs):
    """r5 (closes SURVEY §2 F1): spans carry a LIST of (r_from, r_to, style)
    char runs — several runs of MIXED styles coexist in one line (italic
    drug + bold dosage, plus the explicit bold medic run), the granularity
    a single bold_from/bold_to pair cannot represent. Run derivation is
    deterministic from the drawn text, so the text corpus stays
    byte-stable."""
    multi = mixed = two_drugs = 0
    for d in layout_docs:
        for s in d["spans"]:
            runs = s.get("style_runs")
            if s["kind"] != "text":
                assert runs == []
                continue
            # runs are sorted, in-bounds, and substring-consistent
            prev = (-1, -1)
            for r in runs:
                assert 0 <= r["r_from"] < r["r_to"] <= len(s["text"])
                assert (r["r_from"], r["r_to"]) >= prev
                prev = (r["r_from"], r["r_to"])
                assert r["style"] in ("bold", "italic")
            if len(runs) >= 2:
                multi += 1
                if len({r["style"] for r in runs}) == 2:
                    mixed += 1
                if sum(r["style"] == "italic" for r in runs) >= 2:
                    two_drugs += 1
            # the old one-run field is consistent with the run list
            if s.get("bold_from", -1) >= 0:
                assert {"r_from": s["bold_from"], "r_to": s["bold_to"],
                        "style": "bold"} in runs
    assert multi > 100 and mixed > 100
    assert two_drugs > 0        # >= 2 runs of the SAME style in one span
    # the text-only corpus carries no style metadata at all
    assert "style_runs" not in generate_doc(3)["spans"][0]


def test_styled_prescriptions_need_the_run_list(spark):
    """The drug/dosage pairing decision NEEDS the full run list: the query
    result equals the generation truth, and collapsing each span to its
    FIRST run (the old single-run schema) provably loses prescriptions."""
    from pyspark.sql import functions as F

    from grobid_medical_report_spark.plans.pipeline import \
        styled_prescriptions

    N = 120
    df = corpus_df(spark, N, layout=True)
    got = sorted(tuple(r) for r in styled_prescriptions(df).collect())
    want = sorted((d["doc_id"], off, drug, dose)
                  for d in (generate_doc(i, layout=True) for i in range(N))
                  for off, drug, dose in d["prescriptions"])
    assert got == want and len(got) > 200
    # single-run collapse: keep only the first run per span
    collapsed = df.select(
        "doc_id",
        F.expr("transform(spans, s -> named_struct("
               "'kind', s.kind, 'text', s.text, 'media_ref', s.media_ref, "
               "'offset', s.offset, 'style_runs', slice(s.style_runs, 1, 1)"
               "))").alias("spans"))
    lost = styled_prescriptions(collapsed).count()
    assert lost == 0      # pairing needs >= 2 runs; one run can never pair
