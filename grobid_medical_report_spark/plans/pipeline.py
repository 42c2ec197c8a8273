"""Distributed extraction pipeline: input span table -> extraction table.

Spark-first design notes (SURVEY.md §3.1 "Spark lifecycle equivalent"):

* the whole cascade is ONE ``mapInPandas`` stage — the workload is
  embarrassingly parallel per ``doc_id`` (the reference has no cross-document
  computation, SURVEY.md §2.6), so the only node boundaries are the ingest
  repartition and the final write;
* **skew**: per-doc work scales with byte size, and parquet scan splits are
  already *byte-bounded* (``spark.sql.files.maxPartitionBytes``), so a split
  holding one giant doc carries about the same work as one holding thousands
  of small docs — no shuffle needed in the hot path. (A measured earlier
  design that split giants out and round-robin-repartitioned them was 2-3x
  *slower*: it re-evaluated the source once per branch and paid a full
  shuffle of the span payloads.) For pathological upstream partitioning
  (e.g. inputs sorted by size), ``repartition_to`` applies ONE round-robin
  repartition. Residual pathological docs are bounded by the Arrow batch cap
  (session.py) and the ``max_spans`` quarantine;
* **poison pills**: docs above ``max_spans`` are quarantined via ``status``
  (P3, the oversize-guard analog of MedicalReportSegmenterParser.java:136-139)
  instead of stalling a partition; per-row try/except inside the kernel
  isolates failures (S3);
* **metrics**: ``df.observe`` emits row/error counts as telemetry (A3, the
  CntManager analog); exactly-once lineage metrics come from the checkpoint
  write path (plans/checkpoint.py), not observe.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

from ..operators.assemble import extract_doc_arrays

EXTRACT_SCHEMA = (
    "doc_id string, "
    "zones array<struct<zone:string,start:int,end:int,order:int>>, "
    "header struct<docnum:string,doctype:string,title:string,date_iso:string,"
    "time:string,dateline:string,affiliation:string,address:string,org:string,"
    "email:string,phone:string,fax:string,web:string,note:string,"
    "medics:array<string>,patients:array<string>>, "
    "leftnote struct<idno:string,org:string,address:string,country:string,"
    "settlement:string,phone:string,fax:string,email:string,web:string,"
    "medics:array<string>,note:string>, "
    "medics array<struct<idx:int,idno:string,role:string,persname:string,"
    "affiliation:string,organisation:string,institution:string,address:string,"
    "country:string,town:string,email:string,phone:string,fax:string,"
    "web:string,note:string>>, "
    "patients array<struct<idx:int,id:string,idtype:string,persname:string,"
    "sex:string,birthdate:string,age:string,birthplace:string,deathdate:string,"
    "address:string,country:string,town:string,phone:string,email:string,"
    "note:string>>, "
    "datelines array<struct<idx:int,doctype:string,placename:string,"
    "date:string,time:string,note:string>>, "
    "person_names array<struct<idx:int,title:string,forename:string,"
    "middlename:string,surname:string,suffix:string>>, "
    "markers array<struct<span_order:int,start:int,end:int,"
    "marker_kind:string,target:string>>, "
    # the three HIGH-VOLUME outputs cross the Python->JVM boundary as
    # parallel PRIMITIVE arrays (a list<string>/list<int> converts ~3x
    # faster than list<struct> on both the Arrow-serialize and the
    # JVM-decode side, measured); extract() zips them back into the
    # public struct columns JVM-side, so consumers see the same schema
    "span_kinds array<string>, span_texts array<string>, "
    "span_refs array<string>, "
    "ent_types array<string>, ent_texts array<string>, "
    "ent_starts array<int>, ent_ends array<int>, "
    "ent_span_orders array<int>, "
    "sent_span_orders array<int>, sent_idxs array<int>, "
    "sent_starts array<int>, sent_ends array<int>, "
    "n_spans int, n_pages int, status string"
)

#: the public schema extract() presents after the JVM-side re-zip — what
#: every consumer (tests, checkpoint, chunked merge, driver) sees
PUBLIC_SCHEMA = EXTRACT_SCHEMA.replace(
    "span_kinds array<string>, span_texts array<string>, "
    "span_refs array<string>, "
    "ent_types array<string>, ent_texts array<string>, "
    "ent_starts array<int>, ent_ends array<int>, "
    "ent_span_orders array<int>, "
    "sent_span_orders array<int>, sent_idxs array<int>, "
    "sent_starts array<int>, sent_ends array<int>, ",
    "spans array<struct<kind:string,text:string,media_ref:string,"
    "order:int>>, "
    "entities array<struct<type:string,text:string,start:int,end:int,"
    "span_order:int>>, "
    "sentences array<struct<span_order:int,idx:int,start:int,end:int>>, ")


def _extract_batches(max_spans: int | None):
    import pandas as pd

    def _l(x):  # null spans column -> empty doc
        return [] if x is None else list(x)

    def fn(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            n_rows = len(pdf)
            firsts = (pdf["first_chunk"] if "first_chunk" in pdf.columns
                      else [True] * n_rows)
            has_lay = "in_sizes" in pdf.columns
            szs = pdf["in_sizes"] if has_lay else [None] * n_rows
            bds = pdf["in_bolds"] if has_lay else [None] * n_rows
            xxs = pdf["in_xs"] if has_lay else [None] * n_rows
            fts = pdf["in_fonts"] if has_lay else [None] * n_rows
            rows = [extract_doc_arrays(d, _l(k), _l(t), _l(r), _l(o),
                                       max_spans=max_spans,
                                       first_chunk=bool(fc),
                                       sizes=None if sz is None else _l(sz),
                                       bolds=None if bd is None else _l(bd),
                                       xs=None if xx is None else _l(xx),
                                       fonts=None if ft is None else _l(ft))
                    for d, k, t, r, o, fc, sz, bd, xx, ft in zip(
                        pdf["doc_id"], pdf["in_kinds"], pdf["in_texts"],
                        pdf["in_refs"], pdf["in_offsets"], firsts,
                        szs, bds, xxs, fts)]
            for r in rows:
                sps, ents, sents = r["spans"], r["entities"], r["sentences"]
                r["n_pages"] = sum(1 for sp in sps if sp["kind"] == "page")
                r["span_kinds"] = [sp["kind"] for sp in sps]
                r["span_texts"] = [sp["text"] for sp in sps]
                r["span_refs"] = [sp["media_ref"] for sp in sps]
                r["ent_types"] = [e["type"] for e in ents]
                r["ent_texts"] = [e["text"] for e in ents]
                r["ent_starts"] = [e["start"] for e in ents]
                r["ent_ends"] = [e["end"] for e in ents]
                r["ent_span_orders"] = [e["span_order"] for e in ents]
                r["sent_span_orders"] = [s["span_order"] for s in sents]
                r["sent_idxs"] = [s["idx"] for s in sents]
                r["sent_starts"] = [s["start"] for s in sents]
                r["sent_ends"] = [s["end"] for s in sents]
            yield pd.DataFrame(rows, columns=[
                "doc_id", "zones", "header", "leftnote", "medics",
                "patients", "datelines", "person_names", "markers",
                "span_kinds", "span_texts", "span_refs",
                "ent_types", "ent_texts", "ent_starts", "ent_ends",
                "ent_span_orders",
                "sent_span_orders", "sent_idxs", "sent_starts", "sent_ends",
                "n_spans", "n_pages", "status"])

    return fn


_FLAT_COLS = ("span_kinds", "span_texts", "span_refs",
              "ent_types", "ent_texts", "ent_starts", "ent_ends",
              "ent_span_orders",
              "sent_span_orders", "sent_idxs", "sent_starts", "sent_ends")


def _struct_views(out: DataFrame) -> DataFrame:
    """Rebuild the public ``spans``/``entities``/``sentences`` struct-array
    columns from the flat boundary columns — pure JVM column expressions
    (whole-stage codegen), applied after the Python stage. ``order`` is the
    span's index by construction (assemble.extract_doc enumerates)."""
    spans = F.transform(
        F.arrays_zip("span_kinds", "span_texts", "span_refs"),
        lambda z, i: F.struct(z["span_kinds"].alias("kind"),
                              z["span_texts"].alias("text"),
                              z["span_refs"].alias("media_ref"),
                              i.alias("order")))
    entities = F.transform(
        F.arrays_zip("ent_types", "ent_texts", "ent_starts", "ent_ends",
                     "ent_span_orders"),
        lambda z: F.struct(z["ent_types"].alias("type"),
                           z["ent_texts"].alias("text"),
                           z["ent_starts"].alias("start"),
                           z["ent_ends"].alias("end"),
                           z["ent_span_orders"].alias("span_order")))
    sentences = F.transform(
        F.arrays_zip("sent_span_orders", "sent_idxs", "sent_starts",
                     "sent_ends"),
        lambda z: F.struct(z["sent_span_orders"].alias("span_order"),
                           z["sent_idxs"].alias("idx"),
                           z["sent_starts"].alias("start"),
                           z["sent_ends"].alias("end")))
    return (out.withColumn("spans", spans)
               .withColumn("entities", entities)
               .withColumn("sentences", sentences)
               .drop(*_FLAT_COLS)
               .select("doc_id", "spans", "zones", "header", "leftnote",
                       "medics", "patients", "datelines", "person_names",
                       "entities", "sentences", "markers",
                       "n_spans", "n_pages", "status"))


def extract(df: DataFrame, max_spans: int | None = 200_000,
            repartition_to: int | None = None,
            observation: Observation | None = None) -> DataFrame:
    """Run the fused extraction cascade over ``(doc_id, spans)`` rows.

    ``repartition_to`` applies one round-robin repartition before the UDF —
    use only when the upstream partitioning is size-correlated (see module
    docstring); the default no-shuffle path relies on byte-bounded scan
    splits for balance.
    """
    if repartition_to:
        df = df.repartition(repartition_to)

    # the INPUT also crosses the boundary as parallel primitive arrays —
    # transform() on the struct column is JVM-side, and four flat arrays
    # Arrow-decode into Python far cheaper than one list<struct>
    flat_in = [
        F.col("doc_id"),
        F.transform("spans", lambda s: s["kind"]).alias("in_kinds"),
        F.transform("spans", lambda s: s["text"]).alias("in_texts"),
        F.transform("spans", lambda s: s["media_ref"]).alias("in_refs"),
        F.transform("spans", lambda s: s["offset"]).alias("in_offsets"),
    ]
    # layout-enriched input (SURVEY §1.1 token attrs): forward the
    # kernel-consumed attrs as flat primitive arrays like the text columns
    span_fields = df.schema["spans"].dataType.elementType.names
    if "font_size" in span_fields:
        flat_in += [
            F.transform("spans", lambda s: s["font_size"]).alias("in_sizes"),
            F.transform("spans", lambda s: s["bold"]).alias("in_bolds"),
            F.transform("spans", lambda s: s["x"]).alias("in_xs"),
            F.transform("spans", lambda s: s["font"]).alias("in_fonts"),
        ]
    if "first_chunk" in df.columns:
        flat_in.append(F.col("first_chunk"))
    df = df.select(*flat_in)

    out = df.mapInPandas(_extract_batches(max_spans), schema=EXTRACT_SCHEMA)
    if observation is not None:
        out = out.observe(
            observation,
            F.count(F.lit(1)).alias("docs"),
            F.sum(F.when(F.col("status") != "ok", 1).otherwise(0)).alias("not_ok"),
            F.sum(F.size("span_kinds")).alias("spans_out"),
        )
    out = _struct_views(out)
    return out


def render_tei_df(extracted: DataFrame) -> DataFrame:
    """TEI/XML sink (S5 analog): one XML string per doc, rendered by a
    vectorized stage over the extraction output — the file-per-doc writer of
    the reference (ProcessEngineMedical:247-255) becomes a column + sink."""
    from ..functions.tei import render_tei

    def rt(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "tei": [render_tei({"header": h, "leftnote": ln,
                                    "patients": list(pt), "spans": list(sp)})
                        for h, ln, pt, sp in zip(pdf["header"], pdf["leftnote"],
                                                 pdf["patients"], pdf["spans"])],
            })

    return extracted.mapInPandas(rt, schema="doc_id string, tei string")


def result_spans(extracted: DataFrame) -> DataFrame:
    """Flatten to the north-rule contract table
    ``(doc_id, order, kind, text, media_ref)`` — one row per output span."""
    return (extracted
            .select("doc_id", F.explode("spans").alias("s"))
            .select("doc_id", F.col("s.order").alias("order"),
                    F.col("s.kind").alias("kind"), F.col("s.text").alias("text"),
                    F.col("s.media_ref").alias("media_ref")))


def styled_prescriptions(df: DataFrame) -> DataFrame:
    """Prescription pairs from ARBITRARY per-token style runs (r5, closes
    SURVEY §2 F1): the layout corpus types drug names in ITALIC and dosages
    in BOLD (``style_runs`` — a LIST of (r_from, r_to, style) char runs per
    span, the reference's LayoutToken per-token style granularity,
    MedicalReportSegmenterParser.java:392-558). Each italic drug run pairs
    with the NEAREST bold run whose covered text is a dosage (distance =
    |dose start − drug end|, ties to the earlier run) — a decision that
    NEEDS the full run list: one (from, to) pair per span drops every
    second drug and cannot hold bold + italic at once. Pure JVM column
    expressions (higher-order filter/transform/array_sort + substring);
    no Python, no shuffle — scale-safe at any corpus size."""
    s = df.select("doc_id", F.explode("spans").alias("s"))
    s = (s.filter((F.col("s.kind") == "text")
                  & (F.size("s.style_runs") >= 2))
          .select(
              "doc_id",
              F.col("s.offset").alias("offset"),
              F.col("s.text").alias("text"),
              F.expr("filter(s.style_runs, r -> r.style = 'italic')")
               .alias("drugs"),
              F.expr("filter(s.style_runs, r -> r.style = 'bold' AND "
                     "substring(s.text, r.r_from + 1, r.r_to - r.r_from) "
                     "rlike '^[0-9]+ mg$')").alias("doses"))
          .filter((F.size("drugs") > 0) & (F.size("doses") > 0)))
    s = s.select("doc_id", "offset", "text", "doses",
                 F.explode("drugs").alias("d"))
    best = F.expr(
        "array_sort(transform(doses, b -> struct("
        "abs(b.r_from - d.r_to) as dist, b.r_from as f, b.r_to as t)))[0]")
    return (s.select(
                "doc_id", "offset",
                F.expr("substring(text, d.r_from + 1, d.r_to - d.r_from)")
                 .alias("drug"),
                best.alias("b"),
                F.col("text"))
             .select("doc_id", "offset", "drug",
                     F.expr("substring(text, b.f + 1, b.t - b.f)")
                      .alias("dose")))


def bold_medic_mentions(df: DataFrame) -> DataFrame:
    """Signing-medic detection from TOKEN-LEVEL bold runs (r4): the layout
    corpus carries an optional in-span bold char range (``bold_from``/
    ``bold_to`` — the per-token style granularity of the reference's
    LayoutToken, MedicalReportSegmenterParser.java:392-558). A bold
    'Docteur X Y' inline in a body paragraph is the signing medic; the
    textually-identical PLAIN 'Validé par Docteur X Y.' line is not — no
    text-only decision can separate them (tests/test_layout.py proves the
    distractors exist). Pure JVM column expressions: explode + substring +
    title filter, no Python in the path — scale-safe at any corpus size."""
    s = df.select("doc_id", F.explode("spans").alias("s"))
    return (s.filter((F.col("s.kind") == "text") & (F.col("s.bold_from") >= 0))
             .select("doc_id",
                     F.expr("substring(s.text, s.bold_from + 1, "
                            "s.bold_to - s.bold_from)").alias("persname"))
             .filter(F.col("persname")
                     .rlike("^(Docteur|Dr|Pr|Professeur) ")))
