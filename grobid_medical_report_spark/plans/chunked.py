"""Giant-document skew handling: size buckets, salting, page-chunking.

The north rule requires explicit handling of skewed giant documents. Two
complementary mechanisms:

* :func:`size_bucketed_repartition` — salted repartition on doc-size buckets:
  one shuffle that spreads the giant tail uniformly, for inputs whose
  physical layout is size-correlated (the case byte-bounded scan splits
  can't fix, e.g. an upstream sorted by doc length).

* :func:`extract_chunked` — the real answer to "a single 10^6-span document
  must not stall a partition": giant docs are split into page-range chunks
  *in Spark* (explode -> page-boundary window -> groupBy (doc, chunk)), each
  chunk runs the extraction kernel independently (header/left-note parsing
  gated to chunk 0, the analog of the reference's pages-0-2 header scope,
  EngineMedical.java:175-178), and an ``applyInPandas`` reassembly stitches
  the per-chunk outputs back into exactly the whole-doc result — verified
  span-for-span against the unchunked kernel (tests/test_chunked.py). Only
  the giant tail is shuffled; small docs take the no-shuffle path.

Chunk boundaries fall on page starts, and no cluster (paragraph/zone run)
crosses a page boundary — page-number and headnote lines always separate
them — so per-chunk RLE + concatenation is exactly whole-doc RLE.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from .pipeline import PUBLIC_SCHEMA, extract

GIANT_THRESHOLD = 2000     # spans; docs above this take the chunked path
PAGES_PER_CHUNK = 4

_PAGE_RE = r"^[0-9]+\s*/\s*[0-9]+$"


def size_bucketed_repartition(df: DataFrame, parallelism: int,
                              buckets: tuple[int, ...] = (64, 512, 4096)) -> DataFrame:
    """Salted repartition on doc-size buckets: partition key is
    (size_bucket, salt) so each physical partition receives a uniform mix of
    sizes. One full shuffle — use only for size-correlated input layouts."""
    n = F.size("spans")
    bucket = F.when(n <= buckets[0], 0)
    for i, b in enumerate(buckets[1:], start=1):
        bucket = bucket.when(n <= b, i)
    bucket = bucket.otherwise(len(buckets))
    salt = F.pmod(F.xxhash64("doc_id"), F.lit(parallelism)).cast("int")
    return (df.withColumn("_bucket", bucket).withColumn("_salt", salt)
              .repartition(parallelism, "_bucket", "_salt")
              .drop("_bucket", "_salt"))


def _merge_chunks():
    import pandas as pd

    def fn(key: tuple, pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values("chunk_id")
        spans: list[dict[str, Any]] = []
        zones: list[dict[str, Any]] = []
        entities: list[dict[str, Any]] = []
        sentences: list[dict[str, Any]] = []
        markers: list[dict[str, Any]] = []
        line_shift = 0   # input-span index shift for zone ranges
        n_spans_in = 0
        status = "ok"
        first = pdf.iloc[0]
        for _, row in pdf.iterrows():
            span_shift = len(spans)
            for s in row["spans"]:
                spans.append({**s, "order": len(spans)})
            for z in row["zones"]:
                zones.append({"zone": z["zone"], "start": z["start"] + line_shift,
                              "end": z["end"] + line_shift, "order": len(zones)})
            for e in row["entities"]:
                entities.append({**e, "span_order": e["span_order"] + span_shift})
            for sn in row["sentences"]:
                sentences.append({**sn,
                                  "span_order": sn["span_order"] + span_shift})
            for mk in row["markers"]:
                markers.append({**mk,
                                "span_order": mk["span_order"] + span_shift})
            line_shift += int(row["n_spans"])
            n_spans_in += int(row["n_spans"])
            if row["status"] != "ok":
                status = row["status"]
        # cross-chunk marker resolution: a marker may cite a figure from an
        # earlier chunk, unresolvable chunk-locally — re-resolve against the
        # whole doc's caption-number map (same J4 logic as the kernel)
        from ..operators.assemble import RE_CAPTION_NUM, RE_MARKER

        num_to = {}
        for sp in spans:
            if sp["kind"] in ("figure", "table"):
                m = RE_CAPTION_NUM.match(sp["text"])
                if m:
                    num_to[m.group(1)] = (sp["kind"], sp["media_ref"])
        span_text = {sp["order"]: sp["text"] for sp in spans}
        for mk in markers:
            if not mk["target"]:
                frag = span_text[mk["span_order"]][mk["start"]:mk["end"]]
                m = RE_MARKER.fullmatch(frag)
                if m and m.group(2) in num_to:
                    mk["marker_kind"], mk["target"] = num_to[m.group(2)]

        return pd.DataFrame([{
            "doc_id": first["doc_id"], "spans": spans, "zones": zones,
            "header": first["header"], "leftnote": first["leftnote"],
            "medics": list(first["medics"]), "patients": list(first["patients"]),
            "datelines": list(first["datelines"]),
            "person_names": list(first["person_names"]),
            "entities": entities, "sentences": sentences, "markers": markers,
            "n_spans": n_spans_in, "n_pages": int(pdf["n_pages"].sum()),
            "status": status,
        }])

    return fn


def extract_chunked(df: DataFrame, giant_threshold: int = GIANT_THRESHOLD,
                    pages_per_chunk: int = PAGES_PER_CHUNK,
                    max_spans: int | None = None) -> DataFrame:
    """Extraction with page-chunked processing of the giant tail."""
    sized = df.withColumn("_n", F.size("spans"))
    small = sized.filter(F.col("_n") <= giant_threshold).drop("_n")
    giant = sized.filter(F.col("_n") > giant_threshold).drop("_n")

    small_out = extract(small, max_spans=max_spans)

    # explode giant docs; page index = count of page-number lines BEFORE
    # each span (page lines close a page), chunk = page-range group
    s = giant.select("doc_id", F.explode("spans").alias("s"))
    w = W.partitionBy("doc_id").orderBy(F.col("s.offset"))
    page_mark = ((F.col("s.kind") == "text")
                 & F.col("s.text").rlike(_PAGE_RE)).cast("int")
    chunked = (s.withColumn(
                   "page_id",
                   F.coalesce(F.sum(page_mark).over(
                       w.rowsBetween(W.unboundedPreceding, -1)), F.lit(0)))
                .withColumn("chunk_id",
                            F.floor(F.col("page_id") / pages_per_chunk).cast("int")))
    # layout-enriched inputs (SURVEY §1.1 attrs) must survive the chunk
    # round-trip — dropping them would silently degrade giant docs to the
    # text-only kernel (guarded by tests/test_chunked.py layout case)
    lay_fields = tuple(
        f for f in ("font", "font_size", "bold", "italic", "x", "y")
        if f in df.schema["spans"].dataType.elementType.names)
    # chunk identity rides inside the kernel's doc_id key ("doc#<chunk>"),
    # so the unchanged extraction schema carries it through
    groups = (chunked.groupBy("doc_id", "chunk_id")
              .agg(F.sort_array(F.collect_list(
                  F.struct(F.col("s.offset").alias("offset"),
                           F.col("s.kind").alias("kind"),
                           F.col("s.text").alias("text"),
                           F.col("s.media_ref").alias("media_ref"),
                           *[F.col(f"s.{f}").alias(f) for f in lay_fields])))
                  .alias("ospans"))
              .select(F.concat_ws("#", "doc_id",
                                  F.lpad(F.col("chunk_id").cast("string"),
                                         6, "0")).alias("doc_id"),
                      F.transform("ospans", lambda o: F.struct(
                          o["kind"].alias("kind"), o["text"].alias("text"),
                          o["media_ref"].alias("media_ref"),
                          o["offset"].alias("offset"),
                          *[o[f].alias(f) for f in lay_fields])).alias("spans"),
                      (F.col("chunk_id") == 0).alias("first_chunk")))

    chunk_out = (extract(groups, max_spans=max_spans)
                 .withColumn("chunk_id",
                             F.split("doc_id", "#").getItem(1).cast("int"))
                 .withColumn("doc_id", F.split("doc_id", "#").getItem(0)))

    giant_out = (chunk_out.groupBy("doc_id")
                 .applyInPandas(_merge_chunks(), schema=PUBLIC_SCHEMA))
    return small_out.unionByName(giant_out)
