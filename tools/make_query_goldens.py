"""Materialize golden expected tables for the formerly rows-only queries.

VERDICT r5 items 3 and 8: every deterministic rows-only entry gets the
x_doc_winnow_pairs treatment — a frozen golden parquet keyed by a content
hash of the input table, so the driver's correctness gate holds it with a
value oracle instead of a rows-only pass, and a drifted corpus fails
loudly against no block rather than silently against stale truth.

Two strengths of truth, stated per table:

* INDEPENDENT reference (like make_winnow_golden.py): the expected rows
  are computed by a plain-python/duckdb reimplementation that never goes
  through Spark —
    - expected_bpe_merges: the textbook BPE loop over duckdb word counts
      (same reference as tests/test_bpe.py);
    - expected_compression: a plain zlib loop;
    - expected_anonymize: the GENERATOR's truth fixtures (corpus.py
      header/patient dicts) + the anonymize functions — independent of
      the extraction kernel entirely;
    - expected_media_jpg / _wav / _video: the per-row codec pipelines
      (functions/jpeg.py, wav.py, avi.py — themselves fuzz- and
      round-trip-tested) driven by a plain python loop over duckdb rows,
      independent of the Spark mapInPandas plumbing.
* SPARK-FROZEN (determinism/stability pin): expected_ann_lsh / _ann_ivf
  hold the Spark queries' own output — the operators are approximate BY
  DESIGN, so there is no exact independent truth; their recall vs the
  brute-force baseline is pinned separately in tests/test_similarity_ann.py
  and the golden pins determinism + corpus binding for the driver gate.

Run from the repo root:  python tools/make_query_goldens.py
Drift guard: tests/test_query_goldens.py.
"""

from __future__ import annotations

import os
import re
import sys
import zlib
from collections import Counter

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TIERS = ("/root/testdata/sf0.001", "/root/testdata/sf0.01",
         "/root/testdata/sf0.1")
OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "golden", "n500")

#: corpus identity keys — MUST stay textually identical to the subqueries
#: in __spark_entry__._X_ORACLES (recomputed over the gate's views at
#: compare time). chr(31)/chr(30) = unit/record separators.
DOCS_MD5_SQL = ("SELECT md5(string_agg(doc_id || chr(31) || text, chr(30) "
                "ORDER BY doc_id)) FROM {src}")
DOCS200_MD5_SQL = DOCS_MD5_SQL + " WHERE doc_id < 200"
EMB_MD5_SQL = ("SELECT md5(string_agg(vec_id || chr(31) || "
               "to_json(embedding) || chr(31) || label, chr(30) "
               "ORDER BY vec_id)) FROM {src}")


def _docs(con, tier: str, limit: int | None = None):
    where = f"WHERE doc_id < {limit}" if limit else ""
    return con.execute(
        f"SELECT doc_id, text FROM read_parquet('{tier}/documents.parquet') "
        f"{where} ORDER BY doc_id").fetchall()


# ---------------------------------------------------------------------------
# independent references
# ---------------------------------------------------------------------------

def expected_bpe(con, tier: str, n_merges: int = 8) -> list[tuple]:
    """Textbook BPE merge learning over the doc_id<200 word counts — the
    same reference implementation tests/test_bpe.py asserts the
    distributed trainer equal to, with the same deterministic tie-break
    (max count, then lexicographic '\\x00'-joined pair)."""
    from grobid_medical_report_spark.operators.bpe import END

    wc: Counter = Counter()
    for _did, text in _docs(con, tier, limit=200):
        for w in re.split(r"\s+", text.strip()):
            if w:
                wc[w] += 1
    vocab = {tuple(list(w) + [END]): n for w, n in wc.items()}
    rows = []
    for rank in range(n_merges):
        pairs: Counter = Counter()
        for syms, n in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += n
        if not pairs:
            break
        best = min(pairs.items(),
                   key=lambda kv: (-kv[1], kv[0][0] + "\x00" + kv[0][1]))
        (a, b), count = best
        if count < 2:
            break
        rows.append((rank, a, b, a + b, count))
        new_vocab: dict = {}
        for syms, n in vocab.items():
            res, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    res.append(a + b)
                    i += 2
                else:
                    res.append(syms[i])
                    i += 1
            t = tuple(res)
            new_vocab[t] = new_vocab.get(t, 0) + n
        vocab = new_vocab
    return rows


def expected_compression(con, tier: str) -> list[tuple]:
    rows = []
    for did, text in _docs(con, tier):
        raw = text.encode("utf-8")
        c = len(zlib.compress(raw, 6))
        r = len(raw)
        rows.append((did, r, c, (c * 1000) // r if r else 1000))
    return rows


def expected_anonymize(n_docs: int = 200) -> list[tuple]:
    """From the GENERATOR's truth fixtures (not the extraction kernel):
    corpus.generate_doc(i)['header'/'patients'] carry the same docnum/
    date_iso/medics/persname/id/address values the kernel must extract,
    so this reference is independent of the whole Spark extraction path."""
    from grobid_medical_report_spark.corpus import generate_doc
    from grobid_medical_report_spark.functions.anonymize import (
        anonymize_address, anonymize_date_iso, anonymize_number,
        anonymize_person_name)

    rows = []
    for i in range(n_docs):
        d = generate_doc(i)
        hdr = d["header"]
        pats = d["patients"]
        p0 = pats[0] if pats else None
        rows.append((
            d["doc_id"],
            anonymize_number(hdr["docnum"]),
            anonymize_date_iso(hdr["date_iso"]),
            "; ".join(anonymize_person_name(m) for m in hdr["medics"]),
            anonymize_person_name(p0["persname"]) if p0 is not None else "",
            anonymize_number(p0["id"]) if p0 is not None else "",
            anonymize_address(p0["address"]) if p0 is not None else "",
        ))
    return rows


def expected_media_jpg(con, tier: str) -> list[tuple]:
    from grobid_medical_report_spark.functions.jpeg import (
        MediaFormatError, encode_jpeg, jpg_to_png)
    from grobid_medical_report_spark.functions.media import decode_png

    rows = []
    for did, text in _docs(con, tier):
        p = text.encode("utf-8")
        w = 8
        h = max(1, min(16, len(p) // (w * 3)))
        rgb = bytes(p[:w * h * 3]).ljust(w * h * 3, b"\x00")
        jpg = encode_jpeg(w, h, rgb)
        if did % 23 == 0:
            jpg = jpg[:len(jpg) // 2]
        try:
            png = jpg_to_png(jpg)
            rw, rh, rrgb = decode_png(png)
            err = int(np.abs(
                np.frombuffer(rrgb, np.uint8).astype(int)
                - np.frombuffer(rgb, np.uint8).astype(int)).max())
            ok = (rw, rh) == (w, h) and err <= 4
            rows.append((did, w, h, len(jpg), len(png), err,
                         "ok" if ok else "error: round-trip drift"))
        except MediaFormatError as exc:
            rows.append((did, w, h, len(jpg), 0, -1, f"error: {exc}"))
    return rows


def expected_media_wav(con, tier: str) -> list[tuple]:
    from grobid_medical_report_spark.functions.wav import (
        MediaFormatError, encode_wav, wav_features)

    rate = 8000
    rows = []
    for did, text in _docs(con, tier):
        if did % 2 != 0:          # media_table: pcm16 = even doc_ids
            continue
        p = text.encode("utf-8")
        n = 400 + (len(p) % 2000)
        freq = 100.0 + float(did % 40) * 20.0
        t = np.arange(n, dtype=np.float64) / rate
        tone = np.sin(2 * np.pi * freq * t)
        noise = (np.frombuffer(
            (p * (n // max(len(p), 1) + 1))[:n], dtype=np.uint8)
            .astype(np.float64) - 128.0) / 512.0
        sig = np.clip(tone * 0.5 + noise, -1.0, 1.0)
        sig[: n // 8] = 0.0
        wav = encode_wav((sig * 32767).astype("<i2"), rate)
        if did % 19 == 0:
            wav = wav[: len(wav) // 2]
        try:
            f = wav_features(wav)
            rows.append((did, len(wav), f["sample_rate"], f["n_frames"],
                         f["duration_sec"], f["rms"], f["peak"],
                         f["zero_cross_rate"], f["silence_ratio"], "ok"))
        except MediaFormatError as exc:
            rows.append((did, len(wav), 0, 0, 0.0, 0.0, 0.0, 0.0, 0.0,
                         f"error: {exc}"))
    return rows


def expected_media_video(con, tier: str, every: int = 3) -> list[tuple]:
    from grobid_medical_report_spark.functions.avi import (
        MediaFormatError, decode_avi, encode_avi, video_stats)

    w, h = 16, 12
    rows = []
    for did, text in _docs(con, tier):
        if did % 2 == 0:          # media_table: rgb8 = odd doc_ids
            continue
        p = text.encode("utf-8")
        n = 4 + (len(p) % 12)
        need = n * h * w * 3
        buf = np.frombuffer(
            (p * (need // max(len(p), 1) + 1))[:need], dtype=np.uint8)
        frames = buf.reshape(n, h, w, 3)
        avi = encode_avi(frames, fps=10)
        if did % 29 == 0:
            avi = avi[: len(avi) // 2]
        try:
            dec, fps = decode_avi(avi)
            assert np.array_equal(dec, frames)
            st = video_stats(avi)
            luma = dec.astype(np.float64) @ np.array([0.299, 0.587, 0.114])
            for idx in range(0, n, every):
                rows.append((did, idx, st["n_frames"], fps,
                             round(float(luma[idx].mean()), 6),
                             st["motion"], "ok"))
        except MediaFormatError as exc:
            rows.append((did, -1, 0, 0, 0.0, 0.0, f"error: {exc}"))
    return rows


def expected_winnowing(con, tier: str) -> list[tuple]:
    """Independent reference: winnow_fingerprints is the SAME pure numpy
    function make_winnow_golden.py's pair reference is built on (its
    winnowing guarantee and overlap behavior are pinned in
    tests/test_winnowing.py); this drives it in a plain loop over duckdb
    rows, independent of the Spark mapInPandas plumbing."""
    import hashlib

    from grobid_medical_report_spark.operators.dedup import \
        winnow_fingerprints

    rows = []
    for did, text in _docs(con, tier):
        sel = winnow_fingerprints(text)
        digest = hashlib.md5(sel.tobytes()).hexdigest()
        rows.append((did, len(text), int(sel.size), digest,
                     int(sel[0]) if sel.size else -1))
    return rows


def expected_media_features(con, tier: str) -> list[tuple]:
    """Plain loop over duckdb rows driving the same decode stub the Spark
    mapInPandas stage calls — independent of the Arrow/batch plumbing.
    Exploded long form (r7): one row per (doc, feat_idx)."""
    from grobid_medical_report_spark.operators.multimodal import decode_stub

    rows = []
    for did, text in _docs(con, tier):
        p = text.encode("utf-8")
        codec = "pcm16" if did % 2 == 0 else "rgb8"
        for k, v in enumerate(decode_stub(p, codec)):
            rows.append((did, codec, k, v))
    return rows


def expected_media_resize(con, tier: str, target: int = 16) -> list[tuple]:
    """The area-average bucket formula in a plain loop (rgb8 = odd doc_ids),
    independent of the Spark stage. Exploded long form (r7)."""
    rows = []
    for did, text in _docs(con, tier):
        if did % 2 == 0:          # media_table: rgb8 = odd doc_ids
            continue
        p = text.encode("utf-8")
        px = np.frombuffer(p, dtype=np.uint8).astype(np.float64)
        if px.size == 0:
            buckets = [0.0] * target
        else:
            edges = np.linspace(0, px.size, target + 1).astype(int)
            sums = np.add.reduceat(px, edges[:-1])
            widths = np.maximum(np.diff(edges), 1)
            buckets = np.round(sums / widths, 6).tolist()
        for k, v in enumerate(buckets):
            rows.append((did, len(p), k, v))
    return rows


def expected_media_ppm(con, tier: str) -> list[tuple]:
    from grobid_medical_report_spark.functions.media import (
        MediaFormatError, decode_png, make_ppm, ppm_to_png)

    rows = []
    for did, text in _docs(con, tier):
        p = text.encode("utf-8")
        w = 8
        h = max(1, min(16, len(p) // (w * 3)))
        rgb = bytes(p[:w * h * 3]).ljust(w * h * 3, b"\x00")
        ppm = make_ppm(w, h, rgb)
        if did % 17 == 0:
            ppm = ppm[:-5]
        try:
            png = ppm_to_png(ppm)
            rw, rh, rrgb = decode_png(png)
            ok = (rw, rh, rrgb) == (w, h, rgb)
            rows.append((did, w, h, len(ppm), len(png),
                         "ok" if ok else "error: round-trip mismatch"))
        except MediaFormatError as exc:
            rows.append((did, w, h, len(ppm), 0, f"error: {exc}"))
    return rows


def expected_frame_sample(con, tier: str, every: int = 4) -> list[tuple]:
    FRAME_BYTES = 256
    rows = []
    for did, text in _docs(con, tier):
        if did % 2 != 0:          # media_table: pcm16 = even doc_ids
            continue
        p = text.encode("utf-8")
        n_frames = len(p) // FRAME_BYTES
        if n_frames <= 0:
            continue
        buf = np.frombuffer(p[:n_frames * FRAME_BYTES], dtype=np.uint8)
        frames = buf.reshape(n_frames, FRAME_BYTES)[::every]
        for k, idx in enumerate(range(0, n_frames, every)):
            rows.append((did, idx, int(frames[k].sum(dtype=np.int64))))
    return rows


# ---------------------------------------------------------------------------
# table specs: (file stem, key SQL template + source, columns, builder)
# ---------------------------------------------------------------------------

def _schema(cols: list[tuple[str, pa.DataType]]) -> pa.schema:
    return pa.schema([("corpus_md5", pa.string())] + cols)


SPECS = {
    "expected_bpe_merges": dict(
        key_sql=DOCS200_MD5_SQL, key_src="documents",
        cols=[("rank", pa.int32()), ("left", pa.string()),
              ("right", pa.string()), ("new_symbol", pa.string()),
              ("count", pa.int64())],
        build=expected_bpe),
    "expected_compression": dict(
        key_sql=DOCS_MD5_SQL, key_src="documents",
        cols=[("doc_id", pa.int64()), ("raw_bytes", pa.int32()),
              ("zlib_bytes", pa.int32()), ("ratio_permille", pa.int32())],
        build=expected_compression),
    "expected_media_jpg": dict(
        key_sql=DOCS_MD5_SQL, key_src="documents",
        cols=[("doc_id", pa.int64()), ("width", pa.int32()),
              ("height", pa.int32()), ("jpg_bytes", pa.int32()),
              ("png_bytes", pa.int32()), ("max_err", pa.int32()),
              ("status", pa.string())],
        build=expected_media_jpg),
    "expected_media_wav": dict(
        key_sql=DOCS_MD5_SQL, key_src="documents",
        cols=[("doc_id", pa.int64()), ("wav_bytes", pa.int32()),
              ("sample_rate", pa.int32()), ("n_frames", pa.int32()),
              ("duration_sec", pa.float64()), ("rms", pa.float64()),
              ("peak", pa.float64()), ("zero_cross_rate", pa.float64()),
              ("silence_ratio", pa.float64()), ("status", pa.string())],
        build=expected_media_wav),
    "expected_media_video": dict(
        key_sql=DOCS_MD5_SQL, key_src="documents",
        cols=[("doc_id", pa.int64()), ("frame_idx", pa.int32()),
              ("n_frames", pa.int32()), ("fps", pa.int32()),
              ("frame_luma", pa.float64()), ("motion", pa.float64()),
              ("status", pa.string())],
        build=expected_media_video),
    "expected_media_ppm": dict(
        key_sql=DOCS_MD5_SQL, key_src="documents",
        cols=[("doc_id", pa.int64()), ("width", pa.int32()),
              ("height", pa.int32()), ("ppm_bytes", pa.int32()),
              ("png_bytes", pa.int32()), ("status", pa.string())],
        build=expected_media_ppm),
    "expected_frame_sample": dict(
        key_sql=DOCS_MD5_SQL, key_src="documents",
        cols=[("doc_id", pa.int64()), ("frame_idx", pa.int32()),
              ("checksum", pa.int64())],
        build=expected_frame_sample),
    "expected_winnowing": dict(
        key_sql=DOCS_MD5_SQL, key_src="documents",
        cols=[("doc_id", pa.int64()), ("n_chars", pa.int32()),
              ("n_fingerprints", pa.int32()), ("fp_digest", pa.string()),
              ("min_fingerprint", pa.int64())],
        build=expected_winnowing),
    "expected_media_features": dict(
        key_sql=DOCS_MD5_SQL, key_src="documents",
        cols=[("doc_id", pa.int64()), ("codec", pa.string()),
              ("feat_idx", pa.int32()), ("value", pa.float64())],
        build=expected_media_features),
    "expected_media_resize": dict(
        key_sql=DOCS_MD5_SQL, key_src="documents",
        cols=[("doc_id", pa.int64()), ("src_bytes", pa.int32()),
              ("bucket_idx", pa.int32()), ("value", pa.float64())],
        build=expected_media_resize),
}

ANN_SPECS = {
    "expected_ann_lsh": "x_emb_ann_lsh",
    "expected_ann_ivf": "x_emb_ann_ivf",
}
ANN_COLS = [("query_id", pa.int64()), ("vec_id", pa.int64()),
            ("sim", pa.float64()), ("rank", pa.int32())]

#: x_sketches reads lineitem + events — its key digests both tables.
#: Spark-frozen truth (HLL++/GK sketches are Spark's own mergeable
#: implementations — deterministic across partitionings, verified at 8
#: and 32 cores; the exact_* columns cross-check them in the row itself).
SKETCH_KEY_SQL = (
    "SELECT md5((SELECT string_agg(l_orderkey || chr(31) || l_linenumber "
    "|| chr(31) || l_partkey || chr(31) || l_extendedprice, chr(30) "
    "ORDER BY l_orderkey, l_linenumber) FROM {li}) || chr(29) || "
    "(SELECT string_agg(event_id || chr(31) || user_id || chr(31) || "
    "value, chr(30) ORDER BY event_id) FROM {ev}))")
SKETCH_COLS = [("table_name", pa.string()), ("approx_keys", pa.int64()),
               ("exact_keys", pa.int64()), ("approx_p50", pa.float64()),
               ("exact_p50", pa.float64()), ("approx_p95", pa.float64()),
               ("exact_p95", pa.float64())]


def write_keyed(stem: str, spec: dict) -> None:
    import duckdb

    con = duckdb.connect()
    data: dict[str, list] = {"corpus_md5": []}
    names = [c for c, _t in spec["cols"]]
    for c in names:
        data[c] = []
    for tier in TIERS:
        src = f"read_parquet('{tier}/documents.parquet')"
        key = con.execute(
            spec["key_sql"].format(src=src)).fetchone()[0]
        rows = spec["build"](con, tier)
        print(f"{stem} {tier}: key={key[:12]}... rows={len(rows)}")
        for r in rows:
            data["corpus_md5"].append(key)
            for c, v in zip(names, r):
                data[c].append(v)
    t = pa.table(data, schema=_schema(spec["cols"]))
    pq.write_table(t, os.path.join(OUT_DIR, f"{stem}.parquet"))


def expected_training(n_docs: int = 200) -> list[tuple]:
    """INDEPENDENT of the Spark plumbing: the per-doc training-row logic
    (_training_batches) driven by a plain pandas loop over generate_doc
    fixtures — the same discipline as the media goldens. The corpus is a
    pure function of (seed, index) and n=200 is constant at every tier
    (documents.parquet holds >=500 docs in all of them), so the table is
    a plain golden like expected_anonymize."""
    import pandas as pd

    from grobid_medical_report_spark.corpus import generate_doc
    from grobid_medical_report_spark.operators.training import \
        _training_batches

    rows = []
    for i in range(n_docs):
        d = generate_doc(i)
        pdf = pd.DataFrame({"doc_id": [d["doc_id"]], "spans": [d["spans"]]})
        for out in _training_batches(iter([pdf])):
            for r in out.itertuples(index=False):
                f = r.features
                rows.append((r.model, r.doc_id, r.line_idx, r.tok_idx,
                             r.text, r.label, f["n_chars"], f["n_tokens"],
                             f["upper_ratio"], f["digit_ratio"],
                             f["punct_profile"], f["ends_colon"],
                             f["starts_dash"], f["rel_pos_bin"],
                             f["repeat_count"], f["is_media"]))
    return rows


def write_training() -> None:
    rows = expected_training()
    cols = [("model", pa.string()), ("doc_id", pa.string()),
            ("line_idx", pa.int32()), ("tok_idx", pa.int32()),
            ("text", pa.string()), ("label", pa.string()),
            ("n_chars", pa.int32()), ("n_tokens", pa.int32()),
            ("upper_ratio", pa.float64()), ("digit_ratio", pa.float64()),
            ("punct_profile", pa.string()), ("ends_colon", pa.bool_()),
            ("starts_dash", pa.bool_()), ("rel_pos_bin", pa.int32()),
            ("repeat_count", pa.int32()), ("is_media", pa.bool_())]
    names = [c for c, _ in cols]
    data = {c: [r[i] for r in rows] for i, c in enumerate(names)}
    t = pa.table(data, schema=pa.schema(cols))
    print(f"expected_training: rows={len(rows)}")
    pq.write_table(t, os.path.join(OUT_DIR, "expected_training.parquet"))


EVAL_STEMS = {
    "expected_eval_segmenter": "x_eval_segmenter",
    "expected_eval_ner": "x_eval_ner",
    "expected_eval_body": "x_eval_body",
    "expected_eval_header_fields": "x_eval_header_fields",
}
EVAL_COLS = [("label", pa.string()), ("support", pa.int64()),
             ("precision", pa.float64()), ("recall", pa.float64()),
             ("f1", pa.float64())]


def write_evals() -> None:
    """SPARK-FROZEN metric pins (VERDICT r6 item 3): the four eval-harness
    queries are deterministic given the committed model JSONs and the
    seeded corpus (P/R/F are divisions of EXACT integer counts rounded to
    4 — no double partial-sum ambiguity), and clamp to n=200 docs at every
    tier. The independent truth signal is tests/test_evaluation.py, which
    asserts f1 == 1.0 per label on the golden corpus; these goldens pin
    the full metric table for the driver's hash gate."""
    from grobid_medical_report_spark.session import get_spark

    import __spark_entry__ as entrymod

    spark = get_spark("make_query_goldens")
    spark.sparkContext.setLogLevel("ERROR")
    names = [c for c, _ in EVAL_COLS]
    for stem, qname in EVAL_STEMS.items():
        fn = getattr(entrymod, qname)
        rows = [tuple(r) for r in fn(spark, TIERS[1]).collect()]
        data = {c: [r[i] for r in rows] for i, c in enumerate(names)}
        t = pa.table(data, schema=pa.schema(EVAL_COLS))
        print(f"{stem}: rows={len(rows)}")
        pq.write_table(t, os.path.join(OUT_DIR, f"{stem}.parquet"))


def write_anonymize() -> None:
    rows = expected_anonymize()
    cols = ["doc_id", "docnum_anon", "date_anon", "medics_anon",
            "patient_anon", "patient_id_anon", "address_anon"]
    data = {c: [r[i] for r in rows] for i, c in enumerate(cols)}
    t = pa.table(data, schema=pa.schema([(c, pa.string()) for c in cols]))
    print(f"expected_anonymize: rows={len(rows)}")
    pq.write_table(t, os.path.join(OUT_DIR, "expected_anonymize.parquet"))


def write_sketches(spark=None) -> None:
    import duckdb

    from grobid_medical_report_spark.operators.sketches import x_sketches
    from grobid_medical_report_spark.session import get_spark

    if spark is None:
        spark = get_spark("make_query_goldens")
        spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    data: dict[str, list] = {"corpus_md5": []}
    names = [c for c, _t in SKETCH_COLS]
    for c in names:
        data[c] = []
    for tier in TIERS:
        key = con.execute(SKETCH_KEY_SQL.format(
            li=f"read_parquet('{tier}/lineitem.parquet')",
            ev=f"read_parquet('{tier}/events.parquet')")).fetchone()[0]
        rows = [tuple(r) for r in x_sketches(spark, tier).collect()]
        print(f"expected_sketches {tier}: key={key[:12]}... rows={len(rows)}")
        for r in rows:
            data["corpus_md5"].append(key)
            for c, v in zip(names, r):
                data[c].append(v)
    t = pa.table(data, schema=_schema(SKETCH_COLS))
    pq.write_table(t, os.path.join(OUT_DIR, "expected_sketches.parquet"))


def write_ann() -> None:
    """Spark-frozen blocks (approximate-by-design operators: recall is
    pinned in tests/test_similarity_ann.py; the golden pins determinism
    and corpus binding for the driver gate)."""
    import duckdb

    from grobid_medical_report_spark.operators import similarity
    from grobid_medical_report_spark.session import get_spark

    spark = get_spark("make_query_goldens")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for stem, qname in ANN_SPECS.items():
        fn = getattr(similarity, qname)
        data: dict[str, list] = {"corpus_md5": []}
        names = [c for c, _t in ANN_COLS]
        for c in names:
            data[c] = []
        for tier in TIERS:
            src = f"read_parquet('{tier}/embeddings.parquet')"
            key = con.execute(EMB_MD5_SQL.format(src=src)).fetchone()[0]
            rows = [tuple(r) for r in fn(spark, tier).collect()]
            print(f"{stem} {tier}: key={key[:12]}... rows={len(rows)}")
            for r in rows:
                data["corpus_md5"].append(key)
                for c, v in zip(names, r):
                    data[c].append(v)
        t = pa.table(data, schema=_schema(ANN_COLS))
        pq.write_table(t, os.path.join(OUT_DIR, f"{stem}.parquet"))


def main() -> None:
    """Regenerate all goldens, or only those whose stem contains the
    optional ``sys.argv[1]`` substring (keeps unrelated committed parquet
    byte-identical when promoting a single query)."""
    flt = sys.argv[1] if len(sys.argv) > 1 else ""
    os.makedirs(OUT_DIR, exist_ok=True)
    for stem, spec in SPECS.items():
        if flt in stem:
            write_keyed(stem, spec)
    if flt in "expected_anonymize":
        write_anonymize()
    if flt in "expected_training":
        write_training()
    if any(flt in s for s in EVAL_STEMS):
        write_evals()
    if any(flt in s for s in ANN_SPECS):
        write_ann()
    if flt in "expected_sketches":
        write_sketches()
    print("done")


if __name__ == "__main__":
    main()
