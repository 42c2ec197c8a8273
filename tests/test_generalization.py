"""Far-out-of-training generalization: the FITTED models must reproduce
the generator's truth on doc indices far beyond both the training range
(0..299) and the golden tables (0..499) — the seeded generator is pure in
(seed, index), so any index is a valid held-out sample. This is the
committed form of the builder's 800-doc smoke: if a retrain ever overfits
a quirk of the early docs, this range fails first."""

from __future__ import annotations

import numpy as np

from grobid_medical_report_spark.corpus import ZONE_OF, generate_doc
from grobid_medical_report_spark.operators.assemble import extract_doc

LO, HI = 2000, 2160


def test_full_contract_far_out_of_training():
    n_mixed = 0
    for i in range(LO, HI):
        d = generate_doc(i)
        r = extract_doc(d["doc_id"], d["spans"])
        assert r["status"] == "ok", (i, r["status"])
        # span-sequence equality — the north-rule invariant
        got = [(s["kind"], s["text"], s["media_ref"]) for s in r["spans"]]
        want = [(s["kind"], s["text"], s["media_ref"])
                for s in d["expected_spans"]]
        assert got == want, i
        # header scalar fields + patient struct (the token-tagger surface)
        for k in ("docnum", "doctype", "date_iso", "time", "dateline"):
            assert r["header"][k] == d["header"][k], (i, k)
        assert r["header"]["medics"] == d["header"]["medics"], i
        assert r["header"]["patients"] == d["header"]["patients"], i
        gp, wp = r["patients"][0], d["patients"][0]
        for k in ("id", "persname", "birthdate", "age", "address"):
            assert gp[k] == wp[k], (i, k)
        # left-note incl. the combined-line settlement recovery
        for k in ("org", "address", "settlement", "phone", "fax"):
            assert r["leftnote"][k] == d["leftnote"][k], (i, k)
        # zones
        got_z = [(z["zone"], z["start"], z["end"]) for z in r["zones"]]
        want_z = [(z["zone"], z["start"], z["end"]) for z in d["zones"]]
        assert got_z == want_z, i
        # entities / sentences / markers
        got_e = [(e["type"], e["text"], e["start"], e["end"],
                  e["span_order"]) for e in r["entities"]]
        want_e = [(e["type"], e["text"], e["start"], e["end"],
                   e["span_order"]) for e in d["entities"]]
        assert got_e == want_e, i
        assert len(r["sentences"]) == len(d["sentences"]), i
        got_m = [(m["span_order"], m["marker_kind"], m["target"])
                 for m in r["markers"]]
        want_m = [(m["span_order"], m["marker_kind"], m["target"])
                  for m in d["markers"]]
        assert got_m == want_m, i
        n_mixed += any("demeurant" in (s["text"] or "")
                       and (s["text"] or "").startswith(("Madame",
                                                         "Monsieur"))
                       for s in d["spans"])
    # the range must actually exercise the mixed-line tagger path
    assert n_mixed > 30, n_mixed


def test_segmenter_far_out_of_training():
    from grobid_medical_report_spark.operators import segmenter as seg

    for i in range(LO, LO + 60):
        d = generate_doc(i)
        texts = [s["text"] for s in d["spans"]]
        is_media = np.array([s["kind"] == "media" for s in d["spans"]])
        got = seg.segment_doc(texts, is_media)
        want = [ZONE_OF[lab] for lab in d["line_labels"]]
        assert got == want, i
