"""Property-based robustness: the kernel must never raise, must be
order-invariant, and must emit dense span orders — for ANY input shape."""

from hypothesis import given, settings
from hypothesis import strategies as st

from grobid_medical_report_spark.operators.assemble import extract_doc
from grobid_medical_report_spark.operators.ner import extract_entities

span_st = st.fixed_dictionaries({
    "kind": st.sampled_from(["text", "media"]),
    "text": st.text(max_size=80),
    "media_ref": st.text(
        alphabet="abc_0123456789", max_size=12),
    "offset": st.integers(min_value=0, max_value=10_000),
})


@settings(max_examples=150, deadline=None)
@given(st.lists(span_st, max_size=30))
def test_never_raises_and_orders_dense(spans):
    r = extract_doc("fuzz", spans)
    assert r["status"] in ("ok", "empty") or r["status"].startswith("error:")
    orders = [s["order"] for s in r["spans"]]
    assert orders == list(range(len(orders)))
    for e in r["entities"]:
        assert 0 <= e["span_order"] < len(r["spans"])


@settings(max_examples=60, deadline=None)
@given(st.lists(span_st, max_size=20), st.randoms())
def test_offset_order_invariance(spans, rnd):
    # dedupe offsets so reading order is well-defined
    seen = set()
    uniq = []
    for s in spans:
        if s["offset"] not in seen:
            seen.add(s["offset"])
            uniq.append(s)
    shuffled = list(uniq)
    rnd.shuffle(shuffled)
    a = extract_doc("fz", uniq)
    b = extract_doc("fz", shuffled)
    assert a == b


@settings(max_examples=150, deadline=None)
@given(st.text(max_size=300))
def test_ner_never_raises_offsets_exact(text):
    for e in extract_entities(text):
        assert text[e["start"]:e["end"]] == e["text"]


layout_span_st = st.fixed_dictionaries({
    "kind": st.sampled_from(["text", "media"]),
    "text": st.text(max_size=60),
    "media_ref": st.text(alphabet="abc_0123456789", max_size=8),
    "offset": st.integers(min_value=0, max_value=10_000),
    "font": st.sampled_from(["Times", "Garamond", "", "Æ©"]),
    "font_size": st.one_of(st.none(), st.floats(
        min_value=-1e3, max_value=1e3, allow_nan=False)),
    "bold": st.booleans(),
    "italic": st.booleans(),
    "x": st.one_of(st.none(), st.floats(
        min_value=-1e6, max_value=1e6, allow_nan=False)),
    "y": st.floats(min_value=0, max_value=1e6, allow_nan=False),
})


@settings(max_examples=150, deadline=None)
@given(st.lists(layout_span_st, max_size=30))
def test_layout_kernel_never_raises(spans):
    """Degenerate layout attrs (negative/huge sizes, null x, unicode fonts)
    must route to status, never poison the partition."""
    r = extract_doc("fuzz-layout", spans)
    assert r["status"] in ("ok", "empty") or r["status"].startswith("error:")
    orders = [s["order"] for s in r["spans"]]
    assert orders == list(range(len(orders)))
