"""Micro-A/B for the NER per-hit loops (OPTIMIZATION_r08 'not yet
optimized' item 3): capture the exact unique-paragraph set the kernel
feeds to NER on N generated docs, then time candidates()/fuzzy_candidates()
variants interleaved in one process, asserting output identity on every
text first.

Usage: python tools/exp_ner_loops.py [n_docs] [rounds]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
from grobid_medical_report_spark.corpus import generate_doc  # noqa: E402
from grobid_medical_report_spark.operators import assemble, ner  # noqa: E402


def capture_texts(n_docs: int) -> list[str]:
    """Unique paragraph texts, first-seen order, as fed to extract_entities
    during a cold kernel pass."""
    seen: set[str] = set()
    texts: list[str] = []
    orig = ner.extract_entities

    def rec(text: str):
        if text not in seen:
            seen.add(text)
            texts.append(text)
        return orig(text)

    bench.clear_kernel_caches()
    assemble.extract_entities = rec
    try:
        for i in range(n_docs):
            d = generate_doc(i)
            r = assemble.extract_doc(d["doc_id"], d["spans"])
            assert r["status"] == "ok"
    finally:
        assemble.extract_entities = orig
    return texts


def time_fn(fn, texts, rounds: int, clear: bool) -> list[float]:
    out = []
    for _ in range(rounds):
        if clear:
            bench.clear_kernel_caches()
            # re-warm the fold memo so we time the loop, not translate
        t0 = time.perf_counter()
        for t in texts:
            fn(t)
        out.append(time.perf_counter() - t0)
    return out


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1500
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    texts = capture_texts(n_docs)
    print(f"{len(texts)} unique paragraph texts from {n_docs} docs")

    # component timings, memo-hot (the fold/memos are warmed by capture)
    import cProfile
    import pstats

    variants = [("candidates", ner.candidates),
                ("fuzzy_candidates", ner.fuzzy_candidates)]
    extra = []
    for name in ("candidates_v2", "fuzzy_candidates_v2"):
        fn = getattr(ner, name, None)
        if fn is not None:
            extra.append((name, fn))
    # identity check for any _v2 variant
    for name, fn in extra:
        base = ner.candidates if name.startswith("candidates") \
            else ner.fuzzy_candidates
        for t in texts:
            a, b = base(t), fn(t)
            assert list(a) == list(b), (name, t)
        print(f"{name}: output identical on all {len(texts)} texts")

    allv = variants + extra
    times = {name: [] for name, _ in allv}
    for _ in range(rounds):
        for name, fn in allv:
            t0 = time.perf_counter()
            for t in texts:
                fn(t)
            times[name].append(time.perf_counter() - t0)
    for name, ts in times.items():
        print(f"{name}: best={min(ts):.3f}s trials="
              f"{[round(x, 3) for x in ts]}")

    # one profiled pass over the two base fns for the hotspot table
    pr = cProfile.Profile()
    pr.enable()
    for t in texts:
        ner.candidates(t)
        ner.fuzzy_candidates(t)
    pr.disable()
    st = pstats.Stats(pr)
    st.sort_stats("cumulative").print_stats(18)


if __name__ == "__main__":
    main()
