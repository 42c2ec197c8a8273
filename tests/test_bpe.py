"""Distributed BPE training vs the textbook reference implementation
(Sennrich et al. 2016 learn_bpe): merge-for-merge equality including the
deterministic tie-break (max count, then lexicographic pair)."""

from __future__ import annotations

from collections import Counter

from grobid_medical_report_spark.operators.bpe import (END, train_bpe,
                                                       word_counts)

SF = "/root/testdata/sf0.001"
N_MERGES = 8
LIMIT = 120


def _reference_bpe(wc: dict[str, int], n_merges: int):
    """Pure-Python textbook BPE on a word-frequency dict."""
    vocab = {tuple(list(w) + [END]): n for w, n in wc.items()}
    merges = []
    for rank in range(n_merges):
        pairs: Counter = Counter()
        for syms, n in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += n
        if not pairs:
            break
        # tie-break: max count, then lexicographic min pair (tuple order ==
        # the engine's asc on the \x00-joined pair string, since \x00 sorts
        # below every symbol char)
        top_count = max(pairs.values())
        best = min(p for p, c in pairs.items() if c == top_count)
        if top_count < 2:
            break
        a, b = best
        merges.append({"rank": rank, "left": a, "right": b,
                       "new_symbol": a + b, "count": top_count})
        new_vocab = {}
        for syms, n in vocab.items():
            res = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    res.append(a + b)
                    i += 2
                else:
                    res.append(syms[i])
                    i += 1
            new_vocab[tuple(res)] = new_vocab.get(tuple(res), 0) + n
        vocab = new_vocab
    return merges


def test_distributed_bpe_equals_textbook(spark):
    got = train_bpe(spark, SF, n_merges=N_MERGES, limit_docs=LIMIT)
    wc = {r["w"]: r["n"]
          for r in word_counts(spark, SF, limit_docs=LIMIT).collect()}
    want = _reference_bpe(wc, N_MERGES)
    assert len(got) == len(want) > 0
    for g, w in zip(got, want):
        assert g == w, (g, w)


def test_merges_actually_compress(spark):
    """Each learned merge has count >= 2 and the merge table is ranked by
    construction; merged symbols grow monotonically in length."""
    got = train_bpe(spark, SF, n_merges=5, limit_docs=LIMIT)
    assert all(m["count"] >= 2 for m in got)
    assert [m["rank"] for m in got] == list(range(len(got)))
    assert all(len(m["new_symbol"]) >= 2 for m in got)
