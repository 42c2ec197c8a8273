"""Sentence segmentation with offset tracking (SURVEY.md X10).

Analog of the reference's ClearNLP-dictionary sentence splitter
(FrenchMedicalNERParser.sentenceSegmentation:951-998, offset realignment loop
:979-996; optionally applied at TEI render time,
TEIFormatter.segmentIntoSentences:1031): rule-based boundary detection —
a period followed by whitespace and an uppercase/digit sentence opener —
returning character ranges into the original string, never a copy that could
drift from entity offsets.
"""

from __future__ import annotations

import re
from functools import lru_cache

# a sentence ends with '.' or with a trailing parenthetical callout ')'
_BOUNDARY = re.compile(r"(?<=[.)])\s+(?=[A-ZÀ-ÖØ-Þ0-9ÉÈÊ])")


@lru_cache(maxsize=65536)
def split_sentences(text: str) -> list[tuple[int, int]]:
    """Half-open (start, end) char ranges of sentences in ``text``.
    Memoized per worker (pure; boilerplate lines repeat — see
    operators/ner.py). Callers must not mutate the returned list."""
    if not text:
        return []
    spans: list[tuple[int, int]] = []
    start = 0
    for m in _BOUNDARY.finditer(text):
        spans.append((start, m.start()))
        start = m.end()
    spans.append((start, len(text)))
    return spans
