"""French-format date parsing -> ISO (yyyy-mm-dd).

Analog of the reference's date normalization
(HeaderMedicalParser.getNormalizedDate:394-403 delegating to GROBID's
DateParser; TEIFormatter.toISOString:84-113).  Handles the formats the
reference documents in doc/API_service.md examples: ``14/03/2017``,
``20.9.2018``, ``29-04-2000``, ``7 août 2019``, two-digit years.
"""

from __future__ import annotations

import re

from .lexicon import FR_MONTHS

_NUMERIC_RE = re.compile(r"\b(\d{1,2})[/.\-](\d{1,2})[/.\-](\d{2,4})\b")
_TEXTUAL_RE = re.compile(
    r"\b(\d{1,2})(?:er)?\s+([a-zéûôà]+)\s+(\d{4})\b", re.IGNORECASE
)
_DM_RE = re.compile(r"\b(\d{1,2})/(\d{1,2})\b")  # day/month, no year (fixture '10/02')


def _iso(y: int, m: int, d: int) -> str | None:
    if y < 100:
        y += 2000 if y < 50 else 1900
    if not (1 <= m <= 12 and 1 <= d <= 31):
        return None
    return f"{y:04d}-{m:02d}-{d:02d}"


def parse_date_iso(s: str) -> str | None:
    """Extract the first date in ``s`` and normalize to ISO, else None."""
    m = _NUMERIC_RE.search(s)
    if m:
        d, mo, y = int(m.group(1)), int(m.group(2)), int(m.group(3))
        return _iso(y, mo, d)
    m = _TEXTUAL_RE.search(s)
    if m:
        month = FR_MONTHS.get(m.group(2).lower())
        if month:
            return _iso(int(m.group(3)), month, int(m.group(1)))
    return None


def find_date_text(s: str) -> str | None:
    """Return the raw date substring as it appears (for NER <date> spans)."""
    m = _NUMERIC_RE.search(s)
    if m:
        return m.group(0)
    m = _TEXTUAL_RE.search(s)
    if m and m.group(2).lower() in FR_MONTHS:
        return m.group(0)
    m = _DM_RE.search(s)
    if m:
        return m.group(0)
    return None
