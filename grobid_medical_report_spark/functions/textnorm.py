"""Text normalization kernels (pure Python/regex; used inside Arrow UDFs).

Fixture-critical functions (SURVEY.md §2.10):

* :func:`dehyphenize_join` — the analog of GROBID's
  ``LayoutTokensUtil.normalizeDehyphenizeText`` (used by the reference at
  HeaderMedicalParser.java:1241 and TEIFormatter.java:808): when a line ends
  with ``<word>-`` and the next line starts with a lowercase word, the hyphen
  is a line-break artifact and the two word halves are rejoined.
* :func:`normalize_space` — collapse whitespace runs, strip.
* :func:`is_different_content` — the redundancy predicate of
  HeaderMedicalParser.java:1355-1370 (lowercased, space-stripped equality)
  guarding ``"; "`` field appends.
"""

from __future__ import annotations

import re

_WS_RE = re.compile(r"\s+")
_HYPHEN_JOIN_RE = re.compile(r"(\w)-[ ]+(?=[a-zàâäéèêëîïôöùûüç])", re.UNICODE)


def normalize_space(s: str) -> str:
    # fast path: already single-spaced (the overwhelmingly common case)
    if "  " not in s and "\n" not in s and "\t" not in s:
        return s.strip()
    return _WS_RE.sub(" ", s).strip()


def dehyphenize_join(lines: list[str]) -> str:
    """Join consecutive lines into one normalized string, repairing
    end-of-line hyphenation (``exa-`` + ``men`` -> ``examen``)."""
    joined = normalize_space(" ".join(lines))
    # fast path: the repair pattern requires a hyphen (most lines have none)
    if "-" not in joined:
        return joined
    return _HYPHEN_JOIN_RE.sub(r"\1", joined)


def squash_key(s: str) -> str:
    """Lowercased, whitespace-stripped comparison key."""
    return _WS_RE.sub("", s).lower()


def is_different_content(existing: str, candidate: str) -> bool:
    """True when ``candidate`` adds new content vs ``existing``
    (reference: HeaderMedicalParser.isDifferentContent:1355-1370)."""
    if not existing:
        return bool(candidate)
    return squash_key(candidate) not in squash_key(existing)


def merge_field(existing: str, candidate: str, sep: str = "; ") -> str:
    """Set-or-append with dedup (reference A1 concat-merge semantics)."""
    candidate = normalize_space(candidate)
    if not existing:
        return candidate
    if is_different_content(existing, candidate):
        return existing + sep + candidate
    return existing


def title_case(s: str) -> str:
    """Analog of FullMedicalTextParser.toTitleCase:6097-6118."""
    return " ".join(w[:1].upper() + w[1:].lower() if w else w for w in s.split(" "))


_PUNCT = set(",;:.!?()[]{}'\"-/")


def punctuation_profile(s: str) -> str:
    """Ordered string of punctuation chars in ``s``
    (reference: TextUtilities.punctuationProfile, used at
    MedicalReportSegmenterParser.java:448)."""
    return "".join(ch for ch in s if ch in _PUNCT)
