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


# --------------------------------------------------------------------------
# OCR-confusion fold (r5): canonical representative per confusion class.
# Scanned text swaps characters within classes (o<->0, l/I<->1, e<->c,
# a<->o, n<->m, u<->v, t<->f, 5<->S, 8<->B, 2<->Z, accents); folding both
# a keyword and the text makes the keyword match through any number of
# in-class substitutions: ocr_fold('D0xycyc1ine') == ocr_fold('Doxycycline').
# 1 char -> 1 char and \w stays \w, so offsets and token spans survive.
# Shared by the NER fuzzy-candidate scan and the damage-tolerant line
# features of the segmenter/header/leftnote models (EVAL.md noisy tier).
# --------------------------------------------------------------------------

_OCR_FOLD_ACCENTS = {"é": "e", "è": "e", "ê": "e", "ë": "e", "à": "a",
                     "â": "a", "ô": "o", "î": "i", "ï": "i", "û": "u",
                     "ù": "u", "ç": "c"}
_OCR_FOLD_CLASSES = {"a": "o", "0": "o", "c": "e", "m": "n", "v": "u",
                     "f": "t", "l": "i", "1": "i", "5": "s", "8": "b",
                     "2": "z"}
# accent strip must CHAIN into the class map ('à' -> 'a' -> 'o'): an
# accent-stripped char must land on the same representative as its
# corrupted twin, or fold('à') != fold(corrupt('à'))
_OCR_FOLD_TBL = str.maketrans({
    **{k: _OCR_FOLD_CLASSES.get(v, v) for k, v in _OCR_FOLD_ACCENTS.items()},
    **_OCR_FOLD_CLASSES})


from functools import lru_cache as _lru_cache


@_lru_cache(maxsize=131072)
def ocr_fold(text: str) -> str:
    """Lowercase, accent-strip, then map every char to its OCR-confusion
    class representative (length-preserving). Memoized (r7): the fold is
    recomputed for the SAME line by several featurizers (segmenter fuzzy
    facts, header/leftnote probes, body damage signatures) — ~145k calls
    per 1500 cold docs over far fewer distinct strings."""
    return text.lower().translate(_OCR_FOLD_TBL)


def anchored_search(text: str, lits: tuple[str, ...], rx: re.Pattern) -> bool:
    """``rx.search(text) is not None`` for a literal-anchored pattern:
    every match of ``rx`` starts with one of ``lits`` verbatim, so C-level
    ``str.find`` locates the only possible start positions and the regex
    runs anchored there (``rx.match(text, p)`` still evaluates lookbehind /
    ``\\b`` guards against the preceding context). Existence-equivalence
    (r8): a search hit starts at a literal occurrence, and a match at a
    literal occurrence is a search hit."""
    find = text.find
    rxm = rx.match
    for lit in lits:
        i = find(lit)
        while i != -1:
            if rxm(text, i):
                return True
            i = find(lit, i + 1)
    return False
