"""Anonymizer family (X9): the reference's six variants, deterministic.

Re-expresses AnonymizeData.java:21-349 — number masking, person-name
substitution (case-preserving), email local-part substitution, address
anonymization (building number / postcode / city), ISO-date anonymization
(year re-based, patient mode shifts 1..200 years back, random VALID
day/month incl. leap handling), and raw-date shape detection — with one
engine-level change: where the reference draws from ``Math.random()``
(irreproducible), every draw here comes from a generator seeded by the
input string, so anonymization is a PURE FUNCTION (same input, same
output — required for distributed re-runs and the test oracle) while
remaining non-invertible in the reference's sense.
"""

from __future__ import annotations

import random
import re
import zlib

from . import lexicon as lex

#: substitution pools (the reference reads PERSNAME_ANONYM.txt /
#: ADDRESS_ANONYM.txt lexicon files)
_NAME_POOL = sorted(set(lex.FIRST_NAMES) | {n.title() for n in lex.LAST_NAMES})
_CITY_POOL = sorted(set(lex.CITIES))

#: stable year base for date re-basing — the reference uses the wall-clock
#: current year, which would make outputs drift day to day; pinned here
BASE_YEAR = 2026

RE_DATE_SHAPES = tuple(re.compile(p) for p in (
    r"^\d+/\d+/\d{4}$", r"^\d+ \d+ \d{4}$", r"^\d+-\d+-\d{4}$",
    r"^\d+\.\d+\.\d{4}$", r"^\d+ \D+ \d{4}$", r"^\d+\.\D+\.\d{4}$"))

_MONTHS = ("janvier", "février", "mars", "avril", "mai", "juin", "juillet",
           "août", "septembre", "octobre", "novembre", "décembre")
_DAYS_31 = {1, 3, 5, 7, 8, 10, 12}


def _rng(s: str, salt: str) -> random.Random:
    return random.Random(zlib.crc32(f"{salt}\x00{s}".encode()))


def anonymize_number(idno: str) -> str:
    """Every digit replaced by a (seeded) random digit; non-digits kept."""
    rng = _rng(idno, "num")
    return "".join(str(rng.randrange(10)) if c.isdigit() else c
                   for c in idno)


def anonymize_person_name(pers_name: str) -> str:
    """Per-token substitution from the name pool; an ALL-UPPERCASE token
    (French surname convention) maps to an uppercase substitute."""
    rng = _rng(pers_name, "name")
    out = []
    for tok in pers_name.split(" "):
        if not tok:
            continue
        sub = _NAME_POOL[rng.randrange(len(_NAME_POOL))]
        out.append(sub.upper() if tok == tok.upper() else sub)
    return " ".join(out)


def anonymize_email(email: str) -> str:
    """Local-part name tokens substituted (lowercase), domain preserved."""
    if "@" not in email:
        return email
    local, domain = email.split("@", 1)
    parts = [anonymize_person_name(p).strip().lower()
             for p in local.split(".")]
    return ".".join(parts) + "@" + domain


def anonymize_address(address: str) -> str:
    """Building number and postcode re-randomized, a known city substituted
    (case-preserving); street words kept."""
    rng = _rng(address, "addr")
    toks = address.split(" ")
    out = []
    for tok in toks:
        core = tok.rstrip(",;")
        tail = tok[len(core):]
        if re.fullmatch(r"\d{5}", core):              # postcode
            out.append(f"{rng.randrange(10, 96) * 1000:05d}" + tail)
        elif re.fullmatch(r"\d{1,3}", core):          # building number
            out.append(anonymize_number(core) + tail)
        elif core.upper() in {c.upper() for c in _CITY_POOL}:
            sub = _CITY_POOL[rng.randrange(len(_CITY_POOL))]
            out.append((sub.upper() if core.isupper() else sub) + tail)
        else:
            out.append(tok)
    return " ".join(out)


def _is_leap(year: int) -> bool:
    """Proper Gregorian test — the reference checks ``currentYear % 4`` even
    for the SHIFTED year (AnonymizeData.java:328), which would admit Feb 29
    in 1900; we use the real rule on the year actually emitted."""
    return year % 4 == 0 and (year % 100 != 0 or year % 400 == 0)


def _valid_day(rng: random.Random, month: int, year: int) -> int:
    if month in _DAYS_31:
        return rng.randrange(1, 32)
    if month == 2:
        return rng.randrange(1, 30 if _is_leap(year) else 29)
    return rng.randrange(1, 31)


def anonymize_date_iso(date: str, mode: str = "") -> str:
    """YYYY-MM-DD (or YYYY-month-DD) re-based: year becomes BASE_YEAR
    (minus a seeded 1..110 for ``mode='patient'`` — the reference's
    max-human-age assumption, AnonymizeData.java:302 — so birthdates
    neither cluster at the current year nor predate any plausible birth),
    month/day drawn VALID for that month incl. leap February."""
    parts = date.split("-")
    if len(parts) != 3:
        return date
    rng = _rng(date, f"iso:{mode}")
    year = BASE_YEAR - (rng.randrange(1, 111) if mode == "patient" else 0)
    if parts[1].isdigit():
        month = rng.randrange(1, 13)
        day = _valid_day(rng, month, year)
        return f"{year}-{month:02d}-{day:02d}"
    month = rng.randrange(1, 13)
    day = _valid_day(rng, month, year)
    return f"{year}-{_MONTHS[month - 1]}-{day:02d}"


def anonymize_date_raw(date: str) -> str:
    """Shape-gated raw-date anonymizer (dd/mm/yyyy, dd.mm.yyyy, 'dd month
    yyyy', ...): only recognized date shapes are rewritten."""
    if not any(rx.fullmatch(date) for rx in RE_DATE_SHAPES):
        return date
    rng = _rng(date, "raw")
    sep = "/" if "/" in date else ("-" if "-" in date else
                                   ("." if "." in date else " "))
    parts = date.split(sep)
    year = BASE_YEAR
    month = rng.randrange(1, 13)
    day = _valid_day(rng, month, year)
    if parts[1].isdigit():
        return f"{day:02d}{sep}{month:02d}{sep}{year}"
    return f"{day:02d}{sep}{_MONTHS[month - 1]}{sep}{year}"


def is_digit_bearing(text: str) -> bool:
    """The reference's isContainDigit: a recognized date shape or a pure
    number."""
    return (any(rx.fullmatch(text) for rx in RE_DATE_SHAPES)
            or bool(re.fullmatch(r"\d+", text)))
