"""X9 anonymizer family (functions/anonymize.py): the six reference
variants, deterministic and property-checked."""

from __future__ import annotations

import re

from grobid_medical_report_spark.functions.anonymize import (
    BASE_YEAR, anonymize_address, anonymize_date_iso, anonymize_date_raw,
    anonymize_email, anonymize_number, anonymize_person_name,
    is_digit_bearing)


def test_number_masks_every_digit_deterministically():
    s = "IPP 604687491-X"
    out = anonymize_number(s)
    assert out == anonymize_number(s)                 # pure function
    assert re.sub(r"\d", "#", out) == re.sub(r"\d", "#", s)  # shape kept
    assert out != s                                    # (seeded; stable)


def test_person_name_preserves_case_convention():
    out = anonymize_person_name("Hakuna Matata ROUX")
    toks = out.split(" ")
    assert len(toks) == 3
    assert toks[2] == toks[2].upper()                  # surname stays caps
    assert toks[0][0].isupper() and not toks[0].isupper()
    assert out == anonymize_person_name("Hakuna Matata ROUX")


def test_email_keeps_domain():
    out = anonymize_email("jean.dupont@chu-dijon.fr")
    local, domain = out.split("@")
    assert domain == "chu-dijon.fr"
    assert local == local.lower() and "." in local
    assert local != "jean.dupont"


def test_address_rewrites_number_postcode_city():
    src = "24, Avenue du Mal de Lattre de Tassigny 68000 DIJON"
    out = anonymize_address(src)
    assert "Avenue du Mal de Lattre de Tassigny" in out
    assert "68000" not in out or out == anonymize_address(src)
    assert re.search(r"\b\d{5}\b", out)
    assert "DIJON" not in out
    assert out == anonymize_address(src)


def test_date_iso_valid_and_rebased():
    out = anonymize_date_iso("1992-03-13")
    y, m, d = map(int, out.split("-"))
    assert y == BASE_YEAR and 1 <= m <= 12 and 1 <= d <= 31
    born = anonymize_date_iso("1992-03-13", mode="patient")
    yb = int(born.split("-")[0])
    assert BASE_YEAR - 110 <= yb < BASE_YEAR           # max human age 110
    # Feb 29 only in true Gregorian leap years (1900-style years excluded)
    from grobid_medical_report_spark.functions.anonymize import _is_leap
    for probe in range(400):
        d = anonymize_date_iso(f"19{probe % 100:02d}-02-0{1 + probe % 9}", mode="patient")
        y, m, dd = d.split("-")
        if m == "02" and dd == "29":
            assert _is_leap(int(y)), d
    assert out == anonymize_date_iso("1992-03-13")


def test_date_raw_shape_gate():
    out = anonymize_date_raw("13/03/1992")
    assert re.fullmatch(r"\d{2}/\d{2}/\d{4}", out) and out != "13/03/1992"
    assert anonymize_date_raw("pas une date") == "pas une date"
    assert is_digit_bearing("13/03/1992") and is_digit_bearing("12345")
    assert not is_digit_bearing("treize mars")


def test_spark_anonymize_extraction(spark):
    from grobid_medical_report_spark.operators.strings import \
        x_anonymize_extraction

    rows = x_anonymize_extraction(spark, "/root/testdata/sf0.001").collect()
    assert len(rows) == 200
    for r in rows[:20]:
        assert re.fullmatch(r"\d{9}", r["docnum_anon"])
        assert r["date_anon"].startswith(str(BASE_YEAR))
        assert r["patient_anon"]
