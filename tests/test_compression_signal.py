"""zlib compression-ratio quality signal: the ordering property that makes
it a usable curation gate (repetitive text compresses far below natural
prose), plus the Spark mapInPandas path over the documents table."""

import zlib


def _ratio(text: str) -> float:
    b = text.encode("utf-8")
    return len(zlib.compress(b, 6)) / len(b)


def test_ordering_property():
    repetitive = "spam ham " * 400
    natural = (
        "Le patient présente une toux sèche intermittente depuis trois "
        "semaines, accompagnée d'une fièvre modérée le soir. L'examen "
        "clinique retrouve une auscultation pulmonaire normale, sans "
        "crépitants ni sibilants. La radiographie thoracique montre une "
        "discrète accentuation de la trame bronchique aux deux bases. "
        "Un traitement symptomatique est proposé avec réévaluation à "
        "huit jours en l'absence d'amélioration franche des symptômes. "
    ) * 5
    import random
    rng = random.Random(7)
    noisy = "".join(rng.choice("abcdefghijklmnopqrstuvwxyz 0123456789")
                    for _ in range(3000))
    assert _ratio(repetitive) < _ratio(natural) < _ratio(noisy)
    assert _ratio(repetitive) < 0.05 and _ratio(noisy) > 0.5


def test_spark_compression_path(spark):
    import __spark_entry__ as e

    rows = e.queries()["x_doc_compression"](
        spark, "/root/testdata/sf0.001").collect()
    assert rows
    for r in rows:
        assert r.raw_bytes > 0 and 0 < r.zlib_bytes
        assert r.ratio_permille == (r.zlib_bytes * 1000) // r.raw_bytes
    # natural-language documents sit in a sane deflate band
    import statistics
    med = statistics.median(r.ratio_permille for r in rows)
    assert 200 < med < 900
