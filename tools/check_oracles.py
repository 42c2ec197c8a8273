"""Local replica of the driver's correctness gate: run every queries() entry
on Spark and its oracle_sql() on DuckDB over the same parquet tables, compare
row count, column names, and order-insensitive values.

Usage: python tools/check_oracles.py [sf_dir] [name_filter]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


def norm_cell(v):
    """Canonical, *type-sensitive* cell repr (mimics the driver's value hash:
    int 3 vs float 3.0 must differ — that is how DuckDB HUGEINT artifacts
    surface, since pandas renders HUGEINT as float64)."""
    if v is None:
        return "\x00"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(round(v, 6))
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    return repr(v)


def norm_rows(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    normed = [tuple(norm_cell(r[i]) for i in idx) for r in rows]
    return sorted(normed)


def duck_rows(res):
    """Fetch DuckDB results the way the driver does (through pandas), so
    HUGEINT -> float64 and other dtype coercions are visible to the compare."""
    pdf = res.df()
    cols = list(pdf.columns)
    out = []
    for row in pdf.itertuples(index=False, name=None):
        vals = []
        for v in row:
            if hasattr(v, "item") and not isinstance(v, (str, bytes)):
                try:
                    v = v.item()
                except (AttributeError, ValueError):
                    pass
            if v is not None and repr(v) == "NaT":
                v = None
            vals.append(v)
        out.append(tuple(vals))
    return cols, out


def run_sweep(spark, sf_dir: str, name_filter: str = "") -> int:
    """Run every queries() entry and its oracle over ``sf_dir``; return the
    failure count. Importable so the repo's own gate can run the full sweep
    as ``pytest -m sweep`` (VERDICT r4 next-round item 8) — the same code
    path the CLI uses."""
    import duckdb

    import __spark_entry__ as entrymod

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if name_filter and name_filter not in name:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = sdf.collect()
        except Exception as exc:
            print(f"FAIL  {name}: spark raised {type(exc).__name__}: {exc}")
            failures += 1
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(srows)} rows (no oracle) "
                  f"[{time.time() - t0:.1f}s]")
            if len(srows) == 0 and not name.startswith("x_maybe_empty"):
                print(f"WARN  {name}: 0 rows")
            continue
        try:
            dcols, drows = duck_rows(con.sql(oracles[name]))
        except Exception as exc:
            print(f"FAIL  {name}: duckdb raised {type(exc).__name__}: {exc}")
            failures += 1
            continue
        ok = True
        if sorted(scols) != sorted(dcols):
            print(f"FAIL  {name}: columns spark={scols} duckdb={dcols}")
            ok = False
        elif len(srows) != len(drows):
            print(f"FAIL  {name}: rowcount spark={len(srows)} duckdb={len(drows)}")
            ok = False
        else:
            a = norm_rows(scols, [tuple(r) for r in srows])
            b = norm_rows(dcols, drows)
            if a != b:
                diff = [(x, y) for x, y in zip(a, b) if x != y][:3]
                print(f"FAIL  {name}: value mismatch; first diffs: {diff}")
                ok = False
        if ok:
            print(f"ok    {name}: {len(srows)} rows match [{time.time() - t0:.1f}s]")
        else:
            failures += 1
    print(f"\n{failures} failures")
    return failures


def main() -> int:
    from grobid_medical_report_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    name_filter = sys.argv[2] if len(sys.argv) > 2 else ""
    spark = get_spark("check_oracles")
    spark.sparkContext.setLogLevel("ERROR")
    failures = run_sweep(spark, sf_dir, name_filter)
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
