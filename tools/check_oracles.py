"""Local mimic of the driver's DuckDB correctness gate.

Runs every ``queries()`` entry on Spark and (where present) its
``oracle_sql()`` on DuckDB over the same parquet tables, then compares
row count, column names, and an order-insensitive multiset of stringified
row values. Usage:

    python tools/check_oracles.py [sf_dir] [only_query_prefixes] [--rotate-env]

``only_query_prefixes`` is comma-separated. ``--rotate-env`` re-points the
process at a hostile environment BEFORE the JVM/DuckDB start — a
half-hour-offset timezone (Asia/Kolkata) and a non-C locale — pinning
that every oracle's hash stability survives environment drift (the
round-4 ev_* episode showed environment-sensitive bugs escape a
default-environment gate).
"""

from __future__ import annotations

import sys
import time
from collections import Counter
from decimal import Decimal
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def norm_value(v):
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, Decimal):
        return str(v.normalize())
    if isinstance(v, (list, tuple)):
        return tuple(norm_value(x) for x in v)
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def row_multiset(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    return Counter(tuple(norm_value(r[i]) for i in order) for r in rows)


# DuckDB output types that norm_value collapses into the same strings as
# their Spark counterparts but that the DRIVER's typed Arrow hasher
# stringifies differently — an oracle emitting one passes this local gate
# yet hash-fails in CORRECTNESS (the exact ev_* bug of round 4: uncast
# SUM(BIGINT) → HUGEINT). TIMESTAMP is deliberately NOT in the set:
# r13_sort passes a raw parquet timestamp through and carries 4 rounds of
# driver-green hashes, so passthrough timestamps are proven safe — only
# the integer-widening types have ever diverged.
DRIVER_UNSAFE_TYPES = ("HUGEINT", "DECIMAL")


def driver_unsafe_columns(colnames, typenames):
    """(name, type) pairs whose DuckDB output type would hash-diverge in
    the driver even when values compare equal here."""
    return [(c, t) for c, t in zip(colnames, (str(t).upper()
                                              for t in typenames))
            if any(b in t for b in DRIVER_UNSAFE_TYPES)]


def rotate_env() -> None:
    """Half-hour-offset TZ + non-C locale, applied before Spark/DuckDB
    init (the JVM reads TZ at launch)."""
    import locale
    import os
    import time as _time

    os.environ["TZ"] = "Asia/Kolkata"
    _time.tzset()
    for loc in ("en_US.UTF-8", "C.UTF-8"):
        try:
            locale.setlocale(locale.LC_ALL, loc)
            os.environ["LC_ALL"] = loc
            break
        except locale.Error:
            continue
    print(f"rotated env: TZ={os.environ['TZ']} "
          f"LC_ALL={os.environ.get('LC_ALL', '?')}")


def main() -> int:
    args = [a for a in sys.argv[1:] if a != "--rotate-env"]
    if len(args) != len(sys.argv) - 1:
        rotate_env()

    import duckdb
    import __spark_entry__ as entry
    from ocr_platform_spark.session import build_spark
    from ocr_platform_spark.operators.tables import TABLES

    sf_dir = args[0] if len(args) > 0 else "/root/testdata/sf0.01"
    prefixes = tuple((args[1] if len(args) > 1 else "").split(","))

    spark = build_spark("oracle-check", cores=8)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{sf_dir}/{t}.parquet')")

    qs = entry.queries()
    oracles = entry.oracle_sql()
    # A filter that matches nothing would print "ALL OK" having checked
    # nothing — a typo'd (or not-yet-registered) query name must FAIL.
    matched = [n for n in qs
               if any(n.startswith(p) for p in prefixes)]
    if not matched:
        print(f"FAIL: no registered query matches {prefixes}")
        return 1
    n_fail = 0
    for name, fn in sorted(qs.items()):
        if name not in matched:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = sdf.collect()
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            n_fail += 1
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"ok   {name}: rows-only ({len(srows)} rows, {dt:.1f}s)")
            if len(srows) == 0:
                print(f"WARN {name}: zero rows")
            continue
        try:
            rel = con.sql(oracles[name])
            dcols = [d[0] for d in rel.description]
            dtypes = [str(t).upper() for t in rel.types]
            drows = rel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            n_fail += 1
            continue
        ok = True
        # Driver-safety type gate, so local green implies driver green.
        bad = driver_unsafe_columns(dcols, dtypes)
        if bad:
            print(f"FAIL {name}: driver-unsafe oracle output types {bad} "
                  f"— cast to BIGINT/DOUBLE/VARCHAR in the oracle SQL")
            ok = False
        if len(srows) != len(drows):
            print(f"FAIL {name}: rowcount spark={len(srows)} duck={len(drows)}")
            ok = False
        if sorted(scols) != sorted(dcols):
            print(f"FAIL {name}: cols spark={sorted(scols)} duck={sorted(dcols)}")
            ok = False
        if ok:
            ms, md = row_multiset([r[:] for r in (tuple(r) for r in srows)], scols), \
                     row_multiset(drows, dcols)
            if ms != md:
                diff_s = list((ms - md).items())[:3]
                diff_d = list((md - ms).items())[:3]
                print(f"FAIL {name}: value mismatch; spark-only={diff_s} "
                      f"duck-only={diff_d}")
                ok = False
        if ok:
            print(f"ok   {name}: {len(srows)} rows match ({dt:.1f}s)")
        else:
            n_fail += 1
    spark.stop()
    print(f"\n{'ALL OK' if n_fail == 0 else f'{n_fail} FAILURES'}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
