"""Driver-contract guards: every query exposed to the driver must carry an
oracle (round 2 achieved zero rows-only checks — keep it that way), names
must be unique, and fixture oracles must point at committed files."""

from __future__ import annotations

import re
from pathlib import Path


def _entry():
    import sys

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    import __spark_entry__ as entry

    return entry


def test_every_query_has_an_oracle():
    entry = _entry()
    queries = set(entry.queries())
    oracles = set(entry.oracle_sql())
    assert queries == oracles, (
        f"rows-only queries (no oracle): {sorted(queries - oracles)}; "
        f"orphan oracles: {sorted(oracles - queries)}")


def test_fixture_oracles_point_at_committed_parquet():
    entry = _entry()
    for name, sql in entry.oracle_sql().items():
        for path in re.findall(r"read_parquet\('([^']+)'\)", sql):
            assert Path(path).is_file(), (
                f"{name}: fixture missing at {path} — run "
                "tools/make_driver_fixtures.py")


def test_oracle_sql_parses_in_duckdb():
    """Every oracle must at least PREPARE against the real testdata views
    (catches SQL syntax/typo regressions without running Spark)."""
    import duckdb

    from ocr_platform_spark.operators.tables import TABLES

    entry = _entry()
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('/root/testdata/sf0.001/{t}.parquet')")
    for name, sql in entry.oracle_sql().items():
        try:
            con.sql(f"EXPLAIN {sql}")
        except Exception as e:  # pragma: no cover
            raise AssertionError(f"{name}: oracle SQL failed to plan: {e}")
