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


def test_oracle_output_types_driver_safe():
    """No oracle's final relation may emit HUGEINT/DECIMAL —
    tools/check_oracles.py's value compare can't see those (it stringifies),
    but the driver's typed hasher diverges on them: the only 2 red rows in
    CORRECTNESS_r04 were uncast DuckDB SUM(BIGINT)→HUGEINT columns. This
    pins local-green ⇒ driver-green; reverting the ev_* BIGINT casts fails
    here."""
    import duckdb

    from ocr_platform_spark.operators.tables import TABLES
    from tools.check_oracles import driver_unsafe_columns

    entry = _entry()
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('/root/testdata/sf0.001/{t}.parquet')")
    # pin the DuckDB behavior that motivates the gate: SUM over BIGINT
    # widens to HUGEINT, and the helper flags it
    probe = con.sql("SELECT SUM(CAST(1 AS BIGINT)) AS s")
    assert driver_unsafe_columns(
        [d[0] for d in probe.description], probe.types
    ) == [("s", "HUGEINT")]
    for name, sql in entry.oracle_sql().items():
        rel = con.sql(sql)
        bad = driver_unsafe_columns([d[0] for d in rel.description],
                                    rel.types)
        assert not bad, (
            f"{name}: driver-unsafe oracle output types {bad} — cast to "
            "BIGINT/DOUBLE/VARCHAR in the oracle SQL")
