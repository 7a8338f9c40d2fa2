"""Closed-form ridge fit: the exact rational solver is pinned against the
normal equations themselves, and the distributed moment pass against the
sequential pure-Python ground truth."""

from __future__ import annotations

from fractions import Fraction

import pytest

from ocr_platform_spark.operators.linfit import (
    MOMENT_KEYS, RIDGE_LAMBDA, python_moments, solve_rows)

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def spark():
    from ocr_platform_spark.session import build_spark
    return build_spark("linfit-tests", cores=4)


def _weights(rows):
    return {t: Fraction(int(n), int(d)) for t, n, d in rows
            if t.startswith("w_")}


def test_solver_satisfies_normal_equations_exactly():
    rows = [("a b c", 5), ("d e", 3), ("f f f f", 8), ("g h i j k", 11)]
    m = python_moments(rows)
    w = _weights(solve_rows(m))
    wv = [w["w_intercept"], w["w_n_tok"], w["w_n_uniq"]]
    lam = RIDGE_LAMBDA
    a = [[m["n"] + lam, m["s1"], m["s2"]],
         [m["s1"], m["s11"] + lam, m["s12"]],
         [m["s2"], m["s12"], m["s22"] + lam]]
    b = [m["sy"], m["s1y"], m["s2y"]]
    for r in range(3):
        lhs = sum(Fraction(a[r][c]) * wv[c] for c in range(3))
        assert lhs == Fraction(b[r]), f"row {r}: {lhs} != {b[r]}"


def test_moments_tokenize_like_spark_split():
    m = python_moments([("  a  b ", 7), ("", 0)])
    # trim + \s+ split: 2 tokens; empty text splits to [''] (1 token)
    assert m["n"] == 2 and m["s1"] == 2 + 1 and m["s2"] == 2 + 1


def test_moments_tokenize_like_spark_split_hostile_ws():
    # F.trim strips ASCII space ONLY: a leading \t/\n survives the trim and
    # Java split (limit -1) then emits a leading/trailing empty token.
    # "\ta b" -> ['', 'a', 'b']; "a b\n" -> ['a', 'b', '']; "\n\t\n" -> ['', '']
    m = python_moments([("\ta b", 4), ("a b\n", 4), ("\n\t\n", 3)])
    assert m["n"] == 3
    assert m["s1"] == 3 + 3 + 2          # token counts incl. empties
    assert m["s2"] == 3 + 3 + 1          # distinct: '' collapses in row 3


def test_distributed_moments_match_sequential(spark):
    import duckdb

    from ocr_platform_spark.operators.linfit import ml_linear_fit

    got = {r["term"]: (r["num"], r["den"])
           for r in ml_linear_fit(spark, SF_DIR).collect()}
    rows = duckdb.connect().execute(
        f"SELECT text, n_chars FROM "
        f"read_parquet('{SF_DIR}/documents.parquet')").fetchall()
    want = {t: (n, d) for t, n, d in solve_rows(python_moments(rows))}
    assert got == want


def test_fit_direction_is_sane(spark):
    from ocr_platform_spark.operators.linfit import ml_linear_fit

    w = _weights([(r["term"], r["num"], r["den"])
                  for r in ml_linear_fit(spark, SF_DIR).collect()])
    assert w["w_n_tok"] > 0     # more tokens -> more chars


def test_fit_refuses_unpinned_scale(spark):
    from ocr_platform_spark.operators.linfit import ml_linear_fit

    with pytest.raises(ValueError, match="sf0.01"):
        ml_linear_fit(spark, "/root/testdata/sf0.001")


def test_fit_apply_floor_div_matches_python_on_negatives(spark):
    """pred_x100 uses pmod-based floor division so JVM semantics match
    the fixture's Python // exactly — including NEGATIVE numerators
    (Spark's `div` truncates toward zero and would differ there)."""
    from pyspark.sql import functions as F

    from ocr_platform_spark.operators.linfit import _floor_div

    vals = [-100001, -10000, -9999, -1, 0, 1, 9999, 10000, 100001]
    df = spark.createDataFrame([(v,) for v in vals], "a long")
    got = {r["a"]: r["q"] for r in
           df.select("a", _floor_div(F.col("a"), 10**4).alias("q"))
           .collect()}
    assert got == {v: v // 10**4 for v in vals}


def test_fit_apply_matches_fixture(spark):
    """End-to-end train→apply equals the independent sequential fixture."""
    import duckdb

    from ocr_platform_spark.operators.linfit import ml_fit_apply

    got = sorted(
        tuple(r) for r in ml_fit_apply(spark, "/root/testdata/sf0.01")
        .collect())
    want = sorted(tuple(r) for r in duckdb.connect().execute(
        "SELECT * FROM 'tests/fixtures/oracle/ml_fit_apply.sf0.01.parquet'"
    ).fetchall())
    assert got == want
