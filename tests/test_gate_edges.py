"""Engine-parity pins for gate edge cases added in round 3:

- Gopher lines-based rules (bullet/ellipsis) + stopword guard: Spark vs
  DuckDB on a synthetic multi-line edge-case documents table (the driver's
  corpus is single-line, so these rules are exercised here);
- SimHash empty/whitespace-only text: Python/Spark emit signature 0; the
  SQL oracle must mirror that (not md5-hash a '' token);
- fixture scale pinning: sf-staged fixture queries hard-fail off-scale;
- quadratic oracle paths refuse to run above their row cap.
"""

from __future__ import annotations

from collections import Counter

import duckdb
import pytest

SF = "/root/testdata/sf0.01"

GOPHER_EDGE_DOCS = [
    # (doc_id, text)
    (1, ""),                                   # empty
    (2, "   "),                                # whitespace-only
    (3, "• one\n• two\n• three\n- four"),      # 100% bullet lines
    (4, "first line...\nsecond…\nthird ok"),   # 2/3 ellipsis lines
    (5, "the cat sat on a mat " * 10),         # passes stopwords, short
    (6, ("the quick brown fox jumps over a lazy dog and runs far away "
         * 5)),                                # realistic passing doc
    (7, "• bullet\n" + "plain prose with the usual words and a few more\n" * 9),
]

SIMHASH_EDGE_DOCS = [
    (1, ""),
    (2, "   "),
    (3, "identical text content here"),
    (4, "identical text content here"),
    (5, "completely different words entirely"),
]


def _write_documents(spark, tmp_path, rows):
    d = tmp_path / "edge_sf"
    df = spark.createDataFrame(rows, "doc_id long, text string")
    df.coalesce(1).write.mode("overwrite").parquet(
        str(d / "documents.parquet"))
    return str(d)


def _duck(sql, sf_dir):
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{sf_dir}/documents.parquet/*.parquet')")
    out = con.sql(sql)
    return out.columns, out.fetchall()


def _multiset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return Counter(tuple(str(r[i]) for i in order) for r in rows)


def test_gopher_line_rules_match_duckdb(spark, tmp_path):
    from ocr_platform_spark.operators.text_analysis import (
        TA_GOPHER_SQL, ta_gopher_quality)

    sf = _write_documents(spark, tmp_path, GOPHER_EDGE_DOCS)
    sdf = ta_gopher_quality(spark, sf)
    s_rows = sdf.collect()
    d_cols, d_rows = _duck(TA_GOPHER_SQL, sf)
    assert sorted(sdf.columns) == sorted(d_cols)
    assert _multiset(sdf.columns, s_rows) == _multiset(d_cols, d_rows)

    by_id = {r["doc_id"]: r for r in s_rows}
    assert not by_id[3]["bullet_ok"]        # 100% bullet lines
    assert not by_id[4]["ellipsis_ok"]      # 2/3 > 30% ellipsis lines
    assert by_id[7]["bullet_ok"]            # 10% bullet lines is fine
    assert by_id[6]["stop_ok"]              # 'the' + 'a' + 'and' + ...
    assert by_id[6]["gopher_pass"]          # the full gate admits prose
    assert not by_id[1]["gopher_pass"]      # empty doc rejected


def test_simhash_empty_text_matches_duckdb(spark, tmp_path):
    from ocr_platform_spark.operators.dedup import (
        DD_SIMHASH_SQL, dd_simhash, simhash64)

    assert simhash64("") == 0
    assert simhash64("   ") == 0

    sf = _write_documents(spark, tmp_path, SIMHASH_EDGE_DOCS)
    sdf = dd_simhash(spark, sf)
    s = _multiset(sdf.columns, sdf.collect())
    d_cols, d_rows = _duck(DD_SIMHASH_SQL, sf)
    assert s == _multiset(d_cols, d_rows)
    # the two token-less docs band together at signature 0 on BOTH engines
    pairs = {tuple(map(int, t[:2])) for t in s}
    assert (1, 2) in pairs and (3, 4) in pairs


def test_fixture_scale_guard():
    from ocr_platform_spark.operators.registry import assert_fixture_scale

    assert_fixture_scale("/root/testdata/sf0.01", "ann_ivf_topk")
    with pytest.raises(ValueError, match="staged from sf0.01"):
        assert_fixture_scale("/root/testdata/sf0.001", "ann_ivf_topk")


def test_quadratic_oracle_paths_guarded(spark):
    from ocr_platform_spark.operators.dedup import (
        dd_embedding_near, dd_ngram_jaccard)

    with pytest.raises(ValueError, match="quadratic all-pairs ORACLE"):
        dd_ngram_jaccard(spark, SF, max_rows=10)
    with pytest.raises(ValueError, match="quadratic all-pairs ORACLE"):
        dd_embedding_near(spark, SF, max_rows=10)


def test_pii_patterns_hand_vectors():
    """The PII regex subset must behave identically under Python re (a
    third engine, adjacent to Java regex and RE2) on hand vectors."""
    import re

    from ocr_platform_spark.operators.text_analysis import (
        PII_EMAIL, PII_IPV4, PII_PHONE)

    assert re.findall(PII_EMAIL, "mail a.b+c@x-y.co.uk now") == \
        ["a.b+c@x-y.co.uk"]
    assert re.findall(PII_EMAIL, "not an@email") == []
    assert re.findall(PII_IPV4, "at 10.0.3.77, ok") == ["10.0.3.77"]
    assert re.findall(PII_IPV4, "ver 1.2.3 only") == []
    assert re.findall(PII_PHONE, "call +15551234567 pls") == ["+15551234567"]
    assert re.findall(PII_PHONE, "+123 short") == []
    masked = re.sub(PII_EMAIL, "<EMAIL>",
                    "x a@b.co y c@d.org")
    assert masked == "x <EMAIL> y <EMAIL>"


def test_pii_scrub_finds_injected_pii(spark):
    from ocr_platform_spark.operators.text_analysis import ta_pii_scrub

    rows = ta_pii_scrub(spark, SF).collect()
    assert len(rows) == 500
    for r in rows:
        assert r["n_emails"] >= 1 and r["n_ips"] >= 1 and r["n_phones"] >= 1
        assert len(r["masked_md5"]) == 32


def test_repetition_rule_catches_spam(spark):
    """A doc whose top bigram dominates must fail the curation repetition
    rule; normal prose must pass — Spark and DuckDB agree on both."""
    import pandas as pd

    from ocr_platform_spark.operators.curation import _REP_FAIL
    from ocr_platform_spark.operators.text_analysis import (
        TA_REPETITION_SQL, ta_repetition)

    docs = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": ["buy now " * 40,                      # one bigram, 100%
                 "the quick brown fox jumps over the lazy dog and then "
                 "rests under a tall green tree near the calm river",
                 "word " * 30],                        # one unigram, 100%
    })
    import tempfile

    from pyspark.sql import functions as F

    sf = tempfile.mkdtemp()
    spark.createDataFrame(docs).write.parquet(f"{sf}/documents.parquet",
                                              mode="overwrite")
    rep = {r["doc_id"]: r for r in ta_repetition(spark, sf).collect()}
    fails = {r["doc_id"] for r in
             ta_repetition(spark, sf).filter(F.expr(_REP_FAIL)).collect()}
    assert fails == {1, 3}
    assert rep[2]["top_bigram_x10000"] <= 2000
    con = duckdb.connect()
    con.register("documents", docs)
    oracle_fails = {r[0] for r in con.sql(
        f"SELECT doc_id FROM ({TA_REPETITION_SQL}) WHERE {_REP_FAIL}"
    ).fetchall()}
    assert oracle_fails == {1, 3}
