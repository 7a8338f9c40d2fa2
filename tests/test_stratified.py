"""Largest-remainder stratified eval carving (operators/stratified.py)."""

from __future__ import annotations

from ocr_platform_spark.operators.stratified import (N_EVAL, eval_seats,
                                                     stratified_eval)

SF_DIR = "/root/testdata/sf0.01"


def _docs(spark, spec):
    """spec: {lang: n_docs} → a deterministic corpus."""
    rows, i = [], 0
    for lang, n in sorted(spec.items()):
        for _ in range(n):
            rows.append((i, lang))
            i += 1
    return spark.createDataFrame(rows, "doc_id long, lang string")


def test_seats_sum_exactly_and_match_hamilton(spark):
    spec = {"en": 218, "zh": 75, "es": 73, "de": 70, "fr": 64}
    rows = {r["lang"]: r for r in eval_seats(_docs(spark, spec)).collect()}
    assert sum(r["seats"] for r in rows.values()) == N_EVAL
    # independent Hamilton recomputation
    total = sum(spec.values())
    base = {l: (N_EVAL * n) // total for l, n in spec.items()}
    rem = {l: (N_EVAL * n) % total for l, n in spec.items()}
    leftover = N_EVAL - sum(base.values())
    order = sorted(spec, key=lambda l: (-rem[l], l))
    want = {l: base[l] + (1 if order.index(l) < leftover else 0)
            for l in spec}
    assert {l: r["seats"] for l, r in rows.items()} == want
    # floor-only allocation would NOT have summed to N (the method's
    # reason to exist)
    assert sum(base.values()) < N_EVAL


def test_membership_exact_size_and_ranks(spark):
    docs = _docs(spark, {"en": 50, "ar": 30, "fr": 20})
    got = stratified_eval(docs, 10).collect()
    assert len(got) == 10
    by_lang: dict = {}
    for r in got:
        by_lang.setdefault(r["lang"], []).append(r["rank_in_stratum"])
    assert {l: len(v) for l, v in by_lang.items()} == \
        {"en": 5, "ar": 3, "fr": 2}
    for ranks in by_lang.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))


def test_determinism_and_driver_corpus(spark):
    a = {(r["doc_id"], r["lang"]) for r in
         stratified_eval(_docs(spark, {"en": 40, "zh": 60}), 20).collect()}
    b = {(r["doc_id"], r["lang"]) for r in
         stratified_eval(_docs(spark, {"en": 40, "zh": 60}), 20).collect()}
    assert a == b and len(a) == 20
    from ocr_platform_spark.operators.stratified import cx_stratified_eval

    assert cx_stratified_eval(spark, SF_DIR).count() == N_EVAL
