"""CCNet-style bigram LM quality score: the distributed train+apply is
pinned by an independent pure-Python replica over the real table, plus
planted cases for the mechanisms — training-slice isolation, unseen-
bigram zeros, per-language model separation, degenerate documents."""

from __future__ import annotations

import pytest

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def spark():
    from ocr_platform_spark.session import build_spark
    return build_spark("lm-score-tests", cores=4)


def _python_lm(rows):
    """rows = [(doc_id, lang, text)] → {doc_id: (n_bigrams, score)} via
    a sequential dict-counting replica of the same recurrence."""
    from ocr_platform_spark.operators.text_analysis import (
        _LM_TRAIN_MOD, _LM_TRAIN_RES)

    def bigrams(text):
        toks = text.strip().split()
        return list(zip(toks, toks[1:]))

    c_bi: dict = {}
    c_uni: dict = {}
    for doc_id, lang, text in rows:
        if doc_id % _LM_TRAIN_MOD != _LM_TRAIN_RES:
            continue
        for w1, w2 in bigrams(text):
            c_bi[(lang, w1, w2)] = c_bi.get((lang, w1, w2), 0) + 1
            c_uni[(lang, w1)] = c_uni.get((lang, w1), 0) + 1
    out = {}
    for doc_id, lang, text in rows:
        bgs = bigrams(text)
        if not bgs:
            out[doc_id] = (0, 0)
            continue
        s = sum((c_bi.get((lang, w1, w2), 0) * 1_000_000)
                // c_uni[(lang, w1)] if (lang, w1, w2) in c_bi else 0
                for w1, w2 in bgs)
        out[doc_id] = (len(bgs), s // len(bgs))
    return out


def test_lm_score_matches_python_replica(spark):
    import duckdb

    from ocr_platform_spark.operators.text_analysis import ta_lm_score

    rows = duckdb.connect().execute(
        f"""SELECT doc_id, lang, text
            FROM read_parquet('{SF_DIR}/documents.parquet')""").fetchall()
    want = _python_lm([(int(d), la, t) for d, la, t in rows])
    got = {r["doc_id"]: (r["n_bigrams"], r["lm_score_x1e6"])
           for r in ta_lm_score(spark, SF_DIR).collect()}
    assert got == want
    # the score must discriminate: not all equal, and in-model text
    # (the training slice scores against itself) skews high
    scores = [v for _, v in got.values()]
    assert len(set(scores)) > 10


def test_lm_training_slice_isolation(spark):
    # a bigram that exists ONLY outside the doc_id % 10 == 0 slice must
    # score 0 — the model never saw it, however frequent it is in the
    # scored corpus (this is what makes the score an out-of-domain
    # signal rather than a self-fulfilling frequency count)
    from ocr_platform_spark.operators.text_analysis import lm_scores

    docs = spark.createDataFrame(
        [(0, "en", "a b a b"),            # trains: (a,b) x2, (b,a) x1
         (10, "en", "a b"),               # trains: (a,b)
         (1, "en", "zz qq zz qq zz qq"),  # never trains: score 0
         (2, "en", "a b"),                # fully in-model
         (3, "en", "a b zz qq")],         # half in-model
        "doc_id long, lang string, text string")
    got = {r["doc_id"]: (r["n_bigrams"], r["lm_score_x1e6"])
           for r in lm_scores(docs).collect()}
    # model: c(en,a,b)=3, c_uni(en,a)=3 → p=1e6; c(en,b,a)=1,
    # c_uni(en,b)=1 → p=1e6
    assert got[1] == (5, 0)
    assert got[2] == (1, 1_000_000)
    assert got[3] == (3, 333_333)     # (a,b)=1e6, (b,zz)=0, (zz,qq)=0


def test_lm_per_language_models_are_separate(spark):
    # the same surface bigram under a different lang key is a different
    # model entry: lang='de' text never borrows the 'en' counts
    from ocr_platform_spark.operators.text_analysis import lm_scores

    docs = spark.createDataFrame(
        [(0, "en", "x y"),
         (1, "de", "x y"),     # same tokens, wrong language → 0
         (2, "en", "x y")],
        "doc_id long, lang string, text string")
    got = {r["doc_id"]: r["lm_score_x1e6"]
           for r in lm_scores(docs).collect()}
    assert got[2] == 1_000_000
    assert got[1] == 0


def test_lm_degenerate_docs(spark):
    # one-token and empty documents have no bigrams: n_bigrams == 0 and
    # score 0, never a null or a dropped row (never-drop invariant)
    from ocr_platform_spark.operators.text_analysis import lm_scores

    docs = spark.createDataFrame(
        [(0, "en", "hello world"), (1, "en", "solo"), (2, "en", "")],
        "doc_id long, lang string, text string")
    got = {r["doc_id"]: (r["n_bigrams"], r["lm_score_x1e6"])
           for r in lm_scores(docs).collect()}
    assert set(got) == {0, 1, 2}
    assert got[1] == (0, 0) and got[2] == (0, 0)


def test_lm_plan_stays_jvm_side(spark):
    # bigram construction must be slice+arrays_zip inside the row — no
    # Python evaluation anywhere in the plan; joins stay equi-joins
    from ocr_platform_spark.operators.text_analysis import ta_lm_score

    plan = ta_lm_score(spark, SF_DIR)._jdf.queryExecution() \
        .executedPlan().toString()
    for bad in ("BatchEvalPython", "ArrowEvalPython", "CartesianProduct",
                "BroadcastNestedLoop"):
        assert bad not in plan


# --- DSIR importance weighting ----------------------------------------------

def _python_dsir(rows):
    """Sequential replica: target model (train slice) + source model
    (whole corpus), weight = mean target p - mean source p."""
    from ocr_platform_spark.operators.text_analysis import (
        _LM_TRAIN_MOD, _LM_TRAIN_RES)

    def bigrams(text):
        toks = text.strip().split()
        return list(zip(toks, toks[1:]))

    def build(sel):
        c_bi, c_uni = {}, {}
        for doc_id, lang, text in rows:
            if not sel(doc_id):
                continue
            for w1, w2 in bigrams(text):
                c_bi[(lang, w1, w2)] = c_bi.get((lang, w1, w2), 0) + 1
                c_uni[(lang, w1)] = c_uni.get((lang, w1), 0) + 1
        return c_bi, c_uni

    tb, tu = build(lambda d: d % _LM_TRAIN_MOD == _LM_TRAIN_RES)
    sb, su = build(lambda d: True)
    out = {}
    for doc_id, lang, text in rows:
        bgs = bigrams(text)
        if not bgs:
            out[doc_id] = (0, 0, 0, 0, False)
            continue
        st = sum((tb[(lang, w1, w2)] * 1_000_000) // tu[(lang, w1)]
                 if (lang, w1, w2) in tb else 0 for w1, w2 in bgs)
        ss = sum((sb[(lang, w1, w2)] * 1_000_000) // su[(lang, w1)]
                 if (lang, w1, w2) in sb else 0 for w1, w2 in bgs)
        t, s = st // len(bgs), ss // len(bgs)
        out[doc_id] = (len(bgs), t, s, t - s, t - s > 0)
    return out


def test_dsir_matches_python_replica(spark):
    import duckdb

    from ocr_platform_spark.operators.text_analysis import cx_dsir_select

    rows = duckdb.connect().execute(
        f"""SELECT doc_id, lang, text
            FROM read_parquet('{SF_DIR}/documents.parquet')""").fetchall()
    want = _python_dsir([(int(d), la, t) for d, la, t in rows])
    got = {r["doc_id"]: (r["n_bigrams"], r["target_x1e6"],
                         r["source_x1e6"], r["weight_x1e6"],
                         r["selected"])
           for r in cx_dsir_select(spark, SF_DIR).collect()}
    assert got == want


def test_dsir_signal_direction(spark):
    """The whole point of the weight: reference-slice docs (in-target)
    must average a HIGHER importance weight than raw-source docs, and
    both selected and rejected docs must exist."""
    from ocr_platform_spark.operators.text_analysis import cx_dsir_select

    rows = cx_dsir_select(spark, SF_DIR).collect()
    train = [r["weight_x1e6"] for r in rows if r["doc_id"] % 10 == 0]
    rest = [r["weight_x1e6"] for r in rows if r["doc_id"] % 10 != 0]
    assert sum(train) / len(train) > sum(rest) / len(rest)
    n_sel = sum(r["selected"] for r in rows)
    assert 0 < n_sel < len(rows)
    for r in rows:
        assert r["weight_x1e6"] == r["target_x1e6"] - r["source_x1e6"]
        assert r["selected"] == (r["weight_x1e6"] > 0)


def test_dsir_plan_no_window_no_python(spark):
    from ocr_platform_spark.operators.text_analysis import cx_dsir_select

    plan = cx_dsir_select(spark, SF_DIR)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Window" not in plan
    assert "PythonUDF" not in plan and "ArrowEval" not in plan


# --- compression-ratio quality signal ----------------------------------------

def test_compress_ratio_matches_zlib_and_flags(spark):
    import zlib

    import duckdb

    from ocr_platform_spark.operators.text_analysis import (
        COMPRESS_HIGH_X1E4, COMPRESS_LOW_X1E4, ta_compress_ratio)

    want = {}
    for doc_id, text in duckdb.connect().execute(
            f"""SELECT doc_id, text
                FROM read_parquet('{SF_DIR}/documents.parquet')""") \
            .fetchall():
        b = text.encode("utf-8") if text else b""
        nz = len(zlib.compress(b, 6)) if b else 0
        want[int(doc_id)] = (len(b), nz, (nz * 10000) // max(len(b), 1))
    rows = ta_compress_ratio(spark, SF_DIR).collect()
    assert len(rows) == len(want)
    for r in rows:
        nb, nz, ratio = want[r["doc_id"]]
        assert (r["n_bytes"], r["n_zlib"], r["ratio_x1e4"]) == \
            (nb, nz, ratio)
        assert r["flag_repetitive"] == (ratio < COMPRESS_LOW_X1E4)
        assert r["flag_incompressible"] == (ratio > COMPRESS_HIGH_X1E4)
    # both drop tails are live at sf0.01
    assert any(r["flag_repetitive"] for r in rows)
    assert any(r["flag_incompressible"] for r in rows)


def test_compress_ratio_rejects_unpinned_scale(spark):
    import pytest

    from ocr_platform_spark.operators.text_analysis import \
        ta_compress_ratio

    with pytest.raises(ValueError, match="fixture"):
        ta_compress_ratio(spark, "/root/testdata/sf0.001")


# --- integer Flesch readability ----------------------------------------------

def _py_flesch(text):
    import re

    toks = text.strip().split()
    w = len(toks)
    s = max(len(re.split(r"[.!?]+", text)) - 1, 1)
    y = sum(max(len(re.split(r"[aeiouy]+", t.lower())) - 1, 1)
            for t in toks)
    score = (20684 - (1015 * ((100 * w) // s)) // 1000
             - (8460 * ((100 * y) // w)) // 100)
    return w, s, y, score


def test_readability_matches_python(spark):
    import duckdb

    from ocr_platform_spark.operators.text_analysis import ta_readability

    want = {int(d): _py_flesch(t) for d, t in duckdb.connect().execute(
        f"SELECT doc_id, text FROM "
        f"read_parquet('{SF_DIR}/documents.parquet')").fetchall()}
    got = {r["doc_id"]: (r["n_words"], r["n_sentences"],
                         r["n_syllables"], r["flesch_x100"])
           for r in ta_readability(spark, SF_DIR).collect()}
    assert got == want
    # score must discriminate across the corpus
    assert len({v[3] for v in got.values()}) > 10


def test_readability_planted_cases(spark):
    from ocr_platform_spark.operators.text_analysis import readability

    docs = spark.createDataFrame(
        [(1, "The cat sat. The dog ran!"),   # punctuated: 2 sentences
         (2, "xyzzy brrr"),   # y counts as vowel: 2 groups + floor 1
         (3, "a")],                          # single token
        "doc_id long, text string")
    got = {r["doc_id"]: r for r in readability(docs).collect()}
    assert got[1]["n_sentences"] == 2 and got[1]["n_words"] == 6
    assert got[2]["n_syllables"] == 3
    assert (got[3]["n_words"], got[3]["n_sentences"],
            got[3]["n_syllables"]) == (1, 1, 1)
    for doc_id, (w, s, y, score) in [
            (1, _py_flesch("The cat sat. The dog ran!")),
            (2, _py_flesch("xyzzy brrr")), (3, _py_flesch("a"))]:
        assert got[doc_id]["flesch_x100"] == score


# --- language-ID confusion matrix --------------------------------------------

def test_langid_confusion_sums_and_diagonal(spark):
    """Matrix cells sum to the detected-page count, and the diagonal
    dominates (the detector is supposed to be mostly right)."""
    from ocr_platform_spark.operators.text_analysis import (
        ta_langid_confusion, ta_langid_pages)

    pages = ta_langid_pages(spark, SF_DIR).collect()
    want: dict = {}
    for r in pages:
        k = (r["lang"], r["lang_detected"])
        want[k] = want.get(k, 0) + 1
    got = {(r["lang"], r["lang_detected"]): r["n"]
           for r in ta_langid_confusion(spark, SF_DIR).collect()}
    assert got == want
    diag = sum(n for (a, b), n in got.items() if a == b)
    assert diag >= 0.9 * sum(got.values())
