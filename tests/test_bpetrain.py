"""Distributed BPE trainer (operators/bpetrain.py)."""

from __future__ import annotations

from ocr_platform_spark.operators.bpetrain import (_rx_quote,
                                                   _rx_replacement,
                                                   train_bpe_distributed)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")


def test_matches_sequential_trainer_on_fresh_corpus(spark):
    from collections import Counter

    from ocr_platform_spark.functions.bpe import pretokenize, train_bpe

    texts = ["the cat sat on the mat", "the cat ate the rat",
             "a cat a mat a rat", "низкий low löw", "co$t co$t co$t",
             "the the the cat"]
    counts: Counter = Counter()
    for t in texts:
        counts.update(pretokenize(t))
    want = train_bpe(dict(counts), 12)
    got = train_bpe_distributed(_docs(spark, texts), 12)
    assert got == want


def test_leftmost_nonoverlap_and_early_stop(spark):
    # 'aaaa' with pair (a,a): leftmost pairs merge — sequential rule
    got = train_bpe_distributed(_docs(spark, ["aaaa aaaa", "aaaa"]), 8)
    from collections import Counter

    from ocr_platform_spark.functions.bpe import pretokenize, train_bpe
    counts: Counter = Counter()
    for t in ["aaaa aaaa", "aaaa"]:
        counts.update(pretokenize(t))
    assert got == train_bpe(dict(counts), 8)
    assert got[0] == ("a", "a")
    # all-unique corpus: every pair count is 1 → zero merges
    assert train_bpe_distributed(_docs(spark, ["ab cd ef"]), 8) == []


def test_regex_quoting_metachars(spark):
    # symbol runs full of regex metachars must merge literally
    got = train_bpe_distributed(
        _docs(spark, ["$+. $+. $+.", "a$+.b a$+.b"]), 6)
    from collections import Counter

    from ocr_platform_spark.functions.bpe import pretokenize, train_bpe
    counts: Counter = Counter()
    for t in ["$+. $+. $+.", "a$+.b a$+.b"]:
        counts.update(pretokenize(t))
    assert got == train_bpe(dict(counts), 6)
    assert any("$" in a + b for a, b in got)


def test_rx_helpers():
    assert _rx_quote("a.b") == "\\Qa.b\\E"
    assert _rx_quote("x\\Ey") == "\\Qx\\E\\\\E\\Qy\\E"
    assert _rx_replacement("a$b\\c") == "a\\$b\\\\c"