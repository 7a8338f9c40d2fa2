"""Merge-table BPE: hand-computed training/encoding vectors, determinism,
and idempotence of the generated merge table (functions/bpe_merges.py)."""

from __future__ import annotations

import pathlib
import subprocess
import sys

from ocr_platform_spark.functions.bpe import (
    END, BpeTokenizer, default_tokenizer, encode_word, pretokenize,
    train_bpe)

REPO = pathlib.Path(__file__).resolve().parent.parent

# The classic Sennrich et al. corpus; merges hand-derived (pair counts and
# the lexicographic tie-breaks worked out on paper, see each comment).
SENNRICH = {"low": 5, "lower": 2, "newest": 6, "widest": 3}


class TestTrainer:
    def test_hand_computed_merges(self):
        merges = train_bpe(SENNRICH, 5)
        assert merges == [
            ("e", "s"),        # 9, ties (s,t)/(t,</w>) -> lexicographic
            ("es", "t"),       # 9, ties (t,</w>)
            ("est", END),      # 9
            ("l", "o"),        # 7, ties (o,w)
            ("lo", "w"),       # 7
        ]

    def test_stops_when_no_pair_repeats(self):
        # single occurrence of everything -> no pair reaches count 2
        assert train_bpe({"ab": 1, "cd": 1}, 10) == []

    def test_deterministic(self):
        a = train_bpe(SENNRICH, 50)
        b = train_bpe(dict(reversed(list(SENNRICH.items()))), 50)
        assert a == b


class TestEncoder:
    def setup_method(self):
        self.ranks = {p: i for i, p in enumerate(train_bpe(SENNRICH, 5))}

    def test_lowest_two_tokens(self):
        # l,o,w,e,s,t,</w> -> es -> est -> est</w> -> lo -> low
        assert encode_word("lowest", self.ranks) == ("low", "est" + END)

    def test_unseen_chars_stay_single(self):
        assert encode_word("xyz", self.ranks) == ("x", "y", "z", END)

    def test_rank_order_beats_position(self):
        # (e,s) must merge before (l,o) even though (l,o) comes first
        syms = encode_word("les", self.ranks)
        assert "es" in "".join(syms) and syms == ("l", "es", END)


class TestTokenizer:
    def test_count_matches_encode(self):
        tok = BpeTokenizer(train_bpe(SENNRICH, 5))
        text = "the lowest newest low"
        assert tok.count_tokens(text) == len(tok.encode(text))

    def test_empty_and_whitespace(self):
        tok = BpeTokenizer([])
        assert tok.count_tokens("") == 0
        assert tok.count_tokens("   \n\t ") == 0

    def test_pretokenize_splits_scripts(self):
        assert pretokenize("ab12-cd") == ["ab", "12", "-", "cd"]

    def test_memo_consistent(self):
        tok = BpeTokenizer(train_bpe(SENNRICH, 5))
        a = tok.count_tokens("lowest lowest")
        b = 2 * tok.count_tokens("lowest")
        assert a == b

    def test_default_table_real_subwords(self):
        # the checked-in table must actually merge (not be empty) and
        # still split some corpus word into >1 subword (not a word-count)
        tok = default_tokenizer()
        assert len(tok.ranks) > 10
        assert len(encode_word("partitioned", tok.ranks)) > 1


def test_merge_table_idempotent():
    """Rerunning the trainer tool must not change the checked-in table."""
    gen = REPO / "ocr_platform_spark" / "functions" / "bpe_merges.py"
    before = gen.read_text()
    subprocess.run([sys.executable, str(REPO / "tools" / "make_bpe_merges.py")],
                   check=True, capture_output=True)
    assert gen.read_text() == before
