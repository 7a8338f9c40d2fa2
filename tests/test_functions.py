"""Scalar function library tests — fixture vectors per FIXTURES.md §4."""

from __future__ import annotations

import pytest
from hypothesis import given, settings, strategies as st

from ocr_platform_spark.functions import (
    command_score,
    count_page_words,
    count_words,
    extract_publishing_details,
    gregorian_year_to_hijri_year,
    hijri_year_to_gregorian_year,
    text_to_slug,
    to_arabic_digits,
    to_western_digits,
)


class TestWordCount:
    """F1 — ref apps/web/src/lib/page.ts:3-20 semantics."""

    @pytest.mark.parametrize(
        "text,expected",
        [
            (None, 0),
            ("", 0),
            ("hello world", 2),
            ("<p>hello <b>world</b></p>", 2),
            ("<p>بسم الله الرحمن الرحيم</p>", 4),
            ("وَقْت الصَّلَاة", 2),          # tashkeel (\\p{M}) stays in-token
            ("page 123 and ١٢٣", 4),        # \\p{N} covers Eastern digits
            ("a-b c_d", 4),                  # -,_ split tokens (not \\p{L|M|N})
            ("<script>var x=1;</script>hi", 1),
            ("one<br>two", 2),               # tag boundary separates words
        ],
    )
    def test_vectors(self, text, expected):
        assert count_words(text) == expected

    def test_page_total(self):
        assert count_page_words("<p>a b</p>", "(1) c") == 4
        assert count_page_words(None, None) == 0


class TestSlug:
    """F2 — ref apps/web/src/lib/slug.ts:3-12."""

    @pytest.mark.parametrize(
        "text,expected",
        [
            ("Hello World", "hello-world"),
            ("Café über Alles", "cafe-uber-alles"),
            ("  trim me  ", "trim-me"),
            ("naïve façade", "naive-facade"),
        ],
    )
    def test_vectors(self, text, expected):
        assert text_to_slug(text) == expected

    def test_arabic_kept(self):
        # Arabic letters are word chars; tashkeel are not in U+0300-036F so
        # they survive NFD-strip (same as the reference's regex)
        assert "كتاب" in text_to_slug("كتاب العلم")


class TestHijri:
    """F3 — ref apps/web/src/lib/hijri.ts:95-122 (1420 AH ↔ 1999 CE)."""

    @pytest.mark.parametrize("h,g", [(1420, 1999), (1445, 2023), (1000, 1591)])
    def test_known_pairs(self, h, g):
        assert hijri_year_to_gregorian_year(h) == g

    def test_jan1_convention(self):
        assert gregorian_year_to_hijri_year(1999) == 1419  # Jan 1 1999 ∈ 1419 AH

    @given(st.integers(min_value=900, max_value=1500))
    @settings(max_examples=100, deadline=None)
    def test_round_trip_within_2(self, h):
        # h→g returns the year containing 1 Muharram; g→h anchors at Jan 1,
        # so the round trip drifts one Hijri year, two when Muharram falls
        # in late December (e.g. 1363 AH → Dec 1943). Same formulas as the
        # reference, so the same drift.
        g = hijri_year_to_gregorian_year(h)
        assert g - 2 <= hijri_year_to_gregorian_year(gregorian_year_to_hijri_year(g)) <= g
        assert abs(gregorian_year_to_hijri_year(g) - h) <= 2


class TestDigits:
    """F4 — exact 1:1 codepoint map (arabic-numbers-extension.ts:36-121)."""

    def test_vectors(self):
        assert to_arabic_digits("1420") == "١٤٢٠"
        assert to_western_digits("١٤٢٠") == "1420"
        assert to_arabic_digits("p. 31!") == "p. ٣١!"

    @given(st.text(alphabet="0123456789abc ", max_size=50))
    @settings(max_examples=100, deadline=None)
    def test_round_trip(self, s):
        assert to_western_digits(to_arabic_digits(s)) == s


class TestPublishing:
    """F6 — the three worked examples in extract-publishing-details.ts:25-50."""

    def test_full(self):
        s = ("المحقق: الدكتور عزالدين الغرياني وابنه محمد عزالدين الغرياني / "
             "دار النشر: مكتبة طرابلس العلمية العالمية / رقم الطبعة : الأولى / "
             "سنة النشر: 1420هـ")
        out = extract_publishing_details(s)
        assert out["investigator"].startswith("الدكتور عزالدين")
        assert out["publisher"] == "مكتبة طرابلس العلمية العالمية"
        assert out["edition_number"] == "الأولى"
        assert out["publication_year"] == 1420

    def test_partial(self):
        s = "المحقق: / دار النشر: دار ابن حزم / رقم الطبعة : الأولى / سنة النشر: 1467هـ"
        out = extract_publishing_details(s)
        assert out["investigator"] is None
        assert out["publisher"] == "دار ابن حزم"
        assert out["publication_year"] == 1467

    def test_all_empty(self):
        out = extract_publishing_details("المحقق: / دار النشر:  / رقم الطبعة :  / سنة النشر: ")
        assert all(v is None for v in out.values())
        assert extract_publishing_details(None) == out


class TestCommandScore:
    """F7 — ranking cases from the scorer's own comments (command-score.ts:18-47)."""

    def test_rankings(self):
        assert command_score("ouch", "uc") > command_score("curtain", "uc")
        assert command_score("bad", "bd") > command_score("bard", "bd")
        assert command_score("html", "html") > command_score("html5", "html")
        assert command_score("HTML", "HM") > command_score("haml", "HM")

    def test_exact_is_1(self):
        assert command_score("abc", "abc") == 1.0

    def test_no_match_is_0(self):
        assert command_score("abc", "xyz") == 0.0


class TestStripHtmlLinear:
    def test_raw_element_drop_matches_regex(self):
        """Linear _drop_raw_elements ≡ the reference regex on random soup."""
        import random

        from ocr_platform_spark.functions.words import (
            _SCRIPT_RE, _drop_raw_elements)

        frags = ["<script>", "</script>", "<style>", "</style>",
                 "<noscript>", "</noscript>", "<SCRIPT a=b>", "</SCRIPT >",
                 "</script", "<scripty>", "<script", "text ", "<p>x</p>",
                 "&amp;", "</style\t>", "<style x='y'>", ">", "<",
                 "</ script>", "<script >", "w",
                 # \b edge cases: '-' is NOT a word char (boundary holds),
                 # 'ñ'/'٣' ARE word chars (no boundary) — ASCII sets get
                 # both wrong
                 "<script->x</script>", "<scriptñ>x</script>",
                 "<style٣>", "<script_>", "<noscript->"]
        rng = random.Random(17)
        for _ in range(3000):
            s = "".join(rng.choice(frags)
                        for _ in range(rng.randint(0, 20)))
            assert _SCRIPT_RE.sub(" ", s) == _drop_raw_elements(s), repr(s)

    def test_pathological_inputs_fast(self):
        """Poison-pill word-count inputs must not stall a task."""
        import time

        from ocr_platform_spark.functions.words import count_words

        cases = ["<script>" * 100000 + "x",
                 "<script>x</script>" * 100000,
                 ("<script>" + "</scriptX" * 5) * 20000]
        for s in cases:
            t0 = time.time()
            count_words(s)
            assert time.time() - t0 < 10


def test_count_words_fast_path_equivalence():
    """count_words' isalnum fast path must equal the pure-findall
    definition on every input — punctuation, combining marks, digits,
    mixed scripts, and whitespace variants."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from ocr_platform_spark.functions.words import (
        WORD_RE, count_words, strip_html)

    def reference(text):
        if not text:
            return 0
        return len(WORD_RE.findall(strip_html(text)))

    vectors = [
        "hello, world!", "a—b", "étude", "१२३ ٤٥٦", "a_b c.d",
        " nbsp sep", "tab\tand\nnewline", "🙂 emoji only 🙂",
        "mixed مرحبا world 42", "... --- ...", "", "   ",
        # tag/entity inputs: count_words inlines strip_html minus its final
        # whitespace-canonicalizing join — these pin that the inlined path
        # matches the reference (which calls strip_html verbatim)
        "<p>one two</p> three", "a&amp;b &lt;c&gt;", "<script>x y</script>z",
        "<b>bold</b>&nbsp;words", "un<closed tag", "&#1605;&#1585;حبا",
    ]
    for v in vectors:
        assert count_words(v) == reference(v), v

    @settings(max_examples=200, deadline=None)
    @given(st.text(alphabet=st.characters(
        codec="utf-8", categories=(
            "Lu", "Ll", "Lo", "Mn", "Nd", "No", "Po", "Sm", "Zs", "Cc")),
        max_size=80))
    def check(s):
        assert count_words(s) == reference(s)

    check()

    # same property with tag/entity trigger chars forced into the alphabet,
    # so the HTML-strip branches of the inlined path get fuzzed too
    @settings(max_examples=200, deadline=None)
    @given(st.text(alphabet=st.sampled_from(
        list("<>&;/ab12 \tépsc")), max_size=60))
    def check_html(s):
        assert count_words(s) == reference(s)

    check_html()
