"""Deterministic synthetic Common-Crawl-style page generator.

Shape per BASELINE.json → input_hint:
    url:string, warc_ts:timestamp, html:binary, text:string, lang:string

Every document is a pure function of ``(seed, doc_index)`` — generating doc i
on the driver, in a pandas UDF on executor 7, or twice in a row yields the
same bytes. That property is what lets the golden tests and the two-
parallelism bench run over "the same input" without materializing 100 TB.

Structure grammar follows FIXTURES.md §1.1 (mirroring the reference's
segmented-page contract, apps/queue/src/pipeline/segment.ts:4-24 and golden
sample apps/web/output.json): optional header, 1-8 body paragraphs with
headings and (1)/1./1) footnote markers, optional footnote block, optional
page number in Western or Eastern-Arabic digits, plus boilerplate chrome
(nav/sidebar/footer/script) for the classifier to strip, and ~2% malformed
documents to exercise the error envelope.
"""

from __future__ import annotations

import datetime as _dt
import random

# Zipf-skewed domain pool: first domains get most urls AND bigger pages —
# exercises the salted-skew repartition path (SURVEY.md §4.2.1).
DOMAINS = [
    "archive.example.org", "books.example.net", "maktaba.example.com",
    "turath.example.org", "library.example.edu", "nusus.example.net",
    "qadim.example.com", "falsafa.example.org", "hadith.example.net",
    "shamela.example.info", "adab.example.com", "tarikh.example.org",
]
# weight ~ 1/rank (Zipf s=1); hot domains also get a page-size multiplier
_DOMAIN_W = [1.0 / (i + 1) for i in range(len(DOMAINS))]
_W_SUM = sum(_DOMAIN_W)
_SIZE_BOOST = {0: 6, 1: 3, 2: 2}  # hot domains → larger html blobs (skew)

AR_WORDS = (
    "كتاب الصلاة باب وقت قال محمد بن الحسن أخبرنا مالك عن يزيد زياد مولى "
    "عبد الله رافع أم سلمة زوج النبي صلى عليه وسلم أبي هريرة أنه سأله فقال "
    "أنا أخبرك صل الظهر إذا كان ظلك مثلك والعصر مثليك والمغرب غربت الشمس "
    "تحقيقات وتعليقات على موطأ رواية ابن بكير وهو أظهر لكونها خمسة أوقات "
    "الصلوات المفروضة ونظرا لتكرارها كل يوم تصير كثيرة وكل من الجمعين يقوم "
    "مقام الآخر وفي كثير نسخ الموطأ الرمز وهي طريقة تغلب المحدثين مصنفاتهم "
    "العلم كما في تدريب الراوي النسخة بتحقيقنا مَكتَبةٌ عِلمِيَّةٌ قَديمةٌ"
).split()
EN_WORDS = (
    "the quick brown fox jumps over a lazy dog while scholars debate the "
    "provenance of early manuscripts and the transmission of knowledge "
    "across centuries of careful copying annotation and correction by "
    "generations of librarians working in candlelit rooms near the old "
    "market where paper and ink were sold at dawn every single day"
).split()
FA_WORDS = (
    "کتاب نماز باب وقت گفت محمد بن حسن خبر داد مالک از یزید بن زیاد "
    "دانش کتابخانه نسخه قدیمی تصحیح حاشیه نویسی علم منتقل شده است"
).split()
TR_WORDS = (
    "kitap namaz bab vakit dedi muhammed bin hasan haber verdi malik eski "
    "kütüphane nüsha ilim tashih hâşiye asırlar boyunca aktarılan bilgi"
).split()

LANG_BANKS = {"ar": AR_WORDS, "en": EN_WORDS, "fa": FA_WORDS, "tr": TR_WORDS}
# Arabic-heavy mix per FIXTURES.md §1 (reference corpus is Arabic books)
LANG_CHOICES = ["ar", "ar", "ar", "ar", "ar", "ar", "en", "en", "fa", "tr"]

EASTERN = "٠١٢٣٤٥٦٧٨٩"

NAV_LINKS = ["Home", "Books", "Authors", "Genres", "About", "Contact", "تسجيل", "الرئيسية"]
EPOCH = _dt.datetime(2024, 1, 1, tzinfo=_dt.timezone.utc)


def _words(rng: random.Random, bank: list[str], n: int) -> str:
    return " ".join(rng.choice(bank) for _ in range(n))


def _to_eastern(n: int) -> str:
    return "".join(EASTERN[int(c)] for c in str(n))


def _pick_domain(rng: random.Random) -> tuple[str, int]:
    x = rng.random() * _W_SUM
    acc = 0.0
    for i, w in enumerate(_DOMAIN_W):
        acc += w
        if x <= acc:
            return DOMAINS[i], _SIZE_BOOST.get(i, 1)
    return DOMAINS[-1], 1


def gen_document(doc_index: int, seed: int = 42) -> dict:
    """Generate one synthetic page. Pure function of (seed, doc_index)."""
    rng = random.Random((seed << 32) ^ doc_index)
    domain, boost = _pick_domain(rng)
    lang = rng.choice(LANG_CHOICES)
    bank = LANG_BANKS[lang]
    url = f"https://{domain}/book/{doc_index // 50}/page/{doc_index % 50}"
    ts = EPOCH + _dt.timedelta(seconds=doc_index * 37)

    parts: list[str] = ["<html><head><title>Site Title</title>",
                        "<style>body{margin:0}</style>",
                        "<script>var x=1;</script></head><body>"]
    # chrome: nav bar with high link density
    nav = "".join(f'<a href="/{w.lower()}">{w}</a> ' for w in rng.sample(NAV_LINKS, 5))
    parts.append(f"<nav>{nav}</nav>")
    parts.append('<div class="sidebar"><ul>'
                 + "".join(f'<li><a href="#{i}">{rng.choice(bank)}</a></li>'
                           for i in range(4)) + "</ul></div>")

    # optional header (~30%)
    header_txt = None
    if rng.random() < 0.30:
        header_txt = _words(rng, bank, rng.randint(2, 5))
        parts.append(f"<header>{header_txt}</header>")

    # body: 1-8 paragraphs, some headings, footnote markers
    parts.append("<main>")
    n_paras = rng.randint(1, 8) * boost
    n_footrefs = 0
    for p in range(n_paras):
        if p > 0 and rng.random() < 0.2:
            lvl = rng.choice(["h2", "h3"])
            parts.append(f"<{lvl}>{_words(rng, bank, rng.randint(2, 4))}</{lvl}>")
        body_words = _words(rng, bank, rng.randint(8, 40 * boost))
        if rng.random() < 0.35:
            n_footrefs += 1
            body_words += f" <sup>{n_footrefs}</sup>"
        parts.append(f"<p>{body_words}</p>")
    parts.append("</main>")

    # optional footnotes block (~40%, or whenever markers were emitted)
    style = rng.choice(["({n})", "{n}.", "{n})"])  # ref convert-to-html.ts:15
    if n_footrefs or rng.random() < 0.40:
        notes = []
        for i in range(1, max(n_footrefs, rng.randint(1, 3)) + 1):
            num = _to_eastern(i) if lang == "ar" and rng.random() < 0.5 else str(i)
            mark = style.replace("{n}", num)
            notes.append(f'<p class="footnote">{mark} {_words(rng, bank, rng.randint(4, 15))}</p>')
        parts.append('<div class="footnotes">' + "".join(notes) + "</div>")

    # optional visible page number (~60%)
    page_no = None
    if rng.random() < 0.60:
        page_no = doc_index % 997 + 1
        shown = _to_eastern(page_no) if lang == "ar" and rng.random() < 0.5 else str(page_no)
        parts.append(f"<center>- {shown} -</center>")

    parts.append('<footer><p>© 2024 Example Library. '
                 '<a href="/tos">Terms</a> <a href="/privacy">Privacy</a></p></footer>')
    parts.append("</body></html>")
    html = "".join(parts)

    # ~2% malformed/truncated to exercise the error envelope
    r = rng.random()
    if r < 0.01:
        html = html[: max(10, len(html) // 3)]          # truncated
    elif r < 0.02:
        html = ""                                        # empty payload

    # the stale pre-extracted `text` column (pipeline recomputes from html)
    stale_text = _words(rng, bank, 10)

    return {
        "url": url,
        "warc_ts": ts,
        "html": html.encode("utf-8"),
        "text": stale_text,
        "lang": lang,
    }


def gen_batch(start: int, end: int, seed: int = 42) -> list[dict]:
    return [gen_document(i, seed) for i in range(start, end)]


def gen_media(doc_index: int, seed: int = 42) -> dict:
    """Deterministic media-table row: a small synthetic PNG, baseline-JPEG
    or GIF payload (pure function of (doc_index, seed), like gen_document).
    index%3==1 rows (when 1- or 3-channel) encode as JPEG — the web's
    dominant format; index%3==2 rows as GIF (palette+LZW); the rest as
    PNG. Every 13th row is truncated and every 17th carries a *foreign*
    format's magic over its body — the decode error envelope must route
    those, never drop them."""
    from ocr_platform_spark.functions.gif import encode_gif
    from ocr_platform_spark.functions.jpeg import encode_jpeg
    from ocr_platform_spark.functions.png import encode_png
    from ocr_platform_spark.functions.avi import encode_avi
    from ocr_platform_spark.functions.wav import encode_wav

    rng = random.Random((seed << 32) ^ (doc_index * 2654435761))
    if doc_index % 11 == 6 and doc_index % 7 != 4:
        # video row: 2-5 small deterministic MJPEG frames in an AVI
        w, h = 16, 12
        n_frames = 2 + rng.randrange(4)
        sub = ("444", "420")[(doc_index // 11) % 2]   # real MJPEG is 4:2:0
        frames = [encode_jpeg(w, h, 3, bytes(
            (17 * x + 13 * y + 71 * k + rng.randrange(4)) & 0xFF
            for y in range(h) for x in range(w) for _ in range(3)),
            subsampling=sub)
            for k in range(n_frames)]
        payload = encode_avi(frames, fps=10, w=w, h=h)
        url = f"https://img.example.org/m/{doc_index}.avi"
        if doc_index % 13 == 5:
            payload = payload[: len(payload) * 2 // 3]
        elif doc_index % 17 == 3:
            payload = b"\x89PNG\r\n\x1a\n" + payload[8:]
        return {"url": url, "media": payload}
    if doc_index % 7 == 4:
        # audio row: deterministic integer triangle-ish waveform
        rate = rng.choice([8000, 16000, 44100])
        ch = rng.choice([1, 2])
        n = (64 + rng.randrange(192)) * ch
        freq = 3 + rng.randrange(29)
        samples = [(((i * freq) % 256) - 128) * 137 for i in range(n)]
        payload = encode_wav(rate, ch, samples)
        url = f"https://img.example.org/m/{doc_index}.wav"
        if doc_index % 13 == 5:
            payload = payload[: len(payload) * 2 // 3]
        elif doc_index % 17 == 3:
            payload = b"\x89PNG\r\n\x1a\n" + payload[8:]
        return {"url": url, "media": payload}
    w = 16 + rng.randrange(17)          # 16..32
    h = 12 + rng.randrange(13)          # 12..24
    channels = rng.choice([1, 3, 3, 4])  # gray/RGB/RGBA mix
    base = rng.randrange(256)
    px = bytearray()
    for y in range(h):
        for x in range(w):
            for c in range(channels):
                px.append((base + 7 * x + 13 * y + 29 * c
                           + rng.randrange(8)) & 0xFF)
    # JPEG supports 1/3 channels; RGBA rows stay PNG/GIF
    as_jpeg = doc_index % 3 == 1 and channels in (1, 3)
    as_gif = doc_index % 3 == 2
    if as_jpeg:
        # real web JPEGs are overwhelmingly 4:2:0 (and often carry restart
        # markers): mix 444/420/422 and DRI deterministically so the
        # mm_decode/mm_features oracles pin the subsampled decode path
        sub = ("420", "444", "422")[(doc_index // 3) % 3] \
            if channels == 3 else "444"
        ri = 2 if doc_index % 5 == 0 else 0
        payload = encode_jpeg(w, h, channels, bytes(px),
                              subsampling=sub, restart_interval=ri)
        ext = "jpg"
    elif as_gif:
        payload = encode_gif(w, h, channels, bytes(px))
        ext = "gif"
    else:
        payload = encode_png(w, h, channels, bytes(px))
        ext = "png"
    url = f"https://img.example.org/m/{doc_index}.{ext}"
    if doc_index % 13 == 5:
        payload = payload[: len(payload) * 2 // 3]   # truncated
    elif doc_index % 17 == 3:
        # foreign magic over the wrong body: the sniffed codec must reject
        other = b"\x89PNG\r\n\x1a\n" if ext != "png" else b"\xff\xd8\xff"
        payload = other + payload[len(other):]
    return {"url": url, "media": payload}
