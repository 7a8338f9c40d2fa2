"""WARC ingestion source (sources/warc.py): pure-kernel vectors, hostile
payloads (never-drop, stable error strings), Spark↔pure parity, and the
pages-shape projection. Reference analogue: the document-fetch source edge
(apps/queue/src/lib/ocr.ts:15-33) — here the crawl container format itself."""

import gzip
import random

import pytest

from ocr_platform_spark.datagen import gen_document
from ocr_platform_spark.sources.warc import (
    FIXTURE_DIR, MAX_RECORD_BYTES, http_response_bytes,
    make_warc_fixture_files, parse_warc, read_warc, response_record,
    warc_pages, warc_record_bytes, warcinfo_record, write_warc,
)

TS = "2026-02-03T04:05:06Z"


def _gz(*records: bytes) -> bytes:
    return b"".join(gzip.compress(r, mtime=0) for r in records)


# --------------------------------------------------------------------------
# pure kernel
# --------------------------------------------------------------------------

def test_roundtrip_byte_identical():
    recs, origs = [], []
    for i in range(25):
        d = gen_document(i, 42)
        ts = d["warc_ts"].strftime("%Y-%m-%dT%H:%M:%SZ")
        recs.append(response_record(d["url"], ts, bytes(d["html"])))
        origs.append((d["url"], ts, bytes(d["html"])))
    rows = parse_warc(_gz(*recs), "rt")
    assert len(rows) == 25
    for r, (u, ts, h) in zip(rows, origs):
        assert (r["url"], r["warc_date"], r["html"]) == (u, ts, h)
        assert r["http_status"] == 200 and r["parse_error"] is None


def test_record_spanning_gzip_members():
    r = response_record("https://x/span", TS, b"<html>" + b"y" * 300)
    data = _gz(r[:137]) + _gz(r[137:])
    rows = parse_warc(data, "s")
    assert len(rows) == 1 and rows[0]["parse_error"] is None
    assert rows[0]["html"] == b"<html>" + b"y" * 300


def test_single_member_multi_record_and_bare():
    recs = [response_record(f"https://x/{i}", TS, b"<p>a</p>")
            for i in range(3)]
    # whole file as ONE gzip member (non-CC layout) and uncompressed
    for data in (gzip.compress(b"".join(recs), mtime=0), b"".join(recs)):
        rows = parse_warc(data, "m")
        assert [r["url"] for r in rows] == [f"https://x/{i}" for i in range(3)]


def test_non_response_records_skipped_but_indexed():
    data = _gz(warcinfo_record("f.warc.gz"),
               warc_record_bytes("request", {
                   "WARC-Target-URI": "https://x/r", "WARC-Date": TS},
                   b"GET / HTTP/1.1\r\n\r\n"),
               response_record("https://x/keep", TS, b"<p>k</p>"))
    rows = parse_warc(data, "skip")
    assert len(rows) == 1
    assert rows[0]["url"] == "https://x/keep"
    assert rows[0]["record_index"] == 2  # gaps are auditable


@pytest.mark.parametrize("data,err", [
    (b"\x1f\x8b\x08garbage-not-gzip" + b"\x00" * 32, "bad gzip member"),
    (b"PK\x03\x04zipfile", "not a warc file"),
    (b"WARC/1.0\r\nWARC-Type: response\r\nContent-Length: nope\r\n\r\nx",
     "bad content-length"),
    (b"WARC/1.0\r\nWARC-Type: response\r\n\r\n", "bad content-length"),
    (b"WARC/1.0\r\nWARC-Type: response\r\nContent-Length: "
     + str(MAX_RECORD_BYTES + 1).encode() + b"\r\n\r\n",
     "record exceeds MAX_RECORD_BYTES"),
])
def test_hostile_payloads_stable_errors(data, err):
    rows = parse_warc(data, "h")
    assert rows[-1]["parse_error"] == err


def test_truncated_record_and_file_stops():
    full = response_record("https://x/t", TS, b"<html>" + b"z" * 200)
    rows = parse_warc(_gz(full[: len(full) // 2]), "t")
    assert rows == [{"warc_file": "t", "record_index": 0, "url": None,
                     "warc_date": None, "html": None, "http_status": None,
                     "content_type": None, "parse_error": "truncated record"}]


def test_http_edge_cases_kept_never_dropped():
    recs = [
        response_record("https://x/404", TS, b"<html>gone</html>",
                        status=404),
        warc_record_bytes("response", {
            "WARC-Target-URI": "https://x/badhttp", "WARC-Date": TS,
            "Content-Type": "application/http; msgtype=response",
        }, b"NOT-HTTP\r\n\r\nbody"),
        warc_record_bytes("response", {
            "WARC-Target-URI": "https://x/baddate",
            "WARC-Date": "yesterday",
            "Content-Type": "application/http; msgtype=response",
        }, http_response_bytes(b"<p>d</p>")),
        warc_record_bytes("response", {
            "WARC-Target-URI": "https://x/raw", "WARC-Date": TS,
            "Content-Type": "text/html"}, b"<p>no http</p>"),
    ]
    rows = parse_warc(_gz(*recs), "e")
    by_url = {r["url"]: r for r in rows}
    assert by_url["https://x/404"]["http_status"] == 404
    assert by_url["https://x/badhttp"]["parse_error"] == "bad http status line"
    assert by_url["https://x/baddate"]["parse_error"] == "bad warc-date"
    assert by_url["https://x/baddate"]["http_status"] == 200
    assert by_url["https://x/raw"]["parse_error"] == "bad http framing"
    assert by_url["https://x/raw"]["html"] == b"<p>no http</p>"


def test_fuzz_never_raises():
    rng = random.Random(7)
    for _ in range(200):
        blob = bytes(rng.randrange(256) for _ in range(rng.randrange(400)))
        assert isinstance(parse_warc(blob, "f"), list)
        assert isinstance(parse_warc(gzip.compress(blob, mtime=0), "fg"), list)


def test_fixture_files_deterministic(tmp_path):
    """Committed fixture bytes are a pure function of (n_pages, seed)."""
    made = make_warc_fixture_files(tmp_path)
    for f in made:
        committed = FIXTURE_DIR / f.name
        assert committed.exists(), f"{f.name} not committed — run " \
            "tools/make_driver_fixtures.py"
        assert f.read_bytes() == committed.read_bytes(), \
            f"{f.name} drifted from the generator"


# --------------------------------------------------------------------------
# Spark wrapper
# --------------------------------------------------------------------------

def test_read_warc_matches_pure_parse(spark):
    df = read_warc(spark, str(FIXTURE_DIR / "*.warc.gz"))
    got = sorted(
        (r["warc_file"].rsplit("/", 1)[-1], r["record_index"], r["url"],
         bytes(r["html"]) if r["html"] is not None else None,
         r["http_status"], r["content_type"], r["parse_error"])
        for r in df.collect())
    want = sorted(
        (f.name, r["record_index"], r["url"], r["html"], r["http_status"],
         r["content_type"], r["parse_error"])
        for f in FIXTURE_DIR.glob("*.warc.gz")
        for r in parse_warc(f.read_bytes(), source=f.name))
    assert got == want


def test_warc_pages_projection(spark, tmp_path):
    recs = []
    for i in range(8):
        d = gen_document(i, 42)
        ts = d["warc_ts"].strftime("%Y-%m-%dT%H:%M:%SZ")
        recs.append(response_record(d["url"], ts, bytes(d["html"])))
    recs.append(response_record("https://x/404", TS, b"x", status=404))
    recs.append(response_record("https://x/pdf", TS, b"%PDF",
                                content_type="application/pdf"))
    write_warc(tmp_path / "p.warc.gz", recs)
    pages = warc_pages(read_warc(spark, str(tmp_path / "p.warc.gz")))
    assert pages.columns == ["url", "warc_ts", "html", "text", "lang"]
    rows = pages.collect()
    assert len(rows) == 8  # 404 + pdf filtered by the projection
    # html bytes survive Spark round-trip byte-identically
    originals = {gen_document(i, 42)["url"]: bytes(gen_document(i, 42)["html"])
                 for i in range(8)}
    for r in rows:
        assert bytes(r["html"]) == originals[r["url"]]


def test_read_warc_plan_no_shuffle(spark):
    """Ingest is scan → mapInPandas: no Exchange anywhere in the plan
    (parallelism comes from binaryFile's file packing, the format's own
    sharding — the 100 TB story)."""
    df = read_warc(spark, str(FIXTURE_DIR / "*.warc.gz"))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_write_warc_files_distributed_roundtrip(spark, tmp_path):
    """pages → executor-written .warc.gz per partition (+ manifest) →
    read_warc → identical pages. The sink/source pair closes the loop:
    a curated subset exported as WARC is re-ingestable byte-identically."""
    from ocr_platform_spark.sources.pages import pages_df
    from ocr_platform_spark.sources.warc import write_warc_files

    out = tmp_path / "resharded"
    pages = pages_df(spark, 120, partitions=6)
    manifest = write_warc_files(pages, str(out)).collect()
    assert sum(m["n_records"] for m in manifest) == 120
    assert len(list(out.glob("part-*.warc.gz"))) == \
        sum(1 for m in manifest if m["n_records"] > 0)
    for m in manifest:
        if m["n_records"]:
            assert (out / m["warc_file"]).stat().st_size == m["n_bytes"]

    back = warc_pages(read_warc(spark, str(out)))
    orig = {r["url"]: (bytes(r["html"]), r["warc_ts"])
            for r in pages.collect()}
    got = {r["url"]: (bytes(r["html"]), r["warc_ts"])
           for r in back.collect()}
    assert got == orig


def test_legacy_encoded_captures_extract_correctly(spark):
    """Crawl-container → pages projection → extraction kernel, over the
    committed legacy.warc.gz: cp1256-declared, UTF-16-BOM and undeclared
    cp1252 pages must come out as real text (extract/charset.py), with the
    html BYTES untouched by ingest (decoding belongs to the kernel)."""
    from ocr_platform_spark.extract.pipeline import extract_document

    df = warc_pages(read_warc(spark, str(FIXTURE_DIR / "legacy.warc.gz")))
    rows = {r["url"]: bytes(r["html"]) for r in df.collect()}
    assert set(rows) == {
        "https://legacy.example/cp1256",
        "https://legacy.example/utf16",
        "https://legacy.example/cp1252-undeclared",
        "https://legacy.example/koi8-header-only",
    }

    ar = extract_document("u", rows["https://legacy.example/cp1256"])
    assert ar.failed_stage is None
    assert "مرحبا بالعالم" in ar.extracted_text
    assert "�" not in ar.extracted_text

    u16 = extract_document("u", rows["https://legacy.example/utf16"])
    assert u16.failed_stage is None
    assert "utf sixteen page body" in u16.extracted_text

    fr = extract_document("u", rows["https://legacy.example/cp1252-undeclared"])
    assert fr.failed_stage is None
    assert "it’s a café — déjà vu" in fr.extracted_text
    assert "�" not in fr.extracted_text


def test_transport_charset_header_only_capture(spark):
    """WHATWG ranks the HTTP Content-Type charset above the meta tag; the
    WARC path has the header in hand. End-to-end: the koi8-r capture whose
    ONLY charset signal is the header must extract real Russian text when
    ingested with with_transport_charset=True — and the payload-only kernel
    call (the pages-table contract, unchanged goldens) must NOT, proving
    the transport label is doing the work."""
    from ocr_platform_spark.extract.pipeline import extract_document
    from ocr_platform_spark.plans.extract_job import extract_pages

    url = "https://legacy.example/koi8-header-only"
    parsed = read_warc(spark, str(FIXTURE_DIR / "legacy.warc.gz"))

    pages = warc_pages(parsed, with_transport_charset=True)
    labels = {r["url"]: r["transport_charset"] for r in pages.collect()}
    assert labels[url] == "koi8-r"
    # the other legacy captures ship bare text/html headers → no label,
    # so BOM / meta / sniffing decide exactly as on the pages-table path
    assert labels["https://legacy.example/cp1256"] is None

    out = {r["url"]: r for r in
           extract_pages(pages, n_buckets=4).collect()}
    assert out[url]["failed_stage"] is None
    assert "привет мир" in out[url]["extracted_text"]
    # the meta-labeled cp1256 page must be untouched by the new column
    assert "مرحبا بالعالم" in \
        out["https://legacy.example/cp1256"]["extracted_text"]
    # proof the header label did the work: the payload-only kernel call
    # (the unchanged golden contract) has no signal and mojibakes
    raw = {r["url"]: bytes(r["html"]) for r in pages.collect()}
    payload_only = extract_document("u", raw[url])
    assert "привет" not in payload_only.extracted_text  # cp1252 mojibake


def test_write_wet_files_roundtrip(spark, tmp_path):
    """The engine's native output loop: pages → extraction kernel →
    executor-written .warc.wet.gz conversion records (+ manifest) →
    read_wet → byte-identical extracted text per url."""
    from ocr_platform_spark.plans.extract_job import extract_pages
    from ocr_platform_spark.sources.pages import pages_df
    from ocr_platform_spark.sources.warc import read_wet, write_wet_files

    out = tmp_path / "wet"
    pages = pages_df(spark, 120, partitions=6)
    extracted = extract_pages(pages, shuffle=False) \
        .select("url", "extracted_text")
    wet_in = (pages.select("url", "warc_ts")
              .join(extracted, "url")
              .withColumnRenamed("extracted_text", "text"))
    manifest = write_wet_files(wet_in, str(out)).collect()
    assert sum(m["n_records"] for m in manifest) == 120
    for m in manifest:
        if m["n_records"]:
            assert (out / m["wet_file"]).stat().st_size == m["n_bytes"]

    back = read_wet(spark, str(out / "*.warc.wet.gz"))
    got = {r["url"]: (bytes(r["html"]).decode("utf-8"), r["warc_ts"])
           for r in back.collect()}
    orig = {r["url"]: (r["text"] if r["text"] is not None else "",
                       r["warc_ts"])
            for r in wet_in.collect()}
    assert got == orig
    # conversion rows carry no HTTP status and declare text/plain
    kinds = back.select("http_status", "content_type").distinct().collect()
    assert [(r["http_status"], r["content_type"]) for r in kinds] \
        == [(None, "text/plain")]


def test_conversion_records_ignored_by_default():
    """Back-compat: parse_warc without include_conversion skips conversion
    records (type-skip contract), and the WARC-Refers-To link carries the
    response record's id so WET rows join back to their crawl records."""
    import gzip

    from ocr_platform_spark.sources.warc import (
        conversion_record, parse_warc, response_record)

    url, ts = "https://x.example/a", "2026-01-02T03:04:05Z"
    conv = conversion_record(url, ts, "extracted text")
    resp = response_record(url, ts, b"<html>x</html>")
    rows = parse_warc(gzip.compress(conv), source="f")
    assert rows == []          # skipped, not an error row
    rows = parse_warc(gzip.compress(conv), source="f",
                      include_conversion=True)
    assert [r["url"] for r in rows] == [url]
    assert bytes(rows[0]["html"]) == b"extracted text"

    def hdr(rec, name):
        head = bytes(rec).split(b"\r\n\r\n", 1)[0].decode()
        return [ln.split(": ", 1)[1] for ln in head.split("\r\n")
                if ln.lower().startswith(name.lower() + ":")][0]

    assert hdr(conv, "WARC-Refers-To") == hdr(resp, "WARC-Record-ID")


def test_sink_edge_cases_null_ts_and_empty_partition(spark, tmp_path):
    """(a) a NULL warc_ts row (parse_warc emits them for bad dates under
    never-drop) must export with the epoch sentinel, not crash the task;
    (b) an empty partition must manifest a NULL file name, not name a
    file that was never written."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import (
        BinaryType, StringType, StructField, StructType, TimestampType)
    from ocr_platform_spark.sources.warc import (
        read_wet, write_warc_files, write_wet_files)

    schema = StructType([
        StructField("url", StringType(), False),
        StructField("warc_ts", TimestampType(), True),
        StructField("text", StringType(), True),
    ])
    import datetime
    rows = [("https://x.example/ok", datetime.datetime(2026, 1, 2), "good"),
            ("https://x.example/null-ts", None, "kept anyway")]
    # repartition to 4 so at least two partitions are empty
    df = spark.createDataFrame(rows, schema).repartition(4)
    out = tmp_path / "wet"
    manifest = write_wet_files(df, str(out)).collect()
    assert sum(m["n_records"] for m in manifest) == 2
    for m in manifest:
        if m["n_records"] == 0:
            assert m["wet_file"] is None          # no phantom names
        else:
            assert (out / m["wet_file"]).exists()
    back = {r["url"]: (bytes(r["html"]).decode(), r["warc_ts"])
            for r in read_wet(spark, str(out / "*.warc.wet.gz")).collect()}
    assert back["https://x.example/null-ts"][0] == "kept anyway"
    assert back["https://x.example/null-ts"][1] == \
        datetime.datetime(1970, 1, 1)             # epoch sentinel
    assert back["https://x.example/ok"] == ("good",
                                            datetime.datetime(2026, 1, 2))

    # same contract on the WARC response sink (shared _records_sink)
    wdf = df.select("url", "warc_ts",
                    F.encode("text", "utf-8").alias("html"))
    wman = write_warc_files(wdf, str(tmp_path / "warc")).collect()
    assert sum(m["n_records"] for m in wman) == 2
    assert all(m["warc_file"] is None for m in wman if m["n_records"] == 0)
