"""Operator-level tests: dedup family cross-validation, ANN recall,
language-ID accuracy, multimodal plumbing. The exact-SQL parity of every
oracle-backed query is checked by tools/check_oracles.py (and per-round by
the driver); these tests carry the burden for the probabilistic paths."""

from __future__ import annotations

import hashlib

import pytest

SF = "/root/testdata/sf0.01"


# --------------------------------------------------------------------------
# dedup
# --------------------------------------------------------------------------

def test_minhash_lsh_vs_bruteforce(spark):
    """LSH candidates, after exact verification, must recover (almost all
    of) the brute-force Jaccard pairs; every emitted pair must itself pass
    the exact threshold (no false positives by construction)."""
    from ocr_platform_spark.operators.dedup import dd_minhash_lsh, dd_ngram_jaccard

    brute = {(r["a_id"], r["b_id"]) for r in dd_ngram_jaccard(spark, SF).collect()}
    lsh_rows = dd_minhash_lsh(spark, SF).collect()
    lsh = {(r["a_id"], r["b_id"]) for r in lsh_rows}
    assert brute, "corpus should contain high-jaccard pairs"
    # no false positives: every LSH pair is exact-verified at threshold
    for r in lsh_rows:
        assert r["inter"] * 2 >= r["uni"]
    assert lsh <= brute  # verification makes LSH output a subset
    recall = len(lsh & brute) / len(brute)
    assert recall >= 0.8, f"LSH recall {recall:.2f} too low"


def test_embedding_lsh_vs_bruteforce(spark):
    """The bucketed embedding near-dup path must be a subset of the exact
    all-pairs result (exact-cosine verification within buckets) with high
    recall — the same contract the MinHash path carries for Jaccard."""
    from ocr_platform_spark.operators.dedup import (
        dd_embedding_lsh, dd_embedding_near)

    exact = {(r["a_id"], r["b_id"]): r["cos_x1e6"]
             for r in dd_embedding_near(spark, SF).collect()}
    lsh = {(r["a_id"], r["b_id"]): r["cos_x1e6"]
           for r in dd_embedding_lsh(spark, SF).collect()}
    assert exact, "corpus should contain near-dup embedding pairs"
    assert set(lsh) <= set(exact)
    for pair, cos in lsh.items():
        assert cos == exact[pair]  # identical exact-cosine verification
    recall = len(lsh) / len(exact)
    assert recall >= 0.6, f"embedding LSH recall {recall:.2f} too low"


def test_simhash_properties(spark):
    from ocr_platform_spark.operators.dedup import dd_simhash, simhash64

    # pure-function sanity
    assert simhash64("the quick brown fox") == simhash64("the quick brown fox")
    a = simhash64("the quick brown fox jumps over the lazy dog")
    b = simhash64("the quick brown fox jumps over the lazy cat")
    c = simhash64("completely different words entirely unrelated text")
    ham = lambda x, y: bin((x ^ y) & (2**64 - 1)).count("1")
    assert ham(a, b) < ham(a, c)

    rows = dd_simhash(spark, SF).collect()
    for r in rows:
        assert r["a_id"] < r["b_id"]
        assert 0 <= r["hamming"] <= 3


def test_exact_dedup_counts(spark):
    from ocr_platform_spark.operators.dedup import dd_exact
    from ocr_platform_spark.operators.tables import load

    rows = dd_exact(spark, SF).collect()
    n_docs = load(spark, SF, "documents").count()
    assert sum(r["n_copies"] for r in rows) == n_docs
    assert all(r["n_copies"] >= 1 for r in rows)


# --------------------------------------------------------------------------
# similarity search
# --------------------------------------------------------------------------

def test_ann_lsh_recall(spark):
    from ocr_platform_spark.operators.similarity import ann_brute_topk, ann_lsh_topk

    truth: dict = {}
    for r in ann_brute_topk(spark, SF).collect():
        truth.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    got: dict = {}
    for r in ann_lsh_topk(spark, SF).collect():
        got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    hits = sum(len(truth[q] & got.get(q, set())) for q in truth)
    total = sum(len(v) for v in truth.values())
    recall = hits / total
    assert recall >= 0.5, f"ANN recall@10 {recall:.2f} too low"


# --------------------------------------------------------------------------
# text analysis
# --------------------------------------------------------------------------

def test_langid_accuracy(spark):
    """Script/marker heuristic vs datagen ground truth on real-script pages."""
    from ocr_platform_spark.operators.text_analysis import ta_langid_pages

    rows = ta_langid_pages(spark, SF).collect()
    assert rows
    correct = sum(1 for r in rows if r["lang_detected"] == r["lang"])
    acc = correct / len(rows)
    assert acc >= 0.9, f"langid accuracy {acc:.2f}"


def test_langid_pure():
    from ocr_platform_spark.operators.text_analysis import detect_language

    assert detect_language("كتاب الصلاة باب وقت الظهر والعصر") == "ar"
    assert detect_language("کتاب نماز باب وقت گفت محمد") == "fa"
    assert detect_language("the quick brown fox jumps over the dog") == "en"
    assert detect_language("kitap namaz bab vakit dedi muhammed ve bir eski") == "tr"
    assert detect_language("") == "und"


# --------------------------------------------------------------------------
# multimodal plumbing
# --------------------------------------------------------------------------

def test_media_features(spark):
    from ocr_platform_spark.datagen import gen_document
    from ocr_platform_spark.operators.multimodal import (
        fake_features, media_features, sniff_format)
    from ocr_platform_spark.sources.pages import pages_df

    out = {r["url"]: r for r in media_features(pages_df(spark, 50)).collect()}
    assert len(out) == 50
    for i in range(50):
        doc = gen_document(i)
        r = out[doc["url"]]
        payload = doc["html"]
        if len(payload) == 0:
            assert r["decode_error"] == "empty payload"
            continue
        assert r["n_bytes"] == len(payload)
        assert r["sha256"] == hashlib.sha256(payload).hexdigest()
        assert r["feature"] == pytest.approx(fake_features(payload))
        assert r["format"] == sniff_format(payload)


def test_decode_dispatch():
    """PNG, JPEG and GIF payloads really decode (pure-stdlib codecs);
    malformed payloads raise the codec error; formats with no installed
    codec stay declared stubs."""
    from ocr_platform_spark.functions.gif import (
        GifError, decode_gif, encode_gif)
    from ocr_platform_spark.functions.jpeg import (
        JpegError, decode_jpeg, encode_jpeg)
    from ocr_platform_spark.functions.png import PngError, encode_png
    from ocr_platform_spark.operators.multimodal import decode_image

    w, h, ch, px = decode_image(encode_png(2, 2, 3, bytes(range(12))))
    assert (w, h, ch, px) == (2, 2, 3, bytes(range(12)))
    jblob = encode_jpeg(8, 8, 1, bytes(64))
    assert decode_image(jblob) == decode_jpeg(jblob)
    gblob = encode_gif(4, 4, 3, bytes(48))
    assert decode_image(gblob) == decode_gif(gblob)
    with pytest.raises(PngError):
        decode_image(b"\x89PNG\r\n\x1a\nxxxx")   # malformed PNG
    with pytest.raises(JpegError):
        decode_image(b"\xff\xd8\xff not a real jpeg body")
    with pytest.raises(GifError):
        decode_image(b"GIF89a corrupt gif body here")
    with pytest.raises(NotImplementedError):
        decode_image(b"RIFF....WAVE no audio codec")


def test_simhash_vectorized_matches_naive_loop():
    """The numpy bit-accumulation must stay bit-identical to the reference
    per-bit loop (signatures feed the banded pair join — any drift silently
    changes candidate sets)."""
    import hashlib

    from ocr_platform_spark.datagen import gen_document
    from ocr_platform_spark.operators.dedup import simhash64

    def naive(text):
        if not text:
            return 0
        acc = [0] * 64
        for tok in text.lower().split():
            h = int.from_bytes(hashlib.md5(tok.encode()).digest()[:8], "big")
            for j in range(64):
                acc[j] += 1 if (h >> j) & 1 else -1
        sig = 0
        for j in range(64):
            if acc[j] > 0:
                sig |= 1 << j
        return sig - (1 << 64) if sig >= (1 << 63) else sig

    texts = [gen_document(i, 42)["text"] for i in range(40)]
    texts += ["", "one", "a b c", "تشكيل عربي نص"]
    for t in texts:
        assert simhash64(t) == naive(t)


def test_ann_ivf_recall(spark):
    """IVF multi-probe must recover most of the exact top-k (near-orthogonal
    random vectors are the adversarial case; probing 4/16 cells reads ~25%
    of the corpus and should beat that fraction by a wide margin)."""
    from ocr_platform_spark.operators.similarity import (
        TOP_K, ann_brute_topk, ann_ivf_topk)

    sf = "/root/testdata/sf0.001"
    exact = {(r["query_id"], r["neighbor_id"])
             for r in ann_brute_topk(spark, sf).collect()}
    approx = {(r["query_id"], r["neighbor_id"])
              for r in ann_ivf_topk(spark, sf, enforce_fixture_pin=False).collect()}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.4, f"IVF recall {recall:.2f}"
    # determinism: same plan twice → same result set
    again = {(r["query_id"], r["neighbor_id"])
             for r in ann_ivf_topk(spark, sf, enforce_fixture_pin=False).collect()}
    assert approx == again


def test_ann_ivf_matches_python_replica(spark):
    """The distributed Lloyd fit + probe + re-rank must equal the
    pure-Python replica EXACTLY (same centroid integer math, same fold
    orders, same tie-breaks) — this is what makes the fixture parquet a
    legitimate independent oracle for the driver."""
    from ocr_platform_spark.operators.similarity import (
        ann_ivf_topk, ivf_topk_python)
    from ocr_platform_spark.operators.tables import load
    from pyspark.sql import functions as F

    sf = "/root/testdata/sf0.001"
    spark_rows = {(r["query_id"], r["neighbor_id"], r["rank"])
                  for r in ann_ivf_topk(spark, sf, enforce_fixture_pin=False).collect()}
    vecs = [(r["vec_id"], list(r["v"])) for r in
            load(spark, sf, "embeddings")
            .select("vec_id", F.col("embedding").cast("array<double>")
                    .alias("v")).orderBy("vec_id").collect()]
    assert spark_rows == set(ivf_topk_python(vecs))


def test_winnowing_guarantee():
    """The winnowing contract (Schleimer et al. 2003): two documents
    sharing a substring of length >= w + k - 1 (after canonicalization)
    MUST share at least one fingerprint. Verified on the SQL oracle side
    (the Spark side is driver-verified equal to it)."""
    import duckdb

    from ocr_platform_spark.operators.text_analysis import (
        TA_WINNOW_SQL, WINNOW_K, WINNOW_W)

    shared = "x" .join(f"common{i}" for i in range(12))   # > w+k-1 chars
    assert len(shared) >= WINNOW_K + WINNOW_W - 1
    con = duckdb.connect()
    con.sql("CREATE TABLE documents AS SELECT * FROM (VALUES "
            f"(1, 'left padding words {shared} more on this side'), "
            f"(2, 'totally different prefix {shared} other suffix here')"
            ") AS t(doc_id, text)")
    rows = con.sql(TA_WINNOW_SQL).fetchall()
    fps = {}
    for doc_id, fp in rows:
        fps.setdefault(doc_id, set()).add(fp)
    assert fps[1] & fps[2], "shared substring must share a fingerprint"


def test_duplicate_clusters_warns_on_nonconvergence(spark):
    """A chain whose diameter exceeds max_iter must WARN (partial labels
    would otherwise silently produce wrong keep decisions)."""
    import warnings

    from ocr_platform_spark.operators.dedup import duplicate_clusters

    ids = spark.createDataFrame([(i,) for i in range(8)], "doc_id long")
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(7)], "a_id long, b_id long")
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        duplicate_clusters(ids, chain, max_iter=1).collect()
    assert any("did not converge" in str(w.message) for w in caught)
    # and with enough rounds the same chain resolves cleanly, no warning
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        out = duplicate_clusters(ids, chain, max_iter=10).collect()
    assert not any("did not converge" in str(w.message) for w in caught)
    assert {r["cluster_id"] for r in out} == {0}


def test_duplicate_clusters_match_union_find(spark):
    """Label-propagation connected components must equal a pure-Python
    union-find over the same pair set (incl. transitive chains)."""
    from pyspark.sql import functions as F

    from ocr_platform_spark.operators.dedup import duplicate_clusters

    ids = spark.createDataFrame([(i,) for i in range(20)], "doc_id long")
    # two chains (0-1-2-3, 10-11-12), one triangle (5,6,7), singletons rest
    raw = [(0, 1), (1, 2), (2, 3), (10, 11), (11, 12),
           (5, 6), (6, 7), (5, 7)]
    pairs = spark.createDataFrame(raw, "a_id long, b_id long")

    got = {r["doc_id"]: r["cluster_id"]
           for r in duplicate_clusters(ids, pairs).collect()}

    parent = list(range(20))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in raw:
        parent[find(a)] = find(b)
    # canonical label = min member of each component
    comp = {}
    for i in range(20):
        comp.setdefault(find(i), []).append(i)
    want = {}
    for members in comp.values():
        m = min(members)
        for i in members:
            want[i] = m
    assert got == want
    # canonical flags: exactly one keeper per cluster
    canon = [r for r in duplicate_clusters(ids, pairs).collect()
             if r["is_canonical"]]
    assert len(canon) == len(comp)


def test_dd_clusters_on_testdata(spark):
    """dd_clusters runs on the fixture and every cluster keeps exactly one
    canonical doc whose id is the cluster minimum."""
    from ocr_platform_spark.operators.dedup import dd_clusters

    rows = dd_clusters(spark, "/root/testdata/sf0.001").collect()
    assert rows, "fixture contains near-dup pairs"
    by_cluster = {}
    for r in rows:
        by_cluster.setdefault(r["cluster_id"], []).append(r)
    for cid, members in by_cluster.items():
        assert min(m["doc_id"] for m in members) == cid
        assert sum(m["is_canonical"] for m in members) == 1


def test_lsh_bucket_np_matches_expression(spark):
    """bucket_array_np (numpy matmul) must produce EXACTLY the bucket ids
    of the Catalyst-expression form (the SQL oracle's 1:1 replica) over
    the full embeddings table — the sign-margin argument made executable."""
    from pyspark.sql import functions as F

    from ocr_platform_spark.operators.similarity import (
        LSH_PLANES, LSH_TABLES, bucket_array, bucket_array_np)
    from ocr_platform_spark.operators.tables import load

    emb = load(spark, "/root/testdata/sf0.01", "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v"))
    both = emb.select(
        "vec_id",
        bucket_array("v", LSH_TABLES, LSH_PLANES).alias("expr_b"),
        bucket_array_np("v", LSH_TABLES, LSH_PLANES).alias("np_b"))
    diff = both.filter(F.col("expr_b") != F.col("np_b")).count()
    assert diff == 0


# --- quality-argmax keeper per near-dup cluster ------------------------------

def test_keep_best_kernel_argmax_and_singletons(spark):
    """Keeper = highest score, tie-break lowest doc_id; docs absent from
    the label set are singletons that keep themselves."""
    from ocr_platform_spark.operators.dedup import keep_best_per_cluster

    labels = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1),          # cluster 1: argmax is doc 3
         (10, 10), (11, 10)],             # cluster 10: tie -> min id 10
        "doc_id long, cluster_id long")
    scores = spark.createDataFrame(
        [(1, 50), (2, 70), (3, 90),
         (10, 40), (11, 40),
         (99, 5)],                        # 99 has no label row: singleton
        "doc_id long, score_x10k long")
    rows = {r["doc_id"]: r for r in
            keep_best_per_cluster(labels, scores).collect()}
    assert set(rows) == {1, 2, 3, 10, 11, 99}        # never-drop
    assert [rows[i]["keep"] for i in (1, 2, 3)] == [False, False, True]
    assert [rows[i]["keep"] for i in (10, 11)] == [True, False]
    assert rows[99]["keep"] and rows[99]["cluster_id"] == 99


def test_dd_keep_best_on_testdata(spark):
    """Full-corpus run: one keeper per cluster, keeper is the score-argmax
    (pure-Python recompute), and the fixture actually EXERCISES the
    argmax — some cluster's keeper must differ from the min-id member
    (else the query would be indistinguishable from dd_clusters)."""
    from ocr_platform_spark.operators.dedup import dd_keep_best
    from ocr_platform_spark.operators.tables import load

    sf = "/root/testdata/sf0.01"
    rows = dd_keep_best(spark, sf).collect()
    n_docs = load(spark, sf, "documents").count()
    assert len(rows) == n_docs                        # never-drop

    by_cluster: dict = {}
    for r in rows:
        by_cluster.setdefault(r["cluster_id"], []).append(r)
    for cid, members in by_cluster.items():
        keepers = [m for m in members if m["keep"]]
        assert len(keepers) == 1, (cid, members)
        want = min(members, key=lambda m: (-m["score_x10k"], m["doc_id"]))
        assert keepers[0]["doc_id"] == want["doc_id"]
    assert any(m["keep"] and m["doc_id"] != cid
               for cid, ms in by_cluster.items() for m in ms), \
        "fixture never exercises the argmax (keeper always min-id)"


def test_dd_keep_best_is_aggregate_not_window(spark):
    """The keeper decision must be an aggregate join-back, not a global
    window — a million-member cluster must collapse map-side."""
    from ocr_platform_spark.operators.dedup import dd_keep_best

    plan = dd_keep_best(spark, "/root/testdata/sf0.001")._jdf \
        .queryExecution().executedPlan().toString()
    assert "Window" not in plan


# --- TF-IDF keyword extraction ----------------------------------------------

def test_keyword_topk_matches_python(spark):
    """Top-k per doc must equal a pure-Python tf·idf recompute with the
    same integer odds-ratio idf and (score desc, term asc) tie-break."""
    import duckdb

    from ocr_platform_spark.operators.search import (KEYWORD_K,
                                                     keyword_topk,
                                                     ta_keyword_topk)

    rows = duckdb.connect().execute(
        f"SELECT doc_id, text FROM read_parquet('{SF}/documents.parquet')"
    ).fetchall()
    docs = {int(d): t.strip().split() for d, t in rows}
    n = len(docs)
    dfreq: dict = {}
    for toks in docs.values():
        for t in set(toks):
            dfreq[t] = dfreq.get(t, 0) + 1
    want = {}
    for d, toks in docs.items():
        tf: dict = {}
        for t in toks:
            tf[t] = tf.get(t, 0) + 1
        scored = sorted(
            ((-(c * ((1000 * (2 * n - 2 * dfreq[t] + 1))
                     // (2 * dfreq[t] + 1))), t, c) for t, c in tf.items()))
        for i, (ns, t, c) in enumerate(scored[:KEYWORD_K]):
            want[(d, i + 1)] = (t, c, -ns)
    got = {(r["doc_id"], r["rank"]): (r["term"], r["tf"], r["score_x1000"])
           for r in ta_keyword_topk(spark, SF).collect()}
    assert got == want


def test_keyword_topk_is_aggregate_not_window(spark):
    from ocr_platform_spark.operators.search import ta_keyword_topk

    plan = ta_keyword_topk(spark, SF)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Window" not in plan


# --- positional phrase search ------------------------------------------------

def test_phrase_search_matches_python(spark):
    """Counts must equal a pure-Python sliding-window count, and the
    fixture must exercise a multi-occurrence doc."""
    import duckdb

    from ocr_platform_spark.operators.search import (PHRASE_QUERY,
                                                     ta_phrase_search)

    want = {}
    for d, t in duckdb.connect().execute(
            f"SELECT doc_id, text FROM "
            f"read_parquet('{SF}/documents.parquet')").fetchall():
        toks = t.strip().split()
        n = sum(1 for i in range(len(toks) - len(PHRASE_QUERY) + 1)
                if tuple(toks[i:i + len(PHRASE_QUERY)]) == PHRASE_QUERY)
        if n:
            want[int(d)] = n
    got = {r["doc_id"]: r["n_matches"]
           for r in ta_phrase_search(spark, SF).collect()}
    assert got == want
    assert any(n > 1 for n in got.values())


def test_phrase_search_overlapping_and_partial(spark):
    """Overlapping matches each count; a permuted or gapped phrase does
    not match."""
    from ocr_platform_spark.operators.search import phrase_search

    docs = spark.createDataFrame(
        [(1, "a b a b a b"),           # 2 matches of (a b a)
         (2, "b a slow x hash batch"),  # gapped: no match
         (3, "batch hash slow")],       # permuted: no match
        "doc_id long, text string")
    got = {r["doc_id"]: r["n_matches"]
           for r in phrase_search(docs, ("a", "b", "a")).collect()}
    assert got == {1: 2}


# --- content-defined chunking ------------------------------------------------

def test_cdc_invariants_and_shift_resistance():
    """Chunks tile the payload exactly; lengths respect [MIN, MAX] (tail
    excepted); and CONTENT-defined boundaries resynchronize after an
    insertion — the property fixed-size blocks lack."""
    import hashlib

    from ocr_platform_spark.operators.cdc import (CDC_MAX, CDC_MIN,
                                                  cdc_chunks)

    data = b"".join(hashlib.sha256(str(i).encode()).digest()
                    for i in range(200))               # 6400 distinct bytes
    rows = cdc_chunks("u", data)
    assert rows[0][2] == 0
    for (u, i, off, ln, md5), nxt in zip(rows, rows[1:]):
        assert nxt[2] == off + ln                      # contiguous
        assert CDC_MIN <= ln <= CDC_MAX
        assert md5 == hashlib.md5(data[off:off + ln]).hexdigest()
    assert rows[-1][2] + rows[-1][3] == len(data)
    # insert 3 bytes near the front: later chunk hashes reappear
    shifted = data[:10] + b"XYZ" + data[10:]
    h_orig = {r[4] for r in rows}
    h_shift = {r[4] for r in cdc_chunks("u", shifted)}
    assert len(h_orig & h_shift) >= len(h_orig) // 2


def test_cdc_empty_and_tiny_payloads():
    from ocr_platform_spark.operators.cdc import cdc_chunks

    assert cdc_chunks("u", b"") == []
    rows = cdc_chunks("u", b"abc")          # under MIN: one tail chunk
    assert len(rows) == 1 and rows[0][3] == 3


def test_cdc_census_prices_shared_boilerplate(spark):
    """Same-host pages share nav/header markup: the census must find
    multi-url shared chunks, and every census row must be consistent
    with the raw chunk table."""
    from pyspark.sql import functions as F

    from ocr_platform_spark.operators.cdc import (dd_cdc_census,
                                                  dd_cdc_chunks)

    census = {r["chunk_md5"]: r for r in
              dd_cdc_census(spark, SF).collect()}
    assert census
    assert any(r["n_urls"] > 1 for r in census.values())
    raw = (dd_cdc_chunks(spark, SF).groupBy("chunk_md5")
           .agg(F.count("*").alias("n"),
                F.countDistinct("url").alias("u")).collect())
    for r in raw:
        if r["n"] > 1:
            c = census[r["chunk_md5"]]
            assert (c["n_copies"], c["n_urls"]) == (r["n"], r["u"])
        else:
            assert r["chunk_md5"] not in census
