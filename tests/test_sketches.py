"""HITS and the KMV distinct sketch: both are exact-integer recurrences,
so each is pinned by an independent pure-Python replica, plus the
structural properties the estimators must hold (salted-decomposition
exactness, under-K fallback, hash parity across engines)."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from ocr_platform_spark.operators.sketches import (
    _EST_NUM, _SALTS, KMV_K, kmv_distinct, ta_kmv_distinct)
from ocr_platform_spark.operators.webgraph import (
    _HITS_SCALE, HITS_ITERS, wg_hits)
from tests.test_webgraph import _edges_from_parquet

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def spark():
    from ocr_platform_spark.session import build_spark
    return build_spark("sketches-tests", cores=4)


# --- HITS -----------------------------------------------------------------

def _python_hits(edges: set) -> dict:
    """Independent replica of the max-normalized integer recurrence."""
    hosts = {h for e in edges for h in e}
    hub = {h: _HITS_SCALE for h in hosts}
    auth = {}
    for _ in range(HITS_ITERS):
        auth = {h: 0 for h in hosts}
        for s, d in edges:
            auth[d] += hub[s]
        mx = max(auth.values())
        auth = {h: (v * _HITS_SCALE) // mx for h, v in auth.items()}
        hub = {h: 0 for h in hosts}
        for s, d in edges:
            hub[s] += auth[d]
        mx = max(hub.values())
        hub = {h: (v * _HITS_SCALE) // mx for h, v in hub.items()}
    return {h: (auth[h], hub[h]) for h in hosts}


def test_hits_matches_python_replica(spark):
    got = {r["host"]: (r["auth_x1e6"], r["hub_x1e6"])
           for r in wg_hits(spark, SF_DIR).collect()}
    want = {f"h{h}": v
            for h, v in _python_hits(_edges_from_parquet()).items()}
    assert got == want


def test_hits_normalized_and_spread(spark):
    out = wg_hits(spark, SF_DIR).collect()
    auths = [r["auth_x1e6"] for r in out]
    hubs = [r["hub_x1e6"] for r in out]
    # max-normalization: the round max is exactly the fixed-point unit
    assert max(auths) == _HITS_SCALE and max(hubs) == _HITS_SCALE
    # every score is a valid normalized value, and the ranking is not flat
    assert all(0 <= v <= _HITS_SCALE for v in auths + hubs)
    assert len(set(auths)) > 1 and len(set(hubs)) > 1


def test_hits_deterministic(spark):
    a = sorted(map(tuple, wg_hits(spark, SF_DIR).collect()))
    b = sorted(map(tuple, wg_hits(spark, SF_DIR).collect()))
    assert a == b


# --- KMV distinct sketch ---------------------------------------------------

def _h56(tok: str) -> int:
    return int(hashlib.md5(tok.encode()).hexdigest()[:14], 16)


def _python_kmv(rows) -> dict:
    """Independent replica: exact distinct + KMV estimate per source."""
    vocab: dict[str, set] = {}
    for source, text in rows:
        # strip SPACES only — Spark/DuckDB trim() does not strip \t or \n,
        # so a full .strip() replica would diverge on edge-whitespace texts
        vocab.setdefault(source, set()).update(
            _h56(t) for t in __import__("re").split(r"\s+", text.strip(" ")))
    out = {}
    for source, hs in vocab.items():
        n = len(hs)
        if n < KMV_K:
            est = n
        else:
            est = _EST_NUM // sorted(hs)[KMV_K - 1]
        out[source] = (n, est)
    return out


def test_kmv_matches_python_replica(spark):
    import duckdb
    rows = duckdb.connect().execute(
        f"SELECT source, text FROM "
        f"read_parquet('{SF_DIR}/documents.parquet')").fetchall()
    want = _python_kmv(rows)
    got = {r["source"]: (r["n_distinct_exact"], r["kmv_est"])
           for r in ta_kmv_distinct(spark, SF_DIR).collect()}
    assert got == want


def test_kmv_exercises_estimator_branch(spark):
    out = ta_kmv_distinct(spark, SF_DIR).collect()
    est_rows = [r for r in out if r["n_distinct_exact"] >= KMV_K]
    assert est_rows, "sf0.01 vocabularies must reach K for a real check"
    for r in est_rows:
        # the estimate is a genuine estimate within KMV's error band,
        # not an echo of the exact count
        assert abs(r["kmv_est"] - r["n_distinct_exact"]) \
            <= r["n_distinct_exact"]  # 100% bound; typical ~1/sqrt(K-1)


def test_kmv_under_k_is_exact(spark):
    # a host whose vocabulary is under K must fall back to the exact count
    docs = spark.createDataFrame(
        [("tiny", "alpha beta gamma alpha")], ["source", "text"])
    row = kmv_distinct(docs).collect()[0]
    assert (row["n_distinct_exact"], row["kmv_est"]) == (3, 3)


def test_kmv_salted_decomposition_is_exact(spark):
    # the exact column from the salted two-phase plan == a direct
    # countDistinct over the same hashes (salt is a function of the hash,
    # so shard distinct counts sum without double-counting)
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    toks = docs.select(
        "source",
        F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("tok"))
    direct = {r["source"]: r["n"] for r in
              toks.groupBy("source")
              .agg(F.countDistinct(
                  F.conv(F.substring(F.md5("tok"), 1, 14), 16, 10)
                  .cast("long")).alias("n")).collect()}
    sketched = {r["source"]: r["n_distinct_exact"]
                for r in ta_kmv_distinct(spark, SF_DIR).collect()}
    assert sketched == direct


def test_h56_spark_matches_python(spark):
    toks = ["alpha", "née", "東京", "", "x" * 500]
    df = spark.createDataFrame([(t,) for t in toks], ["tok"])
    got = {r["tok"]: r["h"] for r in df.select(
        "tok",
        F.conv(F.substring(F.md5("tok"), 1, 14), 16, 10)
        .cast("long").alias("h")).collect()}
    assert got == {t: _h56(t) for t in toks}


def test_kmv_merge_state_is_bounded_and_k_scales(spark):
    # phase-2 input is at most SALTS * K values per host, whatever the
    # corpus size — the property that makes the sketch the scale path
    from ocr_platform_spark.operators.sketches import _HASH_BITS
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    assert _SALTS * KMV_K < 200  # the constant the docstring promises
    rows = kmv_distinct(docs, k=4, salts=2).collect()
    assert len(rows) == docs.select("source").distinct().count()
    # the estimator numerator must scale with the CALLER'S k, not the
    # module default (regression: a hard-coded (KMV_K-1) numerator gave
    # a (KMV_K-1)/(k-1) overestimate for any non-default k)
    import duckdb
    data = duckdb.connect().execute(
        f"SELECT source, text FROM "
        f"read_parquet('{SF_DIR}/documents.parquet')").fetchall()
    vocab: dict[str, set] = {}
    for s, t in data:
        vocab.setdefault(s, set()).update(
            _h56(x) for x in __import__("re").split(r"\s+", t.strip(" ")))
    for r in rows:
        hs = sorted(vocab[r["source"]])
        want = (len(hs) if len(hs) < 4
                else (3 << _HASH_BITS) // hs[3])
        assert r["kmv_est"] == want


# --- Bloom membership --------------------------------------------------------

def _python_bloom(crawled: set, probes: set) -> dict:
    from ocr_platform_spark.operators.sketches import (
        BLOOM_J, BLOOM_M, _BLOOM_BPW)
    words: dict[int, int] = {}

    def positions(url: str):
        d = hashlib.md5(url.encode()).hexdigest()
        h1, h2 = int(d[:14], 16), int(d[14:28], 16)
        step = h2 % (BLOOM_M - 1) + 1
        return [(h1 + i * step) % BLOOM_M for i in range(BLOOM_J)]

    for u in crawled:
        for p in positions(u):
            words[p // _BLOOM_BPW] = (words.get(p // _BLOOM_BPW, 0)
                                      | (1 << (p % _BLOOM_BPW)))
    out = {}
    for u in probes:
        maybe = all((words.get(p // _BLOOM_BPW, 0) >> (p % _BLOOM_BPW)) & 1
                    for p in positions(u))
        out[u] = (maybe, u in crawled, maybe and u not in crawled)
    return out


def _bloom_urls():
    ks = range(6000)
    url = lambda k: f"https://h{k % 50}.example/p/{k}"  # noqa: E731
    return ({url(k) for k in ks if k < 3000}, {url(k) for k in ks})


def test_bloom_matches_python_replica(spark):
    from ocr_platform_spark.operators.sketches import dd_bloom_membership
    crawled, probes = _bloom_urls()
    want = _python_bloom(crawled, probes)
    got = {r["url"]: (r["bloom_maybe"], r["is_member"], r["false_positive"])
           for r in dd_bloom_membership(spark, SF_DIR).collect()}
    assert got == want


def test_bloom_never_false_negative_and_fp_rate(spark):
    from ocr_platform_spark.operators.sketches import dd_bloom_membership
    rows = dd_bloom_membership(spark, SF_DIR).collect()
    # the Bloom guarantee: every member answers maybe
    assert all(r["bloom_maybe"] for r in rows if r["is_member"])
    # the filter is USEFUL: most non-members are rejected, some FPs exist
    # (deterministic at this fill factor, so pin that the branch is live)
    non = [r for r in rows if not r["is_member"]]
    fp = sum(1 for r in non if r["false_positive"])
    assert 0 < fp < 0.1 * len(non)


def test_bloom_plan_broadcasts_bitmap(spark):
    # the probe side must join the bitmap by BROADCAST: candidate urls
    # never shuffle against the crawled set (the point of the filter)
    from ocr_platform_spark.operators.sketches import dd_bloom_membership
    plan = dd_bloom_membership(spark, SF_DIR)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


# --- mirror-host detection ---------------------------------------------------

def _python_mirrors():
    import duckdb
    from ocr_platform_spark.operators.dedup import (
        MIRROR_HOT_T, MIRROR_MIN_SHARED)
    rows = duckdb.connect().execute(
        f"SELECT doc_id, source, text FROM "
        f"read_parquet('{SF_DIR}/documents.parquet')").fetchall()
    corpus = [(s, t) for _, s, t in rows]
    hosts = {s for s, _ in corpus}
    for _, s, t in rows:
        if int(s[3:]) % 3 == 0:
            d = hashlib.md5(t.encode()).hexdigest()
            corpus.append((f"m-{s}", t if d[0] <= "7" else f"m:{t}"))
            hosts.add(f"m-{s}")
    corpus += [(h, "(boilerplate)") for h in hosts]
    fps: dict[str, set] = {}
    for s, t in corpus:
        fps.setdefault(s, set()).add(hashlib.md5(t.encode()).hexdigest())
    host_count: dict[str, int] = {}
    for s, hs in fps.items():
        for h in hs:
            host_count[h] = host_count.get(h, 0) + 1
    fps = {s: {h for h in hs if host_count[h] <= MIRROR_HOT_T}
           for s, hs in fps.items()}
    out = {}
    for a in fps:
        for b in fps:
            if a < b:
                shared = len(fps[a] & fps[b])
                if shared >= MIRROR_MIN_SHARED:
                    out[(a, b)] = (
                        len(fps[a]), len(fps[b]), shared,
                        shared * 1_000_000 // min(len(fps[a]), len(fps[b])))
    return out


def test_mirror_hosts_matches_python_replica(spark):
    from ocr_platform_spark.operators.dedup import dd_mirror_hosts
    got = {(r["host_a"], r["host_b"]):
           (r["n_a"], r["n_b"], r["shared"], r["cont_x1e6"])
           for r in dd_mirror_hosts(spark, SF_DIR).collect()}
    assert got == _python_mirrors()


def test_mirror_hot_guard_is_load_bearing(spark):
    # the planted boilerplate fingerprint sits on every host; without the
    # hot cap every host pair would surface. With it, only true mirror
    # pairs (m-srcN, srcN) survive, with genuinely partial containment.
    from ocr_platform_spark.operators.dedup import dd_mirror_hosts
    rows = dd_mirror_hosts(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r["host_a"] == f"m-{r['host_b']}"
        assert 0 < r["cont_x1e6"] < 1_000_000   # partial, not an echo
    n_hosts = 20
    assert len(rows) == len([n for n in range(n_hosts) if n % 3 == 0])


def test_mirror_without_guard_floods(spark):
    # sanity that the guard (not luck) suppresses boilerplate: raising the
    # cap above the host count admits the planted all-host fingerprint and
    # the pair count explodes to every host pair
    from ocr_platform_spark.operators.dedup import (
        _mirror_corpus, mirror_hosts)
    from ocr_platform_spark.operators.tables import load
    corpus = _mirror_corpus(load(spark, SF_DIR, "documents"))
    flooded = mirror_hosts(corpus, hot_t=10_000, min_shared=1).count()
    guarded = mirror_hosts(corpus).count()
    assert flooded > 300 and guarded == 7   # 27 hosts -> 351 pairs


# --- Count-Min frequency sketch ----------------------------------------------

def _python_cms():
    import duckdb
    from ocr_platform_spark.operators.sketches import CMS_D, CMS_TOP_K, CMS_W
    rows = duckdb.connect().execute(
        f"SELECT text FROM "
        f"read_parquet('{SF_DIR}/documents.parquet')").fetchall()
    toks = []
    for (t,) in rows:
        toks.extend(__import__("re").split(r"\s+", t.strip(" ")))

    def buckets(tok):
        d = hashlib.md5(tok.encode()).hexdigest()
        h1, h2 = int(d[:14], 16), int(d[14:28], 16)
        step = h2 % (CMS_W - 1) + 1
        return [(h1 + r * step) % CMS_W for r in range(CMS_D)]

    grid = [[0] * CMS_W for _ in range(CMS_D)]
    exact: dict[str, int] = {}
    for t in toks:
        exact[t] = exact.get(t, 0) + 1
        for r, b in enumerate(buckets(t)):
            grid[r][b] += 1
    top = sorted(exact.items(), key=lambda kv: (-kv[1], kv[0]))[:CMS_TOP_K]
    return {tok: (rk + 1, n, min(grid[r][b]
                                 for r, b in enumerate(buckets(tok))))
            for rk, (tok, n) in enumerate(top)}


def test_cms_matches_python_replica(spark):
    from ocr_platform_spark.operators.sketches import ta_cms_heavy_hitters
    got = {r["tok"]: (r["rk"], r["n_exact"], r["cms_est"])
           for r in ta_cms_heavy_hitters(spark, SF_DIR).collect()}
    assert got == _python_cms()


def test_cms_never_underestimates_and_collides(spark):
    # the Count-Min guarantee: estimate >= true count (collisions only
    # ADD); and W is sized so the collision branch is live at sf0.01 —
    # an all-equal report would mean the sketch is just echoing the agg
    from ocr_platform_spark.operators.sketches import ta_cms_heavy_hitters
    rows = ta_cms_heavy_hitters(spark, SF_DIR).collect()
    assert len(rows) == 20
    assert all(r["cms_est"] >= r["n_exact"] for r in rows)
    assert any(r["cms_est"] > r["n_exact"] for r in rows)


def test_cms_grid_is_bounded(spark):
    # the sketch relation is <= d*W rows whatever the corpus size — the
    # property that makes frequency queries corpus-scale-free
    from pyspark.sql import functions as F
    from ocr_platform_spark.operators.sketches import (
        CMS_D, CMS_W, _cms_positions)
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    toks = docs.select(
        F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("tok"))
    sketch = (toks.select(F.posexplode(_cms_positions("tok"))
                          .alias("row", "bucket"))
              .groupBy("row", "bucket").agg(F.count("*").alias("cnt")))
    n = sketch.count()
    assert n <= CMS_D * CMS_W
    total = sketch.agg(F.sum("cnt")).collect()[0][0]
    n_occ = toks.count()
    assert total == CMS_D * n_occ   # every occurrence lands in every row


# --- exponential-histogram quantile sketch -----------------------------------

def _python_quantiles():
    import duckdb
    import math
    from ocr_platform_spark.operators.sketches import QS_PS
    vals = [v for (v,) in duckdb.connect().execute(
        f"SELECT n_chars FROM "
        f"read_parquet('{SF_DIR}/documents.parquet')").fetchall()]
    hist: dict[int, int] = {}
    for v in vals:
        b = v.bit_length() - 1          # == length(bin(v)) - 1
        hist[b] = hist.get(b, 0) + 1
    n = len(vals)
    out = {}
    for p in QS_PS:
        r = math.ceil(p * n / 100)
        cum = 0
        for b in sorted(hist):
            if cum < r <= cum + hist[b]:
                out[p] = (n, b, (1 << b) + (r - cum - 1) * (1 << b) // hist[b])
                break
            cum += hist[b]
    return out


def test_quantile_sketch_matches_python_replica(spark):
    from ocr_platform_spark.operators.sketches import ta_quantile_sketch
    got = {r["p"]: (r["n_total"], r["bin"], r["est"])
           for r in ta_quantile_sketch(spark, SF_DIR).collect()}
    assert got == _python_quantiles()


def test_quantile_sketch_within_bin_of_truth(spark):
    # the estimate must land in the same power-of-two bin as the true
    # quantile — the histogram's accuracy contract (exact WITHIN a bin is
    # not promised; the bin is)
    import duckdb
    import math
    from ocr_platform_spark.operators.sketches import (
        QS_PS, ta_quantile_sketch)
    vals = sorted(v for (v,) in duckdb.connect().execute(
        f"SELECT n_chars FROM "
        f"read_parquet('{SF_DIR}/documents.parquet')").fetchall())
    rows = {r["p"]: r for r in ta_quantile_sketch(spark, SF_DIR).collect()}
    assert set(rows) == set(QS_PS)      # exactly one row per percentile
    for p in QS_PS:
        true_q = vals[math.ceil(p * len(vals) / 100) - 1]
        assert rows[p]["bin"] == true_q.bit_length() - 1
        assert (1 << rows[p]["bin"]) <= rows[p]["est"] \
            < (1 << (rows[p]["bin"] + 1))


def test_quantile_histogram_is_bounded(spark):
    # the histogram aggregate is <=64 rows for any int64 column at any
    # corpus size — the property that makes the sketch the scale path
    from pyspark.sql import functions as F
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    hist = (docs.select((F.length(F.bin(F.col("n_chars"))) - 1)
                        .alias("bin"))
            .groupBy("bin").agg(F.count("*")))
    assert hist.count() <= 64


# --- sketch-driven length-band curation -------------------------------------

def _python_length_band():
    """Pure-Python replica: power-of-two histogram → p25/p99 estimates →
    per-source classification, independent of both engines' SQL."""
    import duckdb

    rows = duckdb.connect().execute(
        f"""SELECT source, n_chars
            FROM read_parquet('{SF_DIR}/documents.parquet')""").fetchall()
    vals = sorted(n for _, n in rows)
    hist: dict = {}
    for n in vals:
        hist[n.bit_length() - 1] = hist.get(n.bit_length() - 1, 0) + 1
    n_total = len(vals)
    ests = {}
    for p in (25, 99):
        r = (p * n_total + 99) // 100
        cum = 0
        for b in sorted(hist):
            if cum < r <= cum + hist[b]:
                ests[p] = (1 << b) + (r - cum - 1) * (1 << b) // hist[b]
                break
            cum += hist[b]
    lo, hi = ests[25], ests[99]
    out: dict = {}
    for src, n in rows:
        d = out.setdefault(src, [0, 0, 0, 0])
        d[0] += 1
        if n < lo:
            d[1] += 1
        elif n > hi:
            d[3] += 1
        else:
            d[2] += 1
    return {s: tuple(v) for s, v in out.items()}


def test_length_band_matches_python_replica(spark):
    from ocr_platform_spark.operators.sketches import cx_length_band

    got = {r["source"]: (r["n_docs"], r["n_below"], r["n_kept"],
                         r["n_above"])
           for r in cx_length_band(spark, SF_DIR).collect()}
    assert got == _python_length_band()


def test_length_band_partitions_every_doc(spark):
    # below + kept + above must account for every document, and the
    # lower cutoff must actually bind (the p25 rule drops ~a quarter)
    from ocr_platform_spark.operators.sketches import cx_length_band

    rows = cx_length_band(spark, SF_DIR).collect()
    for r in rows:
        assert r["n_below"] + r["n_kept"] + r["n_above"] == r["n_docs"]
    total = sum(r["n_docs"] for r in rows)
    below = sum(r["n_below"] for r in rows)
    assert 0 < below <= total * 30 // 100


def test_length_band_plan_broadcasts_bounds(spark):
    # the 1-row bounds relation must enter as a broadcast, never an
    # exchange of the corpus keyed on anything percentile-related
    from ocr_platform_spark.operators.sketches import cx_length_band

    plan = cx_length_band(spark, SF_DIR)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


# --- CCNet perplexity buckets (LM score × quantile sketch) -------------------

def test_ppl_buckets_match_python_composition(spark):
    """Bounds recomputed in pure Python from the (already replica-
    pinned) LM scores via the same bin-histogram estimate; every doc's
    bucket must match, and buckets must be score-monotone."""
    import math

    from ocr_platform_spark.operators.sketches import (
        _PPL_HI_P, _PPL_LO_P, cx_ppl_buckets)
    from ocr_platform_spark.operators.tables import load
    from ocr_platform_spark.operators.text_analysis import lm_scores

    scores = {r["doc_id"]: r["lm_score_x1e6"]
              for r in lm_scores(load(spark, SF_DIR, "documents"))
              .collect()}
    hist: dict[int, int] = {}
    for v in scores.values():
        b = max(v.bit_length() - 1, 0)  # bin(0) == '0' -> bin 0
        hist[b] = hist.get(b, 0) + 1
    n = len(scores)
    bounds = {}
    for p in (_PPL_LO_P, _PPL_HI_P):
        r = math.ceil(p * n / 100)
        cum = 0
        for b in sorted(hist):
            if cum < r <= cum + hist[b]:
                bounds[p] = (1 << b) + (r - cum - 1) * (1 << b) // hist[b]
                break
            cum += hist[b]
    lo, hi = bounds[_PPL_LO_P], bounds[_PPL_HI_P]

    got = {r["doc_id"]: (r["lm_score_x1e6"], r["bucket"])
           for r in cx_ppl_buckets(spark, SF_DIR).collect()}
    assert set(got) == set(scores)                  # never-drop
    for doc_id, (s, bucket) in got.items():
        assert s == scores[doc_id]
        want = "head" if s > hi else "middle" if s >= lo else "tail"
        assert bucket == want, (doc_id, s, lo, hi)

    # buckets are score-monotone partitions and all three are live
    by = {"head": [], "middle": [], "tail": []}
    for s, bucket in got.values():
        by[bucket].append(s)
    assert all(by.values()), {k: len(v) for k, v in by.items()}
    assert min(by["head"]) > max(by["middle"]) >= min(by["middle"]) \
        > max(by["tail"])
    # tertiles: the power-of-two-bin sketch is coarse where the score
    # distribution is tight (most mass in 2-3 bins), so the cuts land
    # off the exact 33/67 marks — each bucket must still hold a real
    # share of the corpus (observed at sf0.01: 22% / 65% / 13%)
    assert all(len(v) >= n * 0.10 for v in by.values())


# --- HyperLogLog (spec'd register layout) ------------------------------------

def _py_hll(tokens):
    """Pure-Python recompute of the spec: registers, fold, estimate."""
    import hashlib

    from ocr_platform_spark.operators.sketches import (
        _HLL_EST_NUM, _HLL_L, _HLL_LC_THRESH, _HLL_WBITS, _HLL_WMASK,
        HLL_LC_TABLE, HLL_M)

    regs = {}
    for t in tokens:
        h = int(hashlib.md5(t.encode()).hexdigest()[:14], 16)
        j, w = h >> _HLL_WBITS, h & _HLL_WMASK
        rho = (_HLL_WBITS + 1) - (w.bit_length() if w else 0)
        regs[j] = max(regs.get(j, 0), rho)
    s = sum(1 << max(_HLL_L - m, 0) for m in regs.values()) \
        + (HLL_M - len(regs)) * (1 << _HLL_L)
    raw = _HLL_EST_NUM // s
    n_zero = HLL_M - len(regs)
    if n_zero > 0 and raw <= _HLL_LC_THRESH:
        return len(regs), HLL_LC_TABLE[n_zero - 1]
    return len(regs), raw


def test_hll_matches_python_recompute(spark):
    """Every host's (n_reg_hit, hll_est) must equal the pure-Python spec
    recompute over the same token stream."""
    from pyspark.sql import functions as F

    from ocr_platform_spark.operators.sketches import hll_distinct
    from ocr_platform_spark.operators.tables import load

    docs = load(spark, SF_DIR, "documents")
    toks = {}
    for r in docs.select("source", "text").collect():
        toks.setdefault(r["source"], []).extend(r["text"].split())
    got = {r["source"]: (r["n_reg_hit"], r["hll_est"])
           for r in hll_distinct(docs).collect()}
    assert set(got) == set(toks)
    for src, tk in toks.items():
        assert got[src] == _py_hll(tk), src


def test_hll_raw_branch_accuracy(spark):
    """A 5000-distinct-token host leaves linear counting and must land
    within 3 sigma (1.04/sqrt(64) ~ 13%) of the truth via the RAW
    integer estimator."""
    from ocr_platform_spark.operators.sketches import (
        _HLL_LC_THRESH, hll_distinct)

    n = 5000
    docs = spark.createDataFrame(
        [("big", " ".join(f"tok{i}" for i in range(n)))],
        "source string, text string")
    row = hll_distinct(docs).collect()[0]
    assert row["hll_est"] > _HLL_LC_THRESH          # raw branch, not LC
    assert abs(row["hll_est"] - n) <= 0.39 * n, row["hll_est"]
    # and the pure-Python spec agrees exactly
    assert (row["n_reg_hit"], row["hll_est"]) == \
        _py_hll([f"tok{i}" for i in range(n)])


def test_hll_plan_two_aggregates_no_window(spark):
    """Shape at scale: register build + fold are hash aggregates (map-side
    combinable); no window, no distinct-token shuffle survives."""
    from ocr_platform_spark.operators.sketches import ta_hll_distinct

    plan = ta_hll_distinct(spark, SF_DIR)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Window" not in plan
    assert "HashAggregate" in plan


# --- grouped quantile sketch (per-host median) -------------------------------

def test_host_median_matches_python_and_brackets_truth(spark):
    """Per-host estimate must equal the pure-Python histogram recompute
    exactly, and must land in the same power-of-two bin as the TRUE
    per-host median (the sketch's accuracy contract)."""
    import duckdb

    from ocr_platform_spark.operators.sketches import (GQS_P,
                                                       ta_host_median)

    rows = duckdb.connect().execute(
        f"""SELECT source, n_chars
            FROM read_parquet('{SF_DIR}/documents.parquet')""").fetchall()
    by_host: dict = {}
    for src, n in rows:
        by_host.setdefault(src, []).append(int(n))
    want = {}
    truth_bin = {}
    for src, vals in by_host.items():
        hist: dict = {}
        for v in vals:
            b = max(v.bit_length() - 1, 0)
            hist[b] = hist.get(b, 0) + 1
        n = len(vals)
        r = -(-GQS_P * n // 100)          # ceil
        cum = 0
        for b in sorted(hist):
            if cum < r <= cum + hist[b]:
                want[src] = (n, (1 << b)
                             + (r - cum - 1) * (1 << b) // hist[b])
                break
            cum += hist[b]
        truth = sorted(vals)[r - 1]
        truth_bin[src] = max(truth.bit_length() - 1, 0)
    got = {r["source"]: (r["n_total"], r["est"])
           for r in ta_host_median(spark, SF_DIR).collect()}
    assert got == want
    for src, (_, est) in got.items():
        assert max(est.bit_length() - 1, 0) == truth_bin[src], src


def test_host_median_window_is_per_group_bounded(spark):
    """The cumulative window must partition by source (<=64 rows per
    partition) — never a global single-partition window."""
    from ocr_platform_spark.operators.sketches import ta_host_median

    plan = ta_host_median(spark, SF_DIR)._jdf.queryExecution() \
        .executedPlan().toString()
    win_lines = [ln for ln in plan.splitlines() if "Window [" in ln]
    assert win_lines                      # the windows exist...
    for ln in win_lines:                  # ...and every one keys on source
        assert "windowspecdefinition(source" in ln, ln


# --- inverse-CDF percentile normalization ------------------------------------

def test_lm_percentile_matches_python_and_is_monotone(spark):
    """pct must equal the pure-Python inverse-CDF recompute, be bounded
    in [0, 10000], and be monotone non-decreasing in the score."""
    from ocr_platform_spark.operators.sketches import ta_lm_percentile
    from ocr_platform_spark.operators.tables import load
    from ocr_platform_spark.operators.text_analysis import lm_scores

    scores = {r["doc_id"]: r["lm_score_x1e6"]
              for r in lm_scores(load(spark, SF_DIR, "documents"))
              .collect()}
    hist: dict = {}
    for v in scores.values():
        b = max(v.bit_length() - 1, 0)
        hist[b] = hist.get(b, 0) + 1
    n = len(scores)
    cumb = {}
    cum = 0
    for b in sorted(hist):
        cumb[b] = cum
        cum += hist[b]

    def pct(v):
        b = max(v.bit_length() - 1, 0)
        rank = cumb[b] + max(v - (1 << b), 0) * hist[b] // (1 << b)
        return rank * 10000 // n

    got = {r["doc_id"]: (r["lm_score_x1e6"], r["pct_x1e4"])
           for r in ta_lm_percentile(spark, SF_DIR).collect()}
    assert set(got) == set(scores)                     # never-drop
    for doc_id, (v, p) in got.items():
        assert v == scores[doc_id]
        assert p == pct(v), (doc_id, v)
        assert 0 <= p <= 10000
    by_score = sorted(got.values())
    assert all(a[1] <= b[1] for a, b in zip(by_score, by_score[1:]))
    # the normalization discriminates (not all equal)
    assert len({p for _, p in got.values()}) > 10
