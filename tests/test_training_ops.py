"""Tests for the training-data operator library (dedup, similarity, text
analysis, multimodal plumbing) over the driver testdata + synthetic cases."""

import numpy as np
import pytest
from pyspark.sql import Row, functions as F, types as T

from fluent_plugin_geoip_spark.operators import dedup, multimodal, similarity, textstats

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").cache()


@pytest.fixture(scope="module")
def embs(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").cache()


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def test_exact_dedup(spark):
    df = spark.createDataFrame(
        [(1, "hello world"), (2, "hello world"), (3, "unique"), (4, "hello world")],
        "doc_id long, text string")
    kept = dedup.exact_dedup(df)
    assert sorted(r.doc_id for r in kept.collect()) == [1, 3]
    groups = dedup.exact_dup_groups(df).collect()
    assert len(groups) == 1 and groups[0].n_docs == 3 and groups[0].keep_id == 1


# ---------------------------------------------------------------------------
# minhash / jaccard
# ---------------------------------------------------------------------------

def make_near_dup_docs(spark):
    base = ("the quick brown fox jumps over the lazy dog while the cat "
            "watches from the warm windowsill in the afternoon sun light")
    rows = [
        (0, base),
        (1, base.replace("afternoon", "morning")),        # near-dup of 0
        (2, base),                                        # exact dup of 0
        (3, "completely different text about spark sql engines and "
            "columnar execution with whole stage code generation"),
        (4, "yet another unrelated document mentioning minhash lsh "
            "banding and jaccard similarity estimation techniques"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_jaccard_pairs_bruteforce(spark):
    df = make_near_dup_docs(spark)
    pairs = {(r.id_a, r.id_b): r.jaccard
             for r in dedup.ngram_jaccard_pairs(df, threshold=0.7).collect()}
    assert (0, 2) in pairs and pairs[(0, 2)] == 1.0
    assert (0, 1) in pairs and pairs[(0, 1)] >= 0.7
    assert (1, 2) in pairs
    assert not any(3 in p or 4 in p for p in pairs)


def test_minhash_lsh_dedup(spark):
    df = make_near_dup_docs(spark)
    pairs = {(r.id_a, r.id_b) for r in dedup.minhash_lsh_dedup(
        df, threshold=0.7).collect()}
    assert {(0, 1), (0, 2), (1, 2)} == pairs


def test_minhash_signature_deterministic(spark):
    df = make_near_dup_docs(spark)
    s1 = df.select(dedup.minhash_signature(F.col("text")).alias("s")).collect()
    s2 = df.select(dedup.minhash_signature(F.col("text")).alias("s")).collect()
    assert [r.s for r in s1] == [r.s for r in s2]


def test_lsh_recall_vs_bruteforce(spark, docs):
    """Every brute-force pair ≥0.8 is found by LSH (200-doc slice keeps the
    O(n²) brute-force oracle cheap)."""
    sample = docs.filter(F.col("doc_id") < 200)
    brute = {(r.id_a, r.id_b) for r in
             dedup.ngram_jaccard_pairs(sample, threshold=0.8).collect()}
    lsh = {(r.id_a, r.id_b) for r in
           dedup.minhash_lsh_dedup(sample, threshold=0.8).collect()}
    assert lsh <= brute  # verification guarantees precision
    if brute:
        recall = len(lsh & brute) / len(brute)
        assert recall >= 0.9, (len(brute), len(lsh), recall)


# ---------------------------------------------------------------------------
# simhash
# ---------------------------------------------------------------------------

def test_simhash_near_dup(spark):
    df = make_near_dup_docs(spark)
    sigs = {r.doc_id: r.s for r in df.select(
        "doc_id", dedup.simhash(F.col("text")).alias("s")).collect()}
    assert sigs[0] == sigs[2]
    h01 = bin(sigs[0] ^ sigs[1]).count("1")
    h03 = bin(sigs[0] ^ sigs[3]).count("1")
    assert h01 < h03
    pairs = {(r.id_a, r.id_b): r.hamming
             for r in dedup.simhash_dedup(df, max_hamming=4).collect()}
    assert (0, 2) in pairs and pairs[(0, 2)] == 0


# ---------------------------------------------------------------------------
# similarity search
# ---------------------------------------------------------------------------

def brute_force_numpy(embs_rows, qids, k):
    ids = np.array([r.vec_id for r in embs_rows])
    mat = np.array([r.embedding for r in embs_rows], dtype=np.float64)
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    out = {}
    for q in qids:
        qv = mat[list(ids).index(q)]
        sims = mat @ qv
        order = sorted(zip(-sims, ids), key=lambda t: (t[0], t[1]))
        out[q] = [int(i) for s, i in order if i != q][:k]
    return out


def test_cosine_topk_matches_numpy(spark, embs):
    qids = [0, 1, 2, 3, 4]
    queries = embs.filter(F.col("vec_id").isin(qids))
    got = similarity.cosine_topk(embs, queries, k=5)
    got_map = {}
    for r in got.collect():
        got_map.setdefault(r.query_id, []).append((r.rank, r.neighbor_id))
    got_map = {q: [n for _, n in sorted(v)] for q, v in got_map.items()}
    expected = brute_force_numpy(embs.collect(), qids, 5)
    assert got_map == expected


def test_lsh_topk_overlap_on_clustered_data(spark):
    """Random-hyperplane LSH needs angular structure; isotropic random
    vectors defeat any sublinear ANN. Use clustered synthetic data (the
    realistic embedding-space shape) and require good top-k overlap."""
    rng = np.random.default_rng(11)
    centers = rng.standard_normal((10, 32)) * 3
    rows = []
    for i in range(400):
        c = i % 10
        rows.append((i, (centers[c] + rng.standard_normal(32) * 0.3).tolist()))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    queries = df.filter(F.col("vec_id") < 5)
    exact = similarity.cosine_topk(df, queries, k=10)
    approx = similarity.lsh_topk(df, queries, k=10, nbits=8, n_tables=6)
    e = {(r.query_id, r.neighbor_id) for r in exact.collect()}
    a = {(r.query_id, r.neighbor_id) for r in approx.collect()}
    assert len(a & e) / len(e) >= 0.8, (len(a & e), len(e))


def test_ivf_topk_overlap_on_clustered_data(spark):
    """IVF with k-means-trained cells must recover most exact neighbours on
    clustered data — the coarse quantizer adapts to the cluster structure,
    so nprobe=3 of 12 cells suffices."""
    rng = np.random.default_rng(11)
    centers = rng.standard_normal((10, 32)) * 3
    rows = []
    for i in range(400):
        c = i % 10
        rows.append((i, (centers[c] + rng.standard_normal(32) * 0.3).tolist()))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    queries = df.filter(F.col("vec_id") < 5)
    exact = similarity.cosine_topk(df, queries, k=10)
    approx = similarity.ivf_topk(df, queries, k=10, n_cells=12, nprobe=3)
    e = {(r.query_id, r.neighbor_id) for r in exact.collect()}
    a = {(r.query_id, r.neighbor_id) for r in approx.collect()}
    assert len(a & e) / len(e) >= 0.8, (len(a & e), len(e))
    # training is deterministic: same seed → identical centroids
    c1 = similarity.train_ivf_centroids(df, n_cells=12)
    c2 = similarity.train_ivf_centroids(df, n_cells=12)
    assert (c1 == c2).all()


def test_embedding_near_dupes_finds_planted(spark, embs):
    rows = embs.limit(3).collect()
    planted = [Row(vec_id=10_000 + r.vec_id,
                   embedding=[v * 1.0001 for v in r.embedding],
                   label=r.label) for r in rows]
    df = embs.unionByName(spark.createDataFrame(planted, embs.schema))
    dupes = similarity.embedding_near_dupes(df, threshold=0.999, n_tables=8)
    got = {(r.id_a, r.id_b) for r in dupes.collect()}
    for r in rows:
        assert (r.vec_id, 10_000 + r.vec_id) in got


def test_embedding_near_dupes_bucket_cap(spark, embs):
    """max_bucket=1 drops every multi-id bucket → no candidate pairs at all
    (the skew guard is a strict subset of exact blocking, never additive)."""
    rows = embs.limit(3).collect()
    planted = [Row(vec_id=10_000 + r.vec_id,
                   embedding=[v * 1.0001 for v in r.embedding],
                   label=r.label) for r in rows]
    df = embs.unionByName(spark.createDataFrame(planted, embs.schema))
    capped = similarity.embedding_near_dupes(
        df, threshold=0.999, n_tables=8, max_bucket=1)
    assert capped.pairs.count() == 0
    # a generous cap changes nothing vs exact blocking
    wide = similarity.embedding_near_dupes(
        df, threshold=0.999, n_tables=8, max_bucket=10_000)
    exact = similarity.embedding_near_dupes(df, threshold=0.999, n_tables=8)
    assert ({(r.id_a, r.id_b) for r in wide.pairs.collect()}
            == {(r.id_a, r.id_b) for r in exact.collect()})
    capped.unpersist()
    wide.unpersist()


# ---------------------------------------------------------------------------
# text analysis
# ---------------------------------------------------------------------------

def test_token_count(spark):
    df = spark.createDataFrame(
        [("a b  c",), ("",), ("   ",), ("single",)], "text string")
    out = [r.n for r in df.select(textstats.token_count(F.col("text")).alias("n")).collect()]
    assert out == [3, 0, 0, 1]


def test_bpe_ish_count(spark):
    df = spark.createDataFrame([("hello, world! 42",)], "text string")
    out = df.select(textstats.bpe_ish_token_count(F.col("text")).alias("n")).first().n
    assert out == 5  # hello , world ! 42


def test_quality_score_ordering(spark):
    df = spark.createDataFrame(
        [(1, "The quick brown fox jumps over the lazy dog and runs away."),
         (2, "@@@ ### !!! $$$ %%% ^^^ &&& *** ((( )))")],
        "doc_id long, text string")
    scores = {r.doc_id: r.q for r in df.select(
        "doc_id", textstats.quality_score(F.col("text")).alias("q")).collect()}
    assert scores[1] > 0.6 > scores[2]


def test_lang_id(spark):
    df = spark.createDataFrame(
        [(1, "the cat and the dog went to the park for a walk"),
         (2, "der hund und die katze sind nicht mit der maus"),
         (3, "le chat est dans la maison et les oiseaux dans le jardin"),
         (4, "xyzzy plugh qwerty")],
        "doc_id long, text string")
    out = {r.doc_id: r.lang for r in df.select(
        "doc_id", textstats.lang_id(F.col("text")).alias("lang")).collect()}
    assert out == {1: "en", 2: "de", 3: "fr", 4: "und"}


def test_fingerprint_properties(spark):
    df = spark.createDataFrame(
        [(1, "a b c"), (2, "a b c"), (3, "c b a")], "doc_id long, text string")
    fps = {r.doc_id: r.fp for r in df.select(
        "doc_id", textstats.fingerprint(F.col("text")).alias("fp")).collect()}
    assert fps[1] == fps[2]
    assert fps[1] != fps[3]  # order-sensitive


def test_analyze_documents(spark, docs):
    out = textstats.analyze_documents(docs)
    row = out.first()
    assert row.n_tokens > 0 and 0.0 <= row.quality <= 1.0
    assert out.count() == docs.count()


# ---------------------------------------------------------------------------
# multimodal plumbing
# ---------------------------------------------------------------------------

def test_media_features(spark):
    media = multimodal.generate_media(spark, 60)
    feats = multimodal.extract_image_features(media, fake=True)
    rows = feats.collect()
    assert all(len(r.feature) == multimodal.FEATURE_DIM for r in rows)
    n_images = media.filter(F.col("kind") == "image").count()
    assert len(rows) == n_images
    # deterministic
    again = multimodal.extract_image_features(media, fake=True).collect()
    assert {r.media_id: r.phash for r in rows} == {r.media_id: r.phash for r in again}


def test_media_decode_stub_raises(spark):
    media = multimodal.generate_media(spark, 10)
    with pytest.raises(Exception, match="NotImplementedError|PIL"):
        multimodal.extract_image_features(media, fake=False).collect()


def test_video_frame_sampling(spark):
    media = multimodal.generate_media(spark, 30)
    frames = multimodal.sample_video_frames(media, every_ms=10_000)
    vids = media.filter(F.col("kind") == "video").select(
        "media_id", "duration_ms").collect()
    expected = sum(int(v.duration_ms // 10_000) + 1 for v in vids)
    assert frames.count() == expected


def test_video_frame_sampling_null_duration(spark):
    """A video row with null duration_ms yields no frames (the old
    F.sequence/explode behavior) instead of crashing inside the UDF."""
    schema = T.StructType([
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("mime", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("duration_ms", T.LongType()),
    ])
    df = spark.createDataFrame(
        [(1, "video", "video/synthetic", b"x", None),
         (2, "video", "video/synthetic", b"y", 4000)], schema)
    out = multimodal.sample_video_frames(df, every_ms=2000).collect()
    assert {r.media_id for r in out} == {2}
    assert sorted(r.frame_ts_ms for r in out) == [0, 2000, 4000]


def test_video_frame_sampling_real_decode(spark):
    """Timestamp-sampled frames must decode REAL pixels for registered mimes
    (VERDICT r2 item 4 — no more fake-only ts sampling): each sampled
    feature equals the pooled gray of frame ts//frame_ms, with the duration
    endpoint clamped to the last frame."""
    import numpy as np
    media = multimodal.generate_ppm_video(spark, 6, frames=8, frame_ms=1000)
    out = multimodal.sample_video_frames(
        media, every_ms=3000, frame_ms=1000, fake=False).collect()
    payloads = {r.media_id: r.payload for r in media.collect()}
    assert len(out) == 6 * 3  # ts 0 / 3000 / 6000 for duration 8000
    for r in out:
        frames = multimodal.decode_ppm_stream(payloads[r.media_id])
        idx = min(r.frame_ts_ms // 1000, len(frames) - 1)
        want = multimodal._pool_feature(
            multimodal.decode_ppm_gray(frames[idx]))
        assert np.allclose(np.array(r.feature, dtype=np.float32),
                           want.astype(np.float32))
    # endpoint clamp: ts = duration_ms (8000) maps to frame 7, not 8
    ends = multimodal.sample_video_frames(
        media, every_ms=8000, frame_ms=1000, fake=False).collect()
    assert {r.frame_ts_ms for r in ends} == {0, 8000}


def test_ppm_decode_roundtrip():
    import numpy as np
    rng = np.random.default_rng(7)
    px = rng.integers(0, 256, size=(5, 9, 3), dtype=np.uint8)
    assert (multimodal.decode_ppm(multimodal.encode_ppm(px)) == px).all()
    # header with comment + multi-digit dims
    hdr = b"P6\n# a comment\n12  3\n255\n" + bytes(12 * 3 * 3)
    assert multimodal.decode_ppm(hdr).shape == (3, 12, 3)
    with pytest.raises(ValueError, match="P6"):
        multimodal.decode_ppm(b"JFIF....")


def test_real_ppm_feature_extraction(spark):
    """The real decode path: PPM bytes → pixels → integer stats + ahash,
    verified against a local NumPy recomputation of the pixel formula."""
    import numpy as np
    media = multimodal.generate_ppm_images(spark, 40)
    stats = {r.media_id: r for r in multimodal.image_stats(media).collect()}
    assert len(stats) == 40
    i = np.arange(64, dtype=np.int64)
    for mid in (0, 7, 39):
        r = (mid * 31 + i * 7) % 256
        g = (mid * 17 + i * 11) % 256
        b = (mid * 13 + i * 5) % 256
        assert stats[mid].sum_r == int(r.sum())
        assert stats[mid].sum_g == int(g.sum())
        assert stats[mid].sum_b == int(b.sum())
        gray = (r + g + b) // 3
        assert stats[mid].ahash == multimodal.ahash64(gray.reshape(8, 8))
    # the pooled feature path also decodes real pixels for registered mimes
    feats = multimodal.extract_image_features(media, fake=False).collect()
    assert len(feats) == 40
    assert all(len(f.feature) == multimodal.FEATURE_DIM for f in feats)


def test_lang_id_pandas_parity(spark):
    """The Arrow fast path and the pure-Catalyst lang_id must agree on every
    document (same argmax + tie-break + und default)."""
    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    both = d.select(
        "doc_id",
        textstats.lang_id(F.col("text")).alias("native"),
        textstats.lang_id_pandas(F.col("text")).alias("arrow"))
    mismatches = both.filter(F.col("native") != F.col("arrow")).count()
    assert mismatches == 0
    # edge cases: empty / whitespace / ties / no-hit / UNICODE whitespace
    # (Java \s is ASCII-only — NBSP / U+2028 / ideographic space must NOT
    # act as token separators on either path, ADVICE r2)
    rows = [("",), ("   ",), ("zzz qqq xxx",), ("the der le el",),
            ("the the der",), ("für nicht und der",),
            ("the der the",), ("la le la",), ("el　el es",),
            ("the the",)]
    df = spark.createDataFrame(rows, "text string")
    out = df.select(textstats.lang_id(F.col("text")).alias("n"),
                    textstats.lang_id_pandas(F.col("text")).alias("a")).collect()
    for r in out:
        assert r.n == r.a, rows


def test_cosine_topk_query_guard(spark):
    """The broadcast-side cap must trip with a clear error instead of an
    opaque driver OOM (round-1 VERDICT risk item)."""
    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    with pytest.raises(ValueError, match="max_queries"):
        similarity.cosine_topk(e, e, k=3, max_queries=10)


def test_wav_decode_roundtrip():
    import numpy as np
    rng = np.random.default_rng(5)
    s = rng.integers(-32768, 32767, size=(300, 2)).astype(np.int16)
    out = multimodal.decode_wav(multimodal.encode_wav(s))
    assert out.shape == (300, 2) and (out == s).all()
    with pytest.raises(ValueError, match="RIFF"):
        multimodal.decode_wav(b"not audio")


def test_real_wav_audio_stats(spark):
    import numpy as np
    media = multimodal.generate_wav_audio(spark, 30)
    stats = {r.media_id: r for r in multimodal.audio_stats(media).collect()}
    assert len(stats) == 30
    i = np.arange(256, dtype=np.int64)
    for mid in (0, 13, 29):
        v = ((mid * 37 + i * 11) % 2001) - 1000
        assert stats[mid].sum_abs == int(np.abs(v).sum())
        assert stats[mid].sum_sq == int((v * v).sum())
        assert stats[mid].zero_crossings == int(((v[1:] * v[:-1]) < 0).sum())


def test_ppm_stream_video_frames(spark):
    import numpy as np
    media = multimodal.generate_ppm_video(spark, 10, frames=4)
    rows = multimodal.video_frame_stats(media).collect()
    assert len(rows) == 40
    by_key = {(r.media_id, r.frame_idx): r.sum_gray for r in rows}
    i = np.arange(64, dtype=np.int64)
    for mid, f in ((0, 0), (7, 3)):
        g = ((mid * 31 + f * 19 + i * 7) % 256
             + (mid * 17 + f * 23 + i * 11) % 256
             + (mid * 13 + f * 29 + i * 5) % 256) // 3
        assert by_key[(mid, f)] == int(g.sum())
    # subsampling
    assert multimodal.video_frame_stats(media, every=2).count() == 20


def test_lsh_bucket_pandas_matches_jvm(spark):
    """The Arrow matmul bucket kernel and the JVM per-bit fold must assign
    identical buckets (sign-of-dot parity)."""
    import numpy as np
    from fluent_plugin_geoip_spark.operators.similarity import (
        _hyperplanes, lsh_bucket_pandas, lsh_signature_col)
    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    planes = _hyperplanes(64, 8, 42)
    both = e.select(
        lsh_bucket_pandas("embedding", planes).alias("arrow"),
        lsh_signature_col("embedding", planes).alias("jvm"))
    assert both.filter(F.col("arrow") != F.col("jvm")).count() == 0


# ---------------------------------------------------------------------------
# incremental dedup against a persisted signature store (round 5)
# ---------------------------------------------------------------------------

def test_incremental_dedup_against_store(spark, tmp_path):
    """Daily-pipeline shape: corpus signatures persisted once; a new batch
    finds (a) its dups against the corpus via the store probe, (b) dups
    within itself, and (c) never re-emits corpus-internal pairs."""
    base = "the quick brown fox jumps over the lazy dog " * 6
    corpus = spark.createDataFrame(
        [(1, base), (2, base + "one edit here"), (3, "completely different "
          "text about spark shuffles and partitions " * 4)],
        "doc_id long, text string")
    new = spark.createDataFrame(
        [(10, base),                        # near-dup of corpus 1 and 2
         (11, "totally novel content with nothing shared at all " * 5),
         (12, "totally novel content with nothing shared at all " * 5)],
        "doc_id long, text string")        # 11/12: within-batch exact dup
    store = str(tmp_path / "store")
    dedup.write_signature_store(corpus, store, bands=32, rows=4)
    out = dedup.incremental_minhash_dedup(
        new, corpus, store, bands=32, rows=4, threshold=0.6,
        exact_grams=True)
    pairs = {(r.id_a, r.id_b) for r in out.collect()}
    assert (1, 10) in pairs and (2, 10) in pairs      # cross store hits
    assert (11, 12) in pairs                          # within-batch
    assert (1, 2) not in pairs                        # corpus-internal: never
    assert all(a >= 10 or b >= 10 for a, b in pairs)


def test_incremental_store_layout_hint(spark, tmp_path, caplog, monkeypatch):
    """Round-7 (VERDICT item 4): the probe logs a wrong-sided-layout hint —
    plain store above the measured crossover suggests bucketing; a tiny
    bucketed store suggests the plain path; right-sided layouts stay
    silent. Metadata-only (one getContentSummary), never plan-changing."""
    import logging

    base = "the quick brown fox jumps over the lazy dog " * 6
    corpus = spark.createDataFrame(
        [(1, base), (2, "other text entirely about something else " * 5)],
        "doc_id long, text string")
    new = spark.createDataFrame([(10, base)], "doc_id long, text string")

    plain = str(tmp_path / "plain")
    dedup.write_signature_store(corpus, plain, bands=32, rows=4)
    # a few-KB store: right-sided for plain → silent
    with caplog.at_level(logging.INFO, logger=dedup.__name__):
        dedup.incremental_minhash_dedup(
            new, corpus, plain, bands=32, rows=4, threshold=0.6,
            exact_grams=True).count()
    assert "crossover" not in caplog.text
    # same store, crossover lowered beneath it → "go bucketed" hint
    monkeypatch.setattr(dedup, "BUCKETED_STORE_CROSSOVER_BYTES", 1)
    with caplog.at_level(logging.INFO, logger=dedup.__name__):
        dedup.incremental_minhash_dedup(
            new, corpus, plain, bands=32, rows=4, threshold=0.6,
            exact_grams=True).count()
    assert "bucket_by" in caplog.text

    # tiny BUCKETED store with a realistic crossover → "go plain" hint
    monkeypatch.setattr(dedup, "BUCKETED_STORE_CROSSOVER_BYTES",
                        64 * 1024 * 1024)
    bdir = str(tmp_path / "bucketed")
    table = dedup.write_signature_store(
        corpus, bdir, bands=32, rows=4, bucket_by=4, table="t_hint_store")
    caplog.clear()
    with caplog.at_level(logging.INFO, logger=dedup.__name__):
        dedup.incremental_minhash_dedup(
            new, corpus, bdir, bands=32, rows=4, threshold=0.6,
            exact_grams=True, store_table=table).count()
    assert "probes faster" in caplog.text
    spark.sql("DROP TABLE IF EXISTS t_hint_store")


def test_incremental_store_update_and_skew_cap(spark, tmp_path):
    """update_store=True appends exactly bands×|new| entries so tomorrow's
    batch sees today's docs; max_store_bucket drops hot store keys from the
    probe join."""
    corpus = spark.createDataFrame(
        [(i, f"doc number {i} with shared boilerplate " * 4)
         for i in range(1, 5)], "doc_id long, text string")
    new = spark.createDataFrame(
        [(10, "doc number 1 with shared boilerplate " * 4)],
        "doc_id long, text string")
    store = str(tmp_path / "store")
    dedup.write_signature_store(corpus, store, bands=16, rows=8)
    n0 = spark.read.parquet(store).count()
    assert n0 == 16 * 4
    out = dedup.incremental_minhash_dedup(
        new, corpus, store, bands=16, rows=8, threshold=0.8,
        exact_grams=True, update_store=True)
    assert {(r.id_a, r.id_b) for r in out.collect()} == {(1, 10)}
    assert spark.read.parquet(store).count() == n0 + 16  # appended new batch
    # a later batch now matches doc 10 through the store alone
    corpus2 = corpus.unionByName(new)
    new2 = spark.createDataFrame(
        [(20, "doc number 1 with shared boilerplate " * 4)],
        "doc_id long, text string")
    out2 = dedup.incremental_minhash_dedup(
        new2, corpus2, store, bands=16, rows=8, threshold=0.8,
        exact_grams=True)
    p2 = {(r.id_a, r.id_b) for r in out2.collect()}
    assert (10, 20) in p2 and (1, 20) in p2
    # skew cap: with every store key capped out, no cross candidates survive
    out3 = dedup.incremental_minhash_dedup(
        new2, corpus2, store, bands=16, rows=8, threshold=0.8,
        exact_grams=True, max_store_bucket=0)
    assert out3.count() == 0


# ---------------------------------------------------------------------------
# round-6 ADVICE regressions: band-entry HOF form, cache hygiene, skew metric
# ---------------------------------------------------------------------------

def test_band_entries_hof_matches_static(spark):
    """The single-reference HOF band builder must produce bit-identical
    (band, key) values to the static per-band form — store written by one
    path, probed by the other, must collide on true matches."""
    sig = F.array(*[F.pmod(F.xxhash64(F.col("id") + F.lit(i)),
                           F.lit(dedup._P)) for i in range(32)]).alias("sig")
    df = spark.range(50).select("id", sig)
    a = (df.select("id", F.explode(dedup._band_entries(F.col("sig"), 8, 4))
                   .alias("b")).select("id", "b.band", "b.key"))
    b = (df.select("id", F.explode(dedup._band_entries_hof(F.col("sig"), 8, 4))
                   .alias("b")).select("id", "b.band", "b.key"))
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    assert a.count() == 50 * 8
    # round 9: the hot paths pass a column NAME so the whole band array is
    # assembled as one SQL string (one py4j call); keys must stay
    # bit-identical to the Column form — a drift would silently split the
    # store/probe key space
    c = (df.select("id", F.explode(dedup._band_entries("sig", 8, 4))
                   .alias("b")).select("id", "b.band", "b.key"))
    assert a.exceptAll(c).count() == 0 and c.exceptAll(a).count() == 0


def test_hof_signature_path_leaves_no_cache(spark):
    """signature_band_entries(use_pandas_sig=False) must not leak persisted
    blocks across invocations (round-5 ADVICE): the HOF band builder
    removed the need for the persist barrier entirely."""
    df = spark.createDataFrame(
        [(i, f"document body number {i} " * 3) for i in range(20)],
        "doc_id long, text string")
    # compare RDD-id SETS, not counts: checkpoint-backed RDDs from other
    # tests are released asynchronously by driver GC (round 9 — the
    # count-equality form was flaky in the full suite when a stale block
    # set vanished between the two reads); the property under test is
    # that THIS call adds no new persistent RDD
    jjsc = spark.sparkContext._jsc
    before = set(jjsc.getPersistentRDDs().keySet().toArray())
    out = dedup.signature_band_entries(df, bands=16, rows=8,
                                       use_pandas_sig=False)
    assert out.count() == 20 * 16
    after = set(jjsc.getPersistentRDDs().keySet().toArray())
    assert after - before == set()


def test_incremental_dedup_releases_caches(spark, tmp_path):
    """Repeated daily invocations must not accumulate cached blocks
    (round-5 ADVICE: cands/new_entries persisted and never unpersisted)."""
    corpus = spark.createDataFrame(
        [(i, f"corpus doc {i} body " * 4) for i in range(10)],
        "doc_id long, text string")
    new = spark.createDataFrame(
        [(100, "corpus doc 3 body " * 4)], "doc_id long, text string")
    store = str(tmp_path / "store")
    dedup.write_signature_store(corpus, store, bands=16, rows=8)
    jsc = spark.sparkContext._jsc.sc()
    before = jsc.getPersistentRDDs().size()
    out = dedup.incremental_minhash_dedup(
        new, corpus, store, bands=16, rows=8, threshold=0.8,
        exact_grams=True)
    assert {(r.id_a, r.id_b) for r in out.collect()} == {(3, 100)}
    # only the returned verified-pairs cache (1 RDD) may remain by design
    assert jsc.getPersistentRDDs().size() <= before + 1


def test_embedding_near_dupes_skew_accounting(spark, embs):
    """The skew-cap drop count must be reachable by callers even when EVERY
    bucket is dropped (round-5 ADVICE: the lazy Observation was created and
    discarded — and AQE empty-propagation loses it in exactly this case)."""
    rows = embs.limit(3).collect()
    planted = [Row(vec_id=10_000 + r.vec_id,
                   embedding=[v * 1.0001 for v in r.embedding],
                   label=r.label) for r in rows]
    df = embs.unionByName(spark.createDataFrame(planted, embs.schema))
    capped = similarity.embedding_near_dupes(
        df, threshold=0.999, n_tables=8, max_bucket=1)
    assert isinstance(capped, similarity.CappedPairs)
    assert capped.pairs.count() == 0
    assert capped.dropped_buckets > 0
    # the accounting survives transformations of the pairs (the round-6
    # dynamic-attribute form did not)
    assert capped.pairs.select("id_a").count() == 0
    assert capped.dropped_buckets > 0
    capped.unpersist()
    # uncapped form carries no accounting (and stays a lazy/exact DataFrame)
    exact = similarity.embedding_near_dupes(df, threshold=0.999, n_tables=8)
    from pyspark.sql import DataFrame as _DF
    assert isinstance(exact, _DF)


def test_connected_components_chain_and_clusters(spark):
    """Chain A-B-C must collapse to one component even though the A-C pair
    is absent (the reason clustering exists); disjoint clusters stay
    apart; keep-one marks exactly one representative per cluster."""
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3),          # chain -> component 1
         (10, 11), (11, 12), (10, 12),  # triangle -> component 10
         (20, 21)],               # pair -> component 20
        "id_a long, id_b long")
    got = {r.id: r.comp for r in dedup.connected_components(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_connected_components_long_chain_converges(spark):
    """A 12-node chain needs several propagation rounds — the loop must
    iterate to convergence, and the hard stop must raise rather than
    return a half-converged labeling."""
    n = 12
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n)], "id_a long, id_b long")
    got = {r.id: r.comp for r in dedup.connected_components(pairs).collect()}
    assert got == {i: 0 for i in range(n + 1)}
    # the strict single-algorithm contract still raises rather than
    # returning a half-converged labeling (driver_max_edges=0 pins the
    # DISTRIBUTED loop — the round-9 fast path would otherwise return the
    # exact answer without iterating)
    with pytest.raises(RuntimeError, match="did not converge"):
        dedup.connected_components(pairs, max_iters=2,
                                   algorithm="label_prop",
                                   driver_max_edges=0)


def test_connected_components_releases_round_checkpoints(spark):
    """Each propagation round's localCheckpoint blocks must be released as
    the next round materializes (round-6 ADVICE: every round stranded a
    block set until driver GC) — at most the RETURNED labels' checkpoint
    may outlive the call, and release_checkpoint frees that too."""
    jsc = spark.sparkContext._jsc.sc()
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(10)], "id_a long, id_b long")
    before = jsc.getPersistentRDDs().size()
    # driver_max_edges=0 pins the DISTRIBUTED round loop (the subject of
    # this test); the round-9 fast path creates no checkpoints at all
    labels = dedup.connected_components(pairs, driver_max_edges=0)
    assert jsc.getPersistentRDDs().size() <= before + 1
    assert labels.count() == 11
    dedup.release_checkpoint(labels)
    assert jsc.getPersistentRDDs().size() <= before
    # the convergence-failure path must not strand its rounds either
    with pytest.raises(RuntimeError):
        dedup.connected_components(pairs, max_iters=2,
                                   algorithm="label_prop",
                                   driver_max_edges=0)
    assert jsc.getPersistentRDDs().size() <= before
    # the fast path itself must strand nothing (its labels are not
    # checkpoint-backed; release_checkpoint on them is a no-op)
    fast = dedup.connected_components(pairs)
    assert fast.count() == 11
    dedup.release_checkpoint(fast)
    assert jsc.getPersistentRDDs().size() <= before


def test_dedup_clusters_keep_one(spark):
    jsc = spark.sparkContext._jsc.sc()
    before = jsc.getPersistentRDDs().size()
    df = spark.createDataFrame(
        [(i, "identical duplicate content here " * 6) for i in range(4)]
        + [(10, "a completely different document " * 6),
           (11, "a completely different document " * 6)],
        "doc_id long, text string")
    clustered = dedup.dedup_clusters(df, threshold=0.8, exact_grams=True)
    out = clustered.collect()
    comps = {r.id: r.comp for r in out}
    keeps = {r.id for r in out if r.keep}
    assert comps == {0: 0, 1: 0, 2: 0, 3: 0, 10: 10, 11: 10}
    assert keeps == {0, 10}
    # every intermediate (pairs, labels) was released inside dedup_clusters;
    # only the returned (caller-owned) result may remain
    assert jsc.getPersistentRDDs().size() <= before + 1
    clustered.unpersist()
    assert jsc.getPersistentRDDs().size() <= before


def test_star_components_matches_label_prop_on_random_graphs(spark):
    """The large-star/small-star contraction (round 7) must produce the
    EXACT min-id component labeling label propagation produces, on graphs
    of every shape the generator throws — cliques, chains, singleton
    pairs, crossing edges."""
    import random
    rng = random.Random(7)
    for trial in range(3):
        n = 60
        raw = {(rng.randrange(n), rng.randrange(n)) for _ in range(45)}
        edges = [(a, b) for a, b in raw if a != b]
        pairs = spark.createDataFrame(edges, "id_a long, id_b long")
        # driver_max_edges=0 forces the DISTRIBUTED algorithms; the default
        # call exercises the round-9 driver union-find fast path — all
        # three must agree exactly on every graph shape
        lp = dedup.connected_components(pairs, algorithm="label_prop",
                                        driver_max_edges=0)
        st = dedup.connected_components(pairs, algorithm="star",
                                        driver_max_edges=0)
        uf = dedup.connected_components(pairs)
        expected = {r.id: r.comp for r in lp.collect()}
        assert {r.id: r.comp for r in st.collect()} == expected, trial
        assert {r.id: r.comp for r in uf.collect()} == expected, trial
        dedup.release_checkpoint(lp)
        dedup.release_checkpoint(st)


def test_star_handles_adversarial_chain_in_log_rounds(spark):
    """A 200-node path graph (diameter 200) — label propagation would need
    200 rounds; star contraction must finish within the O(log n) budget
    that would make label_prop raise."""
    n = 200
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n)], "id_a long, id_b long")
    labels = dedup.connected_components(pairs, max_iters=15,
                                        algorithm="star",
                                        driver_max_edges=0)
    got = {r.id: r.comp for r in labels.collect()}
    assert got == {i: 0 for i in range(n + 1)}
    dedup.release_checkpoint(labels)


def test_auto_falls_back_to_star_instead_of_raising(spark):
    """algorithm='auto' (the new default): when label propagation hits its
    round budget on a long chain, the operator must fall back to star
    contraction and return the correct labeling (round-6 VERDICT item 6)."""
    n = 40
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n)], "id_a long, id_b long")
    labels = dedup.connected_components(pairs, max_iters=3,
                                        driver_max_edges=0)
    got = {r.id: r.comp for r in labels.collect()}
    assert got == {i: 0 for i in range(n + 1)}
    dedup.release_checkpoint(labels)


def test_driver_fastpath_bound_is_a_hard_guard(spark):
    """Above ``driver_max_edges`` the distributed path must run (its labels
    are checkpoint-backed — detectable via the persistent-RDD count);
    below it the driver union-find runs and registers nothing."""
    jjsc = spark.sparkContext._jsc
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(10)], "id_a long, id_b long")
    # id SETS, not counts: other tests' checkpoint blocks are released
    # asynchronously by driver GC, so a count can shrink between reads
    before = set(jjsc.getPersistentRDDs().keySet().toArray())
    slow = dedup.connected_components(pairs, driver_max_edges=3)
    assert {r.id: r.comp for r in slow.collect()} == {i: 0 for i in range(11)}
    after_slow = set(jjsc.getPersistentRDDs().keySet().toArray())
    assert len(after_slow - before) == 1  # checkpoint-backed labels
    dedup.release_checkpoint(slow)
    fast = dedup.connected_components(pairs, driver_max_edges=1_000)
    assert {r.id: r.comp for r in fast.collect()} == {i: 0 for i in range(11)}
    after_fast = set(jjsc.getPersistentRDDs().keySet().toArray())
    assert after_fast - before == set()


def test_driver_fastpath_seed_overflow_falls_back(spark):
    """A seeding table bigger than the fast path's bounded collect must
    trigger the distributed fallback, not a truncated (wrong) seeding."""
    pairs = spark.createDataFrame([(5, 6)], "id_a long, id_b long")
    # limit=2 admits the 2 directed edges; the seed cap is 2*2+2=6 fetched
    # rows, so 10 seed rows overflow it and force the fallback
    seeds = spark.createDataFrame(
        [(i, i) for i in range(20, 28)] + [(5, 2), (6, 6)],
        "id long, comp long")
    labels = dedup.connected_components(
        pairs, algorithm="label_prop", initial_labels=seeds,
        driver_max_edges=2)
    got = {(r.id, r.comp) for r in labels.collect()}
    dedup.release_checkpoint(labels)
    assert got == {(5, 2), (6, 2)}


def test_driver_fastpath_seeded_matches_distributed(spark):
    """Seeded labeling (the update_clusters shape) must be identical on
    the fast path and the distributed loop, including seeds below the
    subgraph minimum and phantom/above-id seeds that the clamp removes."""
    pairs = spark.createDataFrame(
        [(7, 9), (9, 11), (20, 21)], "id_a long, id_b long")
    seeds = spark.createDataFrame(
        [(7, 3), (9, 3), (11, 11), (20, 99)], "id long, comp long")
    fast = dedup.connected_components(pairs, initial_labels=seeds)
    slow = dedup.connected_components(pairs, algorithm="label_prop",
                                      initial_labels=seeds,
                                      driver_max_edges=0)
    assert ({r.id: r.comp for r in fast.collect()}
            == {r.id: r.comp for r in slow.collect()}
            == {7: 3, 9: 3, 11: 3, 20: 20, 21: 20})
    dedup.release_checkpoint(slow)


def test_update_clusters_matches_from_scratch(spark):
    """Round-7 incremental cluster maintenance: folding a new batch's
    pairs into yesterday's cluster table must equal re-clustering the
    grown corpus from scratch — new docs joining existing clusters,
    brand-new clusters forming inside the batch, and untouched clusters
    passing through identically (the cross-cluster MERGE case is pinned
    separately on a hand-built table below)."""
    dup_a = "alpha cluster content repeated for similarity " * 6
    dup_b = "beta cluster wording shared between the pair " * 6
    dup_c = "gamma untouched cluster that no new doc links " * 6
    corpus = spark.createDataFrame(
        [(1, dup_a), (2, dup_a), (5, dup_b), (6, dup_b),
         (8, dup_c), (9, dup_c),
         (7, "solo corpus document with unique words " * 6)],
        "doc_id long, text string")
    old = dedup.dedup_clusters(corpus, threshold=0.8, exact_grams=True)

    # new batch: 20 joins cluster {1,2}, 21 joins {5,6}; 30/31 are a
    # brand-new duplicate pair; nothing touches {8,9} or solo doc 7
    new = spark.createDataFrame(
        [(20, dup_a), (21, dup_b),
         (30, "fresh duplicate pair only in the new batch " * 6),
         (31, "fresh duplicate pair only in the new batch " * 6)],
        "doc_id long, text string")
    new_pairs = dedup.minhash_lsh_dedup(
        corpus.union(new), threshold=0.8, exact_grams=True).filter(
        (F.col("id_a") >= 20) | (F.col("id_b") >= 20))
    updated = dedup.update_clusters(old, new_pairs)
    got = {(r.id, r.comp, r.keep) for r in updated.collect()}

    scratch = dedup.dedup_clusters(corpus.union(new), threshold=0.8,
                                   exact_grams=True)
    want = {(r.id, r.comp, r.keep) for r in scratch.collect()}
    assert got == want
    # untouched cluster {8,9} passed through; new-only pair clustered
    assert (8, 8, True) in got and (9, 8, False) in got
    assert (30, 30, True) in got and (31, 30, False) in got
    # the round-9 driver fast path (default) and the distributed path
    # must agree row-for-row; driver_max_pairs=1 additionally pins the
    # bounded-collect overflow detection (3 pairs > 1 → fallback)
    dist = dedup.update_clusters(old, new_pairs, driver_max_pairs=1)
    assert {(r.id, r.comp, r.keep) for r in dist.collect()} == want
    dist.unpersist()
    new_pairs.unpersist()
    for d in (old, updated, scratch):
        d.unpersist()


def test_update_clusters_merge_takes_global_min(spark):
    """A bridging pair between two stored clusters relabels BOTH to the
    global min — directly, on a hand-built cluster table."""
    clusters = spark.createDataFrame(
        [(3, 3, True), (4, 3, False), (10, 10, True), (11, 10, False),
         (50, 50, True), (51, 50, False)],
        "id long, comp long, keep boolean")
    pairs = spark.createDataFrame([(4, 100), (100, 10)],
                                  "id_a long, id_b long")
    updated = dedup.update_clusters(clusters, pairs)
    got = {(r.id, r.comp) for r in updated.collect()}
    assert got == {(3, 3), (4, 3), (10, 3), (11, 3), (100, 3),
                   (50, 50), (51, 50)}
    assert {r.id for r in updated.filter("keep").collect()} == {3, 50}
    updated.unpersist()


def test_cluster_table_reuse_across_curation_passes(spark, tmp_path):
    """Round-6 VERDICT item 2: pair generation runs ONCE; the persisted
    cluster table then drives any number of curation passes via
    apply_cluster_keep, each a plain anti-join with NO LSH recomputation
    (plan contains no Python crossing), and the composition equals the
    recompute-from-scratch result."""
    docs = spark.createDataFrame(
        [(i, "identical duplicate content here " * 6,
          "en" if i % 2 == 0 else "de") for i in range(4)]
        + [(10, "a completely different document " * 6, "en"),
           (11, "a completely different document " * 6, "fr"),
           (20, "unique single doc with its own words " * 6, "en")],
        "doc_id long, text string, lang string")
    clusters = dedup.dedup_clusters(docs, threshold=0.8, exact_grams=True)
    table = str(tmp_path / "clusters")
    clusters.write.parquet(table)          # the persisted cluster state
    clusters.unpersist()

    persisted = spark.read.parquet(table)
    pass_en = dedup.apply_cluster_keep(docs, persisted) \
        .filter(F.col("lang") == "en")
    pass_all = dedup.apply_cluster_keep(docs, persisted)
    assert {r.doc_id for r in pass_all.collect()} == {0, 10, 20}
    assert {r.doc_id for r in pass_en.collect()} == {0, 10, 20}
    # the curation pass itself never re-runs LSH: no Python crossing
    plan = pass_en._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "EvalPython" not in plan
    assert "FlatMapsInPandas" not in plan and "MapInPandas" not in plan


def test_minhash_prefilter_margin_preserves_output(spark, docs):
    """The signature estimate screen (round 7) must be output-invariant:
    with the default margin, screened and unscreened runs return the
    identical verified pair set — the screen only removes candidates whose
    estimated J sits ≥8σ below the threshold, which no true pair does.
    Round 9 adds the adaptive skip (``screen_min_candidates``): a small
    candidate set bypasses the screen entirely, which must also be
    output-invariant — all three forms (screen FORCED via
    screen_min_candidates=0, adaptive default, screen disabled) are pinned
    identical here."""
    sample = docs.filter(F.col("doc_id") < 300)
    kw = dict(threshold=0.8, bands=32, rows=4, num_hashes=128,
              exact_grams=True, max_bucket=1_000_000)
    forced = {(r.id_a, r.id_b, r.jaccard) for r in dedup.minhash_lsh_dedup(
        sample, screen_min_candidates=0, **kw).collect()}
    adaptive = {(r.id_a, r.id_b, r.jaccard) for r in dedup.minhash_lsh_dedup(
        sample, **kw).collect()}
    unscreened = {(r.id_a, r.id_b, r.jaccard) for r in dedup.minhash_lsh_dedup(
        sample, prefilter_margin=None, **kw).collect()}
    assert forced == adaptive == unscreened and len(forced) > 0


def test_incremental_sig_store_screen_preserves_output(spark, tmp_path):
    """The incremental probe's estimate screen (use_sig_store=True) must be
    output-invariant vs the unscreened probe, and must degrade gracefully
    (skip, not fail or drop pairs) when the store has no sig companion."""
    corpus = spark.createDataFrame(
        [(i, f"corpus document number {i} text " * 3) for i in range(20)],
        "doc_id long, text string")
    new = spark.createDataFrame(
        [(100, "corpus document number 3 text " * 3)],
        "doc_id long, text string")
    store = str(tmp_path / "store")
    dedup.write_signature_store(corpus, store, bands=16, rows=8,
                                keep_sigs=True)
    import os
    assert os.path.isdir(dedup.sig_store_path(store))
    screened = dedup.incremental_minhash_dedup(
        new, corpus, store, bands=16, rows=8, threshold=0.8,
        exact_grams=True, use_sig_store=True)
    assert {(r.id_a, r.id_b) for r in screened.collect()} == {(3, 100)}
    # store without the companion: the screen skips itself with a warning
    store2 = str(tmp_path / "store2")
    dedup.write_signature_store(corpus, store2, bands=16, rows=8)
    plain = dedup.incremental_minhash_dedup(
        new, corpus, store2, bands=16, rows=8, threshold=0.8,
        exact_grams=True, use_sig_store=True)
    assert {(r.id_a, r.id_b) for r in plain.collect()} == {(3, 100)}
