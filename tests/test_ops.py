"""Tests for the training-data pipeline ops: dedup, similarity, text,
multimodal plumbing."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from dozer_spark.ops import (
    exact_dedup,
    minhash_lsh_pairs,
    simhash_pairs,
    ngram_jaccard_pairs,
    brute_force_topk,
    lsh_ann_topk,
    token_count,
    quality_score,
    lang_id,
    fingerprint,
)


def test_exact_dedup_finds_planted_dupes(spark):
    df = spark.createDataFrame(
        [(1, "hello world"), (2, "hello world"), (3, "unique text")], ["id", "text"]
    )
    out = {r.keep_id: r.n_copies for r in exact_dedup(df, "text", "id").collect()}
    assert out == {1: 2, 3: 1}


def test_minhash_catches_identical_token_sets(spark):
    df = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta eta theta"),
            (2, "theta eta zeta epsilon delta gamma beta alpha"),  # same set, reordered
            (3, "totally different words here nothing shared at all"),
        ],
        ["id", "text"],
    )
    pairs = minhash_lsh_pairs(df, "text", "id", threshold=0.9).collect()
    assert [(p.id_a, p.id_b, p.jaccard) for p in pairs] == [(1, 2, 1.0)]


def test_simhash_near_identical(spark):
    base = "the quick brown fox jumps over the lazy dog again and again today"
    df = spark.createDataFrame(
        [(1, base), (2, base + " extra"), (3, "completely unrelated content entirely elsewhere")],
        ["id", "text"],
    )
    # hamming thresholds are relative to n_bits: ~6/32 scales to ~11/60
    # at the new default geometry (measured: the near-identical pair is
    # at hamming 8, the unrelated ones at 29-33)
    pairs = simhash_pairs(df, "text", "id", max_hamming=11).collect()
    got = {(p.id_a, p.id_b) for p in pairs}
    assert (1, 2) in got
    assert (1, 3) not in got and (2, 3) not in got


def test_ngram_jaccard_blocking(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat sat on the mat", "en"),
            (2, "the cat sat on the hat", "en"),
            (3, "the cat sat on the mat", "fr"),  # identical but different block
        ],
        ["id", "text", "lang"],
    )
    pairs = ngram_jaccard_pairs(df, "text", "id", "lang", threshold=0.5).collect()
    assert {(p.id_a, p.id_b) for p in pairs} == {(1, 2)}


def test_brute_force_topk_properties(catalog):
    e = catalog.df("embeddings")
    q = e.filter(F.col("vec_id") < 3)
    out = brute_force_topk(e, q, "embedding", "vec_id", k=4)
    rows = out.collect()
    assert len(rows) == 3 * 4
    for r in rows:
        assert r.neighbor_id != r.query_id
        assert -1.0 <= r.cosine <= 1.0
    # rank 1 has the max cosine per query
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    for rs in by_q.values():
        rs.sort(key=lambda r: r.rank)
        assert all(rs[i].cosine >= rs[i + 1].cosine for i in range(len(rs) - 1))


def test_lsh_ann_recall_vs_brute_force(catalog):
    """LSH ANN must find a decent fraction of true top-5 neighbors when
    they share a bucket; every returned neighbor must be a real corpus id."""
    e = catalog.df("embeddings")
    q = e.filter(F.col("vec_id") < 20)
    exact = brute_force_topk(e, q, "embedding", "vec_id", k=5).collect()
    approx = lsh_ann_topk(e, q, "embedding", "vec_id", k=5, n_planes=4, dim=64).collect()
    exact_set = {(r.query_id, r.neighbor_id) for r in exact}
    approx_set = {(r.query_id, r.neighbor_id) for r in approx}
    assert approx_set, "LSH returned nothing"
    recall = len(exact_set & approx_set) / len(exact_set)
    assert recall > 0.1  # 4 planes / 16 buckets over random vectors: weak but nonzero


def test_text_ops_basics(spark):
    df = spark.createDataFrame(
        [(1, "the cat and the dog, in a house!"), (2, "x")], ["id", "text"]
    )
    out = df.select(
        token_count("text").alias("n"),
        F.round(quality_score("text"), 3).alias("q"),
        lang_id("text").alias("lang"),
        fingerprint("text").alias("fp"),
    ).collect()
    assert out[0].n == 8
    assert 0.0 <= out[0].q <= 1.0
    assert out[0].lang == "en"
    assert out[1].lang == "und"
    assert len(out[0].fp) == 32
    # fingerprint is whitespace/case invariant
    df2 = spark.createDataFrame([(1, "THE cat AND   the dog, in a HOUSE!")], ["id", "text"])
    fp2 = df2.select(fingerprint("text").alias("fp")).first().fp
    assert fp2 == out[0].fp


def test_multimodal_plumbing(spark):
    """mapInPandas plumbing with a deterministic fake decoder (the real
    codec is stubbed per environment constraints)."""
    from dozer_spark.ops import multimodal as mm

    mm.register_decoder("image", lambda payload: {"feature": [float(len(payload)), 1.0]})
    df = spark.createDataFrame(
        [(1, "image", "image/png", 4, 4, None, b"\x89PNG0000"),
         (2, "image", "image/png", 2, 2, None, b"\x89P")],
        schema=mm.MEDIA_SCHEMA,
    )
    rows = {r.media_id: r for r in mm.extract_features(df).collect()}
    assert rows[1].n_bytes == 8 and rows[1].feature == [8.0, 1.0]
    assert rows[2].feature == [2.0, 1.0]


def test_multimodal_unregistered_kind_raises(spark):
    from dozer_spark.ops import multimodal as mm

    mm._DECODERS.pop("audio", None)
    df = spark.createDataFrame(
        [(1, "audio", "audio/wav", None, None, 1000, b"RIFF")], schema=mm.MEDIA_SCHEMA
    )
    with pytest.raises(Exception, match="no decoder registered|NotImplementedError"):
        mm.extract_features(df).collect()


def test_frame_sample(spark):
    from dozer_spark.ops import multimodal as mm

    df = spark.createDataFrame(
        [(1, "video", "video/mp4", None, None, 3500, b"\x00\x00")], schema=mm.MEDIA_SCHEMA
    )
    frames = mm.frame_sample(df, every_ms=1000).collect()
    assert [f.frame_ms for f in frames] == [0, 1000, 2000, 3000]


def test_hash_sampling_determinism_and_split(spark, catalog):
    from dozer_spark.ops.sampling import hash_sample, train_test_split

    d = catalog.df("documents")
    a = {r.doc_id for r in hash_sample(d, "doc_id", 0.3).collect()}
    b = {r.doc_id for r in hash_sample(d.repartition(7), "doc_id", 0.3).collect()}
    assert a == b  # stable under repartitioning
    assert 0.1 < len(a) / d.count() < 0.5
    train, test = train_test_split(d, "doc_id", 0.2)
    tr = {r.doc_id for r in train.collect()}
    te = {r.doc_id for r in test.collect()}
    assert tr.isdisjoint(te) and len(tr) + len(te) == d.count()
    with pytest.raises(ValueError, match="fraction"):
        hash_sample(d, "doc_id", 1.5)


def test_repetition_ratio(spark):
    from dozer_spark.ops.text import repetition_ratio

    df = spark.createDataFrame(
        [(1, "a b c a b c a b c"), (2, "all words here are unique tokens")], ["id", "text"]
    )
    got = {r.id: round(r.rr, 3) for r in
           df.select("id", repetition_ratio("text", 3).alias("rr")).collect()}
    # doc 1: 7 trigrams, 3 distinct -> 1 - 3/7
    assert got[1] == round(1 - 3 / 7, 3)
    assert got[2] == 0.0


class TestMediaCodecs:
    """Pure-stdlib media metadata codecs (ops/media_codecs.py): builder ->
    parser roundtrips plus malformed-input behavior."""

    def test_png_roundtrip_and_validity(self):
        from dozer_spark.ops.media_codecs import PNG_SIG, make_png, png_size, probe_bytes
        b = make_png(257, 31)
        assert b.startswith(PNG_SIG)
        assert png_size(b) == (257, 31)
        d = probe_bytes(b)
        assert (d["mime"], d["width"], d["height"]) == ("image/png", 257, 31)
        # zlib stream must actually decompress to H scanlines of W+1 bytes
        import zlib
        idat = b[8 + 25:]  # skip sig + IHDR chunk
        assert idat[4:8] == b"IDAT"
        ln = int.from_bytes(idat[:4], "big")
        assert len(zlib.decompress(idat[8:8 + ln])) == 31 * 258

    def test_jpeg_dimensions_after_many_segments(self):
        from dozer_spark.ops.media_codecs import jpeg_size, make_jpeg
        assert jpeg_size(make_jpeg(640, 480)) == (640, 480)
        # SOF behind extra APPn/COM segments still found
        import struct
        com = b"\xff\xfe" + struct.pack(">H", 9) + b"comment"
        b = make_jpeg(99, 77)
        with_com = b[:2] + com + b[2:]
        assert jpeg_size(with_com) == (99, 77)
        assert jpeg_size(b"\xff\xd8\xff\xd9") is None  # no SOF

    def test_wav_info_including_odd_chunk_padding(self):
        import struct
        from dozer_spark.ops.media_codecs import make_wav, wav_info
        w = wav_info(make_wav(44100, 44100, channels=2, bits=16))
        assert (w["sample_rate"], w["channels"], w["duration_ms"]) == (44100, 2, 1000)
        # an odd-sized LIST chunk before fmt must not derail the walk
        b = make_wav(8000, 800)
        lst = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"  # padded
        patched = b[:12] + lst + b[12:]
        w2 = wav_info(patched)
        assert w2 is not None and w2["duration_ms"] == 100

    def test_probe_rejects_garbage(self):
        from dozer_spark.ops.media_codecs import probe_bytes
        for payload in (None, b"", b"garbage bytes not a container"):
            d = probe_bytes(payload)
            assert d["mime"] is None and d["width"] is None

    def test_probe_metadata_dataframe(self, spark):
        from dozer_spark.ops.media_codecs import make_png, make_wav
        from dozer_spark.ops.multimodal import probe_metadata
        rows = [(1, make_png(64, 32)), (2, make_wav(8000, 1600)), (3, b"junk")]
        df = spark.createDataFrame(rows, "media_id long, payload binary")
        got = {r.media_id: r for r in probe_metadata(df).collect()}
        assert (got[1].mime, got[1].width, got[1].height) == ("image/png", 64, 32)
        assert (got[2].mime, got[2].duration_ms, got[2].sample_rate) == ("audio/wav", 200, 8000)
        assert got[3].mime is None and got[3].n_bytes == 4


def test_pii_counts_and_redaction(spark):
    from dozer_spark.ops.text import pii_counts, redact_pii
    df = spark.createDataFrame(
        [(1, "mail a.b-c@x.io or call 555-123-4567; ssn 078-05-1120"),
         (2, "no pii here"),
         (3, "two mails x@y.com z@w.org")],
        ["id", "t"])
    c = pii_counts(F.col("t"))
    out = df.select("id", c["email"].alias("e"), c["phone"].alias("p"),
                    c["ssn"].alias("s"),
                    redact_pii(F.col("t")).alias("r")).collect()
    rows = {r.id: r for r in out}
    assert (rows[1].e, rows[1].p, rows[1].s) == (1, 1, 1)
    assert "[PII]" in rows[1].r and "078-05" not in rows[1].r \
        and "a.b-c@x.io" not in rows[1].r
    assert (rows[2].e, rows[2].p, rows[2].s) == (0, 0, 0)
    assert rows[3].e == 2 and rows[3].r.count("[PII]") == 2


def test_quota_sample_exact_counts_and_determinism(spark):
    from dozer_spark.ops import quota_sample

    rows = [(i, "en" if i % 3 else "es") for i in range(60)]
    df = spark.createDataFrame(rows, ["id", "lang"])
    out = quota_sample(df, "id", "lang", {"en": 5, "es": 3})
    got = out.groupBy("lang").count().collect()
    assert {r.lang: r["count"] for r in got} == {"en": 5, "es": 3}
    # quota above stratum size keeps the whole stratum
    all_es = quota_sample(df, "id", "lang", {"es": 10**6}, default_quota=0)
    assert all_es.count() == 20
    # deterministic under repartitioning: same rows selected
    a = sorted(r.id for r in out.collect())
    b = sorted(r.id for r in
               quota_sample(df.repartition(13), "id", "lang",
                            {"en": 5, "es": 3}).collect())
    assert a == b
    with pytest.raises(ValueError):
        quota_sample(df, "id", "lang", {"en": -1})


def test_eval_ngram_overlap_counts_and_short_doc_guard(spark):
    from dozer_spark.ops import eval_ngram_overlap

    df = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps"),   # eval
            (2, "a quick brown fox runs"),      # shares "quick brown fox"
            (3, "totally different words here"),
            (4, "ab"),                           # < n tokens: empty grams
        ],
        ["doc_id", "text"],
    )
    out = eval_ngram_overlap(df, "text", "doc_id", F.col("doc_id") == 1, n=3)
    got = {r.doc_id: r.n_hits for r in out.collect()}
    assert got == {2: 1}
