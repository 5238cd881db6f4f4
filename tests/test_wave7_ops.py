"""Wave 7 corpus-assembly operators: shard packing, Gopher quality,
segment dedup, n-gram census — semantics on hand-built frames (the
oracle parity at sf0.01 is covered by queries_wave7 + parity_check)."""

from __future__ import annotations

from pyspark.sql import functions as F

from dozer_spark.ops.packing import token_shard_assignment
from dozer_spark.ops.text import gopher_quality, top_ngrams
from dozer_spark.ops.dedup import drop_duplicated_segments


def test_shard_packing_budget_and_determinism(spark):
    docs = spark.createDataFrame(
        [(i, " ".join(["w"] * (10 + i % 7))) for i in range(200)],
        ["doc_id", "text"],
    )
    out = token_shard_assignment(docs, "doc_id", "text", budget=100, n_buckets=8)
    rows = {r.doc_id: r for r in out.collect()}
    assert len(rows) == 200
    # every doc's token count survived
    assert all(r.n_tokens == 10 + r.doc_id % 7 for r in rows.values())
    # shard ids form a contiguous 0..max range and each shard's token
    # total stays within budget + one straddling doc
    by_shard = (
        out.groupBy("shard_id").agg(F.sum("n_tokens").alias("tot")).collect()
    )
    ids = sorted(r.shard_id for r in by_shard)
    assert ids == list(range(len(ids)))
    max_doc = 16
    assert all(r.tot <= 100 + max_doc for r in by_shard)
    # deterministic: same input -> identical assignment
    out2 = token_shard_assignment(docs, "doc_id", "text", budget=100, n_buckets=8)
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, out2.collect()))


def test_shard_packing_bucket_count_invariance(spark):
    # the global order key includes the bucket, so the ASSIGNMENT depends
    # on n_buckets — but totals and shard count must stay equivalent, and
    # the same n_buckets must reproduce exactly (regression for the
    # two-level prefix sum == global cumsum equivalence the oracle checks)
    docs = spark.createDataFrame(
        [(i, " ".join(["x"] * 20)) for i in range(100)], ["doc_id", "text"]
    )
    a = token_shard_assignment(docs, "doc_id", "text", budget=500, n_buckets=4)
    b = token_shard_assignment(docs, "doc_id", "text", budget=500, n_buckets=4)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
    # 100 docs x 20 tokens = 2000 tokens -> exactly 4 full shards
    assert a.select(F.countDistinct("shard_id")).first()[0] == 4


def test_gopher_quality_rules(spark):
    good = " ".join(
        ["the quick brown fox jumps over the lazy dog again and again for fun"]
        * 5
    )
    short = "too short"
    symbols = " ".join(["####"] * 60)
    df = spark.createDataFrame(
        [(1, good), (2, short), (3, symbols)], ["doc_id", "text"]
    )
    g = gopher_quality(F.col("text"))
    rows = {
        r.doc_id: r
        for r in df.select(
            "doc_id", g["passes"].alias("p"), g["n_words"].alias("n"),
            g["symbol_ratio"].alias("sym"), g["alpha_frac"].alias("alpha"),
        ).collect()
    }
    assert rows[1].p is True
    assert rows[2].p is False and rows[2].n < 50
    assert rows[3].p is False and rows[3].sym > 0.1 and rows[3].alpha == 0.0


def test_drop_duplicated_segments(spark):
    boiler = "subscribe to our newsletter"
    df = spark.createDataFrame(
        [
            (1, f"unique one. {boiler}. tail one"),
            (2, f"unique two. {boiler}. tail two"),
            (3, "totally distinct. nothing shared"),
        ],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r for r in
           drop_duplicated_segments(df, "text", "doc_id", min_docs=2).collect()}
    assert out[1].n_segments == 3 and out[1].n_removed == 1
    assert out[2].n_removed == 1
    assert out[3].n_removed == 0
    # doc 3 rebuild == original text digest (nothing removed)
    import hashlib

    assert out[3].clean_digest == hashlib.md5(
        b"totally distinct. nothing shared"
    ).hexdigest()
    # intra-doc repetition alone does not trigger removal (distinct docs)
    solo = spark.createDataFrame([(9, "dup seg. dup seg. x")], ["doc_id", "text"])
    r = drop_duplicated_segments(solo, "text", "doc_id", min_docs=2).first()
    assert r.n_removed == 0


def test_top_ngrams_census(spark):
    df = spark.createDataFrame(
        [(i, "alpha beta gamma delta " + ("alpha beta gamma " if i % 2 == 0 else ""))
         for i in range(10)],
        ["doc_id", "text"],
    )
    out = top_ngrams(df, "text", n=3, k=5).collect()
    counts = {r.gram: r.n_docs for r in out}
    # 'alpha beta gamma' appears in all 10 docs but only once per doc
    # (per-doc distinct) even though even docs contain it twice
    assert counts["alpha beta gamma"] == 10
    assert out[0].gram == "alpha beta gamma"


def test_temperature_sample_flattens_domains(spark):
    import pytest

    from dozer_spark.ops.sampling import temperature_sample

    rows = [(i, "big") for i in range(900)] + [(1000 + i, "small") for i in range(100)]
    df = spark.createDataFrame(rows, ["doc_id", "lang"])
    out = temperature_sample(df, "doc_id", "lang", alpha=0.3, total=200)
    counts = {r.lang: r.n for r in
              out.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    # natural ratio is 9:1; alpha=0.3 compresses it to 9^0.3 ~ 1.93
    assert sum(counts.values()) in (199, 200, 201)  # integer rounding
    ratio = counts["big"] / counts["small"]
    assert 1.5 < ratio < 2.5
    # deterministic across runs
    a = sorted(map(tuple, out.collect()))
    b = sorted(map(tuple,
        temperature_sample(df, "doc_id", "lang", alpha=0.3, total=200).collect()))
    assert a == b
    with pytest.raises(ValueError):
        temperature_sample(df, "doc_id", "lang", alpha=0.0, total=10)
    with pytest.raises(ValueError):
        temperature_sample(df, "doc_id", "lang", alpha=0.5, total=0)


def test_wav_pcm_decode_and_features(spark):
    import math

    from dozer_spark.ops.media_codecs import (
        make_wav,
        wav_audio_features,
        wav_pcm_samples,
    )

    # hand-computed: 4 sawtooth samples = -32768, -32512, -32256, -32000
    b = make_wav(8000, 4, channels=1, waveform="sawtooth")
    s = [int(v) for v in wav_pcm_samples(b)]  # int16 -> Python int (else v*v wraps)
    assert s == [(i % 256) * 256 - 32768 for i in range(4)]
    f = wav_audio_features(b)
    want_rms = math.sqrt(sum(v * v for v in s) / 4)
    assert f == {"n_values": 4, "rms": want_rms, "peak": 32768}

    # stereo duplicates each frame across channels: 2x values, same rms
    st = wav_audio_features(make_wav(8000, 4, channels=2, waveform="sawtooth"))
    assert st["n_values"] == 8 and st["rms"] == want_rms

    # silence decodes to rms 0; non-wav payloads yield None
    assert wav_audio_features(make_wav(8000, 10))["rms"] == 0.0
    assert wav_audio_features(b"not a wav at all, just bytes") is None
    assert wav_audio_features(None) is None


def test_extract_audio_features_dataframe(spark):
    from dozer_spark.ops.media_codecs import make_wav
    from dozer_spark.ops.multimodal import extract_audio_features

    rows = [
        (1, make_wav(8000, 100, waveform="sawtooth")),
        (2, make_wav(8000, 50)),      # silence
        (3, b"\x00\x01garbage"),      # undecodable -> NULL features
        (4, None),
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    out = {r.media_id: r for r in extract_audio_features(df).collect()}
    assert out[1].n_values == 100 and out[1].peak == 32768
    assert out[2].rms == 0.0
    assert out[3].rms is None and out[4].rms is None


def test_shard_packing_property_vs_sorted_cumsum(spark):
    # fuzzed token counts: the two-level prefix sum must equal the
    # naive global cumsum over the (bucket, hash, id) order
    import hashlib
    import random

    rnd = random.Random(77)
    rows = [(i, " ".join(["t"] * rnd.randrange(1, 40))) for i in range(300)]
    budget, nb = 250, 8
    out = {
        r.doc_id: (r.n_tokens, r.shard_id)
        for r in token_shard_assignment(
            spark.createDataFrame(rows, ["doc_id", "text"]),
            "doc_id", "text", budget=budget, n_buckets=nb,
        ).collect()
    }

    def key(doc_id):
        h = hashlib.md5(f"shard:{doc_id}".encode()).hexdigest()
        return (int(h[:4], 16) % nb, h, doc_id)

    order = sorted((doc_id for doc_id, _ in rows), key=key)
    cum = 0
    for doc_id in order:
        n = len(rows[doc_id][1].split())
        assert out[doc_id][0] == n
        assert out[doc_id][1] == cum // budget, doc_id
        cum += n


def test_funnel_ordering_semantics(spark):
    # a click BEFORE the signup must not count; a purchase before the
    # qualifying click must not count
    import datetime as dt

    def t(h):
        return dt.datetime(2024, 1, 1, h)

    rows = [
        (1, 1, "click", t(1)),     # pre-signup click: ignored
        (2, 1, "signup", t(2)),
        (3, 1, "purchase", t(3)),  # pre-click purchase: ignored
        (4, 1, "click", t(4)),
        (5, 1, "purchase", t(5)),  # counts
        (6, 2, "signup", t(1)),    # signup only
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp"
    )
    from dozer_spark.queries import registry  # noqa: F401  (decorator import)
    from pyspark.sql import Window

    w = Window.partitionBy("user_id")
    t1 = F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).over(w)
    d1 = ev.withColumn("t1", t1)
    t2 = F.min(F.when((F.col("event_type") == "click")
                      & (F.col("ts") >= F.col("t1")), F.col("ts"))).over(w)
    d2 = d1.withColumn("t2", t2)
    t3 = F.min(F.when((F.col("event_type") == "purchase")
                      & (F.col("ts") >= F.col("t2")), F.col("ts"))).over(w)
    got = {
        r.user_id: (r.a, r.b, r.c)
        for r in d2.withColumn("t3", t3).groupBy("user_id").agg(
            F.min("t1").alias("a"), F.min("t2").alias("b"),
            F.min("t3").alias("c"),
        ).collect()
    }
    assert got[1] == (t(2), t(4), t(5))
    assert got[2] == (t(1), None, None)


def test_wav_non_pcm_formats_stay_stubbed(spark):
    import struct

    from dozer_spark.ops.media_codecs import make_wav, wav_audio_features

    b = bytearray(make_wav(8000, 4, waveform="sawtooth"))
    # patch the fmt chunk's wFormatTag (offset 20) to 2 = MS ADPCM: the
    # 16-bit check alone would decode compressed bytes as garbage PCM
    assert b[12:16] == b"fmt "
    b[20:22] = struct.pack("<H", 2)
    assert wav_audio_features(bytes(b)) is None


def test_window_duplication_score(spark):
    from dozer_spark.ops.text import window_duplication_score

    shared = " ".join(f"w{i}" for i in range(25))
    df = spark.createDataFrame(
        [
            (1, shared + " unique tail one two three four five"),
            (2, shared + " other ending six seven eight nine ten"),
            (3, "entirely distinct " + " ".join(f"x{i}" for i in range(30))),
            (4, "short doc"),  # < window tokens -> 0 windows, score 0
        ],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r for r in
           window_duplication_score(df, "text", "doc_id", window=20).collect()}
    # docs 1 and 2 share the windows fully inside the common 25-token
    # prefix; doc 3 shares none; doc 4 has no windows at all
    assert out[1].n_duplicated == 6 and out[2].n_duplicated == 6
    assert 0 < out[1].dup_score < 1
    assert out[3].n_duplicated == 0 and out[3].dup_score == 0.0
    assert out[4].n_windows == 0 and out[4].dup_score == 0.0


def test_wav_extensible_pcm_decodes(spark):
    import struct

    from dozer_spark.ops.media_codecs import make_wav, wav_audio_features

    plain = make_wav(8000, 4, channels=2, waveform="sawtooth")
    want = wav_audio_features(plain)

    # rebuild as WAVE_FORMAT_EXTENSIBLE: fmt chunk grows to 40 bytes
    # (cbSize=22, validBits, channelMask, SubFormat GUID starting with
    # the real format code 1 = PCM)
    body = plain[12:]
    assert body[:4] == b"fmt "
    old_fmt = body[8:8 + 16]
    data_part = body[8 + 16:]
    guid_tail = b"\x00\x00\x00\x00\x10\x00\x80\x00\x00\xaa\x00\x38\x9b\x71"
    ext = struct.pack("<HHI", 22, 16, 0b11) + struct.pack("<H", 1) + guid_tail
    new_fmt = (b"fmt " + struct.pack("<I", 40)
               + b"\xfe\xff" + old_fmt[2:] + ext)
    new_body = b"WAVE" + new_fmt + data_part
    wav = b"RIFF" + struct.pack("<I", len(new_body) + 4) + new_body
    got = wav_audio_features(wav)
    assert got == want
    # extensible with a NON-PCM subformat still stays stubbed
    ext_bad = struct.pack("<HHI", 22, 16, 0b11) + struct.pack("<H", 2) + guid_tail
    bad_fmt = (b"fmt " + struct.pack("<I", 40)
               + b"\xfe\xff" + old_fmt[2:] + ext_bad)
    bad_body = b"WAVE" + bad_fmt + data_part
    bad = b"RIFF" + struct.pack("<I", len(bad_body) + 4) + bad_body
    assert wav_audio_features(bad) is None
