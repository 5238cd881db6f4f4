"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed via Arrow-batched mapInPandas.

METADATA extraction is REAL: probe_metadata parses PNG/JPEG/GIF
dimensions and WAV audio properties from the raw bytes with the
pure-stdlib codecs in ops/media_codecs.py (no media library needed).
Only the pixel/sample DECODE (feature extraction) remains stubbed behind
`register_decoder` — the Spark-side plumbing (schema, partitioning, UDF
signature, batch shape) is real and tested with a deterministic fake
decoder in tests/test_ops.py.

Design for 100 TB of media:
- binary payloads stay opaque through shuffles; all filtering happens on
  the typed metadata columns first (predicate pushdown on parquet stats),
  so decode only runs on surviving rows;
- mapInPandas streams Arrow batches — bounded memory per task regardless
  of per-file size; maxRecordsPerBatch caps batch RAM;
- repartition before decode spreads hot files across executors.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("payload", T.BinaryType(), True),
    ]
)

_DECODERS: dict[str, Callable[[bytes], dict]] = {}


def register_decoder(kind: str, fn: Callable[[bytes], dict]) -> None:
    """Register a payload decoder (e.g. PIL-based image decode). Tests
    register deterministic fakes; production registers real codecs."""
    _DECODERS[kind] = fn


def _decode_payload(decoders: dict, kind: str, payload: bytes) -> dict:
    if kind not in decoders:
        raise NotImplementedError(
            f"no decoder registered for {kind!r} — media codecs are stubbed "
            "in this environment; call register_decoder() with a real codec"
        )
    return decoders[kind](payload)


FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("feature", T.ArrayType(T.DoubleType()), True),
    ]
)


def extract_features(df: DataFrame, batch_size_hint: int = 1000) -> DataFrame:
    """Decode + feature-extract media rows via mapInPandas (Arrow batches).

    Input must carry media_id/kind/payload columns. The decoder registered
    for each kind produces {'feature': list[float], ...}; missing decoders
    raise NotImplementedError at execution time (stub contract).
    """
    # snapshot at plan time: executors re-import this module and would see
    # an empty _DECODERS; the closure ships the registered decoders instead
    decoders = dict(_DECODERS)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for _, row in pdf.iterrows():
                payload = row["payload"]
                d = _decode_payload(decoders, row["kind"], payload)
                feats.append(
                    {
                        "media_id": row["media_id"],
                        "kind": row["kind"],
                        "n_bytes": len(payload) if payload is not None else 0,
                        "feature": d.get("feature"),
                    }
                )
            yield pd.DataFrame(feats, columns=[f.name for f in FEATURE_SCHEMA.fields])

    return df.select("media_id", "kind", "payload").mapInPandas(run, FEATURE_SCHEMA)


PROBE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("channels", T.IntegerType(), True),
        T.StructField("n_bytes", T.LongType(), True),
    ]
)


def probe_metadata(df: DataFrame, id_col: str = "media_id",
                   payload_col: str = "payload",
                   payload_builder=None) -> DataFrame:
    """REAL metadata extraction from raw media bytes (no media library):
    sniffs the container by magic bytes and parses PNG/JPEG/GIF
    dimensions and WAV channels/sample-rate/duration with stdlib struct
    (ops/media_codecs.py). Runs as Arrow-batched mapInPandas over the
    two needed columns only — payloads never widen the shuffle, and at
    scale the probe parallelizes with the scan.

    payload_builder: optional callable (pd.Series of ids -> iterable of
    payload bytes). When given, payloads are SYNTHESIZED inside the
    probe's own batch loop instead of being read from payload_col, so
    generated bytes never cross the JVM<->Python boundary at all — a
    builder UDF feeding a probe UDF would otherwise ship every payload
    Python -> JVM -> Python (two Arrow passes over the heaviest column
    for one Python stage's worth of work)."""
    from dozer_spark.ops.media_codecs import probe_bytes

    cols = [f.name for f in PROBE_SCHEMA.fields]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = (payload_builder(pdf[id_col])
                        if payload_builder is not None else pdf[payload_col])
            out = []
            for mid, payload in zip(pdf[id_col], payloads):
                d = probe_bytes(bytes(payload) if payload is not None else None)
                d["media_id"] = mid
                out.append(d)
            yield pd.DataFrame(out, columns=cols)

    in_cols = [F.col(id_col).cast("long").alias(id_col)]
    if payload_builder is None:
        in_cols.append(F.col(payload_col))
    return df.select(*in_cols).mapInPandas(run, PROBE_SCHEMA)


def frame_sample(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame sampling plan: one output row per sampled frame offset.

    The offsets are computed natively (sequence+explode — no Python);
    only the frame DECODE (stubbed) needs the codec. This keeps the
    row-explosion distributed and the Python surface minimal.
    """
    return (
        df.filter(F.col("kind") == "video")
        .withColumn(
            "frame_ms",
            F.explode(
                F.sequence(F.lit(0).cast("long"), F.col("duration_ms"), F.lit(every_ms).cast("long"))
            ),
        )
        .select("media_id", "frame_ms", "mime", "payload")
    )


AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_values", T.LongType(), True),
        T.StructField("rms", T.DoubleType(), True),
        T.StructField("peak", T.LongType(), True),
    ]
)


def extract_audio_features(df: DataFrame, id_col: str = "media_id",
                           payload_col: str = "payload") -> DataFrame:
    """REAL signal decode for uncompressed audio: 16-bit PCM WAV data
    chunks are parsed with stdlib chunk walking + a zero-copy numpy
    frombuffer, then reduced to RMS level / peak amplitude / decoded
    value count (frames x channels). Non-WAV / compressed payloads
    yield NULL features (their decode stays behind the documented
    codec stub). Arrow-batched mapInPandas over the two needed columns
    — payloads never widen a shuffle and the decode parallelizes with
    the scan, exactly like probe_metadata."""
    from dozer_spark.ops.media_codecs import wav_audio_features

    cols = [f.name for f in AUDIO_FEATURES_SCHEMA.fields]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                d = wav_audio_features(
                    bytes(payload) if payload is not None else None
                )
                row = {"media_id": mid, "n_values": None, "rms": None,
                       "peak": None}
                if d is not None:
                    row.update(d)
                out.append(row)
            yield pd.DataFrame(out, columns=cols)

    return df.select(
        F.col(id_col).cast("long").alias(id_col), F.col(payload_col)
    ).mapInPandas(run, AUDIO_FEATURES_SCHEMA)
