"""Pure-stdlib media METADATA codecs: PNG/JPEG/GIF dimensions, WAV audio
properties. No media library needed — these parse container headers with
`struct`, which is all the metadata-first pipeline design requires
(ops/multimodal.py): filter on typed metadata, decode pixels only on
surviving rows (pixel/sample decode remains the documented stub).

Also provides deterministic BUILDERS (make_png/make_jpeg/make_wav) so
tests and the oracle query can roundtrip: build real bytes from known
parameters, parse them back, and compare against the parameters computed
independently (the DuckDB oracle re-derives them in SQL).
"""

from __future__ import annotations

import math
import struct
import zlib

# -- sniffing ----------------------------------------------------------------

PNG_SIG = b"\x89PNG\r\n\x1a\n"


def sniff_mime(b: bytes | None) -> str | None:
    if not b or len(b) < 12:
        return None
    if b.startswith(PNG_SIG):
        return "image/png"
    if b.startswith(b"\xff\xd8\xff"):
        return "image/jpeg"
    if b[:6] in (b"GIF87a", b"GIF89a"):
        return "image/gif"
    if b[:4] == b"RIFF" and b[8:12] == b"WAVE":
        return "audio/wav"
    return None


# -- parsers -----------------------------------------------------------------


def png_size(b: bytes) -> tuple[int, int] | None:
    """Width/height from the IHDR chunk (must be first, per spec)."""
    if not b.startswith(PNG_SIG) or len(b) < 24 or b[12:16] != b"IHDR":
        return None
    w, h = struct.unpack(">II", b[16:24])
    return w, h


def jpeg_size(b: bytes) -> tuple[int, int] | None:
    """Walk JPEG markers to the first SOFn frame header (dimensions live
    there). Handles arbitrary APPn/COM segments before it."""
    if not b.startswith(b"\xff\xd8"):
        return None
    i, n = 2, len(b)
    while i + 4 <= n:
        if b[i] != 0xFF:  # resync on stray fill bytes
            i += 1
            continue
        marker = b[i + 1]
        if marker == 0xFF:
            i += 1
            continue
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2  # standalone markers, no length field
            continue
        if i + 4 > n:
            return None
        seg_len = struct.unpack(">H", b[i + 2:i + 4])[0]
        # SOF0-15 except DHT(C4)/JPG(C8)/DAC(CC)
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            if i + 9 > n:
                return None
            h, w = struct.unpack(">HH", b[i + 5:i + 9])
            return w, h
        i += 2 + seg_len
    return None


def gif_size(b: bytes) -> tuple[int, int] | None:
    if b[:6] not in (b"GIF87a", b"GIF89a") or len(b) < 10:
        return None
    w, h = struct.unpack("<HH", b[6:10])
    return w, h


def wav_info(b: bytes) -> dict | None:
    """Channels, sample rate, bits, and duration from the RIFF chunks."""
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        return None
    i, n = 12, len(b)
    fmt = None
    data_size = None
    while i + 8 <= n:
        cid = b[i:i + 4]
        size = struct.unpack("<I", b[i + 4:i + 8])[0]
        if cid == b"fmt " and i + 8 + 16 <= n:
            audio_format, channels, rate, _, _, bits = struct.unpack(
                "<HHIIHH", b[i + 8:i + 24]
            )
            # WAVE_FORMAT_EXTENSIBLE (0xFFFE, standard for >2 channels):
            # the REAL format code is the first 2 bytes of the SubFormat
            # GUID at fmt offset 24 — resolve it so extensible integer
            # PCM decodes like plain PCM
            if audio_format == 0xFFFE and size >= 40 and i + 8 + 26 <= n:
                audio_format = struct.unpack("<H", b[i + 32:i + 34])[0]
            fmt = {"format": audio_format, "channels": channels,
                   "sample_rate": rate, "bits": bits}
        elif cid == b"data":
            data_size = size
        i += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data_size is None:
        return None
    byte_rate = fmt["sample_rate"] * fmt["channels"] * (fmt["bits"] // 8)
    fmt["duration_ms"] = (data_size * 1000) // byte_rate if byte_rate else None
    fmt["n_samples"] = (
        data_size // (fmt["channels"] * (fmt["bits"] // 8))
        if fmt["channels"] and fmt["bits"] else None
    )
    return fmt


def probe_bytes(b: bytes | None) -> dict:
    """One-call metadata probe: mime + dimensions/audio properties."""
    out = {
        "mime": sniff_mime(b), "width": None, "height": None,
        "duration_ms": None, "sample_rate": None, "channels": None,
        "n_bytes": len(b) if b is not None else None,
    }
    if out["mime"] == "image/png":
        wh = png_size(b)
    elif out["mime"] == "image/jpeg":
        wh = jpeg_size(b)
    elif out["mime"] == "image/gif":
        wh = gif_size(b)
    else:
        wh = None
    if wh:
        out["width"], out["height"] = wh
    if out["mime"] == "audio/wav":
        info = wav_info(b)
        if info:
            out["duration_ms"] = info["duration_ms"]
            out["sample_rate"] = info["sample_rate"]
            out["channels"] = info["channels"]
    return out


# -- builders (tests + oracle roundtrip) -------------------------------------


def _png_chunk(ctype: bytes, payload: bytes) -> bytes:
    crc = zlib.crc32(ctype + payload) & 0xFFFFFFFF
    return struct.pack(">I", len(payload)) + ctype + payload + struct.pack(">I", crc)


def make_png(width: int, height: int) -> bytes:
    """Minimal spec-valid grayscale PNG (real CRCs, real zlib IDAT)."""
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    raw = b"".join(b"\x00" + bytes(width) for _ in range(height))
    return (
        PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw))
        + _png_chunk(b"IEND", b"")
    )


def make_jpeg(width: int, height: int) -> bytes:
    """JPEG header stream with an APP0 and an SOF0 carrying the
    dimensions (no entropy data — sufficient for any header parser,
    which is the contract metadata probing relies on)."""
    # APP0 length 16 = 2 (length field) + 14 (JFIF identifier, version,
    # units, densities, thumbnail dims)
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x02\x00" + bytes(6)
    sof = (
        b"\xff\xc0" + struct.pack(">H", 11)
        + b"\x08" + struct.pack(">HH", height, width) + b"\x01\x01\x11\x00"
    )
    return b"\xff\xd8" + app0 + sof + b"\xff\xd9"


def make_wav(sample_rate: int, n_samples: int, channels: int = 1,
             bits: int = 16, waveform: str = "silence") -> bytes:
    """Spec-valid PCM WAV. waveform='silence' writes zero samples;
    'sawtooth' writes the deterministic 16-bit ramp
    s_i = (i % 256) * 256 - 32768 on every channel — closed-form, so
    decoded features (RMS, peak) are exactly replayable in SQL."""
    block = channels * (bits // 8)
    if waveform == "sawtooth":
        if bits != 16:
            raise ValueError("sawtooth test waveform is 16-bit only")
        import numpy as np

        idx = np.arange(n_samples, dtype=np.int64)
        s = ((idx % 256) * 256 - 32768).astype("<i2")
        data = np.repeat(s, channels).tobytes()
    else:
        data = bytes(n_samples * block)
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate, sample_rate * block, block, bits
    )
    body = (
        b"WAVEfmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def wav_pcm_samples(b: bytes):
    """REAL 16-bit PCM decode: the data chunk as an int16 numpy array
    (interleaved channels). Returns None for non-WAV / non-16-bit
    payloads — only compressed codecs stay behind the decode stub
    (ops/multimodal.py); uncompressed PCM needs nothing beyond stdlib
    chunk walking + a zero-copy frombuffer."""
    import numpy as np

    info = wav_info(b) if b else None
    # format 1 = uncompressed integer PCM; anything else (ADPCM, float,
    # mu-law, extensible) would frombuffer compressed/other-typed bytes
    # as int16 garbage — those stay behind the decode stub
    if not info or info.get("bits") != 16 or info.get("format") != 1:
        return None
    i, n = 12, len(b)
    while i + 8 <= n:
        cid = b[i:i + 4]
        size = struct.unpack("<I", b[i + 4:i + 8])[0]
        if cid == b"data":
            raw = b[i + 8:i + 8 + size]
            return np.frombuffer(raw[: len(raw) - (len(raw) % 2)],
                                 dtype="<i2")
        i += 8 + size + (size & 1)
    return None


def wav_audio_features(b: bytes) -> dict | None:
    """Decoded-signal features from 16-bit PCM: RMS level, peak
    amplitude, decoded sample count (frames x channels). Sum of squares
    is exact in int64 (32768^2 * n < 2^63 for any realistic clip), so
    rms = sqrt(mean) is the correctly-rounded IEEE value — replayable
    digit-for-digit in SQL."""
    import numpy as np

    s = wav_pcm_samples(b)
    if s is None or len(s) == 0:
        return None
    sq = np.sum(s.astype(np.int64) ** 2)
    return {
        "n_values": int(len(s)),
        "rms": float(math.sqrt(sq / len(s))),
        "peak": int(np.max(np.abs(s.astype(np.int64)))),
    }
