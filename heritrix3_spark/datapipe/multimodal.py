"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Media (image/audio/video) rides as ``binary`` columns with a typed metadata
struct. The Spark-side plumbing — schema, partition sizing, mapInPandas
batch shape, feature-vector schema — is real and tested. The decode stage
(:func:`decode_media`) REALLY decodes the formats the Python stdlib can
parse — BMP and binary PPM/PGM images (header + dimensions), PCM WAV audio
(``wave`` module: duration) — filling width/height/duration_ms from the
actual payload. Codecs the stdlib lacks (JPEG/PNG/GIF pixels, MP4) remain
an honest ``NotImplementedError`` integration point under ``strict=True``
(plug PIL/ffmpeg there on a production cluster); ``strict=False`` passes
them through undecoded.

:func:`fake_feature_extract` is the deterministic stand-in feature
extractor used by tests and benchmarks: a hash-derived fixed-length float
vector with exactly the batch shape a real extractor would produce.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("mime", StringType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", LongType(), True),
        StructField("payload", BinaryType(), True),
    ]
)

FEATURE_DIM = 64
_FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("kind", StringType(), False),
        StructField("feature", ArrayType(FloatType()), False),
    ]
)


def synth_media_df(spark, n: int = 100, partitions: int = 4) -> DataFrame:
    """Deterministic fake media table (payload = seeded bytes)."""
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        payload = bytes((i * 7 + j) % 256 for j in range(64 + i % 32))
        rows.append(
            (
                f"m{i:05d}",
                kind,
                {"image": "image/gif", "audio": "audio/wav", "video": "video/mp4"}[kind],
                (i % 64) + 1 if kind == "image" else None,
                (i % 48) + 1 if kind == "image" else None,
                (i * 250) if kind != "image" else None,
                payload,
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA).repartition(partitions)


# --- stdlib decoders (the REAL decode path for formats Python can parse) --
def _decode_bmp(b: bytes) -> tuple[int, int] | None:
    """BMP header parse: (width, height). BITMAPINFOHEADER (>=40 bytes,
    signed dims — negative height = top-down) or BITMAPCOREHEADER (12)."""
    if len(b) < 26 or b[:2] != b"BM":
        return None
    hdr = int.from_bytes(b[14:18], "little")
    if hdr >= 40:
        w = int.from_bytes(b[18:22], "little", signed=True)
        h = int.from_bytes(b[22:26], "little", signed=True)
        return (abs(w), abs(h))
    if hdr == 12 and len(b) >= 22:
        return (
            int.from_bytes(b[18:20], "little"),
            int.from_bytes(b[20:22], "little"),
        )
    return None


def _decode_pnm(b: bytes) -> tuple[int, int] | None:
    """Binary PPM/PGM (P6/P5): whitespace/comment-tolerant header parse."""
    if b[:2] not in (b"P5", b"P6"):
        return None
    toks: list[int] = []
    i = 2
    n = len(b)
    while len(toks) < 2 and i < n:
        c = b[i : i + 1]
        if c == b"#":  # comment to end of line
            while i < n and b[i : i + 1] not in (b"\n", b"\r"):
                i += 1
        elif c.isspace():
            i += 1
        elif c.isdigit():
            j = i
            while j < n and b[j : j + 1].isdigit():
                j += 1
            toks.append(int(b[i:j]))
            i = j
        else:
            return None
    return (toks[0], toks[1]) if len(toks) == 2 else None


def _decode_png(b: bytes) -> tuple[int, int] | None:
    """PNG dimensions from the IHDR chunk (pure header read, no codec):
    8-byte signature, 4-byte length, b"IHDR", then width/height as
    big-endian u32 (PNG spec §11.2.2 — public format knowledge)."""
    if len(b) < 24 or b[:8] != b"\x89PNG\r\n\x1a\n" or b[12:16] != b"IHDR":
        return None
    return (
        int.from_bytes(b[16:20], "big"),
        int.from_bytes(b[20:24], "big"),
    )


def _decode_gif(b: bytes) -> tuple[int, int] | None:
    """GIF87a/89a logical-screen dimensions: little-endian u16 pair at
    offset 6 (GIF spec §18)."""
    if len(b) < 10 or b[:6] not in (b"GIF87a", b"GIF89a"):
        return None
    return (
        int.from_bytes(b[6:8], "little"),
        int.from_bytes(b[8:10], "little"),
    )


def _decode_jpeg(b: bytes) -> tuple[int, int] | None:
    """JPEG dimensions from the first SOFn frame header (marker walk —
    header-only, no entropy decode): segments are 0xFF <marker> <len16>;
    SOFn (C0-CF minus C4/C8/CC) carries precision(1) height(2) width(2)
    (ITU T.81 §B.2.2)."""
    if len(b) < 4 or b[:2] != b"\xff\xd8":
        return None
    i = 2
    n = len(b)
    while i + 4 <= n:
        if b[i] != 0xFF:
            return None
        marker = b[i + 1]
        if marker == 0xFF:  # fill byte
            i += 1
            continue
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2  # standalone markers carry no length
            continue
        if marker == 0xD9:  # EOI before any SOF
            return None
        seg_len = int.from_bytes(b[i + 2 : i + 4], "big")
        if seg_len < 2:
            return None
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            if i + 9 > n:
                return None
            h = int.from_bytes(b[i + 5 : i + 7], "big")
            w = int.from_bytes(b[i + 7 : i + 9], "big")
            return (w, h)
        i += 2 + seg_len
    return None


def _decode_wav(b: bytes) -> int | None:
    """PCM WAV via the stdlib ``wave`` module: duration in ms."""
    import io
    import wave as _wave

    if b[:4] != b"RIFF":
        return None
    try:
        with _wave.open(io.BytesIO(b)) as w:
            fr = w.getframerate()
            return int(w.getnframes() * 1000 / fr) if fr else None
    except (_wave.Error, EOFError):
        return None


def decode_media(df: DataFrame, strict: bool = True) -> DataFrame:
    """Decode stage over the mapInPandas batch shape: payloads the stdlib
    can parse (BMP, P5/P6 PNM, PNG/GIF/JPEG headers, PCM WAV) get their
    width/height/duration_ms REPLACED by values read from the actual
    bytes. Anything else is the codec integration point: ``strict=True``
    raises NotImplementedError (plug PIL/ffmpeg there — full pixel decode,
    mp4/webm); ``strict=False`` passes rows through with their metadata
    untouched."""

    def run(pdf_iter):
        for pdf in pdf_iter:
            widths, heights, durs = [], [], []
            for payload, w0, h0, d0 in zip(
                pdf["payload"], pdf["width"], pdf["height"], pdf["duration_ms"]
            ):
                b = bytes(payload) if payload is not None else b""
                dims = (
                    _decode_bmp(b)
                    or _decode_pnm(b)
                    or _decode_png(b)
                    or _decode_gif(b)
                    or _decode_jpeg(b)
                )
                if dims is not None:
                    widths.append(dims[0])
                    heights.append(dims[1])
                    durs.append(d0)
                    continue
                dur = _decode_wav(b)
                if dur is not None:
                    widths.append(w0)
                    heights.append(h0)
                    durs.append(dur)
                    continue
                if strict:
                    raise NotImplementedError(
                        "no stdlib parser for this payload (pixel decode / "
                        "mp4/webm need PIL/ffmpeg) — plug a real decoder here"
                    )
                widths.append(w0)
                heights.append(h0)
                durs.append(d0)
            out = pdf.copy()
            out["width"] = pd.array(widths, dtype="Int32")
            out["height"] = pd.array(heights, dtype="Int32")
            out["duration_ms"] = pd.array(durs, dtype="Int64")
            yield out

    return df.mapInPandas(run, schema=df.schema)


# --- deterministic real-format fixture builders (tests + gates) -----------
def make_bmp(width: int, height: int) -> bytes:
    """Minimal 24-bit BI_RGB BMP with a deterministic pixel ramp."""
    row = bytearray()
    for x in range(width):
        row += bytes(((x * 3) % 256, (x * 5) % 256, (x * 7) % 256))
    pad = (-len(row)) % 4
    pixels = (bytes(row) + b"\x00" * pad) * height
    info = (
        (40).to_bytes(4, "little")
        + width.to_bytes(4, "little", signed=True)
        + height.to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little")
        + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little")
        + len(pixels).to_bytes(4, "little")
        + b"\x00" * 16
    )
    off = 14 + len(info)
    hdr = b"BM" + (off + len(pixels)).to_bytes(4, "little") + b"\x00" * 4 + off.to_bytes(4, "little")
    return hdr + info + pixels


def make_ppm(width: int, height: int) -> bytes:
    """Binary P6 PPM with a comment line (exercises the tolerant parse)."""
    px = bytes((i % 256 for i in range(width * height * 3)))
    return b"P6\n# fixture\n%d %d\n255\n" % (width, height) + px


def make_png(width: int, height: int) -> bytes:
    """Structurally valid PNG: signature + IHDR (real CRC via zlib) + a
    zlib-deflated IDAT of deterministic grayscale rows + IEND."""
    import struct
    import zlib

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data))
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    raw = b"".join(
        b"\x00" + bytes(((x + y * 3) % 256 for x in range(width)))
        for y in range(height)
    )
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def make_gif(width: int, height: int) -> bytes:
    """GIF89a header + logical screen descriptor + trailer (the
    dimension law needs no image data block)."""
    return (
        b"GIF89a"
        + width.to_bytes(2, "little")
        + height.to_bytes(2, "little")
        + b"\x00\x00\x00;"
    )


def make_jpeg(width: int, height: int) -> bytes:
    """Minimal JPEG marker stream: SOI + APP0/JFIF + a COM segment (the
    walk must skip it) + SOF0 carrying the dimensions + EOI."""
    import struct

    app0 = b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    com = b"fixture comment"
    sof0 = struct.pack(">BHHB", 8, height, width, 1) + b"\x01\x11\x00"
    return (
        b"\xff\xd8"
        + b"\xff\xe0" + struct.pack(">H", len(app0) + 2) + app0
        + b"\xff\xfe" + struct.pack(">H", len(com) + 2) + com
        + b"\xff\xc0" + struct.pack(">H", len(sof0) + 2) + sof0
        + b"\xff\xd9"
    )


def make_wav(duration_ms: int, framerate: int = 8000) -> bytes:
    """Mono 16-bit PCM WAV of the given duration (stdlib wave writer)."""
    import io
    import wave as _wave

    n = framerate * duration_ms // 1000
    buf = io.BytesIO()
    with _wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(framerate)
        w.writeframes(
            b"".join(
                (int(1000 * ((i * 37) % 64 - 32) / 32)).to_bytes(
                    2, "little", signed=True
                )
                for i in range(n)
            )
        )
    return buf.getvalue()


def fake_feature_extract(df: DataFrame) -> DataFrame:
    """Deterministic stand-in feature extractor with production batch shape:
    payload bytes -> FEATURE_DIM float vector (hash-expanded)."""

    def run(pdf_iter):
        for pdf in pdf_iter:
            if len(pdf) == 0:
                continue
            feats = []
            for payload in pdf["payload"]:
                b = np.frombuffer(payload or b"\0", dtype=np.uint8).astype(np.float32)
                reps = int(np.ceil(FEATURE_DIM / max(len(b), 1)))
                v = np.tile(b, reps)[:FEATURE_DIM]
                norm = float(np.linalg.norm(v)) or 1.0
                feats.append((v / norm).tolist())
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "kind": pdf["kind"], "feature": feats}
            )

    return df.select("media_id", "kind", "payload").mapInPandas(run, schema=_FEATURE_SCHEMA)


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: (media_id, frame_ts) rows via sequence
    explode — pure column algebra; the actual frame decode plugs into
    :func:`decode_media`. Demonstrates bounded fan-out: frames-per-video =
    duration/every_ms, spread across partitions before decode."""
    vids = df.filter(F.col("kind") == "video")
    return vids.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.greatest((F.col("duration_ms") / every_ms).cast("long") - 1, F.lit(0)))
        ).alias("frame_idx"),
    ).select("media_id", (F.col("frame_idx") * every_ms).alias("frame_ts_ms"))
