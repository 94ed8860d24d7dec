"""Multimodal column handling: opaque binary media + typed metadata.

Images/audio/video are carried as opaque `binary` columns with typed metadata
extracted by Arrow-batched pandas stages (`mapInPandas`). The decode /
feature-extract step is STUBBED behind `decode_media` (no image/audio
libraries ship in this environment) with a deterministic fake so the
Spark-side plumbing — schema, batch shape, partitioning — is real and tested.

Scale notes: media bytes never leave the executor JVM except through Arrow
batches bounded by spark.sql.execution.arrow.maxRecordsPerBatch; metadata-only
consumers prune the binary column at the parquet scan (verify: ReadSchema
excludes `html`/media in .explain).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_META_SCHEMA = StructType([
    StructField("url", StringType()),
    StructField("n_bytes", LongType()),
    StructField("sha256", StringType()),
    StructField("media_kind", StringType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("frames", IntegerType()),
    StructField("thumbnail", BinaryType()),
])


def decode_media(payload: bytes):  # pragma: no cover - stub contract
    """STUB: real deployments plug PIL/ffmpeg/torchaudio here.

    Raises NotImplementedError by design — callers must use
    `fake_decode` (deterministic) or inject a real decoder."""
    raise NotImplementedError(
        "media decoding requires image/audio libraries not present in this "
        "environment; use fake_decode or inject a decoder"
    )


def sniff_decode(payload: bytes) -> dict:
    """Stdlib header decode for the three container formats the synthetic
    media table carries — REAL byte parsing, no image libraries needed:

    - PNG:  IHDR width/height, big-endian u32 at offset 16 (after the 8-byte
            signature + 4-byte length + 'IHDR')
    - JPEG: marker scan from SOI, skipping variable-length segments via their
            big-endian length fields, until a SOF0/1/2 frame header (height
            then width, big-endian u16 at offset+5)
    - GIF:  GIF87a/GIF89a logical-screen width/height, little-endian u16 at
            offset 6

    Unknown containers fall back to `fake_decode` (the documented stub for
    formats that genuinely need PIL/ffmpeg — pixel decode, frame extraction).
    """
    import struct

    n = len(payload)
    base = {"n_bytes": n, "sha256": hashlib.sha256(payload).hexdigest(),
            "frames": 1, "thumbnail": payload[:16]}
    if n >= 24 and payload[:8] == b"\x89PNG\r\n\x1a\n" and payload[12:16] == b"IHDR":
        w, h = struct.unpack(">II", payload[16:24])
        if w > 0x7FFFFFFF or h > 0x7FFFFFFF:  # u32 dims past int32 = malformed
            return fake_decode(payload)
        return {**base, "media_kind": "png", "width": w, "height": h}
    if n >= 4 and payload[:2] == b"\xff\xd8":  # JPEG SOI
        off = 2
        while off + 2 <= n:
            # fill bytes: any run of 0xFF pads the next marker (ITU T.81 B.1.1.2)
            while off + 2 <= n and payload[off] == 0xFF and payload[off + 1] == 0xFF:
                off += 1
            if off + 2 > n or payload[off] != 0xFF:
                break
            marker = payload[off + 1]
            if marker in (0xC0, 0xC1, 0xC2):  # SOF0/SOF1/SOF2
                if off + 9 <= n:
                    h, w = struct.unpack(">HH", payload[off + 5 : off + 9])
                    return {**base, "media_kind": "jpeg", "width": w, "height": h}
                break
            if marker in (0xD9, 0xDA):  # EOI, or SOS (entropy data) before any SOF
                break
            if marker == 0x01 or 0xD0 <= marker <= 0xD8:  # TEM/RST0-7/SOI: length-less
                off += 2
                continue
            if off + 4 > n:
                break
            seg_len = struct.unpack(">H", payload[off + 2 : off + 4])[0]
            if seg_len < 2:  # malformed length field — stop, don't loop
                break
            off += 2 + seg_len
        return fake_decode(payload)
    if n >= 10 and payload[:6] in (b"GIF87a", b"GIF89a"):
        w, h = struct.unpack("<HH", payload[6:10])
        return {**base, "media_kind": "gif", "width": w, "height": h}
    return fake_decode(payload)


def fake_decode(payload: bytes) -> dict:
    """Deterministic stand-in decode: sizes derived from content bytes so
    tests are reproducible; thumbnail = first 16 bytes."""
    n = len(payload)
    h = hashlib.sha256(payload).hexdigest()
    kind = ["image", "audio", "video"][n % 3]
    return {
        "n_bytes": n,
        "sha256": h,
        "media_kind": kind,
        "width": (n % 1920) if kind != "audio" else None,
        "height": (n % 1080) if kind != "audio" else None,
        "frames": (n % 240) if kind == "video" else None,
        "thumbnail": payload[:16],
    }


def extract_media_meta(df: DataFrame, media_col: str = "html", url_col: str = "url",
                       decoder=fake_decode) -> DataFrame:
    """mapInPandas media → metadata stage (Arrow batches of binary payloads)."""
    import pandas as pd

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for url, payload in zip(pdf[url_col], pdf[media_col]):
                b = bytes(payload) if payload is not None else b""
                meta = decoder(b)
                rows.append([url, meta["n_bytes"], meta["sha256"], meta["media_kind"],
                             meta["width"], meta["height"], meta["frames"], meta["thumbnail"]])
            yield pd.DataFrame(rows, columns=[f.name for f in MEDIA_META_SCHEMA.fields])

    return df.select(url_col, media_col).mapInPandas(run, MEDIA_META_SCHEMA)


RESIZED_SCHEMA = StructType([
    StructField("url", StringType()),
    StructField("media_kind", StringType()),
    StructField("out_width", IntegerType()),
    StructField("out_height", IntegerType()),
    StructField("resized", BinaryType()),
])


def resize_media(df: DataFrame, target_w: int = 64, target_h: int = 64,
                 media_col: str = "html", url_col: str = "url",
                 decoder=fake_decode) -> DataFrame:
    """Resize / frame-sample stage: binary-in → binary-out mapInPandas.

    With the fake decoder the "pixel" resample is a deterministic stride
    subsample of the payload bytes to target_w*target_h bytes (aspect-clamped
    like a real thumbnailer: never upscales). Audio payloads pass through a
    target_w*target_h-byte head-clip ("first N samples"). Real deployments
    swap `decoder` + the resample line for PIL.Image.resize / ffmpeg scale;
    the Arrow batch shape, schema, and null handling are exactly what that
    version uses."""
    import pandas as pd

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for url, payload in zip(pdf[url_col], pdf[media_col]):
                b = bytes(payload) if payload is not None else b""
                meta = decoder(b)
                kind = meta["media_kind"]
                if kind == "audio":
                    out_w, out_h = None, None
                    resized = b[: target_w * target_h]
                else:
                    out_w = min(target_w, meta["width"] or target_w)
                    out_h = min(target_h, meta["height"] or target_h)
                    n_out = max(1, out_w * out_h)
                    stride = max(1, len(b) // n_out)
                    resized = b[::stride][:n_out]
                rows.append([url, kind, out_w, out_h, resized])
            yield pd.DataFrame(rows, columns=[f.name for f in RESIZED_SCHEMA.fields])

    return df.select(url_col, media_col).mapInPandas(run, RESIZED_SCHEMA)
