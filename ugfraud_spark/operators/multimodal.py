"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

Two decode paths through the same Arrow ``mapInPandas`` plumbing:

- ``fake=True``: deterministic fake decode (dimensions/duration derived
  from the payload md5) — lets the oracle gate check the full pipeline
  on synthetic text payloads.
- ``fake=False``: REAL pure-Python container parsing for the formats a
  header parse can decode without external libs — BMP images (width/
  height from the BITMAPINFOHEADER, first pixel bytes as the feature)
  and RIFF/WAVE audio (channels/bits/sample-count from the fmt+data
  chunks). Other containers (JPEG/PNG entropy-coded pixels, MP4...)
  still raise — they genuinely need PIL/soundfile/av, which are absent
  here; the error names the format so the gap is explicit.

``asset_metadata`` (byte length + md5 + kind) is pure built-ins and is
cross-checked against DuckDB.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

DECODED_SCHEMA = T.StructType([
    T.StructField("asset_id", T.LongType()),
    T.StructField("kind", T.StringType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("n_frames", T.IntegerType()),
    T.StructField("feature", T.ArrayType(T.FloatType())),
])


def synth_assets(docs: DataFrame) -> DataFrame:
    """documents → assets(asset_id, kind, payload binary, meta struct):
    deterministic binary payloads (utf-8 text bytes) standing in for
    image/audio blobs."""
    kind = (
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
    )
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        kind.alias("kind"),
        F.col("text").cast("binary").alias("payload"),
        F.struct(
            F.col("source").alias("origin"), F.col("lang").alias("lang")
        ).alias("meta"),
    )


def asset_metadata(assets: DataFrame) -> DataFrame:
    """(asset_id, kind, byte_len, payload_md5) — binary-column metadata,
    oracle-checked."""
    return assets.select(
        "asset_id", "kind",
        F.length("payload").alias("byte_len"),
        F.md5("payload").alias("payload_md5"),
    )


def decode_bmp(payload: bytes) -> tuple[int, int, int, list[float]]:
    """Pure-Python BMP header parse → (width, height, n_frames, feature).
    BITMAPINFOHEADER: int32 width at 18, int32 height at 22 (negative =
    top-down), pixel-array offset at 10; feature = first 8 pixel bytes
    scaled to [0,1]."""
    import struct

    if len(payload) < 30 or payload[:2] != b"BM":
        raise ValueError("decode_bmp: not a BMP container (no 'BM' magic)")
    pix_off = struct.unpack_from("<I", payload, 10)[0]
    width, height = struct.unpack_from("<ii", payload, 18)
    pix = payload[pix_off:pix_off + 8]
    feature = [float(b) / 255.0 for b in pix] + [0.0] * (8 - len(pix))
    return int(width), abs(int(height)), 1, feature


def decode_wav(payload: bytes) -> tuple[int, int, int, list[float]]:
    """Pure-Python RIFF/WAVE parse → (channels, bits_per_sample,
    n_sample_frames, feature); feature = first 8 data bytes in [0,1]."""
    import struct

    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("decode_wav: not a RIFF/WAVE container")
    pos, channels, bits, block_align, data_len, feat = 12, 0, 0, 0, None, []
    while pos + 8 <= len(payload):
        cid = payload[pos:pos + 4]
        csz = struct.unpack_from("<I", payload, pos + 4)[0]
        body = payload[pos + 8:pos + 8 + csz]
        if cid == b"fmt " and len(body) >= 16:
            channels = struct.unpack_from("<H", body, 2)[0]
            block_align = struct.unpack_from("<H", body, 12)[0]
            bits = struct.unpack_from("<H", body, 14)[0]
        elif cid == b"data":
            data_len = len(body)
            feat = [float(b) / 255.0 for b in body[:8]]
        pos += 8 + csz + (csz % 2)  # RIFF chunks are word-aligned
    if not channels:
        raise ValueError("decode_wav: missing fmt chunk")
    if data_len is None:
        raise ValueError("decode_wav: missing data chunk")
    # frame count computed AFTER the scan: RIFF does not mandate
    # fmt-before-data chunk order
    n_frames = data_len // block_align if block_align else 0
    return channels, bits, n_frames, feat + [0.0] * (8 - len(feat))


def decode_assets(assets: DataFrame, fake: bool = True) -> DataFrame:
    """mapInPandas decode stage. Arrow batches of binary payloads in,
    typed decode records out. ``fake=True`` = md5-derived deterministic
    decode (oracle-checkable); ``fake=False`` = real header parsing for
    BMP/WAV payloads (other containers raise — see module docstring)."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            out = {"asset_id": [], "kind": [], "width": [], "height": [],
                   "n_frames": [], "feature": []}
            for aid, kind, payload in zip(
                pdf["asset_id"], pdf["kind"], pdf["payload"]
            ):
                raw = bytes(payload)
                if fake:
                    h = hashlib.md5(raw).digest()
                    w, ht = 16 + h[0] % 64, 16 + h[1] % 64
                    nf = 1 if kind == "image" else 1 + h[2] % 30
                    feat = [float(b) / 255.0 for b in h[:8]]
                elif raw[:2] == b"BM":
                    w, ht, nf, feat = decode_bmp(raw)
                elif raw[:4] == b"RIFF":
                    w, ht, nf, feat = decode_wav(raw)
                else:
                    raise ValueError(
                        f"decode_assets: unsupported container for asset "
                        f"{int(aid)} (magic {raw[:4]!r}) — real decode "
                        "covers BMP and RIFF/WAVE; JPEG/PNG/MP4 need "
                        "PIL/soundfile/av (absent in this container)"
                    )
                out["asset_id"].append(int(aid))
                out["kind"].append(kind)
                out["width"].append(w)
                out["height"].append(ht)
                out["n_frames"].append(nf)
                out["feature"].append(feat)
            yield pd.DataFrame(out)

    return assets.mapInPandas(decode, schema=DECODED_SCHEMA)


def frame_sample(decoded: DataFrame, every: int = 5) -> DataFrame:
    """(asset_id, frame_idx): frame-sampling plumbing — explode a frame
    index range, keep every Nth (pure built-ins)."""
    return decoded.select(
        "asset_id",
        F.explode(F.sequence(F.lit(0), F.col("n_frames") - 1)).alias("frame_idx"),
    ).where(F.col("frame_idx") % every == 0)
