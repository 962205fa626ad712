"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

The decode/feature-extract stage is STUBBED (image/audio libraries are
not in this container): ``decode_assets(..., fake=True)`` produces a
deterministic fake decode (dimensions/duration derived from the payload
md5) so the Spark-side plumbing — schema, partitioning, Arrow batch
shape, UDF signature — is real and tested; ``fake=False`` raises
``NotImplementedError`` exactly where a real ``PIL.Image.open`` /
``soundfile.read`` call would go.

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


def decode_assets(assets: DataFrame, fake: bool = True) -> DataFrame:
    """mapInPandas decode stage. Arrow batches of binary payloads in,
    typed decode records out — the real plumbing; only the innermost
    decode call is faked/stubbed."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real decode needs PIL/soundfile/av — not in this "
                    "container; run with fake=True"
                )
            out = {"asset_id": [], "kind": [], "width": [], "height": [],
                   "n_frames": [], "feature": []}
            for aid, kind, payload in zip(
                pdf["asset_id"], pdf["kind"], pdf["payload"]
            ):
                h = hashlib.md5(bytes(payload)).digest()
                out["asset_id"].append(int(aid))
                out["kind"].append(kind)
                out["width"].append(16 + h[0] % 64)
                out["height"].append(16 + h[1] % 64)
                out["n_frames"].append(1 if kind == "image" else 1 + h[2] % 30)
                out["feature"].append([float(b) / 255.0 for b in h[:8]])
            yield pd.DataFrame(out)

    return assets.mapInPandas(decode, schema=DECODED_SCHEMA)


def frame_sample(decoded: DataFrame, every: int = 5) -> DataFrame:
    """(asset_id, frame_idx): frame-sampling plumbing — explode a frame
    index range, keep every Nth (pure built-ins)."""
    return decoded.select(
        "asset_id",
        F.explode(F.sequence(F.lit(0), F.col("n_frames") - 1)).alias("frame_idx"),
    ).where(F.col("frame_idx") % every == 0)
