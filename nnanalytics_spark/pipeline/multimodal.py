"""Multimodal column plumbing: image/audio/video as opaque binary columns.

The Spark-side architecture is real and tested — schema, partition-aware
batch iteration (mapInPandas with Arrow batches), typed metadata struct —
while the actual media decode is stubbed behind DECODERS (the image/audio
libraries are not in this container). Swapping a stub for `PIL.Image.open`
or `soundfile.read` changes one function, not the plan: the operator is
already shaped for 100 TB (binary payloads never shuffle; feature
extraction is map-side only; outputs are small typed columns).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), True),  # opaque bytes
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType(), True),
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = "media_id long, kind string, n_bytes int, checksum long, feature array<double>"


def _decode_stub(payload: bytes, kind: str) -> list[float]:
    """Deterministic fake decode: 8 bucket-counts over byte values.

    Real deployment: replace with PIL/torchvision decode + model features.
    Raising NotImplementedError here would also be acceptable; a
    deterministic fake keeps the plumbing testable end-to-end.
    """
    if payload is None:
        return [0.0] * 8
    counts = [0] * 8
    for byte in payload:
        counts[byte >> 5] += 1
    total = max(len(payload), 1)
    return [c / total for c in counts]


DECODERS = {"image": _decode_stub, "audio": _decode_stub, "video": _decode_stub}


def extract_features(df: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    mapInPandas keeps each binary batch inside one Python worker — no
    shuffle of payload bytes, output is narrow (id + small feature vector).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import zlib

        for pdf in batches:
            features = [
                DECODERS[kind](payload, kind)
                for kind, payload in zip(pdf["kind"], pdf["payload"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(p) if p is not None else 0 for p in pdf["payload"]],
                    "checksum": [
                        zlib.crc32(p) if p is not None else 0 for p in pdf["payload"]
                    ],
                    "feature": features,
                }
            )

    return df.select("media_id", "kind", "payload").mapInPandas(run, FEATURE_SCHEMA)


RESIZED_SCHEMA = (
    "media_id long, kind string, payload binary, width int, height int"
)


def resize(df: DataFrame, width: int, height: int) -> DataFrame:
    """Resize images to width×height — Arrow-batched, map-side only.

    The decode/resample kernel is stubbed (no PIL in this container) with a
    deterministic byte downsample: the payload is re-sampled to exactly
    width*height bytes by striding the source. Swapping in
    `PIL.Image.resize` changes only the inner function; the Spark plumbing
    (binary in → binary out, no shuffle, typed size metadata) is the real
    operator."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        target = width * height

        def kernel(payload: bytes | None) -> bytes:
            if not payload:
                return b"\x00" * target
            n = len(payload)
            return bytes(payload[(i * n) // target] for i in range(target))

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "payload": [kernel(p) for p in pdf["payload"]],
                    "width": width,
                    "height": height,
                }
            )

    return df.select("media_id", "kind", "payload").mapInPandas(run, RESIZED_SCHEMA)


FRAME_SCHEMA = "media_id long, frame_idx int, ts_ms int, payload binary"


def sample_frames(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Sample frames from video payloads every `every_ms` — a one-to-many
    mapInPandas (each video row yields duration/every_ms frame rows).

    Stub kernel: frame k is a fixed-width byte slice at the proportional
    offset; a real deployment swaps in pyav/ffmpeg seek+decode. Output rows
    are narrow (frame payloads only), so the explode happens AFTER decode
    on the map side — full videos never shuffle."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {"media_id": [], "frame_idx": [], "ts_ms": [], "payload": []}
            for mid, payload, duration in zip(
                pdf["media_id"], pdf["payload"], pdf["duration_ms"]
            ):
                if payload is None or not duration:
                    continue
                n_frames = max(int(duration) // every_ms, 1)
                step = max(len(payload) // n_frames, 1)
                for k in range(n_frames):
                    out["media_id"].append(mid)
                    out["frame_idx"].append(k)
                    out["ts_ms"].append(k * every_ms)
                    out["payload"].append(payload[k * step : k * step + min(step, 64)])
            yield pd.DataFrame(out)

    src = df.filter(F.col("kind") == "video").select(
        "media_id", "payload", F.col("meta.duration_ms").alias("duration_ms")
    )
    return src.mapInPandas(run, FRAME_SCHEMA)


def synthetic_media(spark, n: int = 64) -> DataFrame:
    """Deterministic fake media table for tests (payload = seeded bytes)."""
    rows = []
    for i in range(n):
        kind = ("image", "audio", "video")[i % 3]
        payload = bytes(((i * 131 + j * 17) % 256) for j in range(256 + i))
        rows.append((i, kind, payload, ("application/octet-stream", 16, 16, 1000)))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
